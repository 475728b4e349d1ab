package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** cluster_balanced_sample (r15): k-means coverage sampling. Pins the
  * defining property — each cell contributes at most `cap` keepers
  * regardless of its population, so a dense cluster cannot crowd out a
  * sparse one — plus draw determinism and the per-cell accounting.
  */
class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  // three well-separated clusters on coordinate axes, sizes 12/5/2; the
  // three smallest vec_ids (the kmeans seeds) hit one cluster each, so
  // two Lloyd iterations converge to the obvious cells.
  private def emb = {
    def v(axis: Int, i: Int): Seq[Float] = {
      val base = Array(0f, 0f, 0f, 0f); base(axis) = 1f
      base(3) = 0.01f * i // tiny per-vector jitter, same cell
      base.toSeq
    }
    val a = (0 until 12).map(i => (1L + 3 * i, v(0, i)))  // ids 1,4,7,...
    val b = (0 until 5).map(i => (2L + 3 * i, v(1, i)))   // ids 2,5,8,11,14
    val c = (0 until 2).map(i => (3L + 3 * i, v(2, i)))   // ids 3,6
    (a ++ b ++ c).toDF("vec_id", "embedding")
  }

  test("per-cell cap flattens density: kept = min(cap, n_cell) per cell") {
    val out = LlmOps.clusterBalancedSample(emb, c = 3, iters = 2, cap = 4)
      .collect()
    val byCell = out.groupBy(_.getAs[Any]("cid"))
    assert(byCell.size == 3, s"three populated cells expected: ${byCell.keySet}")
    val shape = byCell.values.map { rows =>
      (rows.head.getAs[Long]("n_cell"), rows.length.toLong)
    }.toSet
    assert(shape == Set((12L, 4L), (5L, 4L), (2L, 2L)),
      s"kept-vs-population off: $shape")
  }

  test("keepers rank by the content-stable draw (u desc, vec_id tiebreak)") {
    val out = LlmOps.clusterBalancedSample(emb, c = 3, iters = 2, cap = 4)
      .collect()
    out.groupBy(_.getAs[Any]("cid")).values.foreach { rows =>
      val sorted = rows.sortBy(_.getAs[Int]("rk"))
      val keys = sorted.map(r => (-r.getAs[Double]("u"), r.getAs[Long]("vec_id")))
      assert(keys.toSeq == keys.sortBy(identity).toSeq,
        s"rank order must follow (u desc, vec_id asc): ${sorted.mkString(",")}")
    }
  }

  test("selection is deterministic and geometry-pure (same input, same keepers)") {
    val a = LlmOps.clusterBalancedSample(emb, c = 3, iters = 2, cap = 4)
      .collect().map(_.toSeq).toSeq
    val b = LlmOps.clusterBalancedSample(emb, c = 3, iters = 2, cap = 4)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("vec_id 0 (the query-row convention) never trains or samples") {
    val withZero = emb.unionByName(
      Seq((0L, Seq(1f, 1f, 1f, 1f))).toDF("vec_id", "embedding"))
    val out = LlmOps.clusterBalancedSample(withZero, c = 3, iters = 2, cap = 4)
    assert(out.filter(col("vec_id") === 0).count() == 0)
  }
}
