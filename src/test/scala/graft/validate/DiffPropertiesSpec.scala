package graft.validate

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.SparkSpec

/** ScalaCheck-generated property tests (SURVEY §5): the diff classes
  * partition the joined key space and LWW is a commutative, idempotent
  * merge — for arbitrary data, not just the curated twin. Generators are
  * sampled over fixed seeds (the scalatest/scalacheck bridge isn't on the
  * offline classpath, so sampling is driven manually — still
  * property-shaped, and reproducible by construction).
  */
class DiffPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rowGen: Gen[List[(Int, Int, Long)]] =
    Gen.listOfN(30, for {
      k <- Gen.choose(0, 12)   // small key space → collisions + conflicts
      v <- Gen.choose(0, 5)
      wt <- Gen.choose(0L, 9L)
    } yield (k, v, wt))

  private def sample(seed: Long): List[(Int, Int, Long)] =
    rowGen.apply(Gen.Parameters.default, Seed(seed)).getOrElse(Nil)

  private def dedup(rows: List[(Int, Int, Long)]) =
    rows.groupBy(_._1).map { case (_, g) => g.maxBy(r => (r._3, r._2)) }.toList

  test("diff classes partition the key space for arbitrary tables") {
    for (seed <- 1L to 6L) {
      val o = dedup(sample(seed)).toDF("k", "v", "wt")
      val t = dedup(sample(seed + 100)).toDF("k", "v", "wt")
      val counts = Diff.report(o, t, Seq("k"), Seq("v"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.getOrElse("valid", 0L) + counts.getOrElse("missing", 0L) +
        counts.getOrElse("mismatch", 0L) == o.count(), s"origin cover failed, seed=$seed")
      assert(counts.getOrElse("valid", 0L) + counts.getOrElse("mismatch", 0L) +
        counts.getOrElse("extra_in_target", 0L) == t.count(), s"target cover failed, seed=$seed")
    }
  }

  test("lwwMerge: commutative, idempotent, one row per key, keeps max writetime") {
    for (seed <- 1L to 6L) {
      val x = sample(seed).toDF("k", "v", "wt").withColumn("src", lit(0))
      val y = sample(seed + 200).toDF("k", "v", "wt").withColumn("src", lit(1))
      val xy = Diff.lwwMerge(x.unionByName(y), Seq("k"), "wt", Seq("src", "v"))
      val yx = Diff.lwwMerge(y.unionByName(x), Seq("k"), "wt", Seq("src", "v"))
      assert(xy.exceptAll(yx).isEmpty && yx.exceptAll(xy).isEmpty, s"not commutative, seed=$seed")
      val again = Diff.lwwMerge(xy, Seq("k"), "wt", Seq("src", "v"))
      assert(xy.exceptAll(again).isEmpty, s"not idempotent, seed=$seed")
      assert(xy.groupBy("k").count().filter(col("count") > 1).count() == 0,
        s"duplicate keys, seed=$seed")
      val maxWt = x.unionByName(y).groupBy("k").agg(max("wt").as("mx"))
      assert(xy.join(maxWt, "k").filter(col("wt") =!= col("mx")).count() == 0,
        s"winner lost a newer writetime, seed=$seed")
    }
  }

  test("tokenRange buckets are a partition for arbitrary bucket counts") {
    for (seed <- 1L to 4L) {
      val buckets = Gen.choose(2, 16).apply(Gen.Parameters.default, Seed(seed)).getOrElse(8)
      val df = spark.range(200).toDF("id")
        .withColumn("pk", concat(lit("k"), col("id")))
      val counts = (0 until buckets)
        .map(b => graft.core.Ops.tokenRange(df, Seq("pk"), buckets, b, b).count())
      assert(counts.sum == 200, s"buckets=$buckets not a partition")
    }
  }
}
