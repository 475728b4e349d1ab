package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic training-shard shuffle (Ops.shardShuffle /
  * shardShuffleLayout): content-hash determinism across re-runs and
  * partitionings, seed sensitivity, hash-uniform shard balance, and the
  * layout's range-exchange + local-sort plan shape (never a global
  * sort).
  */
class ShardShuffleSpec extends SparkSpec {
  import spark.implicits._

  private def ids(n: Int) = (0 until n).map(_.toLong).toDF("doc_id")

  test("assignment is a pure function of (seed, id) — partitioning-independent") {
    val a = Ops.shardShuffle(ids(500), "doc_id", 8, "s1")
      .select("doc_id", "shard", "ord").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    val b = Ops.shardShuffle(ids(500).repartition(13), "doc_id", 8, "s1")
      .select("doc_id", "shard", "ord").collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2))).sorted
    assert(a.toSeq == b.toSeq)
    // Spark's rand()-based shuffles fail exactly this contract: their
    // output depends on the partition index feeding each task
  }

  test("a different seed reorders; the same seed reproduces") {
    val s1 = Ops.shardShuffle(ids(200), "doc_id", 4, "epoch-1")
      .orderBy("shard", "ord").select("doc_id").collect().map(_.getLong(0))
    val s1again = Ops.shardShuffle(ids(200), "doc_id", 4, "epoch-1")
      .orderBy("shard", "ord").select("doc_id").collect().map(_.getLong(0))
    val s2 = Ops.shardShuffle(ids(200), "doc_id", 4, "epoch-2")
      .orderBy("shard", "ord").select("doc_id").collect().map(_.getLong(0))
    assert(s1.toSeq == s1again.toSeq)
    assert(s1.toSeq != s2.toSeq) // 200!/... chance of accidental equality ~0
  }

  test("shards are hash-uniform and complete") {
    val counts = Ops.shardShuffle(ids(4000), "doc_id", 8, "bal")
      .groupBy("shard").count().collect()
      .map(r => (r.getInt(0), r.getLong(1))).toMap
    assert(counts.keySet == (0 until 8).toSet)
    // binomial(4000, 1/8): mean 500, sd ~21 — 5 sd is a 1-in-10^6 flake
    counts.values.foreach(c => assert(math.abs(c - 500L) <= 105, counts.toString))
  }

  test("layout plans one range exchange + local sort, no global sort") {
    val plan = Ops.shardShuffleLayout(ids(100), "doc_id", 4, "s")
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // exactly one exchange, and the sort above it is partition-local
    assert("Exchange".r.findAllIn(plan).size == 1, plan)
    assert(plan.contains("Sort [shard") && plan.contains("false, 0"), plan)
    assert(!plan.contains("Sort [shard#") || !plan.contains("true, 0"), plan)
  }
}
