package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.LlmOps

/** r12 (VERDICT r11 items 5 + 8): the stats-keyed exact↔approx switches.
  * embeddingHealth's percentiles and profileTable's distinct counts both
  * have an exact form whose cost shape dies at 100 TB (a single-task
  * value-multiset buffer; an Expand ×(cols+1) scan) — the DEFAULT above
  * the crossover (and on unknown-size lineages) must be the merge-able
  * approx form, with exact as the small-table regime the oracle
  * hash-pins. These tests pin the PLAN, not just values: the selected
  * physical form is the contract.
  */
class ApproxSelectSpec extends SparkSpec {

  private def emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
  private def orders = spark.read.parquet(s"${sf()}/orders.parquet")

  /** A lineage whose plan statistics say BIG (20e9-row range ≫ both byte
    * crossovers even after Project's row-size scaling drops the range's
    * intrinsic rowCount) without materializing anything — plans are
    * built, never executed.
    */
  private def hugeDf = spark.range(20000000000L)
    .select(col("id").as("vec_id"), array(col("id").cast("float")).as("embedding"),
      col("id").cast("string").as("s"))

  test("embeddingHealth: small table defaults to EXACT percentile (the oracle regime)") {
    val plan = LlmOps.embeddingHealth(emb, "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("percentile("), plan)
    assert(!plan.contains("approx_percentile"), plan)
  }

  test("embeddingHealth: big/unknown stats default to approx_percentile — " +
       "no exact single-task value buffer in the 100 TB plan") {
    val plan = LlmOps.embeddingHealth(hugeDf, "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("approx_percentile"), plan)
    assert(!plan.replace("approx_percentile", "").contains("percentile("),
      s"exact percentile must not appear in the big-regime plan:\n$plan")
  }

  test("embeddingHealth: forced regimes override stats both ways") {
    val ap = LlmOps.embeddingHealth(emb, "embedding", Some(false))
      .queryExecution.executedPlan.toString
    assert(ap.contains("approx_percentile"), ap)
    val ex = LlmOps.embeddingHealth(hugeDf, "embedding", Some(true))
      .queryExecution.executedPlan.toString
    assert(!ex.contains("approx_percentile") && ex.contains("percentile("), ex)
  }

  test("embeddingHealth: approx percentiles track exact within 5% at sf, " +
       "structural counts identical") {
    val ap = LlmOps.embeddingHealth(emb, "embedding", Some(false)).collect().head
    val ex = LlmOps.embeddingHealth(emb, "embedding", Some(true)).collect().head
    for (i <- 0 until 5) // n_vecs, dim_min, dim_max, n_nan, n_zero
      assert(ap.getLong(i) == ex.getLong(i), s"structural col $i")
    for (i <- 5 until 8) {
      val (a, e) = (ap.getDouble(i), ex.getDouble(i))
      assert(math.abs(a - e) <= math.abs(e) * 0.05, s"percentile col $i: $a vs $e")
    }
  }

  test("profileTable: small table defaults to EXACT count(DISTINCT) — one " +
       "independent no-Expand subtree per column (r16) — big stats default " +
       "to approx_count_distinct (no Expand)") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val small = graft.core.Ops.profileTable(orders, cols)
      .queryExecution.executedPlan.toString
    // exact regime: k single-distinct aggregates (planned WITHOUT Expand —
    // the ×(k+1)-row Expand pipeline was serial on one-row-group inputs),
    // attached as 1-row broadcast nested loops that run as concurrent stages
    assert(small.contains("count(distinct") &&
      !small.contains("approx_count_distinct") && !small.contains("Expand"),
      small)
    val big = graft.core.Ops.profileTable(hugeDf, Seq("vec_id", "s"))
      .queryExecution.executedPlan.toString
    assert(big.contains("approx_count_distinct") && !big.contains("Expand"),
      s"big-regime profile must be the no-Expand HLL++ form:\n$big")
  }

  test("profileTable: forced approx tracks exact distincts within 5%, " +
       "other facts identical") {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    val ap = graft.core.Ops.profileTable(orders, cols, Some(false))
      .collect().map(r => r.getString(0) -> r).toMap
    val ex = graft.core.Ops.profileTable(orders, cols, Some(true))
      .collect().map(r => r.getString(0) -> r).toMap
    assert(ap.keySet == ex.keySet)
    for ((k, a) <- ap) {
      val e = ex(k)
      assert(a.getLong(1) == e.getLong(1) && a.getLong(2) == e.getLong(2),
        s"$k rows/nonnull")
      assert(a.getString(4) == e.getString(4) && a.getString(5) == e.getString(5),
        s"$k min/max")
      assert(math.abs(a.getLong(3) - e.getLong(3)) <= e.getLong(3) * 0.05,
        s"$k distinct: ${a.getLong(3)} vs ${e.getLong(3)}")
    }
  }

  test("statsSaySmall: rowCount rules, bytes fall back, defaultSizeInBytes " +
       "reads as UNKNOWN (r11 ADVICE)") {
    // known-small: a parquet leaf carries real sizeInBytes
    assert(LlmOps.statsSaySmall(orders, 1000000L, 1L << 30).contains(true))
    // known-big: the range lineage
    assert(LlmOps.statsSaySmall(hugeDf, 1000000L, 1L << 30).contains(false))
    // unknown: a lineage whose leaf has no stats — a local relation seen
    // through an aggregate barrier keeps real stats, so synthesize the
    // sentinel directly: anything >= Long.MaxValue/2 must read as None
    // (covered structurally by the guard; value-level check via a frame
    // Catalyst assigns defaultSizeInBytes — a stream-less LogicalRDD)
    val rdd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType))))
    val s = rdd.queryExecution.optimizedPlan.stats
    if (s.rowCount.isEmpty && s.sizeInBytes >= BigInt(Long.MaxValue) / 2)
      assert(LlmOps.statsSaySmall(rdd, 1000000L, 1L << 30).isEmpty)
  }

  test("statsSaySmall: a Project/Filter OVER a stats-less leaf still reads " +
       "UNKNOWN (r12 ADVICE — the scaled sizeInBytes slipped under the " +
       "old sentinel and misread as known-big)") {
    // LogicalRDD leaf: no rowCount, sizeInBytes = defaultSizeInBytes
    val rdd = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(org.apache.spark.sql.Row(1L,
        "payload-payload-payload"))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("x",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType))))
    val leafStats = rdd.queryExecution.optimizedPlan.stats
    assume(leafStats.rowCount.isEmpty &&
      leafStats.sizeInBytes >= BigInt(Long.MaxValue) / 2,
      "precondition: the raw leaf carries the no-stats fallback size")
    // a narrow projection scales sizeInBytes DOWN (row-width ratio) —
    // below the old >= MaxValue/2 sentinel, but the leaf is still
    // stats-less: the structural walk must answer None, never Some(false)
    val projected = rdd.select(col("x")).filter(col("x") > 0)
    val scaled = projected.queryExecution.optimizedPlan.stats
    assume(scaled.sizeInBytes < BigInt(Long.MaxValue) / 2,
      "precondition: projection scaled the fabricated size under the sentinel")
    assert(LlmOps.statsSaySmall(projected, 1000000L, 1L << 30).isEmpty,
      s"stats-less lineage (scaled size ${scaled.sizeInBytes}) must be UNKNOWN")
  }
}
