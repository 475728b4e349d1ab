package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.sources.{Filter, GreaterThanOrEqual, LessThan}
import graft.SparkSpec

/** The connector-seam pushdown proof (r12 VERDICT item 4): the predicate
  * shapes the CDM origin scan needs — token-range slice (P4), writetime
  * floor (P5), column subset (P1) — must arrive INSIDE a DSv2 source, the
  * way docs/04-cdm-approach.md:290-327 requires of the real Cassandra
  * scan. Pinned against [[GraftRangeSource]]: plan-level (the scan's
  * pushedFilters / pruned readSchema / eliminated slices) AND value-level
  * (the source's own filter evaluation must agree with Spark's).
  */
class PushdownSpec extends SparkSpec {

  private val N = 1000L
  private val Slices = 8

  private def ranged: DataFrame =
    spark.read.format(classOf[GraftRangeSource].getName)
      .option("rows", N.toString).option("slices", Slices.toString).load()

  /** The single GraftRangeScan in the executed plan (AQE-unwrapped: an
    * aggregate that does NOT push keeps its exchange, so AQE wraps the
    * tree in an AdaptiveSparkPlanExec leaf `collect` can't see through).
    */
  private def scanOf(df: DataFrame): GraftRangeScan = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val scans = plan.collect { case b: BatchScanExec => b.scan }
    assert(scans.size == 1, s"expected exactly one v2 scan, got ${scans.size}")
    scans.head.asInstanceOf[GraftRangeScan]
  }

  private def pushedOn(s: GraftRangeScan, col: String): Seq[Filter] =
    s.pushed.toSeq.filter(_.references.contains(col))

  test("token-range + writetime predicates and the projection all cross " +
       "into the source (P4/P5/P1 shapes)") {
    val lo = GraftRangeSource.tokOf(300)
    val hi = GraftRangeSource.tokOf(700)
    val minWt = GraftRangeSource.WriteTimeBase + 400
    val q = ranged
      .filter(col("tok") >= lo && col("tok") < hi) // P4: partitioner-token slice
      .filter(col("wt") >= minWt)                  // P5: incremental floor
      .select(col("id"), col("payload"))           // P1: column subset
    val s = scanOf(q)
    assert(pushedOn(s, "tok").exists { case GreaterThanOrEqual("tok", v) => v == lo; case _ => false }
      && pushedOn(s, "tok").exists { case LessThan("tok", v) => v == hi; case _ => false },
      s"token range must be pushed, got ${s.pushed.mkString(", ")}")
    assert(pushedOn(s, "wt").exists { case GreaterThanOrEqual("wt", v) => v == minWt; case _ => false },
      "writetime floor must be pushed")
    // projection pruned INSIDE the scan: tok/wt serve the pushed filters
    // only and never leave the source
    assert(s.required.fieldNames.toSet == Set("id", "payload"),
      s"readSchema must be the pruned subset, got ${s.required.fieldNames.mkString(",")}")
    // value-level: the source's evaluation agrees with an unpushed compute
    val expected = (0L until N)
      .filter(i => GraftRangeSource.tokOf(i) >= lo && GraftRangeSource.tokOf(i) < hi)
      .filter(i => GraftRangeSource.wtOf(i) >= minWt)
      .map(i => (i, GraftRangeSource.payloadOf(i))).toSet
    assert(q.collect().map(r => (r.getLong(0), r.getString(1))).toSet == expected)
    assert(expected.nonEmpty, "degenerate test: the slice matched nothing")
  }

  test("monotone pushed bounds ELIMINATE input slices at planning time " +
       "(the connector's token-range partition skip)") {
    // id >= 900 of 1000 rows in 8 slices of 125 → only the last slice
    val q = ranged.filter(col("id") >= 900L)
    val s = scanOf(q)
    assert(s.planInputPartitions().length == 1,
      "7 of 8 id-slices lie wholly below the bound and must not plan")
    assert(q.count() == 100)
    // writetime floors prune the same way (wt is monotone in id)
    val q2 = ranged.filter(col("wt") >= GraftRangeSource.wtOf(750))
    assert(scanOf(q2).planInputPartitions().length == 2,
      "wt floor at row 750 keeps exactly the last 2 of 8 slices")
    assert(q2.count() == 250)
    // a tok (hash) predicate filters rows but cannot eliminate slices
    val q3 = ranged.filter(col("tok") >= 0L)
    assert(scanOf(q3).planInputPartitions().length == Slices)
  }

  test("unsupported predicates stay residual and Spark re-applies them " +
       "(no silent wrong answers from over-claiming)") {
    val q = ranged.filter(col("payload").contains("99")).select(col("id"))
    val s = scanOf(q)
    assert(!s.pushed.exists(_.references.contains("payload")),
      "StringContains is not absorbable — it must NOT be claimed as pushed")
    val expected = (0L until N).filter(i => GraftRangeSource.payloadOf(i).contains("99"))
    assert(q.collect().map(_.getLong(0)).sorted.toSeq == expected)
  }

  test("the MigrateJob chain itself pushes: transformOnly's incremental " +
       "writetime filter + projection arrive inside the source") {
    val cfg = graft.migrate.MigrateJob.Config(
      pkCols = Seq("id"),
      columnsToTarget = Seq("id", "payload", "wt"),
      writetimeCol = Some("wt"),
      minWritetime = Some(GraftRangeSource.wtOf(400)))
    val out = graft.migrate.MigrateJob.transformOnly(ranged, cfg)
    val s = scanOf(out)
    assert(pushedOn(s, "wt").exists {
      case GreaterThanOrEqual("wt", v) => v == GraftRangeSource.wtOf(400)
      case _ => false
    }, s"Ops.incremental must reach the source as a pushed filter, got ${s.pushed.mkString(", ")}")
    assert(s.required.fieldNames.toSet == Set("id", "payload", "wt"),
      "the P1 projection must prune the scan to the target columns")
    assert(s.planInputPartitions().length == 5,
      "the pushed floor at row 400 eliminates the first 3 of 8 slices")
    assert(out.count() == 600)
  }

  test("global COUNT/MIN/MAX push COMPLETELY into the source (r13): no " +
       "aggregate node over the scan, one source-computed row, values " +
       "match the unpushed reference") {
    val minWt = GraftRangeSource.wtOf(250)
    val q = ranged.filter(col("wt") >= minWt)
      .agg(count(lit(1)).as("n"), min(col("id")).as("min_id"),
        max(col("wt")).as("max_wt"))
    val s = scanOf(q)
    assert(s.agg.isDefined, "aggregation must reach the source")
    assert(s.description().contains("pushedAggregates"), s.description())
    // complete pushdown: the scan plans ONE partition and the physical
    // plan carries NO hash/sort aggregate over it
    assert(s.planInputPartitions().length == 1)
    val plan = q.queryExecution.executedPlan.toString
    assert(!plan.contains("HashAggregate") && !plan.contains("SortAggregate"),
      s"aggregate must not replan over the scan:\n$plan")
    val row = q.collect()(0)
    assert(row.getLong(0) == 750 && row.getLong(1) == 250 &&
      row.getLong(2) == GraftRangeSource.wtOf(N - 1))
    // unpushed reference: a repartition barrier blocks aggregate pushdown,
    // so the same aggregates compute in Spark over source rows
    val ref = ranged.filter(col("wt") >= minWt).repartition(4)
      .agg(count(lit(1)), min(col("id")), max(col("wt"))).collect()(0)
    assert(ref.getLong(0) == row.getLong(0) && ref.getLong(1) == row.getLong(1)
      && ref.getLong(2) == row.getLong(2))
  }

  test("aggregate pushdown declines grouped/unsupported shapes — Spark " +
       "keeps its own aggregate and results stay correct") {
    // payload min is not absorbable (string) → source must refuse
    val q = ranged.agg(min(col("payload")).as("m"))
    val s = scanOf(q)
    assert(s.agg.isEmpty, "string aggregate must not push")
    assert(q.collect()(0).getString(0) == "p0")
    // grouped aggregates must not push either (no groupBy support claimed)
    val g = ranged.groupBy(col("tok") % 2).agg(count(lit(1)).as("n"))
    val sg = scanOf(g)
    assert(sg.agg.isEmpty, "grouped aggregate must not push")
    assert(g.collect().map(_.getLong(1)).sum == N)
  }

  test("empty match set under a pushed aggregate: COUNT 0, MIN/MAX null") {
    val q = ranged.filter(col("id") >= (N + 10))
      .agg(count(lit(1)).as("n"), min(col("id")).as("m"))
    val s = scanOf(q)
    assert(s.agg.isDefined)
    val row = q.collect()(0)
    assert(row.getLong(0) == 0 && row.isNullAt(1))
  }
}
