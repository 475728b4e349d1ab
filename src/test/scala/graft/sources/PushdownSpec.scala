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

  /** The single GraftRangeScan in the executed plan. */
  private def scanOf(df: DataFrame): GraftRangeScan = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b.scan
    }
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
}
