package graft.agg

import org.apache.spark.sql.functions._
import graft.SparkSpec

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  test("decSum is exact and partitioning-independent") {
    val vals = Seq.fill(1000)(0.1)
    val one = vals.toDF("v").repartition(1).agg(Metrics.decSum(col("v"))).collect().head.getDecimal(0)
    val many = vals.toDF("v").repartition(13).agg(Metrics.decSum(col("v"))).collect().head.getDecimal(0)
    assert(one == many)
    assert(one.toString == "100.00")   // plain double sum gives 99.9999999999986
  }

  test("errorRatio computes total/errors/ratio") {
    val df = (1 to 10).map(i => i -> (i % 5 == 0)).toDF("id", "err")
    val r = Metrics.errorRatio(df, col("err")).collect().head
    assert(r.getLong(0) == 10 && r.getLong(1) == 2 && r.getDouble(2) == 0.2)
  }

  test("rate buckets events into aligned tumbling windows") {
    val df = Seq("2024-01-01 00:00:30", "2024-01-01 00:04:59", "2024-01-01 00:05:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val r = Metrics.rate(df, "ts", "5 minutes").orderBy("win_start").collect()
    assert(r.map(_.getLong(1)).toSeq == Seq(2L, 1L))
  }

  test("latencyPercentiles: p50 of 1..100 is 50.5") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val r = Metrics.latencyPercentiles(df, "v").collect().head
    assert(r.getDouble(0) == 50.5)
    assert(r.getDouble(2) > r.getDouble(1))
  }

  test("countByGroup matches manual grouping") {
    val df = Seq("a", "b", "a", "c", "a").toDF("g")
    val m = Metrics.countByGroup(df, Seq("g")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("a" -> 3L, "b" -> 1L, "c" -> 1L))
  }

  /** Write an events-shaped fixture and return a dir the registry
    * closures accept (Common.events detects the µs-timestamp shape).
    */
  private def eventsFixture(name: String,
                            rows: Seq[(Long, java.sql.Timestamp, Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$name").toString
    rows.map { case (id, ts, uid, et) => (id, ts, uid, et, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def ts(day: Int, minute: Int) =
    java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:$minute%02d:00")

  test("funnel_steps: strict first-occurrence ordering on a hand fixture") {
    // user 10 completes all three in order; user 20's click precedes its
    // first view so it stalls at view (its purchase can't count either);
    // user 30 has view→purchase but no click; user 40 never enters
    val dir = eventsFixture("funnel", Seq(
      (1L, ts(1, 1), 10L, "view"), (2L, ts(1, 2), 10L, "click"),
      (3L, ts(1, 3), 10L, "purchase"),
      (4L, ts(1, 1), 20L, "click"), (5L, ts(1, 2), 20L, "view"),
      (6L, ts(1, 3), 20L, "purchase"),
      (7L, ts(1, 1), 30L, "view"), (8L, ts(1, 2), 30L, "purchase"),
      (9L, ts(1, 1), 40L, "error")))
    val got = graft.SparkEntry.queries("funnel_steps")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1, "view", 3L), (2, "click", 1L), (3, "purchase", 1L)),
      s"got $got")
  }

  test("funnel_steps: same-timestamp events do not complete a step (strict >)") {
    val dir = eventsFixture("funnel2", Seq(
      (1L, ts(1, 1), 10L, "view"), (2L, ts(1, 1), 10L, "click")))
    val got = graft.SparkEntry.queries("funnel_steps")(spark, dir)
      .collect().map(r => (r.getInt(0), r.getLong(2))).toSeq
    assert(got == Seq((1, 1L), (2, 0L), (3, 0L)), s"got $got")
  }

  test("retention_cohorts: first-seen day cohorts, one count per active day") {
    // user 10 first seen day 1, active days 1 and 3 (twice on day 3 —
    // counted once); user 20 first seen day 2, active day 2 only
    val dir = eventsFixture("retention", Seq(
      (1L, ts(1, 1), 10L, "view"), (2L, ts(3, 1), 10L, "click"),
      (3L, ts(3, 2), 10L, "view"),
      (4L, ts(2, 1), 20L, "view")))
    val got = graft.SparkEntry.queries("retention_cohorts")(spark, dir)
      .collect().map(r => (r.getDate(0).toString, r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(
      ("2024-01-01", 0, 1L), ("2024-01-01", 2, 1L), ("2024-01-02", 0, 1L)),
      s"got $got")
  }
}
