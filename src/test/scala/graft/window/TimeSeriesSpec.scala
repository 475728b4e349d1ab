package graft.window

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private val rows = Seq(
    // (user, ts_us, id)
    ("u1", 100L, 1L), ("u1", 200L, 2L), ("u1", 300L, 3L),
    ("u2", 150L, 4L)).toDF("user", "ts_us", "id")

  test("latestPerKey returns the newest N per key in rank order") {
    val out = TimeSeries.latestPerKey(rows, Seq("user"),
      Seq(col("ts_us").desc, col("id").desc), 2)
      .select("user", "rn", "id").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSet
    assert(out == Set(("u1", 1, 3L), ("u1", 2, 2L), ("u2", 1, 4L)))
  }

  test("sessionize splits on gaps >= threshold only") {
    val ev = Seq(("u", 0L), ("u", 50L), ("u", 1000L), ("u", 1040L), ("u", 5000L))
      .toDF("user", "ts")
    val out = TimeSeries.sessionize(ev, "user", col("ts"), 900L)
      .select(col("ts"), col("session_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0L) == out(50L))         // gap 50 < 900
    assert(out(1000L) == out(1040L))    // gap 40 < 900
    assert(out(50L) != out(1000L))      // gap 950 >= 900
    assert(out(1040L) != out(5000L))    // gap 3960 >= 900
  }

  test("runningTotal accumulates within key, resets across keys") {
    val df = Seq(("a", 1, 10.0), ("a", 2, 5.0), ("b", 1, 7.0)).toDF("k", "seq", "v")
    val out = TimeSeries.runningTotal(df, Seq("k"), Seq(col("seq")), col("v"), "rt")
      .select("k", "seq", "rt").collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(out(("a", 1)) == 10.0 && out(("a", 2)) == 15.0 && out(("b", 1)) == 7.0)
  }

  test("bucketDaily counts by calendar day") {
    val df = Seq("2024-01-01 03:00:00", "2024-01-01 23:59:59", "2024-01-02 00:00:00")
      .map(java.sql.Timestamp.valueOf).toDF("ts")
    val out = TimeSeries.bucketDaily(df, "ts").orderBy("day").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(2L, 1L))
  }
}
