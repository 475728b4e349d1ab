package graft.window

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series window operators — the `user_activity` table's semantics
  * (reference: lab/init-scripts/01-create-schema.cql:46-53 — composite
  * partition key + DESC clustering = "newest first per (user, day)") and the
  * monitoring dashboards' sliding rates (06-validation-monitoring.md:463-487).
  *
  * Scale posture: each operator shuffles once on its partition keys; window
  * evaluation is then partition-local. A hot key (one user with millions of
  * events) lands in one task — acceptable for per-user activity; for truly
  * skewed streams pre-aggregate per (key, coarse-bucket) first.
  */
object TimeSeries {

  /** W1 — latest N rows per key, the DESC-clustering read pattern. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   n: Int): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
  }

  /** W2 — daily bucketing (activity_date = date(activity_time)). */
  def bucketDaily(df: DataFrame, ts: String): DataFrame =
    df.groupBy(to_date(col(ts)).as("day")).agg(count(lit(1)).as("n"))

  /** W3 — sliding-window rate: `width` window sliding by `slide`. Window
    * start emitted as epoch-micros for engine portability.
    */
  def slidingRate(df: DataFrame, ts: String, width: String,
                  slide: String): DataFrame =
    df.groupBy(window(col(ts), width, slide).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start"), col("n"))

  /** W4 — running total per key in time order (exact decimal sum). */
  def runningTotal(df: DataFrame, keys: Seq[String], order: Seq[Column],
                   value: Column, as: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(as, sum(value).over(w))
  }

  /** W5 — session windows: consecutive events of one key belong to the same
    * session while the gap to the previous event is < `gapMicros`.
    * Implemented as the classic lag + cumulative-sum sessionizer over
    * epoch-micros, which is engine-portable (Structured Streaming's
    * session_window is the streaming twin — see stream/DualWrite).
    */
  def sessionize(df: DataFrame, key: String, tsMicros: Column,
                 gapMicros: Long): DataFrame = {
    val byTime = Window.partitionBy(col(key)).orderBy(tsMicros)
    df.withColumn("_ts_us", tsMicros)
      .withColumn("_new",
        when(lag(tsMicros, 1).over(byTime).isNull, 1)
          .when(tsMicros - lag(tsMicros, 1).over(byTime) >= lit(gapMicros), 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("_new")).over(
        byTime.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("_new")
  }
}
