package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Observability aggregates — the reference's validation + monitoring core
  * (SURVEY §2.4 A1–A10): per-table counts (validate_migration.py:28-39),
  * grouped op counts (simulate_app_traffic.py:156-203), error-budget ratios
  * (cdm.properties:38; docs/03-dse-tooling.md:226-228), Prometheus-style
  * rates (06-validation-monitoring.md:463-487) and latency percentiles
  * (docs/05-zdm-approach.md:588-597).
  *
  * Scale posture: every aggregate here is a hash aggregate with map-side
  * partial aggregation — one shuffle of the (small) group space, never of
  * raw rows. Sums over doubles go through DECIMAL so results are exact and
  * independent of partitioning (double addition is order-dependent, which
  * would make results nondeterministic at 100 TB).
  */
object Metrics {

  /** Exact decimal sum of a double column (associative → deterministic). */
  def decSum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DecimalType(38, scale))

  /** A2 — grouped counts, e.g. ops by type. */
  def countByGroup(df: DataFrame, cols: Seq[String]): DataFrame =
    df.groupBy(cols.map(col): _*).agg(count(lit(1)).as("n"))

  /** A5 — error ratio gate: one row (total, errors, ratio). The ratio is a
    * single double division — deterministic across engines.
    */
  def errorRatio(df: DataFrame, isError: Column): DataFrame =
    df.agg(count(lit(1)).as("total"),
        count(when(isError, 1)).as("errors"))
      .select(col("total"), col("errors"),
        (col("errors").cast("double") / col("total").cast("double")).as("ratio"))

  /** A6 — tumbling-window event rate (Prometheus rate(x[5m]) analog).
    * Emits the window start as epoch-micros so results are engine-portable.
    */
  def rate(df: DataFrame, ts: String, width: String): DataFrame =
    df.groupBy(window(col(ts), width).as("w"))
      .agg(count(lit(1)).as("n"))
      .select(unix_micros(col("w.start")).as("win_start"), col("n"))

  /** A7 — exact latency percentiles. `percentile` (exact, interpolating) is
    * used rather than percentile_approx so the oracle can reproduce it;
    * at 100 TB swap in percentile_approx (mergeable sketch, same shape).
    */
  def latencyPercentiles(df: DataFrame, c: String): DataFrame =
    df.agg(
      expr(s"percentile($c, 0.5)").as("p50"),
      expr(s"percentile($c, 0.95)").as("p95"),
      expr(s"percentile($c, 0.99)").as("p99"))
}
