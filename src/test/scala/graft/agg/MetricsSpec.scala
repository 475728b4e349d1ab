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
}
