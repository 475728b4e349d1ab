package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-row scale probe: the migrate-shaped scan→transform→write at
  * 100M rows (the Stress default dropped to 10M after the r11 ENOSPC —
  * right call for the full suite, but the 10M migrate row is startup-
  * dominated and understates sustained throughput ~6×). This probe pays
  * only the one table + one row, so 100M fits the box: the table is the
  * SAME deterministic orders-shaped generator as [[Stress]], the
  * pipeline the same MigrateJob.transformOnly write, the protocol the
  * same median-of-3 with per-sample GC reaping. Its output line is
  * hand-appended to STRESS.md below the generated-content marker (the
  * preserved region), cited to this probe for reproduction:
  *   sbt "runMain graft.tools.MigrateProbe [nRows]"
  */
object MigrateProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 100000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-migrate-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "96g"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/root/repo/target/stress_migrate"
    val src = s"$base/orders_big.parquet"
    spark.range(n).select(
      col("id").as("o_orderkey"),
      pmod(xxhash64(col("id")), lit(n / 10)).as("o_custkey"),
      element_at(array(lit("O"), lit("F"), lit("P")), (col("id") % 3 + 1).cast("int")).as("o_orderstatus"),
      round(pmod(xxhash64(col("id") + 7), lit(10000000L)) / 100.0, 2).as("o_totalprice"),
      timestamp_micros(lit(788918400000000L) + col("id") % 200000000000L).as("o_orderdate"),
      concat(lit("P"), (col("id") % 5).cast("string")).as("o_orderpriority"))
      .write.mode("overwrite").parquet(src)

    def once(): Double = {
      val t0 = System.nanoTime()
      graft.migrate.MigrateJob.transformOnly(spark.read.parquet(src),
          graft.migrate.MigrateJob.Config(pkCols = Seq("o_orderkey"),
            columnsToExclude = Seq("o_orderpriority")))
        .write.mode("overwrite").parquet(s"$base/migrated.parquet")
      val secs = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(2000)
      secs
    }
    val samples = Seq(once(), once(), once())
    val secs = StressProtocol.median(samples)
    println(f"migrate scan→transform→write ${n / 1000000}M rows | " +
      f"${StressProtocol.cell(samples)} | ${(n / secs).toLong}%,d rows/s")
    spark.stop()
  }
}
