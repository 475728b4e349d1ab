package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-row scale probe: ExactSubstr staged-to-disk at 10M docs — the
  * design-scale tier the full Stress suite stopped short of (its default
  * nDocs = n/10 = 1M after the r11 ENOSPC retreat, so the committed
  * staged row had only ever been measured at 1M). Same deterministic
  * doc generator as [[Stress]] (30 × 8-char md5 words, every 10th doc a
  * near-duplicate of its predecessor), same
  * `duplicatedSpansStagedToDisk(…, passes = 8)` pipeline, same
  * median-of-3 protocol with per-sample GC reaping. The staged form is
  * WHY this fits: each pass's gram-slice shuffle (~1/8 of the ~70 GB
  * 10M-doc gram table) is reclaimed before the next pass shuffles, and
  * only output-proportional duplicated positions persist between
  * passes. Its output line is hand-appended to STRESS.md below the
  * generated-content marker, cited to this probe for reproduction:
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.tools.SubstrScaleProbe [nDocs]"
  */
object SubstrScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-substr-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "96g"))
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/root/repo/target/stress_substr"
    val src = s"$base/docs_big.parquet"
    spark.range(n).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 29),
               j -> substr(md5(cast((if(id % 10 = 0, id - 1, id)) * 31 + j as string)), 1, 8)))""")
        .as("text"))
      .write.mode("overwrite").parquet(src)

    def once(): Double = {
      val t0 = System.nanoTime()
      graft.ext.LlmOps.duplicatedSpansStagedToDisk(
          spark.read.parquet(src), "doc_id", s"$base/passes", passes = 8)
        .agg(count(lit(1)), sum(col("span_len"))).collect()
      val secs = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(2000)
      secs
    }
    val first = once()
    val samples = first +: Seq.fill(StressProtocol.samplesNeeded(first) - 1)(once())
    val secs = StressProtocol.median(samples)
    println(f"ExactSubstr spans k=20 ${n / 1000000}M docs staged-to-disk x8 | " +
      f"${StressProtocol.cell(samples)} | ${(n / secs).toLong}%,d docs/s")
    spark.stop()
  }
}
