package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-section scale probe: trained-IVF build at 30M vectors — the
  * tier past the full Stress suite's 10M cap (its xl pair is deliberately
  * capped: the fixed-c 1M→10M growth factor IS its measurement). This
  * probe instead exercises the PRODUCTION posture at 3× that corpus:
  * auto-c (√N ≈ 5477), centroids trained on the standard c×16 id-prefix
  * sample, then the full-corpus TWO-LEVEL assignment (the path
  * kmeansAssignAuto selects above the c=1024 crossover, paying
  * ~(1+probeG)·√c dots/vector instead of flat's c — at c=5477 a ~37×
  * flop cut). Same deterministic vector generator as [[Stress]], same
  * median-of-3 protocol for long rows with per-sample GC reaping.
  * Output lines are hand-appended to STRESS.md below the
  * generated-content marker, cited here for reproduction:
  *   SPARK_DRIVER_MEM=96g sbt "runMain graft.tools.IvfScaleProbe [nVecs]"
  */
object IvfScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 30000000L
    // optional sample cap (args(1)): the full-corpus assignment row runs
    // ~45 min/sample on this box — when wall-clock can't fund the
    // protocol's median-of-3, a capped run records what it measured and
    // SAYS SO in the STRESS row instead of skipping the tier silently
    val maxSamples = if (args.length > 1) args(1).toInt else Int.MaxValue
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-ivf-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "96g"))
      .config("spark.cleaner.periodicGC.interval", "2min")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = "/root/repo/target/stress_ivf"
    val src = s"$base/vecs.parquet"
    // idempotent generation: a restarted probe reuses the corpus (the
    // generator is deterministic, so the data is identical either way)
    if (!new java.io.File(s"$src/_SUCCESS").exists())
      spark.range(n).select(
        col("id").as("vec_id"),
        expr("""transform(sequence(0, 63),
                 j -> cast(pmod(hash(id * 64 + j), 1000) as float) / 1000.0f)""")
          .as("embedding"),
        (col("id") % 1000).cast("int").as("label"))
        .write.mode("overwrite").parquet(src)

    val cAuto = graft.ext.LlmOps.kmeansAutoC(n)

    def bench(name: String, rows: Long)(body: => Unit): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        body
        val secs = (System.nanoTime() - t0) / 1e9
        println(f"[sample] $name: $secs%.1f s") // visible per-sample
        System.gc(); Thread.sleep(2000)
        secs
      }
      val first = once()
      val wanted = math.min(maxSamples, StressProtocol.samplesNeeded(first))
      val samples = first +: Seq.fill(wanted - 1)(once())
      val secs = StressProtocol.median(samples)
      println(f"| $name | ${StressProtocol.cell(samples)} | ${(rows / secs).toLong}%,d |")
      secs
    }

    // train on the c×16 id-prefix sample (standard IVF practice — the
    // Stress suite's posture) so the pair isolates the two dominant costs
    var cents: org.apache.spark.sql.DataFrame = null
    bench(s"kmeans train c=$cAuto on c*16 sample (${n / 1000000}M corpus)",
        cAuto.toLong * 16) {
      // the id-prefix sample prunes to ~1 parquet row group — REDISTRIBUTE
      // it before training, or every Lloyd iteration's sample×c argmax
      // (~480M candidate rows here) runs in ONE task (a real cluster's
      // sampled training set is likewise repartitioned to the executor
      // count before iterating)
      cents = graft.ext.LlmOps.kmeansCentroids(
        spark.read.parquet(src).filter(col("vec_id") < cAuto.toLong * 16)
          .repartition(cpus.toInt),
        cAuto, iters = 2)
      cents.count() // materialize the trained table
      ()
    }
    bench(s"IVF two-level assignment c=$cAuto ${n / 1000000}M vectors", n) {
      graft.ext.LlmOps.kmeansAssignToHier(spark.read.parquet(src), cents)
        .agg(count(lit(1)), avg(col("ccos"))).collect()
      ()
    }
    spark.stop()
  }
}
