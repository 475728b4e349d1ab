package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.LlmOps

/** Dev-only: stage split of the bpe_train key at a given SF dir. */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val v = f
      println(f"[bp] $n%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s"); v
    }
    (1 to 2).foreach { it =>
      val (m, wcF) = time(s"bpeTrain($it)")(
        LlmOps.bpeTrain(docs, 20, driverWordBudgetBytes = 4L << 30))
      println(s"[bp] merges=${m.length}")
      time(s"report-full($it)")(
        LlmOps.bpeTrainReport(docs, 20, driverWordBudgetBytes = 4L << 30)
          .collect())
      time(s"roundtrip-only($it)")(
        wcF.filter(org.apache.spark.sql.functions.concat_ws("",
          org.apache.spark.sql.functions.col("syms")) =!=
          org.apache.spark.sql.functions.col("w")).limit(1).count())
    }
    // Marginal per-round cost of the driver regime's adjacency-scan term
    // (the bpeTrainDriver docstring's measured claim): late rounds merge
    // low-mass pairs, so (t(R_hi) - t(R_lo)) / (R_hi - R_lo) isolates the
    // compare-only scan floor from the mass-proportional re-profile work.
    val roundTiers = Seq(20, 120, 520)
    val tiered = roundTiers.map { r =>
      val t0 = System.nanoTime()
      val (m, _) = LlmOps.bpeTrain(docs, r, driverWordBudgetBytes = 4L << 30)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[bp] rounds=$r%-5d total ${sec}%.2f s (merges=${m.length})")
      (r, sec)
    }
    tiered.sliding(2).foreach { case Seq((rLo, tLo), (rHi, tHi)) =>
      println(f"[bp] marginal ${(tHi - tLo) / (rHi - rLo) * 1000}%.2f ms/round over rounds $rLo->$rHi")
    }
    spark.stop()
  }
}
