package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only: stage split of the bpe_encode key at a given SF dir. */
object BpeEncodeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/target/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time[T](n: String)(f: => T): T = {
      val t0 = System.nanoTime(); val v = f
      println(f"[be] $n%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s"); v
    }
    (1 to 2).foreach { it =>
      val (merges, wcFinal, auditOpt) = time(s"train($it)")(
        LlmOps.bpeTrainFull(docs, 20, driverWordBudgetBytes = 4L << 30))
      val words = docs.select(explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "").distinct()
      val enc = time(s"encode+ckpt($it)")(
        LlmOps.bpeEncode(words, merges).localCheckpoint())
      val ok = time(s"parity-fp($it)") {
        val (tn, tfp) = auditOpt match {
          case Some(a) => (a.wordCount, a.symsFp)
          case None => LlmOps.bpeSymsFingerprint(wcFinal, "w", "syms")
        }
        val (en, efp) = LlmOps.bpeSymsFingerprint(enc, "w", "tokens")
        en == tn && efp == tfp
      }
      println(s"[be] parity_ok=$ok")
      time(s"per-doc-agg($it)")(
        docs.select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
          .filter(col("w") =!= "")
          .join(enc.select(col("w"), size(col("tokens")).as("n_tok")), "w")
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"),
            sum(length(col("w"))).as("n_chars"))
          .write.format("noop").mode("overwrite").save())
    }
    spark.stop()
  }
}
