package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only micro-profiler for the LLM op stages (not part of the driver
  * contract; safe to delete).
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(
      sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.001") + "/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("words")(LlmOps.withWords(docs).agg(sum(size(col("words")))).count())
    time("shingles")(LlmOps.withShingles(LlmOps.withWords(docs)).agg(sum(size(col("shingles")))).count())
    time("sig")(LlmOps.withMinhashSig(LlmOps.withShingles(LlmOps.withWords(docs)), 8).select(col("sig")).count())
    time("bands")(LlmOps.withBandHashes(LlmOps.withMinhashSig(LlmOps.withShingles(LlmOps.withWords(docs)), 8), 4, 2).select(col("bands")).count())
    val sh = LlmOps.shingleTable(docs, "doc_id")
    time("shingleTable mat")(sh.count())
    time("cache read")(sh.select(sum(size(col("shingles")))).count())
    time("cache read2")(sh.select(sum(size(col("shingles")))).count())
    time("sig from cache")(LlmOps.withMinhashSig(sh, 8).select(col("sig")).count())
    time("banded")(LlmOps.bandedSignatures(sh, "doc_id").count())
    val shNoCache = LlmOps.withShingles(LlmOps.withWords(docs))
      .select(col("doc_id"), col("shingles"))
    time("banded nocache")(LlmOps.bandedSignatures(shNoCache, "doc_id").count())
    time("candidates")(LlmOps.minhashCandidatesFrom(sh, "doc_id").count())
    val pairs = LlmOps.minhashCandidatesFrom(sh, "doc_id").persist()
    time("pairs mat")(pairs.count())
    time("clusters loop")(
      LlmOps.duplicateClusters(docs.select(col("doc_id")), "doc_id", pairs).count())
    spark.stop()
  }
}
