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
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$name%-22s ${(System.nanoTime() - t0) / 1e9}%8.2fs  rows=$n")
    }
    time("words")(LlmOps.withWords(docs).agg(sum(size(col("words")))).count())
    time("shingles")(LlmOps.withShingles(LlmOps.withWords(docs)).agg(sum(size(col("shingles")))).count())
    time("sig")(LlmOps.withMinhashSig(LlmOps.withShingles(LlmOps.withWords(docs)), 8).select(col("sig")).count())
    time("bands")(LlmOps.withBandHashes(LlmOps.withMinhashSig(LlmOps.withShingles(LlmOps.withWords(docs)), 8), 4, 2).select(col("bands")).count())
    time("candidates")(LlmOps.minhashCandidates(docs, "doc_id").count())
    // variant A: codegen off
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    time("cand nocodegen")(LlmOps.minhashCandidates(docs, "doc_id").count())
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // variant B: banded side cached before self-join
    val banded = LlmOps.withBandHashes(
        LlmOps.withMinhashSig(LlmOps.withShingles(LlmOps.withWords(docs)), 8), 4, 2)
      .select(col("doc_id"), explode(col("bands")).as("band")).cache()
    banded.count()
    time("cand cached")(
      banded.as("x").join(banded.as("y"), "band")
        .filter(col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct().count())
    spark.stop()
  }
}
