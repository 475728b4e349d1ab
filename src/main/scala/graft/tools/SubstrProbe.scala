package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind duplicatedSpansStaged: times the single-shuffle form
  * against the pass-staged form on the Stress corpus (run Stress first so
  * target/stress/docs_big.parquet exists):
  *   sbt "runMain graft.tools.SubstrProbe [nDocs] [passes]"
  *
  * What it established (2M fixture docs, 2026-08-14): staged at 4 passes
  * measured FASTER than the single shuffle (48.6 s vs 72.7 s, identical
  * output) — each pass re-runs the codegen'd explode over the whole
  * corpus but sorts/shuffles only its hash slice, and four quarter-sized
  * window sorts spill less than one full-sized one. So above the spill
  * threshold the dial wins on BOTH disk (peak footprint ~1/passes — the
  * bound that would have kept the 10M-doc form's ~100 GB gram spill,
  * ENOSPC on this box, inside budget) and wall-clock; below it the
  * re-explode CPU makes passes=1 the right default.
  */
object SubstrProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet("/root/repo/target/stress/docs_big.parquet")
      .filter(col("doc_id") < n)
    def time(name: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-36s ${(System.nanoTime() - t0) / 1e9}%8.1fs  ${r.head.toString}")
    }
    time(s"spans single-shuffle ${n / 1000000}M docs") {
      graft.ext.LlmOps.duplicatedSpans(docs, "doc_id")
        .agg(count(lit(1)), sum(col("span_len"))).collect()
    }
    time(s"spans staged x$passes ${n / 1000000}M docs") {
      graft.ext.LlmOps.duplicatedSpansStaged(docs, "doc_id", passes = passes)
        .agg(count(lit(1)), sum(col("span_len"))).collect()
    }
    spark.stop()
  }
}
