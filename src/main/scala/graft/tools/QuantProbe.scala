package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind the int8 approx-stage kernel swap: times the float
  * brute-force top-10 against the quantized code scan on the Stress
  * vector tables (run Stress first so target/stress/emb_xl10 +
  * emb_codes_xl exist):
  *   sbt "runMain graft.tools.QuantProbe"
  *
  * What it established (10M × 64-dim vectors, 2026-08-14): with the
  * approx stage written as interpreted aggregate/zip_with lambdas the
  * code scan measured 10.0 s vs 2.6 s for the float brute scan — 4×
  * SLOWER despite reading 1/4 the bytes, inverting the operator's
  * premise (the per-element lambda interpretation cost swamps the
  * bandwidth saving). Rewritten on the codegen'd graft_dot kernel
  * (extended to tinyint arrays) the same scan measured 2.7 s vs the
  * float brute's 4.7 s back-to-back (codes parquet 575 MB vs float
  * 806 MB) — the bandwidth advantage realized. Same lesson as the text
  * family's
  * graft_* expressions: at corpus scale, every hot-path element
  * operation must live inside whole-stage codegen.
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = "/root/repo/target/stress"
    val emb = spark.read.parquet(s"$base/emb_xl10.parquet")
    val codes = spark.read.parquet(s"$base/emb_codes_xl.parquet")
    val q = emb.filter(col("vec_id") === 0)
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    time("warm: count both tables") { emb.count(); codes.count() }
    time("float brute-force top-10") {
      graft.ext.LlmOps.cosineTopK(emb.filter(col("vec_id") =!= 0), q, 10).collect()
    }
    time("int8 code-scan top-10 (graft_dot kernel)") {
      graft.ext.LlmOps.quantizedSearchCodes(codes, emb, q, 10).collect()
    }
    spark.stop()
  }
}
