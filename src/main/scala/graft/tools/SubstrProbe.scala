package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe behind the ExactSubstr duplicate-test shapes: times the r10
  * count-over-window form (kept HERE as the measurement baseline — it is
  * no longer in the library) against the r11 two-level count + semi-join
  * (LlmOps.duplicatedSpans) and the pass-staged forms, on the uniform
  * Stress corpus AND the adversarial hot-gram corpus (run Stress first so
  * target/stress/docs_big.parquet + docs_hotgram.parquet exist):
  *   sbt "runMain graft.tools.SubstrProbe [nDocs] [passes]"
  *
  * r10 baseline (2M uniform docs, 2026-08-14, window form): staged ×4
  * measured FASTER than the single shuffle (48.6 s vs 72.7 s, identical
  * output) — four quarter-sized window sorts spill less than one
  * full-sized one.
  *
  * r11 (2026-08-14, same host): on the 2M hot-gram corpus (every doc
  * opens with a shared 64-char boilerplate block → each of its ~45
  * 20-grams occurs 2M times) the window form strands each hot gram's 2M
  * positions in ONE task; the two-level form collapses them map-side.
  * Numbers in STRESS.md §ExactSubstr and NOTES.md round-11.
  */
object SubstrProbe {

  /** The r10 duplicate test, verbatim: count-over-window on the raw gram
    * hash. Probe-only — a hot gram's entire position list buffers in one
    * unsplittable window task, which is why the library moved to the
    * two-level count (LlmOps.duplicatedSpans r11 docstring).
    */
  private def spansWindowed(docs: DataFrame, idCol: String, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val grams = docs
      .select(col(idCol),
        posexplode(expr(s"graft_gram_hash(text, $k, ':xs', 15)"))
          .as(Seq("p0", "h")))
      .select(col(idCol), (col("p0") + 1).as("pos"), col("h"))
    val dup = grams
      .withColumn("sites", count(lit(1)).over(Window.partitionBy("h")))
      .filter(col("sites") >= 2)
    val byDoc = Window.partitionBy(idCol).orderBy("pos")
    dup
      .withColumn("brk",
        when(col("pos") - lag("pos", 1).over(byDoc) <= k, 0).otherwise(1))
      .withColumn("grp", sum("brk").over(byDoc))
      .groupBy(col(idCol), col("grp"))
      .agg(min("pos").as("span_start"),
        (max("pos") - min("pos") + k).as("span_len"))
      .select(col(idCol), col("span_start"), col("span_len"))
  }

  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 2000000L
    val passes = if (args.length > 1) args(1).toInt else 4
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(name: String)(f: => Array[org.apache.spark.sql.Row]): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"$name%-44s ${(System.nanoTime() - t0) / 1e9}%8.1fs  ${r.head.toString}")
    }
    def agg(df: DataFrame) =
      df.agg(count(lit(1)), sum(col("span_len"))).collect()
    for ((label, src) <- Seq(
        ("uniform", "/root/repo/target/stress/docs_big.parquet"),
        ("hot-gram", "/root/repo/target/stress/docs_hotgram.parquet"))) {
      if (!new java.io.File(src).exists()) {
        println(s"[skip] $src missing — run Stress first")
      } else {
        val docs = spark.read.parquet(src).filter(col("doc_id") < n)
        time(s"$label r10 window form ${n / 1000000}M docs") {
          agg(spansWindowed(docs, "doc_id"))
        }
        time(s"$label r11 two-level form ${n / 1000000}M docs") {
          agg(graft.ext.LlmOps.duplicatedSpans(docs, "doc_id"))
        }
        time(s"$label r11 staged x$passes ${n / 1000000}M docs") {
          agg(graft.ext.LlmOps.duplicatedSpansStaged(docs, "doc_id",
            passes = passes))
        }
      }
    }
    spark.stop()
  }
}
