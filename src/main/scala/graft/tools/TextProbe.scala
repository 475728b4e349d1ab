package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only cost anatomy for text_quality_filter (not part of the driver
  * contract; safe to delete): at sf1 the query measures ~6.4 s and did not
  * move when round() left the hot path — so where does the time go? Terms
  * are added one at a time over the same scan; each line is the median of
  * 3 noop-sink runs.
  */
object TextProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("PROBE_SF_DIR", "/root/repo/target/sf1")
    val docs = spark.read.parquet(s"$d/documents.parquet")
    graft.functions.GraftFunctions.ensure(spark)
    def med(n: Int)(f: => Unit): Double = {
      val ts = Seq.fill(n) {
        val t = System.nanoTime; f; (System.nanoTime - t) / 1e9
      }
      ts.sorted.apply(n / 2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val words = LlmOps.withWords(docs)
    noop(words.select(col("doc_id"))) // warm
    println(f"scan only                    ${med(3)(noop(docs.select(col("doc_id"))))}%.3f s")
    println(f"+ split(words)               ${med(3)(noop(words.select(col("doc_id"), size(col("words")).as("n"))))}%.3f s")
    println(f"+ stop HOF filter            ${med(3)(noop(words.select(col("doc_id"), expr("size(filter(words, w -> w in ('the', 'a')))").as("s"))))}%.3f s")
    println(f"+ concat_ws octet_length     ${med(3)(noop(words.select(col("doc_id"), octet_length(concat_ws("", col("words"))).as("b"))))}%.3f s")
    println(f"+ regexp_replace             ${med(3)(noop(docs.select(col("doc_id"), octet_length(regexp_replace(col("text"), "[^A-Za-z0-9 ]", "")).as("b"))))}%.3f s")
    println(f"+ graft_symbol_bytes         ${med(3)(noop(docs.select(col("doc_id"), expr("graft_symbol_bytes(text)").as("b"))))}%.3f s")
    println(f"+ regexp_extract_all count   ${med(3)(noop(docs.select(col("doc_id"), size(regexp_extract_all(col("text"), lit("[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"), lit(0))).as("c"))))}%.3f s")
    println(f"+ graft_retoken_count        ${med(3)(noop(docs.select(col("doc_id"), expr("graft_retoken_count(text)").as("c"))))}%.3f s")
    println(f"full query (with sort)       ${med(3)(noop(graft.SparkEntry.queries("text_quality_filter")(spark, d)))}%.3f s")
    spark.stop()
  }
}
