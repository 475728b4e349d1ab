package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only micro-profiler for the hyperplane-LSH search path (not part of
  * the driver contract; safe to delete): where does sim_search_lsh's time
  * go — signature computation, candidate join, or plan analysis?
  */
object LshProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("PROBE_SF_DIR", "/root/testdata/sf0.1")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    def corpus = e.filter(col("vec_id") =!= 0)
    def query = e.filter(col("vec_id") === 0)
    def med(f: => Unit): Double = {
      val ts = Seq.fill(5) {
        val t = System.nanoTime; f; (System.nanoTime - t) / 1e9
      }
      ts.sorted.apply(2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(LlmOps.lshSearch(corpus, query, 10)) // warm
    println(f"full lshSearch    ${med(noop(LlmOps.lshSearch(corpus, query, 10)))}%.3f s")
    println(f"sig only          ${med(noop(LlmOps.withLshSig(corpus).select(col("vec_id"), col("lsh_sig"))))}%.3f s")
    println(f"plan build only   ${med { LlmOps.lshSearch(corpus, query, 10).queryExecution.executedPlan; () }}%.3f s")
    println(s"rows ${e.count()}")
    spark.stop()
  }
}
