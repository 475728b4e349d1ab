package graft.tools

import org.apache.spark.sql.SparkSession
import graft.ext.LlmOps

/** Dev-only micro-profiler for the pairwise-salt change (not part of the
  * driver contract; safe to delete): does salting the (label, sub) pair
  * join actually spread the in-cell pairwise work across tasks, or does
  * AQE re-coalesce the byte-tiny shuffle into a handful of partitions and
  * keep the join output single-threaded?
  */
object SaltProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("PROBE_SF_DIR", "/root/repo/target/sf1")
    val e = spark.read.parquet(s"$d/embeddings.parquet")
    def med(n: Int)(f: => Unit): Double = {
      val ts = Seq.fill(n) {
        val t = System.nanoTime; f; (System.nanoTime - t) / 1e9
      }
      ts.sorted.apply(n / 2)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    noop(LlmOps.knnJoin(e, 3)) // warm
    for ((label, chunk) <- Seq(
        ("unsalted (chunk=MaxValue)", Int.MaxValue),
        ("salted (chunk=512)", 512),
        ("salted (chunk=128)", 128))) {
      println(f"$label%-28s ${med(3)(noop(LlmOps.knnJoin(e, 3, saltChunk = chunk)))}%.3f s")
    }
    // where the pair tasks actually ran: final AQE plan of the salted form
    val q = LlmOps.knnJoin(e, 3, saltChunk = 512)
    noop(q)
    println(q.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Exchange") || l.contains("SortMergeJoin")
        || l.contains("AQEShuffleRead") || l.contains("ShuffledHashJoin"))
      .mkString("\n"))
    spark.stop()
  }
}
