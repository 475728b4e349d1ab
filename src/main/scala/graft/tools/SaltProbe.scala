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

    // cost anatomy of one pairwise pass (salted, default chunk): is the
    // time in pair ENUMERATION, the dot product, or round()'s BigDecimal?
    import org.apache.spark.sql.functions.{col, count, expr, lit, sqrt, sum}
    import graft.functions.GraftFunctions
    GraftFunctions.ensure(spark)
    def pairSides() = {
      val cells = LlmOps.withPairCells(
        e.select(col("vec_id"), col("label"), col("embedding")), 4096)
        .withColumn("nrm", sqrt(expr("graft_dot(embedding, embedding)")))
      val kept = cells.filter(col("bucket_n") <= 4096)
      LlmOps.withPairSalt(kept, 512)
    }
    def joined = { val (xs, ys) = pairSides()
      xs.as("x").join(ys.as("y"),
        col("x.label") === col("y.label") && col("x.sub") === col("y.sub") &&
          col("x.salt") === col("y.salt") && col("x.vec_id") =!= col("y.vec_id")) }
    def agg1(c: org.apache.spark.sql.Column): Unit =
      noop(joined.agg(c.as("v")))
    println(f"enumerate only               ${med(3)(agg1(count(lit(1))))}%.3f s")
    println(f"+ dot                        ${med(3)(agg1(sum(expr("graft_dot(x.embedding, y.embedding)"))))}%.3f s")
    println(f"+ dot/nrm (no round)         ${med(3)(agg1(sum(expr("graft_dot(x.embedding, y.embedding)") / (col("x.nrm") * col("y.nrm")))))}%.3f s")
    println(f"+ round(dot/nrm, 6)          ${med(3)(agg1(sum(org.apache.spark.sql.functions.round(expr("graft_dot(x.embedding, y.embedding)") / (col("x.nrm") * col("y.nrm")), 6))))}%.3f s")
    println(f"+ graft_round(dot/nrm, 6)    ${med(3)(agg1(sum(org.apache.spark.sql.functions.call_function("graft_round", expr("graft_dot(x.embedding, y.embedding)") / (col("x.nrm") * col("y.nrm")), org.apache.spark.sql.functions.lit(6)))))}%.3f s")
    spark.stop()
  }
}
