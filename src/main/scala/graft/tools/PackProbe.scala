package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only crossover probe for sequence packing (not part of the driver
  * contract; safe to delete): two-level shard packing vs the single
  * per-lang window at growing PER-LANG volume. One language on purpose —
  * the single-window form then sorts the whole corpus in ONE task, the
  * regime where its linear-per-task cost crosses the two-level form's
  * bounded-shard constant. STRESS.md's 10M-doc/5-lang rows showed the old
  * form 2× faster (2M rows per task is still cheap); this probe measures
  * where that flips.
  */
object PackProbe {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toLong).toSeq
                else Seq(2000000L, 10000000L, 40000000L)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for ((n, sizeIx) <- sizes.zipWithIndex) {
      // ~8 whitespace tokens per doc, deterministic; ONE language
      val docs = spark.range(n).select(
        col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 7),
                 j -> substr(md5(cast(id * 31 + j as string)), 1, 6)))""").as("text"),
        lit("en").as("lang"))
      def timed(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime()
        f
        println(f"$name%-14s n=${n / 1000000}%3dM ${(System.nanoTime() - t0) / 1e9}%8.1f s")
      }
      // alternate which form runs first per SIZE INDEX (the old megabyte
      // parity never alternated for the all-even default sizes — ADVICE
      // r8), so neither form systematically enjoys the warm JVM
      def two(): Unit = LlmOps.packSequences(docs)
        .agg(sum(col("start_off")), max(col("bin"))).collect()
      def one(): Unit = {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        docs.withColumn("n_tokens", size(split(col("text"), " ")))
          .withColumn("start_off", sum(col("n_tokens")).over(w) - col("n_tokens"))
          .withColumn("bin", expr("start_off div 64"))
          .agg(sum(col("start_off")), max(col("bin"))).collect()
      }
      if (sizeIx % 2 == 0) { timed("two-level")(two()); timed("single-window")(one()) }
      else { timed("single-window")(one()); timed("two-level")(two()) }
    }
    spark.stop()
  }
}
