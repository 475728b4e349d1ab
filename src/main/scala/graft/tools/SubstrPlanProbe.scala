package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only probe (r12 verdict item 7): run the dedup_substring registry
  * key at a given sf tier under the BENCH session config and print the
  * final ADAPTIVE executed plan — the question is whether the two-level
  * duplicate test's left-semi join rides the AQE broadcast regime (dup
  * gram set small → BroadcastHashJoin LeftSemi, gram table never
  * shuffles on h for the join) or degraded to a both-sides shuffle.
  *
  *   sbt "runMain graft.tools.SubstrPlanProbe [sfDir] [key]"
  */
object SubstrPlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val key = if (args.length > 1) args(1) else "dedup_substring"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t0 = System.nanoTime()
    val df = graft.SparkEntry.queries(key)(spark, sfDir)
    val n = df.count()
    println(f"$key at $sfDir: rows=$n  ${(System.nanoTime() - t0) / 1e9}%.2f s")
    // after the action, executedPlan is the FINAL adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    println(plan)
    val semiLines = plan.linesIterator.filter(l =>
      l.contains("Join") || l.contains("Exchange")).mkString("\n")
    println("---- join/exchange summary ----")
    println(semiLines)
    spark.stop()
  }
}
