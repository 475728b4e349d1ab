package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: writes `.explain("formatted")` of the named registry keys to
  * `<outDir>/<key>_<tag>.txt` — the per-key plan evidence files the
  * optimization rounds commit under plans/rNN/. Bench-identical session
  * (local[$SPARK_GRAFT_CPUS], shuffle.partitions=cpus) so the dumped plan
  * is the one the bench actually runs.
  */
object ExplainKeys {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1) // "before" | "after"
    val keys = args(2).split(",").toSeq
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    keys.foreach { k =>
      try {
        val df = graft.SparkEntry.queries(k)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(s"$outDir/${k}_$tag.txt"), plan)
        println(s"[explain] wrote $k ($tag): ${plan.count(_ == '\n')} lines")
      } catch {
        case e: Throwable => println(s"[explain] $k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
