package graft.tools

import org.apache.spark.sql.SparkSession

/** Same-host A/B adjudicator (the NOTES.md cross-round regression
  * protocol, made runnable): median-of-3 after one warmup for a
  * comma-separated key subset, Bench-identical session + noop
  * materialization. Run it in HEAD and in a `git worktree add
  * target/oldwt <commit>` back-to-back; if the new medians sit inside
  * the old tree's own run-to-run range, the mover was host weather.
  */
object AbProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = "/root/testdata/sf0.1"
    val keys = args(0).split(",").toSeq
    val spark = SparkSession.builder()
      .master("local[" + sys.env.getOrElse("AB_CPUS", "32") + "]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("AB_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.Tables.names.foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    keys.foreach { k =>
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(k)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warmup
      val s = Seq.fill(3)(once()).sorted
      println(f"[ab] $k%-22s med ${s(1)}%.2f samples ${s.map(x => f"$x%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
