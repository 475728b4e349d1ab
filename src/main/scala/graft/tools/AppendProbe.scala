package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev-only: steady-state timing of the ann_index_append registry key
  * (1 discarded warmup + 3 samples, Bench session config).
  */
object AppendProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    (1 to 4).foreach { i =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("ann_index_append")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[ap] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s" +
        (if (i == 1) " (warmup)" else ""))
    }
    spark.stop()
  }
}
