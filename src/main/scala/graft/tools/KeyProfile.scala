package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only per-key overhead profiler (not part of the driver contract):
  * for each registry key, one warmup + one timed run under the
  * Bench-identical session, reporting wall seconds next to the job /
  * stage / task counts and the summed executor task time. A key whose
  * wall time far exceeds its task time is bound by job-submission and
  * plan/codegen overhead (action count), not by data work — the guide §1
  * "where is the time" split, specialized to the sf-scale bench.
  */
object KeyProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys =
      if (args.nonEmpty) args(0).split(",").toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })
    graft.Tables.names.foreach { n =>
      try spark.read.parquet(s"$sfDir/$n.parquet").limit(1).count()
      catch { case _: Throwable => () }
    }
    println(f"${"key"}%-28s ${"wall_s"}%8s ${"jobs"}%5s ${"stages"}%7s ${"tasks"}%6s ${"task_s"}%8s")
    keys.foreach { k =>
      val fn = graft.SparkEntry.queries(k)
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save() // warmup
        // listener events are posted async; give the warmup's a beat to drain
        Thread.sleep(400)
        jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(400)
        println(f"$k%-28s $wall%8.2f ${jobs.get}%5d ${stages.get}%7d ${tasks.get}%6d ${taskNanos.get / 1e9}%8.2f")
      } catch {
        case e: Throwable => println(s"$k FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
