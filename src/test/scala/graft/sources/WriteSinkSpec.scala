package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The connector-seam WRITE proof (r13 VERDICT item 6): partition-key
  * batching, rate limiting, and the error budget must cross a REAL DSv2
  * writer — [[GraftBatchSink]] — the way PushdownSpec proved the read
  * side. Layout comes from the sink's RequiresDistributionAndOrdering
  * declaration (Spark plans the clustering exchange + sort), so the
  * batching assertions double as a check that the declared distribution
  * was honored.
  */
class WriteSinkSpec extends SparkSpec {
  import spark.implicits._

  private def save(df: DataFrame, runId: String,
                   opts: Map[String, String] = Map.empty): Unit = {
    GraftBatchSink.clear(runId)
    df.write.format(classOf[GraftBatchSink].getName)
      .option("runId", runId).option("pkCol", "pk")
      .options(opts).mode("append").save()
  }

  // 120 rows over 10 pks: pk = i % 10, 12 rows each
  private def rows120: DataFrame =
    (0 until 120).map(i => (i.toLong % 10, i.toLong)).toDF("pk", "v")
      .repartition(7) // deliberately NOT clustered — the sink must demand it

  test("partition-key batching: no batch mixes pks, no batch exceeds " +
       "batchSize, each pk lands contiguously in exactly one task " +
       "(the declared clustering was honored)") {
    save(rows120, "wb_batching", Map("batchSize" -> "5"))
    val r = GraftBatchSink.runResult("wb_batching").get
    assert(r.committed && !r.aborted)
    val all = r.tasks.flatMap(t => t.batches.map(b => (t.partitionId, b)))
    assert(all.map(_._2.n).sum == 120)
    assert(all.forall(_._2.n <= 5), s"oversized batch: $all")
    // every pk in exactly one task
    val byPk = all.groupBy(_._2.pk)
    assert(byPk.size == 10)
    byPk.foreach { case (pk, bs) =>
      assert(bs.map(_._1).distinct.size == 1, s"pk $pk split across tasks")
      assert(bs.map(_._2.n).sum == 12, s"pk $pk lost rows")
      // 12 rows at batchSize 5 → 5+5+2: contiguity means exactly
      // ceil(12/5)=3 batches (an interleaved pk would force more flushes)
      assert(bs.size == 3, s"pk $pk flushed ${bs.size} batches — rows " +
        "arrived non-contiguously despite the required ordering")
    }
    // within a task, a pk's batches are consecutive in flush order
    r.tasks.foreach { t =>
      val pks = t.batches.map(_.pk)
      assert(pks == pks.sorted, s"unsorted pk flush order: $pks")
    }
  }

  test("rate limit paces the writer (per task): 200 rows in one task at " +
       "400 rows/s cannot finish faster than ~0.5s") {
    val one = (0 until 200).map(i => (i.toLong, i.toLong)).toDF("pk", "v")
      .coalesce(1)
    save(one, "wb_rate", Map("rateLimit" -> "400", "batchSize" -> "50"))
    val r = GraftBatchSink.runResult("wb_rate").get
    assert(r.committed)
    val t = r.tasks.maxBy(_.written)
    assert(t.written == 200)
    assert(t.elapsedNanos >= 450000000L, // 0.45 s floor (jitter slack)
      s"rate limit not applied: ${t.elapsedNanos / 1e9}s for 200 rows")
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("error budget: failures under the limit are skipped and counted; " +
       "over the limit the job aborts and BatchWrite.abort is recorded") {
    // failEveryN=10 over pks 0..9 → only pk 0 is divisible, and a
    // divisible pk fails ALL its rows → 12 failing rows (12 rows/pk)
    save(rows120, "wb_budget_ok",
      Map("failEveryN" -> "10", "errorLimit" -> "100"))
    val ok = GraftBatchSink.runResult("wb_budget_ok").get
    assert(ok.committed)
    assert(ok.tasks.map(_.errors).sum == 12L)
    assert(ok.tasks.flatMap(_.batches).map(_.n).sum == 108)

    // pk 0's 12 failures land in ONE task (clustered) → the task-local
    // fast abort fires (12 > 2 in one task)
    val e = intercept[Exception] {
      save(rows120, "wb_budget_blow",
        Map("failEveryN" -> "10", "errorLimit" -> "2"))
    }
    assert(messages(e).exists(_.contains("error budget exceeded")),
      s"unexpected failure: $e")
    val blown = GraftBatchSink.runResult("wb_budget_blow").get
    assert(blown.aborted && !blown.committed)
  }

  test("error budget is JOB-global, not per-task: every task stays under " +
       "the limit but the job total exceeds it -> commit refuses and " +
       "BatchWrite.abort fires (CDM maxErrorCount semantics)") {
    // failEveryN=3 → pks 0,3,6,9 each fail all 12 of their rows (48
    // total). AQE partition coalescing is OFF for this case so the 4
    // failing pks stay hash-spread over the 4 shuffle partitions (with
    // coalescing, 120 rows collapse into one task and the LOCAL check
    // fires instead — this test is about the cross-task total);
    // errorLimit=40: no task breaches locally (worst spread = 3 pks/task
    // = 36 < 40), the job does (48 > 40) — a per-task budget would have
    // committed here
    val coalesceKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(coalesceKey)
    spark.conf.set(coalesceKey, "false")
    val e =
      try intercept[Exception] {
        save(rows120, "wb_budget_global",
          Map("failEveryN" -> "3", "errorLimit" -> "40"))
      } finally prev match {
        case Some(v) => spark.conf.set(coalesceKey, v)
        case None => spark.conf.unset(coalesceKey)
      }
    assert(messages(e).exists(_.contains("job-global error budget exceeded")),
      s"unexpected failure: $e")
    val r = GraftBatchSink.runResult("wb_budget_global").get
    assert(r.aborted && !r.committed)
  }

  test("the job-global error accumulator is observable on the driver " +
       "(the mid-job watcher channel) and counts every skipped row") {
    // clear FIRST (clear drops the accumulator too), then pre-register
    // the accumulator the way an orchestrator's watcher would, then write
    GraftBatchSink.clear("wb_acc")
    val acc = GraftBatchSink.errorAccumulator("wb_acc")
    rows120.write.format(classOf[GraftBatchSink].getName)
      .option("runId", "wb_acc").option("pkCol", "pk")
      .option("failEveryN", "10").option("errorLimit", "100")
      .mode("append").save()
    assert(acc.value == 12L)
    assert(GraftBatchSink.errorAccumulator("wb_acc") eq acc,
      "accumulator must be stable per runId until clear()")
  }

  test("the writer demands LongType pk and a runId") {
    intercept[Exception] {
      save(Seq(("a", 1L)).toDF("pk", "v"), "wb_badpk")
    }
    intercept[Exception] {
      rows120.write.format(classOf[GraftBatchSink].getName)
        .option("pkCol", "pk").mode("append").save()
    }
  }
}
