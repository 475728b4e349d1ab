package graft.migrate

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

/** Uppercases o_orderstatus — exercises the transform.custom.class plugin
  * loader (docs/04-cdm-approach.md:341-349).
  */
class UpperStatusTransformer extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("o_orderstatus", upper(col("o_orderstatus")))
}

/** Throws once the third distinct bucket is processed — simulates a mid-run
  * failure for the resume test.
  */
object FailOnThirdBucket {
  val counter = new java.util.concurrent.atomic.AtomicInteger(0)
}
class FailOnThirdBucket extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    if (FailOnThirdBucket.counter.incrementAndGet() >= 3)
      throw new RuntimeException("injected failure on bucket 3")
    df
  }
}

/** Misbehaving transformer: rewrites the reserved `bucket` tag to a fixed
  * value — pre-guard this silently re-routed rows into another bucket's
  * partition (ADVICE r5); now the write routes by the pre-transform
  * snapshot and the wave fails loudly.
  */
class RewriteBucketTransformer extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("bucket", lit(3))
}

/** Misbehaving transformer: drops the internal snapshot column. */
class DropInternalTransformer extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.drop("_bucket_src")
}

/** Throws a message full of JSON-hostile control characters — the ledger's
  * failed row must still be a valid JSONL line.
  */
class ControlCharFailTransformer extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    throw new RuntimeException("bad" + 7.toChar + "bell" + 8.toChar + "\tand \"quotes\" " + 27.toChar + "[0m\nnewline")
}

/** EXECUTOR-side failure on high buckets: raise_error fires per ROW inside
  * the write tasks, so the wave dies as a task/partition failure mid-write
  * (not a driver-side plan error) — the crash shape trackRun.autoRerun
  * exists for (docs/04-cdm-approach.md:422-434).
  */
class FailHighBucketRows extends MigrateJob.Transformer {
  def apply(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    df.withColumn("o_orderstatus",
      org.apache.spark.sql.functions.when(col("bucket") >= 2,
          expr("raise_error('injected partition failure')"))
        .otherwise(col("o_orderstatus")))
}

class MigrateJobSpec extends SparkSpec {
  private lazy val orders = spark.read.parquet(s"${sf()}/orders.parquet")

  private def tmp(): String =
    Files.createTempDirectory("graft-migrate").toString

  test("full migrate preserves every row across buckets") {
    val dir = tmp()
    val res = MigrateJob.run(spark, orders, dir,
      MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4))
    assert(res.migrated == orders.count())
    assert(res.buckets == Seq(0, 1, 2, 3))
    val out = spark.read.parquet(s"$dir/bucket=*")
    assert(out.count() == orders.count())
  }

  test("resume skips ledgered buckets") {
    val dir = tmp()
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4)
    MigrateJob.run(spark, orders, dir, cfg)
    val second = MigrateJob.run(spark, orders, dir, cfg)
    assert(second.buckets.isEmpty, "second run must skip all completed buckets")
    assert(second.migrated == 0)
  }

  test("column selection + transformer plugin applied") {
    val dir = tmp()
    val cfg = MigrateJob.Config(
      pkCols = Seq("o_orderkey"),
      tokenBuckets = 2,
      columnsToTarget = Seq("o_orderkey", "o_orderstatus"),
      transformerClass = Some("graft.migrate.UpperStatusTransformer"))
    MigrateJob.run(spark, orders, dir, cfg)
    val out = spark.read.parquet(s"$dir/bucket=*")
    assert(out.columns.toSet == Set("o_orderkey", "o_orderstatus"))
    assert(out.filter(col("o_orderstatus") =!= upper(col("o_orderstatus"))).count() == 0)
  }

  test("projection that drops writetimeCol is rejected up front") {
    val wt = orders.withColumn("writetime", lit(1000L))
    // survives: increment applies
    val ok = MigrateJob.transformOnly(wt, MigrateJob.Config(
      pkCols = Seq("o_orderkey"),
      columnsToTarget = Seq("o_orderkey", "writetime"),
      writetimeCol = Some("writetime"), writetimeIncrementBy = 5L))
    assert(ok.select(max(col("writetime"))).collect().head.getLong(0) == 1005L)
    // dropped by projection: clear error, not an AnalysisException mid-chain
    val e1 = intercept[IllegalArgumentException] {
      MigrateJob.transformOnly(wt, MigrateJob.Config(
        pkCols = Seq("o_orderkey"),
        columnsToTarget = Seq("o_orderkey"),
        writetimeCol = Some("writetime"), writetimeIncrementBy = 5L))
    }
    assert(e1.getMessage.contains("writetimeCol"))
    // dropped by exclusion: same
    val e2 = intercept[IllegalArgumentException] {
      MigrateJob.transformOnly(wt, MigrateJob.Config(
        pkCols = Seq("o_orderkey"),
        columnsToExclude = Seq("writetime"),
        writetimeCol = Some("writetime"), writetimeIncrementBy = 5L))
    }
    assert(e2.getMessage.contains("writetimeCol"))
  }

  test("guardrail routes oversize rows to the error sink and counts them") {
    val dir = tmp()
    // ~everything serializes > 40 bytes except nothing — pick a mid threshold
    val res = MigrateJob.run(spark, orders, dir,
      MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 2,
        guardrailMaxRowBytes = Some(150), errorLimit = 1000000L))
    assert(res.skippedOversize > 0)
    assert(res.migrated + res.skippedOversize == orders.count())
    val errs = spark.read.parquet(s"$dir/_errors/bucket=*")
    assert(errs.count() == res.skippedOversize)
  }

  test("error budget aborts the run") {
    val dir = tmp()
    val ex = intercept[IllegalStateException] {
      MigrateJob.run(spark, orders, dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 2,
          guardrailMaxRowBytes = Some(1), errorLimit = 10L))
    }
    assert(ex.getMessage.contains("error budget exceeded"))
  }

  test("error budget trips MID-wave: a single-wave run aborts while running") {
    val dir = tmp()
    // default bucketsPerScan => ONE wave for the whole table; guardrail of 1
    // byte flags every row; the budget (10) is blown thousands of rows
    // before the scan could complete. One source partition makes the
    // task-local check deterministic: that task alone must cross the limit
    // and abort the wave from inside the running job — the pre-r7 shape
    // (budget checked only between waves) could not abort this run at all.
    val ex = intercept[IllegalStateException] {
      MigrateJob.run(spark, orders.coalesce(1), dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4,
          guardrailMaxRowBytes = Some(1), errorLimit = 10L))
    }
    assert(ex.getMessage.contains("error budget exceeded mid-wave"),
      s"expected a mid-wave abort, got: ${ex.getMessage}")
    // the aborted wave is ledgered failed for every bucket, carrying the
    // budget message — resume semantics identical to any other wave failure
    val status = MigrateJob.bucketStatus(s"$dir/_ledger/run.jsonl")
    assert((0 to 3).forall(b => status.get(b).contains("failed")),
      s"all buckets of the aborted wave must be failed, got $status")
    val lines = Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/_ledger/run.jsonl")).toArray.map(_.toString)
    assert(lines.exists(_.contains("error budget exceeded mid-wave")),
      "failed ledger rows must carry the budget violation")
  }

  test("budget watcher cancels a running wave once the cross-task total blows the limit") {
    // the driver-side watcher is the GLOBAL abort path (no single task need
    // exceed the limit alone). Drive it directly: blow the accumulator,
    // then start a job that would run ~10s — the watcher must kill it fast.
    val errors = spark.sparkContext.longAccumulator("watcher_test_errors")
    val t0 = System.nanoTime()
    val ex = intercept[IllegalStateException] {
      MigrateJob.withBudgetWatcher(spark, errors, limit = 10L, "watcher-test") {
        errors.add(11L)
        spark.sparkContext.parallelize(1 to 4, 4)
          .map { i => Thread.sleep(10000); i }.count()
      }
    }
    val elapsedSec = (System.nanoTime() - t0) / 1e9
    assert(ex.getMessage.contains("error budget exceeded mid-wave"))
    assert(elapsedSec < 8.0,
      f"watcher must cancel the 10s job promptly, took $elapsedSec%.1f s")
  }

  test("crash recovery: a task failure mid-wave resumes to exactly-once output, done buckets untouched") {
    import scala.jdk.CollectionConverters._
    val dir = tmp()
    // two-bucket waves: wave {0,1} commits clean, wave {2,3} dies INSIDE
    // its write tasks (raise_error per row — a partition failure, not a
    // driver error). The file sink's commit protocol abandons the failed
    // wave's output, the ledger records both buckets failed.
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4,
      bucketsPerScan = 2)
    val failing = cfg.copy(transformerClass = Some("graft.migrate.FailHighBucketRows"))
    val err = intercept[Exception] { MigrateJob.run(spark, orders, dir, failing) }
    assert(Iterator.iterate(err: Throwable)(_.getCause).takeWhile(_ != null)
      .take(10).exists(e => String.valueOf(e.getMessage).contains("injected partition failure")),
      s"the wave must die on the injected task failure, got $err")
    val ledger = s"$dir/_ledger/run.jsonl"
    assert(MigrateJob.completedBuckets(ledger) == Set(0, 1))
    assert(Set(2, 3).forall(b => MigrateJob.bucketStatus(ledger).get(b).contains("failed")))
    // snapshot the committed buckets' files: resume must not rewrite them
    def files(b: Int): Map[String, Long] = {
      val d = java.nio.file.Paths.get(dir, s"bucket=$b")
      java.nio.file.Files.list(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet"))
        .map(p => p.toString -> java.nio.file.Files.getLastModifiedTime(p).toMillis)
        .toMap
    }
    val before = Map(0 -> files(0), 1 -> files(1))
    val second = MigrateJob.run(spark, orders, dir, cfg)
    assert(second.buckets.toSet == Set(2, 3), "only the failed wave re-drives")
    assert(Map(0 -> files(0), 1 -> files(1)) == before,
      "completed buckets' files must not be re-executed or rewritten")
    // exactly-once: every origin row exactly once across all buckets
    val out = spark.read.parquet(s"$dir/bucket=*")
    assert(out.count() == orders.count())
    assert(out.select("o_orderkey").distinct().count() == orders.count(),
      "resume must not duplicate rows from the failed wave's first attempt")
    assert(MigrateJob.completedBuckets(ledger) == Set(0, 1, 2, 3))
  }

  test("resume re-drives failed buckets after a mid-run failure") {
    val dir = tmp()
    // bucketsPerScan = 1: per-bucket commit granularity, so the injected
    // failure lands on exactly one bucket's wave
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4,
      bucketsPerScan = 1)
    val failing = cfg.copy(transformerClass = Some("graft.migrate.FailOnThirdBucket"))
    FailOnThirdBucket.counter.set(0)
    intercept[Exception] {
      MigrateJob.run(spark, orders, dir, failing)
    }
    val ledger = s"$dir/_ledger/run.jsonl"
    val done = MigrateJob.completedBuckets(ledger)
    assert(done == Set(0, 1), s"expected buckets 0,1 done, got $done")
    // the failed bucket is ledgered as failed, with the error captured
    val status = MigrateJob.bucketStatus(ledger)
    assert(status.get(2).contains("failed"), s"bucket 2 should be failed, got $status")
    val failedLine = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(ledger)).toArray.map(_.toString)
      .find(l => l.contains("\"bucket\":2") && l.contains("\"failed\""))
    assert(failedLine.exists(_.contains("injected failure")),
      s"failed ledger row must carry the error, got $failedLine")
    // resume with the healthy config: exactly the failed + never-run
    // buckets re-execute (trackRun.autoRerun), done ones are skipped
    val second = MigrateJob.run(spark, orders, dir, cfg)
    assert(second.buckets.toSet == Set(2, 3))
    assert(MigrateJob.completedBuckets(ledger) == Set(0, 1, 2, 3),
      "latest-entry-wins: the re-driven bucket reads done after resume")
    assert(spark.read.parquet(s"$dir/bucket=*").count() == orders.count())
    // a third run finds nothing pending
    assert(MigrateJob.run(spark, orders, dir, cfg).buckets.isEmpty)
  }

  test("N-bucket run scans the source ONCE (no per-bucket read amplification)") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
    val dir = tmp()
    val nRows = orders.count()
    val recordsRead = new java.util.concurrent.atomic.AtomicLong(0)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          recordsRead.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      MigrateJob.run(spark, orders, dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 8))
      // listener bus is async: poll until the counter goes stable
      var prev = -1L
      var tries = 0
      while (recordsRead.get() != prev && tries < 50) {
        prev = recordsRead.get(); Thread.sleep(100); tries += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    val total = recordsRead.get()
    // old shape read the source once per bucket PLUS re-read each bucket's
    // output for the ledger: >= 16x rows for 8 buckets. Single-pass = 1x.
    assert(total <= nRows * 3 / 2,
      s"8-bucket migrate read $total records; single-pass bound is ~$nRows")
    assert(spark.read.parquet(s"$dir/bucket=*").count() == nRows)
  }

  test("bucketing is computed from the SOURCE pk: projection may drop the pk") {
    // the bucket tag must come from the origin row, so a columnsToTarget
    // that omits the pk (legal in CDM) still buckets correctly
    val dir = tmp()
    val res = MigrateJob.run(spark, orders, dir,
      MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4,
        columnsToTarget = Seq("o_orderstatus", "o_totalprice")))
    assert(res.migrated == orders.count())
    val out = spark.read.parquet(s"$dir/bucket=*")
    assert(out.count() == orders.count())
    assert(out.columns.toSet == Set("o_orderstatus", "o_totalprice"))
  }

  test("a re-driven bucket that now yields zero rows clears its stale output") {
    val dir = tmp()
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 2)
    MigrateJob.run(spark, orders, dir, cfg)
    assert(spark.read.parquet(s"$dir/bucket=*").count() == orders.count())
    // wipe the ledger and re-migrate with a filter that drops every row:
    // dynamic overwrite alone would leave the stale partitions in place
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_ledger/run.jsonl"))
    val wt = orders.withColumn("writetime", lit(5L))
    val res = MigrateJob.run(spark, wt, dir, cfg.copy(
      writetimeCol = Some("writetime"), minWritetime = Some(100L)))
    assert(res.migrated == 0)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/bucket=0")) &&
      !fs.exists(new org.apache.hadoop.fs.Path(s"$dir/bucket=1")),
      "stale bucket output must be cleared when the re-drive yields zero rows")
  }

  test("waves above the counter cap still migrate correctly, sans per-bucket counts") {
    val dir = tmp()
    val res = MigrateJob.run(spark, orders.limit(500), dir,
      MigrateJob.Config(pkCols = Seq("o_orderkey"),
        tokenBuckets = MigrateJob.PerBucketCounterCap + 22))
    assert(res.migrated == 500)
    assert(spark.read.parquet(s"$dir/bucket=*").count() == 500)
    val ledger = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/_ledger/run.jsonl"))
    assert(ledger.size == MigrateJob.PerBucketCounterCap + 22)
    assert(!ledger.get(0).contains("\"rows\""),
      "above the cap, ledger rows carry status without per-bucket counts")
    // resume finds everything done
    assert(MigrateJob.run(spark, orders.limit(500), dir,
      MigrateJob.Config(pkCols = Seq("o_orderkey"),
        tokenBuckets = MigrateJob.PerBucketCounterCap + 22)).buckets.isEmpty)
  }

  test("global rate limit divides by current parallelism") {
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"))
      .withGlobalRateLimit(spark, 4000)
    val per = cfg.maxRowsPerSecondPerPartition.get
    assert(per == math.max(1, 4000 / spark.sparkContext.defaultParallelism))
  }

  test("global rate limit re-derives when parallelism changes (per-epoch recompute)") {
    // SURVEY §7.4 risk 6: under dynamic allocation the per-partition rate
    // must track executor count epoch to epoch. The division is pure, so
    // drive it across a scale-up/scale-down sequence a local session can't
    // physically take on and pin the contract:
    //  - scale-up: per-partition share shrinks, total stays ≤ the global
    //    budget and within one row/s/partition of it (integer floor);
    //  - scale-down to 1: the full budget lands on the one partition;
    //  - over-parallelized (more partitions than budget): floor at 1, the
    //    only regime allowed to exceed the global budget — a 0 rate would
    //    stall every task forever.
    val global = 4000
    for (p <- Seq(1, 4, 32, 1000)) {
      val per = MigrateJob.perPartitionRate(global, p)
      assert(per == global / p, s"parallelism $p")
      assert(per.toLong * p <= global && (per + 1).toLong * p > global,
        s"total within one floor-step of the budget at parallelism $p")
    }
    assert(MigrateJob.perPartitionRate(global, 1) == global)
    assert(MigrateJob.perPartitionRate(global, 8000) == 1, "floor, never 0")
    assert(MigrateJob.perPartitionRate(global, 0) == global, "degenerate parallelism guard")
    // the Config hook re-reads parallelism on EVERY call (nothing cached):
    // two derivations at different global rates from one base config both
    // reflect the session's live parallelism
    val base = MigrateJob.Config(pkCols = Seq("o_orderkey"))
    val live = spark.sparkContext.defaultParallelism
    assert(base.withGlobalRateLimit(spark, 4000).maxRowsPerSecondPerPartition.get
      == MigrateJob.perPartitionRate(4000, live))
    assert(base.withGlobalRateLimit(spark, 400).maxRowsPerSecondPerPartition.get
      == MigrateJob.perPartitionRate(400, live))
  }

  test("expected failure: schema-mismatched CSV import surfaces nulls the count gate catches") {
    // mirror of the reference's negative tests (02-native-tooling.md:137-146):
    // import with a wrong declared type must not silently pass validation
    import org.apache.spark.sql.types._
    val dir = tmp()
    orders.limit(100)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .write.option("header", "true").csv(s"$dir/csv")
    val wrong = StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_orderpriority", LongType)))  // actually a string column
    val back = spark.read.schema(wrong).option("header", "true").csv(s"$dir/csv")
    val nullCount = back.filter(col("o_orderpriority").isNull).count()
    assert(nullCount == 100, "type mismatch must surface as nulls, not silent data")
  }

  test("rate limiter throttles throughput") {
    import spark.implicits._
    val df = spark.range(200).toDF("id").repartition(1)
    val t0 = System.nanoTime()
    MigrateJob.rateLimited(df, 400).count()
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs >= 0.4, s"200 rows at 400 rows/s should take ≥0.5s, took $secs")
  }

  test("a transformer rewriting the bucket tag fails the wave AND cannot re-route rows") {
    val dir = tmp()
    // wave = buckets {0,1} of 4; the transformer stamps every row bucket=3.
    // Pre-guard, rows landed in bucket=3's partition (outside the wave —
    // with dynamic overwrite that can replace a done bucket's data).
    val ex = intercept[IllegalStateException] {
      MigrateJob.run(spark, orders, dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 4,
          bucketRange = Some((0, 1)),
          transformerClass = Some("graft.migrate.RewriteBucketTransformer")))
    }
    assert(ex.getMessage.contains("rewrote the reserved 'bucket' tag"), ex.getMessage)
    // the wave is ledgered failed, so resume re-drives it
    val status = MigrateJob.bucketStatus(s"$dir/_ledger/run.jsonl")
    assert(status.get(0).contains("failed") && status.get(1).contains("failed"), status)
    // routing damage prevention: nothing escaped into bucket 3's partition
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/bucket=3")),
      "rows must be routed by the pre-transform snapshot, never the rewritten tag")
    // and the rows that were written are exactly the wave's source slices
    val expected = orders.withColumn("bucket",
      graft.core.Ops.tokenBucket(Seq("o_orderkey"), 4))
      .filter(col("bucket").isin(0, 1)).count()
    assert(spark.read.parquet(s"$dir/bucket=*").count() == expected)
  }

  test("a transformer dropping the internal snapshot column fails with a clear error") {
    val dir = tmp()
    val ex = intercept[IllegalArgumentException] {
      MigrateJob.run(spark, orders, dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 2,
          transformerClass = Some("graft.migrate.DropInternalTransformer")))
    }
    assert(ex.getMessage.contains("_bucket_src"), ex.getMessage)
  }

  test("ledger failed rows stay valid JSONL under control-char error messages") {
    val dir = tmp()
    intercept[Exception] {
      MigrateJob.run(spark, orders, dir,
        MigrateJob.Config(pkCols = Seq("o_orderkey"), tokenBuckets = 2,
          transformerClass = Some("graft.migrate.ControlCharFailTransformer")))
    }
    import org.json4s.jackson.JsonMethods
    val lines = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(s"$dir/_ledger/run.jsonl"))
    assert(!lines.isEmpty)
    lines.forEach { l =>
      // a strict JSON parser is the external-consumer stand-in
      val parsed = JsonMethods.parse(l)
      assert((parsed \ "status") != org.json4s.JNothing, l)
    }
    assert(lines.get(0).contains("\\u0007"), s"control chars must be escaped: ${lines.get(0)}")
  }
}
