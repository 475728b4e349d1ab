package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout contracts: the Morton interleave itself, the
  * exchange/sort plan shape, and the point of the whole exercise — a
  * box filter over a z-laid-out table touches a fraction of the files a
  * naturally-laid-out table does.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a on even positions, b on odd)") {
    // a=3 (0011), b=5 (0101): bits -> z0(a0=1) z1(b0=1) z2(a1=1) z5(b2=1)
    // = 1 + 2 + 4 + 32 = 39
    val got = Seq((3L, 5L)).toDF("a", "b")
      .select(Ops.zValue(col("a"), col("b")).as("z")).head().getLong(0)
    assert(got == 39L, s"z(3, 5) = $got, want 39")
    // order matters: z(b, a) is a different curve position
    val swapped = Seq((5L, 3L)).toDF("a", "b")
      .select(Ops.zValue(col("a"), col("b")).as("z")).head().getLong(0)
    assert(swapped == 27L, s"z(5, 3) = $swapped, want 27")
  }

  test("zorderLayout plans one range exchange + partition-local sort, no global sort") {
    val df = spark.range(1000).select(
      (col("id") % 100).as("x"), (col("id") / 100).as("y"))
    // string-level checks: under AQE the top node is AdaptiveSparkPlan,
    // whose pre-execution children are not exposed to plan.collect
    val plan = Ops.zorderLayout(df, col("x"), col("y"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    // SortExec renders as "Sort [keys], <global>, <offset>"
    val sortFlags = "Sort \\[.*\\], (true|false), ".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(sortFlags.nonEmpty && sortFlags.forall(_ == "false"),
      s"sorts must be partition-local (never a global sort):\n$plan")
  }

  test("box filter touches a fraction of z-ordered files vs the natural layout") {
    // 100x100 grid, one row per cell, ids in row-major order — the natural
    // layout spreads every y-stripe across all files; the z layout packs
    // the (x, y) box into few
    val grid = spark.range(10000).select(
      col("id"),
      (col("id") % 100).cast("long").as("x"),
      (col("id") / 100).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    grid.repartition(8).write.parquet(s"$base/natural")
    Ops.zorderLayout(grid, col("x"), col("y"), 8)
      .write.parquet(s"$base/zorder")
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x").between(10, 19) && col("y").between(10, 19))
        .select(input_file_name()).distinct().count()
    val natural = filesTouched(s"$base/natural")
    val zed = filesTouched(s"$base/zorder")
    // the 1%-of-space box lives in ~1% of the z range; round-robin spreads
    // it over every file
    assert(natural >= 7, s"natural layout should spread the box: $natural files")
    assert(zed <= 2, s"z layout should cluster the box: $zed files")
    // both layouts return identical rows — layout is not allowed to lose data
    val a = spark.read.parquet(s"$base/natural").orderBy("id").collect().toSeq
    val b = spark.read.parquet(s"$base/zorder").orderBy("id").collect().toSeq
    assert(a == b)
  }

  /** Sum of task-level input records over the jobs run inside `f` — the
    * ACTUAL scan metric (what the parquet reader materialized after
    * row-group pruning), not an inference from file listings.
    */
  private def recordsRead(f: => Unit): Long = {
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      f
      // listener delivery is async — wait until the count stabilizes
      var last = -1L
      var spins = 0
      while (acc.get() != last && spins < 50) {
        last = acc.get(); spins += 1; Thread.sleep(100)
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("ingest store written z-ordered: an (entity, day) filter reads a " +
       "fraction of the records, by actual task input metrics") {
    import graft.stream.{DualWrite, IngestPipeline}
    // 10k docs over 100 entities × 100 days — the ingest store shape.
    // Written through the REAL sink (dualWriteMicroBatch) twice: once with
    // the default (identity) layout, once z-ordered by (entity, day).
    // event time travels as ts_us (int64 epoch micros) — the repo's own
    // normalization convention (Common.eventsRawUs), and load-bearing for
    // pruning: INT64 stats convert to parquet row-group predicates, while
    // timestamp-typed columns did NOT prune here (measured: with ts as
    // INT96 or even TIMESTAMP_NTZ the day filter skipped nothing — 6224
    // records read vs the 2478 the file envelopes allow; Spark lists the
    // ts predicate under PushedFilters but never converts it)
    val docs = spark.range(10000).select(
      col("id").as("doc_id"),
      (col("id") % 100).as("entity"),
      (lit(1704067200000000L) + (col("id") / 100) * 86400000000L)
        .cast("long").as("ts_us"),
      concat(lit("doc "), col("id").cast("string")).as("text"))
      .repartition(8)
    val base = java.nio.file.Files.createTempDirectory("graft-zingest").toString
    DualWrite.dualWriteMicroBatch(docs, 0L, s"$base/o-nat", s"$base/t-nat")
    DualWrite.dualWriteMicroBatch(docs, 0L, s"$base/o-z", s"$base/t-z",
      IngestPipeline.zorderByEntityDay(col("entity"),
        timestamp_micros(col("ts_us")), 8))
    var boxRows = Seq.empty[Long]
    def boxCount(path: String): Unit = {
      val n = spark.read.parquet(path)
        .filter(col("entity").between(10, 19) &&
          col("ts_us").between(1704844800000000L, 1705708799000000L))
        .count()
      boxRows :+= n
    }
    val natRecords = recordsRead(boxCount(s"$base/t-nat"))
    val zRecords = recordsRead(boxCount(s"$base/t-z"))
    // both layouts answer the box identically, and the box is a ~1% slice
    assert(boxRows.distinct.size == 1 && boxRows.head == 100L,
      s"box rows per layout: $boxRows")
    // natural layout: every row group spans the whole grid → the pushed
    // filter prunes nothing and all 10k records materialize. z layout:
    // row groups carry tight (entity, day) envelopes → most skip.
    assert(natRecords >= 9000L, s"natural layout should read ~all: $natRecords")
    assert(zRecords <= natRecords / 2,
      s"z-ordered store must prune row groups: z=$zRecords nat=$natRecords")
    // the z store holds exactly the same rows
    val a = spark.read.parquet(s"$base/t-nat").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val b = spark.read.parquet(s"$base/t-z").select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(a == b)
  }
}
