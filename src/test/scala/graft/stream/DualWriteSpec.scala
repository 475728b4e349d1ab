package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

class DualWriteSpec extends SparkSpec {

  private def tmp(): String = Files.createTempDirectory("graft-stream").toString

  test("batch dual-write lands identical rows on both sinks") {
    val base = tmp()
    val df = spark.read.parquet(s"${sf()}/orders.parquet").limit(100)
    DualWrite.dualWriteBatch(df, s"$base/origin", s"$base/target")
    val o = spark.read.parquet(s"$base/origin")
    val t = spark.read.parquet(s"$base/target")
    assert(o.count() == 100 && t.count() == 100)
    assert(o.exceptAll(t).isEmpty && t.exceptAll(o).isEmpty)
  }

  test("streaming dual-write: each micro-batch reaches both sinks (T1 parity)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val base = tmp()
    val mem = MemoryStream[(Long, String)]
    val q = DualWrite.dualWriteStream(
      mem.toDF().toDF("id", "v"), s"$base/origin", s"$base/target", s"$base/ckpt")
    try {
      mem.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      mem.addData((3L, "c"))
      q.processAllAvailable()
    } finally q.stop()
    val o = spark.read.parquet(s"$base/origin")
    val t = spark.read.parquet(s"$base/target")
    assert(o.count() == 3 && t.count() == 3)
    assert(o.exceptAll(t).isEmpty)
  }

  test("micro-batch replay with the same batchId does not duplicate rows") {
    import spark.implicits._
    val base = tmp()
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    DualWrite.dualWriteMicroBatch(b0, 0L, s"$base/origin", s"$base/target")
    // at-least-once replay of batch 0 (e.g. driver died before checkpoint commit)
    DualWrite.dualWriteMicroBatch(b0, 0L, s"$base/origin", s"$base/target")
    DualWrite.dualWriteMicroBatch(Seq((3L, "c")).toDF("id", "v"),
      1L, s"$base/origin", s"$base/target")
    val o = spark.read.parquet(s"$base/origin")
    assert(o.count() == 3, "replayed batch must overwrite, not append")
    assert(o.select("batch").distinct().count() == 2)
    assert(spark.read.parquet(s"$base/target").count() == 3)
  }

  test("routedRead: DUAL returns primary plus a comparison report") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val (primary, cmp) = DualWrite.routedRead(DualWrite.Dual,
      orders, orders, Seq("o_orderkey"))
    assert(primary.count() == orders.count())
    val rep = cmp.get.collect()
    assert(rep.length == 1 && rep.head.getString(0) == "valid")
  }

  test("streaming LWW keeps the max-writetime row per key, drops late losers (T3/T4)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp, Long, String)]
    val df = mem.toDF().toDF("pk", "ts", "writetime", "v")
    val out = DualWrite.lwwStream(df, Seq("pk"), "ts", "writetime", "10 minutes")
    val q = out.writeStream.format("memory").queryName("lww_out")
      .outputMode("update").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData(("k1", ts(0), 100L, "old"), ("k1", ts(1), 200L, "new"),
        ("k2", ts(2), 50L, "only"))
      q.processAllAvailable()
      // late row for k1 with OLDER writetime must not regress state
      mem.addData(("k1", ts(3), 150L, "late-loser"))
      q.processAllAvailable()
      val state = spark.table("lww_out")
        .groupBy("pk").agg(max_by(col("v"), col("writetime")).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(state("k1") == "new")
      assert(state("k2") == "only")
    } finally q.stop()
  }

  test("bounded LWW state keeps the max-writetime row and ignores older updates") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, String)]
    val out = DualWrite.lwwStreamBounded(mem.toDS(), stateTtlMs = None)
    val q = out.toDF().toDF("pk", "wt", "v")
      .writeStream.format("memory").queryName("lww_bounded_out")
      .outputMode("update").start()
    try {
      mem.addData(("k1", 100L, "old"), ("k1", 200L, "new"), ("k2", 10L, "x"))
      q.processAllAvailable()
      mem.addData(("k1", 150L, "late-loser"))
      q.processAllAvailable()
      val last = spark.table("lww_bounded_out")
        .groupBy("pk").agg(max_by(col("v"), col("wt")).as("v"), max("wt").as("wt"))
        .collect().map(r => r.getString(0) -> (r.getString(1), r.getLong(2))).toMap
      assert(last("k1") == ("new", 200L), s"late older row must not win: $last")
      assert(last("k2") == ("x", 10L))
    } finally q.stop()
  }

  test("bounded LWW runs on the RocksDB state store (the 100 TB key-space provider)") {
    // the default (HDFS-backed in-memory) store holds every key's state on
    // heap; a 100 TB migration's live key set needs the spill-to-disk
    // RocksDB provider. Pin that lwwStreamBounded runs — and resolves LWW
    // identically — on RocksDB, and that the provider actually engaged
    // (rocksdb metrics in the state operator's progress, not just a conf
    // that silently fell back).
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val key = "spark.sql.streaming.stateStore.providerClass"
    val saved = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val mem = MemoryStream[(String, Long, String)]
    val out = DualWrite.lwwStreamBounded(mem.toDS(), stateTtlMs = None)
    val q = out.toDF().toDF("pk", "wt", "v")
      .writeStream.format("memory").queryName("lww_rocksdb_out")
      .outputMode("update").start()
    try {
      mem.addData(("k1", 100L, "old"), ("k1", 200L, "new"), ("k2", 10L, "x"))
      q.processAllAvailable()
      mem.addData(("k1", 150L, "late-loser"), ("k3", 5L, "y"))
      q.processAllAvailable()
      val last = spark.table("lww_rocksdb_out")
        .groupBy("pk").agg(max_by(col("v"), col("wt")).as("v"))
        .collect().map(r => r.getString(0) -> r.getString(1)).toMap
      assert(last == Map("k1" -> "new", "k2" -> "x", "k3" -> "y"))
      val custom = Option(q.lastProgress).toSeq
        .flatMap(_.stateOperators.toSeq)
        .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      assert(custom.exists(_.toLowerCase.contains("rocksdb")),
        s"state operator must report rocksdb metrics, got: $custom")
    } finally {
      q.stop()
      saved match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
  }

  test("bounded LWW TTL evicts idle keys: state tracks the live key set, not every key ever seen") {
    // the point of lwwStreamBounded over the plain groupBy form: over a
    // long stream with a churning key space, state must stay bounded by
    // the RECENTLY-ACTIVE keys. Driving real ProcessingTimeTimeout timers
    // in a spec needs wall-clock idling while the engine spins continuous
    // empty micro-batches (processAllAvailable never converges — see the
    // lwwStreamBounded scaladoc), so the TTL contract is pinned
    // deterministically through the factored-out transition function and
    // Spark's TestGroupState timer harness instead.
    import org.apache.spark.api.java.Optional
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val ttl = Some(500L)
    def freshState(now: Long) = TestGroupState.create[(Long, String)](
      Optional.empty(), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = now, Optional.empty[Long](), hasTimedOut = false)

    // a long synthetic stream: 1000 keys arrive, every one arms a TTL timer
    val armed = (1 to 1000).map { i =>
      val st = freshState(now = 1000L)
      val out = DualWrite.lwwUpdate(ttl)(s"k$i", Iterator((s"k$i", i.toLong, s"v$i")), st)
      assert(out == (s"k$i", i.toLong, s"v$i"))
      assert(st.isUpdated && st.getTimeoutTimestampMs.isPresent)
      st
    }
    assert(armed.forall(_.getTimeoutTimestampMs.get() == 1000L + 500L),
      "every idle key must be scheduled for eviction one TTL after its last update")

    // ...the keys idle past the TTL: the timer batch EVICTS (removes) each
    // one after a final emit — state size tracks the live set, not history
    val evicted = (1 to 1000).map { i =>
      val st = TestGroupState.create[(Long, String)](
        Optional.of((i.toLong, s"v$i")), GroupStateTimeout.ProcessingTimeTimeout,
        batchProcessingTimeMs = 2000L, Optional.empty[Long](), hasTimedOut = true)
      val out = DualWrite.lwwUpdate(ttl)(s"k$i", Iterator.empty, st)
      assert(out == (s"k$i", i.toLong, s"v$i"), "eviction emits the winner one final time")
      st
    }
    assert(evicted.forall(_.isRemoved), "idle keys must leave the state store")

    // activity RE-ARMS the clock: an update on live state pushes the
    // timeout out from the CURRENT batch time
    val live = TestGroupState.create[(Long, String)](
      Optional.of((10L, "old")), GroupStateTimeout.ProcessingTimeTimeout,
      batchProcessingTimeMs = 5000L, Optional.empty[Long](), hasTimedOut = false)
    DualWrite.lwwUpdate(ttl)("k", Iterator(("k", 5L, "older-loser")), live)
    assert(live.get == ((10L, "old")), "older row must not regress LWW state")
    assert(live.getTimeoutTimestampMs.get() == 5500L, "every update re-arms the TTL")

    // eviction is SAFE, not lossy: a late row for an evicted key simply
    // re-creates state (fresh group) and LWW re-resolves on the sink
    val reborn = freshState(now = 9000L)
    val out = DualWrite.lwwUpdate(ttl)("k1", Iterator(("k1", 999L, "resurrected")), reborn)
    assert(out == ("k1", 999L, "resurrected") && reborn.isUpdated)

    // and the NoTimeout form (the processAllAvailable-friendly test mode)
    // must not arm timers at all
    val noTtl = TestGroupState.create[(Long, String)](
      Optional.empty(), GroupStateTimeout.NoTimeout,
      batchProcessingTimeMs = 1000L, Optional.empty[Long](), hasTimedOut = false)
    DualWrite.lwwUpdate(None)("k", Iterator(("k", 1L, "v")), noTtl)
    assert(!noTtl.getTimeoutTimestampMs.isPresent)
  }

  test("dropDuplicatesWithinWatermark dedups replayed writes (T3 built-in form)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val out = mem.toDF().toDF("pk", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("pk")
    val q = out.writeStream.format("memory").queryName("ddw_out")
      .outputMode("append").start()
    try {
      def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
      mem.addData(("k1", ts(0)), ("k1", ts(1)), ("k2", ts(2)))
      q.processAllAvailable()
      mem.addData(("k1", ts(3)))   // replay within the watermark window
      q.processAllAvailable()
      val rows = spark.table("ddw_out").groupBy("pk").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(rows == Map("k1" -> 1L, "k2" -> 1L), s"duplicates leaked: $rows")
    } finally q.stop()
  }

  test("streaming session windows close after the gap (W5 streaming twin)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, java.sql.Timestamp)]
    val out = mem.toDF().toDF("user", "ts")
      .withWatermark("ts", "1 hour")
      .groupBy(col("user"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
    // session windows only support append mode: a session emits once the
    // watermark passes its close
    val q = out.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    try {
      def ts(h: Int, m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")
      // two events 10min apart (one session), then one 2h later (new session)
      mem.addData(("u1", ts(10, 0)), ("u1", ts(10, 10)), ("u1", ts(12, 30)))
      q.processAllAvailable()
      // advance the watermark far enough to close both u1 sessions
      mem.addData(("u2", ts(15, 0)))
      q.processAllAvailable()
      val sessions = spark.table("sessions_out")
        .filter(col("user") === "u1")
        .select(col("n")).collect().map(_.getLong(0)).sorted.toSeq
      assert(sessions == Seq(1L, 2L),
        s"expected the 10:00+10:10 pair in one session and 12:30 alone, got $sessions")
    } finally q.stop()
  }

  test("workload sim maps the rate source to the configured op mix (T6)") {
    val df = DualWrite.workloadSim(spark, 10, 0.7)
    assert(df.isStreaming)
    assert(df.columns.toSet == Set("ts", "op_id", "op_type"))
  }

  test("periodic validation reports both sides' counts every trigger (T5)") {
    val base = tmp()
    val df = spark.read.parquet(s"${sf()}/orders.parquet").limit(50)
    df.write.parquet(s"$base/origin")
    df.limit(40).write.parquet(s"$base/target")
    @volatile var seen: Option[(Long, Long)] = None
    val q = DualWrite.periodicValidation(spark, s"$base/origin", s"$base/target",
      s"$base/ckpt", "1 second") { (o, t) => seen = Some((o, t)) }
    try {
      var waited = 0
      while (seen.isEmpty && waited < 100) { Thread.sleep(100); waited += 1 }
      assert(seen.contains((50L, 40L)), s"expected (50, 40) count gate, got $seen")
    } finally q.stop()
  }

  test("metrics listener observes batches and rows (T7)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val listener = new DualWrite.MetricsListener
    spark.streams.addListener(listener)
    val mem = MemoryStream[Long]
    val q = mem.toDF().writeStream.format("noop").start()
    try {
      mem.addData(1L, 2L, 3L)
      q.processAllAvailable()
      // listener events are async; give the bus a moment
      var waited = 0
      while (listener.rows < 3 && waited < 50) { Thread.sleep(100); waited += 1 }
      assert(listener.rows >= 3)
      assert(listener.batches >= 1)
    } finally {
      q.stop()
      spark.streams.removeListener(listener)
    }
  }
}
