package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.stream.AnomalyStream.{Event, Flagged}

/** Streaming z-score anomaly detection (r13): Welford state per group,
  * each event scored against PRIOR statistics only, warm-up floor,
  * deterministic within-batch ordering — and the streamed flags must
  * equal the batch fold reference on any id-ordered batch split.
  */
class AnomalyStreamSpec extends SparkSpec {
  import spark.implicits._

  /** Two groups: "steady" oscillates tightly around 50; "noisy" has wide
    * spread. Spikes planted mid-stream at ids 200 (steady, value 500 —
    * a huge z) and 231 (noisy, value 52 — benign for its group's spread).
    */
  private def eventsAll: Seq[Event] = {
    val steady = (0 until 150).map(i =>
      Event(i * 2L, "steady", 50.0 + (i % 5) * 0.1))
    val noisy = (0 until 150).map(i =>
      Event(i * 2L + 1, "noisy", 50.0 + (i % 40) * 5.0))
    val withSpikes = (steady ++ noisy).map {
      case e if e.event_id == 200L => e.copy(value = 500.0)
      case e if e.event_id == 231L => e.copy(value = 52.0)
      case e => e
    }
    withSpikes.sortBy(_.event_id)
  }

  private def runStream(batches: Seq[Seq[Event]], threshold: Double = 3.0,
                        warmup: Long = 30): Seq[Flagged] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[Event]
    val out = AnomalyStream.flagOutliers(in.toDS(), threshold, warmup)
    val q = out.writeStream.format("memory")
      .queryName(s"anomaly_out_${System.nanoTime()}")
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(q.name).as[Flagged].collect().toSeq.sortBy(_.event_id)
    } finally q.stop()
  }

  test("planted spike flags against its own group's running stats; a " +
       "same-magnitude value in the wide group stays benign; warm-up " +
       "suppresses early flags") {
    val flags = runStream(Seq(eventsAll))
    assert(flags.exists(f => f.event_id == 200L && f.event_type == "steady"),
      s"the steady-group spike must flag: $flags")
    assert(!flags.exists(_.event_id == 231L),
      "52.0 is inside the noisy group's spread — must not flag")
    // nothing flags before the warm-up floor (30 prior events per group)
    assert(flags.forall(_.n_prior >= 30))
    // the spike's z is huge and scored against PRIOR stats only
    val spike = flags.find(_.event_id == 200L).get
    assert(spike.z > 50.0, s"z=${spike.z}")
  }

  test("streamed flags equal the batch fold reference, and are invariant " +
       "to how the id-ordered prefix splits into micro-batches") {
    val ref = AnomalyStream.referenceFlags(eventsAll, 3.0, 30)
      .map(f => (f.event_id, f.event_type, f.n_prior))
    val one = runStream(Seq(eventsAll))
      .map(f => (f.event_id, f.event_type, f.n_prior))
    val three = runStream(Seq(
        eventsAll.take(100), eventsAll.slice(100, 180), eventsAll.drop(180)))
      .map(f => (f.event_id, f.event_type, f.n_prior))
    assert(one == ref, s"stream vs reference:\n$one\n$ref")
    assert(three == ref, "flags must not depend on the micro-batch split")
    assert(ref.nonEmpty)
  }

  test("state stays enum-bounded: final running stats equal the exact " +
       "batch moments per group") {
    // run the fold reference's state to the end and compare against
    // exact two-pass moments — Welford must not drift
    val byType = eventsAll.groupBy(_.event_type)
    byType.foreach { case (_, es) =>
      var st = AnomalyStream.ZState(0L, 0.0, 0.0)
      es.sortBy(_.event_id).foreach(e => st = st.add(e.value))
      val xs = es.map(_.value)
      val mu = xs.sum / xs.length
      val m2 = xs.map(x => (x - mu) * (x - mu)).sum
      assert(st.n == xs.length)
      assert(math.abs(st.mean - mu) < 1e-9)
      assert(math.abs(st.m2 - m2) < 1e-6 * (1.0 + m2))
    }
  }
}
