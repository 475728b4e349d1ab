package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Landed-corpus layout for the incremental-dedup verify scan (r10 verdict
  * item 6): writeLandedCorpus range-sorts by doc id so parquet row groups
  * carry tight id envelopes, and incrementalDupes pushes its (gated)
  * candidate-id OR-of-equals predicate into the scan — asserted here from
  * ACTUAL task input metrics, the ZorderSpec technique: the landed layout
  * must read a fraction of the records the round-robin layout reads, with
  * identical output.
  */
class StoreLayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Sum of task-level input records over the jobs run inside `f` (see
    * ZorderSpec — the actual post-pruning scan metric).
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
      var last = -1L
      var spins = 0
      while (acc.get() != last && spins < 50) {
        last = acc.get(); spins += 1; Thread.sleep(100)
      }
      acc.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("landed-corpus layout + candidate pushdown: the verify scan reads a " +
       "fraction of the corpus records, by actual task input metrics") {
    // 10k docs; two get near-twins in the probe batch. Unique word soup
    // per doc so band collisions stay confined to the planted pairs.
    val corpus = spark.range(10000).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 to 11).map(j =>
        concat(lit(s"w$j"), (col("id") * 13 + j * 7919) % 100000)): _*)
        .as("text"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-landed").toString
    corpus.repartition(8).write.parquet(s"$base/natural")
    LlmOps.writeLandedCorpus(corpus, "doc_id", s"$base/landed", files = 8)
    val store = s"$base/store"
    LlmOps.writeSignatureStore(corpus, "doc_id", store)
    val twinOf = Seq(777L, 8888L)
    val batch = corpus.filter(col("doc_id").isin(twinOf: _*))
      .select((col("doc_id") + 100000L).as("doc_id"),
        concat(col("text"), lit(" tail")).as("text"))
    def probe(path: String) =
      LlmOps.incrementalDupes(spark.read.parquet(path), batch, "doc_id",
          store, threshold = 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    var results = Seq.empty[Set[(Long, Long)]]
    val natRecords = recordsRead { results :+= probe(s"$base/natural") }
    val landedRecords = recordsRead { results :+= probe(s"$base/landed") }
    // identical dup pairs under either layout — layout must not lose data
    assert(results.distinct.size == 1 &&
      results.head == twinOf.map(b => (b + 100000L, b)).toSet,
      s"per-layout results: $results")
    // the natural layout's verify scan materializes ~the whole corpus
    // (round-robin row groups span the full id range → the pushed
    // predicate prunes nothing); the landed layout prunes all but the
    // candidate row groups. Store/batch scans are identical on both
    // sides, so the delta isolates the corpus verify scan.
    assert(landedRecords <= natRecords - 5000L,
      s"landed layout must prune the verify scan: landed=$landedRecords natural=$natRecords")
  }

  test("candidate pushdown stays gated: over CandidateInFilterMaxIds ids " +
       "the verify falls back to the plain semi-join (same result)") {
    // every batch doc twins a distinct corpus doc → candidates > gate
    val n = LlmOps.CandidateInFilterMaxIds + 20
    val corpus = spark.range(2000).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 to 11).map(j =>
        concat(lit(s"w$j"), (col("id") * 13 + j * 7919) % 100000)): _*)
        .as("text"))
    val base = java.nio.file.Files
      .createTempDirectory("graft-landed-gate").toString
    LlmOps.writeLandedCorpus(corpus, "doc_id", s"$base/landed", files = 4)
    val store = s"$base/store"
    LlmOps.writeSignatureStore(corpus, "doc_id", store)
    val batch = corpus.filter(col("doc_id") < n)
      .select((col("doc_id") + 100000L).as("doc_id"), col("text"))
    val got = LlmOps.incrementalDupes(spark.read.parquet(s"$base/landed"),
        batch, "doc_id", store, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == (0L until n).map(i => (i + 100000L, i)).toSet,
      s"gated fallback must still find all ${n} twins, got ${got.size}")
  }
}
