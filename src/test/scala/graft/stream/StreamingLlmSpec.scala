package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.LlmOps

/** The training-data operators on unbounded input: stateless per-row ops
  * (quality gate, fingerprints, simhash) run on streams unchanged — the
  * same Catalyst expressions, micro-batched — and exact dedup becomes
  * watermarked dropDuplicates state. This is the ingest-side shape of the
  * pipeline: filter + fingerprint + dedup documents as they arrive, long
  * before any batch LSH pass.
  */
class StreamingLlmSpec extends SparkSpec {

  test("stateless text ops (words/simhash/winnow) run on a stream unchanged") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val out = LlmOps.withSimhash(LlmOps.withWords(docs))
      .withColumn("fp", expr("array_min(graft_sliding_min(graft_gram_hash(text, 5, ':wn', 15), 4))"))
      .select("doc_id", "simhash", "fp")
    assert(out.isStreaming)
    val q = out.writeStream.format("memory").queryName("llm_stream_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "the quick brown fox jumps over the lazy dog today"),
        (2L, "the quick brown fox jumps over the lazy dog today"),
        (3L, "completely different content with other words entirely here"))
      q.processAllAvailable()
      val rows = spark.table("llm_stream_out").collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      // identical docs get identical signatures through the streaming path
      assert(rows(1L) == rows(2L))
      assert(rows(1L) != rows(3L))
      // and the streaming values match the batch path bit-for-bit
      val batch = LlmOps.withSimhash(LlmOps.withWords(
          Seq((1L, "the quick brown fox jumps over the lazy dog today")).toDF("doc_id", "text")))
        .select("simhash").collect().head.getLong(0)
      assert(rows(1L)._1 == batch)
    } finally q.stop()
  }

  test("streaming exact dedup: content-hash dropDuplicates within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String, java.sql.Timestamp)]
    def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val out = mem.toDF().toDF("doc_id", "text", "ts")
      .withColumn("content_h", md5(col("text")))
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("content_h")
    val q = out.writeStream.format("memory").queryName("stream_dedup_out")
      .outputMode("append").start()
    try {
      mem.addData((1L, "same text", ts(0)), (2L, "same text", ts(1)),
        (3L, "other text", ts(2)))
      q.processAllAvailable()
      mem.addData((4L, "same text", ts(3))) // replay inside the watermark
      q.processAllAvailable()
      val kept = spark.table("stream_dedup_out").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(kept.contains(3L))
      assert((kept & Set(1L, 2L, 4L)).size == 1,
        s"exactly one copy of the duplicated content may survive, kept=$kept")
    } finally q.stop()
  }
}
