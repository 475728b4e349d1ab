package graft.stream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.ext.LlmOps

/** The composed ingest path a training-data pipeline runs on arriving
  * documents — every stage is an operator this library already provides,
  * wired end-to-end on an unbounded source:
  *
  *   quality gate (stateless Gopher-style rules)
  *     → fingerprint (codegen'd winnowing min + content hash)
  *       → streaming exact dedup (watermarked state on the content hash)
  *         → idempotent dual sink (batchId-scoped, replay-safe)
  *
  * Scale posture: the gate and fingerprints are narrow per-row maps (all
  * native expressions); dedup state is bounded by the watermark horizon,
  * not corpus lifetime; the sink writes each micro-batch once per side.
  * Near-dup (MinHash/LSH) dedup stays a batch pass over the landed corpus
  * — banding needs the full signature table, so it runs downstream, not in
  * the ingest hot path.
  */
object IngestPipeline {

  final case class Config(
      minTokens: Int = 10,
      maxTokens: Int = 1000,
      maxStopRatio: Double = 0.5,
      dedupLateness: String = "10 minutes",
      originPath: String,
      targetPath: String,
      checkpoint: String,
      trigger: Trigger = Trigger.ProcessingTime("1 second"))

  /** Stateless quality + fingerprint stage. Works identically on batch and
    * streaming frames (no aggregation, no state): input needs (doc_id,
    * text); output adds n_tokens, stop_ratio, passes, fingerprint (winnow
    * set minimum) and content_h (exact-dedup key).
    */
  def gateAndFingerprint(docs: DataFrame, cfg: Config): DataFrame = {
    graft.functions.GraftFunctions.ensure(docs.sparkSession)
    LlmOps.withWords(docs)
      .withColumn("n_tokens", size(col("words")))
      .withColumn("stop_ratio",
        LlmOps.round6(expr("size(filter(words, w -> w in ('the', 'a')))").cast("double") /
          col("n_tokens").cast("double")))
      .withColumn("passes",
        col("n_tokens").between(cfg.minTokens, cfg.maxTokens) &&
          col("stop_ratio") < cfg.maxStopRatio)
      // min of the window minima IS the fingerprint-set minimum — no
      // array_distinct pass needed (min(distinct(x)) == min(x))
      .withColumn("fingerprint",
        expr("array_min(graft_sliding_min(graft_gram_hash(text, 5, ':wn', 15), 4))"))
      .withColumn("content_h", md5(col("text")))
      .drop("words")
  }

  /** Start the full ingest: gate → keep passing docs → dedup within the
    * watermark → dual-write each micro-batch idempotently.
    */
  def start(docs: DataFrame, tsCol: String, cfg: Config): StreamingQuery = {
    val deduped = gateAndFingerprint(docs, cfg)
      .filter(col("passes"))
      .withWatermark(tsCol, cfg.dedupLateness)
      .dropDuplicatesWithinWatermark("content_h")
    // the sink IS the ZDM dual-writer — one wiring, shared with DualWrite
    DualWrite.dualWriteStream(deduped, cfg.originPath, cfg.targetPath,
      cfg.checkpoint, cfg.trigger)
  }
}
