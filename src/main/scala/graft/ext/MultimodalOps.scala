package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star brief): media travel as opaque
  * `binary` payloads with typed metadata; decode/feature-extraction stays a
  * narrow per-row projection (no shuffle; payload bytes never leave the
  * executor, only small feature rows do).
  *
  * The decode step itself is a DETERMINISTIC STUB (this container has no
  * image/audio codecs): features derive from the bytes (length, head byte,
  * md5, fixed-size frame count). Every stubbed feature is a built-in
  * expression, so [[decodeFeatures]] is fully declarative — the whole pass
  * runs inside WholeStageCodegen over columnar parquet reads (r14 VERDICT:
  * the previous mapPartitions/Row-object form dropped out of both for no
  * reason). A REAL codec (JNI/native decode) cannot be an expression; that
  * swap point is [[decodeFeaturesImperative]] — the mapInPandas-shaped
  * per-partition batch seam, kept as the documented escape hatch and
  * spec-pinned output-identical to the declarative stub
  * (MultimodalPlumbingSpec).
  */
object MultimodalOps {

  /** Wrap a text corpus as a binary-payload table (payload = utf-8 bytes),
    * the shape a real media table would have: (id, payload, mime, n_bytes).
    */
  def toBinaryTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("payload"),
      lit("text/plain").as("mime"),
      octet_length(col("text")).as("n_bytes"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("head_byte", IntegerType),
    StructField("digest", StringType),
    StructField("n_frames", IntegerType)))

  /** "Decode" each payload into features — declarative: md5/octet_length/
    * first-byte/frame-count are all built-in expressions, so the pass is
    * one codegen'd projection over the columnar scan. Frame sampling is
    * modeled as fixed `frameBytes`-byte windows (the frame-sample / resize
    * analog).
    */
  def decodeFeatures(binTable: DataFrame, frameBytes: Int = 64): DataFrame =
    binTable.select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      // first byte as unsigned int; -1 for empty payloads (conv of the
      // empty string is 0, which would collide with a real 0x00 head)
      when(octet_length(col("payload")) === 0, lit(-1))
        .otherwise(conv(substring(hex(col("payload")), 1, 2), 16, 10)
          .cast("int")).as("head_byte"),
      md5(col("payload")).as("digest"),
      ceil(octet_length(col("payload")) / lit(frameBytes.toDouble))
        .cast("int").as("n_frames"))

  /** The per-partition IMPERATIVE decode seam — where a real codec call
    * (JNI image/audio decode, frame grab) plugs in: one partition of
    * payloads in, an iterator of typed feature rows out (the Scala analog
    * of a mapInPandas batch UDF — same batch shape). NOT the registry
    * path: with the decode stubbed to byte-level features the declarative
    * [[decodeFeatures]] computes the same rows without leaving codegen;
    * this form exists because a native decoder cannot be an expression.
    * Spec-pinned output-identical to the declarative stub.
    */
  def decodeFeaturesImperative(binTable: DataFrame,
                               frameBytes: Int = 64): DataFrame = {
    val enc = Encoders.row(featureSchema)
    val idIx = binTable.columns.indexOf("doc_id")
    val payloadIx = binTable.columns.indexOf("payload")
    binTable.mapPartitions { it =>
      val md = java.security.MessageDigest.getInstance("MD5")
      it.map { r =>
        val id = r.getLong(idIx)
        val bytes = r.getAs[Array[Byte]](payloadIx)
        md.reset()
        val digest = md.digest(bytes).map("%02x".format(_)).mkString
        val frames = (bytes.length + frameBytes - 1) / frameBytes
        org.apache.spark.sql.Row(id, bytes.length,
          if (bytes.isEmpty) -1 else bytes(0) & 0xff, digest, frames)
      }
    }(enc)
  }
}
