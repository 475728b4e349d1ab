package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star brief): media travel as opaque
  * `binary` payloads with typed metadata; decode/feature-extraction runs as
  * an imperative per-partition pass (the Scala analog of a mapInPandas batch
  * UDF — same batch shape: one partition in, an iterator of feature rows
  * out).
  *
  * The decode step itself is a DETERMINISTIC STUB (this container has no
  * image/audio codecs): features derive from the bytes (length, head byte,
  * md5, fixed-size frame count). The Spark-side contract — binary schema,
  * partition-preserving batch execution, typed output rows — is real and
  * oracle-tested; swapping the stub for a JNI/codec call changes no
  * plumbing.
  *
  * Scale posture: decode is a narrow per-partition map (no shuffle); payload
  * bytes never leave the executor, only small feature rows do.
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

  /** "Decode" each payload into features, one partition at a time. Frame
    * sampling is modeled as fixed 64-byte windows (the frame-sample /
    * resize analog).
    */
  def decodeFeatures(binTable: DataFrame, frameBytes: Int = 64): DataFrame = {
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
