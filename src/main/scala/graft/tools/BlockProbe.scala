package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe behind the hammingPairsByBlock bucket cap: measures the
  * block-key bucket distribution of the audio-fingerprint family on the
  * Stress corpus fixture. Run with
  *   sbt "runMain graft.tools.BlockProbe [nDocs]"
  *
  * What it established (200k fixture docs, 2026-08-14): the energy
  * envelope of the synthetic space-separated hex-word texts is PERIODIC
  * (word length ≡ 9 chars against 5-char energy windows), so the
  * sign-of-delta dhash collapses onto a handful of values — the largest
  * 21-bit block bucket held ~3.5% of the corpus (6,999 of 200k docs,
  * pairwise-work upper bound Σc² ≈ 2.6e8 — ~25× that at 1M docs), and the grouped pair
  * generation inside it is quadratic (the uncapped r10 Stress run spent
  * >25 min inside interpreted pair lambdas before being killed). Real
  * audio envelopes are not periodic, but 100 TB of web audio WILL contain
  * degenerate envelope classes (silence, test tones, constant loudness) —
  * the same hot-bucket hazard every other dedup family already caps
  * (minhash maxBucket, embedding DefaultMaxCell, video maxPostings).
  * hammingPairsByBlock therefore takes a maxBucket cap.
  */
object BlockProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 200000L
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 29),
               j -> substr(md5(cast((if(id % 10 = 0, id - 1, id)) * 31 + j as string)), 1, 8)))""")
        .as("text"))
    val hashed = docs.select(col("doc_id"),
      expr("graft_dhash(graft_frame_energy(text, 64))").as("afp"))
    val blocked = hashed.select(col("doc_id"),
      explode(expr(
        """transform(sequence(0, 2), b -> concat(cast(b as string), ':',
             cast((afp div shiftleft(1L, b * 21)) % shiftleft(1L, 21) as string)))"""))
        .as("blk"))
    val sizes = blocked.groupBy("blk").count()
    sizes.agg(count(lit(1)).as("n_buckets"), max("count").as("max_bucket"),
        expr("percentile_approx(count, 0.999)").as("p999"),
        sum(expr("count * count")).as("pairwise_work_upper"))
      .show(false)
    sizes.orderBy(col("count").desc).show(10, false)
    spark.stop()
  }
}
