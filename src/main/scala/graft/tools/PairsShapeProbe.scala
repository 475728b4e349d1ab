package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only A/B for the LSH pair-join exclusion shape (not part of the
  * driver contract; safe to delete): the r8 anti-join-vs-capped-bands
  * formulation against the r7 semi-join-with-ok-bands one, same JVM,
  * alternating runs, on a synthetic corpus with ~10% duplicate text.
  * Exists because a stress run inside a host-noise window measured the
  * candidate pipeline 9× slower than an earlier same-commit run — this
  * probe separates plan shape from host weather.
  */
object PairsShapeProbe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = spark.range(nDocs).select(
      col("id").as("doc_id"),
      expr("""concat_ws(' ', transform(sequence(0, 29),
               j -> substr(md5(cast((if(id % 10 = 0, id - 1, id)) * 31 + j as string)), 1, 8)))""")
        .as("text"))

    // count then RELEASE the pairs cache: a leaked persist makes the next
    // same-logical-plan round a cache hit, not a measurement
    def antiShape(sh: DataFrame): Long = {
      val p = LlmOps.minhashCandidatesFrom(sh, "doc_id")
      val n = p.count()
      p.unpersist()
      n
    }

    // the r7 shape, inline: semi filter via the (large) ok-band complement
    def semiShape(sh: DataFrame): Long = {
      val banded = LlmOps.bandedSignatures(sh, "doc_id").persist()
      try {
        val counts = banded.groupBy("band").count()
        val small = banded.join(
          counts.filter(col("count") <= 1000).select("band"), "band")
        small.as("x").join(small.as("y"), "band")
          .filter(col("x.doc_id") < col("y.doc_id"))
          .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
          .distinct().count()
      } finally { banded.unpersist(); () }
    }

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-12s ${(System.nanoTime() - t0) / 1e9}%8.1f s   $n%,d pairs")
    }

    // untimed warmup (JIT + codegen + first-shuffle costs), then alternate
    // the order so neither shape owns a warm/cold or noise-window slot
    locally {
      val sh = LlmOps.shingleTable(docs, "doc_id")
      try { antiShape(sh); semiShape(sh); () } finally { sh.unpersist(); () }
    }
    for (round <- 1 to 4) {
      val sh = LlmOps.shingleTable(docs, "doc_id")
      try {
        if (round % 2 == 1) {
          timed(s"anti  r$round")(antiShape(sh))
          timed(s"semi  r$round")(semiShape(sh))
        } else {
          timed(s"semi  r$round")(semiShape(sh))
          timed(s"anti  r$round")(antiShape(sh))
        }
      } finally { sh.unpersist(); () }
    }
    spark.stop()
  }
}
