package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe behind the two-level (hierarchical) IVF assignment
  * (LlmOps.kmeansAssignToHier — r10 verdict item 4): measures, per
  * (corpus regime, c, probeG),
  *
  *   - assignment parity vs flat assignCells (fraction of vectors landing
  *     in the SAME trained cell — the hierarchical residual-miss rate),
  *   - the winning-cosine loss on disagreements (how much worse the
  *     hierarchically-chosen cell is, in the metric the index ranks by),
  *   - wall-clock for both assignment forms.
  *
  * Two corpus regimes, deliberately:
  *   - CLUSTERED (c planted centers + jitter) — the regime a trained
  *     index exists for; parity should be ~1.0 even at probeG = 1;
  *   - UNIFORM (the Stress hash-noise table; run Stress first so
  *     target/stress/emb_big.parquet exists) — the worst case: cells are
  *     near-equidistant, cell IDENTITY is arbitrary, so parity is low by
  *     construction and the cosine loss is the meaningful number.
  *
  *   sbt "runMain graft.tools.HierProbe [nVec] [c1,c2,...]"
  */
object HierProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val cs = if (args.length > 1) args(1).split(",").map(_.toInt).toSeq
             else Seq(1024)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val uniform = spark.read.parquet("/root/repo/target/stress/emb_big.parquet")
      .filter(col("vec_id") < n)
      .select(col("vec_id"), col("embedding")).persist()
    uniform.count()
    for (c <- cs) {
      // clustered: c planted centers (hash-noise directions), members =
      // center + small deterministic jitter
      val clustered = spark.range(n).select(
        col("id").as("vec_id"),
        expr(s"""transform(sequence(0, 63),
              j -> cast(pmod(hash((id % $c) * 64 + j), 1000) as float) / 1000.0f
                   + cast(pmod(hash(id * 64 + j), 100) as float) / 5000.0f)""")
          .as("embedding")).persist()
      clustered.count()
      for ((regime, emb) <- Seq(("clustered", clustered), ("uniform", uniform))) {
        val trainN = math.min(n, c.toLong * 16)
        val cents = graft.ext.LlmOps.kmeansCentroids(
          emb.filter(col("vec_id") < trainN), c, iters = 2)
        def agg(df: DataFrame) =
          df.select(col("vec_id"), col("cid"), col("ccos"))
        val (flat, tFlat) = timed {
          val d = agg(graft.ext.LlmOps.kmeansAssignTo(emb, cents)).persist()
          d.count(); d
        }
        for (probeG <- Seq(1, 4)) {
          val (hier, tHier) = timed {
            val d = agg(graft.ext.LlmOps.kmeansAssignToHier(emb, cents,
                probeG = probeG))
              .withColumnRenamed("cid", "hcid").withColumnRenamed("ccos", "hccos")
              .persist()
            d.count(); d
          }
          val stats = flat.join(hier, "vec_id").agg(
            count(lit(1)).as("n"),
            sum(when(col("cid") === col("hcid"), 1L).otherwise(0L)).as("same"),
            avg(when(col("cid") =!= col("hcid"),
              col("ccos") - col("hccos"))).as("mean_cos_loss"),
            max(when(col("cid") =!= col("hcid"),
              col("ccos") - col("hccos"))).as("max_cos_loss")).head()
          val parity = stats.getLong(1).toDouble / stats.getLong(0)
          println(f"$regime%-10s c=$c%-6d probeG=$probeG  n=${n / 1000}%dk  " +
            f"flat ${tFlat}%7.1fs  hier ${tHier}%7.1fs  parity ${parity}%.4f  " +
            s"cos-loss mean ${Option(stats.get(2)).getOrElse(0.0)} " +
            s"max ${Option(stats.get(3)).getOrElse(0.0)}")
          hier.unpersist()
        }
        flat.unpersist()
      }
      clustered.unpersist()
    }
    spark.stop()
  }
}
