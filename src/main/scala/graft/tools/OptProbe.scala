package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ext.LlmOps

/** Dev-only A/B probe for r15 optimization candidates (safe to delete):
  * times variants of the hot chains under the Bench-identical session.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.queries.Common.t

    def time(name: String)(df: => DataFrame): Unit = {
      // warmup + median-of-3, Bench protocol
      try {
        df.write.format("noop").mode("overwrite").save()
        val ts = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        println(f"[opt] $name%-36s med ${ts(1)}%6.2f  ${ts.map(x => f"$x%.2f").mkString(",")}")
      } catch { case e: Throwable => println(s"[opt] $name FAILED: ${e.getMessage}") }
    }

    def docsWithDups(docs: DataFrame): DataFrame =
      docs.unionByName(
        docs.filter(col("doc_id") % 10 === 0)
          .select(
            (col("doc_id") + 100000L).as("doc_id"),
            when(col("doc_id") % 20 === 0, concat(col("text"), lit(" tail")))
              .otherwise(col("text")).as("text"),
            col("lang"), col("source"), col("n_chars")))

    val docs = docsWithDups(t(spark, sfDir, "documents"))
    val docsR = docsWithDups(t(spark, sfDir, "documents").repartition(cpus.toInt))

    // ---- dedup_edit_distance variants ----
    def edChain(dd: DataFrame, bounded: Boolean): DataFrame = {
      val sh = LlmOps.shingleTable(dd, "doc_id")
      val cands = LlmOps.minhashCandidatesFrom(sh, "doc_id")
      val texts = dd.select(col("doc_id"), col("text"))
      val joined = cands
        .join(texts.select(col("doc_id").as("a"), col("text").as("ta")), "a")
        .join(texts.select(col("doc_id").as("b"), col("text").as("tb")), "b")
      val base =
        if (!bounded)
          joined.select(col("a"), col("b"),
            levenshtein(col("ta"), col("tb")).cast("bigint").as("dist"),
            greatest(length(col("ta")), length(col("tb"))).cast("double").as("ml"))
        else
          joined
            .select(col("a"), col("b"), col("ta"), col("tb"),
              greatest(length(col("ta")), length(col("tb"))).cast("double").as("ml"))
            .filter(abs(length(col("ta")) - length(col("tb"))).cast("double") <=
              col("ml") * 0.2000005)
            .select(col("a"), col("b"),
              expr("levenshtein(ta, tb, cast(ml * 0.2000005 as int) + 1)")
                .cast("bigint").as("dist"),
              col("ml"))
      base.filter(col("dist") >= 0) // threshold form returns -1 above the bound
        .select(col("a"), col("b"), col("dist"),
          LlmOps.round6(col("dist").cast("double") / col("ml")).as("edit_ratio"))
        .filter(col("edit_ratio") <= 0.2)
        .orderBy(col("a"), col("b"))
    }
    time("edit_distance current")(edChain(docs, bounded = false))
    time("edit_distance bounded")(edChain(docs, bounded = true))
    time("edit_distance bounded+repart")(edChain(docsR, bounded = true))

    // ---- dedup_substring variants ----
    time("substring current")(LlmOps.duplicatedSpans(docs, "doc_id")
      .orderBy(col("doc_id"), col("span_start")))
    time("substring repart")(LlmOps.duplicatedSpans(docsR, "doc_id")
      .orderBy(col("doc_id"), col("span_start")))

    // ---- profile_table variants ----
    val orders = t(spark, sfDir, "orders")
    val pcols = Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
    time("profile_table current")(
      graft.core.Ops.profileTable(orders, pcols, exactDistincts = Some(true)))
    time("profile_table repart")(
      graft.core.Ops.profileTable(orders.repartition(cpus.toInt), pcols,
        exactDistincts = Some(true)))

    spark.stop()
  }
}
