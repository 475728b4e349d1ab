package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 tier generator (VERDICT r8 #9): scales the read-only
  * sf0.1 testdata ×`factor` into a local dir so the heavy bench family
  * runs ≥1 s/query — above the ~0.2 s session-overhead floor where host
  * weather swamps the signal (NOTES r8). The testdata dirs must not be
  * modified, and sf1 parquet is too large to commit, so the GENERATOR is
  * the committed artifact; the data materializes on demand:
  *
  *   sbt "runMain graft.tools.GenSf"          # → target/sf1 (10× sf0.1)
  *   SPARK_GRAFT_SF_DIR=target/sf1 sbt "runMain graft.Bench"
  *
  * Construction — `factor` key-shifted copies per table, not row
  * replication-in-place:
  *  - every key column shifts by copy × (max(key)+1), so PKs stay unique
  *    (the diff family's DupPkPolicy gate would rightly abort otherwise)
  *    and FK join fan-outs match the original per copy (customer/orders
  *    share the custkey stride, lineitem/part/supplier likewise);
  *  - region/nation stay as-is (fixed dimension vocabularies — their
  *    cardinality does not scale with data);
  *  - documents re-text copies ≥1 with md5-derived tokens of the SAME
  *    per-doc word count: verbatim copies would hand every doc 9 exact
  *    clones and turn the dedup family into a duplicate-factory benchmark;
  *    duplication structure is injected by the queries' own
  *    docsWithDups/embWithDups wrappers and must scale with the table, not
  *    the copy count. doc_id stays < 100000 (the wrappers' dup-shift
  *    offset) by construction at factor 10.
  *  - embeddings regenerate copies ≥1 from hashes (64-dim, same label
  *    distribution), for the same reason.
  *
  * Everything is a pure function of (source row, copy index) — two runs
  * produce byte-identical tables.
  */
object GenSf {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "target/sf1"
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, src, out, factor)
    spark.stop()
  }

  def generate(spark: SparkSession, src: String, out: String, factor: Int): Unit = {
    // events.ts ships in different shapes across testdata rounds
    // (TIMESTAMP(NANOS)/(MICROS), int64 nanos) — normalize through
    // Common.eventsRawNanos so the generated tier ALWAYS carries plain
    // int64 nanos, the one shape every consumer (Common.events, the
    // oracle harness's BIGINT shim) already handles.
    def rd(t: String): DataFrame =
      if (t == "events")
        graft.queries.Common.eventsRawNanos(spark, s"$src/$t.parquet")
      else spark.read.parquet(s"$src/$t.parquet")
    def stride(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head().getLong(0) + 1L

    /** Union `factor` copies, shifting each listed key column by
      * copy × its stride. Copy 0 is the original.
      */
    def scaled(df: DataFrame, keys: Map[String, Long],
               reText: Option[Int => DataFrame => DataFrame] = None): DataFrame =
      (0 until factor).map { c =>
        val shifted = keys.foldLeft(df) { case (d, (k, s)) =>
          d.withColumn(k, col(k) + lit(c * s))
        }
        reText.map(f => f(c)(shifted)).getOrElse(shifted)
      }.reduce(_.unionByName(_))

    val custStride = stride(rd("customer"), "c_custkey")
    val orderStride = stride(rd("orders"), "o_orderkey")
    val partStride = stride(rd("part"), "p_partkey")
    val suppStride = stride(rd("supplier"), "s_suppkey")
    val userStride = stride(rd("events"), "user_id")

    val tables: Seq[(String, DataFrame)] = Seq(
      "region" -> rd("region"),
      "nation" -> rd("nation"),
      "customer" -> scaled(rd("customer"), Map("c_custkey" -> custStride)),
      "supplier" -> scaled(rd("supplier"), Map("s_suppkey" -> suppStride)),
      "part" -> scaled(rd("part"), Map("p_partkey" -> partStride)),
      "orders" -> scaled(rd("orders"),
        Map("o_orderkey" -> orderStride, "o_custkey" -> custStride)),
      "lineitem" -> scaled(rd("lineitem"),
        Map("l_orderkey" -> orderStride, "l_partkey" -> partStride,
            "l_suppkey" -> suppStride)),
      "events" -> scaled(rd("events"),
        Map("event_id" -> stride(rd("events"), "event_id"),
            "user_id" -> userStride)),
      "documents" -> scaled(rd("documents"),
        Map("doc_id" -> stride(rd("documents"), "doc_id")),
        reText = Some(c => df =>
          if (c == 0) df
          else df
            .withColumn("text", expr(
              """concat_ws(' ', transform(sequence(1, size(split(text, ' '))),
                   j -> substr(md5(concat(cast(doc_id as string), ':',
                                          cast(j as string))), 1, 6)))"""))
            .withColumn("n_chars", length(col("text")).cast("long")))),
      "embeddings" -> scaled(rd("embeddings"),
        Map("vec_id" -> stride(rd("embeddings"), "vec_id")),
        reText = Some(c => df =>
          if (c == 0) df
          else df.withColumn("embedding", expr(
            """transform(sequence(0, 63),
                 j -> cast(pmod(hash(vec_id * 64 + j), 1000) as float) / 1000.0f)""")))))

    for ((name, df) <- tables) {
      df.write.mode("overwrite").parquet(s"$out/$name.parquet")
      println(f"$name%-12s ${spark.read.parquet(s"$out/$name.parquet").count()}%,d rows")
    }
  }
}
