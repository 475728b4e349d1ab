package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Hashing
import graft.validate.Diff

/** Reconciliation / validation queries — SURVEY §2.3 J1–J4, §2.4 A1/A3,
  * §2.9 T3. Origin = lineitem, target = the defect-injected twin
  * (Common.lineitemTwin), so every diff class is non-empty and the DuckDB
  * oracle can reproduce the target exactly.
  */
object DiffQueries {
  import Common._

  /** Null-safe equality over the compare columns, as DuckDB SQL. */
  private val eqSql: String =
    liCompare.map(c => s"o.$c IS NOT DISTINCT FROM t.$c").mkString(" AND ")

  val qs: Map[String, Q] = Map(
    // A1 — the count gate (validate_migration.py:28-39): counts both sides
    "count_star" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val tw = lineitemTwin(li)
      li.agg(count(lit(1)).as("origin_rows"))
        .crossJoin(tw.agg(count(lit(1)).as("target_rows")))
        .select(col("origin_rows"), col("target_rows"),
          (col("origin_rows") === col("target_rows")).as("counts_match"))
    }),

    // J1 — DiffData full reconciliation report (docs/04-cdm-approach.md:355-377)
    "diff_full_outer" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Diff.report(li, lineitemTwin(li), liPk, liCompare)
    }),

    // J2 — missing-row detection (autocorrect.missing feed)
    "diff_missing_anti" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Diff.missing(li, lineitemTwin(li), liPk)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J3 — mismatch detection (same PK, different content)
    "diff_mismatch" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Diff.mismatched(li, lineitemTwin(li), liPk, liCompare)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("o_l_quantity"), col("t_l_quantity"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // J4 — sampled lookup validation (validate_migration.py:43-72);
    // broadcast the 500-row sample, stream the target (plan-tested)
    "validate_sample" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      Diff.validateSample(li, lineitemTwin(li), liPk, liCompare, 500)
    }),

    // A3 — portable md5 row hash (06-validation-monitoring.md:95-98)
    "row_hash" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      li.select(col("l_orderkey"), col("l_linenumber"),
          Hashing.portableRowHash(li.schema, li.columns.toSeq).as("row_md5"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)
    }),

    // T3 — last-write-wins merge of origin+target versions; mutated target
    // rows carry a newer writetime and must win (docs/04-cdm-approach.md:837-841)
    "lww_merge" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val o = li.withColumn("writetime", unix_micros(col("l_shipdate")))
        .withColumn("src", lit(0))
      val tw = lineitemTwin(li)
        .withColumn("writetime",
          unix_micros(col("l_shipdate")) +
            when(col("l_orderkey") % 89 === 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("src", lit(1))
      Diff.lwwMerge(o.unionByName(tw), liPk, "writetime", Seq("src"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("writetime"), col("src"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    })
  )

  val oracle: Map[String, String] = Map(
    "count_star" ->
      s"""WITH twin AS ($twinSql)
          SELECT (SELECT count(*) FROM lineitem) AS origin_rows,
                 (SELECT count(*) FROM twin) AS target_rows,
                 (SELECT count(*) FROM lineitem) = (SELECT count(*) FROM twin) AS counts_match""",
    "diff_full_outer" ->
      s"""WITH twin AS ($twinSql)
          SELECT CASE WHEN o.l_orderkey IS NULL THEN 'extra_in_target'
                      WHEN t.l_orderkey IS NULL THEN 'missing'
                      WHEN $eqSql THEN 'valid'
                      ELSE 'mismatch' END AS diff_status,
                 count(*) AS n
          FROM lineitem o FULL OUTER JOIN twin t
            ON o.l_orderkey = t.l_orderkey AND o.l_linenumber = t.l_linenumber
          GROUP BY 1 ORDER BY diff_status""",
    "diff_missing_anti" ->
      s"""WITH twin AS ($twinSql)
          SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem o
          WHERE NOT EXISTS (SELECT 1 FROM twin t
            WHERE t.l_orderkey = o.l_orderkey AND t.l_linenumber = o.l_linenumber)
          ORDER BY l_orderkey, l_linenumber""",
    "diff_mismatch" ->
      s"""WITH twin AS ($twinSql)
          SELECT o.l_orderkey, o.l_linenumber,
                 o.l_quantity AS o_l_quantity, t.l_quantity AS t_l_quantity
          FROM lineitem o JOIN twin t
            ON o.l_orderkey = t.l_orderkey AND o.l_linenumber = t.l_linenumber
          WHERE NOT ($eqSql)
          ORDER BY o.l_orderkey, o.l_linenumber""",
    "validate_sample" ->
      s"""WITH twin AS ($twinSql),
          sample AS (SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 500),
          j AS (SELECT o.*, t.l_orderkey AS hit,
                       CASE WHEN t.l_orderkey IS NOT NULL AND NOT ($eqSql) THEN 1 END AS bad
                FROM sample o LEFT JOIN twin t
                  ON o.l_orderkey = t.l_orderkey AND o.l_linenumber = t.l_linenumber)
          SELECT count(*) AS sampled, count(hit) AS found,
                 count(*) - count(hit) AS missing, count(bad) AS mismatched
          FROM j""",
    "row_hash" -> {
      // Mirror Hashing.portableRowHash: columns sorted by name, each
      // length-prefixed canonical string, nulls as chr(1), md5 of the concat.
      val cols = Seq(
        "l_discount" -> "dbl", "l_extendedprice" -> "dbl",
        "l_linenumber" -> "str", "l_linestatus" -> "str",
        "l_orderkey" -> "str", "l_partkey" -> "str",
        "l_quantity" -> "dbl", "l_returnflag" -> "str",
        "l_shipdate" -> "ts", "l_suppkey" -> "str", "l_tax" -> "dbl")
      val parts = cols.map { case (c, k) =>
        val canon = k match {
          case "dbl" => s"CASE WHEN isnan($c) THEN 'NaN' WHEN $c = 'infinity'::DOUBLE THEN 'Inf' WHEN $c = '-infinity'::DOUBLE THEN '-Inf' ELSE CAST(CAST($c AS DECIMAL(28,6)) AS VARCHAR) END"
          case "ts"  => s"CAST(epoch_us($c) AS VARCHAR)"
          case _     => s"CAST($c AS VARCHAR)"
        }
        s"coalesce(CAST(length($canon) AS VARCHAR) || ':' || $canon, chr(1))"
      }
      s"""SELECT l_orderkey, l_linenumber,
          md5(${parts.mkString(" || ")}) AS row_md5
          FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100"""
    },
    "lww_merge" ->
      s"""WITH twin AS ($twinSql),
          versions AS (
            SELECT l_orderkey, l_linenumber, l_quantity,
                   epoch_us(l_shipdate) AS writetime, 0 AS src FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, l_quantity,
                   epoch_us(l_shipdate) + CASE WHEN l_orderkey % 89 = 0 THEN 1 ELSE 0 END AS writetime,
                   1 AS src FROM twin),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY l_orderkey, l_linenumber
                                         ORDER BY writetime DESC, src DESC) AS rn
            FROM versions)
          SELECT l_orderkey, l_linenumber, l_quantity, writetime, src
          FROM ranked WHERE rn = 1
          ORDER BY l_orderkey, l_linenumber"""
  )
}
