package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Hashing
import graft.validate.Diff

/** Reconciliation / validation queries — SURVEY §2.3 J1–J4, §2.4 A1/A3,
  * §2.9 T3. Origin = orders (PK `o_orderkey`, verified unique at every SF —
  * DiffData assumes exactly one row per PK), target = the defect-injected
  * twin (Common.ordersTwin), so every diff class is non-empty and the DuckDB
  * oracle can reproduce the target exactly.
  */
object DiffQueries {
  import Common._

  /** Null-safe equality over the compare columns, as DuckDB SQL. */
  private val eqSql: String =
    ordCompare.map(c => s"o.$c IS NOT DISTINCT FROM t.$c").mkString(" AND ")

  val qs: Map[String, Q] = Map(
    // A1 — the count gate (validate_migration.py:28-39): counts both sides
    "count_star" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val tw = ordersTwin(ord)
      ord.agg(count(lit(1)).as("origin_rows"))
        .crossJoin(tw.agg(count(lit(1)).as("target_rows")))
        .select(col("origin_rows"), col("target_rows"),
          (col("origin_rows") === col("target_rows")).as("counts_match"))
    }),

    // J1 — DiffData full reconciliation report (docs/04-cdm-approach.md:355-377)
    "diff_full_outer" -> ((s, d) => {
      val ord = t(s, d, "orders")
      Diff.report(ord, ordersTwin(ord), ordPk, ordCompare)
    }),

    // J1 fast tier — same DiffData report via the engine-internal 64-bit
    // row hash (classifyByHash): only (pk, hash) shuffles instead of every
    // compare column — half the exchange width on wide tables. Counts
    // equal the column-wise classify up to a ~2^-64 collision, so the
    // diff_full_outer oracle applies verbatim.
    "diff_fast_hash" -> ((s, d) => {
      val ord = t(s, d, "orders")
      Diff.classifyByHash(ord, ordersTwin(ord), ordPk, ordCompare)
        .groupBy(col(Diff.StatusCol)).agg(count(lit(1)).as("n"))
        .orderBy(Diff.StatusCol)
    }),

    // J2 — missing-row detection (autocorrect.missing feed)
    "diff_missing_anti" -> ((s, d) => {
      val ord = t(s, d, "orders")
      Diff.missing(ord, ordersTwin(ord), ordPk)
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J3 — mismatch detection (same PK, different content)
    "diff_mismatch" -> ((s, d) => {
      val ord = t(s, d, "orders")
      Diff.mismatched(ord, ordersTwin(ord), ordPk, ordCompare)
        .select(col("o_orderkey"),
          col("o_o_totalprice"), col("t_o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // J4 — sampled lookup validation (validate_migration.py:43-72);
    // broadcast the 500-row sample, stream the target (plan-tested)
    "validate_sample" -> ((s, d) => {
      val ord = t(s, d, "orders")
      Diff.validateSample(ord, ordersTwin(ord), ordPk, ordCompare, 500)
    }),

    // A3 — portable md5 row hash (06-validation-monitoring.md:95-98).
    // orders' unique PK makes the ORDER BY + LIMIT deterministic.
    "row_hash" -> ((s, d) => {
      val ord = t(s, d, "orders")
      ord.select(col("o_orderkey"),
          Hashing.portableRowHash(ord.schema, ord.columns.toSeq).as("row_md5"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    }),

    // J2/J3 writeback product — autocorrect (docs/04-cdm-approach.md:358-369):
    // the corrected target after re-inserting missing rows and resolving
    // mismatches by LWW; target-only rows kept (CDM never deletes, :367)
    "autocorrect_merge" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val o = ord.withColumn("writetime", usOf(col("o_orderdate")))
      val tw = ordersTwin(ord)
        .withColumn("writetime",
          usOf(col("o_orderdate")) +
            when(col("o_orderkey") % 89 === 0, lit(1L)).otherwise(lit(0L)))
      Diff.autocorrect(o, tw, ordPk, Seq("o_totalprice"), "writetime")
        .orderBy(col("o_orderkey"))
    }),

    // T3 — last-write-wins merge of origin+target versions; mutated target
    // rows carry a newer writetime and must win (docs/04-cdm-approach.md:837-841)
    "lww_merge" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val o = ord.withColumn("writetime", usOf(col("o_orderdate")))
        .withColumn("src", lit(0))
      val tw = ordersTwin(ord)
        .withColumn("writetime",
          usOf(col("o_orderdate")) +
            when(col("o_orderkey") % 89 === 0, lit(1L)).otherwise(lit(0L)))
        .withColumn("src", lit(1))
      Diff.lwwMerge(o.unionByName(tw), ordPk, "writetime", Seq("src"))
        .select(col("o_orderkey"), col("o_totalprice"),
          col("writetime"), col("src"))
        .orderBy(col("o_orderkey"))
    })
  )

  val oracle: Map[String, String] = Map(
    "count_star" ->
      s"""WITH twin AS ($twinSql)
          SELECT (SELECT count(*) FROM orders) AS origin_rows,
                 (SELECT count(*) FROM twin) AS target_rows,
                 (SELECT count(*) FROM orders) = (SELECT count(*) FROM twin) AS counts_match""",
    "diff_full_outer" ->
      s"""WITH twin AS ($twinSql)
          SELECT CASE WHEN o.o_orderkey IS NULL THEN 'extra_in_target'
                      WHEN t.o_orderkey IS NULL THEN 'missing'
                      WHEN $eqSql THEN 'valid'
                      ELSE 'mismatch' END AS diff_status,
                 count(*) AS n
          FROM orders o FULL OUTER JOIN twin t
            ON o.o_orderkey = t.o_orderkey
          GROUP BY 1 ORDER BY diff_status""",
    "diff_fast_hash" ->
      s"""WITH twin AS ($twinSql)
          SELECT CASE WHEN o.o_orderkey IS NULL THEN 'extra_in_target'
                      WHEN t.o_orderkey IS NULL THEN 'missing'
                      WHEN $eqSql THEN 'valid'
                      ELSE 'mismatch' END AS diff_status,
                 count(*) AS n
          FROM orders o FULL OUTER JOIN twin t
            ON o.o_orderkey = t.o_orderkey
          GROUP BY 1 ORDER BY diff_status""",
    "diff_missing_anti" ->
      s"""WITH twin AS ($twinSql)
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE NOT EXISTS (SELECT 1 FROM twin t
            WHERE t.o_orderkey = o.o_orderkey)
          ORDER BY o_orderkey""",
    "diff_mismatch" ->
      s"""WITH twin AS ($twinSql)
          SELECT o.o_orderkey,
                 o.o_totalprice AS o_o_totalprice, t.o_totalprice AS t_o_totalprice
          FROM orders o JOIN twin t
            ON o.o_orderkey = t.o_orderkey
          WHERE NOT ($eqSql)
          ORDER BY o.o_orderkey""",
    "validate_sample" ->
      s"""WITH twin AS ($twinSql),
          sample AS (SELECT * FROM orders ORDER BY o_orderkey LIMIT 500),
          j AS (SELECT o.*, t.o_orderkey AS hit,
                       CASE WHEN t.o_orderkey IS NOT NULL AND NOT ($eqSql) THEN 1 END AS bad
                FROM sample o LEFT JOIN twin t
                  ON o.o_orderkey = t.o_orderkey)
          SELECT count(*) AS sampled, count(hit) AS found,
                 count(*) - count(hit) AS missing, count(bad) AS mismatched
          FROM j""",
    "row_hash" -> {
      // Mirror Hashing.portableRowHash: columns sorted by name, each
      // length-prefixed canonical string, nulls as chr(1), md5 of the concat.
      val cols = Seq(
        "o_custkey" -> "str", "o_orderdate" -> "ts", "o_orderkey" -> "str",
        "o_orderpriority" -> "str", "o_orderstatus" -> "str",
        "o_totalprice" -> "dbl")
      val parts = cols.map { case (c, k) =>
        val canon = k match {
          case "dbl" => s"CASE WHEN isnan($c) THEN 'NaN' WHEN $c = 'infinity'::DOUBLE THEN 'Inf' WHEN $c = '-infinity'::DOUBLE THEN '-Inf' WHEN abs($c) >= 1e21 THEN printf('%.6e', $c) ELSE CAST(CAST($c AS DECIMAL(28,6)) AS VARCHAR) END"
          case "ts"  => s"CAST(epoch_us($c) AS VARCHAR)"
          case _     => s"CAST($c AS VARCHAR)"
        }
        s"coalesce(CAST(length($canon) AS VARCHAR) || ':' || $canon, chr(1))"
      }
      s"""SELECT o_orderkey,
          md5(${parts.mkString(" || ")}) AS row_md5
          FROM orders ORDER BY o_orderkey LIMIT 100"""
    },
    "autocorrect_merge" ->
      s"""WITH twin AS ($twinSql),
          versions AS (
            SELECT o_orderkey, o_totalprice,
                   epoch_us(o_orderdate) AS writetime, 0 AS src FROM orders
            UNION ALL
            SELECT o_orderkey, o_totalprice,
                   epoch_us(o_orderdate) + CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END AS writetime,
                   1 AS src FROM twin),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                         ORDER BY writetime DESC, src DESC) AS rn
            FROM versions)
          SELECT o_orderkey, o_totalprice, writetime
          FROM ranked WHERE rn = 1
          ORDER BY o_orderkey""",
    "lww_merge" ->
      s"""WITH twin AS ($twinSql),
          versions AS (
            SELECT o_orderkey, o_totalprice,
                   epoch_us(o_orderdate) AS writetime, 0 AS src FROM orders
            UNION ALL
            SELECT o_orderkey, o_totalprice,
                   epoch_us(o_orderdate) + CASE WHEN o_orderkey % 89 = 0 THEN 1 ELSE 0 END AS writetime,
                   1 AS src FROM twin),
          ranked AS (
            SELECT *, row_number() OVER (PARTITION BY o_orderkey
                                         ORDER BY writetime DESC, src DESC) AS rn
            FROM versions)
          SELECT o_orderkey, o_totalprice, writetime, src
          FROM ranked WHERE rn = 1
          ORDER BY o_orderkey"""
  )
}
