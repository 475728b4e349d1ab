package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Ops

/** Scan / projection / filter / sort / limit / set-op queries —
  * SURVEY §2.1 S1, §2.2 P1–P6, §2.6 O2–O4, §2.7 U1–U3.
  */
object CoreQueries {
  import Common._

  val qs: Map[String, Q] = Map(
    // S1 — full-table scan (CDM Migrate read side, docs/04-cdm-approach.md:280-285)
    "scan_full" -> ((s, d) =>
      t(s, d, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P1 — column-subset projection (column.names.to.target)
    "project_subset" -> ((s, d) =>
      Ops.project(t(s, d, "lineitem"),
          Seq("l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P2 — column exclusion (column.names.to.exclude)
    "project_exclude" -> ((s, d) =>
      Ops.exclude(t(s, d, "lineitem"), Seq("l_tax", "l_discount", "l_partkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P3 — equality filter (ALLOW FILTERING analog); pushed to parquet scan
    "filter_eq" -> ((s, d) =>
      t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P4 — token-range slice. Oracle-checkable variant buckets the numeric
    // PK directly; the hash-based Ops.tokenRange (string-safe) is unit-tested.
    "filter_token_range" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(pmod(col("l_orderkey"), lit(32)).between(8, 15))
        .orderBy(col("l_orderkey"), col("l_linenumber"))),

    // P5 — incremental (writetime >= min) re-migration on events
    "filter_incremental" -> ((s, d) =>
      Ops.incremental(
          t(s, d, "events").withColumn("writetime", unix_micros(col("ts"))),
          "writetime", 1705276800000000L) // 2024-01-15T00:00:00Z in micros
        .select(col("event_id"), col("writetime"), col("event_type"))
        .orderBy(col("event_id"))),

    // P6/O3 — LIMIT sampling (validate_migration.py:43)
    "limit_sample" -> ((s, d) =>
      t(s, d, "lineitem").orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100)),

    // P7 — guardrail size filter (docs/04-cdm-approach.md:380-387)
    "guardrail_check" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), octet_length(col("text")).as("row_bytes"),
          (octet_length(col("text")) > 400).as("oversize"))
        .orderBy(col("doc_id"))),

    // O2 — global sort (range-partitioned exchange + per-partition sort)
    "sort_global" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(1000)),

    // O4 — top-k (TakeOrderedAndProject, no full sort)
    "topk_orders" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)),

    // U1 — EXCEPT: origin rows whose (pk, quantity) got lost or mutated
    "set_except_schema" -> ((s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      val tw = lineitemTwin(t(s, d, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      li.except(tw).orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // U2 — UNION (distinct) of name domains
    "set_union" -> ((s, d) =>
      t(s, d, "nation").select(col("n_name").as("name"))
        .union(t(s, d, "region").select(col("r_name").as("name")))
        .distinct()
        .orderBy(col("name"))),

    // U3 — INTERSECT of nation keys present on both sides
    "set_intersect" -> ((s, d) =>
      t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
        .intersect(t(s, d, "supplier").select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")))
  )

  val oracle: Map[String, String] = Map(
    "scan_full" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "project_subset" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "project_exclude" ->
      "SELECT l_orderkey, l_suppkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag, l_linestatus, l_shipdate FROM lineitem ORDER BY l_orderkey, l_linenumber",
    "filter_eq" ->
      "SELECT * FROM lineitem WHERE l_returnflag = 'R' ORDER BY l_orderkey, l_linenumber",
    "filter_token_range" ->
      "SELECT * FROM lineitem WHERE l_orderkey % 32 BETWEEN 8 AND 15 ORDER BY l_orderkey, l_linenumber",
    "filter_incremental" ->
      "SELECT event_id, epoch_us(ts) AS writetime, event_type FROM events WHERE epoch_us(ts) >= 1705276800000000 ORDER BY event_id",
    "limit_sample" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "guardrail_check" ->
      "SELECT doc_id, octet_length(text) AS row_bytes, octet_length(text) > 400 AS oversize FROM documents ORDER BY doc_id",
    "sort_global" ->
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 1000",
    "topk_orders" ->
      "SELECT o_orderkey, o_custkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10",
    "set_except_schema" ->
      s"""WITH twin AS ($twinSql)
          SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
          EXCEPT
          SELECT l_orderkey, l_linenumber, l_quantity FROM twin
          ORDER BY l_orderkey, l_linenumber""",
    "set_union" ->
      "SELECT n_name AS name FROM nation UNION SELECT r_name FROM region ORDER BY name",
    "set_intersect" ->
      "SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey AS nationkey FROM supplier ORDER BY nationkey"
  )
}
