package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Scalar-function queries — SURVEY §2.8 F1–F9. Each mirrors a concrete use
  * in the reference: the synthetic generator's string/decimal/map/list
  * building (lab/scripts/generate_data.py:44-53,84,116-117), CQL date
  * arithmetic (lab/exercises/04-cdm-migration.md:338), regex/grep checks
  * (lab/exercises/05-zdm-migration.md:140-148) and CASE classification
  * (lab/scripts/simulate_app_traffic.py:80-97).
  *
  * All queries are deterministic (no uuid()/now() at query time — SURVEY
  * §7.4 risk 4): "uuid" values derive from md5 of the seeded key, matching
  * the generator's seeded-reproducibility posture.
  */
object FnQueries {
  import Common._

  val qs: Map[String, Q] = Map(
    // F1 — concat/lower/format_string (generate_data.py:44-45 username/email)
    "fn_string" -> ((s, d) =>
      t(s, d, "customer").select(
          col("c_custkey"),
          lower(col("c_name")).as("username"),
          concat(lower(col("c_name")), lit("@example.com")).as("email"),
          format_string("cust-%08d", col("c_custkey")).as("padded"))
        .orderBy(col("c_custkey"))),

    // F2 — uuid generation, deterministic variant: uuid4-shaped string from
    // md5 of the seeded key (generate_data.py:41 uses uuid4; we derive from
    // the key so the oracle can reproduce it)
    "fn_uuid" -> ((s, d) =>
      t(s, d, "customer").select(
          col("c_custkey"),
          expr("""concat(substr(md5(concat('cust:', cast(c_custkey as string))), 1, 8), '-',
                         substr(md5(concat('cust:', cast(c_custkey as string))), 9, 4), '-',
                         substr(md5(concat('cust:', cast(c_custkey as string))), 13, 4), '-',
                         substr(md5(concat('cust:', cast(c_custkey as string))), 17, 4), '-',
                         substr(md5(concat('cust:', cast(c_custkey as string))), 21, 12))""").as("uuid"))
        .orderBy(col("c_custkey"))),

    // F3 — timestamp/interval arithmetic (toTimestamp(now()) - INTERVAL,
    // datetime.now() - timedelta; 04-cdm-migration.md:338, generate_data.py:46-47)
    "fn_date_arith" -> ((s, d) =>
      t(s, d, "orders").select(
          col("o_orderkey"),
          usOf(col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("plus30_us"),
          datediff(lit("2001-12-31").cast("date"), col("o_orderdate").cast("date")).as("days_to_eoy"),
          usOf(date_trunc("month", col("o_orderdate"))).as("month_us"))
        .orderBy(col("o_orderkey"))),

    // F4 — decimal round/cast (Decimal(str(round(uniform,2))), generate_data.py:84)
    "fn_decimal" -> ((s, d) =>
      t(s, d, "orders").select(
          col("o_orderkey"),
          round(col("o_totalprice").cast(DecimalType(18, 2)), 1).cast("double").as("price_r1"),
          floor(col("o_totalprice")).cast("long").as("price_floor"),
          ceil(col("o_totalprice")).cast("long").as("price_ceil"))
        .orderBy(col("o_orderkey"))),

    // F5 — map construction/access (users.preferences, generate_data.py:49-53)
    "fn_map" -> ((s, d) =>
      t(s, d, "customer").select(
          col("c_custkey"),
          element_at(
            map(lit("segment"), col("c_mktsegment"), lit("name"), col("c_name")),
            "segment").as("seg"),
          size(map_keys(
            map(lit("segment"), col("c_mktsegment"), lit("name"), col("c_name")))).as("n_keys"))
        .orderBy(col("c_custkey"))),

    // F6 — array construction + explode (orders.items list, generate_data.py:116)
    "fn_array" -> ((s, d) =>
      t(s, d, "orders")
        .select(col("o_orderkey"),
          sequence(lit(1L), col("o_orderkey") % 3 + 1).as("items"))
        .select(col("o_orderkey"), size(col("items")).as("n_items"),
          explode(col("items")).as("item"))
        .orderBy(col("o_orderkey"), col("item"))),

    // F7 — JSON encode/decode (S4 export; props JSON in events testdata)
    // spreadSmall (r16): the per-row JSON parse+encode is the regex-class
    // kernel cost the r15 spread exists for — on a one-row-group input it
    // otherwise evaluates below the sort exchange at scan parallelism 1
    "fn_json" -> ((s, d) =>
      graft.ext.LlmOps.spreadSmall(events(s, d)).select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"),
          to_json(struct(col("event_id"), col("event_type"))).as("js"))
        .orderBy(col("event_id"))),

    // F8 — regex/LIKE match (grep zdm_bulk / LIKE 'zdm_%', 05-zdm-migration.md:140-148,665)
    "fn_regex" -> ((s, d) =>
      t(s, d, "customer").select(
          col("c_custkey"),
          col("c_name").rlike("#0{4}").as("has_4zeros"),
          regexp_extract(col("c_name"), "([0-9]+)$", 1).as("id_digits"),
          col("c_name").like("Customer#%").as("is_customer"))
        .orderBy(col("c_custkey"))),

    // F9 — CASE classification (status branches, simulate_app_traffic.py:80-97)
    "fn_case" -> ((s, d) =>
      t(s, d, "orders")
        .withColumn("tier",
          when(col("o_totalprice") > 150000, "high")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("low"))
        .groupBy(col("tier")).agg(count(lit(1)).as("n"))
        .orderBy(col("tier")))
  )

  val oracle: Map[String, String] = Map(
    "fn_string" ->
      """SELECT c_custkey, lower(c_name) AS username,
                lower(c_name) || '@example.com' AS email,
                printf('cust-%08d', c_custkey) AS padded
         FROM customer ORDER BY c_custkey""",
    "fn_uuid" ->
      """SELECT c_custkey,
                substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 1, 8) || '-' ||
                substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 9, 4) || '-' ||
                substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 13, 4) || '-' ||
                substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 17, 4) || '-' ||
                substr(md5('cust:' || CAST(c_custkey AS VARCHAR)), 21, 12) AS uuid
         FROM customer ORDER BY c_custkey""",
    "fn_date_arith" ->
      """SELECT o_orderkey,
                epoch_us(o_orderdate + INTERVAL 30 DAY) AS plus30_us,
                datediff('day', o_orderdate::DATE, DATE '2001-12-31') AS days_to_eoy,
                epoch_us(date_trunc('month', o_orderdate)) AS month_us
         FROM orders ORDER BY o_orderkey""",
    "fn_decimal" ->
      """SELECT o_orderkey,
                CAST(round(CAST(o_totalprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r1,
                CAST(floor(o_totalprice) AS BIGINT) AS price_floor,
                CAST(ceil(o_totalprice) AS BIGINT) AS price_ceil
         FROM orders ORDER BY o_orderkey""",
    "fn_map" ->
      """SELECT c_custkey, c_mktsegment AS seg, 2 AS n_keys
         FROM customer ORDER BY c_custkey""",
    "fn_array" ->
      """SELECT o_orderkey, (o_orderkey % 3 + 1) AS n_items, item
         FROM orders, unnest(generate_series(1, o_orderkey % 3 + 1)) AS u(item)
         ORDER BY o_orderkey, item""",
    "fn_json" ->
      """SELECT event_id,
                CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                to_json(struct_pack(event_id := event_id, event_type := event_type)) AS js
         FROM events ORDER BY event_id""",
    "fn_regex" ->
      """SELECT c_custkey,
                regexp_matches(c_name, '#0{4}') AS has_4zeros,
                regexp_extract(c_name, '([0-9]+)$', 1) AS id_digits,
                c_name LIKE 'Customer#%' AS is_customer
         FROM customer ORDER BY c_custkey""",
    "fn_case" ->
      """SELECT CASE WHEN o_totalprice > 150000 THEN 'high'
                     WHEN o_totalprice > 50000 THEN 'mid'
                     ELSE 'low' END AS tier,
                count(*) AS n
         FROM orders GROUP BY 1 ORDER BY tier"""
  )
}
