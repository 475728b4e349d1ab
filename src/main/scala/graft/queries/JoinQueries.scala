package graft.queries

import org.apache.spark.sql.functions._

/** Join + generator queries — SURVEY §2.3 J5–J7, §2.1 S10, §2.4 A4.
  *
  * Scale posture: dimension sides (customer at SF×1500 rows) are broadcast —
  * the fact table never shuffles for J5/J6. The as-of join (J7) shuffles
  * both sides once on the equi-key (user_id) and resolves the temporal
  * predicate inside each key group — never a cartesian/range explosion.
  */
object JoinQueries {
  import Common._

  val qs: Map[String, Q] = Map(
    // J5 — FK equi-join orders⋈customer (generate_data.py:113 samples
    // user_id from users; index 01-create-schema.cql:58). Dim side broadcast.
    "join_fk_orders_users" -> ((s, d) =>
      t(s, d, "orders")
        .join(broadcast(t(s, d, "customer")),
          col("o_custkey") === col("c_custkey"), "inner")
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // J5 under skew: the SAME join through Ops.saltedJoin — salting is
    // result-preserving (every fact row meets its dim row under exactly one
    // salt), so this row shares join_fk_orders_users' oracle: the green row
    // PROVES the skew path returns bit-identical results, not just "rows"
    "join_fk_salted" -> ((s, d) =>
      graft.core.Ops.saltedJoin(
          t(s, d, "orders"),
          t(s, d, "customer").withColumnRenamed("c_custkey", "o_custkey"),
          "o_custkey", salts = 8)
        .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
          col("c_mktsegment"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))),

    // J6 — semi-join existence check ("verify record exists on both sides",
    // 05-zdm-migration.md:115-127): customers that produced ≥1 event
    "join_semi_exists" -> ((s, d) =>
      t(s, d, "customer")
        .join(events(s, d).select(col("user_id")),
          col("c_custkey") === col("user_id"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))),

    // J7 (extension) — as-of join: for each purchase event, the latest
    // preceding click of the same user. Equi-join on user_id + temporal
    // filter + max per left row — the compose-existing-ops form of an
    // as-of join (no built-in ASOF in Spark).
    "join_asof_events" -> ((s, d) => {
      val e = events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts_us").as("p_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id").as("c_user"), col("ts_us").as("c_ts"))
      purchases
        .join(clicks, col("p_user") === col("c_user") && col("c_ts") <= col("p_ts"), "inner")
        .groupBy(col("p_id"), col("p_user"), col("p_ts"))
        .agg(max(col("c_ts")).as("last_click_ts"))
        .orderBy(col("p_id"))
    }),

    // J7b (extension) — interval join via time-bucketing: for each purchase,
    // count same-user events in the hour after it. A naive range join plans
    // as a nested loop (quadratic per user at scale); bucketing the window
    // start into hour cells and exploding each probe into the ≤2 cells its
    // window can span turns it into a plain equi-join on (user, bucket) —
    // one shuffle, linear in matches. The range predicate rides inside the
    // join condition so left-outer semantics keep 0-match purchases.
    "join_range_bucketed" -> ((s, d) => {
      val hourUs = 3600000000L
      val e = events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
          col("ts_us").as("p_ts"))
        .withColumn("p_bucket", explode(array(
          expr("p_ts div 3600000000"), expr("p_ts div 3600000000 + 1"))))
      val follows = e.select(col("event_id").as("e_id"),
          col("user_id").as("e_user"), col("ts_us").as("e_ts"))
        .withColumn("e_bucket", expr("e_ts div 3600000000"))
      purchases.join(follows,
          col("p_user") === col("e_user") && col("p_bucket") === col("e_bucket") &&
            col("e_ts") >= col("p_ts") && col("e_ts") <= col("p_ts") + hourUs &&
            col("e_id") =!= col("p_id"), "left_outer")
        .groupBy(col("p_id"))
        .agg(count(col("e_id")).as("n_following"))
        .orderBy(col("p_id"))
    }),

    // S10 — seeded synthetic generator (generate_data.py:29-158): names from
    // pools, bounded randoms, derived email — all functions of the row id,
    // so no RNG at query time and the oracle reproduces every value.
    "gen_users" -> ((s, d) => {
      val first = array(Seq("john", "jane", "bob", "alice", "carol").map(lit): _*)
      val last = array(Seq("smith", "jones", "lee", "garcia").map(lit): _*)
      val domain = array(Seq("example.com", "test.org", "mail.net").map(lit): _*)
      s.range(1000).toDF("id").select(
        col("id").as("user_id"),
        element_at(first, (col("id") % 5 + 1).cast("int")).as("first_name"),
        element_at(last, (col("id") % 4 + 1).cast("int")).as("last_name"),
        concat(element_at(first, (col("id") % 5 + 1).cast("int")), lit("."),
          element_at(last, (col("id") % 4 + 1).cast("int")),
          col("id").cast("string")).as("username"),
        concat(element_at(first, (col("id") % 5 + 1).cast("int")), lit("."),
          element_at(last, (col("id") % 4 + 1).cast("int")), col("id").cast("string"),
          lit("@"), element_at(domain, (col("id") % 3 + 1).cast("int"))).as("email"),
        (col("id") % 62 + 18).as("age"),
        when(col("id") % 10 < 8, "active").otherwise("inactive").as("status"),
        element_at(
          map(lit("theme"), when(col("id") % 2 === 0, "dark").otherwise("light"),
              lit("notifications"), when(col("id") % 3 === 0, "on").otherwise("off")),
          "theme").as("theme"))
        .orderBy(col("user_id"))
    }),

    // A4 — per-row max writetime: CDM collapses per-cell writetimes to the
    // row max (docs/04-cdm-approach.md:826-831). Cell writetimes synthesized
    // deterministically per column.
    "writetime_rowmax" -> ((s, d) =>
      t(s, d, "orders").select(
          col("o_orderkey"),
          greatest(
            usOf(col("o_orderdate")),
            usOf(col("o_orderdate")) + col("o_orderkey") % 7,
            usOf(col("o_orderdate")) + col("o_orderkey") % 11).as("row_writetime"))
        .orderBy(col("o_orderkey")))
  )

  val oracle: Map[String, String] = Map(
    "join_fk_orders_users" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    // bit-identical to the unsalted join by construction
    "join_fk_salted" ->
      """SELECT o_orderkey, o_custkey, c_name, c_mktsegment, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_orderkey""",
    "join_semi_exists" ->
      """SELECT c_custkey, c_name FROM customer c
         WHERE EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
         ORDER BY c_custkey""",
    "join_asof_events" ->
      """SELECT p.event_id AS p_id, p.user_id AS p_user, epoch_us(p.ts) AS p_ts,
                max(epoch_us(c.ts)) AS last_click_ts
         FROM events p JOIN events c
           ON c.user_id = p.user_id AND epoch_us(c.ts) <= epoch_us(p.ts)
          AND c.event_type = 'click'
         WHERE p.event_type = 'purchase'
         GROUP BY 1, 2, 3 ORDER BY p_id""",
    "join_range_bucketed" ->
      """SELECT p.event_id AS p_id, count(e.event_id) AS n_following
         FROM events p LEFT JOIN events e
           ON e.user_id = p.user_id AND e.event_id <> p.event_id
          AND epoch_us(e.ts) >= epoch_us(p.ts)
          AND epoch_us(e.ts) <= epoch_us(p.ts) + 3600000000
         WHERE p.event_type = 'purchase'
         GROUP BY 1 ORDER BY p_id""",
    "gen_users" ->
      """SELECT id AS user_id,
                (['john','jane','bob','alice','carol'])[(id % 5 + 1)::INT] AS first_name,
                (['smith','jones','lee','garcia'])[(id % 4 + 1)::INT] AS last_name,
                (['john','jane','bob','alice','carol'])[(id % 5 + 1)::INT] || '.' ||
                  (['smith','jones','lee','garcia'])[(id % 4 + 1)::INT] || CAST(id AS VARCHAR) AS username,
                (['john','jane','bob','alice','carol'])[(id % 5 + 1)::INT] || '.' ||
                  (['smith','jones','lee','garcia'])[(id % 4 + 1)::INT] || CAST(id AS VARCHAR) ||
                  '@' || (['example.com','test.org','mail.net'])[(id % 3 + 1)::INT] AS email,
                id % 62 + 18 AS age,
                CASE WHEN id % 10 < 8 THEN 'active' ELSE 'inactive' END AS status,
                CASE WHEN id % 2 = 0 THEN 'dark' ELSE 'light' END AS theme
         FROM range(1000) t(id) ORDER BY user_id""",
    "writetime_rowmax" ->
      """SELECT o_orderkey,
                greatest(epoch_us(o_orderdate),
                         epoch_us(o_orderdate) + o_orderkey % 7,
                         epoch_us(o_orderdate) + o_orderkey % 11) AS row_writetime
         FROM orders ORDER BY o_orderkey"""
  )
}
