package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

class OpsSpec extends SparkSpec {
  private lazy val customer = spark.read.parquet(s"${sf()}/customer.parquet")

  test("tokenRange buckets partition the table (disjoint + complete), string-safe") {
    // force a STRING pk — the r1 advice case: raw pmod on a string silently
    // drops all rows; the hash-based form must not
    val df = customer.withColumn("pk", concat(lit("c-"), col("c_custkey")))
    val total = df.count()
    val buckets = 8
    val counts = (0 until buckets).map { b =>
      Ops.tokenRange(df, Seq("pk"), buckets, b, b).count()
    }
    assert(counts.sum == total)
    assert(counts.count(_ > 0) > 1, "hashing should spread keys across buckets")
  }

  test("tokenRange range slice equals union of its single buckets") {
    val df = customer.withColumn("pk", col("c_custkey").cast("string"))
    val slice = Ops.tokenRange(df, Seq("pk"), 8, 2, 5).count()
    val singles = (2 to 5).map(b => Ops.tokenRange(df, Seq("pk"), 8, b, b).count()).sum
    assert(slice == singles)
  }

  test("project and exclude are complementary") {
    val cols = Seq("c_custkey", "c_name")
    val p = Ops.project(customer, cols)
    val e = Ops.exclude(customer, customer.columns.toSeq.diff(cols))
    assert(p.columns.toSet == cols.toSet)
    assert(e.columns.toSet == cols.toSet)
    assert(p.exceptAll(e.select(cols.map(col): _*)).isEmpty)
  }

  test("guardrailFlag flags exactly rows over the byte budget") {
    val flagged = Ops.guardrailFlag(customer, 120)
    val manual = customer
      .withColumn("sz", octet_length(to_json(struct(customer.columns.map(col): _*))))
    val over = manual.filter(col("sz") > 120).count()
    assert(flagged.filter(col("guardrail_oversize")).count() == over)
    assert(flagged.count() == customer.count())
  }

  test("rowMax takes the per-row maximum across writetime columns") {
    val df = customer.select(col("c_custkey"),
      (col("c_custkey") * 2).as("wt1"), (col("c_custkey") + 10).as("wt2"))
    val out = Ops.rowMax(Seq(col("wt1"), col("wt2")), "wt")(df)
    assert(out.filter(col("wt") =!= greatest(col("wt1"), col("wt2"))).count() == 0)
  }

  test("writetimeIncrement shifts by the configured amount") {
    val df = customer.select(col("c_custkey"), col("c_custkey").as("wt"))
    val out = Ops.writetimeIncrement(df, "wt", 7L)
    assert(out.filter(col("wt") =!= col("c_custkey") + 7L).count() == 0)
  }

  test("saltedJoin produces the same rows as a plain join on skewed keys") {
    import spark.implicits._
    // 90% of fact rows share one hot key
    val fact = spark.range(1000).toDF("id")
      .withColumn("k", when(col("id") % 10 === 0, col("id") % 3).otherwise(lit(99L)))
    val dim = Seq((99L, "hot"), (0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "v")
    val plain = fact.join(dim, "k").select("id", "k", "v")
    val salted = Ops.saltedJoin(fact, dim, "k", 8).select("id", "k", "v")
    assert(plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty)
  }

  test("profileTable counts nulls, distincts and ranges per column") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)]((1L, "a"), (2L, "b"), (2L, null),
      (null, "a"), (5L, "c")).toDF("k", "s")
    val rows = Ops.profileTable(df, Seq("k", "s")).collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("k", "s")) // ordered by name
    val k = rows(0); val s = rows(1)
    assert(k.getLong(1) == 5 && k.getLong(2) == 4 && k.getLong(3) == 3)
    assert(k.getString(4) == "1" && k.getString(5) == "5")
    assert(s.getLong(2) == 4 && s.getLong(3) == 3 &&
      s.getString(4) == "a" && s.getString(5) == "c")
  }

  test("distinct_users_sketch: daily-sketch union is lossless and tracks exact") {
    // registry-visible envelope: (n_days, exact_users, sketch_ok)
    val res = graft.SparkEntry.queries("distinct_users_sketch")(spark, sf())
      .select("n_days", "exact_users", "sketch_ok").collect().head
    val exact = graft.queries.Common.events(spark, sf())
      .agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    assert(res.getLong(0) >= 1, "at least one daily sketch")
    assert(res.getLong(1) == exact, "exact_users column must be the exact count")
    assert(res.getBoolean(2), "sketch estimate must track exact within 5%")
    // the serving contract on the RAW estimate: merging per-day sketches
    // must equal the single-pass whole-corpus sketch — HLL union is
    // lossless at fixed lgK
    val ev = graft.queries.Common.events(spark, sf())
    val union = ev.groupBy(to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))"))
      .collect().head.getLong(0)
    val direct = ev
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(user_id, 14))"))
      .collect().head.getLong(0)
    assert(union == direct, s"daily union $union != single-pass $direct")
    assert(math.abs(union - exact).toDouble / exact < 0.05,
      s"sketch estimate $union must track exact $exact within 5%")
  }

  test("approximate sketch swap-ins track exact results (A8/A7 scale path)") {
    val events = graft.queries.Common.events(spark, sf())
    val exact = events.agg(countDistinct(col("user_id"))).collect().head.getLong(0)
    val approx = events.agg(approx_count_distinct(col("user_id"))).collect().head.getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05,
      s"approx_count_distinct off by >5%: $approx vs $exact")
    val p = events.agg(
      expr("percentile(value, 0.95)").as("exact"),
      expr("percentile_approx(value, 0.95, 10000)").as("approx")).collect().head
    assert(math.abs(p.getDouble(0) - p.getDouble(1)) / math.abs(p.getDouble(0)) < 0.05)
  }
}
