package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.migrate.MigrateJob
import graft.queries.{Common, DiffQueries, JoinQueries}

/** Plan-shape assertions — the 100 TB contract (SURVEY §4, §7.4):
  * the migrate path is shuffle-free, small sides broadcast, filters and
  * projections reach the parquet scan.
  */
class PlanSpec extends SparkSpec {

  private def physical(df: DataFrame): String =
    df.queryExecution.executedPlan.toString

  private def hasShuffle(df: DataFrame): Boolean =
    physical(df).contains("Exchange")

  test("migrate transform pipeline has zero exchanges (narrow end-to-end)") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val cfg = MigrateJob.Config(
      pkCols = Seq("o_orderkey"),
      columnsToExclude = Seq("o_orderpriority"),
      bucketRange = Some((0, 3)),
      tokenBuckets = 8)
    val out = MigrateJob.transformOnly(orders, cfg)
    assert(!hasShuffle(out), s"migrate plan must not shuffle:\n${physical(out)}")
  }

  test("pre-bucketed tables diff without ANY exchange (SURVEY §7.4 risk 5)") {
    // the 100 TB claim made concrete: when both sides are bucketed+sorted
    // on the PK (Spark bucketing ≈ Cassandra's co-located token ranges),
    // the reconciliation SMJ needs no shuffle at all — the one wide op of
    // the whole surface disappears
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS g_diff_origin")
    spark.sql("DROP TABLE IF EXISTS g_diff_target")
    try {
      orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_diff_origin")
      Common.ordersTwin(orders).write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("g_diff_target")
      val joined = graft.validate.Diff.classify(
        spark.table("g_diff_origin"), spark.table("g_diff_target"),
        Seq("o_orderkey"), Common.ordCompare)
      val plan = physical(joined)
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed diff must not shuffle either side:\n$plan")
      // and it still computes the right thing
      val counts = joined.groupBy(graft.validate.Diff.StatusCol).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(counts.contains("missing") && counts.contains("mismatch") &&
        counts.contains("extra_in_target") && counts("valid") > 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS g_diff_origin")
      spark.sql("DROP TABLE IF EXISTS g_diff_target")
    }
  }

  test("validate_sample broadcasts the sample, not the target") {
    val plan = physical(DiffQueries.qs("validate_sample")(spark, sf()))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in:\n$plan")
  }

  test("FK dim join is a broadcast hash join") {
    val plan = physical(JoinQueries.qs("join_fk_orders_users")(spark, sf()))
    assert(plan.contains("BroadcastHashJoin"), s"expected BHJ in:\n$plan")
  }

  test("equality filter is pushed down to the parquet scan") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .filter(col("l_returnflag") === "R")
    val plan = physical(df)
    assert(plan.contains("PushedFilters: [IsNotNull(l_returnflag), EqualTo(l_returnflag,R)]"),
      s"filter not pushed:\n$plan")
  }

  test("projection prunes the parquet read schema") {
    val df = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .select(col("l_orderkey"), col("l_quantity"))
    val plan = physical(df)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$plan")
  }

  test("topk_orders plans as TakeOrderedAndProject (no global sort)") {
    val df = spark.read.parquet(s"${sf()}/orders.parquet")
      .orderBy(col("o_totalprice").desc).limit(10)
    assert(physical(df).contains("TakeOrderedAndProject"))
  }

  test("topk_per_group plans as the graft_topk heap aggregate — no Window, " +
       "no per-group sort of the full input") {
    val plan = physical(
      graft.SparkEntry.queries("topk_per_group")(spark, sf()))
    assert(plan.contains("graft_topk"), plan)
    assert(!plan.contains("Window"),
      s"grouped top-k must not fall back to the window sort:\n$plan")
  }

  test("pkGroupedLayout = one hash exchange + partition-local sort, no global sort") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val out = graft.core.Ops.pkGroupedLayout(orders, Seq("o_orderkey"), 4)
    val plan = physical(out)
    assert(plan.contains("hashpartitioning(o_orderkey"), s"expected hash partitioning:\n$plan")
    assert(plan.contains("Sort [o_orderkey") && plan.contains("], false"),
      s"expected partition-local sort:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort must not appear:\n$plan")
  }

  test("split sizing: maxPartitionBytes drives scan parallelism (CDM numParts analog)") {
    val path = s"${sf("sf0.1")}/lineitem.parquet"
    val f = new java.io.File(path)
    val bytes =
      if (f.isDirectory)
        f.listFiles().filter(_.getName.endsWith(".parquet")).map(_.length()).sum
      else f.length()
    val coarse = spark.read.option("mergeSchema", "false").parquet(path).rdd.getNumPartitions
    spark.conf.set("spark.sql.files.maxPartitionBytes", (1024 * 1024).toString)
    try {
      val fine = spark.read.parquet(path).rdd.getNumPartitions
      assert(fine > coarse, s"1MB splits ($fine) should out-parallelize default ($coarse)")
      assert(fine >= bytes / (1024 * 1024), s"expected ≥${bytes / 1024 / 1024} splits, got $fine")
    } finally spark.conf.unset("spark.sql.files.maxPartitionBytes")
  }

  test("partitioned layout: the lang filter prunes to PartitionFilters, not data filters") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val path = "target/planspec_partitioned"
    docs.write.mode("overwrite").partitionBy("lang").parquet(path)
    val pruned = spark.read.parquet(path).filter(col("lang") === "en")
    val formatted = pruned.queryExecution
      .explainString(org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(formatted.contains("PartitionFilters"), formatted)
    // the filter must live in PartitionFilters (directory pruning), NOT
    // reappear as a post-scan Filter over the data
    val filterLine = formatted.linesIterator
      .find(_.trim.startsWith("PartitionFilters")).getOrElse("")
    assert(filterLine.contains("lang"), s"lang must be a partition filter:\n$formatted")
    assert(!formatted.contains("PushedFilters: [IsNotNull(lang)"),
      s"lang must not be a data-level pushed filter:\n$formatted")
  }

  test("diff report shuffles at most once per side (single wide op)") {
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    val rep = graft.validate.Diff.classify(orders, Common.ordersTwin(orders),
      Common.ordPk, Common.ordCompare)
    val exchanges = "Exchange".r.findAllIn(physical(rep)).length
    assert(exchanges <= 3, s"too many exchanges ($exchanges):\n${physical(rep)}")
  }

  test("FailOnDup gate rides the join's shuffle: same exchange count as " +
       "AssumeUnique, no extra scan pass") {
    // the r9 form paid one count+approx_count_distinct aggregate per side
    // BEFORE the join (two extra corpus scans at 100 TB); the in-join gate
    // is a count window planned into the exchange+sort the SMJ needs anyway
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    def plan(p: graft.validate.Diff.DupPkPolicy) = physical(
      graft.validate.Diff.classifyByHash(orders, Common.ordersTwin(orders),
        Common.ordPk, Common.ordCompare, onDup = p))
    val gatedEx = "Exchange".r.findAllIn(plan(graft.validate.Diff.FailOnDup)).length
    val bareEx = "Exchange".r.findAllIn(plan(graft.validate.Diff.AssumeUnique)).length
    assert(gatedEx == bareEx,
      s"gate must not add exchanges: gated=$gatedEx bare=$bareEx")
    val gated = plan(graft.validate.Diff.FailOnDup)
    assert(gated.contains("Window"), s"expected the in-join count window:\n$gated")
  }
}
