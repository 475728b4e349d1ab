package graft.validate

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.SparkPlan
import graft.SparkSpec

/** Skew posture of the diff family under AQE — the reference names >100 MB
  * partitions as THE migration bottleneck (docs/04-cdm-approach.md:455-456).
  * The diff operators deliberately stay plain shuffled joins so AQE's
  * skew-join handling can split oversized partitions at runtime; this spec
  * proves that actually happens: a hot-PK diff produces a final adaptive
  * plan whose sort-merge join is marked `isSkewJoin`.
  *
  * (classify/classifyByHash are FULL OUTER — AQE cannot split either side
  * of a full-outer SMJ, which is why diffs against unique-PK tables never
  * skew in the first place: unique keys hash-balance. The skew-exposed
  * member of the family is [[Diff.missing]]'s left-anti join, where a
  * replayed/duplicated hot PK on the origin side lands in one partition —
  * exactly the shape AQE's left-side split handles.)
  */
class SkewSpec extends SparkSpec {

  private def finalPlan(plan: SparkPlan): SparkPlan = plan match {
    case a: AdaptiveSparkPlanExec => a.executedPlan
    case other => other
  }

  test("hot-PK diff_missing triggers AQE skew-join split (left-anti SMJ)") {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      // scale the (default 256 MB / factor 5) skew thresholds down so a
      // test-sized hot partition trips them — same mechanism, smaller data
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      // AQE would otherwise re-plan the small target side to broadcast at
      // runtime (its own threshold, separate from the static one)
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // origin: 200k rows, half of them the SAME hot pk (a replayed key),
      // each ~130 bytes — the hot pk's partition is ~13 MB vs ~2 KB others
      val origin = spark.range(200000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("pk"),
        concat(lit("v"), lpad(col("id").cast("string"), 120, "x")).as("payload"))
      val target = spark.range(50000).select(col("id").as("pk"))

      val missing = Diff.missing(origin, target, Seq("pk"))
      // execute THIS frame (count() would spawn its own QueryExecution and
      // leave missing's adaptive plan unexecuted)
      val n = missing.collect().length.toLong
      // correctness first: odd ids >= 50000 are missing, plus nothing else
      // (pk 0 and odd ids < 50000 exist in target)
      assert(n == origin.filter(col("pk") % 2 =!= 0 && col("pk") >= 50000).count())

      // the final plan nests under ResultQueryStage, whose wrapped plan is
      // not a `children` edge — assert on the rendered tree instead of a
      // typed collect
      val plan = finalPlan(missing.queryExecution.executedPlan).toString
      assert(plan.contains("SortMergeJoin"), s"expected an SMJ, got:\n$plan")
      assert(plan.contains("skew=true"),
        s"AQE should mark the hot-PK join skew=true; got:\n$plan")
      assert(plan.contains("skewed"),
        s"the origin side's AQEShuffleRead should show the skewed split; got:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot-PK full-outer diff: AQE cannot split a full-outer SMJ — the PK-uniqueness contract is the mitigation") {
    // The full-outer members (classify/classifyByHash) CANNOT lean on AQE:
    // OptimizeSkewedJoin never splits either side of a full-outer SMJ (a
    // split side would need its partner replicated, which full-outer
    // semantics forbid). This pins that boundary executably: same scaled
    // thresholds as the left-anti test, a hot origin PK, and the final
    // adaptive plan must show a full-outer SMJ with NO skew=true handling —
    // while the result stays correct. The 100 TB posture therefore rests on
    // the diff contract itself: PKs are unique per side (the reference's
    // primary-key model), and unique keys hash-balance, so the full-outer
    // exchange never builds a hot partition in the first place. If a Spark
    // upgrade ever learns to split full-outer joins, this assertion fails
    // loudly and the comment (and SURVEY §3.2) should be updated.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

      // origin: 100k rows, half replayed onto pk 0 (~6.5 MB in one
      // partition at these thresholds); target keeps unique PKs so the
      // full-outer match stays 1:1 per hot row
      val origin = spark.range(100000).select(
        when(col("id") % 2 === 0, lit(0L)).otherwise(col("id")).as("pk"),
        concat(lit("v"), lpad(col("id").cast("string"), 120, "x")).as("payload"))
      val target = spark.range(100000).select(col("id").as("pk"),
        concat(lit("v"), lpad(col("id").cast("string"), 120, "x")).as("payload"))
      // the gate catches exactly this fixture — since r10 it rides the
      // join's own shuffle and fires at the ACTION (raise_error in a
      // post-join filter), naming the hot key. Assert it fires, then
      // bypass it (AssumeUnique) to demonstrate the ungated hazard below
      val gateErr = intercept[Exception] {
        Diff.classify(origin, target, Seq("pk"), Seq("payload")).count()
      }
      val gateMsgs = Iterator.iterate(gateErr: Throwable)(_.getCause)
        .takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
      assert(gateMsgs.contains("duplicate-PK") && gateMsgs.contains("origin"),
        gateMsgs)
      val classified = Diff.classify(origin, target,
        Seq("pk"), Seq("payload"), onDup = Diff.AssumeUnique)
      val counts = classified.groupBy(Diff.StatusCol).count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      // odd origin ids exist in target with identical payload → valid;
      // the 50k hot rows all land on pk 0 whose target payload matches
      // only the id=0 row; even target ids (except 0) have no origin row
      assert(counts.getOrElse("missing", 0L) == 0L, s"hot pk exists in target: $counts")
      assert(counts("extra_in_target") == 49999L, s"even target ids 2..99998: $counts")
      assert(counts("valid") + counts.getOrElse("mismatch", 0L) == 100000L, counts.toString)

      val plan = finalPlan(classified.queryExecution.executedPlan).toString
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        s"expected a full-outer SMJ:\n$plan")
      assert(!plan.contains("skew=true"),
        s"AQE must NOT claim to skew-split a full-outer join; if it does, " +
          s"Spark learned a new trick — revisit this pin:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
