package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** minhash_tune (r15): the LSH banding parameter sweep. Pins the S-curve
  * closed forms, the more-bands → more-candidates monotonicity, parity of
  * the measured pair mass with the single-config pipeline, and the
  * hot-bucket exclusion contract.
  */
class MinhashTuneSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  private def fixture = docs(
    1L -> "the quick brown fox jumps over the lazy dog again and again",
    2L -> "the quick brown fox jumps over the lazy dog again and again",
    3L -> "the quick brown fox jumps over the lazy cat again and again",
    4L -> "entirely different words about spark catalyst tungsten codegen shuffles",
    5L -> "another unrelated document mentioning joins aggregates and windows only")

  test("closed forms: s* and the S-curve match the textbook formulas") {
    val rows = LlmOps.minhashTune(fixture, "doc_id").collect()
      .map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(4))).toMap
    for (((b, r), (sStar, p080)) <- rows) {
      assert(sStar == LlmOps.round6d(math.pow(1.0 / b, 1.0 / r)))
      assert(p080 == LlmOps.round6d(
        1.0 - math.pow(1.0 - math.pow(0.8, r.toDouble), b.toDouble)))
    }
  }

  test("more bands of fewer rows => lower threshold, more candidate pairs") {
    val rows = LlmOps.minhashTune(fixture, "doc_id").collect()
      .map(r => (r.getInt(0), r.getDouble(2), r.getLong(6))).sortBy(-_._1)
    val thresholds = rows.map(_._2).toSeq
    assert(thresholds == thresholds.sorted, s"s* must rise as bands fall: $rows")
    val pairs = rows.map(_._3).toSeq
    assert(pairs == pairs.sorted.reverse,
      s"candidate mass must not rise as bands fall: $rows")
    // the exact twins (1,2) always collide: every config has >= 1 pair
    assert(pairs.last >= 1L)
  }

  test("measured pair mass matches the single-config LSH pipeline") {
    val sh = LlmOps.shingleTable(fixture, "doc_id")
    try {
      val single = LlmOps.minhashCandidatesFrom(sh, "doc_id",
        k = 16, bands = 4, r = 4).count()
      val swept = LlmOps.minhashTune(fixture, "doc_id").collect()
        .find(r => r.getInt(0) == 4 && r.getInt(1) == 4).get.getLong(6)
      assert(swept == single)
    } finally { sh.unpersist(); () }
  }

  test("hot buckets are excluded from pairing and counted") {
    val boiler = docs((1L to 6L).map(i =>
      (i, "the same exact boilerplate text repeated here")): _*)
    val rows = LlmOps.minhashTune(boiler, "doc_id", maxBucket = 3).collect()
    rows.foreach { r =>
      assert(r.getLong(6) == 0L, s"capped corpus must yield no pairs: $r")
      assert(r.getLong(7) >= 1L, s"capped buckets must be counted: $r")
    }
  }
}
