package graft.ext

import graft.SparkSpec

/** ccnet_buckets (r15): CCNet-style perplexity bucketing (Wenzek et al.
  * 2020). Pins the semantic core — the LM is trained on the REFERENCE
  * slice, so reference-typical text lands head and junk lands tail
  * regardless of source label — plus the exact-tercile bucket sizes and
  * end-to-end determinism.
  */
class CcnetSpec extends SparkSpec {
  import spark.implicits._

  // reference docs share a vocabulary; docs 10-12 reuse it (should score
  // high), 13-14 drift, 15 is gibberish (OOV trigrams only → tail). All
  // one lang so the tercile split is a single 6-doc sort: 2/2/2.
  private def rep(s: String): String = Seq.fill(6)(s).mkString(" ")

  private def corpus = Seq(
    (1L, rep("the quick brown fox jumps over the lazy dog near the river bank"), "en", "ref"),
    (2L, rep("the lazy dog sleeps near the river while the quick fox jumps"), "en", "ref"),
    (10L, rep("the quick fox and the lazy dog jump over the river bank"), "en", "web"),
    (11L, rep("the brown dog jumps over the quick fox near the lazy river"), "en", "web"),
    (12L, rep("a dog and a fox near the river bank jump over the lazy log"), "en", "web"),
    (13L, rep("market equity dividend portfolio hedge yield trade balance sheet"), "en", "web"),
    (14L, rep("patient dosage clinical trial symptom therapy diagnosis care"), "en", "web"),
    (15L, rep("zxq vxk wqj pzx kqv jxw qzk xvp wkz jqx zpw xkq"), "en", "web"))
    .toDF("doc_id", "text", "lang", "source")

  private def buckets(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
    df.collect().map(r => r.getLong(0) -> r.getString(4)).toMap

  test("reference-trained scoring: in-vocabulary text heads, gibberish tails") {
    val out = LlmOps.ccnetBuckets(corpus, Seq("ref"), vocabK = 4096)
    val b = buckets(out)
    assert(b.size == 8, s"every doc must be bucketed: $b")
    // gibberish (all-OOV) is the worst score in the corpus → tail
    assert(b(15L) == "tail", s"OOV-only doc must land tail: $b")
    // the reference docs themselves (in-vocabulary by construction) → head
    assert(b(1L) == "head" && b(2L) == "head",
      s"reference-vocabulary docs must land head: $b")
  }

  test("exact terciles: 8 docs in one lang split 3/2/3 (tail/middle/head)") {
    // t_lo = arr[(7/3)] = arr[2] (0-based; 3rd smallest), t_hi = arr[14/3]
    // = arr[4]: <=t_lo catches 3, <=t_hi 2 more, head 3 — with distinct
    // scores. Bucket SIZES are pinned; membership is pinned above.
    val b = buckets(LlmOps.ccnetBuckets(corpus, Seq("ref"), vocabK = 4096))
    val sizes = b.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(sizes("tail") == 3 && sizes("middle") == 2 && sizes("head") == 3,
      s"tercile sizes off: $sizes")
  }

  test("per-lang thresholds: a second language buckets independently") {
    val two = corpus.unionByName(Seq(
      (20L, rep("der schnelle braune fuchs springt ueber den faulen hund"), "de", "ref"),
      (21L, rep("der faule hund schlaeft am fluss der fuchs springt"), "de", "web"),
      (22L, rep("qqq www eee rrr ttt yyy uuu iii ooo ppp aaa sss"), "de", "web"))
      .toDF("doc_id", "text", "lang", "source"))
    val b = buckets(LlmOps.ccnetBuckets(two, Seq("ref"), vocabK = 4096))
    // de splits on its OWN terciles: 3 docs → 1/1/1, gibberish at tail,
    // the reference doc at head
    assert(b(22L) == "tail" && b(20L) == "head", s"de buckets wrong: $b")
    assert(Seq(20L, 21L, 22L).map(b).sorted == Seq("head", "middle", "tail"),
      s"3-doc lang must split 1/1/1: $b")
  }

  test("deterministic end to end") {
    val a = LlmOps.ccnetBuckets(corpus, Seq("ref")).collect().map(_.toSeq).toSeq
    val b = LlmOps.ccnetBuckets(corpus, Seq("ref")).collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}
