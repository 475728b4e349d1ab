package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** dsir_select (r15): Data Selection via Importance Resampling (Xie et al.
  * 2023). Pins the semantic core — importance weights rank by CONTENT
  * match to the target domain, not by source label — plus weight signs,
  * Gumbel determinism, and the fixed-point arithmetic contract.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies: "medical" target domain vs "finance" raw
  // bulk. doc 50 is finance-LABELED but medical-WORDED — the doc DSIR
  // exists to find. Texts repeat ×8 so the per-bucket counts dominate the
  // +1/B Laplace smoothing (at 6-word docs the smoothing washes the
  // log-ratios toward 0 and signs are noise).
  private def rep(s: String): String = Seq.fill(8)(s).mkString(" ")

  private def corpus = Seq(
    (1L, rep("patient dosage clinical trial symptom therapy"), "target_src"),
    (2L, rep("dosage therapy patient diagnosis clinical care"), "target_src"),
    (10L, rep("market equity dividend portfolio hedge yield"), "web"),
    (11L, rep("portfolio yield market dividend equity trade"), "web"),
    (12L, rep("equity hedge trade market yield dividend"), "web"),
    (50L, rep("clinical patient therapy dosage symptom diagnosis"), "web"))
    .toDF("doc_id", "text", "source")

  test("content match to the target domain outranks the source label") {
    val out = LlmOps.dsirSelect(corpus, Seq("target_src"), kSelect = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // target-vocabulary docs (including the mislabeled 50) carry positive
    // log weights; pure finance docs carry negative ones
    assert(out(1L) > 0 && out(2L) > 0 && out(50L) > 0,
      s"target-worded docs must score positive: $out")
    assert(out(10L) < 0 && out(11L) < 0 && out(12L) < 0,
      s"off-domain docs must score negative: $out")
    // and the mislabeled doc outranks every off-domain doc
    assert(Seq(10L, 11L, 12L).forall(id => out(50L) > out(id)))
  }

  test("selection is deterministic (content-stable Gumbel, no RNG)") {
    val a = LlmOps.dsirSelect(corpus, Seq("target_src"), kSelect = 6)
      .collect().map(_.toSeq).toSeq
    val b = LlmOps.dsirSelect(corpus, Seq("target_src"), kSelect = 6)
      .collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("skey = logw + gumbel at 6 decimals; output bounded and sorted") {
    val rows = LlmOps.dsirSelect(corpus, Seq("target_src"), kSelect = 3)
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val (logw, g, skey) = (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(skey == LlmOps.round6d(logw + g))
    }
    val keys = rows.map(r => (-r.getDouble(4), r.getLong(0))).toSeq
    assert(keys == keys.sorted)
  }

  test("an empty-worded doc keeps logw 0 and survives via its Gumbel draw") {
    val withEmpty = corpus.unionByName(
      Seq((99L, "", "web")).toDF("doc_id", "text", "source"))
    val out = LlmOps.dsirSelect(withEmpty, Seq("target_src"), kSelect = 7)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out.contains(99L) && out(99L) == 0.0)
  }
}
