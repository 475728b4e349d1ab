package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** hybrid_search_rrf (r15): Reciprocal Rank Fusion of the BM25 lexical
  * branch and the dense cosine branch. Pins the defining RRF property
  * (consistent mid-rank presence in BOTH branches beats a single-branch
  * top hit), the exact 1/(60+rank) arithmetic including the single-branch
  * null case, and full parity with an independently-fused computation on
  * the registry corpus.
  */
class HybridSearchSpec extends SparkSpec {
  import spark.implicits._

  private val terms = Seq("alpha", "beta")

  // lexical ranking by tf: doc 1 (tf=3) > doc 5 (tf=1); docs 3/7 match no
  // term. dense ranking by cosine vs query [1,0]: vec 7 (exact) > vec 5;
  // vec 1 has no embedding row, vec 3 is near-orthogonal.
  private def fixtureDocs = Seq(
    (1L, "alpha alpha alpha filler filler filler"),
    (3L, "nothing relevant here at all folks"),
    (5L, "alpha filler filler filler filler filler"),
    (7L, "other text with zero query words too")).toDF("doc_id", "text")

  private def fixtureEmb = Seq(
    (0L, Array(1.0f, 0.0f), 0),
    (3L, Array(0.1f, 1.0f), 0),
    (5L, Array(1.0f, 0.1f), 0),
    (7L, Array(1.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label")

  test("both-branch mid ranks beat a single-branch rank 1 (the RRF point)") {
    val out = LlmOps.hybridSearchRrf(fixtureDocs, fixtureEmb, terms, k = 10)
      .collect()
    val ids = out.map(_.getLong(0)).toSeq
    // doc 5: lex rank 2 + dense rank 2 → 2/62 ≈ 0.032258, ahead of the
    // two single-branch rank-1 docs (1/61 ≈ 0.016393); their tie breaks
    // by doc_id (1 before 7)
    assert(ids.take(3) == Seq(5L, 1L, 7L), s"got $ids")
    val byId = out.map(r => r.getLong(0) ->
      (r.getDouble(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(byId(5L)._1 == LlmOps.round6d(1.0 / 62.0 + 1.0 / 62.0))
    assert(byId(1L)._1 == LlmOps.round6d(1.0 / 61.0))
    // single-branch docs carry a null for the missing branch's rank
    assert(byId(1L)._2.contains(1.0) && byId(1L)._3.isEmpty)
    assert(byId(7L)._2.isEmpty && byId(7L)._3.contains(1.0))
    assert(byId(5L)._2.contains(2.0) && byId(5L)._3.contains(2.0))
  }

  test("fusion parity with independently-collected branch lists (sf0.001)") {
    val docs = spark.read.parquet(sf() + "/documents.parquet")
    val emb = spark.read.parquet(sf() + "/embeddings.parquet")
    val q = Seq("column", "window", "scan")
    val out = LlmOps.hybridSearchRrf(docs, emb, q, k = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    // independent fusion: run each branch alone, fuse on the driver
    val lex = LlmOps.bm25Search(docs.filter(col("doc_id") =!= 0), q, 20)
      .collect().map(_.getLong(0))
    val den = LlmOps.cosineTopK(emb.filter(col("vec_id") =!= 0),
      emb.filter(col("vec_id") === 0), 20).collect().map(_.getLong(0))
    assert(lex.nonEmpty && den.nonEmpty)
    val lexRank = lex.zipWithIndex.toMap
    val denRank = den.zipWithIndex.toMap
    val expected = (lexRank.keySet ++ denRank.keySet).toSeq
      .map { id =>
        val s = lexRank.get(id).map(i => 1.0 / (60.0 + i + 1)).getOrElse(0.0) +
          denRank.get(id).map(i => 1.0 / (60.0 + i + 1)).getOrElse(0.0)
        (id, LlmOps.round6d(s))
      }
      .sortBy { case (id, s) => (-s, id) }
      .take(10)
    assert(out.toSeq == expected)
  }

  test("output is bounded by k and sorted by (rrf desc, doc_id)") {
    val out = LlmOps.hybridSearchRrf(fixtureDocs, fixtureEmb, terms, k = 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.length == 2)
    assert(out.sortBy { case (id, s) => (-s, id) }.toSeq == out.toSeq)
  }
}
