package graft.tools

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The sf-tier generator's contracts: keys stay unique (the diff family's
  * DupPkPolicy gate must not fire on generated tiers), copies don't
  * replicate text/embeddings verbatim (the dedup family's duplicate
  * structure must come from the query wrappers, not the scaling), and the
  * events time column keeps its semantics through the int64-nanos form.
  */
class GenSfSpec extends SparkSpec {

  private lazy val out = {
    val dir = java.nio.file.Files.createTempDirectory("graft-gensf").toString
    GenSf.generate(spark, sf(), dir, factor = 2)
    dir
  }

  test("generated tier scales counts ×factor with unique PKs") {
    val orders0 = spark.read.parquet(s"${sf()}/orders.parquet")
    val orders = spark.read.parquet(s"$out/orders.parquet")
    assert(orders.count() == 2 * orders0.count())
    assert(orders.select("o_orderkey").distinct().count() == orders.count(),
      "key shifting must keep PKs unique — the diff gate would abort otherwise")
    val docs = spark.read.parquet(s"$out/documents.parquet")
    assert(docs.select("doc_id").distinct().count() == docs.count())
    // the dup-injection wrappers shift by +100000: generated ids must stay
    // below that or injected dups would collide with real rows
    assert(docs.agg(max(col("doc_id"))).head().getLong(0) < 100000L)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    assert(emb.select("vec_id").distinct().count() == emb.count())
    assert(emb.agg(max(col("vec_id"))).head().getLong(0) < 100000L)
  }

  test("copies don't replicate content: re-texted docs, regenerated embeddings") {
    val docs = spark.read.parquet(s"$out/documents.parquet")
    val n0 = spark.read.parquet(s"${sf()}/documents.parquet").count()
    val copy0 = docs.filter(col("doc_id") < n0).select("text")
    val copy1 = docs.filter(col("doc_id") >= n0).select("text")
    assert(copy1.count() == n0)
    assert(copy0.intersect(copy1).count() == 0L,
      "verbatim copies would hand every doc a clone and distort the dedup family")
    // length distribution is preserved (same per-doc word count), and
    // n_chars stays consistent with the regenerated text
    val badChars = docs.filter(length(col("text")) =!= col("n_chars")).count()
    assert(badChars == 0L)
    val emb = spark.read.parquet(s"$out/embeddings.parquet")
    val nE0 = spark.read.parquet(s"${sf()}/embeddings.parquet").count()
    val e0 = emb.filter(col("vec_id") < nE0).select("embedding")
    val e1 = emb.filter(col("vec_id") >= nE0)
    assert(e1.count() == nE0, "copy 1 must be present and id-shifted by the stride")
    assert(e1.select("embedding").intersect(e0).count() == 0L)
    assert(e1.filter(size(col("embedding")) =!= 64).count() == 0L,
      "regenerated embeddings must keep the 64-dim testdata shape")
  }

  test("events keep their time semantics through the int64-nanos form") {
    val ev0 = graft.queries.Common.events(spark, sf())
    val ev = graft.queries.Common.events(spark, out)
    assert(ev.count() == 2 * ev0.count())
    // Common.events normalizes both shapes to the same µs timestamps: the
    // generated tier spans exactly the source's time range (copies shift
    // ids, never time)
    val r0 = ev0.agg(min(col("ts_us")), max(col("ts_us"))).head()
    val r = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
    assert(r == r0)
    assert(ev.select("user_id").distinct().count() ==
      2 * ev0.select("user_id").distinct().count(),
      "user cardinality scales with the tier (distinct_users must grow)")
  }
}
