package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Invariant checks for the mixing/packing/chunking/scrubbing operators —
  * complements their DuckDB oracles with properties a hash compare can't
  * express (rates, monotonicity, coverage).
  */
class PipelineOpsSpec extends SparkSpec {

  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf("sf0.01"))

  test("sample_stratified hits its per-stratum rates within binomial noise") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = q("sample_stratified").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((lang, total) <- totals) {
      val rate = kept.getOrElse(lang, 0L).toDouble / total
      val want = if (lang == "en") 26.0 / 256 else 128.0 / 256
      // 4 sigma of Binomial(total, want)
      val tol = 4 * math.sqrt(want * (1 - want) / total)
      assert(math.abs(rate - want) < tol,
        s"$lang: rate $rate vs target $want ± $tol (n=$total)")
    }
  }

  test("sample_stratified is idempotent: re-sampling keeps exactly the same rows") {
    val a = q("sample_stratified").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = q("sample_stratified").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a == b && a.nonEmpty)
  }

  test("split_manifest partitions the corpus exactly (every doc in one " +
       "split), is re-run stable, and holds its 250/3/3 proportions " +
       "within binomial noise") {
    val docs = spark.read.parquet(s"${sf("sf0.01")}/documents.parquet")
    val rows = q("split_manifest").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // exact partition: per-(split,lang) counts sum back to the corpus,
    // and chars conserve too (a doc in two splits would double-count)
    assert(rows.map(_._3).sum == docs.count())
    assert(rows.map(_._4).sum ==
      docs.agg(sum(col("n_chars"))).collect()(0).getLong(0))
    val again = q("split_manifest").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == again.toSeq, "split must be content-stable")
    val n = docs.count().toDouble
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    for ((split, want) <- Seq("train" -> 250.0 / 256,
                              "valid" -> 3.0 / 256, "test" -> 3.0 / 256)) {
      val rate = bySplit.getOrElse(split, 0L) / n
      val tol = 4 * math.sqrt(want * (1 - want) / n) + 1.0 / n
      assert(math.abs(rate - want) < tol,
        s"$split: rate $rate vs target $want ± $tol")
    }
    // independence from the sampling buckets: the 'split:' salt means the
    // eval splits still contain sampled-IN docs and train contains
    // sampled-OUT docs (a shared hash would nest one inside the other)
    val sampled = q("sample_stratified").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val testDocs = docs
      .withColumn("b", substring(
        md5(concat(lit("split:"), col("doc_id").cast("string")).cast("binary")),
        1, 2))
      .filter(col("b") >= "fa").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(testDocs.nonEmpty)
    assert(testDocs.exists(sampled.contains) || testDocs.size < 4,
      "eval splits should intersect the sample under independent hashing")
  }

  test("pack_sequences: offsets are contiguous and bins consistent per language") {
    val rows = q("pack_sequences")
      .select("lang", "doc_id", "n_tokens", "start_off", "bin", "off_in_bin")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (lang, rs) =>
      val sorted = rs.sortBy(_._2)
      // offsets tile the stream: each doc starts where the previous ended
      sorted.sliding(2).foreach {
        case Array((_, _, n1, off1, _, _), (_, id2, _, off2, _, _)) =>
          assert(off2 == off1 + n1, s"$lang doc $id2: gap at offset $off2 != $off1 + $n1")
        case _ => ()
      }
      sorted.foreach { case (_, id, _, off, bin, inBin) =>
        assert(bin == off / 64 && inBin == off % 64 && inBin >= 0 && inBin < 64,
          s"$lang doc $id: bin/off mismatch ($off, $bin, $inBin)")
      }
    }
  }

  test("chunk_overlap covers every token: last chunk ends at n_tokens, stride holds") {
    val rows = q("chunk_overlap")
      .select("doc_id", "chunk_id", "start", "chunk_len", "n_tokens").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getInt(3), r.getInt(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (doc, rs) =>
      val sorted = rs.sortBy(_._2)
      sorted.zipWithIndex.foreach { case ((_, cid, start, len, _), i) =>
        assert(cid == i && start == i * 30 && len > 0, s"doc $doc chunk $cid")
      }
      val (_, _, lastStart, lastLen, n) = sorted.last
      assert(lastStart + lastLen == n, s"doc $doc: tail not covered")
      // each chunk spans min(window, remaining) tokens from its start
      sorted.foreach { case (_, cid, start, len, nt) =>
        assert(len == math.min(40, nt - start), s"doc $doc chunk $cid: len $len")
      }
    }
  }

  test("mix_epochs: epoch counts match the per-stratum factors") {
    val out = q("mix_epochs").groupBy("lang")
      .agg(count(lit(1)).as("rows"), countDistinct(col("doc_id")).as("docs"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(out.nonEmpty)
    out.foreach { case (lang, rows, docs) =>
      val factor = if (lang == "en") 1 else 2
      assert(rows == docs * factor, s"$lang: $rows rows for $docs docs ×$factor")
    }
  }

  test("pii_redact scrubs every injected email/phone/ip and counts them") {
    val out = q("pii_redact")
    assert(out.filter(col("n_pii") < 3).count() == 0,
      "every doc carries at least the 3 injected PII items")
    val leftover = out.filter(
      col("clean").rlike("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}") ||
      col("clean").rlike("\\+\\d{1,2} \\d{3}-\\d{4}") ||
      col("clean").rlike("\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"))
    assert(leftover.count() == 0, "no PII pattern may survive redaction")
  }
}
