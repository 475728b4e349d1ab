package graft.ext

import org.apache.spark.sql.DataFrame
import graft.SparkSpec

/** Persisted trained-ANN index lifecycle (LlmOps.writeAnnIndex /
  * annIndexSearch / annIndexHealth / refreshAnnIndex): the store serves
  * searches identically to in-memory centroids, a fresh index reports
  * fresh, corpus growth past the √N rule trips the size rule,
  * distribution shift trips the drift rule, and refresh retrains only
  * when stale.
  */
class AnnIndexSpec extends SparkSpec {
  import spark.implicits._

  private def dir(name: String): String = {
    val d = s"target/annindex_spec/$name"
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(d), true)
    d
  }

  // two tight clusters on the x and y axes, deterministic jitter on dims 2/3
  private def baseCorpus(n: Int, idOffset: Long = 0L): DataFrame =
    (0 until n).map { i =>
      val j = (i % 10) * 0.01f
      val v = if (i % 2 == 0) Seq(1f, 0f, j, 0.01f) else Seq(0f, 1f, 0f, j + 0.01f)
      (idOffset + i, v)
    }.toDF("vec_id", "embedding")

  // drift: vectors on the z axis — far from every trained centroid
  private def driftVecs(n: Int, idOffset: Long): DataFrame =
    (0 until n).map { i =>
      (idOffset + i, Seq(0f, 0f, 1f, (i % 10) * 0.01f))
    }.toDF("vec_id", "embedding")

  test("a NaN assignment cosine FAILS LOUDLY instead of silently assigning " +
       "(r12 ADVICE — the bigint argmax encoding would map NaN to a " +
       "clean-looking ccos=0.0 and mute the drift signal)") {
    val cents = LlmOps.kmeansCentroids(baseCorpus(40), c = 2, iters = 2)
    // an Inf-poisoned vector passes the nrm > 0 gate (Inf > 0) but its
    // cosine is Inf/Inf = NaN — exactly the poison the guard exists for
    val poisoned = baseCorpus(40).unionByName(
      Seq((999L, Seq(Float.PositiveInfinity, 0f, 0f, 0f)))
        .toDF("vec_id", "embedding"))
    val e = intercept[Exception] {
      LlmOps.kmeansAssignTo(poisoned, cents).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
        .map(x => String.valueOf(x.getMessage)).toSeq
    assert(messages(e).exists(m => m.contains("NaN assignment cosine")),
      s"expected the argmax NaN guard, got: ${messages(e).mkString(" | ")}")
    // the clean corpus still assigns fine through the guarded path
    assert(LlmOps.kmeansAssignTo(baseCorpus(40), cents).count() == 40)
  }

  test("store serves searches identically to in-memory centroids") {
    val path = dir("serve")
    val corpus = baseCorpus(40)
    LlmOps.writeAnnIndex(corpus, path, cHint = Some(4), iters = 2)
    val q = Seq((999L, Seq(0.9f, 0.1f, 0f, 0f))).toDF("vec_id", "embedding")
      .select($"embedding")
    val fromStore = LlmOps.annIndexSearch(corpus, path, q, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    val inMem = LlmOps.ivfSearchKmeansWith(corpus,
        LlmOps.kmeansCentroids(corpus, c = 4, iters = 2), q, nprobe = 2, k = 5)
      .collect().map(r => (r.getLong(0), r.getDouble(2)))
    assert(fromStore.toSeq == inMem.toSeq)
  }

  test("fresh index on an unchanged corpus reports fresh") {
    val path = dir("fresh")
    val corpus = baseCorpus(40)
    LlmOps.writeAnnIndex(corpus, path)
    val h = LlmOps.annIndexHealth(corpus, path)
    assert(!h.stale && h.reason == "fresh")
    assert(h.meanCosNow == h.meanCosBuild)
    assert(h.nIndexed == 40L && h.nNow == 40L)
  }

  test("corpus growth past the sqrt-N rule trips the size rule") {
    val path = dir("size")
    LlmOps.writeAnnIndex(baseCorpus(40), path)
    // 5x the corpus, same distribution: cAuto jumps past growFactor * c
    val grown = (0 until 5).map(r => baseCorpus(40, idOffset = 1000L * r))
      .reduce(_ unionByName _)
    val h = LlmOps.annIndexHealth(grown, path)
    assert(h.stale && h.reason == "size", h.toString)
    assert(h.cAuto > 2.0 * h.cIndex)
    // same distribution: assignment quality has NOT collapsed
    assert(h.meanCosBuild - h.meanCosNow <= 0.05, h.toString)
  }

  test("distribution shift trips the drift rule without size growth") {
    val path = dir("drift")
    LlmOps.writeAnnIndex(baseCorpus(40), path)
    // +40 z-axis vectors: n=80 keeps cAuto under the size rule, but the
    // new mass lands far from every trained centroid
    val shifted = baseCorpus(40).unionByName(driftVecs(40, idOffset = 5000L))
    val h = LlmOps.annIndexHealth(shifted, path)
    assert(h.stale && h.reason == "drift", h.toString)
    assert(h.meanCosBuild - h.meanCosNow > 0.05, h.toString)
  }

  test("refresh retrains exactly when stale") {
    val path = dir("refresh")
    LlmOps.writeAnnIndex(baseCorpus(40), path)
    val shifted = baseCorpus(40).unionByName(driftVecs(40, idOffset = 5000L))
    val h1 = LlmOps.refreshAnnIndex(shifted, path)
    assert(h1.stale)
    // post-refresh the index is trained on today's corpus: fresh again
    val h2 = LlmOps.annIndexHealth(shifted, path)
    assert(!h2.stale && h2.reason == "fresh", h2.toString)
    assert(h2.nIndexed == 80L)
    // a fresh index is left alone (stats row unchanged by a no-op refresh)
    val h3 = LlmOps.refreshAnnIndex(shifted, path)
    assert(!h3.stale)
    assert(LlmOps.annIndexHealth(shifted, path).meanCosBuild == h2.meanCosBuild)
  }

  test("readAnnIndex byte gate: an over-budget index fails loudly, " +
       "in budget it serves (r10 verdict item 4)") {
    val path = dir("gate")
    LlmOps.writeAnnIndex(baseCorpus(40), path, cHint = Some(4), iters = 2)
    val e = intercept[IllegalArgumentException] {
      LlmOps.readAnnIndex(spark, path, budgetBytes = 16)
    }
    assert(e.getMessage.contains("budget"), e.getMessage)
    assert(e.getMessage.contains("kmeansAssignToHier"), e.getMessage)
    assert(LlmOps.readAnnIndex(spark, path).count() == 4)
  }

  test("cell-partitioned assignment store: search matches the re-assigning " +
       "form and reads ONLY the probed cells, by actual task input metrics") {
    import org.apache.spark.sql.functions.col
    val path = dir("assigned")
    val corpus = baseCorpus(400)
    val cents = LlmOps.kmeansCentroids(corpus, c = 4, iters = 2)
    LlmOps.writeAnnAssignments(corpus, cents, path)
    val query = Seq((0L, Seq(1f, 0f, 0.05f, 0f))).toDF("vec_id", "embedding")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSeq
    val reassigning = rows(LlmOps.ivfSearchKmeansWith(corpus, cents, query,
      nprobe = 1, k = 5))
    // task metrics listener (the ZorderSpec technique)
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    val served =
      try {
        val r = rows(LlmOps.annAssignedSearch(spark, path, cents, query,
          nprobe = 1, k = 5))
        var last = -1L; var spins = 0
        while (acc.get() != last && spins < 50) {
          last = acc.get(); spins += 1; Thread.sleep(100)
        }
        r
      } finally spark.sparkContext.removeSparkListener(listener)
    assert(served == reassigning,
      s"served=$served reassigning=$reassigning")
    // the corpus is two planted clusters over 4 cells; nprobe=1 must
    // materialize only the probed cell's partition — strictly under half
    // the 400-row store
    assert(acc.get() < 200L,
      s"partition pruning must keep the scan to the probed cell: ${acc.get()}")
  }

  test("hierarchical assignment matches flat on well-separated clusters " +
       "and carries the same schema (r10 verdict item 4)") {
    import org.apache.spark.sql.functions.col
    // 8 tight cones on 8 orthogonal axes; ids interleaved so the
    // deterministic seed (smallest vec_ids) starts one centroid per cone
    val vecs = (0 until 8).flatMap { c =>
      (0 until 10).map { i =>
        val v = Array.fill(8)(0.02f * ((c * 7 + i) % 5))
        v(c) = 1f
        ((i * 8 + c + 1).toLong, v.toSeq)
      }
    }.toDF("vec_id", "embedding")
    val cents = LlmOps.kmeansCentroids(vecs, c = 8, iters = 2)
    val flat = LlmOps.kmeansAssignTo(vecs, cents)
    val hier = LlmOps.kmeansAssignToHier(vecs, cents)
    assert(hier.columns.toSeq == flat.columns.toSeq)
    def m(df: org.apache.spark.sql.DataFrame) =
      df.select(col("vec_id"), col("cid")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val (f, h) = (m(flat), m(hier))
    assert(h.size == 80)
    assert(h == f,
      s"hier must match flat on separated cones, diffs: ${h.toSeq.diff(f.toSeq)}")
  }

  test("kmeansAssignAuto: hier engages above HierAssignCrossoverC and the " +
       "health verdict is unchanged vs flat (r11 verdict item 6)") {
    import org.apache.spark.sql.functions.{col, avg}
    // selector logic
    assert(!LlmOps.hierAutoPick(LlmOps.HierAssignCrossoverC - 1))
    assert(LlmOps.hierAutoPick(LlmOps.HierAssignCrossoverC))
    // end-to-end: an index whose c exceeds the crossover — health runs
    // through the hier assignment path — must yield the same staleness
    // decision as the flat path, with mean assignment cosine tracking
    val path = dir("hier_auto")
    // sf0.1: 2000 vectors — the only tier with N above the crossover
    val emb = spark.read.parquet(s"${sf("sf0.1")}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val c = LlmOps.HierAssignCrossoverC.toInt + 76 // 1100 ≥ crossover
    LlmOps.writeAnnIndex(emb, path, cHint = Some(c), iters = 2)
    val cents = LlmOps.readAnnIndex(spark, path)
    assert(cents.count() >= LlmOps.HierAssignCrossoverC)
    val h = LlmOps.annIndexHealth(emb, path) // meanNow via kmeansAssignAuto → hier
    // the drift rule compares like-with-like: the BUILD mean is computed
    // through the same auto path, so an unchanged corpus reads drift = 0
    // EXACTLY regardless of which path the crossover picked
    assert(h.meanCosNow == h.meanCosBuild,
      s"unchanged corpus must read zero drift via hier: ${h.meanCosNow} vs ${h.meanCosBuild}")
    assert(!h.stale, "a fresh index at large c must still report fresh via hier")
    // absolute tracking vs flat: this forced regime (c = N/2, coarse
    // groups ≪ natural clusters) is far off the auto-c design point
    // (c = √N), so hier is approximate here — bound the gap, exact
    // parity at the design point is HierProbe's table + the cones spec
    val flatMean = LlmOps.kmeansAssignTo(emb, cents)
      .agg(avg(col("ccos"))).head().getDouble(0)
    assert(math.abs(h.meanCosNow - flatMean) <= 0.05,
      s"hier health mean ${h.meanCosNow} must track flat $flatMean")
    // decision parity: the drift rule fires identically under either mean
    val flatDrift = h.meanCosBuild - flatMean > 0.05
    val hierDrift = h.meanCosBuild - h.meanCosNow > 0.05
    assert(flatDrift == hierDrift, "staleness decision must not depend on the path")
  }

  test("graft_vec_dmean Lloyd update equals the posexplode/DECIMAL-sum " +
       "form bit for bit (r16) — ragged lengths, null elements, " +
       "precision-overflow values, float widening") {
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      (0, Seq[java.lang.Float](1.1f, 2.2f, 3.3f)),
      (0, Seq[java.lang.Float](0.1f, null, 9.9f)), // null element: count, no sum
      (0, Seq[java.lang.Float](7.5f)),             // ragged: shorter vector
      (1, Seq[java.lang.Float](1e9f, 2f)),         // large but inside DECIMAL(20,10)
      (1, Seq[java.lang.Float](4f, 5f, 6f, 7f)),
      (2, Seq[java.lang.Float](null, null))        // all-null position → null element
    ).toDF("cid", "embedding").repartition(3)
    def collect(df: DataFrame) = df.collect()
      .map(r => (r.getInt(0), r.getSeq[Any](1).toList)).sortBy(_._1).toList
    val one = collect(LlmOps.updateCentroids(rows, nGroups = 3))
    val two = collect(LlmOps.updateCentroids(rows, nGroups = Int.MaxValue))
    assert(one == two, s"\none: $one\ntwo: $two")
    // decimal-precision overflow THROWS on both forms (ANSI default):
    val big = Seq((0, Seq(1e15f, 2f))).toDF("cid", "embedding").repartition(2)
    for (g <- Seq(1, Int.MaxValue))
      intercept[Exception] {
        LlmOps.updateCentroids(big, nGroups = g).collect()
      }
    // and on the real corpus: same trained centroids either way
    val emb = baseCorpus(100).repartition(2)
      .select(col("vec_id"), col("embedding"))
    val a = LlmOps.kmeansCentroids(emb, 4, 2).collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    assert(a.nonEmpty && a.forall(_._2.nonEmpty))
  }

  test("join-free local assignment is row-identical to the crossJoin " +
       "argmax shape it replaced (r16) — same winners, same tie-breaks, " +
       "same round6-encoded cosines") {
    import org.apache.spark.sql.functions.col
    // repartition: a LocalRelation corpus would let ConvertToLocalRelation
    // evaluate the whole argmax projection driver-side (which also works,
    // but then the plan carries no kernel to assert on)
    val emb = baseCorpus(200).repartition(2)
    val cents = LlmOps.kmeansCentroids(emb, 4, 2)
    val local = LlmOps.kmeansAssignTo(emb, cents)
    assert(local.queryExecution.executedPlan.toString
      .contains("graft_argmax_cell"), "fixture must exercise the local path")
    // hide the LocalRelation behind a non-collapsible lineage so
    // assignCells falls back to the r14 crossJoin + groupBy shape
    val joined = LlmOps.kmeansAssignTo(emb, cents.repartition(1))
    assert(!joined.queryExecution.executedPlan.toString
      .contains("graft_argmax_cell"), "fixture must exercise the join path")
    def rows(df: DataFrame) = df
      .select(col("vec_id"), col("cid"), col("ccos"), col("nrm"))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2),
        r.getDouble(3))).sortBy(_._1).toSeq
    assert(rows(local) == rows(joined))
  }

  test("assignment argmax never plans a sort-based aggregate over the " +
       "vectors×centroids stream (r12 ENOSPC fix); the flat LOCAL path " +
       "plans JOIN-FREE with zero exchanges (r16)") {
    val emb = baseCorpus(200).repartition(2)
    val cents = LlmOps.kmeansCentroids(emb, 4, 1)
    // flat assignment against a local centroid table: one codegen'd
    // argmax projection — no crossJoin, no aggregate, and no exchange
    // beyond the fixture's own repartition
    val flat = LlmOps.kmeansAssignTo(emb, cents)
    val flatPlan = flat.queryExecution.executedPlan.toString
    assert(flatPlan.contains("graft_argmax_cell"),
      s"flat local assignment must ride the join-free kernel:\n$flatPlan")
    assert(!flatPlan.contains("Aggregate") && !flatPlan.contains("Join"),
      s"flat local assignment must be a scan-side projection — no join, " +
        s"no aggregate:\n$flatPlan")
    // the hierarchical path still aggregates (coarse-group top-G +
    // argmax) — fixed-width HashAggregate, never sort-based
    val hierPlan = LlmOps.kmeansAssignToHier(emb, cents)
      .queryExecution.executedPlan.toString
    assert(hierPlan.contains("HashAggregate"), hierPlan)
    assert(!hierPlan.contains("SortAggregate"),
      s"argmax fell back to sort-based aggregation — the N×c candidate " +
        s"stream would sort/spill again:\n$hierPlan")
  }

  test("appendAnnAssignments (r13): delta-proportional append — existing " +
       "store files never rewritten, base store never read, serving from " +
       "the appended store equals the full rebuild") {
    import org.apache.spark.sql.functions._
    val store = dir("append_store")
    val all = baseCorpus(120)
    val base = all.filter(col("vec_id") % 3 =!= 0)
    val delta = all.filter(col("vec_id") % 3 === 0)
    val cents = LlmOps.kmeansCentroids(all, c = 2, iters = 2)
    LlmOps.writeAnnAssignments(base, cents, store)
    def inventory(): Map[String, Long] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(store)).filter(_.getName.endsWith(".parquet"))
        .map(f => f.getPath -> f.length()).toMap
    }
    val before = inventory()
    // the append must not READ the store (delta-proportional contract)
    val reads = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          reads.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      LlmOps.appendAnnAssignments(delta, cents, store)
      // drain the listener bus (same spin-until-stable idiom as
      // StreamingAnnServeSpec — the bus is async and private[spark])
      var last = -1L; var spins = 0
      while (reads.get() != last && spins < 50) {
        last = reads.get(); spins += 1; Thread.sleep(100)
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    assert(reads.get() <= 3L * 40 + 10,
      s"append read ${reads.get()} records — more than the 40-row delta " +
        "accounts for (the base store must not be scanned)")
    val after = inventory()
    before.foreach { case (p, len) =>
      assert(after.get(p).contains(len), s"append rewrote existing file $p")
    }
    assert(spark.read.parquet(store).count() == 120)
    // serving parity with the one-shot full-corpus store
    val full = dir("append_store_full")
    LlmOps.writeAnnAssignments(all, cents, full)
    val q = baseCorpus(1, idOffset = 9000L)
    def serve(p: String) =
      LlmOps.annAssignedSearch(spark, p, cents, q, nprobe = 1, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
    assert(serve(store) == serve(full))
    // replay with the dedupe guard is a no-op
    LlmOps.appendAnnAssignments(delta, cents, store, dedupeAgainstStore = true)
    assert(spark.read.parquet(store).count() == 120,
      "dedupe-guarded replay must not duplicate the delta")
  }
}
