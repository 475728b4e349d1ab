package graft.stream

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.LlmOps
import java.nio.file.Files

/** Streaming ANN serving (r12 VERDICT item 6): a query STREAM consumed in
  * `foreachBatch` micro-batches against the cell-partitioned assignment
  * store — each batch resolves in ONE pruned store pass
  * ([[LlmOps.annAssignedSearchBatch]]), and task input metrics prove the
  * per-batch read touches only the probed cells, never the whole store.
  */
class StreamingAnnServeSpec extends SparkSpec {
  import spark.implicits._

  /** 4 tight cones on 4 orthogonal axes, 100 vectors each — cells are
    * planted so nprobe=1 must touch exactly one quarter of the store.
    */
  private def corpus = (0 until 400).map { i =>
    val v = Array.fill(8)(0f)
    v(i % 4) = 1f
    v((i % 4) + 4) = 0.01f * (i / 4 % 7)
    (i.toLong, v.toSeq)
  }.toDF("vec_id", "embedding")

  private def queryVec(axis: Int, qid: Long) = {
    val v = Array.fill(8)(0f)
    v(axis) = 1f
    v(axis + 4) = 0.02f
    (qid, v.toSeq)
  }

  test("foreachBatch serving: per-batch reads touch only the probed cells " +
       "of the cid-partitioned store (task input metrics), results match " +
       "the single-query serve") {
    graft.functions.GraftFunctions.ensure(spark)
    val store = Files.createTempDirectory("graft-ann-stream").toString + "/cells"
    val cents = LlmOps.kmeansCentroids(corpus, c = 4, iters = 3)
    LlmOps.writeAnnAssignments(corpus, cents, store)

    // per-batch recordsRead, captured between micro-batches
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          acc.addAndGet(t.taskMetrics.inputMetrics.recordsRead)
    }
    val results = scala.collection.mutable.Map[Long, Seq[(Long, Long, Double)]]()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val mem = MemoryStream[(Long, Seq[Float])]
    val q = mem.toDF().toDF("vec_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val out = LlmOps.annAssignedSearchBatch(spark, store, cents,
            batch, nprobe = 1, k = 5)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
        results.synchronized { results(batchId) = out }
        ()
      }
      .start()
    spark.sparkContext.addSparkListener(listener)
    try {
      // batch 0: two queries on two different axes → ≤ 2 of 4 cells
      mem.addData(queryVec(0, 1000L), queryVec(1, 1001L))
      q.processAllAvailable()
      var last = -1L
      var spins = 0
      while (acc.get() != last && spins < 50) { last = acc.get(); spins += 1; Thread.sleep(100) }
      val batch0Reads = acc.get()
      // the 400-row store holds 100 rows/cell; 2 probed cells = 200 store
      // rows, plus bounded side reads (centroids, queries). A full-store
      // scan per query would be >= 800.
      assert(batch0Reads < 400L,
        s"batch 0 must read only its 2 probed cells, read $batch0Reads records")

      acc.set(0L)
      mem.addData(queryVec(2, 2000L))
      q.processAllAvailable()
      last = -1L; spins = 0
      while (acc.get() != last && spins < 50) { last = acc.get(); spins += 1; Thread.sleep(100) }
      assert(acc.get() < 250L,
        s"batch 1 (one query) must read ~1 probed cell, read ${acc.get()} records")
    } finally {
      spark.sparkContext.removeSparkListener(listener)
      q.stop()
    }

    // value parity: every streamed answer equals the single-query serve
    val expected = Map(
      1000L -> queryVec(0, 1000L), 1001L -> queryVec(1, 1001L),
      2000L -> queryVec(2, 2000L))
    val all = results.values.flatten.groupBy(_._1)
    assert(all.keySet == expected.keySet)
    for ((qid, rows) <- all) {
      val single = LlmOps.annAssignedSearch(spark, store, cents,
          Seq(expected(qid)).toDF("vec_id", "embedding"), nprobe = 1, k = 5)
        .collect().map(r => (r.getLong(0), r.getDouble(2))).toSeq
      assert(rows.toSeq.sortBy(-_._3).map(t => (t._2, t._3)) == single,
        s"qid=$qid: batched serve must match annAssignedSearch")
    }
  }
}
