package graft.migrate

import org.apache.spark.sql.{DataFrame, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator
import java.nio.file.{Files, Paths, StandardOpenOption}
import java.nio.charset.StandardCharsets

import graft.core.Ops

/** The CDM `Migrate` pipeline re-expressed Spark-first (reference:
  * docs/04-cdm-approach.md:280-462 and lab/cdm-config/cdm.properties:27-38):
  * token-bucketed scan → column subset/exclusion → custom transformer →
  * writetime adjustment → guardrail split → rate-limited write, with an
  * error budget and a per-bucket run ledger for resume.
  *
  * Scale posture (SURVEY §3.1): the happy path is a single narrow pipeline —
  * read → filter/project/transform → write — with ZERO exchanges (asserted
  * in MigrateJobSpec). Parallelism comes from input splits
  * (spark.sql.files.maxPartitionBytes plays CDM's numParts ≈ table/10MB
  * rule, docs/04-cdm-approach.md:459); buckets exist for *resume/slicing*
  * semantics (partition.min/max, docs/04-cdm-approach.md:290-315), not for
  * parallelism.
  */
object MigrateJob {

  /** CDM-properties analog (lab/cdm-config/cdm.properties:1-40). */
  final case class Config(
      columnsToTarget: Seq[String] = Nil,          // column.names.to.target (P1)
      columnsToExclude: Seq[String] = Nil,         // column.names.to.exclude (P2)
      pkCols: Seq[String] = Nil,
      tokenBuckets: Int = 8,                       // numParts analog
      bucketRange: Option[(Int, Int)] = None,      // partition.min/max (P4)
      minWritetime: Option[Long] = None,           // filter.writetime.min (P5)
      writetimeCol: Option[String] = None,
      writetimeIncrementBy: Long = 0L,             // transform.custom.writetime.incrementBy (X2)
      guardrailMaxRowBytes: Option[Long] = None,   // guardrail.colSizeInKB analog (P7)
      transformerClass: Option[String] = None,     // transform.custom.class (X1)
      maxRowsPerSecondPerPartition: Option[Int] = None, // ratelimit.target (divided per worker, docs/04-cdm-approach.md:637)
      errorLimit: Long = 100L) {                   // maxErrorCount (cdm.properties:38)
    /** CDM divides the global rate limit by worker count
      * (docs/04-cdm-approach.md:637). Recompute from current parallelism —
      * under dynamic allocation call again per epoch (SURVEY §7.4 risk 6).
      */
    def withGlobalRateLimit(spark: SparkSession, rowsPerSecond: Int): Config =
      copy(maxRowsPerSecondPerPartition =
        Some(math.max(1, rowsPerSecond / math.max(1, spark.sparkContext.defaultParallelism))))
  }

  /** CDM custom transformer interface (docs/04-cdm-approach.md:341-349),
    * Spark-shaped: whole-DataFrame transform (declarative, stays in
    * codegen) instead of the reference's per-Row callback.
    */
  trait Transformer extends Serializable {
    def apply(df: DataFrame): DataFrame
  }

  final case class Result(
      migrated: Long, skippedOversize: Long, buckets: Seq[Int], ledgerPath: String)

  /** Error budget: cheap task-side accumulator checked between buckets —
    * aborting mid-job once the budget is blown, like CDM's maxErrorCount.
    */
  final class ErrorBudget(val acc: LongAccumulator, limit: Long) extends Serializable {
    def check(): Unit =
      if (acc.value > limit)
        throw new IllegalStateException(
          s"error budget exceeded: ${acc.value} > $limit")
  }

  /** Plain-Scala token bucket: caps rows/sec per partition. Used only when
    * the sink needs throttling (ratelimit.origin/target,
    * cdm.properties:30-31) — it forces a row-level map, so it is OFF by
    * default to keep the pipeline in whole-stage codegen.
    */
  def rateLimited(df: DataFrame, rowsPerSecond: Int): DataFrame = {
    val enc = Encoders.row(df.schema)
    df.mapPartitions { it =>
      val t0 = System.nanoTime()
      var n = 0L
      it.map { r =>
        n += 1
        val dueNs = t0 + (n * 1e9 / rowsPerSecond).toLong
        val waitMs = (dueNs - System.nanoTime()) / 1000000
        if (waitMs > 0) Thread.sleep(waitMs)
        r
      }
    }(enc)
  }

  /** The narrow transform chain (no scan, no sink): everything between
    * CDM's read and write stages (docs/04-cdm-approach.md 3.2 §4).
    *
    * Stage order (and its two contracts):
    * bucket slice → writetime filter → projection/exclusion → custom
    * transformer → writetime increment. The custom [[Transformer]] sees the
    * POST-projection schema — like CDM, where column selection is resolved
    * before the row reaches the transform hook. Because the writetime
    * increment runs last, a `columnsToTarget`/`columnsToExclude` set that
    * drops `writetimeCol` is rejected up front (clear error instead of an
    * AnalysisException deep in the chain) — CDM itself cannot write
    * writetimes it no longer carries.
    */
  def transformOnly(df: DataFrame, cfg: Config, errors: Option[LongAccumulator] = None): DataFrame = {
    // Only the increment references writetimeCol AFTER projection — a
    // filter-only config (minWritetime with incrementBy=0) may freely
    // project the column away, since the filter runs first.
    for (wt <- cfg.writetimeCol if cfg.writetimeIncrementBy != 0L) {
      val droppedByProjection =
        cfg.columnsToTarget.nonEmpty && !cfg.columnsToTarget.contains(wt)
      require(!droppedByProjection && !cfg.columnsToExclude.contains(wt),
        s"writetimeCol '$wt' is dropped by columnsToTarget/columnsToExclude " +
          "but writetimeIncrementBy needs it post-projection; keep it in the " +
          "projection or unset the increment")
    }
    var out = df
    cfg.bucketRange.foreach { case (lo, hi) =>
      out = Ops.tokenRange(out, cfg.pkCols, cfg.tokenBuckets, lo, hi)
    }
    for (wt <- cfg.writetimeCol; min <- cfg.minWritetime)
      out = Ops.incremental(out, wt, min)
    if (cfg.columnsToTarget.nonEmpty) out = Ops.project(out, cfg.columnsToTarget)
    if (cfg.columnsToExclude.nonEmpty) out = Ops.exclude(out, cfg.columnsToExclude)
    cfg.transformerClass.foreach { cls =>
      val t = Class.forName(cls).getDeclaredConstructor().newInstance()
        .asInstanceOf[Transformer]
      out = t(out)
    }
    for (wt <- cfg.writetimeCol if cfg.writetimeIncrementBy != 0L)
      out = Ops.writetimeIncrement(out, wt, cfg.writetimeIncrementBy)
    out
  }

  /** Split a transformed frame into (pass, oversize) by the guardrail
    * (GuardrailCheck job, docs/04-cdm-approach.md:438-447). Oversize rows
    * are persisted to an error sink and counted, never silently dropped.
    */
  def guardrailSplit(df: DataFrame, maxRowBytes: Long): (DataFrame, DataFrame) = {
    val flagged = Ops.guardrailFlag(df, maxRowBytes)
    (flagged.filter(!col("guardrail_oversize")).drop("guardrail_oversize"),
      flagged.filter(col("guardrail_oversize")).drop("guardrail_oversize"))
  }

  private def appendLedger(path: String, line: String): Unit = {
    val p = Paths.get(path)
    Files.createDirectories(p.getParent)
    Files.write(p, (line + "\n").getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Buckets already marked done in the ledger (trackRun resume,
    * docs/04-cdm-approach.md:422-434).
    */
  def completedBuckets(ledgerPath: String): Set[Int] =
    if (!Files.exists(Paths.get(ledgerPath))) Set.empty
    else {
      import scala.jdk.CollectionConverters._
      Files.readAllLines(Paths.get(ledgerPath)).asScala
        .filter(_.contains("\"status\":\"done\""))
        .flatMap(l => "\"bucket\":(\\d+)".r.findFirstMatchIn(l).map(_.group(1).toInt))
        .toSet
    }

  /** Run the migration bucket-by-bucket with ledgered resume. Re-running
    * after a partial failure skips completed buckets; each bucket write is
    * idempotent (overwrite of its own partition dir) — mirroring CDM's
    * "migrate is idempotent" contract (lab/exercises/04-cdm-migration.md:417).
    */
  def run(spark: SparkSession, source: DataFrame, targetDir: String,
          cfg: Config): Result = {
    require(cfg.pkCols.nonEmpty, "pkCols required for token bucketing")
    val ledger = s"$targetDir/_ledger/run.jsonl"
    val done = completedBuckets(ledger)
    val errors = spark.sparkContext.longAccumulator("migrate_errors")
    val budget = new ErrorBudget(errors, cfg.errorLimit)
    var migrated = 0L
    var skipped = 0L
    val ran = scala.collection.mutable.ArrayBuffer[Int]()
    for (b <- 0 until cfg.tokenBuckets if !done.contains(b)) {
      val t0 = System.nanoTime()
      val slice = transformOnly(source, cfg.copy(bucketRange = Some((b, b))))
      val (pass0, oversize) = cfg.guardrailMaxRowBytes match {
        case Some(max) => guardrailSplit(slice, max)
        case None => (slice, null)
      }
      val pass = cfg.maxRowsPerSecondPerPartition match {
        case Some(r) => rateLimited(pass0, r)
        case None => pass0
      }
      pass.write.mode("overwrite").parquet(s"$targetDir/bucket=$b")
      val n = spark.read.parquet(s"$targetDir/bucket=$b").count()
      val nSkip = if (oversize != null) {
        val c = oversize.count()
        if (c > 0) {
          oversize.write.mode("overwrite").parquet(s"$targetDir/_errors/bucket=$b")
          errors.add(c)
        }
        c
      } else 0L
      budget.check()
      migrated += n
      skipped += nSkip
      ran += b
      appendLedger(ledger,
        s"""{"bucket":$b,"rows":$n,"skipped":$nSkip,"millis":${(System.nanoTime() - t0) / 1000000},"status":"done"}""")
    }
    Result(migrated, skipped, ran.toSeq, ledger)
  }
}
