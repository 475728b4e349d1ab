package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, AggregateFunc, CountStar, Max, Min}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}

/** Minimal DataSource V2 table proving the CONNECTOR SEAM's pushdown
  * contract (r12 VERDICT item 4): the CDM origin read must arrive at the
  * source already sliced and filtered — token-range predicates, the
  * writetime floor, and the column subset cross INTO the scan instead of
  * running as post-scan Spark operators (reference:
  * docs/04-cdm-approach.md:290-327 — CDM's numParts/token-range and
  * writetime filters are CQL-side, and the Spark Cassandra Connector
  * performs the same predicate/projection pushdown for its `token()` and
  * regular columns).
  *
  * The table is a deterministic synthetic "cluster": `rows` rows where
  * row i carries
  *   - `id`  = i (the PK),
  *   - `tok` = Knuth-hash(i) & Long.MaxValue — the partitioner TOKEN the
  *     connector exposes for range slicing,
  *   - `wt`  = WriteTimeBase + i (micros — monotone, so writetime floors
  *     also prune whole input slices),
  *   - `payload` = "p<i>".
  *
  * What it implements (the exact interfaces the production connector
  * uses): [[SupportsPushDownFilters]] — comparison predicates on the
  * three long columns are ACCEPTED (returned residual-free) and applied
  * INSIDE the row generator, so a claimed pushdown that failed to filter
  * would produce wrong rows, not just a bad plan;
  * [[SupportsPushDownRequiredColumns]] — the reader materializes only the
  * pruned schema. Input slices are id-ranges (the storage order);
  * [[GraftRangeBatch.planInputPartitions]] ELIMINATES slices whose
  * id/writetime range cannot match the pushed bounds — the source-side
  * analog of token-range partition pruning (monotone columns only; `tok`
  * predicates filter rows but keep every slice, like a hash partitioner);
  * [[SupportsPushDownAggregates]] (r13) — ungrouped COUNT(*)/MIN/MAX over
  * the long columns push COMPLETELY: the source answers in ONE computed
  * row and Spark plans no aggregate node at all — the server-side
  * `count(*)` seam CDM's row-count validation reads through
  * (docs/04-cdm-approach.md's validation counts are CQL-side for exactly
  * this reason).
  *
  * Use `spark.read.format(classOf[GraftRangeSource].getName)
  * .option("rows", n).option("slices", k).load()`. PushdownSpec pins the
  * plan AND the results; ConnectorSpec ties it into the MigrateSource
  * seam.
  */
class GraftRangeSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftRangeSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: JMap[String, String]): Table =
    new GraftRangeTable(
      properties.getOrDefault("rows", "1000").toLong,
      properties.getOrDefault("slices", "8").toInt)
}

object GraftRangeSource {
  val schema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("tok", LongType, nullable = false),
    StructField("wt", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  val WriteTimeBase = 1700000000000000L

  def tokOf(i: Long): Long = (i * 2654435761L) & Long.MaxValue
  def wtOf(i: Long): Long = WriteTimeBase + i
  def payloadOf(i: Long): String = "p" + i

  /** Value of column `name` at row index `i`; strings come back as
    * UTF8String only at materialization time.
    */
  private[sources] def valueOf(name: String, i: Long): Any = name match {
    case "id" => i
    case "tok" => tokOf(i)
    case "wt" => wtOf(i)
    case "payload" => payloadOf(i)
  }

  /** True when the source can evaluate (and therefore fully absorb) the
    * filter: comparisons against literals on the three long columns,
    * equality on payload, IsNotNull on anything (nothing here is null).
    */
  private[sources] def supported(f: Filter): Boolean = f match {
    case EqualTo(c, _: Long) if c != "payload" => true
    case EqualTo("payload", _: String) => true
    case GreaterThan(c, _: Long) if c != "payload" => true
    case GreaterThanOrEqual(c, _: Long) if c != "payload" => true
    case LessThan(c, _: Long) if c != "payload" => true
    case LessThanOrEqual(c, _: Long) if c != "payload" => true
    case IsNotNull(_) => true
    case And(l, r) => supported(l) && supported(r)
    case _ => false
  }

  private[sources] def eval(f: Filter, i: Long): Boolean = f match {
    case EqualTo("payload", v: String) => payloadOf(i) == v
    case EqualTo(c, v: Long) => valueOf(c, i).asInstanceOf[Long] == v
    case GreaterThan(c, v: Long) => valueOf(c, i).asInstanceOf[Long] > v
    case GreaterThanOrEqual(c, v: Long) => valueOf(c, i).asInstanceOf[Long] >= v
    case LessThan(c, v: Long) => valueOf(c, i).asInstanceOf[Long] < v
    case LessThanOrEqual(c, v: Long) => valueOf(c, i).asInstanceOf[Long] <= v
    case IsNotNull(_) => true
    case And(l, r) => eval(l, i) && eval(r, i)
    case _ => true // unsupported filters are residual — Spark re-applies them
  }

  /** Row-index bounds implied by pushed filters on the two MONOTONE
    * columns (id = i, wt = base + i) — what slice elimination prunes by.
    * `tok` is non-monotone (hash) and never narrows the range.
    */
  private[sources] def indexBounds(fs: Seq[Filter], n: Long): (Long, Long) = {
    var lo = 0L
    var hi = n - 1
    def narrow(f: Filter): Unit = f match {
      case EqualTo("id", v: Long) => lo = math.max(lo, v); hi = math.min(hi, v)
      case GreaterThan("id", v: Long) => lo = math.max(lo, v + 1)
      case GreaterThanOrEqual("id", v: Long) => lo = math.max(lo, v)
      case LessThan("id", v: Long) => hi = math.min(hi, v - 1)
      case LessThanOrEqual("id", v: Long) => hi = math.min(hi, v)
      case EqualTo("wt", v: Long) =>
        lo = math.max(lo, v - WriteTimeBase); hi = math.min(hi, v - WriteTimeBase)
      case GreaterThan("wt", v: Long) => lo = math.max(lo, v - WriteTimeBase + 1)
      case GreaterThanOrEqual("wt", v: Long) => lo = math.max(lo, v - WriteTimeBase)
      case LessThan("wt", v: Long) => hi = math.min(hi, v - WriteTimeBase - 1)
      case LessThanOrEqual("wt", v: Long) => hi = math.min(hi, v - WriteTimeBase)
      case And(l, r) => narrow(l); narrow(r)
      case _ => ()
    }
    fs.foreach(narrow)
    (lo, hi)
  }
}

class GraftRangeTable(rows: Long, slices: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_range($rows)"
  override def schema(): StructType = GraftRangeSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftRangeScanBuilder(rows, slices)
}

class GraftRangeScanBuilder(rows: Long, slices: Int)
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = GraftRangeSource.schema
  private var agg: Option[Aggregation] = None

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(GraftRangeSource.supported)
    pushed = ok
    residual // Spark evaluates these post-scan; we absorb the rest fully
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** One long column behind a supported aggregate, or None. */
  private def aggCol(f: AggregateFunc): Option[String] = f match {
    case _: CountStar => Some("")
    case m: Min => m.column() match {
      case nr: NamedReference if nr.fieldNames().length == 1 &&
        nr.fieldNames()(0) != "payload" => Some(nr.fieldNames()(0))
      case _ => None
    }
    case m: Max => m.column() match {
      case nr: NamedReference if nr.fieldNames().length == 1 &&
        nr.fieldNames()(0) != "payload" => Some(nr.fieldNames()(0))
      case _ => None
    }
    case _ => None
  }

  private def canPush(a: Aggregation): Boolean =
    a.groupByExpressions().isEmpty &&
      a.aggregateExpressions().nonEmpty &&
      a.aggregateExpressions().forall(aggCol(_).isDefined)

  /** Global COUNT(*)/MIN/MAX answer in ONE source-computed row — the
    * server-side-aggregation seam (the production connector ships
    * `count(*)` / writetime extremes to CQL the same way; CDM's
    * row-count validation is exactly this read). Complete pushdown:
    * Spark plans NO aggregate node over the scan.
    */
  override def supportCompletePushDown(a: Aggregation): Boolean = canPush(a)

  override def pushAggregation(a: Aggregation): Boolean =
    if (!canPush(a)) false
    else {
      agg = Some(a)
      required = StructType(a.aggregateExpressions().zipWithIndex.map {
        case (_: CountStar, i) => StructField(s"agg_$i", LongType, nullable = false)
        case (f, i) => StructField(s"agg_$i", LongType, nullable = true)
      })
      true
    }

  override def build(): Scan = new GraftRangeScan(rows, slices, pushed, required, agg)
}

class GraftRangeScan(rows: Long, slices: Int,
                     val pushed: Array[Filter], val required: StructType,
                     val agg: Option[Aggregation] = None)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftRangeScan(rows=$rows, pushed=[${pushed.mkString(", ")}], " +
      s"cols=[${required.fieldNames.mkString(",")}]" +
      agg.map(a => s", pushedAggregates=[${a.aggregateExpressions()
        .map(_.toString).mkString(", ")}]").getOrElse("") + ")"

  /** Slice elimination: id-sliced partitions outside the pushed
    * id/writetime bounds never materialize — 0 tasks, 0 rows, like the
    * connector skipping token ranges outside partition.min/max. A pushed
    * aggregation collapses the plan to ONE partition producing ONE row —
    * the aggregate travels, not the data.
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = GraftRangeSource.indexBounds(pushed.toSeq, rows)
    if (agg.isDefined)
      return Array(GraftRangePartition(math.max(0L, lo), math.min(rows, hi + 1)))
    val per = math.max(1L, (rows + slices - 1) / slices)
    (0 until slices).iterator
      .map(s => GraftRangePartition(s * per, math.min((s + 1) * per, rows)))
      .filter(p => p.start < p.end && p.end - 1 >= lo && p.start <= hi)
      .toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    agg match {
      case Some(a) => new GraftRangeAggReaderFactory(pushed, a)
      case None => new GraftRangeReaderFactory(pushed, required)
    }
}

final case class GraftRangePartition(start: Long, end: Long) extends InputPartition

/** Source-side aggregate evaluation over the (already filter-absorbed)
  * index range: one pass, one emitted row. MIN/MAX over an empty match set
  * surface as SQL nulls, COUNT as 0 — the semantics Spark expects from a
  * completely-pushed global aggregate.
  */
class GraftRangeAggReaderFactory(pushed: Array[Filter], agg: Aggregation)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = !emitted
      override def get(): InternalRow = {
        emitted = true
        val fns = agg.aggregateExpressions()
        var n = 0L
        val mins = Array.fill[Long](fns.length)(Long.MaxValue)
        val maxs = Array.fill[Long](fns.length)(Long.MinValue)
        var i = part.start
        while (i < part.end) {
          if (pushed.forall(GraftRangeSource.eval(_, i))) {
            n += 1
            var k = 0
            while (k < fns.length) {
              fns(k) match {
                case m: Min =>
                  val c = m.column().asInstanceOf[NamedReference].fieldNames()(0)
                  val v = GraftRangeSource.valueOf(c, i).asInstanceOf[Long]
                  if (v < mins(k)) mins(k) = v
                case m: Max =>
                  val c = m.column().asInstanceOf[NamedReference].fieldNames()(0)
                  val v = GraftRangeSource.valueOf(c, i).asInstanceOf[Long]
                  if (v > maxs(k)) maxs(k) = v
                case _ => ()
              }
              k += 1
            }
          }
          i += 1
        }
        new GenericInternalRow(fns.zipWithIndex.map {
          case (_: CountStar, _) => n: Any
          case (_: Min, k) => if (n == 0) null else (mins(k): Any)
          case (_: Max, k) => if (n == 0) null else (maxs(k): Any)
          case _ => null
        })
      }
      override def close(): Unit = ()
    }
  }
}

class GraftRangeReaderFactory(pushed: Array[Filter], required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[GraftRangePartition]
    new PartitionReader[InternalRow] {
      private var i = part.start - 1
      private val cols = required.fieldNames
      override def next(): Boolean = {
        i += 1
        // the reader APPLIES every accepted filter — the pushdown claim is
        // load-bearing for correctness, not cosmetic plan text
        while (i < part.end && !pushed.forall(GraftRangeSource.eval(_, i))) i += 1
        i < part.end
      }
      override def get(): InternalRow =
        new GenericInternalRow(cols.map {
          case "payload" => UTF8String.fromString(GraftRangeSource.payloadOf(i))
          case c => GraftRangeSource.valueOf(c, i)
        }.asInstanceOf[Array[Any]])
      override def close(): Unit = ()
    }
  }
}
