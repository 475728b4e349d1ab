package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Bounded top-k buffer: keeps the k best (score desc, id asc) pairs seen.
  * Plain insertion into a sorted array — k is small (single digits for kNN),
  * so linear insertion beats heap constant factors and keeps serialization
  * trivial.
  */
final class TopKBuffer(val k: Int) {
  // ordered best-first: scores desc, ties id asc
  val scores = new Array[Double](k)
  val ids = new Array[Long](k)
  var size = 0

  // java.lang.Double.compare, not primitive >/==: Spark's sort order ranks
  // NaN GREATER than every double (and a primitive NaN comparison is
  // always false, which would both mis-rank NaN and break the id tiebreak
  // between two NaNs)
  private def better(s: Double, id: Long, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && id < ids(i))
  }

  def insert(s0: Double, id: Long): Unit = {
    // normalize -0.0 to 0.0 (Double.compare splits them; Spark's sort does
    // not — NormalizeFloatingNumbers runs before every SQL comparison)
    val s = if (s0 == 0.0) 0.0 else s0
    if (size == k && !better(s, id, k - 1)) return
    var i = math.min(size, k - 1)
    while (i > 0 && better(s, id, i - 1)) {
      scores(i) = scores(i - 1); ids(i) = ids(i - 1); i -= 1
    }
    scores(i) = s; ids(i) = id
    if (size < k) size += 1
  }

  def mergeFrom(o: TopKBuffer): Unit = {
    var i = 0
    while (i < o.size) { insert(o.scores(i), o.ids(i)); i += 1 }
  }
}

/** `graft_topk(score, id, k)` → `array<struct<id:bigint, score:double>>`,
  * the k best (score desc, ties id asc) rows of the group — the aggregate
  * form of `row_number() OVER (PARTITION BY g ORDER BY score DESC, id)
  * <= k`.
  *
  * Why it exists: the window form materializes and SORTS every candidate
  * row after shuffling them all on the group key — for a kNN join that is
  * the full pairwise set (|group| ≈ bucket size, e.g. 10^9 rows at 1M
  * vectors). As a [[TypedImperativeAggregate]] this evicts down to k
  * entries INSIDE the map task (partial aggregation), so the shuffle
  * carries #groups × k rows instead of every pair — the map-side-combine
  * posture that survives a 1000-executor scale-up.
  *
  * Null scores/ids are skipped (a null cosine cannot rank); NaN ranks
  * first and -0.0 ties 0.0, matching Spark's sort order. Ids may be int or
  * bigint (the output id widens to bigint). `k` must be a foldable int in
  * [1, 10000] (it sizes the fixed buffer).
  */
case class TopKPairs(
    score: Expression, id: Expression, kExpr: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuffer] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Int]

  override def children: Seq[Expression] = Seq(score, id, kExpr)

  override def checkInputDataTypes(): TypeCheckResult =
    (score.dataType, id.dataType, kExpr.dataType) match {
      case (DoubleType, IntegerType | LongType, IntegerType) if kExpr.foldable =>
        val kv = kExpr.eval()
        if (kv == null || kv.asInstanceOf[Int] < 1 || kv.asInstanceOf[Int] > 10000)
          TypeCheckResult.TypeCheckFailure(
            s"graft_topk k must be in [1, 10000], got $kv")
        else TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"graft_topk requires (double, int|bigint, foldable int), got $other")
    }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("score", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_topk"

  override def createAggregationBuffer(): TopKBuffer = new TopKBuffer(k)

  override def update(b: TopKBuffer, input: InternalRow): TopKBuffer = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null)
      b.insert(s.asInstanceOf[Double], i.asInstanceOf[Number].longValue)
    b
  }

  override def merge(b: TopKBuffer, o: TopKBuffer): TopKBuffer = {
    b.mergeFrom(o); b
  }

  override def eval(b: TopKBuffer): Any = {
    val out = new Array[Any](b.size)
    var i = 0
    while (i < b.size) {
      out(i) = InternalRow(b.ids(i), b.scores(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: TopKBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream(8 + 16 * b.size)
    val out = new DataOutputStream(bos)
    out.writeInt(b.size)
    var i = 0
    while (i < b.size) {
      out.writeDouble(b.scores(i)); out.writeLong(b.ids(i)); i += 1
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val b = new TopKBuffer(k)
    var i = 0
    // entries arrive best-first; insert preserves order
    while (i < n) { b.insert(in.readDouble(), in.readLong()); i += 1 }
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TopKPairs =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TopKPairs =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): TopKPairs =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}
