package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** `graft_might_contain(bloom_bytes, value)` — membership probe against a
  * serialized [[org.apache.spark.util.sketch.BloomFilter]], usable as a
  * corpus-side prefilter when the set being tested against is too large to
  * broadcast as a join side (benchmark decontamination at 100 TB: an eval
  * suite of 10^8 distinct n-grams is ~100 MB as a 1%-fpp bloom vs many GBs
  * as a hash-join build side).
  *
  * The bloom bytes MUST be foldable (a literal): the filter is deserialized
  * once per expression instance — on the driver at codegen time, where it is
  * installed as a codegen reference object, so executors receive it through
  * the broadcast task binary exactly like Spark's own injected runtime
  * filters (`BloomFilterMightContain`), NOT re-parsed per row or shipped per
  * task closure.
  *
  * String probes hash the value's UTF-8 bytes (`mightContainBinary`), which
  * is bit-identical to a build side that inserted via `putBinary(utf8)`;
  * long probes use `mightContainLong`. False positives only — a `true` here
  * still needs the exact verify join downstream; `false` is definitive, so
  * filtering on this expression never drops a real match.
  */
case class BloomMightContain(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType != BinaryType)
      TypeCheckResult.TypeCheckFailure(
        s"graft_might_contain needs serialized bloom bytes (binary) first, got ${left.dataType}")
    else if (!left.foldable)
      TypeCheckResult.TypeCheckFailure(
        "graft_might_contain bloom bytes must be a literal (foldable)")
    else right.dataType match {
      case _: StringType | LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"graft_might_contain probes string or bigint values, got $t")
    }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_might_contain"

  // Deserialized once per instance; the driver evaluates the foldable left
  // child, executors get the object via the codegen references array.
  @transient private lazy val bloom: BloomFilter =
    left.eval(null) match {
      case null => null
      case bytes => BloomFilter.readFrom(
        new ByteArrayInputStream(bytes.asInstanceOf[Array[Byte]]))
    }

  override def nullSafeEval(bloomBytes: Any, value: Any): Any = {
    if (bloom == null) return null
    right.dataType match {
      case _: StringType =>
        bloom.mightContainBinary(value.asInstanceOf[UTF8String].getBytes)
      case _ => bloom.mightContainLong(value.asInstanceOf[Long])
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (bloom == null) {
      val code = org.apache.spark.sql.catalyst.expressions.Literal
        .create(null, BooleanType).genCode(ctx)
      return ev.copy(code = code.code, isNull = code.isNull, value = code.value)
    }
    val bloomRef = ctx.addReferenceObj("graftBloom", bloom, classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, (_, v) => right.dataType match {
      case _: StringType => s"${ev.value} = $bloomRef.mightContainBinary($v.getBytes());"
      case _ => s"${ev.value} = $bloomRef.mightContainLong($v);"
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContain =
    copy(left = newLeft, right = newRight)
}
