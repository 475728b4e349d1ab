package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expression for the embedding dot product (north-star
  * similarity ops). Spark's generic route — `aggregate(zip_with(a, b, …))` —
  * evaluates interpreted (higher-order functions never enter codegen) and
  * allocates a zipped array per row; this expression generates a tight
  * primitive loop inside whole-stage codegen.
  *
  * Semantics match the HOF form exactly: each element is widened to double
  * BEFORE multiply, accumulation runs in array order — so results are
  * bit-identical to the `zip_with`/`aggregate` formulation and to the DuckDB
  * oracle's `list_dot_product` on DOUBLE[] casts. Accepts float or double
  * arrays on either side (IVF centroids are double, raw embeddings float).
  *
  * Registered as `graft_dot(a, b)` by [[graft.GraftExtensions]]
  * (SparkSessionExtensions.injectFunction).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  // AbstractDataType (ExpectsInputTypes) is private[sql]; check types directly
  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_dot requires array<float|double> args, got (${left.dataType}, ${right.dataType})")
    }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  private def get(xs: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => xs.getFloat(i).toDouble
    case _ => xs.getDouble(i)
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val (lt, rt) = (elemType(left).get, elemType(right).get)
    val n = math.min(xs.numElements(), ys.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += get(xs, i, lt) * get(ys, i, rt)
      i += 1
    }
    acc
  }

  private def getter(t: DataType, arr: String, i: String): String = t match {
    case FloatType => s"((double) $arr.getFloat($i))"
    case _ => s"$arr.getDouble($i)"
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val (lt, rt) = (elemType(left).get, elemType(right).get)
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(lt, a, i)} * ${getter(rt, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}
