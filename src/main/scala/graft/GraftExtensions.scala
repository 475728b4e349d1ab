package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.{DotProduct, HashArray}

/** Engine extension point (SparkSessionExtensions): registers graft's native
  * expressions so `expr("graft_dot(a, b)")` works in any query. Activated
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard library-injection mechanism, no spark-submit flags needed.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "graft_dot takes exactly 2 array<float> arguments")
        DotProduct(args.head, args(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_hash_array"),
      new ExpressionInfo(classOf[HashArray].getName, "graft_hash_array"),
      (args: Seq[Expression]) => {
        require(args.length == 3,
          "graft_hash_array takes (array<string>, suffix, nibbles)")
        HashArray(args(0), args(1), args(2))
      }))
  }
}
