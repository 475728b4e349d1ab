package graft

import org.apache.spark.sql.SparkSessionExtensions
import graft.functions.GraftFunctions

/** Engine extension point (SparkSessionExtensions): registers graft's native
  * expressions so `expr("graft_dot(a, b)")` works in any query. Activated
  * with `.config("spark.sql.extensions", "graft.GraftExtensions")` — the
  * standard library-injection mechanism, no spark-submit flags needed.
  *
  * Sessions built *without* this conf still work: query closures invoke
  * [[graft.functions.GraftFunctions.ensure]] as a runtime fallback, which
  * installs the same builders into the session's FunctionRegistry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.all.foreach(ext.injectFunction)
}
