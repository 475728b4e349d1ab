package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Row-content hashing for validation, mirroring the reference's MD5-of-
  * sorted-(field,value) row hash (reference:
  * lab/exercises/06-validation-monitoring.md:95-98). Two tiers:
  *
  *  - [[fastRowHash]]: xxhash64 over the raw columns — codegen'd, cheap,
  *    engine-internal (used by diff hot paths where both sides are Spark).
  *  - [[portableRowHash]]: md5 over a canonical string rendering that other
  *    engines (the DuckDB oracle) reproduce bit-for-bit. Floating columns are
  *    rendered through an explicit decimal cast because double→string
  *    formatting is engine-specific.
  *
  * Column order is made deterministic by sorting names, mirroring the
  * reference's `sorted(row._asdict().items())`.
  */
object Hashing {

  /** Canonical string form of one column, stable across Spark and DuckDB. */
  def canonical(name: String, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      col(name).cast(DecimalType(28, 6)).cast(StringType)
    case TimestampType =>
      // micros-since-epoch renders identically everywhere
      expr(s"cast(unix_micros(`$name`) as string)")
    case _ => col(name).cast(StringType)
  }

  /** md5(concat_ws('|', sorted canonical columns)); nulls render as chr(1)
    * so (null,"") and ("",null) differ — concat_ws drops nulls silently.
    */
  def portableRowHash(schema: StructType, cols: Seq[String]): Column = {
    val parts = cols.sorted.map { c =>
      val dt = schema(c).dataType
      coalesce(canonical(c, dt), lit(""))
    }
    md5(concat_ws("|", parts: _*))
  }

  /** Engine-internal 64-bit row hash (whole-stage-codegen friendly). */
  def fastRowHash(cols: Seq[String]): Column =
    xxhash64(cols.sorted.map(col): _*)
}
