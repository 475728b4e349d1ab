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

  /** Canonical string form of one column, stable across Spark and DuckDB.
    * NaN/Infinity/huge doubles are rendered explicitly: a decimal cast of
    * |x| ≥ 1e22 throws under ANSI mode (Spark 4 default) and would
    * otherwise collapse to null; printf-style %e rendering is identical in
    * both engines for the out-of-decimal-range tail.
    */
  def canonical(name: String, dt: DataType): Column = dt match {
    case DoubleType | FloatType =>
      val c = col(name).cast(DoubleType)
      when(isnan(c), lit("NaN"))
        .when(c === Double.PositiveInfinity, lit("Inf"))
        .when(c === Double.NegativeInfinity, lit("-Inf"))
        .when(abs(c) >= 1e21, format_string("%.6e", c))
        .otherwise(c.cast(DecimalType(28, 6)).cast(StringType))
    case TimestampType =>
      // micros-since-epoch renders identically everywhere
      expr(s"cast(unix_micros(`$name`) as string)")
    case TimestampNTZType =>
      // session runs in UTC, so the cast preserves the wall clock and the
      // result matches DuckDB's epoch_us on the same parquet value
      expr(s"cast(unix_micros(cast(`$name` as timestamp)) as string)")
    case _ => col(name).cast(StringType)
  }

  /** md5 over length-prefixed canonical fields. Length-prefixing
    * (`len:value`) makes the encoding self-delimiting, so a literal
    * delimiter inside a value cannot collide with a field boundary; nulls
    * render as chr(1), distinct from the empty string (which is `0:`).
    */
  def portableRowHash(schema: StructType, cols: Seq[String]): Column = {
    val parts = cols.sorted.map { c =>
      val canon = canonical(c, schema(c).dataType)
      coalesce(concat(length(canon).cast(StringType), lit(":"), canon),
               lit("\u0001"))
    }
    md5(concat(parts: _*))
  }

  /** Engine-internal 64-bit row hash (whole-stage-codegen friendly).
    *
    * Null columns are a structural trap: Spark's xxhash64 SKIPS null
    * children (the running seed passes through unchanged), so without
    * anchoring, rows that differ only in WHICH column holds a null hash
    * identically with probability 1 — e.g. (a="x", b=null) vs (a=null,
    * b="x"). Interleaving each column with its ordinal literal pins every
    * value to its position: the ordinals always fold, so the two rows above
    * fold [0, "x", 1] vs [0, 1, "x"] and diverge.
    */
  def fastRowHash(cols: Seq[String]): Column = {
    val anchored = cols.sorted.zipWithIndex.flatMap {
      case (c, i) => Seq(lit(i), col(c))
    }
    xxhash64(anchored: _*)
  }
}
