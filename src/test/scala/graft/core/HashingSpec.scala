package graft.core

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

class HashingSpec extends SparkSpec {

  private def hashOf(rows: Seq[(String, String)]): Array[String] = {
    import spark.implicits._
    val df = rows.toDF("a", "b")
    df.select(Hashing.portableRowHash(df.schema, df.columns.toSeq).as("h"))
      .collect().map(_.getString(0))
  }

  test("null and empty string hash differently (r1 advice)") {
    val Array(h1, h2) = hashOf(Seq((null, "x"), ("", "x")))
    assert(h1 != h2)
  }

  test("field-boundary injection cannot collide (length prefixing)") {
    // ("a|b", "c") vs ("a", "b|c") — same naive concat, must differ
    val Array(h1, h2) = hashOf(Seq(("a|b", "c"), ("a", "b|c")))
    assert(h1 != h2)
  }

  test("NaN, +Inf, -Inf and large doubles hash distinctly") {
    import spark.implicits._
    val df = Seq(Double.NaN, Double.PositiveInfinity, Double.NegativeInfinity,
      1e30, -1e30, 0.0).toDF("d")
    val hs = df.select(Hashing.portableRowHash(df.schema, Seq("d")).as("h"))
      .collect().map(_.getString(0))
    assert(hs.distinct.length == hs.length)
  }

  test("hash is column-order independent (sorted by name)") {
    import spark.implicits._
    val ab = Seq(("x", "y")).toDF("a", "b")
    val ba = Seq(("y", "x")).toDF("b", "a")
    val h1 = ab.select(Hashing.portableRowHash(ab.schema, Seq("a", "b"))).collect().head.getString(0)
    val h2 = ba.select(Hashing.portableRowHash(ba.schema, Seq("b", "a"))).collect().head.getString(0)
    assert(h1 == h2)
  }

  test("timestamp NTZ and timestamp render as identical epoch micros") {
    val df = spark.sql(
      "SELECT TIMESTAMP'2024-01-15 00:00:00' AS t, TIMESTAMP_NTZ'2024-01-15 00:00:00' AS n")
    val c1 = df.select(Hashing.canonical("t", TimestampType).as("c")).collect().head.getString(0)
    val c2 = df.select(Hashing.canonical("n", TimestampNTZType).as("c")).collect().head.getString(0)
    assert(c1 == c2)
  }
}
