package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import java.nio.file.Files

/** CSV/JSON round-trips must survive hostile values — quotes, the
  * delimiter inside a value, embedded newlines, nulls, empty strings —
  * the option surface COPY/DSBulk document (docs/02-native-tooling.md:328-358).
  */
class IoRoundTripSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("s", StringType),
    StructField("d", DoubleType)))

  private val hostile = Seq(
    (1L, "plain", 1.5),
    (2L, "has|pipe", -0.25),
    (3L, "has\"quote", 1e-10),
    (4L, "has\nnewline", 12345.678),
    (5L, null.asInstanceOf[String], Double.MaxValue),
    (6L, "", 0.0),
    (7L, "ends with space ", -1.7976931348623157e308))

  test("CSV round-trip preserves hostile values (quote/escape/multiline)") {
    val dir = Files.createTempDirectory("graft-csv").toString
    val df = hostile.toDF("id", "s", "d")
    // the CSV WRITER trims cell whitespace by default — disable explicitly
    df.write.mode("overwrite")
      .option("header", "true").option("delimiter", "|")
      .option("escape", "\"").option("multiLine", "true")
      .option("ignoreLeadingWhiteSpace", "false")
      .option("ignoreTrailingWhiteSpace", "false")
      .csv(dir)
    val back = spark.read.schema(schema)
      .option("header", "true").option("delimiter", "|")
      .option("escape", "\"").option("multiLine", "true")
      .csv(dir)
    // CSV cannot distinguish null from empty string (documented COPY
    // limitation) — normalize both sides to null for the compare
    def norm(x: org.apache.spark.sql.DataFrame) =
      x.withColumn("s", when(col("s") === "", lit(null)).otherwise(col("s")))
    assert(norm(back).exceptAll(norm(df)).isEmpty &&
      norm(df).exceptAll(norm(back)).isEmpty)
  }

  test("JSON round-trip preserves hostile values exactly (incl. null vs empty)") {
    val dir = Files.createTempDirectory("graft-json").toString
    val df = hostile.toDF("id", "s", "d")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.schema(schema).json(dir)
    assert(back.exceptAll(df).isEmpty && df.exceptAll(back).isEmpty)
  }

  test("small_files_report: the measured layout equals the closed form — " +
       "ceil(rows/100) files per lang, 100-row rolls, remainder last") {
    val rep = graft.SparkEntry.queries("small_files_report")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    val src = spark.read.parquet(s"${sf()}/documents.parquet")
      .groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep.keySet == src.keySet, "every lang must be reported")
    for ((lang, n) <- src) {
      val (nFiles, nRows, maxR, minR, target, saved) = rep(lang)
      assert(nRows == n, s"$lang rows")
      assert(nFiles == (n + 99) / 100,
        s"$lang: measured $nFiles files, expected ceil($n/100)")
      assert(maxR == math.min(n, 100L), s"$lang max file rows")
      assert(minR == (if (n % 100 == 0) math.min(n, 100L) else n % 100),
        s"$lang min file rows")
      assert(target == (n + 999) / 1000 && saved == nFiles - target)
    }
  }
}
