package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the HOF formulation bit-for-bit") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("embedding").as("a"),
        reverse(col("embedding")).as("b"))
    val cmp = e.select(
      expr("graft_dot(a, b)").as("native"),
      expr("""aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)),
              cast(0.0 as double), (acc, v) -> acc + v)""").as("hof"))
    assert(cmp.filter(col("native") =!= col("hof")).count() == 0)
  }

  test("graft_dot handles empty arrays and nulls") {
    val df = Seq(
      (Seq.empty[Float], Seq.empty[Float]),
      (Seq(1.0f, 2.0f), Seq(3.0f, 4.0f))).toDF("a", "b")
    val out = df.select(expr("graft_dot(a, b)").as("d")).collect().map(_.getDouble(0))
    assert(out.toSeq == Seq(0.0, 11.0))
    val withNull = df.withColumn("a", when(size(col("a")) === 0, lit(null)).otherwise(col("a")))
    val nulls = withNull.select(expr("graft_dot(a, b)").as("d")).collect()
    assert(nulls.head.isNullAt(0))
  }

  test("graft_dot participates in whole-stage codegen") {
    val e = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(expr("graft_dot(embedding, embedding)").as("d"))
    // the `*(n)` prefix marks operators inside a WholeStageCodegen span
    val plan = e.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project \[graft_dot""".r.findFirstIn(plan).isDefined,
      s"expected graft_dot inside a codegen span (*(n) prefix):\n$plan")
  }
}
