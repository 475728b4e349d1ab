package graft.core

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Z-order layout contracts: the Morton interleave itself, the
  * exchange/sort plan shape, and the point of the whole exercise — a
  * box filter over a z-laid-out table touches a fraction of the files a
  * naturally-laid-out table does.
  */
class ZorderSpec extends SparkSpec {
  import spark.implicits._

  test("zValue interleaves bits (a on even positions, b on odd)") {
    // a=3 (0011), b=5 (0101): bits -> z0(a0=1) z1(b0=1) z2(a1=1) z5(b2=1)
    // = 1 + 2 + 4 + 32 = 39
    val got = Seq((3L, 5L)).toDF("a", "b")
      .select(Ops.zValue(col("a"), col("b")).as("z")).head().getLong(0)
    assert(got == 39L, s"z(3, 5) = $got, want 39")
    // order matters: z(b, a) is a different curve position
    val swapped = Seq((5L, 3L)).toDF("a", "b")
      .select(Ops.zValue(col("a"), col("b")).as("z")).head().getLong(0)
    assert(swapped == 27L, s"z(5, 3) = $swapped, want 27")
  }

  test("zorderLayout plans one range exchange + partition-local sort, no global sort") {
    val df = spark.range(1000).select(
      (col("id") % 100).as("x"), (col("id") / 100).as("y"))
    // string-level checks: under AQE the top node is AdaptiveSparkPlan,
    // whose pre-execution children are not exposed to plan.collect
    val plan = Ops.zorderLayout(df, col("x"), col("y"), 4)
      .queryExecution.executedPlan.toString
    assert(plan.toLowerCase.contains("rangepartitioning"),
      s"expected a range exchange:\n$plan")
    // SortExec renders as "Sort [keys], <global>, <offset>"
    val sortFlags = "Sort \\[.*\\], (true|false), ".r
      .findAllMatchIn(plan).map(_.group(1)).toList
    assert(sortFlags.nonEmpty && sortFlags.forall(_ == "false"),
      s"sorts must be partition-local (never a global sort):\n$plan")
  }

  test("box filter touches a fraction of z-ordered files vs the natural layout") {
    // 100x100 grid, one row per cell, ids in row-major order — the natural
    // layout spreads every y-stripe across all files; the z layout packs
    // the (x, y) box into few
    val grid = spark.range(10000).select(
      col("id"),
      (col("id") % 100).cast("long").as("x"),
      (col("id") / 100).cast("long").as("y"))
    val base = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    grid.repartition(8).write.parquet(s"$base/natural")
    Ops.zorderLayout(grid, col("x"), col("y"), 8)
      .write.parquet(s"$base/zorder")
    def filesTouched(path: String): Long =
      spark.read.parquet(path)
        .filter(col("x").between(10, 19) && col("y").between(10, 19))
        .select(input_file_name()).distinct().count()
    val natural = filesTouched(s"$base/natural")
    val zed = filesTouched(s"$base/zorder")
    // the 1%-of-space box lives in ~1% of the z range; round-robin spreads
    // it over every file
    assert(natural >= 7, s"natural layout should spread the box: $natural files")
    assert(zed <= 2, s"z layout should cluster the box: $zed files")
    // both layouts return identical rows — layout is not allowed to lose data
    val a = spark.read.parquet(s"$base/natural").orderBy("id").collect().toSeq
    val b = spark.read.parquet(s"$base/zorder").orderBy("id").collect().toSeq
    assert(a == b)
  }
}
