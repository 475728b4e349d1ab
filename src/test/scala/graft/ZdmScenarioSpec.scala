package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.migrate.MigrateJob
import graft.stream.DualWrite
import graft.validate.Diff
import java.nio.file.Files

/** Capstone integration: the reference's zero-downtime migration story
  * end-to-end (docs/05-zdm-approach.md:398-436) —
  *   1. origin is live; dual-writes begin (every new write hits both sides);
  *   2. CDM-style backfill migrates the pre-existing rows to the target;
  *   3. a conflicting update arrives during backfill — last-write-wins on
  *      writetime means the newer dual-written row survives the backfilled
  *      copy (docs/04-cdm-approach.md:837-841);
  *   4. validation (count gate + full diff) declares the sides consistent.
  */
class ZdmScenarioSpec extends SparkSpec {

  test("backfill + dual-write + LWW converge to validated consistency") {
    import spark.implicits._
    val base = Files.createTempDirectory("graft-zdm").toString

    // 1. origin pre-exists with 1000 rows (writetime 100)
    val preExisting = spark.range(1000).select(
      col("id").as("pk"),
      concat(lit("v"), col("id")).as("payload"),
      lit(100L).as("writetime"))
    preExisting.write.parquet(s"$base/origin")

    // 2. dual-write phase: 50 NEW rows + 20 UPDATES of existing keys, all
    //    newer than the backfill epoch — land on both sides
    val live = spark.range(1000, 1050).select(
        col("id").as("pk"), concat(lit("new"), col("id")).as("payload"),
        lit(200L).as("writetime"))
      .unionByName(spark.range(0, 20).select(
        col("id").as("pk"), concat(lit("updated"), col("id")).as("payload"),
        lit(200L).as("writetime")))
    DualWrite.dualWriteBatch(live, s"$base/origin", s"$base/target")

    // 3. backfill: migrate the pre-existing origin snapshot to the target
    //    (arrives AFTER the live updates, like a slow CDM run)
    MigrateJob.run(spark, preExisting, s"$base/target_backfill",
      MigrateJob.Config(pkCols = Seq("pk"), tokenBuckets = 4))
    val backfilled = spark.read.parquet(s"$base/target_backfill/bucket=*")

    // 4. target state = LWW merge of backfill + dual-written rows: an
    //    updated key keeps the writetime-200 live row, not the backfill copy
    val target = Diff.lwwMerge(
      spark.read.parquet(s"$base/target").unionByName(backfilled),
      Seq("pk"), "writetime", Seq("payload"))
    val origin = Diff.lwwMerge(
      spark.read.parquet(s"$base/origin"),
      Seq("pk"), "writetime", Seq("payload"))

    // count gate (validate_migration.py:28-39)
    assert(origin.count() == 1050 && target.count() == 1050)
    // updated keys carry the live payload on BOTH sides
    assert(target.filter(col("pk") < 20 && !col("payload").startsWith("updated")).count() == 0)
    // full-diff gate: everything valid
    val rep = Diff.report(origin, target, Seq("pk"), Seq("payload", "writetime"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rep == Map("valid" -> 1050L), s"diff classes: $rep")
  }
}
