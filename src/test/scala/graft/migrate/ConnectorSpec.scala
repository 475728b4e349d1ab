package graft.migrate

import org.apache.spark.sql.functions._
import graft.SparkSpec
import java.nio.file.Files

/** The Cassandra-facing seam (Connector.scala): the parquet double must
  * drive the WHOLE MigrateJob contract (migrate + resume + ledger), the
  * cdm.properties → connector option mapping must be exactly the public
  * option names, and the seam must not widen the pipeline's plan.
  */
class ConnectorSpec extends SparkSpec {
  private lazy val orders = spark.read.parquet(s"${sf()}/orders.parquet")

  private def tmp(): String =
    Files.createTempDirectory("graft-connector").toString

  test("migrate runs end-to-end through the ParquetSource/ParquetBucketSink seam") {
    val srcDir = tmp() + "/src"
    orders.write.parquet(srcDir)
    val dir = tmp() + "/out"
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"),
      columnsToExclude = Seq("o_orderpriority"))
    val res = MigrateJob.run(spark, ParquetSource(srcDir), ParquetBucketSink(dir), cfg)
    assert(res.migrated == orders.count())
    assert(spark.read.parquet(dir).count() == orders.count())
    assert(res.ledgerPath == s"$dir/_ledger/run.jsonl")
    // resume through the seam: every bucket ledgered done → nothing re-runs
    val second = MigrateJob.run(spark, ParquetSource(srcDir), ParquetBucketSink(dir), cfg)
    assert(second.buckets.isEmpty && second.migrated == 0L)
  }

  test("the back-compat run(df, targetDir) overload is the same seam") {
    val dir = tmp()
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"))
    val res = MigrateJob.run(spark, orders, dir, cfg)
    assert(res.migrated == orders.count())
    assert(res.ledgerPath == ParquetBucketSink(dir).ledgerPath)
  }

  test("cdm.properties knobs map to the public connector option names") {
    val t = CassandraTable("training", "users",
      fetchSizeInRows = 5000, splitSizeInMB = 128,
      batchSizeRows = Some(1), ignoreNulls = true,
      ttlSeconds = Some(86400L), writetimeMicros = Some(1700000000000000L))
    assert(t.readOptions == Map(
      "keyspace" -> "training",
      "table" -> "users",
      "spark.cassandra.input.fetch.sizeInRows" -> "5000",
      "spark.cassandra.input.split.sizeInMB" -> "128"))
    assert(t.writeOptions == Map(
      "keyspace" -> "training",
      "table" -> "users",
      "spark.cassandra.output.ignoreNulls" -> "true",
      "spark.cassandra.output.batch.size.rows" -> "1",
      "spark.cassandra.output.ttl" -> "86400",
      "spark.cassandra.output.timestamp" -> "1700000000000000"))
    assert(CassandraConnector.Format == "org.apache.spark.sql.cassandra")
    // optional knobs absent by default — no stray options sent to the driver
    val bare = CassandraTable("ks", "tbl")
    assert(!bare.writeOptions.keySet.exists(_.contains("ttl")))
    assert(!bare.writeOptions.keySet.exists(_.contains("timestamp")))
    assert(!bare.writeOptions.keySet.exists(_.contains("batch")))
  }

  test("fromKeyspaceTable parses CDM's keyspaceTable form and rejects junk") {
    val t = CassandraTable.fromKeyspaceTable("myapp.users")
    assert(t.keyspace == "myapp" && t.table == "users")
    // a dotted table name keeps everything after the FIRST dot
    assert(CassandraTable.fromKeyspaceTable("ks.a.b").table == "a.b")
    for (bad <- Seq("nodot", ".tbl", "ks."))
      intercept[IllegalArgumentException] {
        CassandraTable.fromKeyspaceTable(bad)
      }
  }

  test("the seam pipeline stays narrow: source read → transform has no exchange") {
    val srcDir = tmp() + "/src"
    orders.write.parquet(srcDir)
    val cfg = MigrateJob.Config(pkCols = Seq("o_orderkey"),
      columnsToExclude = Seq("o_orderpriority"),
      writetimeCol = Some("o_orderdate_us"), writetimeIncrementBy = 5L)
    val df = MigrateJob.transformOnly(
      ParquetSource(srcDir).read(spark)
        .withColumn("o_orderdate_us", unix_micros(col("o_orderdate").cast("timestamp"))),
      cfg)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"seam pipeline must stay narrow:\n$plan")
  }

  test("CassandraSink: clearWave no-ops (upsert idempotency), errors land in errorDir") {
    import spark.implicits._
    val errDir = tmp() + "/errs"
    val sink = CassandraSink(CassandraTable("ks", "tbl"), tmp() + "/ledger", errDir)
    sink.clearWave(spark, Seq(0, 1, 2)) // must not throw or touch anything
    assert(sink.ledgerPath.endsWith("/run.jsonl"))
    val flagged = Seq((1L, "big", 0), (2L, "big", 1)).toDF("k", "v", "bucket")
    sink.writeErrors(flagged, Seq(0, 1))
    val back = spark.read.parquet(errDir)
    assert(back.count() == 2L)
    assert(back.columns.toSet == Set("k", "v", "bucket"))
  }
}
