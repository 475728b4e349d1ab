package graft.migrate

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The Cassandra-facing source/sink seam for [[MigrateJob]] — the r8
  * VERDICT's one "missing" reference capability.
  *
  * The reference drives CDM against live Cassandra clusters
  * (`lab/cdm-config/cdm.properties:12-24` names origin/target hosts) and
  * the north star names the Spark Cassandra Connector as the production
  * read/write path. No Cassandra (and no connector jar) exists in this
  * build environment, so "done" here is the SEAM: [[MigrateSource]] /
  * [[MigrateSink]] abstract exactly what [[MigrateJob.run]] needs, the
  * parquet pair is the complete, spec-exercised test double, and
  * [[CassandraTable]] writes down the `cdm.properties` → connector option
  * mapping as data (`Map[String, String]`), so wiring a real cluster is
  * constructing `CassandraSource`/`CassandraSink` — no pipeline change.
  *
  * Option-name provenance (all public): the Spark Cassandra Connector's
  * documented DataSource options (`spark.cassandra.input.fetch.sizeInRows`,
  * `spark.cassandra.input.split.sizeInMB`, `spark.cassandra.output.*`), and
  * CDM's knobs they correspond to (`lab/cdm-config/cdm.properties:26-38`,
  * `docs/04-cdm-approach.md:459-462`).
  */
trait MigrateSource extends Serializable {
  /** The origin table as ONE logical scan — [[MigrateJob]] slices it into
    * token buckets itself (CDM's numParts are slices of one pass, not
    * re-reads; docs/04-cdm-approach.md:280-315).
    */
  def read(spark: SparkSession): DataFrame
}

trait MigrateSink extends Serializable {
  /** Where the JSONL run ledger lives; resume reads it back
    * ([[MigrateJob.completedBuckets]]).
    */
  def ledgerPath: String

  /** Idempotency hook before a wave (re-)writes: remove any partial state
    * a previous attempt may have left for these buckets. Upsert sinks
    * (Cassandra) no-op — re-writing the same rows is the idempotency.
    */
  def clearWave(spark: SparkSession, wave: Seq[Int]): Unit

  /** Write one wave's migrated rows. `df` carries the `bucket` routing
    * column; sinks that don't store it (Cassandra) drop it.
    */
  def writeWave(df: DataFrame, wave: Seq[Int]): Unit

  /** Persist the wave's guardrail-flagged rows (rare path — runs only when
    * the guardrail tripped; bounded by the error budget).
    */
  def writeErrors(df: DataFrame, wave: Seq[Int]): Unit
}

/** Wrap an already-loaded DataFrame (the in-process test double and the
  * back-compat path for `run(spark, df, targetDir, cfg)`).
  */
final case class DataFrameSource(df: DataFrame) extends MigrateSource {
  def read(spark: SparkSession): DataFrame = df
}

/** Read a parquet table — the file-based origin double. */
final case class ParquetSource(path: String) extends MigrateSource {
  def read(spark: SparkSession): DataFrame = spark.read.parquet(path)
}

/** The bucket-partitioned parquet target [[MigrateJob]] has always written:
  * `targetDir/bucket=N/` via dynamic partition overwrite (idempotent
  * re-drives), `targetDir/_errors/` for guardrail rows, ledger under
  * `targetDir/_ledger/`.
  */
final case class ParquetBucketSink(targetDir: String) extends MigrateSink {
  val ledgerPath: String = s"$targetDir/_ledger/run.jsonl"

  /** Dynamic overwrite only replaces partitions PRESENT in the new data,
    * so a re-driven bucket that now yields zero rows would silently keep
    * stale output — delete the wave's partition dirs first. One listStatus
    * per base dir, not one RPC per bucket.
    */
  def clearWave(spark: SparkSession, wave: Seq[Int]): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(targetDir), spark.sparkContext.hadoopConfiguration)
    clearStale(fs, targetDir, wave)
    clearStale(fs, s"$targetDir/_errors", wave)
  }

  private def clearStale(fs: org.apache.hadoop.fs.FileSystem,
                         baseDir: String, wave: Seq[Int]): Unit = {
    val base = new org.apache.hadoop.fs.Path(baseDir)
    if (!fs.exists(base)) return
    val waveDirs = wave.map(b => s"bucket=$b").toSet
    fs.listStatus(base).foreach { st =>
      if (waveDirs.contains(st.getPath.getName)) fs.delete(st.getPath, true)
    }
  }

  def writeWave(df: DataFrame, wave: Seq[Int]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(targetDir)

  def writeErrors(df: DataFrame, wave: Seq[Int]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(s"$targetDir/_errors")
}

object CassandraConnector {
  /** The Spark Cassandra Connector's DataSource short name (public). */
  val Format = "org.apache.spark.sql.cassandra"
}

/** One Cassandra table plus the CDM-tunable connector knobs, mapped:
  *
  * | cdm.properties (reference)                 | connector option |
  * |--------------------------------------------|------------------|
  * | `schema.origin.keyspaceTable=ks.tbl` (:3-4)| `keyspace`/`table` (split on the dot — [[CassandraTable.fromKeyspaceTable]]) |
  * | `perfops.fetchSizeInRows` (:29)            | `spark.cassandra.input.fetch.sizeInRows` (server paging; reduce for >100KB rows, docs/04-cdm-approach.md:461) |
  * | `perfops.numParts` (:27) ≈ table/10MB      | `spark.cassandra.input.split.sizeInMB` (token-range split; the connector derives #splits from size, docs/04-cdm-approach.md:459) |
  * | null-vs-unset (P8 `null_unset_merge`)      | `spark.cassandra.output.ignoreNulls` (null columns leave the target cell untouched instead of writing a tombstone) |
  * | `feature.ttl/writetime.enabled` (:34-35)   | `spark.cassandra.output.ttl` / `spark.cassandra.output.timestamp` |
  * | `perfops.ratelimit.*` (:30-31)             | not a connector option — [[MigrateJob.rateLimited]] implements it engine-side |
  * | `perfops.batchSize` (:28)                  | `spark.cassandra.output.batch.size.rows` |
  */
final case class CassandraTable(
    keyspace: String,
    table: String,
    fetchSizeInRows: Int = 1000,
    splitSizeInMB: Int = 64,
    batchSizeRows: Option[Int] = None,
    ignoreNulls: Boolean = false,
    ttlSeconds: Option[Long] = None,
    writetimeMicros: Option[Long] = None) {

  def readOptions: Map[String, String] = Map(
    "keyspace" -> keyspace,
    "table" -> table,
    "spark.cassandra.input.fetch.sizeInRows" -> fetchSizeInRows.toString,
    "spark.cassandra.input.split.sizeInMB" -> splitSizeInMB.toString)

  def writeOptions: Map[String, String] = Map(
    "keyspace" -> keyspace,
    "table" -> table,
    "spark.cassandra.output.ignoreNulls" -> ignoreNulls.toString) ++
    batchSizeRows.map("spark.cassandra.output.batch.size.rows" -> _.toString) ++
    ttlSeconds.map("spark.cassandra.output.ttl" -> _.toString) ++
    writetimeMicros.map("spark.cassandra.output.timestamp" -> _.toString)
}

object CassandraTable {
  /** Parse CDM's `keyspaceTable` form (`cdm.properties:3-4`: "myapp.users"). */
  def fromKeyspaceTable(keyspaceTable: String): CassandraTable = {
    val i = keyspaceTable.indexOf('.')
    require(i > 0 && i < keyspaceTable.length - 1,
      s"keyspaceTable must be 'keyspace.table', got '$keyspaceTable'")
    CassandraTable(keyspaceTable.substring(0, i), keyspaceTable.substring(i + 1))
  }
}

/** Token-range-partitioned scan of a Cassandra table. Requires the Spark
  * Cassandra Connector on the classpath at runtime (not shipped here); the
  * invocation is the standard DataSource form, so nothing else changes.
  */
final case class CassandraSource(table: CassandraTable) extends MigrateSource {
  def read(spark: SparkSession): DataFrame =
    spark.read.format(CassandraConnector.Format).options(table.readOptions).load()
}

/** Upsert sink: Cassandra writes are idempotent per PK, so `clearWave` is
  * a no-op and a re-driven wave simply re-upserts the same rows. Guardrail
  * rows still need a file home (`errorDir`), as does the ledger.
  */
final case class CassandraSink(table: CassandraTable,
                               ledgerDir: String,
                               errorDir: String) extends MigrateSink {
  val ledgerPath: String = s"$ledgerDir/run.jsonl"

  def clearWave(spark: SparkSession, wave: Seq[Int]): Unit = ()

  def writeWave(df: DataFrame, wave: Seq[Int]): Unit =
    df.drop("bucket")
      .write.format(CassandraConnector.Format)
      .options(table.writeOptions)
      .mode("append")
      .save()

  def writeErrors(df: DataFrame, wave: Seq[Int]): Unit =
    df.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("bucket")
      .parquet(errorDir)
}
