package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet testdata (TESTDATA.md) plus
  * explicit StructTypes for the reference `training` keyspace
  * (reference: lab/init-scripts/01-create-schema.cql:11-53). The engine is
  * schema-declared, mirroring CDM's requirement that schemas be known on
  * both sides (reference: docs/04-cdm-approach.md:19).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Parquet scan. Catalyst handles column pruning + predicate pushdown, the
    * Spark-native analog of CDM's token-range full-table scan
    * (reference: docs/04-cdm-approach.md:280-285). Split sizing is governed
    * by spark.sql.files.maxPartitionBytes rather than CDM numParts.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  import org.apache.spark.sql.types._

  /** training.users (reference: lab/init-scripts/01-create-schema.cql:11-21) */
  val usersSchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("username", StringType),
    StructField("email", StringType),
    StructField("first_name", StringType),
    StructField("last_name", StringType),
    StructField("created_at", TimestampType),
    StructField("updated_at", TimestampType),
    StructField("status", StringType),
    StructField("preferences", MapType(StringType, StringType))))

  /** training.orders (reference: lab/init-scripts/01-create-schema.cql:24-32) */
  val trainingOrdersSchema: StructType = StructType(Seq(
    StructField("order_id", StringType, nullable = false),
    StructField("user_id", StringType),
    StructField("order_date", TimestampType),
    StructField("total_amount", DecimalType(12, 2)),
    StructField("status", StringType),
    StructField("items", ArrayType(StringType)),
    StructField("shipping_address", StringType)))

  /** training.products (reference: lab/init-scripts/01-create-schema.cql:35-43) */
  val productsSchema: StructType = StructType(Seq(
    StructField("product_id", StringType, nullable = false),
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("price", DecimalType(12, 2)),
    StructField("category", StringType),
    StructField("stock_quantity", IntegerType),
    StructField("created_at", TimestampType)))

  /** training.user_activity — time-series table with composite partition key
    * and DESC clustering (reference: lab/init-scripts/01-create-schema.cql:46-53).
    */
  val userActivitySchema: StructType = StructType(Seq(
    StructField("user_id", StringType, nullable = false),
    StructField("activity_date", DateType, nullable = false),
    StructField("activity_time", TimestampType, nullable = false),
    StructField("activity_type", StringType),
    StructField("details", StringType)))
}
