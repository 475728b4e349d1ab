package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Spark port of the reference's synthetic data generator
  * (lab/scripts/generate_data.py:29-158) producing the four `training`
  * keyspace tables with the schemas in [[Tables]]. Everything derives from
  * the row id — names from pools, bounded "randoms" via modular hashing,
  * FK sampling, map/list literals — so generation is deterministic
  * (seeded-reproducible, SURVEY §7.4 risk 4) and embarrassingly parallel
  * (spark.range → narrow select; no RNG state, no driver loops).
  *
  * Golden row counts mirror the generator defaults: users 1000,
  * products 500, orders 2000, user_activity 5000
  * (lab/scripts/generate_data.py:187-190; the 10,000 claim in
  * cdm-config/README.md:77-81 is the reference's documented inconsistency —
  * trust the generator).
  */
object GenData {

  private val firstNames = Seq("james", "mary", "john", "patricia", "robert",
    "jennifer", "michael", "linda", "william", "elizabeth")
  private val lastNames = Seq("smith", "johnson", "williams", "brown", "jones",
    "garcia", "miller", "davis")
  private val statuses = Seq("active", "inactive", "suspended")
  private val categories = Seq("electronics", "books", "clothing", "home", "sports")
  private val activities = Seq("login", "logout", "view_product", "add_to_cart", "purchase")

  private def pick(pool: Seq[String], ix: org.apache.spark.sql.Column) =
    element_at(array(pool.map(lit): _*), (ix % pool.size + 1).cast("int"))

  /** Deterministic uuid4-shaped id from a seeded key (fn_uuid pattern). */
  private def uuidOf(prefix: String, id: org.apache.spark.sql.Column) = {
    val h = md5(concat(lit(prefix + ":"), id.cast("string")))
    concat(substring(h, 1, 8), lit("-"), substring(h, 9, 4), lit("-"),
      substring(h, 13, 4), lit("-"), substring(h, 17, 4), lit("-"),
      substring(h, 21, 12))
  }

  private val epoch = to_timestamp(lit("2024-01-01 00:00:00"))

  /** training.users (generate_data.py:29-66). */
  def users(spark: SparkSession, n: Long = 1000L): DataFrame =
    spark.range(n).select(
      uuidOf("user", col("id")).as("user_id"),
      concat(pick(firstNames, col("id")), lit("."),
        pick(lastNames, col("id")), col("id").cast("string")).as("username"),
      concat(pick(firstNames, col("id")), lit("."),
        pick(lastNames, col("id")), col("id").cast("string"),
        lit("@example.com")).as("email"),
      pick(firstNames, col("id")).as("first_name"),
      pick(lastNames, col("id")).as("last_name"),
      (epoch - expr("make_interval(0, 0, 0, 0, 0, 0, 1) ") * (col("id") % 31536000)).as("created_at"),
      epoch.as("updated_at"),
      pick(statuses, col("id") % 10 / 4).as("status"),
      map(lit("theme"), when(col("id") % 2 === 0, "dark").otherwise("light"),
        lit("language"), when(col("id") % 3 === 0, "en").otherwise("es"),
        lit("notifications"), when(col("id") % 5 === 0, "off").otherwise("on"))
        .as("preferences"))

  /** training.products (generate_data.py:69-95). */
  def products(spark: SparkSession, n: Long = 500L): DataFrame =
    spark.range(n).select(
      uuidOf("product", col("id")).as("product_id"),
      concat(lit("Product "), col("id").cast("string")).as("name"),
      concat(lit("Description of product "), col("id").cast("string")).as("description"),
      round((col("id") % 9900 + 100) / 100.0, 2).cast(DecimalType(12, 2)).as("price"),
      pick(categories, col("id")).as("category"),
      (col("id") % 1000).cast("int").as("stock_quantity"),
      epoch.as("created_at"))

  /** training.orders with FK sampling into users (generate_data.py:98-133):
    * user_id derives from a hash of the order id, landing uniformly in the
    * user key space (the Python original samples from the user list).
    */
  def orders(spark: SparkSession, n: Long = 2000L, nUsers: Long = 1000L): DataFrame =
    spark.range(n).select(
      uuidOf("order", col("id")).as("order_id"),
      uuidOf("user", pmod(xxhash64(col("id")), lit(nUsers))).as("user_id"),
      (epoch - expr("make_interval(0, 0, 0, 0, 0, 0, 1)") * (col("id") % 7776000)).as("order_date"),
      round((col("id") % 49900 + 100) / 100.0, 2).cast(DecimalType(12, 2)).as("total_amount"),
      pick(Seq("pending", "processing", "shipped", "delivered", "cancelled"),
        col("id") % 5).as("status"),
      transform(sequence(lit(0), (col("id") % 5).cast("int")),
        x => uuidOf("product", pmod(xxhash64(col("id") * 7 + x), lit(500L)))).as("items"),
      concat(col("id").cast("string"), lit(" Main St, City")).as("shipping_address"))

  /** training.user_activity — time-series with the derived day bucket
    * (generate_data.py:136-158; activity_date = date(activity_time)).
    */
  def userActivity(spark: SparkSession, n: Long = 5000L, nUsers: Long = 1000L): DataFrame = {
    val at = (epoch - expr("make_interval(0, 0, 0, 0, 0, 0, 1)") * (col("id") % 2592000))
    spark.range(n).select(
      uuidOf("user", pmod(xxhash64(col("id") + 13), lit(nUsers))).as("user_id"),
      to_date(at).as("activity_date"),
      at.as("activity_time"),
      pick(activities, col("id")).as("activity_type"),
      concat(lit("""{"ip": "10.0."""), (col("id") % 255).cast("string"),
        lit(""".1"}""")).as("details"))
  }

  /** All four tables keyed by name, schema-checked against [[Tables]]. */
  def all(spark: SparkSession): Map[String, DataFrame] = Map(
    "users" -> users(spark),
    "products" -> products(spark),
    "orders" -> orders(spark),
    "user_activity" -> userActivity(spark))
}
