package graft

import org.apache.spark.sql.functions._

/** The generator must produce the reference's golden counts and declared
  * schemas (SURVEY §5 gate 1: users 1000, products 500, orders 2000,
  * user_activity 5000 — lab/scripts/generate_data.py:187-190), with valid
  * FK references and deterministic output.
  */
class GenDataSpec extends SparkSpec {

  test("golden row counts match the reference generator defaults") {
    val t = GenData.all(spark)
    assert(t("users").count() == 1000)
    assert(t("products").count() == 500)
    assert(t("orders").count() == 2000)
    assert(t("user_activity").count() == 5000)
  }

  test("schemas match the declared training keyspace StructTypes") {
    // compare SQL type names: container nullability flags are advisory
    def shape(df: org.apache.spark.sql.DataFrame) =
      df.schema.fields.map(f => (f.name, f.dataType.sql)).toSeq
    def expect(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.sql)).toSeq
    assert(shape(GenData.users(spark)) == expect(Tables.usersSchema))
    assert(shape(GenData.products(spark)) == expect(Tables.productsSchema))
    assert(shape(GenData.orders(spark)) == expect(Tables.trainingOrdersSchema))
    assert(shape(GenData.userActivity(spark)) == expect(Tables.userActivitySchema))
  }

  test("PKs unique; orders FK lands in the user key space") {
    val users = GenData.users(spark)
    val orders = GenData.orders(spark)
    assert(users.select("user_id").distinct().count() == 1000)
    assert(orders.select("order_id").distinct().count() == 2000)
    assert(orders.join(users, "user_id", "left_anti").count() == 0,
      "every order's user_id must reference an existing user")
  }

  test("generation is deterministic across invocations") {
    // set ops reject MapType — compare via a JSON rendering of each row
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select(to_json(struct(df.columns.map(col): _*)).as("r"))
    val a = rows(GenData.users(spark))
    val b = rows(GenData.users(spark))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("activity_date is the day bucket of activity_time (clustering derivation)") {
    val ua = GenData.userActivity(spark)
    assert(ua.filter(col("activity_date") =!= to_date(col("activity_time"))).count() == 0)
  }
}
