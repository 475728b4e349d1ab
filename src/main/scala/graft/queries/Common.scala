package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the driver-facing query registry (SparkEntry).
  *
  * Conventions that keep the DuckDB oracle hash-comparable:
  *  - every query ends with a deterministic ORDER BY including a unique key,
  *    and the oracle SQL carries the same ORDER BY;
  *  - aggregates over doubles are cast to DECIMAL *before* summing (decimal
  *    addition is exact and associative; double addition is order-dependent);
  *  - `events.ts` is nanosecond-precision parquet which Spark truncates to
  *    micros on read — any ts-derived output or sort key goes through
  *    unix_micros (Spark) / epoch_us (DuckDB) so both engines see the same
  *    int64.
  */
object Common {
  type Q = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** lineitem natural compound PK (SURVEY §7.2). */
  val liPk: Seq[String] = Seq("l_orderkey", "l_linenumber")

  /** Non-PK lineitem columns, used as the diff compare set. */
  val liCompare: Seq[String] = Seq(
    "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice",
    "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")

  /** Defect-injected twin of lineitem, playing the migration "target" side
    * for the Diff family (reference DiffData semantics,
    * docs/04-cdm-approach.md:355-377). Deterministic defects:
    *  - rows with l_orderkey % 97 == 0 are MISSING from the target;
    *  - rows with l_orderkey % 89 == 0 have l_quantity + 1 (MISMATCH);
    *  - rows with l_orderkey % 101 == 0 are duplicated under a shifted
    *    l_linenumber (+100) → EXTRA_IN_TARGET.
    */
  def lineitemTwin(li: DataFrame): DataFrame = {
    val base = li
      .filter(col("l_orderkey") % 97 =!= 0)
      .withColumn("l_quantity",
        when(col("l_orderkey") % 89 === 0, col("l_quantity") + 1.0)
          .otherwise(col("l_quantity")))
    val extra = li
      .filter(col("l_orderkey") % 101 === 0)
      .withColumn("l_linenumber", col("l_linenumber") + 100)
    base.unionByName(extra.select(base.columns.map(col): _*))
  }

  /** DuckDB CTE body mirroring [[lineitemTwin]] exactly. Use as
    * s"WITH twin AS ($twinSql) SELECT ...".
    */
  val twinSql: String =
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber,
       CASE WHEN l_orderkey % 89 = 0 THEN l_quantity + 1.0 ELSE l_quantity END AS l_quantity,
       l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
       FROM lineitem WHERE l_orderkey % 97 <> 0
       UNION ALL
       SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber + 100 AS l_linenumber,
       l_quantity, l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus, l_shipdate
       FROM lineitem WHERE l_orderkey % 101 = 0"""

  /** Scratch dir for queries that exercise a write path (CSV/JSON round
    * trips, dual-write, migrate). Kept inside the repo's build dir.
    */
  def scratch(name: String, sfDir: String): String = {
    val tag = sfDir.replaceAll("[^A-Za-z0-9.]", "_")
    s"/root/repo/target/scratch/$tag/$name"
  }
}
