package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.{CoreQueries, AggQueries, DiffQueries, FnQueries, JoinQueries, LlmQueries, IoQueries, MiscQueries}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query (SURVEY §7.2): DiffData-shaped full reconciliation of
    * orders vs its defect-injected twin on sf0.001; driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame =
    queries("diff_full_outer")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    CoreQueries.qs ++ AggQueries.qs ++ DiffQueries.qs ++ FnQueries.qs ++
      JoinQueries.qs ++ LlmQueries.qs ++ IoQueries.qs ++ MiscQueries.qs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    CoreQueries.oracle ++ AggQueries.oracle ++ DiffQueries.oracle ++
      FnQueries.oracle ++ JoinQueries.oracle ++ LlmQueries.oracle ++
      IoQueries.oracle ++ MiscQueries.oracle
}
