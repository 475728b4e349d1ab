package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for specs — same config surface as Verify/Bench. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"
}

object SparkSpec {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    // Vanilla session (no spark.sql.extensions, no nanosAsLong): the suite
    // runs through the same runtime-fallback path an external driver hits.
    // Specs that use graft_* outside the query registry call
    // GraftFunctions.ensure themselves, as an external app would.
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
