package graft

/** The driver contract itself: entry() returns rows, every query key has a
  * runnable body, and every oracle key matches a query key.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry() flagship returns rows (driver t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query; keys are stable") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle keys without queries: ${o.diff(q)}")
    assert(q.size >= 65, s"query registry shrank: ${q.size}")
  }

  test("EVERY query key has an oracle row — no driver-invisible keys " +
       "(r11 verdict item 2: the one key without a CORRECTNESS row was " +
       "the broken one)") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(q.diff(o).isEmpty,
      "registry keys invisible to the correctness gate — give each an " +
        s"oracle (an envelope/checksum contract if the raw output is " +
        s"engine-specific): ${q.diff(o).toList.sorted.mkString(", ")}")
  }
}
