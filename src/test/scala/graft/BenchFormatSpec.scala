package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact line must stay machine-parseable: round 4's artifact
  * was lost to tail truncation + unparsed output, so the format itself is
  * now under test.
  */
class BenchFormatSpec extends AnyFunSuite {
  test("renderJson emits valid compact JSON covering every query incl. failures") {
    val line = Bench.renderJson(
      Map("q_fast" -> 0.12345678, "q_failed" -> -1.0, "q_zero" -> 0.0),
      "/root/testdata/sf0.1")
    assert(!line.contains("\n"), "must be a single line")
    assert(line.length < 4096, "must stay small enough to never truncate")
    // parse with json4s (ships with Spark) — a syntax slip fails here, not
    // in the driver's capture
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(line)
    val qs = (parsed \ "queries").asInstanceOf[JObject].obj.toMap
    assert(qs.keySet == Set("q_fast", "q_failed", "q_zero"))
    assert(qs("q_fast").asInstanceOf[JDouble].num == 0.12) // cs >= 0.1s
    assert(qs("q_failed") match { // -1 renders as an integer after zero-strip
      case JDouble(n) => n == -1.0
      case JInt(n) => n == BigInt(-1)
      case other => fail(s"unexpected $other")
    })
    assert(qs("q_zero") match {
      case JDouble(n) => n == 0.0
      case JInt(n) => n == BigInt(0)
      case other => fail(s"unexpected $other")
    })
    assert((parsed \ "metric").asInstanceOf[JString].s == "total")
    assert((parsed \ "unit").asInstanceOf[JString].s == "sec")
  }

  test("renderJson precision: ms under 0.1s, cs above, trailing zeros stripped") {
    val line = Bench.renderJson(
      Map("a" -> 0.0321, "b" -> 0.4641, "c" -> 12.3456, "d" -> 0.1),
      "sf")
    assert(line.contains("\"a\":0.032"), line)
    assert(line.contains("\"b\":0.46"), line)
    assert(line.contains("\"c\":12.35"), line)
    assert(line.contains("\"d\":0.1,") || line.contains("\"d\":0.1}"), line)
  }

  test("renderJson is locale-independent (no comma decimal separators)") {
    val saved = java.util.Locale.getDefault
    try {
      java.util.Locale.setDefault(java.util.Locale.GERMANY) // 0,1235 territory
      val line = Bench.renderJson(Map("q" -> 0.55), "sf")
      assert(line.contains("\"q\":0.55"), line)
      assert(!line.contains("0,5"), line)
    } finally java.util.Locale.setDefault(saved)
  }
}
