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

  test("renderJsonFull (the BENCH_LOCAL.json file artifact) appends the raw " +
       "per-key samples to the pinned schema and stays parseable") {
    val res = Map("a" -> 1.5, "b" -> -1.0)
    val smp = Map("a" -> Seq(1.62, 1.5, 1.43), "b" -> Seq.empty[Double])
    val line = Bench.renderJsonFull(res, smp, "/root/testdata/sf0.1", 0.55)
    assert(!line.contains("\n"))
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val parsed = JsonMethods.parse(line)
    // the base schema is untouched
    val qs = (parsed \ "queries").asInstanceOf[JObject].obj.toMap
    assert(qs.keySet == Set("a", "b"))
    assert((parsed \ "cal_scan_full").asInstanceOf[JDouble].num == 0.55)
    // samples: run-order raw attempts; a failed key keeps an empty list
    val ss = (parsed \ "samples").asInstanceOf[JObject].obj.toMap
    assert(ss.keySet == Set("a", "b"))
    assert(ss("a").asInstanceOf[JArray].arr.map {
      case JDouble(n) => n
      case JInt(n) => n.toDouble
      case other => fail(s"unexpected $other")
    } == List(1.62, 1.5, 1.43))
    assert(ss("b").asInstanceOf[JArray].arr.isEmpty)
  }

  test("cal_scan_full (host calibration constant) is part of the pinned schema " +
       "on every artifact shape") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    def cal(line: String): Double = JsonMethods.parse(line) \ "cal_scan_full" match {
      case JDouble(n) => n
      case JInt(n) => n.toDouble
      case other => fail(s"cal_scan_full missing/unexpected: $other in $line")
    }
    // full line carries the measured constant
    assert(cal(Bench.renderJson(Map("q" -> 1.0), "sf", calibration = 0.51)) == 0.51)
    // not-run default renders as -1 (schema stays fixed for spec-built lines)
    assert(cal(Bench.renderJson(Map("q" -> 1.0), "sf")) == -1.0)
    // the budget-capped line and the keep=0 floor line carry it too
    val many = (1 to 300).map(i => f"query_name_$i%03d" -> i * 0.01).toMap
    assert(cal(Bench.renderJsonBudget(many, "sf", calibration = 0.51)) == 0.51)
    val hugeSf = "x" * 5000
    assert(cal(Bench.renderJsonBudget(many, hugeSf, calibration = 0.51)) == 0.51)
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

  test("renderJsonBudget: the stdout line NEVER exceeds the tail window") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    // current registry size and beyond: budget must hold at any count
    for (n <- Seq(10, 95, 200, 500)) {
      val results = (1 to n).map(i => f"some_query_name_$i%03d" -> i * 0.01).toMap
      val line = Bench.renderJsonBudget(results, "/root/testdata/sf0.1")
      assert(line.length <= 1900, s"n=$n: ${line.length} bytes")
      assert(!line.contains("\n"))
      val parsed = JsonMethods.parse(line)
      val total = (parsed \ "value") match {
        case JDouble(d) => d
        case JInt(i) => i.toDouble
        case other => fail(s"value: $other")
      }
      assert(math.abs(total - results.values.sum) < 0.01)
      val JObject(qs) = parsed \ "queries"
      parsed \ "queries_omitted" match {
        case JInt(k) =>
          assert(qs.length + k.toInt == n, s"n=$n: ${qs.length} kept + $k omitted")
          // slowest-first: every kept timing >= every omitted timing
          val keptMin = qs.map {
            case (_, JDouble(d)) => d
            case (_, JInt(i)) => i.toDouble
            case (_, other) => fail(s"timing: $other")
          }.min
          assert(keptMin >= (n - qs.length) * 0.01 - 1e-9)
          assert((parsed \ "queries_file") == JString("BENCH_LOCAL.json"))
        case _ => assert(qs.length == n, "no omission marker → full map expected")
      }
    }
  }

  test("renderJsonBudget: a pathological sfDir can never push the line over budget") {
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val results = (1 to 50).map(i => f"q_$i%03d" -> i * 0.01).toMap
    val hugeSf = "/x" * 2000 // 4000-byte path: the fixed envelope alone overflows
    val line = Bench.renderJsonBudget(results, hugeSf)
    assert(line.length <= 1900, s"${line.length} bytes")
    val parsed = JsonMethods.parse(line) // floor line must still parse
    assert((parsed \ "metric") == JString("total"))
    assert((parsed \ "queries_file") == JString("BENCH_LOCAL.json"))
    // schema stays fixed across paths: the floor line keeps the sf FIELD
    // (null value), so consumers keying on it never see a missing field
    assert((parsed \ "sf") == JNull)
  }

  test("renderJsonBudget passes the full line through when it fits") {
    val small = Map("a" -> 0.1, "b" -> 0.2)
    assert(Bench.renderJsonBudget(small, "sf") == Bench.renderJson(small, "sf"))
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

  test("StressProtocol: heavy rows go median-of-3, cheap rows stay single, " +
       "the artifact cell shows every sample (r10 verdict item 7)") {
    import graft.tools.StressProtocol
    assert(StressProtocol.samplesNeeded(5.0) == 1)
    assert(StressProtocol.samplesNeeded(StressProtocol.MedianThresholdSecs) == 1)
    assert(StressProtocol.samplesNeeded(30.1) == 3)
    assert(StressProtocol.median(Seq(62.1)) == 62.1)
    // median is the MIDDLE sample, immune to one loaded-host outlier
    assert(StressProtocol.median(Seq(237.7, 62.1, 70.4)) == 70.4)
    assert(StressProtocol.cell(Seq(12.3)) == "12.3")
    val c = StressProtocol.cell(Seq(237.7, 62.1, 70.4))
    assert(c.startsWith("70.4 (med of 3:") && c.contains("237.7") &&
      c.contains("62.1"), c)
  }
}
