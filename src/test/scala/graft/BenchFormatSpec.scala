package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: the bench's last stdout line must PARSE as JSON
  * and FIT the driver's 2000-char tail window at every suite size —
  * seven rounds of "parsed": null artifacts came from violating it. */
class BenchFormatSpec extends AnyFunSuite {
  private def parse(s: String) = org.json4s.jackson.JsonMethods.parse(s)
  private val streaming = Seq(
    "stream_lsh_candidates" -> 7.575893, "stream_wordcount" -> 1.155435,
    "stream_wordcount_durable" -> 0.969665, "stream_wordcount_store" -> 3.578634,
    "drpc_statequery_ms" -> 560.192436, "continuous_latency_mean" -> 0.000245)
  private def suite(n: Int, sec: Double): Seq[(String, Double)] =
    (1 to n).map(i => s"q${i}_some_operator_name" -> sec)

  test("realistic suite: all-queries tier fits and parses; values are int ms") {
    val line = BenchFormat.stdoutLine(suite(175, 0.41), streaming,
      calib = 0.114, reps = 2, degraded = false, """"warm":"none",""", "/sf")
    assert(line.length <= BenchFormat.Budget, s"len ${line.length}")
    val j = parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((j \ "metric").extract[String] == "total")
    assert((j \ "qunit").extract[String] == "ms")
    val qs = (j \ "queries").extract[Map[String, Long]]
    assert(qs.size == 175 && qs("1") == 410L)
    assert(math.abs((j \ "value").extract[Double] - 175 * 0.41) < 0.01)
  }

  test("oversized suite: folding tiers engage, line still fits and parses") {
    // 600 queries would blow any flat encoding; most are fast, so a fold
    // threshold keeps the slow tail visible
    val mixed = suite(580, 0.020) ++
      (581 to 600).map(i => s"q${i}_slow" -> 3.5)
    val line = BenchFormat.stdoutLine(mixed, streaming,
      calib = 0.1, reps = 2, degraded = false, """"warm":"none",""", "/sf")
    assert(line.length <= BenchFormat.Budget, s"len ${line.length}")
    val j = parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((j \ "q_folded_n").extract[Long] == 580L)
    val qs = (j \ "queries").extract[Map[String, Long]]
    assert(qs.size == 20 && qs.values.forall(_ == 3500L))
  }

  test("pathological suite: the no-queries fallback still fits and parses") {
    // thousands of SLOW queries defeat every fold threshold
    val huge = (1 to 3000).map(i => s"q${i}_x" -> 9.9)
    val line = BenchFormat.stdoutLine(huge, streaming,
      calib = 0.1, reps = 2, degraded = false, """"warm":"none",""", "/sf")
    assert(line.length <= BenchFormat.Budget, s"len ${line.length}")
    val j = parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((j \ "queries").extract[String] == "see BENCH_SELF.json")
  }

  test("small suite: full-fidelity tier (names + 3-decimal seconds) wins") {
    val line = BenchFormat.stdoutLine(suite(8, 0.123), streaming,
      calib = 0.1, reps = 1, degraded = false, """"warm":"none",""", "/sf")
    assert(line.contains("q1_some_operator_name"))
    assert(line.contains(":0.123"))
    assert(parse(line) != null)
  }

  test("degraded flag and warm note propagate through every tier") {
    for (n <- Seq(8, 175, 3000)) {
      val line = BenchFormat.stdoutLine(suite(n, if (n > 600) 9.9 else 0.4),
        streaming, calib = 0.2, reps = 2, degraded = true,
        """"warm":"full-suite@/x",""", "/sf")
      assert(line.contains(""""degraded":true"""), s"n=$n")
      assert(line.contains(""""warm":"full-suite@/x""""), s"n=$n")
      assert(line.length <= BenchFormat.Budget, s"n=$n len ${line.length}")
      assert(parse(line) != null)
    }
  }

  test("same-window oracle pair note survives every tier, line still fits") {
    val note = """"duck_total":76.830,"duck_n":195,"ratio":1.060,"""
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    for (n <- Seq(8, 175, 3000)) {
      val line = BenchFormat.stdoutLine(suite(n, if (n > 600) 9.9 else 0.4),
        streaming, calib = 0.1, reps = 2, degraded = false,
        """"warm":"none",""", "/sf", note)
      assert(line.length <= BenchFormat.Budget, s"n=$n len ${line.length}")
      val j = parse(line)
      assert((j \ "duck_total").extract[Double] == 76.83, s"n=$n")
      assert((j \ "ratio").extract[Double] == 1.06, s"n=$n")
    }
    val full = parse(BenchFormat.fullJson(suite(10, 0.4), streaming,
      0.1, 2, false, """"warm":"none",""", "/sf", note))
    assert((full \ "duck_n").extract[Long] == 195L)
  }

  test("fullJson carries every name at full precision (the BENCH_SELF face)") {
    val j = parse(BenchFormat.fullJson(suite(175, 0.41), streaming,
      0.114, 2, degraded = false, """"warm":"none",""", "/sf"))
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val qs = (j \ "queries").extract[Map[String, Double]]
    assert(qs.size == 175 && qs("q1_some_operator_name") == 0.41)
    val st = (j \ "streaming").extract[Map[String, Double]]
    assert(st("continuous_latency_mean") == 0.000245)
  }
}
