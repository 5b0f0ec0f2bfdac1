package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract: the bench's last stdout line must PARSE as JSON
  * and FIT the driver's 2000-char tail window at every suite size —
  * seven rounds of "parsed": null artifacts came from violating it. */
class BenchFormatSpec extends AnyFunSuite {
  private def parse(s: String) = org.json4s.jackson.JsonMethods.parse(s)
  import BenchFormat.StEntry
  private val streaming = Seq(
    StEntry("stream_lsh_candidates", 7.575893, Seq(7.575893, 8.1, 7.2)),
    StEntry("stream_wordcount", 1.155435, Seq(1.2, 1.155435, 1.4)),
    StEntry("stream_wordcount_durable", 0.969665, Seq(0.969665, 1.1, -1.0)),
    StEntry("stream_wordcount_store", 3.578634, Seq(21.57, 3.578634, 2.9)),
    StEntry("drpc_statequery_ms", 560.192436, Seq(560.192436, 2011.0, 533.0)),
    StEntry("drpc_concurrent_p99_ms", 2916.4, Seq(2916.4, 3100.2, 2800.9),
      ",\"p50_runs\":[2589.0,2700.5,2500.1]"),
    StEntry("continuous_latency_mean", 0.000245, Seq(0.000245, 0.000251, 0.000240)))
  private def suite(n: Int, sec: Double): Seq[(String, Double)] =
    (1 to n).map(i => s"q${i}_some_operator_name" -> sec)

  test("realistic suite: slow queries stay visible at int ms AND streaming runs survive") {
    // 140 fast + 35 slow — the real suite's shape; the fold tier absorbs
    // the fast tail while the slow entries and the runs arrays both fit
    val mixed = (1 to 140).map(i => s"q${i}_fast" -> 0.08) ++
      (141 to 175).map(i => s"q${i}_slow" -> 0.8)
    val line = BenchFormat.stdoutLine(mixed, streaming,
      calib = 0.114, reps = 2, degraded = false, """"warm":"none",""", "/sf")
    assert(line.length <= BenchFormat.Budget, s"len ${line.length}")
    val j = parse(line)
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    assert((j \ "metric").extract[String] == "total")
    assert((j \ "qunit").extract[String] == "ms")
    val qs = (j \ "queries").extract[Map[String, Long]]
    assert(qs.size >= 35 && qs("141") == 800L)
    assert((j \ "streaming" \ "wcs" \ "runs").extract[Seq[Double]].size == 3)
    assert(math.abs((j \ "value").extract[Double] - (140 * 0.08 + 35 * 0.8)) < 0.01)
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
    // streaming entries carry BOTH the recorded median and the raw runs
    // (failures stay visible as -1) — VERDICT r10 #1
    assert((j \ "streaming" \ "continuous_latency_mean" \ "med")
      .extract[Double] == 0.000245)
    assert((j \ "streaming" \ "stream_wordcount_store" \ "runs")
      .extract[Seq[Double]] == Seq(21.57, 3.578634, 2.9))
    assert((j \ "streaming" \ "stream_wordcount_durable" \ "runs")
      .extract[Seq[Double]].contains(-1.0))
  }

  test("stdout line carries streaming med+runs in every tier and still fits") {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    for (n <- Seq(8, 175, 3000)) {
      val line = BenchFormat.stdoutLine(suite(n, if (n > 600) 9.9 else 0.4),
        streaming, calib = 0.1, reps = 2, degraded = false,
        """"warm":"none",""", "/sf")
      assert(line.length <= BenchFormat.Budget, s"n=$n len ${line.length}")
      val j = parse(line)
      val key = if (n == 8) "stream_wordcount_store" else "wcs"
      // the budgeted face rounds seconds-scale values to 3 decimals
      assert(math.abs((j \ "streaming" \ key \ "med").extract[Double] - 3.578634)
        < 0.001, s"n=$n")
      assert((j \ "streaming" \ key \ "runs").extract[Seq[Double]].size == 3, s"n=$n")
    }
  }

  test("fullJson full-only note (duck_queries) lands in BENCH_SELF, not stdout") {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val dq = """"duck_queries":{"q1_x":0.012,"q2_y":1.503},"""
    val full = parse(BenchFormat.fullJson(suite(10, 0.4), streaming,
      0.1, 2, false, """"warm":"none",""", "/sf",
      """"duck_total":76.830,"duck_n":195,"ratio":1.060,""", dq))
    assert((full \ "duck_queries" \ "q2_y").extract[Double] == 1.503)
    val line = BenchFormat.stdoutLine(suite(175, 0.41), streaming,
      0.1, 2, false, """"warm":"none",""", "/sf",
      """"duck_total":76.830,"duck_n":195,"ratio":1.060,""")
    assert(!line.contains("duck_queries"))
    assert(line.length <= BenchFormat.Budget)
  }

  test("drpcc p50_runs extra rides index-aligned with runs in both faces (VERDICT r11 wrong #2)") {
    import org.json4s._
    implicit val fmts: Formats = DefaultFormats
    val full = parse(BenchFormat.fullJson(suite(10, 0.4), streaming,
      0.1, 2, false, """"warm":"none",""", "/sf"))
    val p99s = (full \ "streaming" \ "drpc_concurrent_p99_ms" \ "runs").extract[Seq[Double]]
    val p50s = (full \ "streaming" \ "drpc_concurrent_p99_ms" \ "p50_runs").extract[Seq[Double]]
    assert(p99s.size == 3 && p50s.size == 3)
    assert(p50s.head == 2589.0 && p99s.head == 2916.4) // ratio checkable per run
    // the med+runs stdout tier carries it too (under the short key)
    val line = BenchFormat.stdoutLine(suite(175, 0.41), streaming,
      0.1, 2, false, """"warm":"none",""", "/sf")
    assert(line.length <= BenchFormat.Budget)
    val j = parse(line)
    assert((j \ "streaming" \ "drpcc_ms" \ "p50_runs").extract[Seq[Double]].size == 3)
  }
}
