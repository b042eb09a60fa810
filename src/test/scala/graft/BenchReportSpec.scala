package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench stdout contract: the printed line must survive the
  * driver's 2000-char stdout tail capture. r9–r11's official artifacts
  * all truncated mid-string because breakdown maps rode the line —
  * this spec renders the headline subset at WORST-CASE field widths
  * and asserts it stays under BenchReport.StdoutBudget, so adding a
  * key to the headline set is a reviewed budget decision. */
class BenchReportSpec extends AnyFunSuite {

  /** Every headline field at its maximum plausible rendered width:
    * 12-char doubles everywhere (pre-rounding), 5 slowest entries with
    * 40-char query names, every section flagged rerun AND skewed, the
    * 6-entry store-merge map, full-precision deltas. */
  private def worstCaseFields: Seq[(String, String)] = {
    val wideDouble = "-99999.123456789"
    val slowest = (1 to 5)
      .map(i => "\"" + ("q_x_" + ("a" * 36).take(36) + i) + "\":99.123456789")
      .mkString("{", ",", "}")
    val storeMap = Seq("plain_uniform", "plain_localized",
      "bucketed_uniform", "bucketed_localized", "mor_uniform",
      "mor_localized")
      .map(k => "\"" + k + "\":" + "99999.123456789")
      .mkString("{", ",", "}")
    val allSections = Seq("cdc", "skew", "store", "stream", "semdedup",
      "para", "trending").map("\"" + _ + "\"").mkString("[", ",", "]")
    BenchReport.headlineKeys.map {
      case k @ "metric" => k -> "\"total\""
      case k @ "unit" => k -> "\"sec\""
      case k @ "sf" => k -> "\"/root/testdata/sf0.001\""
      case k @ "canary_query" => k -> "\"q_p4_date\""
      case k @ "queries_slowest" => k -> slowest
      case k @ "store_merge_sec" => k -> storeMap
      case k @ ("sections_rerun" | "sections_skewed") => k -> allSections
      case k @ ("bench_runs" | "queries_n" | "queries_failed_n" |
        "budget_violations_n" | "budget_healed_n" | "sections_rerun_n" |
        "sections_skewed_n" | "cdc_events") => k -> "999999"
      case k @ "budget_worst" =>
        k -> ("\"" + "q_x_" + "a" * 36 + ":99999.99\"")
      case k @ "window_adjust_source" => k -> "\"global_direction_fix\""
      case k @ "budget_total_source" => k -> "\"env_common_too_small\""
      case k => k -> wideDouble
    }
  }

  test("worst-case headline line fits the driver's stdout capture") {
    val line = BenchReport.stdoutLine(worstCaseFields)
    // +1 for the newline println appends
    assert(line.length + 1 <= BenchReport.StdoutBudget,
      s"headline line is ${line.length + 1} chars — over the " +
        s"${BenchReport.StdoutBudget} budget; drop a key from " +
        "BenchReport.headlineKeys")
  }

  test("stdout line rounds long doubles to 4 decimals, in maps too") {
    val line = BenchReport.stdoutLine(worstCaseFields)
    assert(!"(-?\\d+\\.\\d{5,})(?=[,}\\]])".r.findFirstIn(line).isDefined,
      s"unrounded double survived: $line")
    assert(line.contains("\"canary_window_factor\":-99999.1235"))
    // inside the slowest-5 map too, not only top-level values
    assert(line.contains("1\":99.1235"))
  }

  test("stdout line is the headline subset in declared order") {
    val line = BenchReport.stdoutLine(worstCaseFields)
    // file-only keys never leak onto stdout
    for (k <- Seq("queries", "queries_cold", "stream_trigger_breakdown",
      "sections", "semdedup_stream_phase_sec", "cdc_phases"))
      assert(!line.contains("\"" + k + "\":"), s"file-only key $k leaked")
    val idx = BenchReport.headlineKeys.map(k => line.indexOf("\"" + k + "\":"))
    assert(idx.forall(_ >= 0), "headline key missing from rendered line")
    assert(idx == idx.sorted, "headline keys out of declared order")
  }

  test("file json keeps every field at full precision") {
    val fields = worstCaseFields :+ ("queries" -> "{\"q1\":1.23456789}")
    val json = BenchReport.fileJson(fields)
    assert(json.contains("\"queries\":{\"q1\":1.23456789}"))
    assert(json.contains("\"canary_window_factor\":-99999.123456789"))
    assert(json.startsWith("{") && json.endsWith("}"))
  }

  test("headline skips keys absent from the field list") {
    val line = BenchReport.stdoutLine(Seq("metric" -> "\"total\""))
    assert(line == "{\"metric\":\"total\"}")
  }

  /** VERDICT r18 #2: the TOTAL budget evaluates on executor CPU when
    * the epoch ref carries it — the drift-immune basis — and only
    * falls through to wall legs without it. */
  test("totalBudgetEval: CPU basis is primary and immune to wall-window drift") {
    // the time-sliced A/B shape: the head ran in a 20%-slow wall
    // window (wall would flag at mult 1.05) while CPU matches the ref
    // — the CPU budget stays silent and names its basis
    val (v1, s1) = BenchReport.totalBudgetEval(
      cpuCommon = Some((100.0, 100.0)),
      wallCommon = Some((120.0, 100.0)), wallCommonTooSmall = false,
      rawTotal = 130.0, envBudget = 90.0, mult = 1.05)
    assert(v1.isEmpty && s1 == "epoch_ref_cpu",
      s"wall drift must not flag under the CPU basis: $v1 $s1")
    // a real regression burns real cycles: CPU flags it even on a
    // fast wall window that would have hidden it
    val (v2, s2) = BenchReport.totalBudgetEval(
      cpuCommon = Some((130.0, 100.0)),
      wallCommon = Some((100.0, 100.0)), wallCommonTooSmall = false,
      rawTotal = 80.0, envBudget = 90.0, mult = 1.05)
    assert(v2 == Seq("total_cpu:130.0") && s2 == "epoch_ref_cpu")
    // no CPU ref: wall leg evaluates as before
    val (v3, s3) = BenchReport.totalBudgetEval(None,
      Some((120.0, 100.0)), wallCommonTooSmall = false,
      rawTotal = 130.0, envBudget = 90.0, mult = 1.05)
    assert(v3 == Seq("total:120.0") && s3 == "epoch_ref")
    // no epoch ref at all: env constant, and the too-small marker
    // names why the epoch leg was skipped
    val (v4, s4) = BenchReport.totalBudgetEval(None, None,
      wallCommonTooSmall = true, rawTotal = 80.0, envBudget = 90.0,
      mult = 1.05)
    assert(v4.isEmpty && s4 == "env_common_too_small")
    val (v5, s5) = BenchReport.totalBudgetEval(None, None,
      wallCommonTooSmall = false, rawTotal = 95.0, envBudget = 90.0,
      mult = 1.05)
    assert(v5 == Seq("total:95.0") && s5 == "env")
  }

  /** VERDICT r19 #2: a section rate >pct below its epoch-ref rate earns
    * one rerun; at-or-above-ref rates, dead refs, failed runs and a
    * disabled pct never do. */
  test("rateNeedsHeal fires only on a live rate far below a live ref") {
    assert(BenchReport.rateNeedsHeal(700.0, Some(1000.0), 25.0))
    assert(!BenchReport.rateNeedsHeal(760.0, Some(1000.0), 25.0),
      "within 25% of ref must not rerun")
    assert(!BenchReport.rateNeedsHeal(1200.0, Some(1000.0), 25.0),
      "above ref must not rerun")
    assert(!BenchReport.rateNeedsHeal(700.0, None, 25.0),
      "no ref (pre-repin EPOCH.json) keeps the heal rule inert")
    assert(!BenchReport.rateNeedsHeal(700.0, Some(-1.0), 25.0),
      "dead ref must not rerun")
    assert(!BenchReport.rateNeedsHeal(-1.0, Some(1000.0), 25.0),
      "a failed run (-1 sentinel) is a failure, not a slow rate")
    assert(!BenchReport.rateNeedsHeal(700.0, Some(1000.0), 0.0),
      "pct=0 disables the rule")
  }

  /** VERDICT r17 #3: the at-ref-window estimate must move the direction
    * the global factor says — a slower-than-ref window normalizes DOWN
    * (between the epoch ref and raw), a faster one UP — and fall back
    * to raw ÷ global when drifting chunk brackets contradict that (the
    * r17 artifact shipped adjusted 145.8 from raw 115.07 at factor
    * 1.21). */
  test("atRefWindowEst: estimate lands between raw and raw/global, else global fix") {
    // degraded (slow) window, chunk sum inside the band: per-chunk wins
    // and the estimate lands BETWEEN the epoch-ref-ish value and raw
    val (a, srcA) = BenchReport.atRefWindowEst(120.0, 100.0, 1.2)
    assert(a == 100.0 && srcA == "per_chunk")
    assert(a < 120.0 && a >= 120.0 / 1.2 - 1e-9)
    // fast window, chunk sum inside the band upward
    val (b, srcB) = BenchReport.atRefWindowEst(90.0, 110.0, 0.8)
    assert(b == 110.0 && srcB == "per_chunk")
    // the r17 inversion: slow window but drifting chunk brackets push
    // the sum ABOVE raw → global fix, estimate lands under raw
    val (c, srcC) = BenchReport.atRefWindowEst(115.07, 145.8, 1.21)
    assert(srcC == "global_direction_fix")
    assert(math.abs(c - 115.07 / 1.21) < 1e-9 && c < 115.07)
    // the r18 seal-2 magnitude hole: RIGHT direction (fast window, sum
    // above raw) but +32% on a 3%-fast window — outside the band
    val (c2, srcC2) = BenchReport.atRefWindowEst(109.3, 144.5, 0.967)
    assert(srcC2 == "global_direction_fix")
    assert(c2 > 109.3 && c2 < 115.0)
    // fast window with chunk sum below raw → same fix, upward
    val (d, srcD) = BenchReport.atRefWindowEst(90.0, 80.0, 0.8)
    assert(srcD == "global_direction_fix" && d > 90.0)
    // near-1 factors: per-chunk rides inside the (tight) band
    val (e, srcE) = BenchReport.atRefWindowEst(100.0, 101.0, 1.01)
    assert(e == 101.0 && srcE == "per_chunk")
    // no factor: no estimate
    assert(BenchReport.atRefWindowEst(100.0, 90.0, -1.0) ==
      ((-1.0, "none")))
    // dead per-chunk sum (no live canary) with a live global factor
    val (f, srcF) = BenchReport.atRefWindowEst(100.0, -1.0, 1.2)
    assert(srcF == "global_direction_fix" && f > 0)
  }
}
