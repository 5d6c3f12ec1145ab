package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench ratchet's decision logic, replayed against ARCHIVED boards —
  * no Spark session, no timing: pure fixtures.
  *
  * The load-bearing fixture is the round-15 driver board
  * (src/test/resources/ratchet_r15_board.json — the BENCH_DETAIL.json the
  * driver graded, 242 rows, rc=1) against the round-15 committed baseline
  * (ratchet_r15_baseline.json). That run "confirmed" 10 regressions in an
  * alphabetically contiguous band (q_global_topk..q_html_extract, board
  * positions 110-119) that the judge re-measured at 0.24-1.03x baseline:
  * a minutes-long host-degradation phase swept the sorted execution order
  * and the single confirmation child (its own probes at 1.398x baseline)
  * ran inside the same phase. The new decision procedure must retire that
  * board with exit 0 — while still failing a genuine injected regression.
  */
class BenchRatchetSpec extends AnyFunSuite {
  import BenchRatchet._

  private def loadJsonNumbers(resource: String): Map[String, Double] = {
    val in = getClass.getResourceAsStream(s"/$resource")
    require(in != null, s"missing test resource $resource")
    val txt = scala.io.Source.fromInputStream(in, "UTF-8").mkString
    """"([a-z0-9_]+)":\s*(-?[0-9][0-9.]*)""".r.findAllMatchIn(txt)
      .map(m => m.group(1) -> m.group(2).toDouble).toMap
      .filter(_._2 > 0)
  }

  private lazy val r15Board = loadJsonNumbers("ratchet_r15_board.json")
    .filter { case (k, _) => k.startsWith("q") } // drop "value"/"n" metadata
  private lazy val r15Baseline = loadJsonNumbers("ratchet_r15_baseline.json")

  /** The 10 rows the r15 driver board wrongly confirmed, with the child's
    * drift-normalized values from the archived BENCH_r15.json artifact. */
  private val r15FreshNormalized = Map(
    "q_global_topk" -> 18.471, "q_group_centroids" -> 4.426,
    "q_grouped_quantiles" -> 3.286, "q_grouping_sets" -> 8.039,
    "q_hard_negatives" -> 2.178, "q_heavy_hitters" -> 2.499,
    "q_hilbert_value" -> 0.723, "q_hist_quantiles" -> 3.401,
    "q_hll_distinct" -> 1.683, "q_html_extract" -> 1.993)
  private val r15FreshDrift = 1.398

  test("round-15 replay: host-phase board + degraded child => DEFER, exit 0") {
    val execOrder = r15Board.keys.toSeq.sorted
    var childCalls = 0
    val verdict = decide(
      board = r15Board, execOrder = execOrder, baseline = r15Baseline,
      probeSet = Bench.probeSet, noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => {
        childCalls += 1
        // reconstruct the archived child: every requested row at the
        // phase drift (1.398x its baseline), except the 10 wrongly
        // confirmed rows at their archived raw values
        names.map { n =>
          n -> r15FreshNormalized.get(n).map(_ * r15FreshDrift)
            .getOrElse(r15Baseline.getOrElse(n, 1.0) * r15FreshDrift)
        }.toMap
      },
      sleep = () => fail("must defer on the degraded first child, not sleep"))
    assert(verdict.flagged.map(_.name).toSet.intersect(
      r15FreshNormalized.keySet) == r15FreshNormalized.keySet,
      "the board must still flag the archived band")
    assert(verdict.hostPhase, "positions 110-119 are a contiguous band")
    assert(childCalls == 1)
    assert(verdict.childDrifts.flatten.exists(d => math.abs(d - r15FreshDrift) < 0.02),
      s"child drift must reconstruct ~1.398, got ${verdict.childDrifts}")
    assert(verdict.deferred, "a degraded child can confirm nothing")
    assert(verdict.confirmed.isEmpty && !verdict.failed,
      "the r15 board must exit 0 under the new procedure")
    assert(verdict.suspects.map(_.name).toSet == r15FreshNormalized.keySet,
      "the 10 rows stay stamped suspect (loud, not red)")
  }

  // ---- round-16 replay ------------------------------------------------

  private lazy val r16Board = loadJsonNumbers("ratchet_r16_board.json")
    .filter { case (k, _) => k.startsWith("q") }
  private lazy val r16Baseline = loadJsonNumbers("ratchet_r16_baseline.json")
    .filter { case (k, _) => k.startsWith("q") }

  test("round-16 replay: host-phase board + mildly-hot child (1.263) => DEFER, exit 0") {
    // The archived r16 driver board (BENCH_r16.json rc=1): drift 0.962
    // (clamped to 1.0 for judging), 13 rows flagged in a contiguous band,
    // host_phase stamped — and the first confirmation child's own probes
    // read 1.263x baseline, BELOW the 1.3 degraded gate but squarely in
    // the lingering tail of the phase. Both children "confirmed"
    // q_substring_dedup at fresh-normalized 1.78/1.88; the judge's
    // steady-state re-measure found 0.905 s = 0.98x the 0.925 s baseline
    // (no code on the path had changed). Under scaladoc #9 a phase-shaped
    // board tightens the child gate to 1.15: this board must now DEFER
    // on child #1 — one child JVM, no settle sleep, exit 0, the row
    // stamped suspect (loud, not red).
    val r16ChildDrift = 1.263
    val execOrder = r16Board.keys.toSeq.sorted
    var childCalls = 0
    val verdict = decide(
      board = r16Board, execOrder = execOrder, baseline = r16Baseline,
      probeSet = Bench.probeSet, noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => {
        childCalls += 1
        // reconstruct the archived child #1: probes (and every cleared
        // row) at the phase-tail drift, q_substring_dedup at its archived
        // fresh-normalized 1.782 s x that drift (raw)
        names.map { n =>
          n -> (if (n == "q_substring_dedup") 1.782 * r16ChildDrift
          else r16Baseline.getOrElse(n, 1.0) * r16ChildDrift)
        }.toMap
      },
      sleep = () => fail("must defer on the phase-hot first child, not sleep"))
    assert(verdict.drift.exists(d => math.abs(d - 0.963) < 0.005),
      s"board drift must reconstruct ~0.962, got ${verdict.drift}")
    assert(verdict.flagged.size == 13 &&
      verdict.flagged.map(_.name).contains("q_substring_dedup"),
      s"the archived board flags 13 rows: ${verdict.flagged.map(_.name)}")
    assert(verdict.hostPhase, "the 13 flags form a contiguous band >= 4")
    assert(childCalls == 1)
    assert(verdict.childDrifts.flatten.exists(d => math.abs(d - r16ChildDrift) < 0.02),
      s"child drift must reconstruct ~1.263, got ${verdict.childDrifts}")
    assert(verdict.deferred && verdict.confirmed.isEmpty && !verdict.failed,
      "the r16 board must exit 0 under scaladoc #9")
    assert(verdict.suspects.map(_.name) == Seq("q_substring_dedup"),
      "the judge-disproven row stays stamped suspect")
  }

  test("host-phase board + HEALTHY child (drift <= 1.15) still confirms a real regression") {
    // Counter-case to the #9 gate: the tightened bar must not neuter the
    // ratchet under host_phase when the children are genuinely clean.
    // Inject a real 2x regression into the archived r16 band row and give
    // the children probes at exactly baseline: both children healthy,
    // both breaching => CONFIRMED, exit 1.
    val reg = "q_substring_dedup"
    val regVal = r16Baseline(reg) * 2.0
    var childCalls = 0; var sleeps = 0
    val verdict = decide(
      board = r16Board, execOrder = r16Board.keys.toSeq.sorted,
      baseline = r16Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => {
        childCalls += 1
        names.map(n => n -> (if (n == reg) regVal
        else r16Baseline.getOrElse(n, 1.0))).toMap
      },
      sleep = () => sleeps += 1)
    assert(verdict.hostPhase && childCalls == 2 && sleeps == 1)
    assert(verdict.failed && verdict.confirmed.map(_.name) == Seq(reg))
    assert(verdict.cleared.size == 12,
      "the other 12 archived flags clear through the healthy children")
  }

  // ---- synthetic boards built on the archived baseline ---------------

  /** Board identical to baseline (drift exactly 1.0) with overrides. */
  private def syntheticBoard(overrides: Map[String, Double]): Map[String, Double] =
    r15Baseline ++ overrides

  private def cleanChild(overrides: Map[String, Double])(names: Seq[String]): Map[String, Double] =
    names.map(n => n -> overrides.getOrElse(n, r15Baseline.getOrElse(n, 1.0))).toMap

  test("injected 2x single-row regression with a healthy child => CONFIRMED, exit 1") {
    // q_label_prop: a real row with baseline comfortably above the 0.3 s
    // absolute gate, alphabetically isolated from other flags
    val b = r15Baseline("q_label_prop")
    val reg = Map("q_label_prop" -> b * 2.0)
    var sleeps = 0
    val verdict = decide(
      board = syntheticBoard(reg), execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => cleanChild(reg)(names),
      sleep = () => sleeps += 1)
    assert(verdict.flagged.map(_.name) == Seq("q_label_prop"))
    assert(!verdict.hostPhase && sleeps == 0,
      "one isolated row is not a host-phase band")
    assert(verdict.failed && verdict.confirmed.map(_.name) == Seq("q_label_prop"))
    assert(!verdict.deferred && verdict.suspects.isEmpty)
  }

  test("clean board runs ZERO confirmation children (ADVICE r15)") {
    val verdict = decide(
      board = r15Baseline, execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (_, _) => fail("clean board must not spawn a child"),
      sleep = () => fail("no sleep on a clean board"))
    assert(!verdict.failed && !verdict.deferred && verdict.flagged.isEmpty)
    assert(verdict.drift.exists(d => math.abs(d - 1.0) < 1e-9))
  }

  /** Five baseline rows adjacent in sorted order with baselines above the
    * absolute gate — a synthetic band site. */
  private lazy val bandRows: Seq[String] = {
    val names = r15Baseline.keys.toSeq.sorted
    names.sliding(5).find(w => w.forall(n => r15Baseline(n) > 0.4) &&
      w.forall(n => !Bench.noiseClass.contains(n)))
      .getOrElse(fail("no 5 adjacent rows with baseline > 0.4 in fixture"))
  }

  test("host-phase band that a healthy child clears => exit 0, one child only") {
    val band = bandRows.map(n => n -> r15Baseline(n) * 2.5).toMap
    var childCalls = 0
    val verdict = decide(
      board = syntheticBoard(band), execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => { childCalls += 1; cleanChild(Map.empty)(names) },
      sleep = () => fail("all rows cleared by child #1: no second child"))
    assert(verdict.hostPhase, s"5 adjacent flags must read as a band: $bandRows")
    assert(childCalls == 1 && !verdict.failed && !verdict.deferred)
    assert(verdict.cleared.toSet == band.keySet)
  }

  test("real regression INSIDE a host-phase band needs BOTH time-separated children") {
    val real = bandRows.head
    val band = bandRows.map(n => n -> r15Baseline(n) * 2.5).toMap
    var childCalls = 0; var sleeps = 0
    val verdict = decide(
      board = syntheticBoard(band), execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) => {
        childCalls += 1
        cleanChild(Map(real -> r15Baseline(real) * 2.5))(names)
      },
      sleep = () => sleeps += 1)
    assert(verdict.hostPhase && childCalls == 2 && sleeps == 1)
    assert(verdict.failed && verdict.confirmed.map(_.name) == Seq(real))
    assert(verdict.confirmed.head.freshNormalized.flatten.size == 2,
      "both children's normalized values stamped in the artifact")
    assert(verdict.cleared.toSet == band.keySet - real)
  }

  test("child that produces no number for a flagged row keeps the flag loud") {
    val b = r15Baseline("q_label_prop")
    val verdict = decide(
      board = syntheticBoard(Map("q_label_prop" -> b * 2.0)),
      execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (names, _) =>
        cleanChild(Map.empty)(names.filterNot(_ == "q_label_prop")),
      sleep = () => ())
    assert(verdict.failed && verdict.confirmed.map(_.name) == Seq("q_label_prop"))
    assert(verdict.confirmed.head.freshNormalized == Seq(None))
  }

  test("fast-host phase (drift < 1): latency-bound rows AT baseline are not flagged") {
    // Replay of the first r16 board-2 firing: probes ran at 0.795x
    // baseline (fast phase) while two iteration-heavy rows sat at raw
    // 1.03x / 1.08x their baselines — dividing by the sub-1 drift
    // inflated them to 1.40x / 1.57x "regressions". Drift is a
    // slowdown-corrector only: judging clamps at 1.0.
    val fastDrift = 0.795
    val board = r15Baseline.map { case (n, b) =>
      n -> (if (n == "q_dup_provenance") b * 1.034
      else if (n == "q_fs_linkage") b * 1.083
      else b * fastDrift)
    }
    val verdict = decide(
      board = board, execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      runChild = (_, _) => fail("raw-at-baseline rows must not flag"),
      sleep = () => fail("no sleep"))
    assert(verdict.drift.exists(d => math.abs(d - fastDrift) < 1e-9),
      "measured drift reported verbatim")
    assert(verdict.flagged.isEmpty && !verdict.failed)
  }

  test("fast-host phase: a REAL 2x regression still trips in raw time") {
    val b = r15Baseline("q_label_prop")
    val board = r15Baseline.map { case (n, v) =>
      n -> (if (n == "q_label_prop") b * 2.0 else v * 0.8)
    }
    val verdict = decide(
      board = board, execOrder = r15Baseline.keys.toSeq.sorted,
      baseline = r15Baseline, probeSet = Bench.probeSet,
      noiseNames = Bench.noiseClass.toSet,
      // child also on the fast host: probes 0.8x, the row still 2x raw
      runChild = (names, _) => names.map(n =>
        n -> (if (n == "q_label_prop") b * 2.0
        else r15Baseline.getOrElse(n, 1.0) * 0.8)).toMap,
      sleep = () => ())
    assert(verdict.flagged.map(_.name) == Seq("q_label_prop"))
    assert(verdict.failed && verdict.confirmed.map(_.name) == Seq("q_label_prop"))
  }

  // ---- unit pieces ----------------------------------------------------

  test("shuffledOrder: deterministic permutation, seed-sensitive") {
    val names = ('a' to 'z').map(c => s"q_$c")
    val s1 = shuffledOrder(names, 1L)
    assert(s1 == shuffledOrder(names, 1L))
    assert(s1.sorted == names)
    assert(s1 != shuffledOrder(names, 2L))
    assert(s1 != names, "26 names must actually move under seed 1")
  }

  test("maxBandSize: gaps up to bandGap stay one band, larger gaps split") {
    val order = (0 until 100).map(i => f"q_$i%03d")
    assert(maxBandSize(Set("q_010", "q_011", "q_012", "q_013"), order) == 4)
    // gap of 3 unflagged rows still bridges; gap of 4 splits
    assert(maxBandSize(Set("q_010", "q_014", "q_018"), order) == 3)
    assert(maxBandSize(Set("q_010", "q_015"), order) == 1)
    assert(maxBandSize(Set("q_010", "q_030", "q_050", "q_070"), order) == 1)
    assert(maxBandSize(Set.empty, order) == 0)
  }

  test("localDrift normalizes by the probes NEAREST in execution order") {
    // row at position 0; near probes (positions 1-3) stalled at 2x,
    // far probes (positions 90+) healthy at 1x
    val probes = (1 to 6).map(i => s"p_$i")
    val order = Seq("row") ++ probes.take(3) ++
      (1 to 86).map(i => s"filler_$i") ++ probes.drop(3)
    val baseline = (probes.map(_ -> 1.0) :+ ("row" -> 1.0)).toMap
    val child = Map("row" -> 2.0, "p_1" -> 2.0, "p_2" -> 2.0, "p_3" -> 2.0,
      "p_4" -> 1.0, "p_5" -> 1.0, "p_6" -> 1.0)
    val d = localDrift("row", order, child, baseline, probes, localK = 3)
    assert(d.contains(2.0), s"nearest-3 probes all read 2x: $d")
    // global median over all 6 would be 1.5 — the differential-stall
    // under-correction the local form exists to avoid
    assert(childDrift(child, baseline, probes, minProbes = 6).contains(1.5))
  }
}
