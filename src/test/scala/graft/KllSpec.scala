package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.QuantileSketch
import graft.operators.QuantileSketch.Kll

/** Core-algorithm pins for the KLL sketch (pure JVM — the Spark
  * aggregation path is exercised by the q_quantile_sketch /
  * q_quantile_sketch_merged gates, whose in-plan audits re-assert the
  * same rank bound per run). Rank error is measured the honest way:
  * the TRUE rank of the estimated value vs q·n, not value distance. */
class KllSpec extends AnyFunSuite {

  private def build(vals: Seq[Double], k: Int = 256): Kll =
    vals.foldLeft(QuantileSketch.empty(k))(QuantileSketch.update)

  /** True normalized rank of v in sorted data: fraction of items <= v. */
  private def rankOf(sorted: Vector[Double], v: Double): Double = {
    var lo = 0; var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toDouble / sorted.length
  }

  private def maxRankErr(data: Seq[Double], s: Kll,
                         qs: Seq[Double]): Double = {
    val sorted = data.toVector.sorted
    qs.map { q =>
      math.abs(rankOf(sorted, QuantileSketch.quantile(s, q)) - q)
    }.max
  }

  private val probeQs = (1 to 99).map(_ / 100.0)

  // deterministic low-discrepancy stream (golden-ratio rotation) — no
  // Random: repo determinism discipline
  private def uniformish(n: Int): Seq[Double] =
    (1 to n).map(i => (i * 0.6180339887498949).%(1.0))

  test("exact below capacity: n <= k keeps every item, zero rank error") {
    val data = uniformish(200)
    val s = build(data, k = 256)
    assert(QuantileSketch.totalWeight(s) == 200L)
    assert(maxRankErr(data, s, probeQs) <= 1.0 / 200 + 1e-12)
  }

  test("rank error bound at 50k, uniform-ish and heavy-tailed") {
    val uni = uniformish(50000)
    val heavy = uni.map(x => math.exp(6 * x)) // exp-tilted: long right tail
    for (data <- Seq(uni, heavy)) {
      val s = build(data)
      assert(QuantileSketch.totalWeight(s) == 50000L)
      val err = maxRankErr(data, s, probeQs)
      assert(err <= 0.03, s"rank error $err > 3% at k=256")
    }
  }

  test("adversarial input order: fully sorted and reverse-sorted streams") {
    // the deterministic-parity worry case: correlated compaction offsets
    // on monotone input — the bound must still hold
    val data = (1 to 50000).map(_.toDouble)
    for (stream <- Seq(data, data.reverse)) {
      val err = maxRankErr(data, build(stream), probeQs)
      assert(err <= 0.03, s"rank error $err > 3% on sorted input")
    }
  }

  test("merge of disjoint shards: same bound, weight conserved") {
    val data = uniformish(48000)
    val shards = data.grouped(6000).map(g => build(g)).toSeq
    val merged = shards.reduce(QuantileSketch.merge)
    assert(merged.n == 48000L)
    assert(QuantileSketch.totalWeight(merged) == 48000L)
    assert(merged.lo == data.min && merged.hi == data.max)
    val err = maxRankErr(data, merged, probeQs)
    assert(err <= 0.03, s"merged rank error $err > 3%")
  }

  test("merge is order-insensitive for the rank contract") {
    val data = uniformish(30000)
    val shards = data.grouped(3000).map(g => build(g)).toVector
    val fwd = shards.reduce(QuantileSketch.merge)
    val rev = shards.reverse.reduce(QuantileSketch.merge)
    for (m <- Seq(fwd, rev)) {
      assert(QuantileSketch.totalWeight(m) == 30000L)
      assert(maxRankErr(data, m, probeQs) <= 0.03)
    }
  }

  test("extremes are exact; memory stays bounded") {
    val data = uniformish(100000)
    val s = build(data)
    assert(QuantileSketch.quantile(s, 0.0) == data.min)
    assert(QuantileSketch.quantile(s, 1.0) == data.max)
    // KLL geometric schedule: sum of caps <= 3k retained items, ever
    val retained = s.levels.map(_.size).sum
    assert(retained <= 3 * 256, s"retained $retained items > 3k")
  }
}
