package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.HeavyHitters

/** Two-pass Misra–Gries: summary survival guarantee, exact φ-frequency
  * semantics of the final output, and the partitioning invariance the
  * oracle gate depends on (candidate sets may vary; the verified output
  * may not). */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("mgCandidates: a locally heavy item always survives the sweep") {
    // 60 copies of "hot" interleaved with 120 distinct cold items, k=3:
    // freq(hot) = 60 > 180/4 = n/(k+1), so MG must keep it
    val stream = (0 until 60).flatMap(i =>
      Seq("hot", s"cold_${2 * i}", s"cold_${2 * i + 1}"))
    val out = HeavyHitters.mgCandidates(stream.iterator, k = 3).toSet
    assert(out.contains("hot"), out.toString)
    assert(out.size <= 3)
  }

  test("frequentItems: exactly the items above n/(k+1), with exact counts") {
    // 100 x a, 40 x b, 20 x c, 40 distinct singletons -> n = 200
    // k = 4 -> threshold n/5 = 40: a (100 > 40) qualifies, b (40 = 40)
    // does NOT (strict >), c and singletons don't
    val items = Seq.fill(100)("a") ++ Seq.fill(40)("b") ++ Seq.fill(20)("c") ++
      (1 to 40).map(i => s"s$i")
    val df = items.toDF("x")
    val got = HeavyHitters.frequentItems(df, $"x", k = 4)
      .as[(String, Long, Long)].collect()
    assert(got.toSeq == Seq(("a", 100L, 200L)))
  }

  test("frequentItems: output invariant to partitioning; matches group-by truth") {
    // skewed synthetic stream: item j appears ~ 1000/(j+1) times
    val items = (0 until 40).flatMap(j => Seq.fill(1000 / (j + 1))(s"w$j"))
    val k = 9
    val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * (k + 1) > items.size }
    def run(parts: Int) = HeavyHitters.frequentItems(
        items.toDF("x").repartition(parts), $"x", k)
      .as[(String, Long, Long)].collect()
    val a = run(1); val b = run(17)
    assert(a sameElements b)
    assert(a.map(r => r._1 -> r._2).toMap == truth)
    assert(a.forall(_._3 == items.size.toLong))
    // descending count order with item tiebreak
    assert(a.map(r => (-r._2, r._1)).toSeq == a.map(r => (-r._2, r._1)).toSeq.sorted)
  }
}
