package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Graph

class GraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("pageRank: symmetric pair converges to equal ranks; star center dominates") {
    // two components: a symmetric pair {a,b} and a 4-leaf star around hub
    val edges = (Seq(("a", "b"), ("b", "a")) ++
      Seq("l1", "l2", "l3", "l4").flatMap(l => Seq(("hub", l), (l, "hub"))))
      .toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 3).as[(String, Long)].collect().toMap
    assert(r("a") == r("b"), "symmetric nodes must tie exactly")
    assert(Set("l1", "l2", "l3", "l4").map(r).size == 1, "leaves must tie exactly")
    assert(r("hub") > r("l1"), "the hub must outrank its leaves")
    assert(r("hub") > r("a"), "the hub must outrank the isolated pair")
  }

  test("pageRank: a sink node receives mass but contributes none") {
    // x -> y only: y has no out-edges, its mass leaks (documented semantics)
    val edges = Seq(("x", "y")).toDF("src", "dst")
    val r = Graph.pageRank(edges, iters = 2).as[(String, Long)].collect().toMap
    // x keeps only the damping base after round 1; y gets base + 0.85*x
    assert(r("x") == 150000L)
    assert(r("y") == 150000L + (85L * 150000L) / 100L)
  }

  test("pageRank is partitioning-independent (exact fixed-point)") {
    val rnd = new scala.util.Random(5)
    val edges = (1 to 400).map(_ => (s"n${rnd.nextInt(40)}", s"n${rnd.nextInt(40)}"))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val a = Graph.pageRank(edges, iters = 3)
    val b = Graph.pageRank(edges.repartition(13), iters = 3)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
