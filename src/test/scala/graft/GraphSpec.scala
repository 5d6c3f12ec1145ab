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

  test("triangleCounts: K4 + pendant, duplicate/reversed edges collapse") {
    // K4 on {1,2,3,4} has 4 triangles, each node on 3 of them; node 5 is a
    // pendant (no triangle); duplicates and reversed edges must not double
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val edges = (k4 ++ k4.map(_.swap) ++ Seq((4L, 5L), (1L, 2L))).toDF("src", "dst")
    val got = Graph.triangleCounts(edges).orderBy($"node")
      .as[(Long, Long)].collect()
    assert(got sameElements Array((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("triangleCounts: brute-force parity on a random graph") {
    val rnd = new scala.util.Random(7)
    val edges = (1 to 300).map(_ => (rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      .filter { case (a, b) => a != b }.toDF("src", "dst")
    val got = Graph.triangleCounts(edges).as[(Long, Long)].collect().toMap
    // brute force over the normalized edge set
    val und = edges.as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val exp = scala.collection.mutable.Map[Long, Long]().withDefaultValue(0L)
    for {
      x <- nodes; y <- nodes if y > x && und((x, y))
      z <- nodes if z > y && und((y, z)) && und((x, z))
    } { exp(x) += 1; exp(y) += 1; exp(z) += 1 }
    assert(got == exp.toMap)
  }

  test("clusteringCoefficient: clique=1, pendant=0, bridge in between") {
    // triangle {1,2,3} + pendant 4 on node 3
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("src", "dst")
    val got = Graph.clusteringCoefficient(edges).orderBy($"node")
      .as[(Long, Long, Long, Double)].collect()
    assert(got sameElements Array(
      (1L, 2L, 1L, 1.0), (2L, 2L, 1L, 1.0),
      (3L, 3L, 1L, (2.0 * 1) / (3 * 2)), (4L, 1L, 0L, 0.0)))
  }

  test("kCore peels cascades to the maximal min-degree subgraph; converged flag honest") {
    // K4 {1,2,3,4} + tail 4-5-6 at k=2: round 1 removes only 6 (deg 1),
    // which drops 5 to deg 1; round 2 removes 5; round 3 removes nothing
    // -> converged, survivors = the 2-core (K4, every deg 3)
    val k4 = for (a <- 1 to 4; b <- 1 to 4 if a < b) yield (a.toLong, b.toLong)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 2, rounds = 4).orderBy($"node")
      .as[(Long, Long, Boolean)].collect()
    assert(got sameElements Array(
      (1L, 3L, true), (2L, 3L, true), (3L, 3L, true), (4L, 3L, true)))
    // one round is not enough: 5 survives at deg 1 and the flag says so
    val partial = Graph.kCore(edges, k = 2, rounds = 1).orderBy($"node")
      .as[(Long, Long, Boolean)].collect()
    assert(partial.exists(r => r._1 == 5L && r._2 == 1L) && partial.forall(!_._3))
  }

  test("bfsHops: exact hop distances within the round budget, multi-source min") {
    // path 1->2->3->4->5, plus seed 10 one hop from 4
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 4L)).toDF("src", "dst")
    val seeds = Seq(1L, 10L).toDF("node")
    val got = Graph.bfsHops(edges, seeds, rounds = 3).orderBy($"node")
      .as[(Long, Long)].collect().toMap
    // 4 is distance 1 from seed 10 (not 3 from seed 1); 5 follows at 2
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 2L, 10L -> 0L))
    // one round only reaches radius 1
    val r1 = Graph.bfsHops(edges, seeds, rounds = 1).orderBy($"node")
      .as[(Long, Long)].collect().toMap
    assert(r1 == Map(1L -> 0L, 2L -> 1L, 4L -> 1L, 10L -> 0L))
  }

  test("degreeAssortativity: a star is perfectly disassortative (r = -1)") {
    val star = (1 to 5).map(l => (0L, l.toLong)).toDF("src", "dst")
    val r = Graph.degreeAssortativity(star)
      .select($"n", $"corr").as[(Long, Option[Double])].collect().head
    assert(r._1 == 10L) // 5 edges, symmetrized
    assert(r._2.contains(-1.0))
  }

  test("labelPropagation: barbell splits into its two cliques, direction-independent") {
    // clique {1,2,3} — bridge 3-10 — clique {10,11,12}, one direction only
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 10L),
      (10L, 11L), (10L, 12L), (11L, 12L)).toDF("src", "dst")
    val got = Graph.labelPropagation(edges, rounds = 3)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 3L, 10L, 11L, 12L))
    val lbl = got.toMap
    // min-label tiebreak floods each clique from its smallest id; the
    // bridge does not merge them within 3 rounds
    assert(Seq(1L, 2L, 3L).map(lbl).toSet == Set(1L))
    assert(Seq(10L, 11L, 12L).map(lbl).toSet == Set(10L))
    // symmetrization: reversed edge list gives the identical labeling
    val rev = Graph.labelPropagation(
      edges.select($"dst".as("src"), $"src".as("dst")), rounds = 3)
      .orderBy($"node").as[(Long, Long)].collect()
    assert(rev sameElements got)
  }

  test("pageRank plan depth stays O(1) in iters (per-round checkpoint)") {
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    def planSize(iters: Int): Int =
      Graph.pageRank(edges, iters).queryExecution.optimizedPlan.collect { case p => p }.size
    val p2 = planSize(2)
    val p20 = planSize(20)
    // un-checkpointed, 20 rounds chain ~10x the nodes of 2 rounds; with the
    // per-round checkpoint both plans hang off one materialized RDD scan
    assert(p20 == p2, s"plan grew with iters: $p2 -> $p20")
    // and the deeper run still computes (the iters=3 arithmetic is pinned
    // by the oracle row + the tests above)
    assert(Graph.pageRank(edges, iters = 20).count() == 3)
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
