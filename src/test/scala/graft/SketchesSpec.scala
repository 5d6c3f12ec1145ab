package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sketches

class SketchesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // skewed synthetic keys: 2000 distinct users over 3 shards, heavy dups
  lazy val events = (1 to 20000).map { i =>
    (s"shard${i % 3}", s"user${(i * i) % 2000}")
  }.toDF("shard", "user")

  test("HLL approx distinct lands within the lgK=12 error bound of exact") {
    val exact = events.select($"user").distinct().count()
    val approx = Sketches.approxDistinct(events, Seq.empty, "user")
      .as[Long].head()
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr < 0.05, s"approx=$approx exact=$exact relErr=$relErr")
  }

  test("per-group HLL matches per-group exact within bound") {
    val exact = events.groupBy($"shard").agg(
      org.apache.spark.sql.functions.countDistinct($"user").as("d"))
      .as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinct(events, Seq("shard"), "user")
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      assert(math.abs(a - exact(k)).toDouble / exact(k) < 0.05, s"$k: $a vs ${exact(k)}")
    }
  }

  test("approxDistinctAudited: within-bound passes with exact counts; violated bound raises in-plan") {
    val got = Sketches.approxDistinctAudited(events, Seq("shard"), "user")
      .as[(String, Long, Boolean)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap
    val exact = events.groupBy($"shard").agg(
      org.apache.spark.sql.functions.countDistinct($"user").as("d"))
      .as[(String, Long)].collect().toMap
    assert(got.view.mapValues(_._1).toMap == exact)
    assert(got.values.forall(_._2), "hll_within_bound must be true on honest data")
    // force a violation: lgK=4 (RSE ~26%) against a near-zero tolerance —
    // the audit must fail the QUERY, not return wrong rows
    val many = (1 to 60000).map(i => ("g", s"u$i")).toDF("shard", "user")
    val ex = intercept[Exception] {
      Sketches.approxDistinctAudited(many, Seq("shard"), "user",
        lgK = 4, safety = 1e-4).collect()
    }
    assert(ex.getMessage.contains("HLL estimate outside") ||
      ex.getCause != null && ex.getCause.getMessage.contains("HLL estimate outside"),
      s"unexpected error: ${ex.getMessage}")
  }

  test("union of per-shard sketches ≡ one directly-built sketch (mergeability)") {
    // the 100 TB contract: persisting shard sketches at ingest and merging
    // later must answer exactly what a monolithic build would
    val direct = Sketches.approxDistinct(events, Seq.empty, "user").as[Long].head()
    val merged = Sketches.hllMergeEstimate(
      Sketches.hllShardSketches(events, "shard", "user")).as[Long].head()
    assert(merged == direct)
  }

  test("count-min: never undercounts, tight on heavy hitters") {
    val cms = Sketches.firstSketchBytes(
      Sketches.countMinSketch(events, "user", eps = 0.0005, confidence = 0.99), "cms")
    val truth = events.groupBy($"user").count().as[(String, Long)].collect().toMap
    val n = events.count()
    val hot = truth.maxBy(_._2)
    // heavy hitter: estimate within eps*N of truth (and never below)
    val hotEst = Sketches.cmsEstimate(cms, hot._1)
    assert(hotEst >= hot._2 && hotEst <= hot._2 + (0.0005 * n).ceil.toLong + 1,
      s"hot=$hot est=$hotEst")
    // sampled keys: no undercount ever (the CMS one-sided guarantee)
    truth.take(50).foreach { case (k, c) =>
      assert(Sketches.cmsEstimate(cms, k) >= c, s"undercount for $k")
    }
    // absent key estimates stay within eps*N of zero
    assert(Sketches.cmsEstimate(cms, "user_absent") <= (0.0005 * n).ceil.toLong + 1)
  }
}
