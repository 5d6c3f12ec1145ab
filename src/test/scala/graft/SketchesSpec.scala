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

  test("KMV pairwise: exact below k, within KMV error above k, vs true intersections") {
    import org.apache.spark.sql.functions._
    val spark2 = spark; import spark2.implicits._
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val truthG = ev.groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n")).as[(String, Long)].collect().toMap
    // exact pairwise intersections (quadratic, fine at test scale)
    val sets = ev.select($"event_type", $"user_id").distinct()
      .as[(String, Long)].collect().groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val got = Sketches.kmvPairwise(ev, "event_type", "user_id", k = 64)
      .as[(String, String, Double, Double, Double, Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b, ea, eb, eu, ej, ei) =>
      val (na, nb) = (truthG(a).toDouble, truthG(b).toDouble)
      val inter = sets(a).intersect(sets(b)).size.toDouble
      val union = sets(a).union(sets(b)).size.toDouble
      // KMV relative std error ~ 1/sqrt(k-1) ≈ 12.6%; allow 4σ
      def within(est: Double, truth: Double) =
        math.abs(est - truth) <= 4.0 * truth / math.sqrt(63.0) + 1.0
      assert(within(ea, na), s"$a est_a $ea vs $na")
      assert(within(eb, nb), s"$b est_b $eb vs $nb")
      assert(within(eu, union), s"($a,$b) est_union $eu vs $union")
      assert(within(ei, inter), s"($a,$b) est_intersection $ei vs $inter")
      assert(ej >= 0.0 && ej <= 1.0)
    }
    // tiny groups (< k distinct) must carry EXACT cardinalities
    val tiny = Sketches.kmvPairwise(
        ev.filter($"user_id" < 20), "event_type", "user_id", k = 64)
      .as[(String, String, Double, Double, Double, Double, Double)].collect()
    val tinySets = ev.filter($"user_id" < 20).select($"event_type", $"user_id")
      .distinct().as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    tiny.foreach { case (a, b, ea, eb, eu, _, ei) =>
      assert(ea == tinySets(a).size.toDouble && eb == tinySets(b).size.toDouble)
      assert(eu == tinySets(a).union(tinySets(b)).size.toDouble)
      assert(ei == tinySets(a).intersect(tinySets(b)).size.toDouble,
        s"($a,$b): below-k intersection must be exact")
    }
  }

  test("kmvPairwise raises when a group loses EVERY prefilter survivor (vanishing-group audit)") {
    // construct the "astronomically unlikely" case deterministically:
    // with k=2 and n_h=100, the prefilter keeps h < 8·2^32/100 (~8% of
    // the space), so a group built ONLY from values hashing into the
    // upper 92% has zero survivors. ~92% of arbitrary strings qualify,
    // so the corpus is easy to mine — the point is that the sketch must
    // RAISE (eagerly, even though the group would emit no pair rows at
    // all), not silently drop the group from every estimate.
    def kmvHash(v: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest((v + "graft-kmv").getBytes("UTF-8"))
        .take(4).map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val thresh = (8L * 4294967296L) / 100L
    val hot = Iterator.from(0).map(i => s"v$i")
      .filter(v => kmvHash(v) >= thresh).take(100).toSeq
    assert(hot.size == 100)
    val df = hot.map(v => ("hot", v)).toDF("g", "v")
    val e = intercept[IllegalStateException] {
      Sketches.kmvPairwise(df, "g", "v", k = 2)
    }
    assert(e.getMessage.contains("vanished"), e.getMessage)
  }
}
