package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RecordLinkage

/** Fellegi–Sunter EM: candidate-window semantics, match/unmatch
  * separation on a planted corpus, and the fixed-point determinism the
  * unrolled oracle depends on. */
class RecordLinkageSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("blockedWindowPairs: rank-adjacent pairs inside each block only") {
    val df = Seq(
      (1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L), (4L, "A", 40L),
      (5L, "B", 5L), (6L, "B", 15L))
      .toDF("id", "blk", "ord")
    val got = RecordLinkage.blockedWindowPairs(df, "id", $"blk", $"ord", window = 2)
      .orderBy($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)))
    val w3 = RecordLinkage.blockedWindowPairs(df, "id", $"blk", $"ord", window = 3)
      .orderBy($"id_a", $"id_b").as[(Long, Long)].collect()
    assert(w3.toSeq == Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L), (5L, 6L)))
  }

  test("emLinkage: planted matches separate from planted unmatches") {
    // 30 all-agree pairs (the planted duplicates) + 170 noise pairs whose
    // fields agree independently with prob ~0.2 (deterministic pattern)
    val rows =
      (1 to 30).map(i => (i.toLong, (i + 1000).toLong, 1L, 1L, 1L)) ++
        (1 to 170).map { i =>
          (2000L + i, 3000L + i,
            if (i % 5 == 0) 1L else 0L, if (i % 7 == 0) 1L else 0L,
            if (i % 4 == 0) 1L else 0L)
        }
    val pairs = rows.toDF("id_a", "id_b", "a_type", "a_time", "a_val")
    val (scored, ps) = RecordLinkage.emLinkage(
      pairs, Seq("a_type", "a_time", "a_val"), epochs = 3)
    val got = scored.as[(Long, Long, Long, Long, Long, Long, Boolean)].collect()
    val (matches, rest) = got.partition(_._1 <= 30)
    assert(matches.forall(_._7), "all planted duplicates must be matches")
    assert(matches.forall(_._6 > 90000L))
    // no fully-disagreeing noise pair may cross the threshold
    assert(rest.filter(r => r._3 + r._4 + r._5 == 0L).forall(!_._7))
    // learned m must dominate u on every field
    assert(ps.m.zip(ps.u).forall { case (m, u) => m > u }, ps.toString)
  }

  test("emLinkage: identical trajectory under any partitioning") {
    val rows = (1 to 100).map { i =>
      (i.toLong, (i + 500).toLong,
        if (i % 3 == 0) 1L else 0L, if (i % 2 == 0) 1L else 0L,
        if (i % 6 == 0) 1L else 0L)
    }
    val df = rows.toDF("id_a", "id_b", "a_type", "a_time", "a_val")
    val (s1, p1) = RecordLinkage.emLinkage(df, Seq("a_type", "a_time", "a_val"))
    val (s2, p2) = RecordLinkage.emLinkage(df.repartition(13),
      Seq("a_type", "a_time", "a_val"))
    assert(p1.p == p2.p && p1.m.sameElements(p2.m) && p1.u.sameElements(p2.u))
    assert(s1.orderBy($"id_a").collect() sameElements s2.orderBy($"id_a").collect())
  }

  test("emLinkage: loud failure on an empty pair frame") {
    val empty = Seq.empty[(Long, Long, Long, Long, Long)]
      .toDF("id_a", "id_b", "a_type", "a_time", "a_val")
    val e = intercept[IllegalArgumentException](
      RecordLinkage.emLinkage(empty, Seq("a_type", "a_time", "a_val")))
    assert(e.getMessage.contains("empty pair frame"))
  }
}
