package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Recursion

class RecursionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dupProvenance resolves chains and diamonds to the earliest origin with shortest hops") {
    // 1-3, 3-7, 2-7 (diamond into 7), 10-12 (isolated pair), 20 (no pairs)
    val pairs = Seq((1L, 3L), (3L, 7L), (2L, 7L), (10L, 12L))
      .toDF("doc_a", "doc_b")
    val got = Recursion.dupProvenance(spark, pairs)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    // 3 derives from 1 in 1 hop; 7 reaches 1 via 3 (2 hops) — min origin 1,
    // even though 2 is one hop away; 12 from 10; 1, 2, 10 are origins
    // themselves and 20 never appears (no earlier near-dup)
    assert(got == Seq((3L, 1L, 1L), (7L, 1L, 2L), (12L, 10L, 1L)))
  }

  test("dupProvenance on a long chain: depth equals chain length, one row per non-root") {
    val n = 40L
    val chain = (0L until n - 1).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Recursion.dupProvenance(spark, chain)
      .orderBy("doc_id").as[(Long, Long, Long)].collect().toSeq
    assert(got == (1L until n).map(i => (i, 0L, i)))
  }

  test("activitySpine fills gap days with zero and matches hand counts") {
    val ev = Seq(
      (1L, "2024-01-01 10:00:00"), (1L, "2024-01-04 09:00:00"),
      (1L, "2024-01-04 12:00:00"), (2L, "2024-01-02 00:00:00"))
      .toDF("user_id", "s").select(col("user_id"), col("s").cast("timestamp").as("ts"))
    val got = Recursion.activitySpine(ev, "user_id", "ts")
      .orderBy("user_id", "day").as[(Long, Long, Long)].collect().toSeq
    val d0 = 19723L // 2024-01-01 epoch-day
    assert(got == Seq((1L, d0, 1L), (1L, d0 + 1, 0L), (1L, d0 + 2, 0L),
      (1L, d0 + 3, 2L), (2L, d0 + 1, 1L)))
  }

  test("interpolateDaily: straight-line fill between nearest observed days") {
    // user 1: day0 v=10, day3 v=40 -> day1 = 20, day2 = 30 (interpolated);
    //         day5 v=100 -> day4 = (40 + (100-40)*(1/2)) = 70
    // user 2: single day -> one actual row, nothing to fill
    val ev = Seq(
      (1L, "2024-01-01 10:00:00", 4.0), (1L, "2024-01-01 11:00:00", 6.0),
      (1L, "2024-01-04 09:00:00", 40.0), (1L, "2024-01-06 09:00:00", 100.0),
      (2L, "2024-01-02 00:00:00", 7.5))
      .toDF("user_id", "s", "value")
      .select(col("user_id"), col("s").cast("timestamp").as("ts"), col("value"))
    val got = Recursion.interpolateDaily(ev, "user_id", "ts", "value")
      .orderBy($"user_id", $"day")
      .as[(Long, Long, Option[Double], Boolean)].collect().toSeq
    val d0 = 19723L
    assert(got == Seq(
      (1L, d0, Some(10.0), false),
      (1L, d0 + 1, Some(20.0), true),
      (1L, d0 + 2, Some(30.0), true),
      (1L, d0 + 3, Some(40.0), false),
      (1L, d0 + 4, Some(70.0), true),
      (1L, d0 + 5, Some(100.0), false),
      (2L, d0 + 1, Some(7.5), false)), got.toString)
  }

  test("recursive spine ≡ sequence+explode spine on real events (sf0.001)") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val seq1 = Recursion.activitySpine(ev, "user_id", "ts")
      .orderBy("user_id", "day").as[(Long, Long, Long)].collect().toSeq
    val rec = Recursion.activitySpineRecursive(spark, ev, "user_id", "ts")
      .orderBy("user_id", "day").as[(Long, Long, Long)].collect().toSeq
    assert(seq1.nonEmpty && seq1 == rec)
    // densification invariant: per user, days are contiguous and the
    // non-zero days' counts sum to the user's event count
    val byUser = seq1.groupBy(_._1)
    val evCounts = ev.groupBy("user_id").count().as[(Long, Long)].collect().toMap
    byUser.foreach { case (u, rows) =>
      val days = rows.map(_._2)
      assert(days == (days.min to days.max), s"user $u spine not contiguous")
      assert(rows.map(_._3).sum == evCounts(u), s"user $u counts")
    }
  }

  test("withViews drops its temp views and is re-entrant") {
    val df = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    Recursion.dupProvenance(spark, df).collect()
    Recursion.dupProvenance(spark, df).collect() // same logical name, new suffix
    assert(!spark.catalog.listTables().collect()
      .exists(_.name.startsWith("graft_pairs")))
  }
}
