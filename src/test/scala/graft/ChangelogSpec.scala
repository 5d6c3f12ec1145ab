package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Changelog

class ChangelogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // a keyed change stream: (key, seq, op, value)
  val changes = Seq(
    ("a", 1L, "upsert", 10.0),
    ("a", 2L, "upsert", 20.0),
    ("a", 3L, "delete", 0.0),
    ("b", 1L, "upsert", 1.0),
    ("b", 5L, "upsert", 2.0),
    ("c", 7L, "delete", 0.0),
    ("d", 2L, "upsert", 4.0),
  ).toDF("k", "seq", "op", "v")

  test("scd2: intervals chain with no gaps, exactly one open interval per key") {
    val h = Changelog.scd2(changes, key = Seq("k"), seq = Seq("seq"))
      .select($"k", $"seq", $"valid_from", $"valid_to", $"is_current")
      .as[(String, Long, Long, Option[Long], Boolean)]
      .collect().sortBy(r => (r._1, r._2))
    // every version appears, valid_from is its own seq
    assert(h.length == 7 && h.forall(r => r._3 == r._2))
    // per key: each valid_to equals the NEXT version's valid_from (no gap,
    // no overlap), and only the last interval is open/current
    h.groupBy(_._1).foreach { case (_, vs) =>
      vs.sliding(2).filter(_.length == 2).foreach { case Array(prev, next) =>
        assert(prev._4.contains(next._3) && !prev._5)
      }
      assert(vs.last._4.isEmpty && vs.last._5)
      assert(vs.init.forall(!_._5))
    }
  }

  test("cdcApply: latest version wins, trailing delete removes the key") {
    val snap = Changelog.cdcApply(changes, key = Seq("k"), seq = Seq("seq"),
        opCol = col("op"), deleteOp = "delete")
      .select($"k", $"seq", $"v").as[(String, Long, Double)]
      .collect().sortBy(_._1)
    // a: latest is delete → gone; c: only record is delete → gone
    assert(snap.map(_._1).toSeq == Seq("b", "d"))
    assert(snap.find(_._1 == "b").get._2 == 5L && snap.find(_._1 == "b").get._3 == 2.0)
    assert(snap.find(_._1 == "d").get._3 == 4.0)
  }

  test("cdcApply: a delete FOLLOWED by an upsert resurrects the key") {
    val resurrect = changes.union(Seq(("c", 9L, "upsert", 3.0)).toDF("k", "seq", "op", "v"))
    val snap = Changelog.cdcApply(resurrect, key = Seq("k"), seq = Seq("seq"),
        opCol = col("op"), deleteOp = "delete")
      .select($"k", $"v").as[(String, Double)].collect().toMap
    assert(snap.keySet == Set("b", "c", "d") && snap("c") == 3.0)
  }

  test("scd2/cdcApply are partitioning-independent") {
    val base = Changelog.cdcApply(changes, Seq("k"), Seq("seq"), col("op"), "delete")
      .select($"k", $"seq")
    val shuffled = Changelog.cdcApply(changes.repartition(13), Seq("k"), Seq("seq"),
        col("op"), "delete")
      .select($"k", $"seq")
    assert(base.exceptAll(shuffled).isEmpty && shuffled.exceptAll(base).isEmpty)
  }

  test("snapshotDiff: insert/update/delete, null-safe compares, unchanged keys vanish") {
    val before = Seq(("a", Some(1.0), "x"), ("b", Some(2.0), "y"),
      ("c", None: Option[Double], "z"), ("d", Some(4.0), "w")).toDF("k", "v", "s")
    val after = Seq(("a", Some(1.0), "x"), // unchanged → absent
      ("b", Some(9.0), "y"),               // update (value change)
      ("c", Some(3.0), "z"),               // update (null → value, null-safe)
      ("e", Some(5.0), "q"))               // insert; d deleted
      .toDF("k", "v", "s")
    val got = graft.operators.Changelog.snapshotDiff(
        before, after, key = Seq("k"), cols = Seq("v", "s"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("b" -> "update", "c" -> "update", "d" -> "delete", "e" -> "insert"))
    // before/after columns carry both sides for the MERGE writer
    val row = graft.operators.Changelog.snapshotDiff(
        before, after, Seq("k"), Seq("v", "s"))
      .filter($"k" === "b").head()
    assert(row.getDouble(2) == 2.0 && row.getDouble(3) == 9.0)
  }
}
