package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Compaction

class CompactionSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def planOf(rows: Seq[(String, Long, Long)], target: Long) =
    Compaction.plan(rows.toDF("part", "fid", "sz"),
        Seq("part"), "fid", "sz", target)
      .select($"part", $"fid", $"sz", $"bin", $"bin_files", $"bin_bytes")
      .orderBy($"part", $"bin", $"fid")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq

  test("hand-computed next-fit-decreasing packing, big files left alone") {
    // partition a, target 100: sizes desc 90,60,50,30,10 →
    // cum-before 0,90,150,200,230 → bins 0,0,1,2,2
    // 120 is ≥ target → bin -1, bin_files 1, its own size
    val got = planOf(Seq(
      ("a", 1L, 60L), ("a", 2L, 90L), ("a", 3L, 10L), ("a", 4L, 50L),
      ("a", 5L, 30L), ("a", 6L, 120L),
      ("b", 7L, 40L)), 100L)
    assert(got == Seq(
      ("a", 6L, 120L, -1L, 1L, 120L),
      ("a", 1L, 60L, 0L, 2L, 150L), ("a", 2L, 90L, 0L, 2L, 150L),
      ("a", 4L, 50L, 1L, 1L, 50L),
      ("a", 3L, 10L, 2L, 2L, 40L), ("a", 5L, 30L, 2L, 2L, 40L),
      ("b", 7L, 40L, 0L, 1L, 40L)), got.toString)
  }

  test("every non-final bin holds at least target/2 (the NFD rewrite bound)") {
    val rows = (1 to 200).map(i =>
      ("p" + (i % 3), i.toLong, (i * 37L % 900L) + 1L))
    val plan = planOf(rows, 1000L)
    val perBin = plan.filter(_._4 >= 0L)
      .groupBy(r => (r._1, r._4)).map { case ((p, b), fs) => (p, b, fs.head._6) }
    val lastBin = perBin.groupBy(_._1).map { case (p, bs) => p -> bs.map(_._2).max }
    perBin.foreach { case (p, b, bytes) =>
      if (b != lastBin(p))
        assert(bytes >= 500L, s"bin ($p,$b) underfilled: $bytes")
      assert(bytes < 1000L + 900L, s"bin ($p,$b) overfilled: $bytes")
    }
  }

  test("plan is deterministic under input partitioning") {
    val rows = (1 to 100).map(i => ("p" + (i % 2), i.toLong, (i * 13L % 500L) + 1L))
    val df = rows.toDF("part", "fid", "sz")
    def run(d: org.apache.spark.sql.DataFrame) =
      Compaction.plan(d, Seq("part"), "fid", "sz", 800L)
        .orderBy($"part", $"bin", $"fid")
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(run(df.repartition(1)) == run(df.repartition(7, $"fid")))
  }
}
