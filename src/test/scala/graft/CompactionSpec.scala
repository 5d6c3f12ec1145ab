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

  test("executeOnDir: selective rewrite — data exact, small files merged, big files untouched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/t"
    // 12 micro-batch-sized appends (one small file each) + 1 big file
    (1 to 12).foreach(i =>
      Seq.tabulate(50)(j => (i * 1000L + j, s"row $i $j"))
        .toDF("id", "payload").coalesce(1).write.mode("append").parquet(dir))
    Seq.tabulate(5000)(j => (900000L + j, s"big $j")).toDF("id", "payload")
      .coalesce(1).write.mode("append").parquet(dir)
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def dataFiles() = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
      .map(_.getPath.getName).sorted
    val before = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    val bigName = dataFiles().zip(
      fs.listStatus(new org.apache.hadoop.fs.Path(dir))
        .filter(f => f.isFile && !f.getPath.getName.startsWith("_"))
        .sortBy(_.getPath.getName).map(_.getLen)).maxBy(_._2)._1
    val target = 20L * 1024 // each small file ~2-3 KB, the big one ~50 KB
    val (binsRewritten, filesRemoved) = graft.operators.Compaction
      .executeOnDir(spark, dir, target)
    assert(binsRewritten >= 1 && filesRemoved >= 6,
      s"expected real compaction, got ($binsRewritten, $filesRemoved)")
    val after = spark.read.parquet(dir).as[(Long, String)].collect().sorted.toSeq
    assert(after == before, "compaction must be a pure layout change")
    assert(dataFiles().contains(bigName), "the >= target file must not be rewritten")
    assert(dataFiles().length < before.size / 50 + 2)
    // a second pass finds nothing left to do
    assert(graft.operators.Compaction.executeOnDir(spark, dir, target) == ((0, 0)))
  }

  test("executeOnDir: crash windows repair to exact data") {
    import graft.operators.Compaction
    def freshDir(): String = {
      val dir = java.nio.file.Files.createTempDirectory("graft_compact_crash")
        .toString + "/t"
      (1 to 8).foreach(i =>
        Seq.tabulate(40)(j => (i * 100L + j, s"v$i$j")).toDF("id", "v")
          .coalesce(1).write.mode("append").parquet(dir))
      dir
    }
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def rows(dir: String) = spark.read.parquet(dir)
      .as[(Long, String)].collect().sorted.toSeq

    // window A: stage exists, manifest never published => debris, dropped
    val a = freshDir()
    val expectA = rows(a)
    fs.mkdirs(new org.apache.hadoop.fs.Path(s"${a}_binstage/b0"))
    Compaction.recoverDir(spark, a)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${a}_binstage")))
    assert(rows(a) == expectA)

    // window B: manifest published, crash before ANY commit step — redo
    // completes the compaction exactly. Build the staged state by running
    // the real executor with the commit suppressed: stage+manifest are
    // exactly what executeOnDir writes, so simulate by staging a copy.
    val b = freshDir()
    val expectB = rows(b)
    // stage: merge the first two files the way the executor would
    val names = fs.listStatus(new org.apache.hadoop.fs.Path(b))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).sorted.take(2).toSeq
    spark.read.parquet(names.map(n => s"$b/$n"): _*).coalesce(1)
      .write.mode("overwrite").parquet(s"${b}_binstage/b0")
    val man = new org.apache.hadoop.fs.Path(s"${b}_binstage/_PLAN")
    val out = fs.create(man, true)
    out.write(names.mkString("\n").getBytes("UTF-8")); out.close()
    Compaction.recoverDir(spark, b)
    assert(rows(b) == expectB, "redo must reassemble exactly")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"${b}_binstage")))

    // window C: crash mid-commit (originals deleted, merged not yet
    // moved) — the loss window closes at recovery
    val c = freshDir()
    val expectC = rows(c)
    val namesC = fs.listStatus(new org.apache.hadoop.fs.Path(c))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
      .map(_.getPath.getName).sorted.take(2).toSeq
    spark.read.parquet(namesC.map(n => s"$c/$n"): _*).coalesce(1)
      .write.mode("overwrite").parquet(s"${c}_binstage/b0")
    val manC = new org.apache.hadoop.fs.Path(s"${c}_binstage/_PLAN")
    val outC = fs.create(manC, true)
    outC.write(namesC.mkString("\n").getBytes("UTF-8")); outC.close()
    fs.delete(new org.apache.hadoop.fs.Path(s"$c/${namesC.head}"), false)
    assert(rows(c) != expectC, "mid-commit state must actually be damaged")
    Compaction.recoverDir(spark, c)
    assert(rows(c) == expectC, "recovery must restore every row exactly once")
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
