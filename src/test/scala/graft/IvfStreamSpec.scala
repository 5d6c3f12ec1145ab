package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.IvfIndex
import graft.streaming.Streaming

class IvfStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def vecs(ids: Range): Seq[(Long, Array[Float])] = ids.map { i =>
    (i.toLong, Array.tabulate(6)(j =>
      (math.sin(i * 0.7 + j * 1.3) + math.cos((i % 7) * (j + 1) * 0.41)).toFloat))
  }
  private def df(ids: Range) = vecs(ids).toDF("vec_id", "embedding")

  test("ivf append sink: replay-safe; probe parity with an offline rebuild on the union") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_ivf_stream").toString
    val dir = s"$tmp/ivf"
    // offline build on the BASE corpus only; the codebook stays frozen
    IvfIndex.build(df(0 until 40), "vec_id", "embedding", dir,
      nlist = 4, trainLimit = 40)
    val sink = Streaming.ivfAppendSink("vec_id", "embedding", dir) _
    sink(df(40 until 50), 0L)
    sink(df(50 until 60), 1L)
    def corpus() = spark.read.parquet(s"$dir/corpus")
    assert(corpus().count() == 60L)
    // at-least-once delivery: replaying a whole batch changes nothing
    sink(df(40 until 50), 0L)
    assert(corpus().count() == 60L)
    assert(corpus().select($"vec_id").distinct().count() == 60L)
    // appended vectors landed in codebook-consistent cells: every row's
    // cell equals the frozen quantizer's assignment
    val cents = spark.read.parquet(s"$dir/centroids")
      .orderBy($"cell").collect().map(_.getSeq[Double](1).toArray)
    val misassigned = corpus()
      .withColumn("want", IvfIndex.cellOf($"embedding", cents))
      .filter($"cell" =!= $"want").count()
    assert(misassigned == 0L)

    // probe parity on the UNION corpus: at nprobe = nlist both the
    // maintained index and a fresh offline build over all 60 vectors are
    // exact, so their top-k must agree exactly — for base anchors and
    // appended anchors alike
    val dir2 = s"$tmp/ivf_union"
    IvfIndex.build(df(0 until 60), "vec_id", "embedding", dir2,
      nlist = 4, trainLimit = 60)
    for (a <- Seq(3L, 41L, 59L)) {
      val maintained = IvfIndex.topK(spark, dir, "vec_id", "embedding", a, 5, 4)
        .as[(Long, Double)].collect().toSeq
      val rebuilt = IvfIndex.topK(spark, dir2, "vec_id", "embedding", a, 5, 4)
        .as[(Long, Double)].collect().toSeq
      assert(maintained == rebuilt && maintained.size == 5, s"anchor $a")
    }

    // staleness / recall audit row: 20 of 60 vectors postdate the
    // codebook; at nprobe = nlist the probe is exact so recall is 1.0
    val full = IvfIndex.maintenanceAudit(spark, dir, "vec_id", "embedding",
        k = 5, nprobe = 4, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(full == ((60L, 20L, 0.333333, Some(1.0))), full.toString)
    // a narrow probe may lose recall but the audit stays in [0, 1]
    val narrow = IvfIndex.maintenanceAudit(spark, dir, "vec_id", "embedding",
        k = 5, nprobe = 1, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(narrow._4.exists(r => r >= 0.0 && r <= 1.0), narrow.toString)

    // an index that never appended reports zero staleness, null recall
    val virgin = IvfIndex.maintenanceAudit(spark, dir2, "vec_id", "embedding",
        k = 5, nprobe = 4, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(virgin == ((60L, 0L, 0.0, None)), virgin.toString)
  }
}
