package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{PqIndex, Similarity}
import graft.streaming.Streaming

/** [[IvfStreamSpec]]'s twin for the compressed index: streaming appends
  * through the frozen coarse quantizer + frozen codebooks must be
  * replay-safe and, in the LOSSLESS regime (corpus on the codebook grid,
  * full probe — where ADC distance IS true distance), probe-identical to
  * a fresh offline rebuild over the union corpus. */
class PqStreamSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // d = 6, m = 3; subspace s of vector i cycles the 4 grid subvalues, so
  // EVERY subvalue appears in any 4-consecutive-id slice: the base build
  // trains on the full grid and stays lossless over every later append
  private val subVals =
    Array(Array(0.0, 1.0), Array(3.0, -1.0), Array(-2.0, 2.0), Array(1.0, 1.0))
  private def mk(i: Int): Array[Float] =
    (0 until 3).flatMap(s => subVals((i + s) % 4).map(_.toFloat)).toArray
  private def df(ids: Range) = ids.map(i => (i.toLong, mk(i))).toDF("vec_id", "embedding")

  test("pq append sink: replay-safe; frozen-codebook encode; rebuild parity; audit") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_pq_stream").toString
    val dir = s"$tmp/pq"
    // offline build on the BASE corpus only; codebooks + coarse stay frozen
    PqIndex.build(df(0 until 40), "vec_id", "embedding", dir,
      m = 3, k = 8, coarseNlist = 2, trainLimit = 40)
    val sink = Streaming.pqAppendSink("vec_id", "embedding", dir) _
    sink(df(40 until 50), 0L)
    sink(df(50 until 60), 1L)
    def codes() = spark.read.parquet(s"$dir/codes")
    assert(codes().count() == 60L)
    // at-least-once delivery: replaying a whole batch changes nothing
    sink(df(40 until 50), 0L)
    assert(codes().count() == 60L)
    assert(codes().select($"vec_id").distinct().count() == 60L)
    // every appended row's (cell, code) equals what the frozen build
    // pipeline would assign: re-derive via a fresh base-index encode of
    // the SAME vectors and diff — zero drift allowed
    val refDir = s"$tmp/pq_ref"
    PqIndex.build(df(0 until 40), "vec_id", "embedding", refDir,
      m = 3, k = 8, coarseNlist = 2, trainLimit = 40)
    val sink2 = Streaming.pqAppendSink("vec_id", "embedding", refDir) _
    sink2(df(40 until 60), 0L) // one batch instead of two: same end state
    val a = codes().select($"vec_id", $"code", $"cell")
    val b = spark.read.parquet(s"$refDir/codes").select($"vec_id", $"code", $"cell")
    assert(a.exceptAll(b).count() == 0L && b.exceptAll(a).count() == 0L)

    // probe parity on the UNION corpus: lossless grid + full probe means
    // both the maintained index and a fresh rebuild over all 60 vectors
    // compute EXACT distances — identical shortlists, identical reranks,
    // for base anchors and appended anchors alike
    val dir2 = s"$tmp/pq_union"
    PqIndex.build(df(0 until 60), "vec_id", "embedding", dir2,
      m = 3, k = 8, coarseNlist = 2, trainLimit = 60)
    val emb = df(0 until 60)
    for (a <- Seq(3L, 41L, 59L)) {
      val anchor = mk(a.toInt).map(_.toDouble)
      def probe(d: String) =
        PqIndex.topKReranked(spark, d, emb, "vec_id", "embedding",
            anchor, a, topK = 5, shortlist = 20, nprobe = 2)
          .as[(Long, Double)].collect().toSeq
      val maintained = probe(dir)
      assert(maintained == probe(dir2) && maintained.size == 5, s"anchor $a")
    }

    // staleness / ADC-recall audit: 20 of 60 postdate the codebooks; at
    // full probe with a corpus-sized shortlist the rerank is exact cosine
    // over everything, so recall is 1.0
    val full = PqIndex.maintenanceAudit(spark, dir, emb, "vec_id", "embedding",
        k = 5, nprobe = 2, shortlist = 60, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(full == ((60L, 20L, 0.333333, Some(1.0))), full.toString)
    // a narrow probe + tight shortlist may lose recall but stays in [0, 1]
    val narrow = PqIndex.maintenanceAudit(spark, dir, emb, "vec_id", "embedding",
        k = 5, nprobe = 1, shortlist = 8, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(narrow._4.exists(r => r >= 0.0 && r <= 1.0), narrow.toString)

    // an index that never appended reports zero staleness, null recall
    val virgin = PqIndex.maintenanceAudit(spark, dir2, emb, "vec_id", "embedding",
        k = 5, nprobe = 2, shortlist = 60, anchors = 4)
      .as[(Long, Long, Double, Option[Double])].collect().head
    assert(virgin == ((60L, 0L, 0.0, None)), virgin.toString)
  }
}
