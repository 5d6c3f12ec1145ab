package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.PqIndex

class PqIndexSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // corpus drawn from a small set of distinct subvector values per
  // subspace: with k >= that count, quantization is LOSSLESS and PQ
  // distance equals true distance — top-k must equal brute force exactly
  test("PQ is exact when the corpus lies on the codebook (lossless regime)") {
    val rnd = new scala.util.Random(5)
    val subVals = Array(Array(0.0, 1.0), Array(3.0, -1.0), Array(-2.0, 2.0), Array(1.0, 1.0))
    def mk(): Array[Float] =
      (0 until 3).flatMap(_ => subVals(rnd.nextInt(4)).map(_.toFloat)).toArray // d=6, m=3
    val emb = (0L until 200L).map(i => (i, mk())).toDF("vec_id", "embedding")
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 3, k = 8, trainLimit = 200)
    val encoded = PqIndex.encode(emb, "vec_id", "embedding", cb)
    val anchor = Array(0.0, 1.0, 3.0, -1.0, -2.0, 2.0)
    val pq = PqIndex.searchTopK(encoded, "vec_id", cb, anchor, topK = 10)
      .as[(Long, Double)].collect()
    // brute-force exact squared L2 against the same anchor
    val brute = emb.as[(Long, Array[Float])].collect()
      .map { case (i, v) =>
        (i, v.map(_.toDouble).zip(anchor).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .sortBy { case (i, dSq) => (dSq, i) }.take(10)
    assert(pq.map(_._1) sameElements brute.map(_._1))
    pq.zip(brute).foreach { case ((_, d1), (_, d2)) => assert(math.abs(d1 - d2) < 1e-9) }
  }

  test("PQ recall on clustered data; codes are bounded and dense") {
    val rnd = new scala.util.Random(11)
    // 4 well-separated cluster centers in 8-dim; points jittered around them
    val centers = Array.fill(4)(Array.fill(8)(rnd.nextGaussian() * 10))
    val emb = (0L until 400L).map { i =>
      val c = centers((i % 4).toInt)
      (i, c.map(x => (x + rnd.nextGaussian() * 0.1).toFloat))
    }.toDF("vec_id", "embedding")
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 4, k = 16, trainLimit = 400)
    val encoded = PqIndex.encode(emb, "vec_id", "embedding", cb)
    assert(encoded.select(max(array_max($"code")), min(array_min($"code")))
      .as[(Int, Int)].head() match { case (mx, mn) => mx < 16 && mn >= 0 })
    val anchor = centers(1).clone()
    val pq = PqIndex.searchTopK(encoded, "vec_id", cb, anchor, topK = 20)
      .as[(Long, Double)].collect().map(_._1)
    // within a tight cluster many points share a code (identical approx
    // distance — ties break by id), so exact-top-k recall is not what
    // coarse PQ promises; what it MUST get right is the cluster: every
    // retrieved id belongs to the anchor's cluster (ids ≡ 1 mod 4)
    assert(pq.length == 20 && pq.forall(_ % 4 == 1), pq.mkString(","))
  }

  test("null and ragged vectors are excluded, never ranked or fatal") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 3.0f, -1.0f)),
      (1L, Array(0.0f, 1.0f, 3.0f, -1.0f)),
      (2L, null.asInstanceOf[Array[Float]]), // null: would sort FIRST as null dist
      (3L, Array(1.0f, 0.0f))                // ragged: would throw under ANSI
    ).toDF("vec_id", "embedding")
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 2, k = 4, trainLimit = 10)
    val encoded = PqIndex.encode(emb, "vec_id", "embedding", cb)
    assert(encoded.select($"vec_id").as[Long].collect().sorted sameElements Array(0L, 1L))
    val top = PqIndex.searchTopK(encoded, "vec_id", cb,
        Array(1.0, 0.0, 3.0, -1.0), topK = 4)
      .as[(Long, Double)].collect()
    assert(top.map(_._1) sameElements Array(0L, 1L)) // reals only, nearest first
  }

  test("IVF-PQ with full probe + lossless codebook equals brute force") {
    val rnd = new scala.util.Random(5)
    val subVals = Array(Array(0.0, 1.0), Array(3.0, -1.0), Array(-2.0, 2.0), Array(1.0, 1.0))
    def mk(): Array[Float] =
      (0 until 3).flatMap(_ => subVals(rnd.nextInt(4)).map(_.toFloat)).toArray
    val emb = (0L until 200L).map(i => (i, mk())).toDF("vec_id", "embedding")
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 3, k = 8, trainLimit = 200)
    val coarse = Array( // any coarse partitioning works at full probe
      Array(0.0, 1.0, 3.0, -1.0, -2.0, 2.0), Array(1.0, 1.0, 0.0, 1.0, 3.0, -1.0))
    val anchor = Array(0.0, 1.0, 3.0, -1.0, -2.0, 2.0)
    val got = PqIndex.ivfPqTopK(emb, "vec_id", "embedding", cb, coarse,
        anchor, topK = 10, nprobe = 2)
      .as[(Long, Double)].collect()
    val brute = emb.as[(Long, Array[Float])].collect()
      .map { case (i, v) =>
        (i, v.map(_.toDouble).zip(anchor).map { case (a, b) => (a - b) * (a - b) }.sum) }
      .sortBy { case (i, dSq) => (dSq, i) }.take(10)
    assert(got.map(_._1) sameElements brute.map(_._1))
    // partial probe: results restricted to probed cells, still k rows ranked
    val partial = PqIndex.ivfPqTopK(emb, "vec_id", "embedding", cb, coarse,
        anchor, topK = 10, nprobe = 1)
      .as[(Long, Double)].collect()
    assert(partial.length == 10 && partial.map(_._2).sameElements(partial.map(_._2).sorted))
  }

  test("published index probe path ≡ in-memory composition (full probe)") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, d, "embeddings")
    val dir = PqIndex.ensure(emb, "vec_id", "embedding", d,
      m = 8, k = 16, coarseNlist = 8)
    val anchor = emb.filter($"vec_id" === 0L)
      .select($"embedding".cast("array<double>")).as[Seq[Double]].head().toArray
    val got = PqIndex.topKFromIndex(spark, dir, "vec_id", anchor,
        anchorId = 0L, topK = 10, nprobe = 8)
      .as[(Long, Double)].collect().toSeq
    // same codebooks trained the same seeded way, scored in memory;
    // encode is per-row deterministic so filtering the anchor before or
    // after encoding is equivalent
    val cb = PqIndex.train(emb, "vec_id", "embedding", m = 8, k = 16)
    val mem = PqIndex.searchTopK(
        PqIndex.encode(emb, "vec_id", "embedding", cb).filter($"vec_id" =!= 0L),
        "vec_id", cb, anchor, topK = 10)
      .as[(Long, Double)].collect().toSeq
    assert(got == mem) // ids AND distances: the parquet round-trip of the
                       // codebooks is exact, so the LUTs are bit-identical
  }

  test("exact twin with a corpus-covering shortlist degenerates to brute force") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, d, "embeddings")
    val n = emb.count().toInt
    // shortlist >= corpus: the ADC stage prunes nothing, so the rerank IS
    // brute force — exact equality in ids and rounded cosines. This pins
    // the retrieve-then-rerank composition independently of codebook
    // quality (the oracle gate separately pins the ADC stage itself).
    val exact = PqIndex.exactTopKReranked(emb, "vec_id", "embedding",
        m = 2, k = 4, iters = 2, dim = 64, anchorId = 0L, topK = 10, shortlist = n)
      .as[(Long, Double)].collect().toSeq
    val brute = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", anchorId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(exact == brute)
    // production shortlist: still 10 rows, descending rounded cosine, and
    // every returned cosine matches the brute-force score for that id
    // (the scoring arithmetic is byte-shared with the gated brute path)
    val short = PqIndex.exactTopKReranked(emb, "vec_id", "embedding",
        m = 2, k = 4, iters = 2, dim = 64, anchorId = 0L, topK = 10, shortlist = 100)
      .as[(Long, Double)].collect().toSeq
    assert(short.length == 10)
    assert(short.map(_._2) == short.map(_._2).sorted.reverse)
    val bruteAll = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", anchorId = 0L, k = n)
      .as[(Long, Double)].collect().toMap
    short.foreach { case (id, c) => assert(bruteAll(id) == c, s"id $id") }
  }

  test("exact IVF-PQ twin: full probe + covering shortlist degenerates to brute force; partial probe scores exactly") {
    val d = "/root/testdata/sf0.001"
    val emb = Tables.load(spark, d, "embeddings")
    val n = emb.count().toInt
    // nprobe = coarseK and shortlist >= corpus: nothing pruned anywhere,
    // so the pipeline must equal brute force exactly
    val full = PqIndex.exactIvfPqTopKReranked(emb, "vec_id", "embedding",
        m = 2, k = 4, iters = 2, dim = 64, coarseK = 4, nprobe = 4,
        anchorId = 0L, topK = 10, shortlist = n)
      .as[(Long, Double)].collect().toSeq
    val brute = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", anchorId = 0L, k = 10)
      .as[(Long, Double)].collect().toSeq
    assert(full == brute)
    // partial probe: a genuine recall trade, but every returned cosine is
    // still the exact brute-force score for its id
    val part = PqIndex.exactIvfPqTopKReranked(emb, "vec_id", "embedding",
        m = 2, k = 4, iters = 2, dim = 64, coarseK = 4, nprobe = 2,
        anchorId = 0L, topK = 10, shortlist = 100)
      .as[(Long, Double)].collect().toSeq
    assert(part.nonEmpty && part.length <= 10)
    assert(part.map(_._2) == part.map(_._2).sorted.reverse)
    val bruteAll = graft.operators.Similarity.bruteForceTopK(
        emb, "vec_id", "embedding", anchorId = 0L, k = n)
      .as[(Long, Double)].collect().toMap
    part.foreach { case (id, c) => assert(bruteAll(id) == c, s"id $id") }
  }
}
