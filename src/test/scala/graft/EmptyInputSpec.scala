package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators._

/** Empty-input robustness: a real pipeline regularly feeds an operator an
  * empty slice (an empty ingest day, a filter that matched nothing). Every
  * operator must either return an empty frame with the right schema or
  * throw its DOCUMENTED loud error — never crash with an incidental
  * exception deep in a plan. */
class EmptyInputSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEmb = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")

  test("text operators: empty corpus -> empty result, schema intact") {
    assert(TextAnalysis.bigramLogProb(noDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.tokenEntropy(noDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.spanCorrupt(noDocs, "doc_id", "text", 5).count() == 0)
    assert(TextAnalysis.sentences(noDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.compressionRatio(noDocs, "doc_id", "text").count() == 0)
    val vocab = TextAnalysis.vocabulary(noDocs, "doc_id", "text", 1L)
    assert(vocab.count() == 0)
    assert(TextAnalysis.oovRate(noDocs, "doc_id", "text", vocab).count() == 0)
  }

  test("capped LSH paths and the KMV sketch: empty corpus -> empty result, guards pass vacuously") {
    // the round-11 candidate caps wrap the banded joins in crossJoin'd
    // stats guards and kmvPairwise gained an eager group-count audit;
    // on an empty slice every one of them must degrade to an empty frame
    // (0 candidates <= factor x 0 is a PASS, 0 groups == 0 sketch groups
    // is a PASS), never divide, raise, or crash
    assert(Dedup.nearDupPairs(noDocs, "doc_id", "text", 5, 0.8).count() == 0)
    assert(Dedup.nearDupPairsSalted(noDocs, "doc_id", "text", 5, 0.8,
      salts = 2, hotMin = 2).count() == 0)
    assert(Similarity.lshCosinePairs(noEmb, "vec_id", "embedding", 0.8).count() == 0)
    assert(Sketches.kmvPairwise(
      Seq.empty[(String, Long)].toDF("g", "v"), "g", "v", k = 4).count() == 0)
    assert(Corpus.nearDupPurge(noDocs, "doc_id", "text", 5, 0.8).count() == 0)
  }

  test("graph operators: empty edge list -> empty result") {
    assert(Graph.triangleCounts(noEdges).count() == 0)
    assert(Graph.clusteringCoefficient(noEdges).count() == 0)
    assert(Graph.kCore(noEdges, k = 2, rounds = 2).count() == 0)
    assert(Graph.pageRank(noEdges, iters = 2).count() == 0)
    val r = Graph.degreeAssortativity(noEdges)
      .select($"n", $"corr").as[(Long, Option[Double])].collect().head
    assert(r._1 == 0L && r._2.isEmpty) // zero pairs -> undefined corr, not a crash
    assert(Graph.bfsHops(noEdges, Seq(1L).toDF("node"), rounds = 2).count() == 1) // seed only
  }

  test("similarity/sampling: empty embeddings -> empty or documented loud failure") {
    assert(Similarity.cosinePairs(noEmb, "vec_id", "embedding", 0.5).count() == 0)
    assert(Similarity.knnGraph(noEmb, "vec_id", "embedding", 3).count() == 0)
    assert(Similarity.quantizeInt8(noEmb, "vec_id", "embedding").count() == 0)
    // kmeans-backed operators REQUIRE k seed rows — the documented loud contract
    intercept[IllegalArgumentException] {
      Clustering.kmeansAssign(noEmb, "vec_id", "embedding", k = 2, iters = 1)
    }
    val noPos = Seq.empty[(Long, Long)].toDF("u", "it")
    assert(Sampling.negativeSample(noPos, "u", "it",
      Seq(1L, 2L).toDF("it"), n = 2).count() == 0)
    assert(Sampling.temperatureMix(Seq.empty[(Long, String)].toDF("id", "g"),
      "id", "g", alpha = 0.5).count() == 0)
  }

  test("relational/profiling: empty input -> empty or single-row-null results") {
    assert(Ops.histogramQuantiles(Seq.empty[(String, Double)].toDF("g", "v"),
      "g", "v", Seq(0.5)).count() == 0)
    assert(Profiler.madOutliers(Seq.empty[(String, Double)].toDF("g", "v"),
      "g", "v").count() == 0)
    val p = Profiler.pearson(Seq.empty[(Double, Double)].toDF("x", "y"), Seq(("x", "y")))
      .select($"n", $"corr").as[(Long, Option[Double])].collect().head
    assert(p._1 == 0L && p._2.isEmpty)
    assert(Profiler.groupTrend(Seq.empty[(String, Double, Double)].toDF("g", "x", "y"),
      "g", "x", "y").count() == 0)
  }

  test("round-6 finale operators: empty input -> empty result, schema intact") {
    assert(TextAnalysis.bm25TopK(noDocs, "doc_id", "text",
      Seq("spark"), k = 5).count() == 0)
    assert(Profiler.winsorizedMean(Seq.empty[(String, Long)].toDF("g", "v"),
      "g", "v").count() == 0)
    assert(Profiler.skewReport(Seq.empty[(String, Long)].toDF("k", "x"),
      Seq("k"), topN = 3).count() == 0)
    assert(Dedup.sortedNeighborhoodPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Graph.labelPropagation(noEdges, rounds = 2).count() == 0)
    // empty PAIRS: every doc is a singleton group and splits like splitAssign
    val docs = Seq(7L, 8L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("doc_a", "doc_b")
    val safe = Sampling.leakageSafeSplit(docs, "doc_id", noPairs)
      .select($"doc_id", $"group_id", $"split").as[(Long, Long, String)].collect()
    val plain = Sampling.splitAssign(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    assert(safe.forall(r => r._2 == r._1 && r._3 == plain(r._1)))
    // and empty DOCS with empty pairs -> empty
    assert(Sampling.leakageSafeSplit(Seq.empty[Long].toDF("doc_id"),
      "doc_id", noPairs).count() == 0)
  }

  test("round-15 operators: empty slice -> empty frame or documented degenerate row") {
    val noKv = Seq.empty[(Long, Long)].toDF("k", "m")
    // globalTopK: no heads, L = 0, no candidates — empty top-k, no crash
    val (topk, audit) = TopK.globalTopKWithAudit(noKv, col("k"), col("m"), 3)
    assert(topk.count() == 0 && audit.lowerBound == 0L && audit.numCandidates == 0L)
    // sparse cosine: empty corpus -> empty pairs through all stages
    assert(SparseSim.cosinePairs(noDocs, "doc_id", "text", 1, 2).count() == 0)
    assert(SparseSim.cosinePairsOver(
      Seq.empty[(Long, String)].toDF("doc_id", "shingle"),
      "doc_id", "shingle", 4, 5).count() == 0)
    // frequent pairs: n_baskets = 0 makes every threshold vacuous — empty
    assert(Itemsets.frequentPairs(
      Seq.empty[(Long, String)].toDF("b", "i"), "b", "i", 1, 2).count() == 0)
    // woeIv / seasonal / cusum / burstiness / readability: group grains
    val noCat = Seq.empty[(String, Boolean)].toDF("cat", "l")
    assert(Profiler.woeIv(noCat, "cat", col("l")).count() == 0)
    val noEv = Seq.empty[(Long, java.sql.Timestamp, Double)].toDF("user_id", "ts", "value")
    assert(Profiler.seasonalProfile(noEv, "ts", "value").count() == 0)
    assert(Profiler.cusumTwoSided(
      noEv.select($"user_id", unix_micros($"ts").as("us"), $"value"),
      "user_id", Seq("us"), "value", 1.0, 10.0).count() == 0)
    assert(Profiler.burstiness(
      noEv.select($"user_id", $"ts", unix_micros($"ts").as("us")),
      "user_id", Seq("us"), "ts").count() == 0)
    assert(TextAnalysis.readability(noDocs, "doc_id", "text").count() == 0)
    // auc over an empty frame: the one-row aggregate survives with nulls
    val r = Profiler.auc(Seq.empty[(Double, Boolean)].toDF("s", "l"), "s", col("l")).head()
    assert((r.isNullAt(0) || r.getLong(0) == 0L) && r.isNullAt(2))
  }

  test("round-16 operators: empty input -> degenerate one-row or empty, never NaN") {
    // spearman: one summary row, n = 0, null rho
    val noKv = Seq.empty[(Long, Long)].toDF("x", "y")
    val sr = Profiler.spearman(noKv, col("x"), col("y")).head()
    assert(sr.getLong(0) == 0L && sr.isNullAt(3))
    // jsDivergence: no tokens -> no term rows at all
    assert(TextAnalysis.jsDivergence(noDocs, "text", lit(true)).count() == 0)
    // zipfFit: one summary row, zero types, null slope/intercept
    val zr = TextAnalysis.zipfFit(noDocs, "text").head()
    assert(zr.getLong(0) == 0L && zr.isNullAt(2) && zr.isNullAt(3))
    // calibration: bin grain over nothing -> empty frame, no crash
    assert(Profiler.calibration(Seq.empty[(Long, Boolean)].toDF("s", "l"),
      "s", col("l"), fpUnit = 100L).count() == 0)
    // classificationReport: class grain over nothing -> empty frame
    assert(Profiler.classificationReport(
      Seq.empty[(String, String)].toDF("a", "p"), col("a"), col("p")).count() == 0)
  }
}
