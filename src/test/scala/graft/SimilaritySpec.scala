package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Similarity

class SimilaritySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),   // close to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (3L, Array(-1.0f, 0.0f, 0.0f)),  // opposite of 0
    (4L, Array(2.0f, 0.0f, 0.0f))    // colinear with 0
  ).toDF("vec_id", "embedding")

  test("cosine: colinear=1, orthogonal=0, opposite=-1") {
    val a = Seq((Array(1.0f, 2.0f), Array(2.0f, 4.0f), Array(-1.0f, -2.0f), Array(2.0f, -1.0f)))
      .toDF("v", "co", "op", "orth")
    val r = a.select(
      Similarity.cosine($"v", $"co"), Similarity.cosine($"v", $"op"),
      Similarity.cosine($"v", $"orth")).as[(Double, Double, Double)].head()
    assert(math.abs(r._1 - 1.0) < 1e-12 && math.abs(r._2 + 1.0) < 1e-12 && math.abs(r._3) < 1e-12)
  }

  test("brute-force top-k ranks by cosine with anchor excluded") {
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding", 0L, 3)
      .select($"vec_id").as[Long].collect()
    assert(got sameElements Array(4L, 1L, 2L))
  }

  test("cosine pairs at threshold") {
    // cos(0,1)=cos(1,4)≈0.9934, cos(0,4)=1; orthogonal/opposite excluded
    val got = Similarity.cosinePairs(vecs, "vec_id", "embedding", 0.99)
      .orderBy($"vec_a", $"vec_b").select($"vec_a", $"vec_b").as[(Long, Long)].collect()
    assert(got sameElements Array((0L, 1L), (0L, 4L), (1L, 4L)))
  }

  test("IVF with full probing equals brute force; partial probing has real recall") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .as[(Long, Double)].collect()
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, nlist = 8, nprobe = 8)
      .as[(Long, Double)].collect()
    assert(full sameElements brute)
    // partial probe: every result must carry the exact brute-force cosine,
    // and recall@10 vs the true top-10 must clear a floor (spherical
    // quantizer — magnitude differences must not destroy recall)
    val bruteAll = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 499)
      .as[(Long, Double)].collect().toMap
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, nlist = 8, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(partial.length == 10)
    assert(partial.forall { case (v, c) => bruteAll(v) == c })
    // these synthetic embeddings are near-random (max pairwise cosine ≈0.5),
    // so 2-of-8 cells can't recover most of a top-10 that is itself noise;
    // the floor pins the deterministic seeded behavior (observed 4/10) and
    // would catch a quantizer regression to ~random-cell probing (≤2/10)
    val recall = partial.map(_._1).toSet.intersect(brute.map(_._1).toSet).size
    assert(recall >= 4, s"recall@10 with nprobe=2/8 was $recall/10")
  }

  test("IVF spherical quantizer: colinear vectors of different magnitude share a cell") {
    // the raw-L2 failure mode: v and 100*v must quantize identically
    val scaled = Seq(
      (0L, Array(1.0f, 0.2f, 0.0f)), (1L, Array(100.0f, 20.0f, 0.0f)),
      (2L, Array(-1.0f, 5.0f, 0.1f)), (3L, Array(0.1f, 0.1f, 9.0f)),
      (4L, Array(2.0f, 0.4f, 0.0f))).toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(scaled, "vec_id", "embedding", 0L, 2,
      nlist = 2, nprobe = 1)
      .as[(Long, Double)].collect()
    // 1 and 4 are colinear with the anchor (cosine 1.0) — both must be
    // found through a single-probe search
    assert(got.map(_._1).toSet == Set(1L, 4L), got.mkString(","))
    assert(got.forall(_._2 == 1.0))
  }

  test("banded LSH cosine pairs match the exhaustive all-pairs plan on real data") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val exhaustive = Similarity.cosinePairs(emb, "vec_id", "embedding", 0.45)
      .orderBy($"vec_a", $"vec_b").as[(Long, Long, Double)].collect()
    val banded = Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.45)
      .orderBy($"vec_a", $"vec_b").as[(Long, Long, Double)].collect()
    assert(exhaustive.nonEmpty) // planted near-dups must exist, else vacuous
    assert(banded sameElements exhaustive)
  }

  test("IVF index: offline build + full-probe query equals brute force; partial probe prunes") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = java.nio.file.Files.createTempDirectory("graft_ivf_spec").toString
    graft.operators.IvfIndex.build(emb, "vec_id", "embedding", dir, nlist = 8)
    // cell-partitioned corpus on disk (the persistable index layout)
    val cells = new java.io.File(s"$dir/corpus").listFiles()
      .map(_.getName).filter(_.startsWith("cell="))
    assert(cells.length == 8)
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .as[(Long, Double)].collect()
    val full = graft.operators.IvfIndex.topK(spark, dir, "vec_id", "embedding", 0L, 10, nprobe = 8)
      .as[(Long, Double)].collect()
    assert(full sameElements brute)
    // partial probe returns k rows with exact cosines (subset of corpus)
    val bruteAll = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 499)
      .as[(Long, Double)].collect().toMap
    val partial = graft.operators.IvfIndex.topK(spark, dir, "vec_id", "embedding", 0L, 10, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(partial.length == 10 && partial.forall { case (v, c) => bruteAll(v) == c })
  }

  test("a zero vector in the corpus does not abort IVF (zero-safe normalize)") {
    val withZero = vecs.union(Seq((9L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding"))
    val got = Similarity.ivfTopK(withZero, "vec_id", "embedding", 0L, 3,
      nlist = 2, nprobe = 2, trainLimit = 10)
      .as[(Long, Double)].collect()
    // training/assignment survive the zero vector (an unguarded 0/0 aborts
    // the whole query under ANSI), and its undefined cosine is NULL — it
    // cannot displace real cosines from the top-k
    assert(got.map(_._1) sameElements Array(4L, 1L, 2L))
  }

  test("IvfIndex.ensure: fingerprinted cache dir changes when the source data changes") {
    import org.apache.spark.sql.SaveMode
    val sfDir = java.nio.file.Files.createTempDirectory("graft_ivf_fp").toString
    def writeCorpus(n: Int): Unit = (0L until n.toLong)
      .map(i => (i, Array.fill(4)(((i + 7) % 13).toFloat)))
      .toDF("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$sfDir/embeddings.parquet")
    writeCorpus(50)
    val emb1 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir1 = graft.operators.IvfIndex.ensure(emb1, "vec_id", "embedding", sfDir,
      nlist = 2, trainLimit = 50)
    // same data -> same dir, and the publish is complete (reused, not rebuilt)
    val dir1b = graft.operators.IvfIndex.ensure(emb1, "vec_id", "embedding", sfDir,
      nlist = 2, trainLimit = 50)
    assert(dir1 == dir1b)
    // REGENERATED data at the SAME path must map to a DIFFERENT index dir —
    // the 32-bit path-hash cache this replaced served stale results here
    writeCorpus(60)
    val emb2 = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val dir2 = graft.operators.IvfIndex.ensure(emb2, "vec_id", "embedding", sfDir,
      nlist = 2, trainLimit = 60)
    assert(dir2 != dir1, s"stale index dir reused: $dir2")
    // and the fresh index serves the fresh corpus (60 vectors, not 50)
    assert(spark.read.parquet(s"$dir2/corpus").count() == 60)
  }

  test("groupCentroids: exact values, partitioning-independent, null-safe") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 4.0f)),
      ("b", Array(10.0f, 20.0f)), ("b", null.asInstanceOf[Array[Float]]))
      .toDF("g", "embedding")
    val got = Similarity.groupCentroids(df, "g", "embedding")
      .orderBy($"g", $"dim").as[(String, Long, Double)].collect()
    assert(got sameElements Array(
      ("a", 1L, 2.0), ("a", 2L, 3.0), ("b", 1L, 10.0), ("b", 2L, 20.0)))
    // fixed-point sums are order-independent: any repartitioning yields
    // the bit-identical centroid (the property a double avg cannot give)
    val again = Similarity.groupCentroids(df.repartition(13), "g", "embedding")
      .orderBy($"g", $"dim").as[(String, Long, Double)].collect()
    assert(again sameElements got)
  }

  test("semDedup drops smaller-id near-dups within a cluster, keeps cross-cluster dups") {
    // two tight direction groups; k=2 seeds are ids 0 and 1 (one from each
    // group), so the two groups land in different clusters
    val emb = Seq(
      (0L, Array(1.0f, 0.01f, 0.0f)),   // cluster A seed
      (1L, Array(0.0f, 1.0f, 0.01f)),   // cluster B seed
      (2L, Array(1.0f, 0.02f, 0.0f)),   // ≈0 → dropped (0 < 2, same cluster)
      (3L, Array(0.0f, 1.0f, 0.02f)),   // ≈1 → dropped
      (4L, Array(-1.0f, 0.5f, 0.0f))    // similar to nothing → survives
    ).toDF("vec_id", "embedding")
    val got = Similarity.semDedup(emb, "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.9)
      .orderBy($"vec_id").select($"vec_id").as[Long].collect()
    assert(got sameElements Array(0L, 1L, 4L))
    // survivors are partitioning-independent (fixed-point clustering +
    // exact pair predicate)
    val again = Similarity.semDedup(emb.repartition(7), "vec_id", "embedding",
        k = 2, iters = 2, threshold = 0.9)
      .orderBy($"vec_id").select($"vec_id").as[Long].collect()
    assert(again sameElements got)
  }

  test("knnGraph: deterministic ranked neighbors, self excluded") {
    val got = Similarity.knnGraph(vecs, "vec_id", "embedding", k = 2)
      .orderBy($"vec_id", $"rank")
      .select($"vec_id", $"neighbor_id", $"rank").as[(Long, Long, Long)].collect()
    // vec 0: colinear 4 first (cos 1), then 1 (cos ~.9934)
    assert(got.take(2) sameElements Array((0L, 4L, 1L), (0L, 1L, 2L)))
    // every vector has exactly k neighbors, never itself
    assert(got.length == 5 * 2 && got.forall { case (a, b, _) => a != b })
  }

  test("mutualKnnDedup purges mutual near-dups, keeps one-sided attractions") {
    // tight pair {0,1}; 2 orthogonal; 3 far from everything but its top-k
    // still includes others one-sidedly
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.999f, 0.01f, 0.0f)),
      (2L, Array(0.0f, 1.0f, 0.0f)),
      (3L, Array(0.5f, 0.5f, 0.7f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualKnnDedup(emb, "vec_id", "embedding", k = 1, threshold = 0.9)
      .select($"vec_id").orderBy($"vec_id").as[Long].collect()
    // 0 and 1 are each other's top-1 at cos>0.9 -> 1 purged; 2/3 survive
    assert(got sameElements Array(0L, 2L, 3L))
  }

  test("mutualKnnDedupLsh ≡ exhaustive mutualKnnDedup on the real corpus") {
    // the rank lemma in practice: with total candidate recall above the
    // threshold, ranking within banded-LSH candidates reproduces the
    // exhaustive mutual-kNN survivor set row-for-row — at TWO thresholds,
    // so equality isn't an artifact of one operating point
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    for (t <- Seq(0.4, 0.6)) {
      val exact = Similarity.mutualKnnDedup(emb, "vec_id", "embedding", k = 3, threshold = t)
        .select($"vec_id").orderBy($"vec_id").as[Long].collect()
      val lsh = Similarity.mutualKnnDedupLsh(emb, "vec_id", "embedding", k = 3, threshold = t)
        .select($"vec_id").orderBy($"vec_id").as[Long].collect()
      assert(lsh sameElements exact, s"divergence at threshold $t")
    }
  }

  test("lshCosinePairs candidate-count audit: generous cap passes, tight cap raises") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    // generous cap: same rows as the unaudited path (the audit is a guard,
    // not a filter — it must never change the result)
    val plain = Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.45)
      .orderBy($"vec_a", $"vec_b").as[(Long, Long, Double)].collect()
    val audited = Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.45,
        maxCandidatesPerVec = Some(1e6))
      .orderBy($"vec_a", $"vec_b").as[(Long, Long, Double)].collect()
    assert(audited sameElements plain)
    // impossible cap: the plan itself must fail loudly, not return rows
    val e = intercept[Exception] {
      Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.45,
        maxCandidatesPerVec = Some(0.0)).collect()
    }
    assert(e.getMessage.contains("candidates exceed"), e.getMessage)
  }

  test("lshCosinePairs DEFAULT cap raises on an all-hot corpus") {
    // 4200 identical vectors through a single 1-bit band: every pair is a
    // candidate (~8.8M > 2048 x 4200), so the registered production form's
    // default-on audit must fail the job loudly — the 100 TB contract that
    // an accidental all-hot corpus raises instead of running quadratic.
    // (bands=1/rowsPerBand=1 keeps the deliberate blow-up test-sized; the
    // default bands would multiply the same quadratic by 48.)
    val hot = spark.range(4200)
      .select($"id".as("vec_id"),
        typedLit(Array(1.0f, 0.5f)).as("embedding"))
    val e = intercept[Exception] {
      Similarity.lshCosinePairs(hot, "vec_id", "embedding", 0.9,
        bands = 1, rowsPerBand = 1).limit(1).collect()
    }
    assert(e.getMessage.contains("candidates exceed"), e.getMessage)
  }

  test("capped lshCosinePairs is EAGER: an over-cap corpus throws at CALL time") {
    // the round-12 contract (the kmvPairwise discipline): the volume
    // audits run while the plan is BUILT — a caller that never executes
    // the returned frame still hears about the blow-up. No .collect() here
    // on purpose; the construction call itself must raise.
    val hot = spark.range(4200)
      .select($"id".as("vec_id"),
        typedLit(Array(1.0f, 0.5f)).as("embedding"))
    val e = intercept[Exception] {
      Similarity.lshCosinePairs(hot, "vec_id", "embedding", 0.9,
        bands = 1, rowsPerBand = 1): Unit
    }
    assert(e.getMessage.contains("candidates exceed"), e.getMessage)
  }

  test("maxSimTopK: each query vector matches its best token; sums are exact") {
    // doc 10 carries both query directions (maxsim ≈ 2), doc 20 only the
    // first (≈ 1), doc 30 is orthogonal to both (0)
    val toks = Seq(
      (10L, Array(1.0f, 0.0f, 0.0f)), (10L, Array(0.0f, 1.0f, 0.0f)),
      (20L, Array(1.0f, 0.0f, 0.0f)), (20L, Array(0.0f, 0.0f, 1.0f)),
      (30L, Array(0.0f, 0.0f, 1.0f))).toDF("doc", "embedding")
    val query = Seq((0L, Array(1.0f, 0.0f, 0.0f)), (1L, Array(0.0f, 1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.maxSimTopK(toks, "doc", "embedding", query, "vec_id", k = 3)
      .as[(Long, Double, Long)].collect()
    assert(got.map(_._1) sameElements Array(10L, 20L, 30L))
    assert(got(0)._2 == 2.0 && got(1)._2 == 1.0 && got(2)._2 == 0.0, got.mkString(","))
    assert(got.forall(_._3 == 2L)) // every doc scored against both query vectors
  }

  test("hardNegatives: same-label vectors excluded, nearest different-label ranked first") {
    val emb = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f), 1),   // anchor, label 1
      (1L, Array(0.99f, 0.1f, 0.0f), 1),  // same label, nearest — MUST be excluded
      (2L, Array(0.9f, 0.2f, 0.0f), 2),   // different label, near → rank 1
      (3L, Array(0.0f, 1.0f, 0.0f), 2),   // different label, far → rank 2
      (4L, Array(0.0f, 0.0f, 1.0f), 1)    // same label
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
        emb.filter($"vec_id" === 0), k = 2)
      .orderBy($"rank").select($"neg_id", $"rank").as[(Long, Long)].collect()
    assert(got sameElements Array((2L, 1L), (3L, 2L)), got.mkString(","))
  }

  test("withRecallAudit certifies true neighbors and raises on garbage rows") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
    // the exact result audits at recall 1.0
    val ok = Similarity.withRecallAudit(brute, emb, "vec_id", "embedding", 0L, 10, 0.9)
      .select($"recall_at_k").distinct().as[Double].collect()
    assert(ok sameElements Array(1.0))
    // ten arbitrary rows (the WORST ids by cosine) must fail the gate
    val garbage = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 499)
      .orderBy($"cosine".asc).limit(10)
    val ex = intercept[Exception] {
      Similarity.withRecallAudit(garbage, emb, "vec_id", "embedding", 0L, 10, 0.4)
        .collect()
    }
    assert(ex.getMessage.contains("recall"), ex.getMessage)
  }

  test("quantizeInt8: codes bounded, reconstruction within scale, zero vector safe") {
    val df = Seq(
      (1L, Array(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-2.0f, 2.0f, 1.0f, -1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.quantizeInt8(df, "vec_id", "embedding")
      .orderBy($"vec_id")
      .as[(Long, Double, Array[Long], Double)].collect()
    // codes stay within int8 range; the max component maps to +/-127
    assert(got.forall(_._3.forall(c => c >= -127 && c <= 127)))
    assert(got(0)._3(0) == 127L && got(2)._3.take(2).sameElements(Array(-127L, 127L)))
    // reconstruction error bounded by one quantization step
    assert(got.forall(r => r._4 <= r._2 + 1e-12))
    // zero vector: scale 0, all-zero codes, zero error
    assert(got(1)._2 == 0.0 && got(1)._3.forall(_ == 0L) && got(1)._4 == 0.0)
  }

  test("LSH bucket assignment is deterministic and colinear vectors share a bucket") {
    val planes = Similarity.hyperplanes(8, 3)
    val b1 = Similarity.withLshBucket(vecs, "embedding", planes)
      .select($"vec_id", $"lsh_bucket").as[(Long, Long)].collect().toMap
    val b2 = Similarity.withLshBucket(vecs, "embedding", planes)
      .select($"vec_id", $"lsh_bucket").as[(Long, Long)].collect().toMap
    assert(b1 == b2)
    assert(b1(0L) == b1(4L)) // identical direction -> identical sign pattern
  }
}
