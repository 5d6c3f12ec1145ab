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

  test("IVF with full probing equals brute force; partial probing stays sane") {
    val emb = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
      .as[(Long, Double)].collect()
    val full = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, nlist = 8, nprobe = 8)
      .as[(Long, Double)].collect()
    assert(full sameElements brute)
    val partial = Similarity.ivfTopK(emb, "vec_id", "embedding", 0L, 10, nlist = 8, nprobe = 2)
      .as[(Long, Double)].collect()
    assert(partial.length == 10)
    // approximate results are a subset of the corpus scored with true cosine:
    // no result can beat the true best
    assert(partial.head._2 <= brute.head._2)
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
