package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.SparseSim

class SparseSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("cosinePairs: identical docs score 1.0; disjoint docs never pair") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta gamma"),   // identical to 1 → cos exactly 1
      (3L, "delta epsilon zeta"), // disjoint from 1/2
      (4L, "delta epsilon zeta eta")).toDF("doc_id", "text")
    val got = SparseSim.cosinePairs(docs, "doc_id", "text", 1, 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(!got.contains((1L, 3L)) && !got.contains((2L, 3L)))
    // 3 vs 4 share 3 of 3/4 tokens — well above τ = 0.5
    assert(got.contains((3L, 4L)) && got((3L, 4L)) > 0.5)
  }

  test("prefix filter is lossless: cosinePairs ≡ exhaustive twin on a mixed corpus") {
    val rnd = new scala.util.Random(17)
    val vocabRare = (1 to 120).map(i => s"rare$i")
    val vocabHot = Seq("the", "of", "and") // df-saturated tokens
    val docs = (1L to 80L).map { i =>
      val base = Seq.fill(6)(vocabRare(rnd.nextInt(vocabRare.size)))
      val hot = Seq.fill(4)(vocabHot(rnd.nextInt(vocabHot.size)))
      // planted near-dup pairs: docs 2k and 2k+1 share most rare tokens
      val txt = if (i % 2 == 1 && i > 40) {
        val prev = Seq.fill(6)(vocabRare(((i - 1) * 7 % 120).toInt))
        (prev ++ hot).mkString(" ")
      } else (base ++ hot).mkString(" ")
      (i, txt)
    }.toDF("doc_id", "text")
    def terms(df: org.apache.spark.sql.DataFrame) =
      df.select($"doc_id".as("doc"),
        explode(split(trim(lower($"text")), "\\s+")).as("term"))
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.orderBy($"doc_a", $"doc_b")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    for ((n, d) <- Seq((1L, 2L), (7L, 10L), (9L, 10L))) {
      val fast = canon(SparseSim.cosinePairs(docs, "doc_id", "text", n, d))
      val slow = canon(SparseSim.cosinePairsOverExhaustive(
        terms(docs), "doc", "term", n, d))
      assert(fast == slow, s"tau=$n/$d: ${fast.size} vs ${slow.size}")
      assert(fast.forall(_._3 >= n.toDouble / d - 1e-12))
    }
    // and the registered query's feature shape: 3-gram shingles, same
    // losslessness over the same corpus
    val sh = graft.operators.Dedup.shingles(docs, "doc_id", "text", 3)
    val fastSh = canon(SparseSim.cosinePairsOver(sh, "doc_id", "shingle", 4, 5))
    val slowSh = canon(SparseSim.cosinePairsOverExhaustive(sh, "doc_id", "shingle", 4, 5))
    assert(fastSh == slowSh)
  }

  test("losslessness holds across random corpus shapes (seeded property loop)") {
    for (seed <- Seq(2, 23, 71)) {
      val rnd = new scala.util.Random(seed)
      val vocab = 5 + rnd.nextInt(60) // tiny hot vocabularies AND rare tails
      val docs = (1L to 40L + rnd.nextInt(40)).map { i =>
        val len = 3 + rnd.nextInt(10)
        (i, Seq.fill(len)(s"t${(math.pow(rnd.nextDouble(), 2) * vocab).toInt}")
          .mkString(" "))
      }.toDF("doc_id", "text")
      val tau = Seq((1L, 2L), (3L, 4L), (9L, 10L))(rnd.nextInt(3))
      val fast = SparseSim.cosinePairs(docs, "doc_id", "text", tau._1, tau._2)
        .orderBy($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      val slow = SparseSim.cosinePairsOverExhaustive(
          docs.select($"doc_id".as("doc"),
            explode(split(trim(lower($"text")), "\\s+")).as("term")),
          "doc", "term", tau._1, tau._2)
        .orderBy($"doc_a", $"doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(fast == slow, s"seed=$seed vocab=$vocab tau=$tau: ${fast.size} vs ${slow.size}")
    }
  }

  test("prefix filter actually prunes: hot tokens stay out of prefixes") {
    // every doc shares the hot token; rare tokens are unique per doc —
    // no pair can reach τ = 0.9, and the prefix join must not explode
    // into the hot token's df² candidates
    val docs = (1L to 60L).map(i => (i, s"hot unique${i}a unique${i}b unique${i}c"))
      .toDF("doc_id", "text")
    val got = SparseSim.cosinePairs(docs, "doc_id", "text", 9, 10)
    assert(got.count() == 0L)
    // the exhaustive twin token-joins 60·59/2 pairs through 'hot'; the
    // prefix path's candidate volume is what the operator promises to cut
    // — verify the hot token is in NO doc's prefix by checking a doc's
    // suffix bound directly: w(hot) is tiny (df = 60) vs three rare
    // tokens (df = 1 each), so the rarest-first suffix including 'hot'
    // alone is far below τ²·norm²
    val one = SparseSim.cosinePairsOverExhaustive(
      docs.select($"doc_id".as("doc"),
        explode(split(trim(lower($"text")), "\\s+")).as("term")),
      "doc", "term", 9, 10)
    assert(one.count() == 0L) // same answer, quadratic route
  }

  test("weights are the documented fixed-point definition (floor-quantized idf)") {
    // two docs, term shared by both + one unique each: hand-compute
    // w = tf · ((N+1)·1000 // (df+1)); N = 2
    // shared 'x': df = 2 → idf_fp = 3000 // 3 = 1000, w = 1000
    // unique terms: df = 1 → idf_fp = 3000 // 2 = 1500, w = 1500
    // dot = 1000·1000 = 1e6; norm² each = 1000² + 1500² = 3.25e6
    // cos = 1e6 / 3.25e6 = 0.307692 — below τ = 0.3? no: τ = 3/10 keeps it
    val docs = Seq((1L, "x aa"), (2L, "x bb")).toDF("doc_id", "text")
    val got = SparseSim.cosinePairs(docs, "doc_id", "text", 3, 10)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(got.keySet == Set((1L, 2L)))
    assert(got((1L, 2L)) == math.rint(1e6 / 3.25e6 * 1e6) / 1e6)
    // and τ just above the value excludes it
    assert(SparseSim.cosinePairs(docs, "doc_id", "text", 31, 100).count() == 0L)
  }
}
