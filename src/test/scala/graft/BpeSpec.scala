package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Bpe

class BpeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("train learns the classic low/lower/lowest merges in frequency order") {
    // corpus: "low" x5, "lower" x2, "newest" x6  (one doc per word instance)
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 4)
    // pair counts, round 1: (l,o)=7, (o,w)=7, (w,e)=2+6=8, (e,s)=6, (s,t)=6,
    // (e,r)=2, (n,e)=6, (e,w)=6  → best (w,e)
    // round 2: low→(l,o)5,(o,w)5 lower→(l,o),(o,we),(we,r) ×2
    // newest→(n,e),(e,we),(we,s),(s,t) ×6 ⇒ (l,o)=7 wins
    // round 3: (lo,w)5; 2s; four pairs at 6 → lexicographic min (e,we)
    assert(model.merges.take(3) == Seq(("w", "e"), ("l", "o"), ("e", "we")))
  }

  test("encode applies merges by rank and reconstructs the input text") {
    val docs = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++ Seq.fill(6)("newest"))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 10)
    val enc = Bpe.encode(docs, "doc_id", "text", model)
      .join(docs, "doc_id")
      .select($"text", $"tokens")
      .as[(String, Seq[String])].collect()
    // every word reassembles from its tokens — BPE is lossless
    enc.foreach { case (text, toks) => assert(toks.mkString("") == text) }
    // frequent whole words become single tokens once their merges trained
    val lowToks = enc.find(_._1 == "low").get._2
    assert(lowToks == Seq("low"), s"expected [low], got $lowToks")
  }

  test("encode handles multi-word docs, unseen chars, and empty text") {
    val train = Seq((1L, "abab abab abab")).toDF("doc_id", "text")
    val model = Bpe.train(train, "text", numMerges = 3)
    val out = Bpe.encode(
        Seq((1L, "abab zq abab"), (2L, ""), (3L, "ab")).toDF("doc_id", "text"),
        "doc_id", "text", model)
      .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    // unseen chars stay single-symbol; word boundaries never merge across
    assert(out(1L).mkString("|").contains("z") && out(1L).mkString("") == "ababzqabab")
    assert(out(2L).isEmpty)
    assert(out(3L) == Seq("ab"))
  }

  test("encode is partitioning-independent and matches an independent reference") {
    // reference BPE apply (greedy lowest-rank merge), implemented separately
    def refEncode(word: String, merges: Seq[(String, String)]): Seq[String] = {
      val rank = merges.zipWithIndex.toMap
      var syms = word.map(_.toString).toVector
      var go = true
      while (go && syms.size > 1) {
        val cands = syms.indices.init
          .flatMap(i => rank.get((syms(i), syms(i + 1))).map(r => (r, i)))
        if (cands.isEmpty) go = false
        else {
          val (_, i) = cands.min
          syms = (syms.take(i) :+ (syms(i) + syms(i + 1))) ++ syms.drop(i + 2)
        }
      }
      syms
    }
    val rnd = new scala.util.Random(3)
    val vocab = Seq("spark", "sparks", "sparking", "parquet", "shuffle", "shuffled")
    val docs = (1 to 300).map(i =>
      (i.toLong, Seq.fill(5)(vocab(rnd.nextInt(vocab.size))).mkString(" ")))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 20)
    val got = Bpe.encode(docs.repartition(7), "doc_id", "text", model)
      .select($"doc_id", $"tokens").as[(Long, Seq[String])].collect().toMap
    val texts = docs.as[(Long, String)].collect().toMap
    texts.foreach { case (id, text) =>
      val expect = text.split("\\s+").filter(_.nonEmpty).toSeq
        .flatMap(w => refEncode(w, model.merges))
      assert(got(id) == expect, s"doc $id: ${got(id)} vs $expect")
    }
  }

  test("train is prefix-stable: train(8) merges = first 8 merges of train(64)") {
    // greedy BPE learns merges one at a time with no lookahead, so a
    // shorter budget must be a prefix of a longer one — the invariant that
    // lets q_bpe_merges' 8-round oracle gate any longer training run of
    // the same model (q_bpe_encode trains with the same 8 rounds, so its
    // oracle replays the exact applied table)
    val docs = Seq((1L, "low lower lowest newest newer new"),
      (2L, "wide wider widest low lower new"), (3L, "banana bandana cabana"))
      .toDF("doc_id", "text")
    val m8 = Bpe.train(docs, "text", numMerges = 8).merges
    val m64 = Bpe.train(docs, "text", numMerges = 64).merges
    assert(m8.length == 8 && m64.take(8) == m8)
  }

  test("encodeAudited ≡ encode on honest input (round-trip audit passes through)") {
    val docs = Seq((1L, "low lower newest"), (2L, "abab zq"), (3L, ""))
      .toDF("doc_id", "text")
    val model = Bpe.train(docs, "text", numMerges = 8)
    val plain = Bpe.encode(docs, "doc_id", "text", model)
      .select($"doc_id", $"tokens", $"n_tokens")
      .as[(Long, Seq[String], Int)].collect().sortBy(_._1)
    val audited = Bpe.encodeAudited(docs, "doc_id", "text", model)
      .select($"doc_id", $"tokens", $"n_tokens")
      .as[(Long, Seq[String], Int)].collect().sortBy(_._1)
    assert(audited sameElements plain)
  }
}
