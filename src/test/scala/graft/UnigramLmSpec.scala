package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.UnigramLm
import graft.plans.UnigramCodec

class UnigramLmSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Independent reference: enumerate EVERY segmentation (pieces up to
    * maxLen, unknown single chars at OovCost) and pick the codec's
    * (cost, n, path) minimum. */
  private def brute(word: String, costs: Map[String, Long], maxLen: Int): (Seq[String], Long) = {
    def segs(s: String): Seq[List[String]] =
      if (s.isEmpty) Seq(Nil)
      else (1 to math.min(maxLen, s.length)).flatMap { l =>
        val h = s.substring(0, l)
        if (costs.contains(h) || l == 1) segs(s.substring(l)).map(h :: _)
        else Seq.empty
      }
    val all = segs(word).map { ps =>
      val c = ps.map(p => costs.getOrElse(p, UnigramCodec.OovCost)).sum
      (ps, c, ps.length, ps.mkString("|"))
    }
    val best = all.minBy { case (_, c, n, path) => (c, n, path) }
    (best._1, best._2)
  }

  test("Viterbi ≡ exhaustive enumeration on randomized cost tables") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    for (trial <- 1 to 30) {
      val vocabPieces = (1 to 12).map { _ =>
        val len = 1 + rnd.nextInt(3)
        (1 to len).map(_ => alphabet(rnd.nextInt(3))).mkString
      }.distinct
      val costs = vocabPieces.map(p => p -> (50L + rnd.nextInt(20))).toMap
      val codec = new UnigramCodec(costs.toArray.sortBy(_._1))
      for (_ <- 1 to 20) {
        val w = (1 to (1 + rnd.nextInt(7))).map(_ => alphabet(rnd.nextInt(3))).mkString
        val got = codec.segmentWord(w)
        val want = brute(w, costs, 3)
        assert(got == want, s"trial $trial word '$w': $got vs $want (costs $costs)")
        assert(got._1.mkString("") == w, "segmentation must partition the word")
      }
    }
  }

  test("hard-EM reinforces used pieces and drops unused multi-char pieces") {
    val docs = (1 to 50).map(i => (i.toLong, "tables tables stable"))
      .toDF("doc_id", "text")
    val m = UnigramLm.train(docs, "text", maxPieceLen = 4, rounds = 2)
    val pieceSet = m.pieces.map(_._1).toSet
    // all single chars of the corpus survive
    assert("tables".toSet.forall(c => pieceSet.contains(c.toString)))
    // the shared 4-gram 'able'/'tabl' family: only pieces some Viterbi
    // path actually used survive the recounts
    val multi = m.pieces.filter(_._1.length > 1)
    assert(multi.nonEmpty, "EM must keep some used multi-char pieces")
    val codec = m.codec
    val used = Seq("tables", "stable").flatMap(w => codec.segmentWord(w)._1).toSet
    assert(multi.forall(p => used.contains(p._1)),
      s"every surviving multi-char piece must be used by a final segmentation: " +
        s"${multi.map(_._1)} vs used $used")
    // frequent pieces are cheap: a used 4-gram costs less than a rare single
    val costMap = m.pieces.toMap
    val usedMulti = multi.map(_._1)
    assert(usedMulti.forall(p => costMap(p) <= UnigramCodec.OovCost))
  }

  test("encode: pieces concatenate back to the words; OOV char falls back") {
    val docs = Seq((1L, "tables stable"), (2L, "zzz")).toDF("doc_id", "text")
    val m = UnigramLm.train(docs.filter($"doc_id" === 1L), "text",
      maxPieceLen = 4, rounds = 2)
    val enc = UnigramLm.encode(docs, "doc_id", "text", m)
      .select($"doc_id", $"pieces").as[(Long, Seq[String])].collect().toMap
    assert(enc(1L).mkString("") == "tablesstable")
    // 'z' never trained: byte-fallback singles, never a crash or <unk> loss
    assert(enc(2L) == Seq("z", "z", "z"))
  }

  test("training is deterministic and partitioning-independent") {
    val docs = (1 to 40).map(i => (i.toLong, s"batch merge spark merge table"))
      .toDF("doc_id", "text")
    val a = UnigramLm.train(docs.repartition(1), "text", 4, 2)
    val b = UnigramLm.train(docs.repartition(7, $"doc_id"), "text", 4, 2)
    assert(a == b, "model must be a pure function of the corpus")
    assert(a.pieces == a.pieces.sortBy(_._1), "piece table is canonically sorted")
    assert(a.maxWordLen == 5)
  }

  test("maxVocab guard fires on an over-bounded vocabulary") {
    val docs = (1 to 60).map(i => (i.toLong, s"w$i")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      UnigramLm.train(docs, "text", maxPieceLen = 4, rounds = 1, maxVocab = 10)
    }
    assert(e.getMessage.contains("maxVocab"))
  }
}
