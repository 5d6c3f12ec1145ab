package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.{Dedup, PrefPairs, Sampling}

class PrefPairsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // 20 words differing only in the last: 16 shingles each, 15 shared,
  // jaccard 15/17 = 0.88 >= 0.8
  private val pA = "the quick brown fox jumps over the lazy dog while " +
    "seven silent owls watch from the old oak tree today"
  private val pA2 = "the quick brown fox jumps over the lazy dog while " +
    "seven silent owls watch from the old oak tree tonight" // near-dup of pA
  private val pB = "completely different words appear in this other document here"
  private val pC = "short prompt" // < 5 words: no shingles, always singleton

  private def pairs = Seq(
    (1L, pA, "good answer one", "bad answer one"),
    (2L, pA, "bad answer one", "good answer one"),   // preference FLIP of 1
    (3L, pA2, "good answer two", "bad answer two"),  // prompt near-dup of 1
    (4L, pB, "fine answer", "poor answer"),
    (5L, pB, "fine answer", "poor answer"),          // EXACT dup of 4
    (6L, pC, "yes", "no")
  ).toDF("pair_id", "prompt", "chosen", "rejected")

  private def guarded = {
    val kept = PrefPairs.exactSurvivors(pairs, "pair_id", "prompt", "chosen", "rejected")
    val promptPairs = Dedup.jaccardPairs(
      Dedup.shingles(kept.select($"pair_id", $"prompt"), "pair_id", "prompt", 5),
      "pair_id", 0.8)
    PrefPairs.leakageGuard(kept, "pair_id", promptPairs)
  }

  test("exactSurvivors: identical triple collapses to min id; a flip is NOT an exact dup") {
    val kept = PrefPairs.exactSurvivors(pairs, "pair_id", "prompt", "chosen", "rejected")
      .select($"pair_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 6L), "5 is the exact dup of 4; the flip 2 survives")
  }

  test("leakageGuard: near-dup prompts (incl. the flip) share group and split; stamps correct") {
    val got = guarded
      .select($"pair_id", $"group_id", $"n_group_pairs", $"is_canonical", $"split")
      .as[(Long, Long, Long, Boolean, String)].collect()
      .map(r => r._1 -> r).toMap
    // pairs 1, 2 (flip, same prompt) and 3 (near-dup prompt) form one cluster
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L && got(3L)._2 == 1L)
    assert(Set(got(1L)._5, got(2L)._5, got(3L)._5).size == 1,
      "the whole prompt cluster lands in one split")
    assert(got(1L)._3 == 3L && got(1L)._4 && !got(2L)._4 && !got(3L)._4,
      "cluster size 3, min id canonical")
    // 4 and 6 are singletons
    assert(got(4L)._2 == 4L && got(4L)._3 == 1L && got(4L)._4)
    assert(got(6L)._2 == 6L && got(6L)._3 == 1L && got(6L)._4)
  }

  test("singleton pairs split exactly like plain splitAssign (migration-safe)") {
    val plain = Sampling.splitAssign(
        pairs.filter($"pair_id".isin(4L, 6L)), "pair_id")
      .select($"pair_id", $"split").as[(Long, String)].collect().toMap
    val got = guarded.filter($"pair_id".isin(4L, 6L))
      .select($"pair_id", $"split").as[(Long, String)].collect().toMap
    assert(got == plain)
  }

  test("guard is partition-layout independent") {
    val a = guarded.orderBy($"pair_id").collect()
    val kept7 = PrefPairs.exactSurvivors(
      pairs.repartition(7), "pair_id", "prompt", "chosen", "rejected")
    val pp7 = Dedup.jaccardPairs(
      Dedup.shingles(kept7.select($"pair_id", $"prompt"), "pair_id", "prompt", 5),
      "pair_id", 0.8)
    val b = PrefPairs.leakageGuard(kept7, "pair_id", pp7).orderBy($"pair_id").collect()
    assert(a sameElements b)
  }

  test("rewardMargin: flip pairs negate their source margin; bins floor deterministically") {
    val scored = Seq(
      (1L, 0.71, 0.40),   // healthy pair: margin 0.31 -> bin 3
      (2L, 0.40, 0.71),   // its flip: margin -0.31 -> bin -4 (floor, not trunc)
      (3L, 0.55, 0.55)    // scorer can't separate: margin 0 -> bin 0
    ).toDF("pair_id", "cq", "rq")
    val got = PrefPairs.rewardMargin(scored, $"cq", $"rq")
      .select($"pair_id", $"margin", $"margin_bin")
      .as[(Long, Double, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 0.31 && got(1L)._3 == 3L)
    assert(got(2L)._2 == -0.31 && got(2L)._3 == -4L,
      "negative margins floor DOWN - the annotation-conflict bin")
    assert(got(3L)._2 == 0.0 && got(3L)._3 == 0L)
  }

  test("bestOfN: per-prompt argmax with id tie-break; rejection threshold drops prompts") {
    import graft.operators.Sampling
    val cands = Seq(
      (1L, 10L, 0.2), (1L, 11L, 0.9), (1L, 12L, 0.5), // winner 11
      (2L, 20L, 0.7), (2L, 21L, 0.7),                 // tie -> min id 20
      (3L, 30L, 0.1), (3L, 31L, 0.2)                  // best 0.2 < 0.4: rejected
    ).toDF("prompt_id", "cand_id", "s")
    val got = Sampling.bestOfN(cands, "prompt_id", "cand_id", $"s", minScore = 0.4)
      .select($"prompt_id", $"cand_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 11L, 0.9), (2L, 20L, 0.7)))
    // partition independence
    val re = Sampling.bestOfN(cands.repartition(5), "prompt_id", "cand_id",
        $"s", minScore = 0.4)
      .select($"prompt_id", $"cand_id", $"score")
      .as[(Long, Long, Double)].collect().sortBy(_._1)
    assert(re.toSeq == got.toSeq)
  }

  test("empty input -> empty frame, schema intact") {
    val empty = pairs.limit(0)
    val kept = PrefPairs.exactSurvivors(empty, "pair_id", "prompt", "chosen", "rejected")
    val out = PrefPairs.leakageGuard(kept, "pair_id",
      Seq.empty[(Long, Long)].toDF("doc_a", "doc_b"))
    assert(out.count() == 0 &&
      Seq("group_id", "split", "n_group_pairs", "is_canonical")
        .forall(out.columns.contains))
  }
}
