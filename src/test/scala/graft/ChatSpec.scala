package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.operators.Chat

class ChatSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // hand corpus covering every rule: conv 1 canonical (system,u,a,u,a),
  // conv 2 no-system start (u,a), conv 3 alternation break (u,u),
  // conv 4 assistant start (invalid), conv 5 unknown role,
  // conv 6 valid but trailing user (trim case), conv 7 no assistant,
  // conv 8 system followed by assistant (must be user)
  private def turns = Seq(
    (1L, 0L, "system", 3L), (1L, 1L, "user", 5L), (1L, 2L, "assistant", 7L),
    (1L, 3L, "user", 2L), (1L, 4L, "assistant", 4L),
    (2L, 0L, "user", 6L), (2L, 1L, "assistant", 6L),
    (3L, 0L, "user", 1L), (3L, 1L, "user", 1L),
    (4L, 0L, "assistant", 2L), (4L, 1L, "user", 2L),
    (5L, 0L, "user", 2L), (5L, 1L, "tool", 2L),
    (6L, 0L, "user", 3L), (6L, 1L, "assistant", 8L), (6L, 2L, "user", 9L),
    (7L, 0L, "system", 4L), (7L, 1L, "user", 4L),
    (8L, 0L, "system", 1L), (8L, 1L, "assistant", 1L)
  ).toDF("conv_id", "turn_idx", "role", "n_tokens")

  test("validateConversations: every rule flag falsified by its planted conversation") {
    val got = Chat.validateConversations(turns, "conv_id", "turn_idx", "role")
      .orderBy($"conv_id")
      .select($"conv_id", $"roles_known", $"starts_ok", $"alternates_ok",
        $"has_assistant", $"ends_assistant", $"valid")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, true, true, true, true, true, true)))
    assert(got(2L) == ((2L, true, true, true, true, true, true)))
    assert(got(3L) == ((3L, true, true, false, false, false, false)),
      "user,user breaks alternation")
    assert(got(4L) == ((4L, true, false, false, true, false, false)),
      "assistant start fails rules 2 and 3")
    assert(got(5L)._2 == false && got(5L)._7 == false, "unknown role 'tool'")
    assert(got(6L) == ((6L, true, true, true, true, false, true)),
      "trailing user is VALID (trimmed later), ends_assistant reported false")
    assert(got(7L) == ((7L, true, true, true, false, false, false)),
      "no assistant turn -> nothing trainable")
    assert(got(8L)._4 == false && got(8L)._7 == false,
      "system must be followed by user")
  }

  test("chatPack: invalid convs dropped whole, trailing turns trimmed, ends assistant") {
    val got = Chat.chatPack(turns, "conv_id", "turn_idx", "role",
      $"n_tokens", budget = 100L, shards = 2)
    val convs = got.select($"conv_id").distinct().as[Long].collect().toSet
    assert(convs == Set(1L, 2L, 6L), s"only the valid convs survive: $convs")
    // conv 6's trailing user turn is trimmed; every surviving conv now
    // ends with assistant
    val last = got.groupBy($"conv_id")
      .agg(max_by($"role", $"turn_idx").as("last_role"))
      .as[(Long, String)].collect().toMap
    assert(last.values.forall(_ == "assistant"), s"post-trim tails: $last")
    assert(got.filter($"conv_id" === 6L).count() == 2)
    // conv_tokens reflects the TRIMMED conversation
    val c6 = got.filter($"conv_id" === 6L).select($"conv_tokens")
      .distinct().as[Long].collect()
    assert(c6 sameElements Array(11L), "3+8, the trimmed 9 not counted")
  }

  test("chatPack: spans partition [0, conv_tokens) contiguously; mask exactly on assistant") {
    val rows = Chat.chatPack(turns, "conv_id", "turn_idx", "role",
        $"n_tokens", budget = 100L, shards = 2)
      .orderBy($"conv_id", $"turn_idx")
      .select($"conv_id", $"role", $"n_tokens", $"tok_start", $"tok_end",
        $"loss_mask", $"conv_tokens")
      .as[(Long, String, Long, Long, Long, Boolean, Long)].collect()
    rows.groupBy(_._1).foreach { case (conv, ts) =>
      var expect = 0L
      ts.foreach { case (_, role, n, s, e, mask, _) =>
        assert(s == expect && e == s + n, s"conv $conv span gap at $s")
        assert(mask == (role == "assistant"), s"conv $conv mask")
        expect = e
      }
      assert(expect == ts.head._7, s"conv $conv spans must cover conv_tokens")
      // masked spans are nonempty: something to train on
      assert(ts.exists(_._6), s"conv $conv has no trainable span")
    }
  }

  test("chatPack: shard pack cut law and budget-straddle semantics") {
    // shard 0: convs 2 (12 tok), 6 (11 tok); shard 1: conv 1 (21 tok).
    // budget 12: conv 2 starts at cum 0 -> pack 0; conv 6 starts at 12
    // -> pack 1. conv 1 starts at 0 -> pack 0 despite 21 > 12 (a
    // sequence larger than the budget packs where it STARTS).
    val got = Chat.chatPack(turns, "conv_id", "turn_idx", "role",
        $"n_tokens", budget = 12L, shards = 2)
      .select($"shard", $"conv_id", $"pack_id").distinct()
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 2L, 0L), (0L, 6L, 1L), (1L, 1L, 0L)), s"$got")
  }

  test("chatPack is partition-layout independent") {
    val a = Chat.chatPack(turns, "conv_id", "turn_idx", "role",
      $"n_tokens", budget = 12L, shards = 2).orderBy($"conv_id", $"turn_idx").collect()
    val b = Chat.chatPack(turns.repartition(7), "conv_id", "turn_idx", "role",
      $"n_tokens", budget = 12L, shards = 2).orderBy($"conv_id", $"turn_idx").collect()
    assert(a sameElements b)
  }

  test("renderConversations: byte-exact template, trim applied, mask counts assistant bodies") {
    val withText = turns.withColumn("text",
      concat(lit("t"), $"conv_id", lit("_"), $"turn_idx"))
    val got = Chat.renderConversations(withText, "conv_id", "turn_idx", "role", "text")
      .orderBy($"conv_id")
      .as[(Long, Long, String, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(1L, 2L, 6L), "same survivors as chatPack")
    // conv 2: user then assistant, bodies "t2_0"/"t2_1"
    assert(got(2L)._3 ==
      "<|user|>\nt2_0\n<|end|>\n<|assistant|>\nt2_1\n<|end|>\n")
    assert(got(2L)._4 == got(2L)._3.length.toLong)
    assert(got(2L)._5 == 4L, "mask chars = assistant body length only")
    // conv 6's trailing user turn is trimmed out of the rendering
    assert(got(6L)._2 == 2L && !got(6L)._3.contains("t6_2"))
    // per-turn char spans are recoverable from segment lengths: the
    // rendered string is exactly the concatenation of its segments
    def seg(role: String, body: String) = s"<|$role|>\n$body\n<|end|>\n"
    assert(got(1L)._3 == seg("system", "t1_0") + seg("user", "t1_1") +
      seg("assistant", "t1_2") + seg("user", "t1_3") + seg("assistant", "t1_4"))
  }

  test("renderConversations is partition-layout independent") {
    val withText = turns.withColumn("text",
      concat(lit("t"), $"conv_id", lit("_"), $"turn_idx"))
    val a = Chat.renderConversations(withText, "conv_id", "turn_idx", "role", "text")
      .orderBy($"conv_id").collect()
    val b = Chat.renderConversations(withText.repartition(7), "conv_id",
      "turn_idx", "role", "text").orderBy($"conv_id").collect()
    assert(a sameElements b)
  }

  test("chatPack/validate: empty input -> empty frames, schema intact") {
    val empty = turns.limit(0)
    val v = Chat.validateConversations(empty, "conv_id", "turn_idx", "role")
    assert(v.count() == 0 && v.columns.contains("valid"))
    val p = Chat.chatPack(empty, "conv_id", "turn_idx", "role",
      $"n_tokens", budget = 10L, shards = 2)
    assert(p.count() == 0 && p.columns.contains("pack_id"))
  }
}
