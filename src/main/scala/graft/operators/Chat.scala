package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** SFT CHAT-TRANSCRIPT PREP — the supervised-fine-tuning stage of the
  * LLM-data pipeline: multi-turn conversations are role-validated,
  * trailing non-trainable turns trimmed, each turn assigned its
  * LOSS-MASK token span, and whole conversations greedily packed into
  * fixed token-budget training sequences (the
  * [[TextAnalysis.packSequences]] stream shape, which packs flat
  * documents only — this module is its conversation-grain companion).
  *
  * Validation rules (the system/user/assistant alternation audit every
  * SFT ingest runs):
  *  - every role ∈ {system, user, assistant};
  *  - turn 1 is `system` or `user` (at most one system prompt, only
  *    first);
  *  - from turn 2 on, roles strictly alternate user/assistant (a turn
  *    never repeats its predecessor's role, `system` never reappears,
  *    and a leading system prompt is followed by `user`);
  *  - at least one `assistant` turn exists (else nothing is trainable).
  * Conversations failing any rule are dropped whole by [[chatPack]];
  * [[validateConversations]] reports the per-rule flags. A VALID
  * conversation may still END with a user turn — standard practice is
  * to TRUNCATE trailing turns after the last assistant turn rather than
  * drop the conversation, and [[chatPack]] does exactly that (the
  * post-trim "ends with assistant" invariant is spec'd, and the
  * pre-trim flag is reported by the audit).
  *
  * Loss-mask spans: turns are concatenated in turn order; turn i owns
  * token span [tok_start, tok_end) with tok_end − tok_start =
  * n_tokens(i), and `loss_mask` is true exactly on `assistant` turns —
  * the spans a trainer feeds to its masked cross-entropy. Token counts
  * arrive as a column (any tokenizer composes; the gated query uses
  * [[Bpe.encodeAudited]] counts + 1 end-of-turn token).
  *
  * Scale shape: ONE corpus-grain exchange (turns hash-partitioned by
  * conversation), on which the validation windows, the trim filter, and
  * the span cumsum all run back-to-back without re-shuffling; everything
  * after is conversation-grain (≪ corpus) — the per-conv totals reuse
  * the same partitioning, and the pack window runs per SHARD
  * (`conv % shards`), so the packing sort is shards-way parallel, the
  * same writer-task grain a production pack stream shards by.
  *
  * DETERMINISM: `turn` must be unique and non-null within each
  * conversation and `conv` non-negative (the `%`-shard contract);
  * output is then a pure function of the input regardless of partition
  * layout (spec'd by repartition).
  */
object Chat {

  val KnownRoles: Seq[String] = Seq("system", "user", "assistant")

  /** Stage 1 — per-turn ordinals: `__rn` (1-based position by `turn`)
    * and `__prev` (previous turn's role). One window sort per conv. */
  private def withOrdinals(df: DataFrame, conv: String, turn: String,
                           role: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(conv)).orderBy(col(turn))
    df.withColumn("__rn", row_number().over(w))
      .withColumn("__prev", lag(col(role), 1).over(w))
  }

  /** Stage 2 — per-turn rule flags (plain expressions over stage 1, so
    * conversation-grain windows/aggregations can fold them directly). */
  private def rowFlags(role: String): (Column, Column) = {
    val known = col(role).isin(KnownRoles: _*)
    // rn=1: system|user. rn>1: user|assistant, differs from predecessor,
    // and a system prompt is followed by user specifically.
    val alt = when(col("__rn") === 1, col(role).isin("system", "user"))
      .otherwise(col(role).isin("user", "assistant") &&
        col(role) =!= col("__prev") &&
        (col("__prev") =!= "system" || col(role) === "user"))
    (coalesce(known, lit(false)), coalesce(alt, lit(false)))
  }

  /** Conversation-grain VALIDATION AUDIT: one row per conversation with
    * the per-rule flags and the overall verdict. Output: (conv,
    * n_turns, roles_known, starts_ok, alternates_ok, has_assistant,
    * ends_assistant, valid) — `starts_ok` is rule 2 alone,
    * `alternates_ok` rules 2+3 over the later turns, `ends_assistant`
    * the PRE-trim tail (reported, not part of `valid`; see [[chatPack]]'s
    * trim). */
  def validateConversations(df: DataFrame, conv: String, turn: String,
                            role: String): DataFrame = {
    val (known, alt) = rowFlags(role)
    def allOf(c: Column): Column = min(when(c, 1L).otherwise(0L)) === 1
    withOrdinals(df.select(col(conv), col(turn), col(role)), conv, turn, role)
      .groupBy(col(conv))
      .agg(count(lit(1)).as("n_turns"),
        allOf(known).as("roles_known"),
        allOf(when(col("__rn") === 1, col(role).isin("system", "user"))
          .otherwise(lit(true))).as("starts_ok"),
        allOf(alt).as("alternates_ok"),
        (max(when(col(role) === "assistant", 1L).otherwise(0L)) === 1)
          .as("has_assistant"),
        (max_by(col(role), col("__rn")) === "assistant").as("ends_assistant"))
      .withColumn("valid",
        col("roles_known") && col("alternates_ok") && col("has_assistant"))
  }

  /** The validate-and-trim stage every downstream SFT form shares
    * ([[chatPack]]'s token spans, [[renderConversations]]'s template
    * rendering — the mergeTotals shared-semantics rule): drop invalid
    * conversations WHOLE (rules in the object scaladoc), trim turns
    * after the last assistant turn, preserve every input column. One
    * corpus-grain exchange on `conv`; the returned frame keeps that
    * partitioning, so downstream windows on `conv` re-sort without
    * re-shuffling. */
  def keepValidTrimmed(df: DataFrame, conv: String, turn: String,
                       role: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(conv)).orderBy(col(turn))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val (known, alt) = rowFlags(role)
    val staged = withOrdinals(df, conv, turn, role)
      .withColumn("__ok", when(known && alt, 1L).otherwise(0L))
    // conversation validity + trim bound, folded over the SAME exchange
    staged
      .withColumn("__conv_ok", min(col("__ok")).over(full))
      .withColumn("__last_asst",
        max(when(col(role) === "assistant", col("__rn"))).over(full))
      .filter(col("__conv_ok") === 1 && col("__last_asst").isNotNull &&
        col("__rn") <= col("__last_asst"))
      .drop("__rn", "__prev", "__ok", "__conv_ok", "__last_asst")
  }

  /** FLATTEN → MASK → PACK: keep valid conversations, trim turns after
    * the last assistant turn, assign per-turn loss-mask token spans, and
    * pack conversations into `budget`-token sequences per shard
    * (`conv % shards`, packing order = conv ascending — a conversation
    * larger than the budget packs where it starts, the
    * [[TextAnalysis.packSequences]] stream-cut semantics). `nTokens` is
    * the per-turn token count. Output, one row per surviving turn:
    * (shard, conv, turn, role, n_tokens, tok_start, tok_end, loss_mask,
    * conv_tokens, pack_id). */
  def chatPack(df: DataFrame, conv: String, turn: String, role: String,
               nTokens: Column, budget: Long, shards: Int): DataFrame = {
    require(budget > 0, s"chatPack: need budget > 0, got $budget")
    require(shards > 0, s"chatPack: need shards > 0, got $shards")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(conv)).orderBy(col(turn))
    val full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val kept = keepValidTrimmed(
      df.select(col(conv), col(turn), col(role),
        nTokens.cast("long").as("n_tokens")), conv, turn, role)
    // spans over the TRIMMED turns (the filter preserves the conv
    // partitioning, so these windows re-sort without re-shuffling)
    val spanned = kept
      .withColumn("tok_end", sum(col("n_tokens")).over(w))
      .withColumn("tok_start", col("tok_end") - col("n_tokens"))
      .withColumn("loss_mask", col(role) === "assistant")
      .withColumn("conv_tokens", sum(col("n_tokens")).over(full))
      .withColumn("shard", col(conv) % shards)
    // conversation grain (reuses the conv partitioning — no exchange),
    // then the shards-way pack window over ≪-corpus-sized rows
    val convs = spanned.groupBy(col(conv))
      .agg(first(col("shard")).as("shard"),
        first(col("conv_tokens")).as("conv_tokens"))
    val packs = TextAnalysis.packSequences(convs, conv,
        col("conv_tokens"), budget, groupCol = "shard")
      .select(col(conv), col("pack_id"))
    spanned.join(packs, conv)
      .select(col("shard"), col(conv), col(turn), col(role), col("n_tokens"),
        col("tok_start"), col("tok_end"), col("loss_mask"),
        col("conv_tokens"), col("pack_id"))
  }

  /** CHAT-TEMPLATE RENDERING — the other half of the SFT flatten split
    * ([[chatPack]] assigns TOKEN spans; this renders the actual training
    * STRING): after [[keepValidTrimmed]], each turn becomes the segment
    * `<|role|>\n` + text + `\n<|end|>\n` and a conversation is its
    * segments concatenated in turn order — the fixed role-tag template
    * shape every chat SFT corpus ships in (model-specific tags are a
    * constant swap). `n_mask_chars` counts the BODY characters of
    * assistant turns — the characters a trainer unmasks (role tags and
    * non-assistant bodies train masked), so `n_mask_chars / n_chars` is
    * the useful-signal density of the rendered corpus. Per-turn char
    * spans are recoverable from the segment lengths (spec'd); the
    * conversation-grain output keeps rows bounded by conv count while
    * the rendered string is hash-gated byte-for-byte.
    *
    * Scale shape: one exchange on `conv` (shared with the trim stage),
    * one ordered-struct sort per group inside the aggregation — rendered
    * strings live at conversation grain, never collected. Output:
    * (conv, n_turns, rendered, n_chars, n_mask_chars). */
  def renderConversations(df: DataFrame, conv: String, turn: String,
                          role: String, text: String): DataFrame = {
    val kept = keepValidTrimmed(
      df.select(col(conv), col(turn), col(role), col(text)), conv, turn, role)
    val seg = concat(lit("<|"), col(role), lit("|>\n"),
      col(text), lit("\n<|end|>\n"))
    kept.groupBy(col(conv))
      .agg(count(lit(1)).as("n_turns"),
        concat_ws("", transform(
          sort_array(collect_list(struct(col(turn).as("t"), seg.as("s")))),
          x => x.getField("s"))).as("rendered"),
        coalesce(sum(when(col(role) === "assistant",
          length(col(text)).cast("long")).otherwise(0L)), lit(0L))
          .as("n_mask_chars"))
      .select(col(conv), col("n_turns"),
        col("rendered"), length(col("rendered")).cast("long").as("n_chars"),
        col("n_mask_chars"))
  }
}
