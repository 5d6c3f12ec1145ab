package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text analysis for training-data curation: token counting, quality
  * scoring, language-ID heuristics, fingerprinting. Pure per-row Column
  * pipelines — embarrassingly parallel, stay in the scan stage, no shuffle.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword segmentation: letter runs, digit runs, single
    * punctuation — the classic pre-tokenizer regex, counted without
    * materializing tokens. */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))

  /** English stopword hits (word-boundary matches, lowercased). */
  def stopwordHits(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\b(the|a|an|and|of|to|in|is|it|for)\\b"), lit(0))

  /** Per-document statistics: char/word/distinct-word/subword-token counts,
    * average word length, stopword ratio, type-token ratio. */
  def textStats(df: DataFrame, id: String, text: String): DataFrame = {
    // the split is staged in a column so it is computed once per row, not
    // once per consuming output column (flat projections get no CSE; see
    // qualityFlags below — same trap, measured ~7×)
    val w = col("__w")
    df.withColumn("__w", words(col(text)))
      .select(
        col(id),
        length(col(text)).as("n_chars_calc"),
        size(w).as("n_words"),
        size(array_distinct(w)).as("n_distinct_words"),
        size(bpeTokens(col(text))).as("n_tokens"),
        size(stopwordHits(col(text))).as("n_stopwords"),
        (aggregate(transform(w, t => length(t)), lit(0), (acc, v) => acc + v).cast("double")
          / size(w)).as("avg_word_len"))
  }

  /** Composite quality score in [0,1]:
    * 0.4·min(n_words/100, 1) + 0.3·type-token-ratio + 0.3·stopword-ratio.
    * Deterministic per-row double arithmetic (oracle mirrors operand order).
    */
  def qualityScore(df: DataFrame, id: String, text: String): DataFrame =
    textStats(df, id, text).select(
      col(id),
      (least(col("n_words").cast("double") / 100.0, lit(1.0)) * 0.4 +
        (col("n_distinct_words").cast("double") / col("n_words")) * 0.3 +
        (col("n_stopwords").cast("double") / col("n_words")) * 0.3).as("quality"))

  /** N-gram-heuristic language ID: per-language stopword hit counts; the
    * argmax (ties → 'und') is the prediction. Extensible: add a row to
    * `profiles`. */
  val profiles: Seq[(String, String)] = Seq(
    "en" -> "\\b(the|and|of|to|is|in)\\b",
    "de" -> "\\b(der|die|das|und|ist|nicht)\\b",
    "es" -> "\\b(el|la|de|que|y|es)\\b",
    "fr" -> "\\b(le|la|de|et|est|les)\\b")

  def langId(df: DataFrame, id: String, text: String): DataFrame = {
    // each profile's regex scan is staged as a column: the score feeds the
    // per-lang output, the greatest(), AND the argmax chain — inlined flat,
    // every regexp_extract_all would run 3-4× per row (the projection-CSE
    // trap, see qualityFlags)
    val staged = profiles.foldLeft(df) { case (acc, (lang, re)) =>
      acc.withColumn(s"score_$lang",
        size(regexp_extract_all(lower(col(text)), lit(re), lit(0))))
    }
    val scores = profiles.map { case (lang, _) => lang -> col(s"score_$lang") }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    val pred = scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && best > 0, lit(lang)).otherwise(acc)
    }
    // foldRight + overwrite-on-match ⇒ first profile in `profiles` order wins
    // ties, deterministically (the oracle mirrors with a CASE chain).
    val cols = col(id) +: scores.map { case (l, s) => s.as(s"score_$l") } :+ pred.as("pred_lang")
    staged.select(cols: _*)
  }

  /** Rolling-window document fingerprint (winnowing-style, cf. the
    * k-gram fingerprinting scheme of MOSS): hash every rolling k-word
    * window of the document and keep the minimum — robust to local edits
    * (an edit disturbs only the windows it touches), portable (32-bit
    * md5-prefix hashes match the DuckDB oracle bit-for-bit), and
    * equivalent to a 1-permutation MinHash. */
  def winnowFingerprint(df: DataFrame, id: String, text: String, k: Int = 5): DataFrame =
    graft.operators.Dedup.shingles(df, id, text, k)
      .groupBy(col(id))
      .agg(min(conv(substring(md5(col("shingle")), 1, 8), 16, 10).cast("long"))
        .as("winnow_fp"))

  /** Per-document top-k terms by TF-IDF — the corpus-level term-weighting
    * pass behind keyword extraction and topical filtering of a training
    * corpus. Two shuffles total, both on bounded keys: term frequencies
    * aggregate on (doc, term) with map-side combine; document frequencies
    * aggregate the (doc, term) output on term (already one row per
    * doc×term, so no double counting); the corpus size joins in as a
    * broadcast scalar. Final ranking is a per-doc window with a
    * deterministic (score desc, term asc) tie-break.
    *
    * IDF is the smoothed RATIONAL variant (N+1)/(df+1) rather than
    * log((N+1)/(df+1)): within a document the ranking it induces differs
    * from log-idf only in how ties between (tf, df) profiles break, and
    * rational arithmetic is bit-identical across engines, which log()
    * (libm vs JVM, 1-ulp apart) is not guaranteed to be — the same
    * determinism rule that keeps every other oracle exact. Swapping in
    * `log(...)` is a one-expression change where needed. */
  def tfIdfTopTerms(df: DataFrame, id: String, text: String, k: Int = 3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(id), explode(split(trim(lower(col(text))), "\\s+")).as("term"))
    val tf = toks.groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    // doc_freq as aggregate + shuffle join, NOT a count-window over term:
    // a per-term window routes every tf row of a hot term ("the" — one row
    // per containing document) through a single task with no partial
    // combine and no AQE help (AQE splits skewed JOINS, not windows). The
    // aggregate reduces dfq to one row per term with map-side combine, and
    // the tf⋈dfq shuffle join is exactly the shape AQE skew-splits. One
    // extra exchange locally; no unbounded straggler at corpus scale.
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = df.agg(count(lit(1)).as("n_docs"))
    val scored = tf.join(dfq, "term").crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf").cast("double") * (col("n_docs") + 1).cast("double")
          / (col("doc_freq") + 1).cast("double"))
    val w = Window.partitionBy(col(id)).orderBy(col("tfidf").desc, col("term").asc)
    scored.withColumn("rnk", row_number().over(w)).filter(col("rnk") <= k)
      .select(col(id), col("rnk").cast("long").as("rnk"), col("term"),
        col("tf"), col("doc_freq"), col("tfidf"))
  }

  /** Social-tag extraction (the reference's own domain — Twitter
    * analytics): mentions (@handle) and hashtags (#topic) pulled from free
    * text with one RE2-compatible scan, exploded to (doc, kind, tag) rows
    * — the shape per-tag rollups and tag⋈user joins consume. Scan-stage
    * explode, no shuffle. */
  def socialTags(df: DataFrame, id: String, text: String): DataFrame =
    df.select(col(id),
        explode(regexp_extract_all(col(text), lit("[@#][A-Za-z0-9_]+"), lit(0))).as("raw"))
      .select(col(id),
        when(substring(col("raw"), 1, 1) === "@", "mention")
          .otherwise("hashtag").as("kind"),
        expr("substring(raw, 2)").as("tag"))

  /** Heuristic quality RULES in the style of published corpus-curation
    * practice (the Gopher/MassiveText rule family: bounds on length, word
    * shape, symbol share, stopword evidence, and n-gram repetition): each
    * rule is an independent boolean column plus a conjunction `keep`, so a
    * pipeline can audit WHICH rule dropped a document, not just that one
    * did. All signals are exact integer/ratio arithmetic on the existing
    * token columns — per-row, shuffle-free, oracle-able.
    *
    *  - `ok_word_count`: words in [minWords, maxWords]
    *  - `ok_word_len`:  mean word length in [3, 10]
    *  - `ok_symbols`:   non-alphanumeric, non-space chars ≤ 10% of chars
    *  - `ok_stopwords`: ≥ 2 stopword hits (English-evidence rule — apply
    *    per-language in a multilingual corpus)
    *  - `ok_repetition`: duplicate word-bigram share ≤ 30%
    *    (1 − distinct/total bigrams; the repetition signal that catches
    *    boilerplate and degenerate generations) */
  def qualityFlags(df: DataFrame, id: String, text: String,
                   minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    // STAGED projections, one derived column per stage reference: a single
    // flat projection re-evaluates every repeated subtree (`w` appears in
    // four signals, the bigram array in three, and `keep` repeats all five
    // flags) — measured ~14 s at sf0.1 versus ~1 s staged. CollapseProject
    // declines to merge projections when it would duplicate non-cheap
    // expressions, so the split/bigram arrays are computed once per row.
    val w = col("__w")
    val staged = df
      .withColumn("__w", words(col(text)))
      .withColumn("__bi", when(size(w) >= 2,
        transform(sequence(lit(1), size(w) - 1),
          i => concat_ws(" ", slice(w, i, lit(2)))))
        .otherwise(array().cast("array<string>")))
      .withColumn("__nw", size(w).cast("long"))
      .withColumn("__nbi", size(col("__bi")).cast("long"))
      .withColumn("__nbid", size(array_distinct(col("__bi"))).cast("long"))
      .withColumn("__mwl", aggregate(transform(w, t => length(t)), lit(0),
        (acc, v) => acc + v).cast("double") / col("__nw"))
      // explicit whitespace class, not \s: Java's \s includes \x0B
      // (vertical tab) where RE2's does not, and this class must match the
      // DuckDB oracle byte-for-byte (the \s+ tokenizer shared with every
      // other text query carries the same caveat — the corpus contract is
      // "no vertical tabs", documented at the oracle's ShingleCte)
      .withColumn("__nsym",
        length(regexp_replace(col(text), "[A-Za-z0-9 \\t\\n\\f\\r]", "")).cast("long"))
      .withColumn("__nstop", size(stopwordHits(col(text))).cast("long"))
    staged.select(col(id), col("__nw").as("n_words"),
        (col("__nw") >= minWords && col("__nw") <= maxWords).as("ok_word_count"),
        (col("__mwl") >= 3.0 && col("__mwl") <= 10.0).as("ok_word_len"),
        (col("__nsym").cast("double") / length(col(text)) <= 0.1).as("ok_symbols"),
        (col("__nstop") >= 2L).as("ok_stopwords"),
        (col("__nbi") === 0L ||
          (col("__nbi") - col("__nbid")).cast("double") / col("__nbi") <= 0.3)
          .as("ok_repetition"))
      .withColumn("keep",
        col("ok_word_count") && col("ok_word_len") && col("ok_symbols") &&
          col("ok_stopwords") && col("ok_repetition"))
  }

  /** Document CHUNKING — split each document into fixed-size character
    * windows with `overlap` carried between consecutive chunks (the
    * context-window prep step before tokenization/embedding). Pure
    * per-row explode: `sequence` generates the chunk starts, `substring`
    * slices — no shuffle, no UDF, chunk boundaries a deterministic
    * function of (doc, size, overlap) so re-runs produce identical chunk
    * ids. Empty docs produce no chunks. */
  def chunk(df: DataFrame, id: String, text: String,
            size: Int = 512, overlap: Int = 64): DataFrame = {
    require(size > overlap && overlap >= 0, s"need size > overlap >= 0, got $size/$overlap")
    val step = size - overlap
    // last start is bounded by len - overlap: a start inside the final
    // overlap would emit a chunk fully contained in its predecessor
    df.filter(length(col(text)) > 0)
      .select(col(id), col(text),
        posexplode(sequence(lit(1),
          greatest(length(col(text)) - overlap, lit(1)), lit(step)))
          .as(Seq("pos", "start")))
      .select(col(id), (col("pos") + 1).cast("long").as("chunk_id"),
        col(text).substr(col("start"), lit(size)).as("chunk"))
  }

  /** Greedy SEQUENCE PACKING — assign documents to fixed token-budget
    * packs by a running token count in a deterministic order (the
    * pretraining-stream shape: documents are concatenated and the stream
    * is cut every `budget` tokens, so a document may straddle two packs —
    * its pack is where it STARTS). One window shuffle per group; pack
    * boundaries are a pure function of the ordered token counts, so any
    * rerun or repartitioning reproduces identical packs — PROVIDED `id`
    * is unique within each group: the window orders by `id` alone, and a
    * duplicate id's tie order (hence every later cum_tokens in the group)
    * would depend on partition layout. Packing rows keyed by a non-unique
    * column (e.g. chunk output by doc_id) needs a composite unique id
    * first. */
  def packSequences(df: DataFrame, id: String, tokens: Column, budget: Long,
                    groupCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(groupCol)).orderBy(col(id))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(groupCol), col(id), tokens.cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      // floor, not cast: a bare double→long cast truncates in Spark but
      // ROUNDS in DuckDB — floor is unambiguous in both
      .withColumn("pack_id",
        floor((col("cum_tokens") - col("n_tokens")) / budget).cast("long"))
  }

  /** PII redaction — the curation pass every public-web training corpus
    * runs before anything else. URLs, emails, then phone-shaped numbers
    * are replaced (in that fixed order: an email inside a URL must already
    * be gone when the email pass runs, and the order is part of the
    * operator contract so output is deterministic) with typed placeholder
    * tokens. Patterns are RE2-compatible (no backtracking constructs), so
    * the same regexes run identically in Spark, DuckDB, and any RE2-based
    * scrubber — and regexp_replace is codegen'd, per-row, shuffle-free. */
  val UrlRe = "https?://[^\\s]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{7,}[0-9]"

  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlRe, "<URL>"),
        EmailRe, "<EMAIL>"),
      PhoneRe, "<PHONE>")

  /** Portable content fingerprint: md5 of normalized text, plus a 32-bit
    * numeric prefix usable as a shard/bucket key. */
  def fingerprint(df: DataFrame, id: String, text: String): DataFrame =
    df.withColumn("fp", md5(lower(trim(col(text))))) // staged: one md5 per row
      .select(col(id), col("fp"),
        conv(substring(col("fp"), 1, 8), 16, 10).cast("long").as("fp_bucket"))

  /** Unigram language-model QUALITY SCORE — the simplest member of the
    * KenLM-style fluency-filter family: score each document by the average
    * log-probability of its tokens under the corpus's own unigram
    * distribution. Gibberish / rare-token soup scores far below typical
    * text, giving a rankable quality signal with no external model.
    *
    * Scale shape: one token-frequency groupBy (vocabulary-sized — words,
    * not shingles), a token→frequency join (vocab is usually broadcastable;
    * AQE decides), and a per-document aggregate. The corpus-total token
    * count is a one-row frame cross-joined via broadcast, NOT a driver
    * collect. round(6) absorbs libm ln() last-bit differences across
    * engines (same trick as the cosine queries).
    *
    * Output: (id, n_tokens, avg_logprob), higher = more typical. */
  def unigramLogProb(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), explode(words(col(text))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("n_total"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(log(col("cnt").cast("double") / col("n_total").cast("double"))), 6)
          .as("avg_logprob"))
  }

  /** The classic UTF-8-read-as-Latin-1/Windows-1252 damage digraphs and
    * their true characters, longest pattern first (the ftfy top table —
    * each left side is the Latin-1 rendering of the right side's UTF-8
    * bytes). BMP-only by construction: both engines count these in the
    * same units. */
  val MojibakeTable: Seq[(String, String)] = Seq(
    "â€™" -> "’", "â€œ" -> "“", "â€“" -> "–",
    "Ã©" -> "é", "Ã¨" -> "è", "Ã¼" -> "ü", "Ã¶" -> "ö", "Ã¤" -> "ä",
    "Ã±" -> "ñ", "Ã§" -> "ç", "Ã³" -> "ó", "Ã¡" -> "á")

  /** MOJIBAKE COUNT — occurrences of the [[MojibakeTable]] damage
    * signatures, counted WITHOUT regex: per pattern,
    * (len(t) − len(replace(t, p, ''))) / len(p) — exact integer
    * arithmetic, identical `replace`/`length` semantics on both engines
    * for BMP text. The encoding-damage quality signal every web-crawl
    * curation pass screens for. */
  def mojibakeHits(text: Column): Column =
    MojibakeTable.map { case (p, _) =>
      ((length(text) - length(replace(text, lit(p), lit("")))) / lit(p.length))
        .cast("long")
    }.reduce(_ + _)

  /** MOJIBAKE REPAIR — the inverse transform for the table's signatures:
    * one chained `replace` per digraph (longest first, so no prefix of a
    * longer signature is consumed early). A deterministic ftfy-lite: the
    * general re-decode needs byte-level access, but the fixed top table
    * covers the overwhelming share of real crawl damage and is exactly
    * replayable in SQL. */
  def fixMojibake(text: Column): Column =
    MojibakeTable.foldLeft(text) { case (c, (p, r)) =>
      replace(c, lit(p), lit(r))
    }

  /** UNICODE-SCRIPT PROFILE — the script-level companion to the n-gram
    * language identifier: per-document character counts over the five
    * major script properties (Han, Cyrillic, Greek, Hangul, Latin) and
    * the dominant script. langID classifies by token statistics WITHIN a
    * script; the script profile catches what that can't see — CJK text
    * mislabeled "en", mixed-script spam, transliteration artifacts — and
    * is the routing key for script-specific tokenizers. Counts are exact
    * integers from `regexp_count` over Unicode Script properties (Java
    * `\p{IsX}` here, RE2 `\p{X}` in the oracle — the same Script sets);
    * the gate carries NO doubles. Dominance ties break by the fixed
    * priority han > cyrillic > greek > hangul > latin (a doc with zero
    * counts everywhere is "latin" by fall-through — ASCII digits and
    * punctuation belong to no script). Scan-stage, shuffle-free. */
  def scriptProfile(df: DataFrame, id: String, text: String): DataFrame = {
    def cnt(p: String) = regexp_count(col(text), lit(p)).cast("long")
    df.select(col(id),
        cnt("\\p{IsHan}").as("n_han"),
        cnt("\\p{IsCyrillic}").as("n_cyrillic"),
        cnt("\\p{IsGreek}").as("n_greek"),
        cnt("\\p{IsHangul}").as("n_hangul"),
        cnt("\\p{IsLatin}").as("n_latin"))
      .withColumn("dominant_script",
        when(col("n_han") >= col("n_cyrillic") && col("n_han") >= col("n_greek") &&
          col("n_han") >= col("n_hangul") && col("n_han") >= col("n_latin") &&
          col("n_han") > 0, "han")
        .when(col("n_cyrillic") >= col("n_greek") && col("n_cyrillic") >= col("n_hangul") &&
          col("n_cyrillic") >= col("n_latin") && col("n_cyrillic") > 0, "cyrillic")
        .when(col("n_greek") >= col("n_hangul") && col("n_greek") >= col("n_latin") &&
          col("n_greek") > 0, "greek")
        .when(col("n_hangul") >= col("n_latin") && col("n_hangul") > 0, "hangul")
        .otherwise("latin"))
  }

  /** MIN-K% PROBABILITY (Shi et al. 2023, "Detecting Pretraining Data from
    * Large Language Models") — the membership-inference contamination
    * signal beside the shingle/bloom decontaminators: a text the scoring
    * LM has effectively memorized contains NO low-probability outlier
    * tokens, so the mean log-prob of its k% LEAST-probable tokens is
    * suspiciously high; an unseen text of the same overall perplexity
    * still has a heavy low-prob tail. The scoring model here is the
    * corpus's own unigram LM (the [[unigramLogProb]] model — swap in any
    * per-token score column for a stronger LM).
    *
    * Engine-exact by construction: tokens are ranked per document by the
    * exact INTEGER corpus count (unigram log-prob is monotone in cnt, so
    * cnt-rank ≡ prob-rank) with token-text tie-break — no float ordering
    * anywhere; equal-key ties select an identical value multiset either
    * way. The k cut is ceil(n/kDen) in exact arithmetic. Plan: the
    * unigram join plus ONE document-bounded window — same cost family as
    * [[unigramLogProb]].
    *
    * Returns (id, n_tokens, k_used, min_k_avg_logprob). */
  def minKProb(df: DataFrame, id: String, text: String, kDen: Int = 5): DataFrame = {
    require(kDen >= 1, s"kDen must be >= 1, got $kDen")
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(col(id), explode(words(col(text))).as("tok"))
    val freq = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = freq.agg(sum(col("cnt")).as("n_total"))
    val byDoc = Window.partitionBy(col(id))
    val rank = Window.partitionBy(col(id)).orderBy(col("cnt"), col("tok"))
    toks.join(freq, "tok")
      .crossJoin(broadcast(total))
      .withColumn("__n", count(lit(1)).over(byDoc))
      .withColumn("__rn", row_number().over(rank))
      // ceil(n/kDen): exact in doubles for any table row count < 2^52
      .filter(col("__rn") <= floor((col("__n") + (kDen - 1)) / kDen.toDouble).cast("long"))
      .groupBy(col(id))
      .agg(max(col("__n")).as("n_tokens"),
        count(lit(1)).as("k_used"),
        round(avg(log(col("cnt").cast("double") / col("n_total").cast("double"))), 6)
          .as("min_k_avg_logprob"))
  }

  /** COMPRESSION-RATIO quality signal ([[graft.plans.DeflateRatio]]):
    * Deflate bytes over raw bytes per document — the model-free
    * redundancy detector (repeated paragraphs compress well even when
    * token entropy looks healthy). Scan-stage, shuffle-free; rows-only in
    * the gate (no SQL engine can mirror zlib), semantics pinned by spec. */
  def compressionRatio(df: DataFrame, id: String, text: String): DataFrame = {
    graft.plans.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    df.select(col(id), length(col(text)).cast("long").as("n_chars"),
      call_function("deflate_ratio", col(text)).as("deflate_ratio"))
  }

  /** SELF-CERTIFYING variant of [[compressionRatio]]: two in-plan audits
    * make the rows-only gate fail loudly on a broken codec instead of
    * passing on shaped garbage —
    *
    *  1. per-row BOUNDS: every non-empty document's ratio must land in
    *     (0, 1.1] (zlib's worst-case expansion on incompressible input is
    *     a few bytes of header/framing — far under 10% on real text);
    *     out-of-range → `raise_error` naming the row.
    *  2. planted MONOTONICITY: a maximally repetitive string must compress
    *     strictly better than a same-length high-entropy string (a
    *     deterministic multiplicative-hash scramble, built at plan time —
    *     no RNG in-plan). The two planted ratios evaluate in a one-row
    *     side plan whose validated boolean broadcasts onto every row as
    *     `deflate_order_ok` — any codec that ignores its input (constant
    *     ratio, hash-of-text, inverted scale) fails this even when it
    *     lands inside the per-row bounds. */
  def compressionRatioAudited(df: DataFrame, id: String, text: String): DataFrame = {
    val spark = df.sparkSession
    graft.plans.GraftFunctions.register(spark)
    val checked = compressionRatio(df, id, text)
      .withColumn("deflate_ratio",
        when(col("deflate_ratio").isNull ||  // null text / empty doc: no codec ran
            (col("deflate_ratio") > 0.0 && col("deflate_ratio") <= 1.1),
          col("deflate_ratio"))
        .otherwise(raise_error(concat(
          lit("deflate_ratio outside (0, 1.1] at "), col(id).cast("string"),
          lit(": "), col("deflate_ratio").cast("string")))))
    val repetitive = "ab " * 200
    val scrambled = (1 to repetitive.length)
      .map(i => ((i * 2654435761L >>> 7) % 94 + 33).toChar).mkString
    val order = spark.range(1).select(
        call_function("deflate_ratio", lit(repetitive)).as("__rep"),
        call_function("deflate_ratio", lit(scrambled)).as("__rnd"))
      .select(when(col("__rep") < col("__rnd"), lit(true))
        .otherwise(raise_error(concat(
          lit("deflate monotonicity violated: repetitive="),
          col("__rep").cast("string"), lit(" >= scrambled="),
          col("__rnd").cast("string")))).as("deflate_order_ok"))
    checked.crossJoin(broadcast(order))
  }

  /** SPAN CORRUPTION — the T5-style denoising-objective dataset builder
    * (public recipe: Raffel et al. 2020): mask one `spanLen`-token span
    * per document at a DETERMINISTIC hash-chosen position, emitting the
    * sentinel-bearing input and the sentinel-prefixed target. Hash
    * positioning (portable salted md5 of the id, mod the valid start
    * range) makes every example a pure function of (doc, salt) — rebuild
    * the dataset on any engine, any partitioning, and byte-identical
    * examples come back, which is what makes training-data lineage
    * auditable. Scan-stage only (split, two slices, concat) — no shuffle.
    * Docs with ≤ spanLen+1 tokens are excluded (no valid interior span
    * with a non-empty suffix). */
  def spanCorrupt(df: DataFrame, id: String, text: String, spanLen: Int,
                  salt: String = "graft-span"): DataFrame = {
    require(spanLen >= 1, s"spanLen must be >= 1, got $spanLen")
    // no filter()-HOF: a regex \s+ split of TRIMMED non-empty text cannot
    // contain empty tokens (the whitespace-only case is excluded below),
    // and a HOF here lands in the length filter as an interpreted
    // predicate (the PlanAudit HOF-IN-FILTER trap)
    val ws = words(col(text))
    val n = size(ws)
    val h = conv(substring(md5(concat(col(id).cast("string"), lit("|"), lit(salt))), 1, 8),
      16, 10).cast("long")
    // guarded: ANSI mode throws on % by a non-positive divisor, and the
    // too-short rows are only dropped by the filter AFTER this projection
    val start = when(n > spanLen + 1,
      (h % (n - spanLen).cast("long")).cast("int")).otherwise(lit(0)) // 0..n-spanLen-1
    df.filter(trim(col(text)) =!= "")
      .select(col(id), ws.as("__ws"), n.as("n_tokens"), start.as("__st"))
      .filter(col("n_tokens") > spanLen + 1)
      .select(col(id), col("n_tokens").cast("long").as("n_tokens"),
        col("__st").cast("long").as("span_start"),
        concat_ws(" ", concat(
          slice(col("__ws"), lit(1), col("__st")),
          array(lit("<extra_id_0>")),
          slice(col("__ws"), col("__st") + spanLen + 1, col("n_tokens") - col("__st") - spanLen)))
          .as("input"),
        concat_ws(" ", concat(array(lit("<extra_id_0>")),
          slice(col("__ws"), col("__st") + 1, lit(spanLen)))).as("target"))
  }

  /** TOKEN ENTROPY per document — Shannon entropy of the doc's own token
    * distribution, in nats: `H = −Σ (c/n)·ln(c/n)` over the doc's distinct
    * tokens. The third classic repetition signal next to
    * [[unigramLogProb]] (corpus-typicality) and the Gopher gates
    * (rule-based): near-zero entropy = one token repeated (spam), high
    * entropy = all-distinct tokens. Plan: explode → (doc, token) count →
    * one doc-grain aggregation; round(6) soaks cross-libm ln drift and
    * sub-ulp summation-order noise (the [[unigramLogProb]] precedent).
    * Output: (id, n_tokens, n_distinct, entropy). */
  def tokenEntropy(df: DataFrame, id: String, text: String): DataFrame = {
    val toks = df.select(col(id), explode(words(lower(col(text)))).as("tok"))
      .filter(col("tok") =!= "")
    toks.groupBy(col(id), col("tok")).agg(count(lit(1)).as("c"))
      .withColumn("n", sum(col("c")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(id))))
      .groupBy(col(id))
      .agg(max(col("n")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        round(-sum((col("c").cast("double") / col("n").cast("double")) *
          log(col("c").cast("double") / col("n").cast("double"))), 6).as("entropy"))
  }

  /** OOV RATE per document against a [[vocabulary]] table — the
    * tokenizer-coverage audit run before committing to a vocab: the share
    * of token INSTANCES a min-count vocabulary cannot represent. One
    * explode, one left join keyed by token (broadcast-able — the vocab is
    * bounded), one doc-grain aggregation. Output: (id, n_tokens, n_oov,
    * oov_rate). */
  def oovRate(df: DataFrame, id: String, text: String, vocab: DataFrame): DataFrame = {
    val toks = df.select(col(id), explode(words(lower(col(text)))).as("tok"))
      .filter(col("tok") =!= "")
    toks.join(broadcast(vocab.select(col("tok"), lit(true).as("__in"))), Seq("tok"), "left_outer")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
      .withColumn("oov_rate",
        col("n_oov").cast("double") / col("n_tokens").cast("double"))
  }

  /** TEXT NORMALIZATION — the canonical-form pass that runs before any
    * hash-keyed dedup (exact, paragraph, MinHash): typographic quotes and
    * dashes folded to ASCII, lowercase, every whitespace/control run
    * collapsed to one space, trimmed. Two documents differing only in
    * typography or spacing then share a fingerprint. Per-row, shuffle-free,
    * codegen'd; every regex is RE2-compatible (no lookarounds) so Spark's
    * java.util.regex and a RE2 engine (the DuckDB oracle) agree byte for
    * byte. Deliberately ASCII-conservative: no locale-dependent case
    * folding beyond `lower`, no unicode NFC/NFKC (that needs ICU — out of
    * scope for a cross-engine-deterministic pass). */
  def normalizeText(text: Column): Column =
    trim(regexp_replace(
      lower(translate(text, "’‘“”—–", "''\"\"--")),
      "[\\s\\x00-\\x1f]+", " "))

  /** HTML TEXT EXTRACTION — the markup-stripping pass at the head of
    * every web-corpus pipeline (C4/CCNet run a full DOM extractor; this
    * is the deterministic regex core: drop non-content blocks, strip
    * tags, decode the frequent entities, collapse whitespace). Rules,
    * each a single RE2-compatible pattern so Spark's java.util.regex and
    * the DuckDB oracle agree byte for byte:
    *
    *  1. the `<head>…</head>` block (title/meta/style — non-content by
    *     construction) and `<script>…</script>` / `<style>…</style>`
    *     blocks removed WITH their content ((?s) dotall + non-greedy, so
    *     each block closes at its own end tag; an unclosed block
    *     survives to rule 2 and only loses its tags — documented
    *     degradation, never data loss past the block);
    *  2. every remaining `<…>` tag replaced by a space (block boundaries
    *     must separate words — `<p>a</p><p>b</p>` is "a b", not "ab");
    *  3. entity decode for the six dominant named entities, `&amp;`
    *     LAST (decoding it first would re-expose `&amp;lt;` as a fresh
    *     `&lt;` — the standard single-pass ordering);
    *  4. whitespace runs collapsed, trimmed.
    *
    * The `<title>` content is extracted separately before stripping
    * (group 1 of the first `<title>…</title>`, empty when absent — the
    * [[canonicalUrl]] not-a-URL convention). Per-row, shuffle-free,
    * codegen'd. */
  def htmlExtract(html: Column): (Column, Column) = {
    val noBlocks = regexp_replace(
      regexp_replace(
        // <head(\s…)?> — NOT <head[^>]*>, which would swallow <header>
        regexp_replace(html, "(?s)<head(\\s[^>]*)?>.*?</head>", " "),
        "(?s)<script[^>]*>.*?</script>", " "),
      "(?s)<style[^>]*>.*?</style>", " ")
    val noTags = regexp_replace(noBlocks, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    val body = trim(regexp_replace(decoded, "[\\s\\x00-\\x1f]+", " "))
    val title = regexp_extract(html, "(?s)<title>(.*?)</title>", 1)
    (title, body)
  }

  /** ROUGE-N between paired texts — the standard n-gram-overlap metric an
    * eval pipeline computes over millions of (candidate, reference) pairs
    * (summarization/QA scoring, and a useful near-dup diagnostic). Exact
    * MULTISET overlap with clipped counts (Lin 2004): per pair,
    * `clipped = Σ_g min(count_cand(g), count_ref(g))`, recall =
    * clipped/|ref grams|, precision = clipped/|cand grams|, F1 the
    * harmonic mean — all emitted rounded to 6 decimals (division is the
    * only non-rational step). A side shorter than n tokens has zero
    * grams; its ratios are defined as 0 (the standard convention), never
    * a division error.
    *
    * Scale shape: grams explode to (pair, gram, side) rows, ONE count
    * aggregation on (pair, gram) computes both sides' counts and the
    * clipped min TOGETHER (no per-side frames, no self-join), then one
    * per-pair rollup — two shuffles total, both on pair-dominated keys.
    * `idCols` must uniquely key the pairs frame. */
  def rougeN(pairs: DataFrame, idCols: Seq[String], candCol: String,
             refCol: String, n: Int): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ids = idCols.map(col)
    // tokenization is MATERIALIZED as a column per side before the gram
    // lambdas touch it: an expression nested inside transform()'s lambda
    // is re-evaluated per ELEMENT, so an inlined split+filter would
    // re-tokenize the whole text once per gram — O(tokens²) per document
    // (measured: the inlined form pinned q_rouge2 at ~7.8 s at sf0.1
    // regardless of scale; this form runs the same row in one pass)
    def tokArr(c: Column): Column = filter(split(trim(c), "\\s+"), t => t =!= "")
    def gramsOf(tc: Column): Column =
      when(size(tc) >= n,
        transform(sequence(lit(0), size(tc) - n),
          i => concat_ws(" ", slice(tc, i + lit(1), lit(n)))))
        .otherwise(array().cast("array<string>"))
    val withToks = pairs.select(ids :+
      tokArr(col(candCol)).as("__ct") :+ tokArr(col(refCol)).as("__rt"): _*)
    val melted = withToks.select(ids :+
      explode(concat(
        transform(gramsOf(col("__ct")), g => struct(g.as("g"), lit(1L).as("c"), lit(0L).as("r"))),
        transform(gramsOf(col("__rt")), g => struct(g.as("g"), lit(0L).as("c"), lit(1L).as("r"))))).as("m"): _*)
    val perGram = melted
      .groupBy(ids :+ col("m.g").as("g"): _*)
      .agg(sum(col("m.c")).as("cc"), sum(col("m.r")).as("rc"))
    val perPair = perGram
      .groupBy(ids: _*)
      .agg(sum(least(col("cc"), col("rc"))).as("clipped"),
        sum(col("cc")).as("cand_total"), sum(col("rc")).as("ref_total"))
    val p = when(col("cand_total") > 0,
      col("clipped").cast("double") / col("cand_total")).otherwise(lit(0.0))
    val r = when(col("ref_total") > 0,
      col("clipped").cast("double") / col("ref_total")).otherwise(lit(0.0))
    // a pair with zero grams on BOTH sides never reaches perGram — restore
    // it with all-zero scores (left join back to the pair universe)
    pairs.select(ids: _*)
      .join(perPair, idCols, "left")
      .select(ids ++ Seq(
        round(coalesce(p, lit(0.0)), 6).as("precision"),
        round(coalesce(r, lit(0.0)), 6).as("recall"),
        round(coalesce(when(p + r > 0, lit(2.0) * p * r / (p + r))
          .otherwise(lit(0.0)), lit(0.0)), 6).as("f1")): _*)
  }

  /** SENTENCE SEGMENTATION — regex runs of non-terminators closed by a
    * `.!?` run, plus the unterminated tail: the deterministic pre-pass for
    * sentence-grain dedup/packing. One `regexp_extract_all` in the scan
    * stage, trimmed and de-emptied in the same projection, then a
    * posexplode to (id, sent_idx, sentence) grain — no shuffle. The
    * pattern's two alternation branches cannot match at the same position,
    * so leftmost-first (Java) and RE2 agree. */
  def sentences(df: DataFrame, id: String, text: String): DataFrame = {
    val parts = regexp_extract_all(col(text), lit("[^.!?]*[.!?]+|[^.!?]+$"), lit(0))
    val cleaned = filter(transform(parts, p => trim(p)), p => p =!= "")
    df.select(col(id), posexplode(cleaned).as(Seq("sent_idx", "sentence")))
      .select(col(id), col("sent_idx").cast("long").as("sent_idx"), col("sentence"))
  }

  /** BIGRAM LM quality score with unigram interpolation — the next model
    * up from [[unigramLogProb]] (Jelinek–Mercer smoothing, the classic
    * public construction): per adjacent token pair,
    * `p = λ·cnt(w1,w2)/cnt(w1) + (1−λ)·cnt(w2)/total`, averaged in log
    * space per document. Trained on the corpus itself, so every observed
    * bigram has count ≥ 1 and the interpolated probability is never zero;
    * the unigram back-off term is what separates "common words in a rare
    * order" from "rare words" (repetitive spam scores high under a
    * unigram model but low here).
    *
    * Scale shape: bigram instances are built in the SCAN stage (zip_with
    * over two slices of the word array — no self-join on position), the
    * bigram/unigram count tables are vocabulary-bounded aggregations, the
    * per-bigram probability is assembled at VOCABULARY grain (uni/total
    * join onto the distinct-bigram table), and the scoring pass is ONE
    * instance-grain equi-join + one doc-grain aggregation. Nothing is
    * quadratic; nothing collects to the driver.
    *
    * Output: (id, n_bigrams, avg_logprob), docs with ≥ 2 tokens only
    * (a 0/1-token doc has no bigram — callers treat absence as
    * "unscorable"). round(6) soaks cross-libm ln drift, the repo
    * convention. */
  def bigramLogProb(df: DataFrame, id: String, text: String,
                    lambda: Double = 0.7): DataFrame = {
    val ws = filter(words(lower(col(text))), w => w =!= "")
    val toks = df.select(col(id), explode(ws).as("tok"))
    val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("ucnt"))
    val total = uni.agg(sum(col("ucnt")).cast("double").as("n_total"))
    // slice length is clamped at 0: a 0/1-token doc would otherwise pass
    // length -1 and Slice throws at runtime — one empty doc must not
    // abort the whole corpus (such docs simply emit no bigram rows)
    val bgLen = greatest(size(ws) - 1, lit(0))
    val bg = df.select(col(id),
        explode(zip_with(
          slice(ws, lit(1), bgLen), slice(ws, lit(2), bgLen),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(id), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val bi = bg.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("bcnt"))
    val p = lit(lambda) * (col("bcnt").cast("double") / col("c1").cast("double")) +
      (lit(1.0) - lit(lambda)) * (col("c2").cast("double") / col("n_total"))
    // score at VOCABULARY grain, not instance grain: p is a function of
    // (w1, w2) alone, so the uni/total joins attach to the distinct-bigram
    // table `bi` (vocabulary-bounded) and the full instance table crosses
    // the network ONCE (the (w1,w2) exchange, shared with bi's build via
    // exchange reuse) instead of three times (by (w1,w2), by w1, by w2).
    // Each instance row receives the identical __lp double the per-row
    // form computed (same joined operands, same expression), so the
    // per-doc avg consumes the same multiset — output unchanged.
    val scoredBi = bi
      .join(uni.select(col("tok").as("w1"), col("ucnt").as("c1")), "w1")
      .join(uni.select(col("tok").as("w2"), col("ucnt").as("c2")), "w2")
      .crossJoin(broadcast(total))
      .select(col("w1"), col("w2"), log(p).as("__lp"))
    bg.join(scoredBi, Seq("w1", "w2"))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(col("__lp")), 6).as("avg_logprob"))
  }

  /** KNESER–NEY PERPLEXITY GATE — the CCNet-style learned-LM quality
    * filter: train an interpolated-KN bigram model on a REFERENCE slice
    * of the corpus (`ref`, e.g. `lang === "en"` — CCNet trains on
    * Wikipedia), then score EVERY document by its average token
    * log-probability under that model. Low scores flag text unlike the
    * reference (wrong language, shuffled tokens, boilerplate soup) —
    * the gate every production corpus pipeline applies after the
    * heuristic flags and before the learned classifier.
    *
    * The estimator is the textbook interpolated Kneser–Ney (public
    * construction, Chen & Goodman 1998):
    *
    *   p_cont(w2)    = N1+(·,w2) / N1+(·,·)
    *   p_kn(w2|w1)   = max(c(w1,w2) − D, 0)/c(w1)
    *                   + D · N1+(w1,·)/c(w1) · p_cont(w2)   [c(w1) > 0]
    *                 = p_cont(w2)                           [w1 unseen]
    *   p             = (1 − ε)·p_kn + ε/(V + 1)
    *
    * with D = `discount` (0.75, the standard value) and a uniform floor
    * ε/(V+1) over the training vocabulary V so unseen successors score
    * a small positive probability instead of −∞ — that floor is what
    * lets one model rank out-of-domain documents instead of erroring on
    * them. All arithmetic is plain double with literal constants, every
    * division explicitly cast — the DuckDB oracle mirrors the formula
    * token-for-token; round(6) on the final avg soaks cross-libm ln
    * drift (the [[bigramLogProb]] precedent).
    *
    * Scale shape: the four model tables (pair counts, context counts +
    * distinct-successor counts, distinct-predecessor counts, the 1-row
    * totals) are TRAINING-VOCABULARY-bounded aggregations; scoring is
    * three token-keyed equi-joins plus one doc-grain aggregation —
    * nothing quadratic, nothing driver-side. An ingest-phase deployment
    * would checkpoint the `bi` table once per reference snapshot (the
    * [[graft.operators.Scale.memo]] pattern) instead of letting the
    * scoring plan recompute its lineage per derived table.
    *
    * Output: (id, n_bigrams, kn_logprob), docs with ≥ 2 tokens only —
    * the [[bigramLogProb]] "unscorable" contract. */
  def knLogProb(df: DataFrame, id: String, text: String, ref: Column,
                discount: Double = 0.75, floorEps: Double = 0.1,
                cacheKey: Option[String] = None): DataFrame = {
    val ws = filter(words(lower(col(text))), w => w =!= "")
    val bgLen = greatest(size(ws) - 1, lit(0))
    def bigrams(d: DataFrame): DataFrame = d.select(col(id),
        explode(zip_with(
          slice(ws, lit(1), bgLen), slice(ws, lit(2), bgLen),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .select(col(id), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
    val train = df.where(ref)
    // `cacheKey` (the bandedCacheKey contract): training the model on a
    // static reference slice is ingest-phase work — sibling queries (the
    // raw gate, the CCNet bucket split) share ONE checkpointed pair-count
    // table + totals through Scale.memo, and the derived ctx/pred tables
    // become vocabulary-bounded re-aggregations of the checkpoint instead
    // of fresh corpus scans. EAGER when set (localCheckpoint at call).
    def buildModel(): (DataFrame, DataFrame) = {
      val b = bigrams(train).groupBy(col("w1"), col("w2"))
        .agg(count(lit(1)).as("bcnt"))
      val t = b.agg(count(lit(1)).cast("double").as("t_bigrams"))
        .crossJoin(train.select(explode(ws).as("tok"))
          .agg(count_distinct(col("tok")).cast("double").as("v_train")))
      cacheKey match {
        case Some(k) => graft.operators.Scale.memo(k, df.sparkSession)(
          (b.repartition(col("w1")).localCheckpoint(), t.localCheckpoint()))
        case None => (b, t)
      }
    }
    val (bi, totals) = buildModel()
    val ctx = bi.groupBy(col("w1"))
      .agg(sum(col("bcnt")).as("c1"), count(lit(1)).as("n1p_ctx"))
    val pred = bi.groupBy(col("w2")).agg(count(lit(1)).as("n1p_pred"))
    val d = lit(discount)
    // executable-require convention: an empty training slice (ref matches
    // no doc with ≥ 2 tokens) makes t_bigrams = 0 and every pcont 0/0 =
    // NaN, which would silently poison every kn_logprob — raise instead,
    // in-plan (no extra driver job; fires only if a scored row exists)
    val tb = when(col("t_bigrams") > 0, col("t_bigrams"))
      .otherwise(raise_error(lit("knLogProb: the training slice is empty " +
        "(ref matches no document with >= 2 tokens) — the KN model is " +
        "undefined; fix the ref predicate")).cast("double"))
    val pcont = coalesce(col("n1p_pred"), lit(0L)).cast("double") / tb
    val pkn = when(col("c1").isNotNull,
        greatest(coalesce(col("bcnt"), lit(0L)).cast("double") - d, lit(0.0))
          / col("c1").cast("double")
          + d * col("n1p_ctx").cast("double") / col("c1").cast("double") * pcont)
      .otherwise(pcont)
    val p = (lit(1.0) - lit(floorEps)) * pkn +
      lit(floorEps) / (col("v_train") + lit(1.0))
    // Deliberately NOT rewritten to [[bigramLogProb]]'s vocabulary-grain
    // scoring: KN's left-join semantics (unseen bigrams fall through to
    // pcont/the floor) would need a DISTINCT over the scored instance
    // table first — an exchange the current plan does not have (the three
    // model tables broadcast, so instances reach the doc-grain aggregate
    // without ever shuffling on a token key). Measured at sf0.1: the
    // distinct+score-join form reads +15-27% on q_ppl_buckets/
    // q_quality_signals. On a corpus whose model tables outgrow the
    // broadcast threshold, AQE degrades these to shuffled joins and the
    // vocabulary-grain form wins instead — revisit with measurements then.
    bigrams(df)
      .join(bi, Seq("w1", "w2"), "left")
      .join(ctx, Seq("w1"), "left")
      .join(pred, Seq("w2"), "left")
      .crossJoin(broadcast(totals))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_bigrams"), round(avg(log(p)), 6).as("kn_logprob"))
  }

  /** URL CANONICALIZATION — the key-normalization step of web-corpus dedup
    * (CCNet/C4 keep one document per canonical URL). Rules, applied to a
    * `scheme://host[:port][/path][?query][#fragment]` URL:
    *
    *  - fragment dropped; scheme and host lowercased (path/query untouched
    *    — they are case-sensitive)
    *  - leading `www.` stripped; default port (`:443` on https, `:80` on
    *    http) stripped
    *  - `utm_*` tracking parameters removed, other parameters kept in
    *    their original order; an emptied query drops its `?`
    *  - trailing slash(es) on the path stripped
    *
    * All regexes are RE2-compatible (no lookarounds) and each matches at
    * most once, so Spark's global `regexp_replace` and a
    * first-match-engine behave identically — the DuckDB oracle mirrors
    * every step. Per-row, shuffle-free, codegen'd. Input without a
    * `scheme://` is returned as an empty string (not a URL — callers
    * filter or treat as its own dedup class). */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    val prefix = lower(regexp_extract(noFrag, "^([^/?#]*://[^/?#]*)", 1))
    val rest = regexp_extract(noFrag, "^[^/?#]*://[^/?#]*(.*)$", 1)
    val hostPort = regexp_replace(
      regexp_replace(
        regexp_replace(prefix, "^(https?://)www\\.", "$1"),
        "^(https://[^/?#:]*):443$", "$1"),
      "^(http://[^/?#:]*):80$", "$1")
    val path = regexp_extract(rest, "^([^?]*)", 1)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val keptQuery = array_join(
      filter(split(query, "&"),
        p => p =!= "" && !startswith(p, lit("utm_"))), "&")
    concat(hostPort, regexp_replace(path, "/+$", ""),
      when(keptQuery === "", lit("")).otherwise(concat(lit("?"), keptQuery)))
  }

  /** VOCABULARY extraction — corpus-wide token term/document frequencies
    * with a minimum-count threshold: the tokenizer-training prep step (BPE
    * corpus stats, stopword mining, OOV analysis) and the feeder for
    * [[unigramLogProb]]'s frequency table.
    *
    * Scale shape: explode to token grain, ONE partial+final hash
    * aggregation keyed by token (map-side combine collapses each
    * partition's token multiset before the shuffle, so shuffled bytes are
    * per-partition VOCABULARY size, not corpus token count), and the
    * min-count filter prunes the long hapax tail right after the
    * aggregate. Output is vocabulary-sized — bounded, whatever the corpus
    * size. `countDistinct(id)` plans as a two-phase distinct-aggregate in
    * the same shuffle. */
  def vocabulary(df: DataFrame, id: String, text: String, minCount: Long): DataFrame =
    df.select(col(id), explode(words(lower(col(text)))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("term_freq"), countDistinct(col(id)).as("doc_freq"))
      .filter(col("term_freq") >= minCount)

  /** First-wins dedup over the canonical URL: one row per canonical key
    * with the smallest id as survivor — one map-side-combined shuffle on
    * the (short) canonical string. Rows whose canonicalization is empty
    * or NULL (no `scheme://` / null input) are NOT urls and are dropped
    * rather than collapsed into one bogus mega-group.
    *
    * The not-a-url filter runs BEFORE the aggregation, on the RAW url:
    * [[canonicalUrl]] yields "" exactly when no `://` appears before the
    * first `/?#` (the scheme://host extract comes up empty; fragment
    * stripping can't create or destroy such a match because `[^/?#]*`
    * never crosses the `#`). An equivalent post-agg filter on `canon_url`
    * gets pushed back through the projection by Catalyst, landing the
    * canonicalization's interpreted filter()-HOF inside a Filter node
    * (re-evaluated as a predicate — the plan-audit HOF-IN-FILTER trap);
    * the rlike form is a plain codegen'd predicate that reaches the
    * scan. */
  def urlDedup(df: DataFrame, id: String, url: String): DataFrame =
    df.filter(col(url).rlike("^[^/?#]*://"))
      .withColumn("canon_url", canonicalUrl(col(url))) // staged: canon once per row
      .groupBy(col("canon_url"))
      .agg(min(col(id)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** BM25 TOP-K RETRIEVAL (Okapi BM25, the public Robertson–Spärck Jones
    * formula with the Lucene `ln(1 + (N−df+0.5)/(df+0.5))` idf variant):
    * score every document containing ≥ 1 query term and return the k
    * best. The ranked-retrieval primitive a curation stack uses for
    * "find the docs most about X" (topic probes, eval-set seeding,
    * targeted audits).
    *
    * Plan shape — an INVERTED-INDEX access pattern without materializing
    * an index: the term filter (`isin` over the literal query terms) lands
    * in the scan stage BEFORE the (id, term) aggregation, so only postings
    * of the query terms ever shuffle; doc lengths aggregate separately off
    * the same scan; per-term doc frequencies reduce from the filtered tf
    * table (tiny — ≤ |terms| rows, broadcast); the global (N, avgdl) row
    * is a broadcast cross join. Nothing quadratic, no full-vocabulary
    * state: corpus-size work is one tokenize+filter pass.
    *
    * Determinism: tf/df/dl/N are exact longs; avgdl is one exact-operand
    * division; per-term contributions are a fixed IEEE expression tree
    * (mirrored operand order in the oracle); the per-doc sum of ≤ |terms|
    * doubles rounds to 6 places (the q_unigram_logprob sum-of-ln
    * precedent) and ties break by id, so the LIMIT-k frontier is total-
    * ordered. Output: (id, n_terms, bm25) — the k highest scores. */
  def bm25TopK(df: DataFrame, id: String, text: String, terms: Seq[String],
               k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && k >= 1, s"need terms and k >= 1, got $terms, $k")
    val toks = df.select(col(id), explode(split(trim(lower(col(text))), "\\s+")).as("term"))
    val dl = toks.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    val tfq = toks.filter(col("term").isin(terms: _*))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tfq.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    val stats = df.agg(count(lit(1)).as("n_docs"))
      .crossJoin(dl.agg(sum(col("dl")).as("__tdl")))
      .select(col("n_docs"),
        (col("__tdl").cast("double") / col("n_docs").cast("double")).as("avgdl"))
    val idf = log(lit(1.0) + (col("n_docs").cast("double") - col("dfreq").cast("double") + lit(0.5)) /
      (col("dfreq").cast("double") + lit(0.5)))
    val contrib = idf * (col("tf").cast("double") * lit(k1 + 1.0)) /
      (col("tf").cast("double") + lit(k1) * (lit(1.0) - lit(b) + lit(b) * col("dl").cast("double") / col("avgdl")))
    tfq.join(broadcast(dfq), "term").join(dl, id).crossJoin(broadcast(stats))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_terms"), round(sum(contrib), 6).as("bm25"))
      .orderBy(col("bm25").desc, col(id))
      .limit(k)
  }

  /** JENSEN–SHANNON DIVERGENCE between the token distributions of two
    * corpus slices (nats) — the symmetric, bounded (≤ ln 2) drift measure
    * every mixture audit wants where KL blows up on unshared tokens: how
    * far has a new crawl slice moved from the reference slice? One row
    * PER TOKEN with its exact slice counts and its JSD contribution,
    * plus the total as a window sum — the [[Profiler.woeIv]] output
    * shape, so per-token culprits and the headline number ship in one
    * pass.
    *
    * Plan: tokenize → ONE token-grain aggregation (conditional counts) →
    * a broadcast one-row totals join. VOCABULARY-bounded everywhere: the
    * window summing the total runs over token-grain rows, never corpus
    * grain. Determinism: counts are exact longs; each token's term is a
    * mirrored double chain over (n_p, n_q, N_p, N_q) rounded to 9
    * places; the total is a DECIMAL sum of those rounded terms (the
    * [[Profiler.chiSquareIndependence]] discipline) — never a
    * float-accumulation race. A slice with zero tokens yields null terms
    * (nothing to diverge from), never NaN. `slice` must be null-safe
    * (use `<=>`): tokens of rows where it evaluates null are dropped. */
  def jsDivergence(df: DataFrame, text: String, slice: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(slice.as("__s"),
        explode(split(trim(lower(col(text))), "\\s+")).as("term"))
      .filter(col("term") =!= "" && col("__s").isNotNull)
    val counts = toks.groupBy(col("term"))
      .agg(sum(when(col("__s"), 1L).otherwise(0L)).as("n_p"),
        sum(when(col("__s"), 0L).otherwise(1L)).as("n_q"))
    val tot = counts.agg(sum(col("n_p")).as("__np"), sum(col("n_q")).as("__nq"))
    val p = col("n_p").cast("double") / col("__np").cast("double")
    val q = col("n_q").cast("double") / col("__nq").cast("double")
    val m = (p + q) / lit(2.0)
    val term = when(col("__np") > 0 && col("__nq") > 0,
      when(col("n_p") > 0, p * log(p / m)).otherwise(lit(0.0)) / lit(2.0) +
        when(col("n_q") > 0, q * log(q / m)).otherwise(lit(0.0)) / lit(2.0))
    counts.crossJoin(broadcast(tot))
      .select(col("term"), col("n_p"), col("n_q"),
        round(term, 9).as("js_term"))
      .withColumn("jsd",
        sum(col("js_term").cast("decimal(20,9)"))
          .over(Window.partitionBy()).cast("double"))
  }

  /** ZIPF LAW FIT over the corpus token-frequency spectrum — the
    * log-log OLS line through (rank, frequency), the one-glance
    * naturalness check on any text corpus (natural language slopes near
    * −1; template spam, token soup, and truncated crawls bend the
    * line). Output: ONE row (n_types, n_tokens, slope, intercept).
    *
    * Plan: tokenize → token-grain counts → ONE rank window over the
    * DISTINCT-token frame (vocabulary-bounded, the [[Profiler.auc]]
    * window contract) → the four OLS moment sums. Determinism: ranks
    * and counts are exact integers, so ln() of them is the identical
    * double in any libm-faithful engine; each per-token product rounds
    * to 9 places and sums in DECIMAL; slope and intercept are mirrored
    * double chains over the exact sums (the intercept reuses the
    * UNROUNDED slope expression on both engines), round(6). A
    * single-type corpus has zero rank variance: null slope/intercept,
    * never NaN. */
  def zipfFit(df: DataFrame, text: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = df.select(
        explode(split(trim(lower(col(text))), "\\s+")).as("term"))
      .filter(col("term") =!= "")
    val tc = toks.groupBy(col("term")).agg(count(lit(1)).as("cnt"))
    val rk = tc.withColumn("rank",
      row_number().over(Window.orderBy(col("cnt").desc, col("term"))).cast("long"))
    val x = log(col("rank").cast("double"))
    val y = log(col("cnt").cast("double"))
    val s = rk.agg(count(lit(1)).as("n_types"), sum(col("cnt")).as("n_tokens"),
      sum(round(x, 9).cast("decimal(28,9)")).as("__sx"),
      sum(round(y, 9).cast("decimal(28,9)")).as("__sy"),
      sum(round(x * y, 9).cast("decimal(28,9)")).as("__sxy"),
      sum(round(x * x, 9).cast("decimal(28,9)")).as("__sxx"))
    def d(c: String) = col(c).cast("double")
    val nD = col("n_types").cast("double")
    val slope = (nD * d("__sxy") - d("__sx") * d("__sy")) /
      (nD * d("__sxx") - d("__sx") * d("__sx"))
    s.select(col("n_types"), col("n_tokens"),
      when(col("n_types") > 1, round(slope, 6)).as("slope"),
      when(col("n_types") > 1,
        round((d("__sy") - slope * d("__sx")) / nD, 6)).as("intercept"))
  }

  /** FLESCH READING-EASE readability (Flesch 1948 — the published
    * corpus-curation quality signal beside [[qualityFlags]]' rule pack:
    * readability bands separate prose from token soup and legalese):
    * `206.835 − 1.015·(words/sentences) − 84.6·(syllables/words)` with
    * the standard vowel-group syllable heuristic.
    *
    * Engine-exact counting, scan-stage, no shuffle:
    *  - words: whitespace tokens;
    *  - sentences: runs of [.!?], floored at 1 (headline-style docs);
    *  - syllables: vowel-group runs `[aeiouy]+` over the LOWERCASED doc
    *    plus one per vowel-less word (the per-word ≥1 floor, counted
    *    globally instead of per-word so the hot path is two regex scans
    *    and one lambda filter, not a regex per word).
    * All three are exact integers in any regex engine ([aeiouy]+ and
    * [.!?]+ mean the same thing in Java regex and RE2); the score is
    * one per-row double chain, round(6). Empty/whitespace-only docs
    * yield null score (0 words). Output: (id, n_words, n_sentences,
    * n_syllables, flesch). */
  def readability(df: DataFrame, id: String, text: String): DataFrame = {
    val words = split(trim(lower(col(text))), "\\s+")
    val nWords = when(length(trim(col(text))) === 0, 0)
      .otherwise(size(words)).cast("long")
    val nSent = greatest(
      size(regexp_extract_all(col(text), lit("[.!?]+"), lit(0))), lit(1))
      .cast("long")
    val vowelGroups = size(regexp_extract_all(lower(col(text)),
      lit("[aeiouy]+"), lit(0))).cast("long")
    val vowelless = size(filter(words, w => !w.rlike("[aeiouy]"))).cast("long")
    val nSyl = vowelGroups + vowelless
    val score = lit(206.835) -
      lit(1.015) * (col("n_words").cast("double") / col("n_sentences").cast("double")) -
      lit(84.6) * (col("n_syllables").cast("double") / col("n_words").cast("double"))
    df.select(col(id), nWords.as("n_words"), nSent.as("n_sentences"),
        nSyl.as("n_syllables"))
      .withColumn("flesch",
        when(col("n_words") > 0, round(score, 6)))
  }
}
