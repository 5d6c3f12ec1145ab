package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level hygiene operators for training-data pipelines: the
  * cross-document cleanup passes that run between raw ingest and
  * tokenization (CCNet-style paragraph dedup, Gopher-style repetition
  * gates, benchmark decontamination, near-dup purge).
  *
  * Scale design (the 100 TB story):
  *  - [[paragraphDedup]] shuffles on the 16-byte paragraph fingerprint —
  *    uniform keys, map-side-combinable, and the reconstruction shuffle is
  *    keyed by doc id. No corpus-sized driver state anywhere.
  *  - [[repetitionStats]] is two gram-shaped aggregations per document,
  *    both partial-aggregated before the exchange.
  *  - [[decontaminate]] pre-filters corpus shingles with a Bloom bitmap of
  *    the benchmark set. The bitmap is a few KB..MB regardless of how many
  *    shingles it encodes (vs broadcasting the shingle strings themselves),
  *    which is exactly why Spark's own runtime filters inject
  *    bloom_filter_agg for large builds; false positives are then removed
  *    by an exact semi-join over the tiny surviving candidate set, so the
  *    OUTPUT is exact — the bloom only prunes definitely-clean shingles
  *    before anything shuffles.
  *  - [[nearDupPurge]] composes the bucketed LSH pair path with the
  *    pointer-jumping cluster resolution — both already bounded — and one
  *    anti-join.
  *
  * All expressions are built-ins (md5 / xxhash64 / bit ops) → whole-stage
  * codegen; no UDFs.
  */
object Corpus {

  /** Whitespace word array of a text column — the same tokenizer as
    * [[Dedup.shingles]] (mirrored by the DuckDB oracles'
    * `string_split_regex(trim(text), '\s+')`). */
  private def wordsOf(text: Column): Column = split(trim(text), "\\s+")

  /** Non-overlapping `size`-word windows of a word array, in document
    * order. A document always yields at least one chunk (`split` of an
    * empty string is `[""]`, so `size(w) >= 1`). */
  private def chunksOf(w: Column, size: Int): Column =
    transform(sequence(lit(0), floor((org.apache.spark.sql.functions.size(w) - 1) / size).cast("int")),
      j => concat_ws(" ", slice(w, j * size + 1, lit(size))))

  /** CCNet-style corpus-wide paragraph dedup: split every document into
    * non-overlapping `size`-word paragraphs, keep only the FIRST occurrence
    * of each distinct paragraph across the whole corpus (first = smallest
    * (doc id, position) — deterministic), and reconstruct each document
    * from its surviving paragraphs in order.
    *
    * Output: (id, n_chunks, n_kept, clean_text) — one row per input
    * document; a document whose every paragraph was seen earlier survives
    * with `n_kept = 0` and an empty `clean_text` (the caller decides
    * whether to drop it, as CCNet does for empty docs).
    *
    * Scale: the dedup shuffle is keyed by the md5 fingerprint (uniform,
    * 16 bytes); the window inside each fingerprint group ranks a handful of
    * rows. Reconstruction is one groupBy(id) with an array_sort over the
    * kept (pos, chunk) pairs — per-doc state bounded by the document
    * itself. */
  def paragraphDedup(df: DataFrame, id: String, text: String,
                     size: Int = 32): DataFrame = {
    val chunks = df
      .select(col(id), wordsOf(col(text)).as("w"))
      .select(col(id), posexplode(chunksOf(col("w"), size)).as(Seq("pos", "chunk")))
    val kept = chunks
      .withColumn("rk", row_number().over(
        Window.partitionBy(md5(col("chunk"))).orderBy(col(id), col("pos"))))
      .filter(col("rk") === 1)
    val totals = chunks.groupBy(col(id)).agg(count(lit(1)).as("n_chunks"))
    val rebuilt = kept.groupBy(col(id)).agg(
      count(lit(1)).as("n_kept"),
      array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
        s => s.getField("chunk")), " ").as("clean_text"))
    totals.join(rebuilt, Seq(id), "left")
      .select(col(id), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** All (overlapping) word n-gram occurrences — NOT distinct, unlike
    * [[Dedup.shingles]]: repetition measures need multiplicity. */
  private def gramsOf(w: Column, n: Int): Column =
    when(org.apache.spark.sql.functions.size(w) >= n,
      transform(sequence(lit(1), org.apache.spark.sql.functions.size(w) - (n - 1)),
        i => concat_ws(" ", slice(w, i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Per-gram-size repetition aggregates: (id, max_c, tot, dup) where
    * `max_c` is the count of the most frequent n-gram, `tot` the total
    * occurrences and `dup` the occurrences of grams appearing more than
    * once. Documents shorter than n words produce no row (callers
    * left-join and default to zero). */
  private def gramStats(words: DataFrame, id: String, n: Int): DataFrame =
    words.select(col(id), explode(gramsOf(col("w"), n)).as("g"))
      .groupBy(col(id), col("g")).agg(count(lit(1)).as("c"))
      .groupBy(col(id)).agg(
        max(col("c")).as("max_c"),
        sum(col("c")).as("tot"),
        sum(when(col("c") > 1, col("c")).otherwise(lit(0L))).as("dup"))

  /** Gopher-style repetition gates, word-based (this corpus has no line
    * structure): per document
    *  - `n_words`,
    *  - `distinct_word_ratio` (1.0 = no repeated word),
    *  - `top_bigram_frac` — word slots covered by the most frequent bigram
    *    (count × 2 / n_words; overlapping occurrences can push it past 1,
    *    as in Gopher's character version — it's a gate, not a measure),
    *  - `dup_trigram_frac` — fraction of trigram occurrences whose trigram
    *    appears more than once.
    *
    * Two shuffles, both partial-aggregated; every division is a single
    * int→double op mirrored exactly by the oracle. */
  def repetitionStats(df: DataFrame, id: String, text: String): DataFrame = {
    val words = df.select(col(id), wordsOf(col(text)).as("w"))
    val base = words.select(col(id),
      org.apache.spark.sql.functions.size(col("w")).cast("long").as("n_words"),
      (org.apache.spark.sql.functions.size(array_distinct(col("w"))).cast("double") /
        org.apache.spark.sql.functions.size(col("w"))).as("distinct_word_ratio"))
    val bi = gramStats(words, id, 2)
      .select(col(id), col("max_c").as("bi_max"))
    val tri = gramStats(words, id, 3)
      .select(col(id), col("dup").as("tri_dup"), col("tot").as("tri_tot"))
    base
      .join(bi, Seq(id), "left")
      .join(tri, Seq(id), "left")
      .select(col(id), col("n_words"), col("distinct_word_ratio"),
        coalesce((col("bi_max") * 2).cast("double") / col("n_words"), lit(0d))
          .as("top_bigram_frac"),
        coalesce(col("tri_dup").cast("double") / col("tri_tot"), lit(0d))
          .as("dup_trigram_frac"))
  }

  /** One Bloom-filter position per (element, probe): `pmod(xxhash64(e, j),
    * numBits)` for j in 0 until k. */
  private def bloomPositions(e: Column, numBits: Int, k: Int): Seq[Column] =
    (0 until k).map(j => pmod(xxhash64(e, lit(j)), lit(numBits.toLong)))

  /** Build a Bloom bitmap over a string column as ONE dense `array<long>`
    * row (`numBits / 64` words, column `bm`). Fully distributed: positions
    * are exploded, OR-combined per 64-bit word with `bit_or` (map-side
    * partial), and densified in a final single-row projection. The result
    * is broadcast-joined by consumers — index metadata, never corpus
    * data. */
  def bloomBitmap(items: DataFrame, itemCol: String, numBits: Int, k: Int): DataFrame = {
    require(numBits % 64 == 0, s"numBits must be a multiple of 64, got $numBits")
    val words = numBits / 64
    items
      .select(explode(array(bloomPositions(col(itemCol), numBits, k): _*)).as("p"))
      .select(shiftright(col("p"), 6).as("word_idx"),
        call_function("shiftleft", lit(1L), (col("p") % 64).cast("int")).as("mask"))
      .groupBy(col("word_idx")).agg(expr("bit_or(mask)").as("bits"))
      .groupBy().agg(map_from_entries(collect_list(struct(col("word_idx"), col("bits")))).as("m"))
      .select(transform(sequence(lit(0), lit(words - 1)),
        i => coalesce(element_at(col("m"), i.cast("long")), lit(0L))).as("bm"))
  }

  /** `true` iff every probe bit of `e` is set in the bitmap column `bm` —
    * the k bit-tests are unrolled at plan-build time into a codegen'd
    * conjunction (no HOF, no UDF). No false negatives, so filtering on
    * this never loses a true member. */
  def bloomMightContain(e: Column, bm: Column, numBits: Int, k: Int): Column =
    bloomPositions(e, numBits, k).map { p =>
      (element_at(bm, shiftright(p, 6).cast("int") + 1)
        .bitwiseAND(call_function("shiftleft", lit(1L), (p % 64).cast("int"))) =!= 0L)
    }.reduce(_ && _)

  /** Benchmark decontamination, Bloom-accelerated and EXACT: drop every
    * corpus document sharing at least one word n-gram shingle with the
    * benchmark set; keep the rest unchanged.
    *
    * Pipeline: benchmark shingles → Bloom bitmap (small, broadcast);
    * corpus shingles → bloom pre-filter (drops the overwhelmingly-clean
    * majority with zero shuffle) → exact semi-join of the few survivors
    * against the real benchmark shingle set (removes bloom false
    * positives) → anti-join the contaminated doc ids out of the corpus.
    * Because the bloom has no false negatives and the exact join has no
    * false positives, the output is identical to the un-accelerated
    * anti-join — the oracle never mentions the bloom. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, id: String,
                    text: String, n: Int = 5, numBits: Int = 1 << 18,
                    k: Int = 4): DataFrame = {
    val bs = Dedup.shingles(benchmark, id, text, n)
      .select(col("shingle")).distinct()
    val bm = bloomBitmap(bs, "shingle", numBits, k)
    val candidates = Dedup.shingles(corpus, id, text, n)
      .crossJoin(broadcast(bm))
      .filter(bloomMightContain(col("shingle"), col("bm"), numBits, k))
      .select(col(id), col("shingle"))
    val contaminated = candidates
      .join(bs, Seq("shingle"), "left_semi")
      .select(col(id)).distinct()
    corpus.join(contaminated, Seq(id), "left_anti")
  }

  /** N-GRAM SPAN SCRUB — SURGICAL decontamination (the GPT-3 appendix-C
    * construction): instead of dropping every document that shares an
    * n-gram with the benchmark ([[decontaminate]]'s doc-level policy),
    * remove only the TOKEN SPANS covered by a matching n-gram and keep
    * the rest of the document. The doc-level form wastes data when a
    * long document quotes one benchmark sentence; the span form is what
    * production pipelines actually ship.
    *
    * Plan, every stage linear and keyed:
    *  1. positioned corpus n-grams (scan-stage transform over the token
    *     array — start positions ride a struct, no join on position);
    *  2. one equi-join against the benchmark's DISTINCT grams marks the
    *     matched starts;
    *  3. covered positions = each matched start exploded to its n token
    *     slots, dedup'd (matches overlap);
    *  4. kept tokens = positioned tokens ANTI-JOIN covered, reassembled
    *     per document with an order-free sort_array(collect_list(struct))
    *     — per-doc memory is the document's own tokens, the
    *     [[graft.operators.TextAnalysis]] reassembly convention.
    *
    * Every input document appears in the output — a fully-scrubbed doc
    * keeps n_kept = 0 and clean_text = '' (callers usually drop those;
    * that policy stays theirs), a doc shorter than n words has no gram
    * and survives untouched. Token positions are 1-based on both engines
    * (the oracle mirrors with list_slice + range). */
  def ngramScrub(corpus: DataFrame, benchmark: DataFrame, id: String,
                 text: String, n: Int = 5): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    val ws = filter(TextAnalysis.words(col(text)), w => w =!= "")
    def grams(d: DataFrame): DataFrame = {
      // ws is HOISTED to a materialized column before the transform: the
      // lambda below must reference an attribute, not the tokenizer
      // expression — a captured expression re-evaluates PER ELEMENT,
      // turning gram building into O(tokens²)/doc (the q_rouge2 scale
      // killer, caught again here by the 10× probe's flat wall).
      val w = d.select(col(id), ws.as("__w"))
      val starts = when(size(col("__w")) - lit(n - 1) >= 1,
        sequence(lit(1), size(col("__w")) - lit(n - 1)))
        .otherwise(array().cast("array<int>"))
      w.select(col(id), explode(transform(starts,
          i => struct(i.as("p"), array_join(slice(col("__w"), i, lit(n)), " ").as("g")))).as("__s"))
        .select(col(id), col("__s.p").as("p"), col("__s.g").as("g"))
    }
    val bg = grams(benchmark).select(col("g")).distinct()
    val covered = grams(corpus)
      .join(bg, Seq("g"), "left_semi")
      .select(col(id), explode(sequence(col("p"), col("p") + lit(n - 1))).as("pos"))
      .distinct()
    val toks = corpus
      .select(col(id), posexplode(ws).as(Seq("pos0", "tok")))
      .select(col(id), (col("pos0") + 1).as("pos"), col("tok"))
    val kept = toks.join(covered, Seq(id, "pos"), "left_anti")
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          s => s.getField("tok")), " ").as("clean_text"))
    corpus.select(col(id), size(ws).cast("long").as("n_tokens"))
      .join(kept, Seq(id), "left")
      .select(col(id), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("n_tokens") - coalesce(col("n_kept"), lit(0L))).as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }

  /** Near-duplicate purge: resolve duplicate clusters over the bucketed
    * MinHash+LSH pair path ([[Dedup.nearDupPairs]] →
    * [[Dedup.dupGroups]]) and keep one canonical document per cluster
    * (the min-id group label), plus every unclustered document.
    * The output is the training corpus a near-dup pass actually feeds
    * downstream — detection ([[Dedup.nearDupPairs]]) and resolution
    * ([[Dedup.dupGroups]]) already have their own gates; this composes
    * them with the final anti-join. */
  def nearDupPurge(df: DataFrame, id: String, text: String, n: Int,
                   threshold: Double,
                   maxCandidatesPerDoc: Option[Double] =
                     Some(Dedup.DefaultCandidatesPerDoc),
                   bandedCacheKey: Option[String] = None): DataFrame = {
    // The candidate cap passes through because a purge's TARGET workload
    // is a duplicate-saturated corpus — exactly where the default cap can
    // legitimately fire. The default stays on (fail loudly on an
    // unexpectedly all-hot corpus); a caller that EXPECTS saturation
    // raises the factor or passes None deliberately, rather than being
    // locked out of the API.
    // dupGroups has a FIXED output contract — (doc_id, group_id),
    // whatever the caller's id column is named (its pair input is always
    // doc_a/doc_b) — so the loser set is selected by that contract and
    // aliased back to the caller's id for the anti-join
    val losers = Dedup.dupGroups(Dedup.nearDupPairs(df, id, text, n, threshold,
        maxCandidatesPerDoc = maxCandidatesPerDoc,
        bandedCacheKey = bandedCacheKey))
      .filter(col("group_id") =!= col("doc_id"))
      .select(col("doc_id").as(id))
    df.join(losers, Seq(id), "left_anti")
  }
}
