package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair encoding: distributed corpus statistics, vocabulary-bounded
  * training, scan-stage application — the tokenizer-construction step of a
  * training-data pipeline (Sennrich et al., "Neural Machine Translation of
  * Rare Words with Subword Units", ACL 2016).
  *
  * Scale split (mirrors [[IvfIndex]]'s offline/online separation):
  *
  *  - TRAINING statistics are distributed: the corpus collapses to a
  *    (word → frequency) table in one map-side-combined aggregation, so
  *    shuffled bytes are VOCABULARY-sized, not corpus-sized — 100 TB of
  *    text reduces to at most `maxVocab` rows before anything is
  *    collected. The merge iterations then run on that bounded table
  *    driver-side (the table is the whole training state; each of the
  *    ~10⁴ iterations touches every word, which as Spark jobs would be
  *    10⁴ tiny shuffles — the bounded collect is the right plan, and is
  *    guarded by `maxVocab`).
  *  - APPLICATION is pure scan-stage compute: the merge list ships as a
  *    foldable literal into [[graft.plans.BpeEncode]], whose per-executor
  *    rank table encodes each row with zero shuffle — tokenization
  *    pipelines into whatever consumes it.
  */
object Bpe {

  /** A trained merge table, rank = position. */
  final case class Model(merges: Seq[(String, String)]) {
    /** The merge table as the foldable literal `bpe_encode` consumes. */
    def mergesLit: Column = typedLit(merges.map(p => Seq(p._1, p._2)))
  }

  /** Learn `numMerges` merges from the corpus' word-frequency table.
    * Deterministic: ties on pair frequency break lexicographically, so the
    * merge list is a pure function of the corpus. Stops early when no
    * adjacent pair repeats (frequency < 2 — merging a hapax pair only
    * bloats the vocab). */
  def train(df: DataFrame, text: String, numMerges: Int,
            maxVocab: Int = 1000000): Model = {
    val freqRows = df
      .select(explode(TextAnalysis.words(lower(col(text)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .limit(maxVocab + 1)
      .collect()
    require(freqRows.length <= maxVocab,
      s"Bpe.train: corpus vocabulary exceeds maxVocab=$maxVocab — raise the " +
        "bound or pre-filter the corpus (vocabulary, not corpus size, is the " +
        "driver-side state)")
    // word → (symbols, freq); symbols start as unicode code points
    val words = freqRows.map { r =>
      val w = r.getString(0)
      val syms = scala.collection.mutable.ArrayBuffer[String]()
      var i = 0
      while (i < w.length) {
        val n = Character.charCount(w.codePointAt(i))
        syms += w.substring(i, i + n)
        i += n
      }
      (syms, r.getLong(1))
    }
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var iter = 0
    var exhausted = false
    while (iter < numMerges && !exhausted) {
      val pairCounts = scala.collection.mutable.HashMap[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          pairCounts.update(p, pairCounts.getOrElse(p, 0L) + f)
          j += 1
        }
      }
      val best = pairCounts.filter(_._2 >= 2L)
      if (best.isEmpty) exhausted = true
      else {
        val ((a, b), _) = best.minBy { case ((x, y), c) => (-c, x, y) }
        merges += ((a, b))
        words.foreach { case (syms, _) =>
          var j = 0
          while (j < syms.length - 1) {
            if (syms(j) == a && syms(j + 1) == b) {
              syms(j) = a + b
              syms.remove(j + 1): Unit
            } else j += 1
          }
        }
        iter += 1
      }
    }
    Model(merges.toSeq)
  }

  /** Tokenize: `(id, tokens array<string>, n_tokens)` per document, word
    * boundaries from the same whitespace splitter as training. Scan-stage
    * only — no explode, no shuffle. */
  def encode(df: DataFrame, id: String, text: String, model: Model): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(col(id),
      call_function("bpe_encode",
        TextAnalysis.words(lower(col(text))), model.mergesLit).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }

  /** SELF-CERTIFYING variant of [[encode]]: BPE is lossless by
    * construction (merges only ever concatenate adjacent symbols of the
    * same word), so `decode(encode(w)) = w` must hold for EVERY row —
    * this variant checks the round-trip in-plan (token concatenation ≡
    * word concatenation, both whitespace-free) and `raise_error`s on the
    * first violating document. A rows-only gate over the tokenizer can
    * therefore no longer pass on shaped garbage: the query fails unless
    * the encoding is actually invertible over the full column. Still pure
    * scan-stage — the audit adds one string concat + equality per row. */
  def encodeAudited(df: DataFrame, id: String, text: String, model: Model): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(col(id), TextAnalysis.words(lower(col(text))).as("__w"),
        call_function("bpe_encode",
          TextAnalysis.words(lower(col(text))), model.mergesLit).as("__t"))
      .select(col(id),
        when(concat_ws("", col("__t")) === concat_ws("", col("__w")), col("__t"))
          .otherwise(raise_error(concat(
            lit("BPE round-trip (decode∘encode ≠ id) failed at "),
            col(id).cast("string")))).as("tokens"))
      .withColumn("n_tokens", size(col("tokens")))
  }
}
