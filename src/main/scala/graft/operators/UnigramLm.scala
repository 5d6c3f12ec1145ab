package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.plans.UnigramCodec

/** Unigram-LM subword tokenizer (SentencePiece's unigram model — Kudo,
  * "Subword Regularization", ACL 2018) — the TRAINABLE counterpart to
  * [[Bpe]]: instead of greedy merge rules, a piece VOCABULARY with
  * per-piece costs, applied by exact Viterbi segmentation.
  *
  * The scale split is [[Bpe]]'s verbatim:
  *  - TRAINING statistics are distributed: the corpus collapses to a
  *    (word → frequency) table in one map-side-combined aggregation
  *    (shuffled bytes are VOCABULARY-sized), and the EM iterations run on
  *    that bounded table driver-side, guarded by `maxVocab` — per-round
  *    state is the piece table (≤ vocab · maxPieceLen² entries), never
  *    corpus rows.
  *  - APPLICATION is pure scan-stage compute: the trained piece/cost
  *    tables ship as foldable literals into
  *    [[graft.plans.UnigramEncode]], one codegen Viterbi per row.
  *
  * What makes it HASH-GATEABLE (the [[Clustering]] fixed-point
  * discipline applied to a language model): instead of float log-probs —
  * whose EM trajectory no two libms replay bit-identically — piece costs
  * are INTEGERS, `64 − ⌊log₂ freq⌋` (`63 − numberOfLeadingZeros` here,
  * `length(bin(f)) − 1` in the oracle — both exact), i.e. quantized
  * negative log₂-likelihoods. EM is the HARD variant (Viterbi E-step,
  * recount M-step): segment every vocabulary word under the current
  * costs, recount piece frequencies from the winning segmentations
  * weighted by word frequency, drop multi-char pieces that no
  * segmentation used, keep single chars forever at frequency ≥ 1 (the
  * coverage guarantee), requantize costs. Every step is integer-exact,
  * so the DuckDB oracle replays the ENTIRE trajectory — seeding, both EM
  * rounds, and the final per-word Viterbi — as unrolled CTE chains and
  * the encoded corpus hash-matches bit-for-bit.
  */
object UnigramLm {

  /** A trained model: aligned (piece, cost) pairs, plus the longest
    * training word (the oracle's DP-unroll bound rides on it). */
  final case class Model(pieces: Seq[(String, Long)], maxWordLen: Int) {
    def piecesLit: Column = typedLit(pieces.map(_._1))
    def costsLit: Column = typedLit(pieces.map(_._2))
    def codec: UnigramCodec = new UnigramCodec(pieces.toArray)
  }

  /** cost = 64 − ⌊log₂ f⌋ — exact for any positive BIGINT frequency. */
  private def costOf(f: Long): Long = {
    require(f >= 1L, s"piece frequency must be >= 1, got $f")
    64L - (63L - java.lang.Long.numberOfLeadingZeros(f))
  }

  /** Learn a piece table by `rounds` hard-EM rounds over the corpus'
    * word-frequency table. Deterministic by construction; pieces are
    * returned lexicographically sorted so the shipped literal (and any
    * dump of the model) is canonical. */
  def train(df: DataFrame, text: String, maxPieceLen: Int = 4,
            rounds: Int = 2, maxVocab: Int = 1000000): Model = {
    require(maxPieceLen >= 1 && rounds >= 1,
      s"need maxPieceLen/rounds >= 1, got $maxPieceLen/$rounds")
    val freqRows = df
      .select(explode(TextAnalysis.words(lower(col(text)))).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      .limit(maxVocab + 1)
      .collect()
    require(freqRows.length <= maxVocab,
      s"UnigramLm.train: corpus vocabulary exceeds maxVocab=$maxVocab — raise " +
        "the bound or pre-filter the corpus (vocabulary, not corpus size, is " +
        "the driver-side state)")
    val words: Array[(String, Long)] =
      freqRows.map(r => (r.getString(0), r.getLong(1)))
    val maxWordLen = if (words.isEmpty) 0 else words.map(_._1.length).max
    // seed: every substring of length 1..maxPieceLen, occurrence-weighted
    val seed = scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (w, f) =>
      var l = 1
      while (l <= math.min(maxPieceLen, w.length)) {
        var s = 0
        while (s + l <= w.length) {
          val p = w.substring(s, s + l)
          seed.update(p, seed.getOrElse(p, 0L) + f)
          s += 1
        }
        l += 1
      }
    }
    var vocab: Map[String, Long] = seed.toMap // piece → cost source freq
    for (_ <- 1 to rounds) {
      val codec = new UnigramCodec(
        vocab.toArray.sortBy(_._1).map { case (p, f) => (p, costOf(f)) })
      val recount = scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (w, f) =>
        codec.segmentWord(w)._1.foreach { p =>
          recount.update(p, recount.getOrElse(p, 0L) + f)
        }
      }
      // multi-char pieces live only while used; single chars never die
      vocab = vocab.flatMap { case (p, _) =>
        val fr = recount.getOrElse(p, 0L)
        if (fr >= 1L) Some(p -> fr)
        else if (p.length == 1) Some(p -> 1L)
        else None
      }
    }
    Model(vocab.toSeq.sortBy(_._1).map { case (p, f) => (p, costOf(f)) },
      maxWordLen)
  }

  /** Tokenize: `(id, pieces array<string>, n_pieces)` per document —
    * scan-stage only, word boundaries from the same whitespace splitter
    * as training. */
  def encode(df: DataFrame, id: String, text: String, model: Model): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    df.select(col(id),
        call_function("unigram_encode",
          TextAnalysis.words(lower(col(text))),
          model.piecesLit, model.costsLit).as("pieces"))
      .withColumn("n_pieces", size(col("pieces")))
  }
}
