package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ALL-PAIRS SPARSE COSINE SIMILARITY over TF-IDF feature vectors —
  * the weighted member of the exact set-similarity family beside
  * [[Dedup.prefixJaccardPairs]] (symmetric overlap) and
  * [[Dedup.prefixContainmentPairs]] (directed overlap): finds document
  * pairs whose WEIGHTED feature profiles agree, where rare shared
  * features count for more than ubiquitous ones. The textbook reference
  * is Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search"
  * (WWW'07) — prefix filtering on a global feature order under a norm
  * bound.
  *
  * EXACT AND ORACLE-REPLAYABLE by the fixed-point discipline:
  *  - idf is floor-quantized rational: `idf_fp = (N+1)·scale div (df+1)`
  *    (integer floor division — Spark `div` ≡ DuckDB `//` for
  *    non-negative operands), weight `w = tf · idf_fp` an exact int64;
  *  - norms and dots are DECIMAL(38,0) sums of int64×int64 products cast
  *    before multiplying — associative, partitioning-independent;
  *  - the only doubles are one per-row chain at the very end:
  *    `cos = double(dot) / sqrt(double(n2_a)·double(n2_b))` — every
  *    operand is the same exact integer in both engines, every IEEE op
  *    is exactly rounded, so the τ comparison and the round(6) output
  *    are bit-identical cross-engine.
  *
  * SCALE (the reason this isn't a feature self-join): a feature shared
  * by df documents contributes df² candidate pairs. The Bayardo prefix
  * filter cuts this EXACTLY: order features globally rarest-first and
  * index only each document's PREFIX — the features whose tail
  * (suffix including self) still satisfies `Σ_suffix w² ≥ τ²·‖x‖²`. If
  * every shared feature lay beyond x's prefix, Cauchy–Schwarz gives
  * dot ≤ ‖x_suffix‖·‖y‖ < τ·‖x‖·‖y‖ — the pair cannot qualify; hence
  * SOME shared feature is in prefix(x), and since the prefix is a
  * rank-prefix under the shared global order, the RAREST shared feature
  * is in prefix(x) — and by symmetry in prefix(y) too. So candidates =
  * prefix ⋈ PREFIX (the [[Dedup.prefixJaccardPairs]] both-sided form —
  * quadratically smaller than prefix ⋈ full), hot features — LAST in
  * rarity order, absorbed by the suffix bound — rarely index, and the
  * τ² compare runs in exact integer arithmetic (`den²·S ≥ num²·‖x‖²`).
  * Verification is candidate-restricted: the posting equi-join computes
  * dots for surviving pairs only, never all pairs.
  *
  * FEATURE-CHOICE CONTRACT: pruning power comes from the rarity TAIL.
  * Word n-gram shingles ([[Dedup.shingles]]) are combinatorially rare
  * and prune hard at any vocabulary; raw unigrams over a tiny
  * vocabulary (the bench corpus is 31 distinct words, every one in
  * ~78% of documents) leave NOTHING for any prefix filter to cut — the
  * measured 99 s unigram run at sf0.1 vs ~1 s over shingles is that
  * structural fact, not an implementation gap. The registered query
  * feeds shingles; [[cosinePairs]] (unigram convenience) exists for
  * Zipf-tailed real text.
  *
  * Output: (doc_a, doc_b, cos) with doc_a < doc_b, cos ≥ num/den,
  * rounded to 6 places. */
object SparseSim {

  /** Exact all-pairs TF-IDF cosine over a (doc, feature) MULTISET frame
    * (tf = row multiplicity; feed [[Dedup.shingles]] for set semantics
    * with tf = 1). N for idf = the frame's distinct doc count. */
  def cosinePairsOver(features: DataFrame, doc: String, feature: String,
                      tauNum: Long, tauDen: Long,
                      scale: Long = 1000L): DataFrame = {
    require(tauNum > 0 && tauDen > 0 && tauNum <= tauDen,
      s"cosinePairsOver: need 0 < tauNum/tauDen <= 1, got $tauNum/$tauDen")
    // materialized: tf has THREE consumers (dfq, the n_docs scalar, wq) —
    // left lazy each re-derives the whole feature-generation subtree (for
    // the registered shingle feed: tokenize + gram explode + distinct),
    // and exchange reuse cannot bridge the separate scalar-subquery job
    val tf = features.select(col(doc).as("doc"), col(feature).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = tf.agg(count_distinct(col("doc")).as("n_docs"))
    // the global rarest-first order is (doc_freq, term) DIRECTLY — a
    // total order every doc shares; no dense zipWithIndex rank is needed
    // (measured −2 s at sf0.1: the rank was a whole extra sort job), the
    // dfq join already rides along for the idf weight, and `term` itself
    // is the candidate/verify join key
    val wq = tf.join(dfq, "term").crossJoin(broadcast(n))
      .select(col("doc"), col("term"), col("doc_freq"),
        (col("tf") * expr(s"((n_docs + 1) * $scale) div (doc_freq + 1)"))
          .as("w"))
    val w2 = (col("w").cast("decimal(19,0)") * col("w")).as("w2")
    // per-doc postings sorted rarest-first, suffix-norm² window (doc
    // grain — bounded by document feature count), norm², prefix mark:
    // feature i indexed iff den²·S_i ≥ num²·norm2, S_i = Σ_{j≥i} w²
    val rarest = Seq(col("doc_freq"), col("term"))
    val suffix = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc")).orderBy(rarest: _*)
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val all = org.apache.spark.sql.expressions.Window.partitionBy(col("doc"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.unboundedFollowing)
    val marked = wq.select(col("doc"), col("term"), col("w"),
        sum(w2).over(suffix).as("sfx2"),
        sum(w2).over(all).as("norm2"))
      .withColumn("in_prefix",
        col("sfx2") * lit(tauDen * tauDen) >= col("norm2") * lit(tauNum * tauNum))
      .localCheckpoint() // reused 4x (prefix, probe, verify a/b) — each use
                         // would otherwise replay the posting windows
    val posts = marked.select(col("doc"), col("term"), col("w"), col("norm2"))
    val pfx = marked.filter(col("in_prefix")).select(col("doc"), col("term"))
    // candidates: prefix ⋈ prefix (the rarest shared feature is in both
    // rank-prefixes — see the lemma above), canonicalized, distinct
    val cand = pfx.select(col("doc").as("pd"), col("term"))
      .join(pfx.select(col("doc").as("fd"), col("term")), "term")
      .filter(col("pd") < col("fd"))
      .select(col("pd").as("doc_a"), col("fd").as("doc_b"))
      .distinct()
    // candidate-restricted exact verify: shared-feature posting equi-join
    val pa = posts.select(col("doc").as("doc_a"), col("term"),
      col("w").as("wa"), col("norm2").as("n2a"))
    val pb = posts.select(col("doc").as("doc_b"), col("term"),
      col("w").as("wb"), col("norm2").as("n2b"))
    val dots = cand.join(pa, "doc_a").join(pb, Seq("doc_b", "term"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa").cast("decimal(19,0)") * col("wb")).as("dot"),
        // min == the value: norms are constant per doc within the group
        // (min, not first — no order-dependence even in appearance)
        min(col("n2a")).as("n2a"), min(col("n2b")).as("n2b"))
    val cos = col("dot").cast("double") /
      sqrt(col("n2a").cast("double") * col("n2b").cast("double"))
    dots
      .filter(cos >= lit(tauNum.toDouble / tauDen.toDouble))
      .select(col("doc_a"), col("doc_b"), round(cos, 6).as("cos"))
  }

  /** Unigram-text convenience form: whitespace-tokenized lowercased
    * terms as features (tf = term multiplicity). See the feature-choice
    * contract above — prefer shingle features on small vocabularies. */
  def cosinePairs(df: DataFrame, id: String, text: String,
                  tauNum: Long, tauDen: Long,
                  scale: Long = 1000L): DataFrame =
    cosinePairsOver(
      df.select(col(id).as("doc"),
        explode(split(trim(lower(col(text))), "\\s+")).as("term")),
      "doc", "term", tauNum, tauDen, scale)

  /** The quadratic verification twin — every (a < b) feature-sharing
    * pair scored exactly, no prefix filter. Shares the weight/dot/cos
    * arithmetic column-for-column with [[cosinePairsOver]] via the same
    * fixed-point definitions; exists so the prefix filter's losslessness
    * is a spec assertion against the SAME corpus, the [[Dedup]]
    * labeled-twin convention. NOT a production path. */
  def cosinePairsOverExhaustive(features: DataFrame, doc: String,
                                feature: String, tauNum: Long, tauDen: Long,
                                scale: Long = 1000L): DataFrame = {
    val tf = features.select(col(doc).as("doc"), col(feature).as("term"))
      .groupBy(col("doc"), col("term")).agg(count(lit(1)).as("tf"))
    val dfq = tf.groupBy(col("term")).agg(count(lit(1)).as("doc_freq"))
    val n = tf.agg(count_distinct(col("doc")).as("n_docs"))
    val wq = tf.join(dfq, "term").crossJoin(broadcast(n))
      .select(col("doc"), col("term"),
        (col("tf") * expr(s"((n_docs + 1) * $scale) div (doc_freq + 1)"))
          .as("w"))
    val norms = wq.groupBy(col("doc"))
      .agg(sum(col("w").cast("decimal(19,0)") * col("w")).as("norm2"))
    val pa = wq.select(col("doc").as("doc_a"), col("term"), col("w").as("wa"))
    val pb = wq.select(col("doc").as("doc_b"), col("term"), col("w").as("wb"))
    val dots = pa.join(pb, "term").filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(sum(col("wa").cast("decimal(19,0)") * col("wb")).as("dot"))
      .join(norms.select(col("doc").as("doc_a"), col("norm2").as("n2a")), "doc_a")
      .join(norms.select(col("doc").as("doc_b"), col("norm2").as("n2b")), "doc_b")
    val cos = col("dot").cast("double") /
      sqrt(col("n2a").cast("double") * col("n2b").cast("double"))
    dots
      .filter(cos >= lit(tauNum.toDouble / tauDen.toDouble))
      .select(col("doc_a"), col("doc_b"), round(cos, 6).as("cos"))
  }
}
