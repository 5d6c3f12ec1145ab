package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection: per-document importance weights from hashed
  * n-gram features (Xie et al., "Data Selection for Language Models via
  * Importance Resampling", NeurIPS 2023). Score each candidate document by
  * how much more likely its tokens are under a TARGET distribution (the
  * domain you want more of) than under the RAW corpus distribution —
  * documents with high weight are up-sampled toward the target domain.
  *
  * Model: hashed unigram bag-of-words (the paper's hashed n-gram feature
  * space; unigram buckets here — the bigram extension is the same plan
  * with a second explode). Token features hash into `buckets` cells via
  * the repo's portable md5 construction, both distributions get add-one
  * smoothing over the bucket space, and a document's log importance
  * weight is
  *
  *   Σ_tokens  ln p_target(bucket) − ln p_corpus(bucket)
  *
  * Scale shape — three bounded passes, no driver state:
  *  1. explode to token grain, hash to buckets (map-only);
  *  2. ONE aggregation keyed by bucket computes target and corpus counts
  *     together (conditional sum; map-side combine ⇒ shuffled bytes are
  *     bucket-table-sized, not token-count-sized);
  *  3. the bucket table (≤ `buckets` rows) and its one-row totals
  *     broadcast back onto the token stream; per-document sum is one
  *     aggregation on the document key.
  *
  * Determinism: the weight is `round(…, 6)` — the repo convention that
  * soaks up cross-libm `ln` and summation-order drift (see
  * [[TextAnalysis.unigramLogProb]]); the hash is the portable md5 bucket,
  * identical in any engine.
  */
object Dsir {

  /** Portable token→bucket hash (first 8 md5 hex chars → bigint % buckets). */
  def featureBucket(tok: Column, buckets: Int): Column =
    conv(substring(md5(tok), 1, 8), 16, 10).cast("long") % buckets

  /** (id, n_tokens, log_weight) per document; `isTarget` marks the rows
    * whose tokens define the target distribution (e.g. `col("lang") ===
    * "en"` or a curated-domain flag). Documents with zero tokens are
    * absent from the output (no features ⇒ no weight), mirroring the
    * paper's setup. */
  def importanceWeights(df: DataFrame, id: String, text: String,
                        isTarget: Column, buckets: Int = 1024): DataFrame = {
    val toks = df
      .select(col(id), isTarget.as("__is_target"),
        explode(TextAnalysis.words(lower(col(text)))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("b", featureBucket(col("tok"), buckets))
    val bucketStats = toks.groupBy(col("b")).agg(
      count(lit(1)).as("cnt_c"),
      sum(when(col("__is_target"), 1L).otherwise(0L)).as("cnt_t"))
    val totals = bucketStats.agg(
      sum(col("cnt_c")).as("tot_c"), sum(col("cnt_t")).as("tot_t"))
    val term =
      log((col("cnt_t") + lit(1.0)) / (col("tot_t") + lit(buckets.toDouble))) -
      log((col("cnt_c") + lit(1.0)) / (col("tot_c") + lit(buckets.toDouble)))
    toks
      .join(broadcast(bucketStats), "b")
      .crossJoin(broadcast(totals))
      .groupBy(col(id))
      .agg(count(lit(1)).as("n_tokens"), round(sum(term), 6).as("log_weight"))
  }
}
