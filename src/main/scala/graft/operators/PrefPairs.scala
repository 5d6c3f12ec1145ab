package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PREFERENCE-PAIR LEAKAGE GUARD — dedup/decontamination at the
  * (prompt, chosen, rejected) grain, the RLHF/DPO counterpart of the
  * document-grain [[Sampling.leakageSafeSplit]]. Two contamination
  * modes per-document hashing cannot see:
  *
  *  - EXACT TRIPLE DUPLICATES — the same (prompt, chosen, rejected)
  *    annotated twice inflates its gradient weight; [[exactSurvivors]]
  *    keeps the min-id row per normalized triple fingerprint.
  *  - PROMPT-LEVEL NEAR-DUPS ACROSS PAIRS — two pairs whose prompts are
  *    near-identical (re-crawled prompt, template variants, or the
  *    preference-FLIP case: same prompt, chosen/rejected swapped by a
  *    disagreeing annotator) straddling train/eval is silent leakage,
  *    and a flip inside the training cut is label noise. The guard
  *    resolves prompt near-dup clusters with the O(log d)
  *    pointer-jumping components pass and assigns splits at CLUSTER
  *    grain ([[Dedup.dupGroups]] ∘ [[Sampling.leakageSafeSplit]]), so
  *    every pair sharing a near-dup prompt lands in the SAME cut, and
  *    stamps (n_group_pairs, is_canonical) so downstream can keep one
  *    pair per prompt cluster or weigh the disagreement.
  *
  * The prompt pair list is an INPUT (`promptPairs`: doc_a/doc_b at pair
  * grain): any generator composes — the gated query uses the exhaustive
  * shingle-Jaccard generator to match its oracle; at 100 TB swap in the
  * banded MinHash-LSH generator ([[Dedup.minHashLsh]] family) without
  * touching this operator. Scale shape: fingerprint dedup is one
  * hash-partitioned window; grouping/split run at pair grain through
  * the leakageSafeSplit path (components over the — much smaller —
  * near-dup edge list, salted portable hash on group_id).
  */
object PrefPairs {

  /** Exact-duplicate removal at triple grain: fingerprint = md5 over the
    * case/whitespace-normalized fields joined with U+0001 (a separator
    * outside both engines' tokenizable text), survivor = min `pairId`
    * per fingerprint (the [[Dedup.exactDedup]] discipline, but keeping
    * the full row). */
  def exactSurvivors(df: DataFrame, pairId: String, prompt: String,
                     chosen: String, rejected: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fp = md5(concat(
      lower(trim(col(prompt))), lit("\u0001"),
      lower(trim(col(chosen))), lit("\u0001"),
      lower(trim(col(rejected)))))
    val w = Window.partitionBy(col("__fp")).orderBy(col(pairId))
    df.withColumn("__fp", fp)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__fp", "__rn")
  }

  /** REWARD-MARGIN AUDIT — the DPO/RLHF data-quality distribution: per
    * pair, margin = score(chosen) − score(rejected) plus its histogram
    * bin (`floor(round(margin, 6) · 10)` — a mirrored double chain over
    * identical inputs floors identically on any engine, the kmeans
    * floor-division discipline). A healthy preference set is mostly
    * positive-margin; mass at/below zero marks annotation conflicts
    * (the preference-flip class [[leakageGuard]] stamps) or a scorer
    * that cannot separate the pair — the rows to re-annotate or drop
    * before training. Pure per-row projection: no shuffle, the caller's
    * score columns decide the cost. Output: input + (margin,
    * margin_bin). */
  def rewardMargin(df: DataFrame, chosenScore: org.apache.spark.sql.Column,
                   rejectedScore: org.apache.spark.sql.Column): DataFrame =
    df.withColumn("margin", round(chosenScore - rejectedScore, 6))
      .withColumn("margin_bin",
        floor(col("margin") * lit(10.0)).cast("long"))

  /** Cluster-grain split + disagreement stamps over exact-dedup
    * survivors: `promptPairs` (doc_a, doc_b — pair ids whose prompts
    * are near-dups) feeds [[Sampling.leakageSafeSplit]], then one
    * group-grain window adds `n_group_pairs` (cluster size) and
    * `is_canonical` (min pair id of the cluster — the keep-one policy's
    * survivor). Output: input + (group_id, bucket, split,
    * n_group_pairs, is_canonical). */
  def leakageGuard(kept: DataFrame, pairId: String, promptPairs: DataFrame,
                   cuts: Seq[(String, Int)] =
                     Seq("train" -> 80, "val" -> 10, "test" -> 10),
                   salt: String = "graft"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wg = Window.partitionBy(col("group_id"))
    Sampling.leakageSafeSplit(kept, pairId, promptPairs, cuts, salt)
      .withColumn("n_group_pairs", count(lit(1)).over(wg))
      .withColumn("is_canonical", col(pairId) === min(col(pairId)).over(wg))
  }
}
