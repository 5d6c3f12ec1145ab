package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution / record linkage) via FastSS
  * deletion-neighborhood blocking: two strings within Levenshtein distance
  * k always share at least one string obtainable from each by deleting at
  * most k characters, so candidate pairs come from an equi-join on the
  * (exploded) deletion variants and only candidates pay the exact
  * levenshtein — never an all-pairs comparison.
  *
  * Scale shape: a string of length L yields O(L^k) variants (L=20, k=1 →
  * 21 rows; k=2 → ~210), so the blocking table is a small constant factor
  * over the input and the join key (a short string) shuffles uniformly.
  * Verification cost is |candidate pairs|, which the deletion blocking
  * bounds to near-duplicates by construction — the same
  * candidates-then-verify shape as [[Dedup.minhashDupPairs]]. At 100 TB
  * the variant table is the thing to bucket/persist, exactly like the LSH
  * band-key index ([[graft.streaming.Streaming.incrementalNearDupSink]]).
  *
  * All candidate generation is built-in expressions (substr/concat inside
  * a transform); `levenshtein` is a codegen'd built-in on both engines.
  */
object Fuzzy {

  /** Single-character deletions of every string in `vs`, deduplicated. */
  private def deleteOnce(vs: Column): Column =
    array_distinct(flatten(transform(vs, v =>
      transform(sequence(lit(1), length(v)),
        i => concat(v.substr(lit(1), i - 1), v.substr(i + 1, length(v)))))))

  /** The FastSS deletion neighborhood: every string reachable from `s` by
    * deleting at most `maxDist` characters (including `s` itself). Strings
    * shorter than the deletion depth just stop early (deleting the last
    * character of "" is vacuous because `sequence(1,0)` never runs — the
    * guard keeps the lambda total on empty strings). */
  private[graft] def deletionVariants(s: Column, maxDist: Int): Column = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    (1 to maxDist).foldLeft(array(s)) { (acc, _) =>
      array_union(acc, deleteOnce(filter(acc, v => length(v) > 0)))
    }
  }

  /** All pairs of rows whose `str` values are within Levenshtein distance
    * `maxDist`, as (id_a, id_b, dist) with id_a < id_b — identical output
    * to the exhaustive all-pairs comparison (the gate oracle), via the
    * blocked candidates-then-verify plan. Rows with a NULL string never
    * match (SQL comparison semantics). */
  def fuzzySelfMatch(df: DataFrame, id: String, str: String,
                     maxDist: Int = 1): DataFrame = {
    val v = df
      .filter(col(str).isNotNull)
      .select(col(id), col(str),
        explode(deletionVariants(col(str), maxDist)).as("variant"))
    val cand = v.select(col(id).as("id_a"), col(str).as("str_a"), col("variant"))
      .join(v.select(col(id).as("id_b"), col(str).as("str_b"), col("variant")),
        "variant")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("str_a"), col("str_b"))
      .distinct()
    cand
      .withColumn("dist", levenshtein(col("str_a"), col("str_b")).cast("long"))
      .filter(col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
