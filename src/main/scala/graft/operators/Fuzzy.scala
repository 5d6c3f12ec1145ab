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
    * match (SQL comparison semantics).
    *
    * The candidate stage carries IDS ONLY: the equi-join runs on
    * `md5(variant)` (fixed 32-byte key regardless of string length — on a
    * templated corpus the variant keys are hot and a string-carrying
    * shuffle would move two copies of every candidate's full string).
    * md5 is 128 bits — a blocking-key collision would need ~2^64 distinct
    * variants and at worst admits one spurious CANDIDATE, which the exact
    * verify then discards.
    *
    * `maxDist = 1` (the common entity-resolution setting) needs NO verify
    * pass at all — the deletion position decides exactly:
    *  - (0,0): both sides matched on their full string → equal → dist 0
    *  - (0,1)/(1,0): one string is the other minus a character → dist 1
    *  - (1,1): a and b each deleted one char and the results are equal.
    *    If the deleted POSITIONS are equal, the strings agree everywhere
    *    except (possibly) that position → dist ≤ 1; if they differ and no
    *    same-position match exists, dist ≥ 2 (an equal-length pair within
    *    lev 1 is equal or a single substitution at some position p, and
    *    deleting p from both always produces the same-position match).
    * So the plan is: variant join → position filter → min depth-sum per
    * pair → dist, with no back-join and no levenshtein. Larger maxDist
    * runs the general candidates-then-verify path with the BANDED
    * O(len·maxDist) thresholded levenshtein. */
  def fuzzySelfMatch(df: DataFrame, id: String, str: String,
                     maxDist: Int = 1): DataFrame = {
    // Repartitioned before the variant explosion for the same reason as
    // Similarity.cosinePairs: the input may scan as one task (single row
    // group), which would serialize the explode → join → verify pipeline
    // (each row fans out to O(len^maxDist) variants and then candidate
    // pairs) onto one core. The count is explicit because AQE sizes by
    // shuffle BYTES and would coalesce a small input back to one
    // partition — wrong for a stage whose work is super-linear in rows.
    val base = df.filter(col(str).isNotNull)
      .repartition(df.sparkSession.sparkContext.defaultParallelism, col(id))
    if (maxDist == 1) return fuzzySelfMatchDist1(base, id, str)
    val v = base
      .select(col(id),
        explode(deletionVariants(col(str), maxDist)).as("variant"))
      .select(col(id), md5(col("variant")).as("vkey"))
    val cand = v.select(col(id).as("id_a"), col("vkey"))
      .join(v.select(col(id).as("id_b"), col("vkey")), "vkey")
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .distinct()
    cand
      .join(base.select(col(id).as("id_a"), col(str).as("str_a")), "id_a")
      .join(base.select(col(id).as("id_b"), col(str).as("str_b")), "id_b")
      // thresholded levenshtein runs the BANDED O(len·maxDist) DP instead
      // of the full O(len²) matrix and returns -1 past the bound — the
      // verify pass is the candidate stage's dominant cost, and the band
      // cuts it ~len/(2·maxDist+1)× with identical accepted distances
      .withColumn("dist",
        levenshtein(col("str_a"), col("str_b"), maxDist).cast("long"))
      .filter(col("dist") >= 0)
      .select(col("id_a"), col("id_b"), col("dist"))
  }

  /** maxDist=1 verify-free path (see [[fuzzySelfMatch]] doc for the
    * position argument). Each variant row carries (md5 key, depth, deleted
    * position); the join keeps only decisive matches, so the per-pair
    * aggregation input is exactly the true pair set — ~5× fewer rows than
    * the undiscriminated candidate join on a templated corpus. */
  private def fuzzySelfMatchDist1(base: DataFrame, id: String, str: String): DataFrame = {
    // The exploded element is just the deletion INDEX (0 = "no deletion");
    // the variant text is then built with flat substr/concat — plain
    // codegen'd expressions, where a transform-lambda building an array of
    // structs per row would run interpreted (HOFs don't codegen).
    val v = base
      .select(col(id), col(str).as("__s"),
        explode(sequence(lit(0), length(col(str)))).as("pos"))
      .select(col(id),
        md5(when(col("pos") === 0, col("__s"))
          .otherwise(concat(col("__s").substr(lit(1), col("pos") - 1),
            col("__s").substr(col("pos") + 1, length(col("__s")))))).as("vkey"),
        when(col("pos") === 0, 0).otherwise(1).as("depth"),
        col("pos"))
    v.select(col(id).as("id_a"), col("vkey"), col("depth").as("da"), col("pos").as("pa"))
      .join(v.select(col(id).as("id_b"), col("vkey"), col("depth").as("db"), col("pos").as("pb")),
        "vkey")
      .filter(col("id_a") < col("id_b"))
      .filter(col("da") + col("db") <= 1 || col("pa") === col("pb"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(min(col("da") + col("db")).as("msum"))
      .select(col("id_a"), col("id_b"),
        when(col("msum") === 0, 0L).otherwise(1L).as("dist"))
  }
}
