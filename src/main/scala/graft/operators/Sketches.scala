package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the operators that replace exact
  * distinct counts and frequency tables once the key space itself no
  * longer fits anywhere (unique URLs / user ids / shingles at 100 TB).
  *
  * Built on Spark's Apache-DataSketches-backed HLL functions
  * (`hll_sketch_agg` / `hll_union_agg` / `hll_sketch_estimate`) and the
  * `count_min_sketch` aggregate. The operational shape that matters at
  * scale: sketches are small (KBs), MERGEABLE, and associative — build
  * them per shard/partition at ingest, persist them next to the data, and
  * answer corpus-wide questions later by unioning kilobytes instead of
  * rescanning terabytes. [[hllShardSketches]] + [[hllMergeEstimate]] model
  * exactly that split; the merge ≡ direct-build equivalence is
  * spec-asserted.
  *
  * Estimates are approximate by design, so the estimate VALUE has no
  * DuckDB hash oracle (DuckDB's approx_count_distinct is a different HLL
  * implementation). The registered gate instead runs
  * [[approxDistinctAudited]]: the estimate is checked in-plan against the
  * exact count under the published error bound and the query fails loudly
  * outside it — which makes the gate's (group, exact, within-bound)
  * output fully hash-gateable while still exercising the sketch path.
  * The accuracy contract (±3σ ≈ 2.5% at lgK=12) is additionally covered
  * by ScalaTest against exact counts.
  */
object Sketches {

  /** Per-group approximate distinct count of `valueCol`.
    * One map-side-combined shuffle of fixed-width sketch buffers —
    * cardinality-independent memory per group, vs. `countDistinct`'s
    * expand + two-phase shuffle of every distinct value. */
  def approxDistinct(df: DataFrame, groupCols: Seq[String], valueCol: String,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(hll_sketch_estimate(
        hll_sketch_agg(col(valueCol), lit(lgK))).as("approx_distinct"))

  /** SELF-CERTIFYING variant of [[approxDistinct]] (the
    * [[Similarity.withRecallAudit]] pattern applied to sketches): computes
    * the HLL estimate AND the exact distinct count in the SAME aggregation,
    * checks the relative error against the published DataSketches bound
    * (RSE ≈ 1.04/√2^lgK × `safety` standard errors), and `raise_error`s
    * when the estimate falls outside it — so a correctness gate over the
    * sketch can no longer pass on shaped garbage: the query itself fails
    * unless the HLL path actually estimates the cardinality it claims.
    *
    * This is the AUDIT shape, not the production shape — the exact
    * `count_distinct` alongside is precisely the expand+shuffle the sketch
    * exists to avoid at 100 TB. Production uses [[approxDistinct]] /
    * [[hllMergeEstimate]]; this runs at gate/spot-check scale, where the
    * exact side is affordable and certifies the approximate one.
    *
    * Output: (groupCols..., exact_distinct, hll_within_bound) — every
    * column exactly reproducible by an ANSI oracle, because the
    * implementation-specific estimate is consumed by the audit rather
    * than emitted. */
  def approxDistinctAudited(df: DataFrame, groupCols: Seq[String],
                            valueCol: String, lgK: Int = 12,
                            safety: Double = 6.0): DataFrame = {
    val bound = safety * 1.04 / math.sqrt((1L << lgK).toDouble)
    val relErr = abs(col("__approx") - col("exact_distinct").cast("double")) /
      greatest(col("exact_distinct").cast("double"), lit(1.0))
    df.groupBy(groupCols.map(col): _*)
      .agg(
        hll_sketch_estimate(hll_sketch_agg(col(valueCol), lit(lgK))).as("__approx"),
        count_distinct(col(valueCol)).as("exact_distinct"))
      .withColumn("hll_within_bound",
        when(relErr <= bound, lit(true)).otherwise(raise_error(concat(
          lit(s"HLL estimate outside ±$bound rel-err bound: approx="),
          col("__approx").cast("string"),
          lit(" exact="), col("exact_distinct").cast("string")))))
      .drop("__approx")
  }

  /** The ingest-time artifact: one serialized HLL sketch per shard
    * (persist this next to each partition of the lake). */
  def hllShardSketches(df: DataFrame, shardCol: String, valueCol: String,
                       lgK: Int = 12): DataFrame =
    df.groupBy(col(shardCol))
      .agg(hll_sketch_agg(col(valueCol), lit(lgK)).as("hll_sketch"))

  /** The query-time side: corpus-wide distinct estimate from the persisted
    * shard sketches alone — unions kilobytes, never rescans the corpus. */
  def hllMergeEstimate(shards: DataFrame): DataFrame =
    shards.agg(hll_sketch_estimate(
      hll_union_agg(col("hll_sketch"))).as("approx_distinct"))

  /** Count-min frequency sketch of `valueCol`: a fixed-size (eps,
    * confidence) frequency table for heavy-hitter queries. Returns the
    * single-row serialized sketch; probe it with [[cmsEstimate]]. The
    * aggregate is mergeable the same way HLL is. */
  def countMinSketch(df: DataFrame, valueCol: String, eps: Double = 0.001,
                     confidence: Double = 0.99, seed: Int = 42): DataFrame =
    df.agg(expr(s"count_min_sketch($valueCol, ${eps}d, ${confidence}d, $seed)")
      .as("cms"))

  /** Driver-side probe of a serialized count-min sketch (the sketch is KBs
    * — this is index-metadata access, not a data collect). Guarantees:
    * estimate >= true count; estimate <= true + eps·N with P >= confidence. */
  def cmsEstimate(sketchBytes: Array[Byte], item: Any): Long =
    org.apache.spark.util.sketch.CountMinSketch
      .readFrom(new java.io.ByteArrayInputStream(sketchBytes))
      .estimateCount(item)

  /** Convenience for specs/dashboards: the one sketch row as bytes. */
  def firstSketchBytes(df: DataFrame, colName: String): Array[Byte] =
    df.select(col(colName)).head(1).headOption match {
      case Some(Row(b: Array[Byte])) => b
      case other => throw new IllegalArgumentException(
        s"firstSketchBytes: expected one non-null binary '$colName' row, got $other " +
          "(empty input frame?)")
    }
}
