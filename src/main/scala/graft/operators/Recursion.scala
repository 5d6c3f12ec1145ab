package graft.operators

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Engine-native recursive queries — Spark 4's `WITH RECURSIVE` surface
  * (SPARK-24497), exercised on semantics this library otherwise computes
  * with DataFrame loops or closed single-pass plans. Spark executes the
  * recursive term as a driver-scheduled loop over the previous iteration's
  * frontier (a "union loop"): one distributed job per level, terminating
  * when a level produces zero rows, guarded by
  * `spark.sql.cteRecursionLevelLimit` (default 100) and
  * `spark.sql.cteRecursionRowLimit`. Unlike DuckDB/Postgres, Spark's
  * recursion supports `UNION ALL` only (no distinct-mode recursion), so
  * every query here is written to terminate structurally: each recursive
  * step strictly decreases a well-founded measure (an id walk that only
  * moves to smaller ids; a day counter bounded by the group's max).
  *
  * Scale contract: recursion depth is the number of synchronization
  * barriers — O(chain length) for [[dupProvenance]], O(span days) for
  * [[activitySpineRecursive]]. Per-level work is a bucketed equi-join on
  * the frontier (linear, shuffle-partitioned); nothing is driver-resident
  * but the loop control. Where a single-pass plan exists it is the
  * production path and registered alongside (sequence+explode densification
  * in [[activitySpine]]; `Dedup.dupGroups` label propagation for component
  * resolution) — the recursive forms add semantics the single-pass plans
  * don't retain (derivation hop counts) and pin the engine-native recursion
  * surface cross-engine.
  */
object Recursion {

  private val viewSeq = new AtomicLong(0)

  /** Run `sql` with each DataFrame registered as a session temp view under
    * its given name. `spark.sql` analyzes eagerly, so the views are dropped
    * before returning — the resolved plan owns the children, and no
    * session-global name survives the call (re-entrant: names are suffixed
    * with a process-unique counter, and `sql` references them via the
    * returned substitution). */
  def withViews(spark: SparkSession, views: (String, DataFrame)*)(
      sql: Map[String, String] => String): DataFrame = {
    val named = views.map { case (n, df) =>
      val unique = s"graft_${n}_${viewSeq.incrementAndGet()}"
      df.createOrReplaceTempView(unique)
      n -> unique
    }.toMap
    try spark.sql(sql(named))
    finally named.values.foreach(spark.catalog.dropTempView(_))
  }

  /** Duplicate PROVENANCE: for every document that has at least one
    * EARLIER near-duplicate, the earliest document it transitively derives
    * from (`origin_id` = min id reachable by repeatedly stepping to any
    * smaller-id near-dup) and the length of the shortest such derivation
    * chain (`hops`). `pairs` must be id-oriented (`aCol < bCol` per row —
    * the orientation every pair generator in [[Dedup]] emits), which makes
    * the walk a strictly-decreasing DAG traversal: `UNION ALL` recursion
    * terminates structurally, depth = longest derivation chain.
    *
    * This is the lineage view of dedup that [[Dedup.dupGroups]]'s label
    * propagation discards: dupGroups answers "which cluster", provenance
    * answers "copied from what, through how many generations" — the
    * attribution a keep-first dedup policy wants audited. Rows per level =
    * decreasing paths through the pair graph; bounded in practice by
    * dup-cluster size (a clique of m docs contributes O(2^m) paths — on
    * corpora where clusters are that dense, resolve components with
    * dupGroups first and run provenance per-cluster, or cap with the pair
    * generator's df-cap). */
  def dupProvenance(spark: SparkSession, pairs: DataFrame,
                    aCol: String = "doc_a", bCol: String = "doc_b"): DataFrame =
    // localCheckpoint the pair list BEFORE recursion: the union loop
    // re-executes its referenced subtrees every level, and the pair
    // generation (a shingle/LSH join) is the expensive part — measured
    // 10.8 s → 2.0 s on the exhaustive form at sf0.1. The materialized
    // frame is the pair list itself (dedup-output-sized), the same bounded
    // localCheckpoint contract as PageRank's per-round plan-depth cut.
    withViews(spark, "pairs" -> pairs.select(aCol, bCol).localCheckpoint()) { v =>
      s"""WITH RECURSIVE walk(doc_id, anc, hops) AS (
         |  SELECT $bCol, $aCol, CAST(1 AS BIGINT) FROM ${v("pairs")}
         |  UNION ALL
         |  SELECT w.doc_id, p.$aCol, w.hops + 1
         |  FROM walk w JOIN ${v("pairs")} p ON p.$bCol = w.anc),
         |origin AS (SELECT doc_id, min(anc) AS origin_id FROM walk GROUP BY doc_id)
         |SELECT o.doc_id, o.origin_id, min(w.hops) AS hops
         |FROM origin o JOIN walk w ON w.doc_id = o.doc_id AND w.anc = o.origin_id
         |GROUP BY o.doc_id, o.origin_id""".stripMargin
    }

  /** Per-group day-grain DENSIFICATION (gap filling): every epoch-day from
    * the group's first to last event, with that day's event count (0 on
    * gap days). Day is an epoch-day BIGINT (`floor(unix_micros/86400e6)`)
    * — integer arithmetic both engines agree on bit-for-bit, the
    * q_cohort_retention convention. Single-pass production form: bounds
    * per group, `sequence(d0, d1)` exploded (one generated column, no
    * loop), left join of the day-counts — rows = Σ per-group span days,
    * shuffles only on the group key. */
  def activitySpine(events: DataFrame, group: String, tsCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val day = floor(unix_micros(col(tsCol)) / lit(86400000000L)).cast("long")
    // ONE scan: the (group, day) counts are the only aggregate that needs
    // the fact table; bounds derive from the counts (≤ span-days rows per
    // group), and the spine-counts join then re-shuffles only count rows —
    // the fact is never read or shuffled twice
    val counts = events.groupBy(col(group), day.as("day"))
      .agg(count(lit(1)).as("n"))
    val bounds = counts.groupBy(col(group))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(col(group),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    spine.join(counts, Seq(group, "day"), "left_outer")
      .select(col(group), col("day"),
        coalesce(col("n"), lit(0L)).as("n_events"))
  }

  /** LINEAR GAP INTERPOLATION over the day spine — the feature-
    * engineering step after densification: a user's daily measure on a
    * day with no events is filled by the straight line between the
    * NEAREST observed days (`v = v₀ + (v₁−v₀)·(d−d₀)/(d₁−d₀)`), days
    * before the first / after the last observation stay null (no
    * extrapolation — callers choose their own edge policy). Observed
    * days pass through unchanged and are flagged.
    *
    * Determinism: daily totals aggregate as DECIMAL(18,6) (exact,
    * order-independent — the money-sum rule), convert to double once,
    * and the interpolation arithmetic is a fixed expression over exact
    * endpoints, round(6) on output. The nearest-observation lookups are
    * `last/first(…, ignoreNulls)` windows over open-ended frames —
    * O(1) running state per row after the one spine sort, never a
    * per-gap join.
    *
    * Scale shape: one fact aggregation to (group, day) grain, the
    * spine generation from per-group bounds (≤ span-days rows per
    * group), one left join on (group, day), ONE window sort per group.
    * Nothing rescans the fact table. Output: (group, day, value,
    * interpolated) for every spine day. */
  def interpolateDaily(events: DataFrame, group: String, tsCol: String,
                       valueCol: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val day = floor(unix_micros(col(tsCol)) / lit(86400000000L)).cast("long")
    val daily = events.groupBy(col(group), day.as("day"))
      .agg(sum(col(valueCol).cast("decimal(18,6)")).as("v"))
    val bounds = daily.groupBy(col(group))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = bounds.select(col(group),
      explode(sequence(col("d0"), col("d1"))).as("day"))
    val j = spine.join(daily, Seq(group, "day"), "left_outer")
      .withColumn("vd", col("v").cast("double"))
    val past = Window.partitionBy(col(group)).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val future = Window.partitionBy(col(group)).orderBy(col("day"))
      .rowsBetween(1, Window.unboundedFollowing)
    val knownDay = when(col("vd").isNotNull, col("day"))
    val w = j
      .withColumn("pv", last(col("vd"), ignoreNulls = true).over(past))
      .withColumn("pd", last(knownDay, ignoreNulls = true).over(past))
      .withColumn("nv", first(col("vd"), ignoreNulls = true).over(future))
      .withColumn("nd", first(knownDay, ignoreNulls = true).over(future))
    w.select(col(group), col("day"),
      round(when(col("vd").isNotNull, col("vd"))
        .when(col("pv").isNotNull && col("nv").isNotNull,
          col("pv") + (col("nv") - col("pv")) *
            ((col("day") - col("pd")).cast("double") /
              (col("nd") - col("pd")).cast("double"))), 6).as("value"),
      (col("vd").isNull && col("pv").isNotNull && col("nv").isNotNull)
        .as("interpolated"))
  }

  /** [[activitySpine]] as an engine-native recursive CTE — the recursion
    * surface twin: one `day + 1` level per iteration, terminating at each
    * group's `d1` (well-founded; depth = max span days, which must stay
    * under `spark.sql.cteRecursionLevelLimit`). Use [[activitySpine]] in
    * production — a 10-year span is 3 651 loop barriers here vs one
    * generated column there; this form exists to pin Spark's recursion
    * semantics against the oracle's identical recursion. */
  def activitySpineRecursive(spark: SparkSession, events: DataFrame,
                             group: String, tsCol: String): DataFrame =
    withViews(spark, "ev" -> events.select(group, tsCol)) { v =>
      val day = s"CAST(floor(unix_micros($tsCol) / 86400000000) AS BIGINT)"
      s"""WITH RECURSIVE bounds AS (
         |  SELECT $group, min($day) AS d0, max($day) AS d1
         |  FROM ${v("ev")} GROUP BY $group),
         |spine($group, day, d1) AS (
         |  SELECT $group, d0, d1 FROM bounds
         |  UNION ALL
         |  SELECT $group, day + 1, d1 FROM spine WHERE day < d1),
         |counts AS (
         |  SELECT $group, $day AS day, count(*) AS n
         |  FROM ${v("ev")} GROUP BY 1, 2)
         |SELECT s.$group, s.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events
         |FROM spine s LEFT JOIN counts c ON c.$group = s.$group AND c.day = s.day""".stripMargin
    }
}
