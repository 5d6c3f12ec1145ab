package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch — the member of the sketch family
  * ([[Sketches]] has HLL / count-min / Bloom) that answers "what is the
  * p95 latency / document length / score" when the column no longer fits
  * anywhere to sort. KLL compactor hierarchy (Karnin, Lang, Liberty,
  * "Optimal Quantile Approximation in Streams", FOCS 2016 — the public
  * algorithm behind Apache DataSketches' KLL), with one deliberate
  * departure: the compaction offset is a per-level ALTERNATING parity
  * instead of a coin flip, trading the randomized guarantee for
  * bit-reproducible plans (the repo-wide determinism discipline —
  * same reason k-means seeds its centers by hash, not rand()). The
  * accuracy that survives that trade is spec-pinned in KllSpec against
  * exact quantiles, including the adversarial fully-sorted input order,
  * and every registered gate re-checks it in-plan (the
  * [[Sketches.approxDistinctAudited]] pattern).
  *
  * Operational shape, same as the HLL story: the sketch is KBs,
  * associative, and MERGEABLE — build one per shard at ingest, persist it
  * next to the partition, answer corpus-wide quantile questions later by
  * merging kilobytes instead of re-sorting terabytes.
  * [[shardSketches]] + [[mergedQuantilesAudited]] model exactly that
  * split. The aggregation vehicle is a typed `Aggregator` (the A9 /
  * [[EngagementAggregator]] precedent — Spark's own sanctioned custom
  * partial aggregate; its buffer is a native Catalyst struct, not Kryo
  * bytes, so partial states shuffle compactly) because a sketch state
  * machine is the one thing built-in aggregates cannot express.
  *
  * Invariants (asserted in KllSpec):
  *  - weight conservation: Σ |level_i| · 2^i == n after any update/merge
  *    sequence (odd-sized compactions leave one item behind rather than
  *    invent or drop weight);
  *  - lo/hi are the EXACT min/max (quantile(0)/quantile(1) are never
  *    approximate);
  *  - memory: Σ capacities ≈ k · Σ (2/3)^j ≤ 3k items regardless of n.
  */
object QuantileSketch {

  /** KLL state. `levels(i)` holds items of weight 2^i (level 0 is the
    * raw-item buffer); `flips(i)` is the alternating compaction-offset
    * parity for level i. Encodes as a native Catalyst struct. */
  case class Kll(k: Int, n: Long, lo: Double, hi: Double,
                 levels: Seq[Seq[Double]], flips: Seq[Int])

  def empty(k: Int): Kll = {
    require(k >= 8, s"k must be >= 8, got $k")
    Kll(k, 0L, Double.PositiveInfinity, Double.NegativeInfinity,
      Vector(Vector.empty[Double]), Vector(0))
  }

  /** Capacity of `level` when the sketch currently has `numLevels` levels:
    * the top level holds k items, each level below 2/3 of the one above
    * (the KLL geometric schedule), floored at 2 so every level can still
    * compact. */
  private def cap(k: Int, numLevels: Int, level: Int): Int =
    math.max(2, math.ceil(
      k * math.pow(2.0 / 3.0, (numLevels - 1 - level).toDouble)).toInt)

  private def totalCap(k: Int, numLevels: Int): Long =
    (0 until numLevels).map(cap(k, numLevels, _).toLong).sum

  def update(s: Kll, v: Double): Kll =
    compress(s.copy(n = s.n + 1,
      lo = math.min(s.lo, v), hi = math.max(s.hi, v),
      levels = (s.levels.head.toVector :+ v) +: s.levels.tail))

  /** Merge = level-wise concatenation, then re-compact. Associative and
    * commutative up to compaction order (like DataSketches KLL, the exact
    * item set depends on merge order; the rank-error contract does not —
    * and the registered gates emit only oracle-exact columns plus an
    * audited bound flag, so plan-level nondeterminism never reaches a
    * hash gate). */
  def merge(a: Kll, b: Kll): Kll = {
    require(a.k == b.k, s"cannot merge sketches with k=${a.k} and k=${b.k}")
    val h = math.max(a.levels.size, b.levels.size)
    def lvl(s: Kll, i: Int): Vector[Double] =
      if (i < s.levels.size) s.levels(i).toVector else Vector.empty
    def flp(s: Kll, i: Int): Int = if (i < s.flips.size) s.flips(i) else 0
    compress(Kll(a.k, a.n + b.n,
      math.min(a.lo, b.lo), math.max(a.hi, b.hi),
      (0 until h).map(i => lvl(a, i) ++ lvl(b, i)).toVector,
      (0 until h).map(i => flp(a, i) ^ flp(b, i)).toVector))
  }

  /** While total items exceed total capacity: sort the lowest at-capacity
    * level, promote every other item (alternating offset) to the level
    * above at doubled weight, leave one item behind when the count is odd
    * (weight conservation). Each compaction halves a level, so the loop
    * terminates in O(levels) rounds. */
  private def compress(s: Kll): Kll = {
    var levels = s.levels.iterator.map(_.toVector).toVector
    var flips = s.flips.toVector
    var total = levels.iterator.map(_.size.toLong).sum
    while (total > totalCap(s.k, levels.size)) {
      val i = levels.indices
        .find(j => levels(j).size >= cap(s.k, levels.size, j))
        .getOrElse(levels.indices.maxBy(levels(_).size))
      val sorted = levels(i).sorted
      val (stay, toCompact) =
        if (sorted.size % 2 == 0) (Vector.empty[Double], sorted)
        else (Vector(sorted.head), sorted.tail)
      val off = flips(i) & 1
      val promoted = (off until toCompact.size by 2).map(toCompact).toVector
      if (i + 1 >= levels.size) {
        levels = levels :+ Vector.empty[Double]
        flips = flips :+ 0
      }
      levels = levels.updated(i, stay)
      levels = levels.updated(i + 1, levels(i + 1) ++ promoted)
      flips = flips.updated(i, flips(i) ^ 1)
      total = levels.iterator.map(_.size.toLong).sum
    }
    s.copy(levels = levels, flips = flips)
  }

  /** Rank query: the smallest retained item whose cumulative weight
    * reaches ceil(q·n). q=0 / q=1 return the exact min / max. */
  def quantile(s: Kll, q: Double): Double = {
    require(s.n > 0, "quantile of an empty sketch")
    if (q <= 0.0) s.lo
    else if (q >= 1.0) s.hi
    else {
      val items = s.levels.zipWithIndex
        .flatMap { case (lv, i) => lv.map(v => (v, 1L << i)) }
        .sortBy(_._1)
      val target = math.max(1L, math.ceil(q * s.n).toLong)
      var cum = 0L
      items.find { case (_, w) => cum += w; cum >= target }
        .map(_._1).getOrElse(s.hi)
    }
  }

  /** Retained-weight total — the conservation invariant's left side. */
  def totalWeight(s: Kll): Long =
    s.levels.zipWithIndex.map { case (lv, i) => lv.size.toLong << i }.sum

  /** Build-from-values aggregator (partial aggregate; map-side combined). */
  def buildAgg(k: Int): Aggregator[Double, Kll, Kll] =
    new Aggregator[Double, Kll, Kll] {
      override def zero: Kll = empty(k)
      override def reduce(b: Kll, v: Double): Kll = update(b, v)
      override def merge(a: Kll, b: Kll): Kll = QuantileSketch.merge(a, b)
      override def finish(b: Kll): Kll = b
      override def bufferEncoder: Encoder[Kll] = ExpressionEncoder()
      override def outputEncoder: Encoder[Kll] = ExpressionEncoder()
    }

  /** Sketch-of-sketches aggregator — the query-time side of the persisted
    * shard-sketch layout (the [[Sketches.hllMergeEstimate]] analog). */
  def mergeAgg(k: Int): Aggregator[Kll, Kll, Kll] =
    new Aggregator[Kll, Kll, Kll] {
      override def zero: Kll = empty(k)
      override def reduce(b: Kll, s: Kll): Kll = QuantileSketch.merge(b, s)
      override def merge(a: Kll, b: Kll): Kll = QuantileSketch.merge(a, b)
      override def finish(b: Kll): Kll = b
      override def bufferEncoder: Encoder[Kll] = ExpressionEncoder()
      override def outputEncoder: Encoder[Kll] = ExpressionEncoder()
    }

  /** The ingest-time artifact: one KLL sketch per shard (persist next to
    * each partition of the lake; ~3k doubles regardless of shard size). */
  def shardSketches(df: DataFrame, shardCol: String, valueCol: String,
                    k: Int = 256): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(shardCol).cast("string"), col(valueCol).cast("double"))
      .where(col(valueCol).isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(buildAgg(k).toColumn.name("kll"))
      .toDF(shardCol, "kll")
  }

  private def pName(q: Double): String = "p" + math.round(q * 100)

  /** SELF-CERTIFYING grouped quantiles (the [[Sketches.approxDistinctAudited]]
    * pattern): per group, the KLL estimate for each q is checked in-plan
    * against the exact quantiles at q ± `slack` (rank-error bound: a
    * sketch answer for q is correct iff its rank lies within ±εn of qn,
    * i.e. its value between the exact (q−ε) and (q+ε) quantiles) and the
    * query `raise_error`s outside the window. Emitted columns are the
    * EXACT quantiles (oracle-reproducible — Spark `percentile` ≡ DuckDB
    * `quantile_cont`, the q_grouped_quantiles contract) plus the audited
    * flag, so the gate is fully hash-gateable while the sketch path is
    * the thing exercised. This is the AUDIT shape: the exact percentile
    * alongside is precisely the per-group sort the sketch avoids at
    * 100 TB — production uses [[shardSketches]]+[[mergeAgg]] and this
    * runs at gate/spot-check scale. */
  def groupedQuantilesAudited(df: DataFrame, groupCol: String,
                              valueCol: String,
                              qs: Seq[Double] = Seq(0.5, 0.95),
                              k: Int = 256,
                              slack: Double = 0.05): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"qs must be in (0,1): $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(col(groupCol).cast("string").as(groupCol),
        col(valueCol).cast("double").as(valueCol))
      .where(col(valueCol).isNotNull)
    val qsLocal = qs.toVector
    val est = base.as[(String, Double)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(buildAgg(k).toColumn.name("kll"))
      .map { case (g, sk) => (g, qsLocal.map(q => quantile(sk, q))) }
      .toDF(groupCol, "__est")
    val exactAggs = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        round(expr(s"percentile($valueCol, ${q}d)"), 6).as(pName(q)),
        expr(s"percentile($valueCol, ${math.max(0.0, q - slack)}d)").as(s"__lo$i"),
        expr(s"percentile($valueCol, ${math.min(1.0, q + slack)}d)").as(s"__hi$i"))
    } :+ count(col(valueCol)).as("n_valued")
    val exact = base.groupBy(col(groupCol))
      .agg(exactAggs.head, exactAggs.tail: _*)
    auditJoin(est.join(exact, groupCol), qs)
      .select(col(groupCol) +: qs.map(q => col(pName(q))) :+
        col("n_valued") :+ col("kll_within_bound"): _*)
  }

  /** The corpus-wide path the persisted layout exists for: per-shard
    * sketches → sketch-level merge → quantiles, audited in-plan against
    * the exact global quantiles (same bound arithmetic as
    * [[groupedQuantilesAudited]]). One row out: the exact quantiles plus
    * the audited flag — proof that merging shard KBs reproduces the
    * corpus quantiles the exact sort would have produced. */
  def mergedQuantilesAudited(df: DataFrame, shardCol: String,
                             valueCol: String,
                             qs: Seq[Double] = Seq(0.5, 0.95),
                             k: Int = 256,
                             slack: Double = 0.05): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q > 0.0 && q < 1.0),
      s"qs must be in (0,1): $qs")
    val spark = df.sparkSession
    import spark.implicits._
    val qsLocal = qs.toVector
    val est = shardSketches(df, shardCol, valueCol, k)
      .select(col("kll.*")).as[Kll]
      .select(mergeAgg(k).toColumn.name("kll"))
      .map(sk => qsLocal.map(q => quantile(sk, q)))
      .toDF("__est")
    val base = df.select(col(valueCol).cast("double").as(valueCol))
      .where(col(valueCol).isNotNull)
    val exactAggs = qs.zipWithIndex.flatMap { case (q, i) =>
      Seq(
        round(expr(s"percentile($valueCol, ${q}d)"), 6).as(pName(q)),
        expr(s"percentile($valueCol, ${math.max(0.0, q - slack)}d)").as(s"__lo$i"),
        expr(s"percentile($valueCol, ${math.min(1.0, q + slack)}d)").as(s"__hi$i"))
    } :+ count(col(valueCol)).as("n_valued")
    val exact = base.agg(exactAggs.head, exactAggs.tail: _*)
    auditJoin(est.crossJoin(exact), qs)
      .select(qs.map(q => col(pName(q))) :+
        col("n_valued") :+ col("kll_within_bound"): _*)
  }

  /** Shared audit tail: each estimate must land inside its exact
    * [q−slack, q+slack] value window (1 ulp of slop for the round-trip
    * through round(6) on the bound side is NOT applied — bounds are the
    * un-rounded exact percentiles). */
  private def auditJoin(joined: DataFrame, qs: Seq[Double]): DataFrame = {
    val within: Column = qs.indices.map { i =>
      col("__est")(i) >= col(s"__lo$i") && col("__est")(i) <= col(s"__hi$i")
    }.reduce(_ && _)
    val detail = concat(
      lit("KLL estimate outside rank-error window: est="),
      col("__est").cast("string"),
      lit(" lo="), array(qs.indices.map(i => col(s"__lo$i")): _*).cast("string"),
      lit(" hi="), array(qs.indices.map(i => col(s"__hi$i")): _*).cast("string"))
    joined.withColumn("kll_within_bound",
        when(within, lit(true)).otherwise(raise_error(detail)))
      .drop("__est" +: qs.indices.flatMap(i => Seq(s"__lo$i", s"__hi$i")): _*)
  }
}
