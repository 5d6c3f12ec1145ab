package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Pareto-skyline (maximal-vector) operator — the classic "best trade-off
  * frontier" query (Börzsönyi/Kossmann/Stocker ICDE'01): a row is in the
  * skyline iff no other row is ≥ on EVERY dimension and > on at least one
  * (all dimensions maximized; flip signs upstream to minimize). Duplicate
  * points never dominate each other, so every copy of a frontier point
  * survives — the textbook semantics, and the one a plain SQL
  * `NOT EXISTS` oracle reproduces.
  *
  * Two shapes, picked by dimensionality:
  *
  *  - [[skyline2d]] — EXACT and fully declarative with zero quadratic
  *    work: in 2D a point is dominated iff a strictly-greater-x point has
  *    y ≥ it, or a same-x point has y > it. So the plan is (1) one hash
  *    aggregation to the distinct-x grain (`max(y)` per x), (2) ONE
  *    running-max window over that already-reduced frame ordered by x
  *    desc, (3) a join of the surviving `(x, max_y)` frontier keys back
  *    to the rows (frontier keys are few — Spark broadcasts them). The
  *    only global-ordered window runs AFTER the distinct-x reduction, and
  *    at 100 TB a value-grain frame is what you want under a single-
  *    partition sort — it is |distinct x| rows, not corpus rows. No
  *    gates needed: nothing here can go quadratic.
  *
  *  - [[skylineNd]] — d ≥ 3 has no total-order trick, so the plan is the
  *    SemDeDup-style bounded-quadratic pattern this repo uses for every
  *    pair-generating family: (1) deterministic hash-bucket the rows
  *    (bucket id from the dimension VALUES, so the result is independent
  *    of physical partitioning), (2) per-bucket dominance anti-join —
  *    Σ|bucket|² work as ONE equi-join on the bucket key, never a
  *    cartesian — keeping each bucket's local skyline (exact superset of
  *    the global skyline: domination is transitive, so every dominated
  *    row has a dominating representative in its own bucket's skyline),
  *    (3) a final all-pairs anti-join over the gated-small candidate set,
  *    run through the same helper with ONE bucket (a constant-key hash
  *    anti-join — no BroadcastNestedLoopJoin in the plan). The candidate
  *    count is volume-gated EAGERLY (the [[Similarity.lshCosinePairs]]
  *    contract): an adversarial anti-correlated corpus whose frontier is
  *    itself huge throws at construction instead of melting an executor.
  */
object Skyline {

  /** Default cap on stage-2 candidates (bucket-skyline survivors) for
    * [[skylineNd]]: the final refine compares all candidate pairs in one
    * task, so 8192 caps it at ≤ 64M cheap long comparisons. */
  val DefaultMaxCandidates = 8192L

  /** Exact 2D skyline, both dimensions maximized; rows with a null in
    * either dimension are excluded (null never reaches the frontier).
    * Returns the input rows (all columns) that lie on the frontier. */
  def skyline2d(df: DataFrame, x: String, y: String,
                pruneBuckets: Int = 64): DataFrame = {
    val rows = df.filter(col(x).isNotNull && col(y).isNotNull)
    // the frontier needs only (x, y): shuffle two values per row, not the
    // caller's full payload — payload columns rejoin via the final semi
    val xy = rows.select(col(x), col(y))
    // PARALLEL PRE-PRUNE: within each deterministic hash-of-x bucket,
    // a row whose running max-y over the (x desc, y desc)-preceding rows
    // exceeds its own y is dominated by that predecessor (x_r ≥ x by the
    // ordering, y_r > y strictly) — drop it. Sound for any bucketing;
    // survivors of a prefix-max prune are O(log bucket) in expectation,
    // so the global stage below runs on a few hundred rows, not the
    // corpus. Equal (x, y) duplicates see pm == y and survive.
    // pruneBuckets <= 1 skips the prune stage entirely — right for
    // frontier-grain inputs (the streaming sink's merge step), where the
    // prune's shuffle+sort costs more than the distinct-x frame it saves
    val wb = Window.partitionBy(col("__b"))
      .orderBy(col(x).desc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val pruned =
      if (pruneBuckets <= 1) xy
      else xy
        .withColumn("__b", pmod(hash(col(x)), lit(pruneBuckets)))
        .withColumn("__pm", max(col(y)).over(wb))
        .filter(col("__pm").isNull || col("__pm") <= col(y))
    val perX = pruned.groupBy(col(x)).agg(max(col(y)).as("__gy"))
    // running max of max-y over STRICTLY greater x: x desc ordering makes
    // the strictly-preceding frame exactly the x' > x rows (distinct grain)
    val w = Window.orderBy(col(x).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perX
      .withColumn("__rm", max(col("__gy")).over(w))
      .filter(col("__rm").isNull || col("__rm") < col("__gy"))
      .select(col(x).as("__fx"), col("__gy"))
    // join back to the ORIGINAL rows (not the pruned frame): every
    // duplicate of a frontier point belongs in the skyline
    rows.join(frontier,
      rows(x) === frontier("__fx") && rows(y) === frontier("__gy"), "leftsemi")
  }

  /** Per-bucket dominance prune: drops every row that some same-bucket row
    * dominates (maximize-all semantics). With `nb = 1` this is the exact
    * global skyline of `cand` — used as the final refine. */
  private def bucketPrune(cand: DataFrame, dims: Seq[String], nb: Int): DataFrame = {
    // nb = 1 still routes through pmod(hash, 1) (constant 0 per row but
    // NON-FOLDABLE): a literal bucket key would constant-fold out of the
    // join condition and turn the refine into a BroadcastNestedLoopJoin
    val withB = cand.withColumn("__b", pmod(hash(dims.map(col): _*), lit(nb)))
    val l = withB.alias("l")
    val r = withB.alias("r")
    val geAll = dims.map(c => col(s"r.$c") >= col(s"l.$c")).reduce(_ && _)
    val gtOne = dims.map(c => col(s"r.$c") > col(s"l.$c")).reduce(_ || _)
    l.join(r, col("l.__b") === col("r.__b") && geAll && gtOne, "leftanti")
      .drop("__b")
  }

  /** Exact d-dimensional skyline (all dims maximized, null-dim rows
    * excluded). `bucketTargetRows` sizes the prune buckets (stage-1 work
    * is Σ|bucket|² ≈ n·bucketTargetRows); `maxCandidates` gates stage 2.
    * EAGER: counts the input and the candidate set at call time — an
    * over-cap frontier fails loudly here, never inside the refine join. */
  def skylineNd(df: DataFrame, dims: Seq[String],
                bucketTargetRows: Long = 4096L,
                maxCandidates: Long = DefaultMaxCandidates): DataFrame = {
    require(dims.size >= 2, s"skyline needs >= 2 dims, got ${dims.size}")
    val rows = df.filter(dims.map(c => col(c).isNotNull).reduce(_ && _))
      .localCheckpoint()
    val n = rows.count()
    val nb = math.max(1L, (n + bucketTargetRows - 1) / bucketTargetRows).toInt
    val cand = bucketPrune(rows, dims, nb).localCheckpoint()
    val m = cand.count()
    require(m <= maxCandidates,
      s"skylineNd: $m bucket-skyline candidates exceed cap $maxCandidates " +
        s"(frontier too large for the single-task refine; raise the cap " +
        s"or reduce dimensionality)")
    bucketPrune(cand, dims, 1)
  }
}
