package graft.operators

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** PRINCIPAL-COMPONENT PROJECTION over an embedding column — the
  * dimensionality-reduction / whitening step embedding pipelines run
  * before near-dup banding or IVF coarse quantization (a corpus whose
  * variance concentrates in a few directions hashes badly; projecting
  * onto the dominant direction is the cheapest fix and the standard
  * diagnostic). Public construction: uncentered PCA (the second-moment
  * matrix Σ e·eᵀ — embedding corpora are near-centered by construction,
  * and skipping the mean keeps every reduction exact) with the dominant
  * eigenvector found by POWER ITERATION.
  *
  * Bit-reproducibility discipline (the [[Clustering]] fixed-point
  * contract): embedding elements are quantized ONCE to integers
  * (`round(x · 2^7)` — a per-row op, no reduction-order hazard), the
  * Gram matrix is an exact BIGINT sum of integer products, and every
  * power-iteration step is integer arithmetic with floor divisions —
  * matrix normalization to `2^20`, iterate renormalization to L∞ =
  * `2^12`. No float enters any reduction, so the learned eigenvector and
  * every projection are hash-stable across partitionings, engines, and
  * replays; a DuckDB oracle replays the iterations as unrolled CTEs in
  * HUGEINT.
  *
  * Scale shape: the Gram build is the only corpus-sized stage — a
  * two-level posexplode (n·dim² rows in the SCAN stage) with map-side
  * partial aggregation into dim² groups, so the shuffle carries
  * O(partitions · dim²) rows regardless of corpus size. The collected
  * matrix is dim² rows (bounded METADATA, the [[IvfIndex]] contract —
  * 4 096 longs at dim 64), iterations run driver-side on that bounded
  * matrix, and scoring is one scan with the eigenvector as a literal.
  * Overflow is guarded: |e| ≤ 2^7·maxAbs, so the exact Gram sum stays
  * inside 2^63 for any corpus under ~2^45 rows at unit-scale embeddings;
  * past the bound the Spark-4 ANSI integer arithmetic raises in-plan
  * (product and sum overflow both throw — PcaSpec pins this
  * executably), never wrapping silently.
  */
object Pca {

  /** Element quantization scale: e = round(x · 2^7). */
  val EltScale: Long = 1L << 7
  /** L∞ target of the iteration vector between steps. */
  val VecScale: Long = 1L << 12
  /** Normalized Gram entry scale. */
  val GramScale: Long = 1L << 20
  /** Combined fixed-point denominator of a projection value. */
  val ProjScale: Double = (EltScale * VecScale).toDouble

  /** Floor division (toward −∞) for a POSITIVE divisor, via the
    * positive-mod identity `a − ((a % b + b) % b)` — the numerator is an
    * exact multiple of `b`, so truncating division is exact. The oracle
    * mirrors the same identity with `//`. */
  private def fdiv(a: BigInt, b: BigInt): BigInt = (a - (((a % b) + b) % b)) / b

  /** Quantized-element column: array<long> of round(x · 2^7). */
  private def quantized(vec: String): Column =
    transform(col(vec), x => round(x.cast("double") * lit(EltScale.toDouble)).cast("long"))

  /** Exact integer Gram matrix of the quantized embeddings: one row per
    * (i, j) with g = Σ_rows e_i·e_j. dim² output rows. */
  def gram(emb: DataFrame, id: String, vec: String): DataFrame =
    emb.select(col(id), quantized(vec).as("e"))
      .select(col("e"), posexplode(col("e")).as(Seq("i", "ei")))
      .select(col("i"), col("ei"), posexplode(col("e")).as(Seq("j", "ej")))
      .groupBy(col("i"), col("j")).agg(sum(col("ei") * col("ej")).as("g"))

  /** Dominant eigenvector of the quantized Gram matrix, in `VecScale`
    * fixed point, after `iters` integer power-iteration steps from the
    * all-ones start. Deterministic: every step is exact integer matvec +
    * floor-div renormalization; the second-moment matrix is PSD, so the
    * iteration cannot oscillate between ±directions. */
  def topEigvec(gramRows: Seq[(Int, Int, Long)], iters: Int): Array[Long] = {
    require(gramRows.nonEmpty, "pca: empty Gram matrix")
    val dim = gramRows.iterator.map(_._1).max + 1
    val g = Array.ofDim[BigInt](dim, dim)
    for ((i, j, v) <- gramRows) g(i)(j) = BigInt(v)
    val gmax = gramRows.iterator.map(r => math.abs(r._3)).max
    require(gmax > 0, "pca: zero Gram matrix (all-zero embeddings?)")
    val gn = Array.tabulate(dim, dim)((i, j) =>
      fdiv((if (g(i)(j) == null) BigInt(0) else g(i)(j)) * GramScale, gmax))
    var v = Array.fill(dim)(BigInt(VecScale))
    for (_ <- 0 until iters) {
      val w = Array.tabulate(dim)(i =>
        (0 until dim).foldLeft(BigInt(0))((acc, j) => acc + gn(i)(j) * v(j)))
      val m = w.iterator.map(_.abs).max
      require(m > 0, "pca: iteration collapsed to the zero vector")
      v = w.map(wi => fdiv(wi * VecScale, m))
    }
    v.map(_.toLong)
  }

  /** Train-and-project in one call: learn the dominant direction, then
    * score every row with the eigenvector as a plan literal. Output:
    * (id, pc1_fp — the exact integer projection Σ e_i·v_i, pc1 — the
    * same value at real scale, an exact power-of-two division rounded to
    * 6 for display). The `.collect()` pulls dim² Gram rows — bounded
    * index metadata, never corpus rows. */
  def projectTop1(emb: DataFrame, id: String, vec: String, iters: Int = 12): DataFrame = {
    val rows = gram(emb, id, vec).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val v = topEigvec(rows.toSeq, iters)
    val vLit = array(v.map(x => lit(x)): _*)
    emb.select(col(id),
        aggregate(zip_with(quantized(vec), vLit, (a, b) => a * b),
          lit(0L), (acc, x) => acc + x).as("pc1_fp"))
      .withColumn("pc1", round(col("pc1_fp") / lit(ProjScale), 6))
  }
}
