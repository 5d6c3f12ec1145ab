package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** FELLEGI–SUNTER probabilistic record linkage (Fellegi & Sunter 1969;
  * the Splink/census-linkage construction): score blocked candidate
  * pairs by a COMPARISON VECTOR of K binary agreement fields, with the
  * per-field match/unmatch probabilities m_k = P(agree | match),
  * u_k = P(agree | unmatch) and the match prior learned UNSUPERVISED by
  * EM over the pairs themselves. This is the learned step entity
  * resolution needs beyond [[Dedup.sortedNeighborhoodPairs]] /
  * FastSS candidates: those emit who MIGHT match; FS weighs the
  * evidence per field and emits calibrated posterior match weights.
  *
  * Fixed-point EM (the [[QualityClassifier]] discipline, so the entire
  * trajectory is hash-verifiable cross-engine):
  *  - parameters live as INTEGERS in 1e-5 units ([[FP]]), clamped to
  *    [1, FP−1] so no likelihood ever hits 0 or 1 (the standard EM
  *    degeneracy guard);
  *  - the E-step posterior per pair is a fixed expression tree of
  *    doubles built from those integer parameters — deterministic
  *    IEEE-754 arithmetic the oracle mirrors factor-for-factor,
  *    quantized back to integer by floor(·FP);
  *  - the M-step reduces EXACT integer sums (Σw, Σw·a_k, Σa_k, n — w is
  *    already FP-quantized, so sums are order-free Longs) and the
  *    parameter updates are BigInt floor divisions on the driver —
  *    bounded model state (2K+2 numbers per epoch), HUGEINT `//` in the
  *    oracle, no 2^53 corpus bound anywhere.
  *
  * Scale shape: candidate pairs come from any blocked generator (the
  * [[blockedWindowPairs]] helper: per-block sort + bounded rank window —
  * output ≤ n·window, never quadratic). The pair table is repartitioned
  * on the pair key and localCheckpoint'ed ONCE; each EM epoch is one
  * exchange-free aggregation over it (one Spark job, 1-row collect) and
  * scoring is one final scan with the learned parameters as literals.
  * EAGER contract (the [[Bpe.train]] precedent): calling [[emLinkage]]
  * runs `epochs` bounded Spark jobs at call time.
  */
object RecordLinkage {

  /** Fixed-point scale of probabilities and posterior weights. */
  val FP: Long = 100000L

  /** EM parameter state in FP units: match prior `p`, per-field
    * agreement probabilities under match (`m`) and unmatch (`u`). */
  final case class Params(p: Long, m: Array[Long], u: Array[Long]) {
    require(m.length == u.length, "m/u arity mismatch")
  }

  /** Default initialization: prior 0.1, m = 0.9, u = 0.1 — the standard
    * "agreements are informative" starting point. */
  def init(k: Int): Params =
    Params(10000L, Array.fill(k)(90000L), Array.fill(k)(10000L))

  private def clamp(x: BigInt): Long =
    x.max(BigInt(1)).min(BigInt(FP - 1)).toLong

  /** Blocked sorted-neighborhood candidate pairs: rank within each block
    * by (orderBy, id), pair ranks r and r+1..r+window−1 via a bounded
    * explode + equi-join (no self-join on the block alone, no global
    * single-partition window). Output ≤ n·(window−1) rows. */
  def blockedWindowPairs(df: DataFrame, id: String, block: Column,
                         orderBy: Column, window: Int): DataFrame = {
    require(window >= 2, s"window must be >= 2, got $window")
    import org.apache.spark.sql.expressions.Window
    val ranked = df.select(col(id), block.as("__blk"), orderBy.as("__ord"))
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col("__blk")).orderBy(col("__ord"), col(id))).cast("long"))
      .select(col(id), col("__blk"), col("__rk"))
    ranked
      .withColumn("__j", explode(sequence(lit(1), lit(window - 1))))
      .select(col(id).as("id_a"), col("__blk"), (col("__rk") + col("__j")).as("__rk"))
      .join(ranked.select(col(id).as("id_b"), col("__blk"), col("__rk")),
        Seq("__blk", "__rk"))
      .select(col("id_a"), col("id_b"))
  }

  /** E-step posterior in FP units for one parameter state: the
    * likelihood chains multiply left-to-right over the fields (each
    * factor is `(m_k or FP−m_k)/1e5` — the oracle parenthesizes each
    * factor's division so both engines build the identical IEEE tree). */
  private def posterior(agree: Seq[String], ps: Params): Column = {
    def chain(arr: Array[Long]): Column =
      agree.zip(arr).map { case (a, v) =>
        when(col(a) === 1L, lit(v.toDouble)).otherwise(lit((FP - v).toDouble)) /
          lit(100000.0)
      }.reduceLeft(_ * _)
    val num = lit(ps.p.toDouble) / lit(100000.0) * chain(ps.m)
    val den = num + lit((FP - ps.p).toDouble) / lit(100000.0) * chain(ps.u)
    floor(num / den * lit(100000.0)).cast("long")
  }

  /** Run `epochs` EM rounds over a pair frame whose `agree` columns are
    * 0/1 longs, then score every pair with the learned parameters.
    * Returns (id_a, id_b, agree..., w_fp, is_match) plus the parameters.
    * EAGER: one bounded Spark job per epoch at call time. */
  def emLinkage(pairs: DataFrame, agree: Seq[String], epochs: Int = 3,
                start: Params = null): (DataFrame, Params) = {
    require(agree.nonEmpty && epochs >= 1, "need >= 1 field and >= 1 epoch")
    val mat = pairs.repartition(col("id_a"), col("id_b")).localCheckpoint()
    var ps = Option(start).getOrElse(init(agree.length))
    for (_ <- 1 to epochs) {
      val w = posterior(agree, ps)
      val aggs = sum(w).as("s") +: count(lit(1)).as("n") +:
        agree.zipWithIndex.flatMap { case (a, i) => Seq(
          sum(w * col(a)).as(s"sa$i"), sum(col(a)).as(s"ca$i")) }
      val r = mat.agg(aggs.head, aggs.tail: _*).collect()(0)
      val n = BigInt(r.getAs[Long]("n"))
      require(n > 0, "RecordLinkage.emLinkage: empty pair frame")
      val s = BigInt(r.getAs[Long]("s"))
      require(s > 0 && s < n * FP,
        "RecordLinkage.emLinkage: EM collapsed (all-match or all-unmatch " +
          "posteriors) — degenerate agreement fields or empty pairs")
      val m2 = new Array[Long](agree.length)
      val u2 = new Array[Long](agree.length)
      agree.indices.foreach { i =>
        val sa = BigInt(r.getAs[Long](s"sa$i")); val ca = BigInt(r.getAs[Long](s"ca$i"))
        m2(i) = clamp(sa * FP / s)
        u2(i) = clamp((ca * FP - sa) * FP / (n * FP - s))
      }
      ps = Params(clamp(s / n), m2, u2)
    }
    val w = posterior(agree, ps)
    (mat.select(col("id_a") +: col("id_b") +: agree.map(col): _*)
      .withColumn("w_fp", w)
      .withColumn("is_match", col("w_fp") >= lit(FP / 2)), ps)
  }
}
