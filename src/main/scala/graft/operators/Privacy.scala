package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Privacy-preserving release operators — the pass a training-data
  * pipeline runs between curation and publication when the corpus carries
  * person-level attributes (the complement of [[TextAnalysis]]'s PII
  * redaction, which scrubs free text; these govern STRUCTURED columns).
  *
  * All three operators are deterministic and hash-oracle-able: group
  * counts are exact, and the noise draw is a pure function of
  * (group value, salt) through the repo's portable hash (first 8 hex of
  * md5 — the [[Sampling]] construction), so DuckDB replays every output
  * bit. Scale shapes are one aggregation and at most one equi-join each —
  * no windows over the full table, no driver-side group state.
  */
object Privacy {

  /** K-ANONYMITY via SUPPRESSION: rows whose quasi-identifier combination
    * (the `quasi` columns jointly) appears in fewer than `k` rows get
    * those columns replaced by `"*"`; rows in groups of `>= k` keep their
    * values (cast to string, so the output schema is uniform). Every
    * released row is then indistinguishable from at least k−1 others on
    * the quasi-identifiers — the classic Sweeney k-anonymity contract,
    * suppression flavor (generalization ladders compose upstream: bucket
    * a numeric column first, then anonymize on the bucket).
    *
    * Scale shape: one group-count aggregation (|groups| rows — bounded by
    * quasi-identifier cardinality, not corpus size) null-safe-joined back
    * to the fact side. The counts side is aggregate output, so AQE sees
    * its real size and broadcast-joins it for any sane quasi cardinality
    * — the fact table is never shuffled. A window form
    * (`count(*) over (partition by quasi)`) would sort the whole corpus;
    * the join form touches it once. Null quasi values group and join
    * null-safely (`<=>`), so null-bearing rows are counted and suppressed
    * by the same rule as everything else, never dropped. */
  def kAnonymize(df: DataFrame, quasi: Seq[String], k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(quasi.nonEmpty && quasi.forall(df.columns.contains),
      s"quasi columns $quasi must exist in ${df.columns.mkString(",")}")
    val counts = df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("__kn"))
      .select(quasi.map(c => col(c).as(s"__q_$c")) :+ col("__kn"): _*)
    val cond = quasi.map(c => col(c) <=> col(s"__q_$c")).reduce(_ && _)
    // left join: every row's own group exists by construction, so __kn is
    // never null — but left (not inner) makes row preservation structural
    // rather than an inference
    val outCols = df.columns.map { c =>
      if (quasi.contains(c))
        when(col("__kn") >= k, col(c).cast("string")).otherwise(lit("*")).as(c)
      else col(c)
    }
    df.join(counts, cond, "left").select(outCols.toIndexedSeq: _*)
  }

  /** K-ANONYMITY / L-DIVERSITY AUDIT: one row per quasi-identifier group
    * with its size, its count of distinct `sensitive` values, and the two
    * compliance flags (`n >= k`, `distinct >= l`). l-diversity is the
    * standard refinement of k-anonymity (Machanavajjhala et al. 2007): a
    * group can be large yet still leak if every member shares the same
    * sensitive value — k-anonymous, zero-diverse. Run this BEFORE release
    * to find the groups suppression or generalization must still treat.
    * One aggregation; output is |groups| rows. */
  def lDiversityAudit(df: DataFrame, quasi: Seq[String], sensitive: String,
                      k: Int, l: Int): DataFrame = {
    require(k >= 1 && l >= 1, s"need k >= 1 and l >= 1, got k=$k l=$l")
    df.groupBy(quasi.map(col): _*)
      .agg(count(lit(1)).as("n"),
        countDistinct(col(sensitive)).as("l_distinct"))
      .withColumn("k_anonymous", col("n") >= k)
      .withColumn("l_diverse", col("l_distinct") >= l)
  }

  /** A PUBLIC, checked-in salt for tests and the DuckDB regression gate
    * ONLY — a release built with it has zero differential-privacy
    * protection, because anyone with this code can replay every draw. */
  val TestOnlyPublicSalt: String = "graft-dp"

  /** LAPLACE-NOISED group counts — the Laplace mechanism at sensitivity 1
    * (each individual contributes one row to one group), scale 1/eps.
    * The noise source is a KEYED PRF, not an RNG: u ∈ (−0.5, 0.5) derives
    * from the portable hash of (group value, salt) and the draw inverts
    * the Laplace CDF, `noise = −(1/eps)·sign(u)·ln(1 − 2|u|)`. With the
    * salt secret this is how production DP systems actually draw noise
    * (a PRF keyed per release); with the salt fixed it is REPRODUCIBLE —
    * reruns, engine swaps, and the DuckDB oracle all see the same bits,
    * which is what a regression-gated pipeline needs. The raw count rides
    * along for the gate; a real release would drop it (and rotate the
    * salt per release — a reused salt re-publishes the same noise, which
    * composes like publishing once, not like fresh draws).
    *
    * `(h + 0.5)/2³² − 0.5` keeps u strictly inside (−0.5, 0.5), so
    * `ln(1 − 2|u|)` never sees 0; the emitted value is rounded to 6
    * decimals (the [[Similarity]] cosine convention) so last-ulp libm
    * `ln` drift between engines cannot flap the hash gate.
    *
    * `salt` is REQUIRED and is the whole privacy story: a salt known to
    * the release's audience makes every draw predictable, i.e. zero DP
    * protection. Pass a per-release secret in production;
    * [[TestOnlyPublicSalt]] exists solely for regression gates and says
    * so in its name — there is deliberately no default, so an unsafe
    * configuration must be typed out. */
  def dpNoisyCount(df: DataFrame, group: String, eps: Double,
                   salt: String): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val h = conv(substring(md5(concat(col(group).cast("string"), lit(salt))),
      1, 8), 16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0) - lit(0.5)
    val noise = lit(-1.0 / eps) * signum(u) * log(lit(1.0) - lit(2.0) * abs(u))
    df.groupBy(col(group)).agg(count(lit(1)).as("n"))
      .select(col(group), col("n"), round(col("n") + noise, 6).as("noisy_n"))
  }
}
