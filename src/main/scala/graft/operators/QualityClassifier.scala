package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Train-and-score document QUALITY CLASSIFIER — the fastText-style gate
  * (Joulin et al., "Bag of Tricks for Efficient Text Classification",
  * EACL 2017) every major corpus pipeline runs between heuristic filters
  * and tokenization (GPT-3's WebText-similarity LR, CCNet, RefinedWeb):
  * a logistic-regression-shaped linear model over HASHED CHARACTER
  * N-GRAM features, trained in-plan for a bounded number of epochs,
  * scoring as pure scan+agg stages.
  *
  * What makes it gate-able (the [[Clustering]] discipline): FIXED-POINT
  * arithmetic end-to-end. Features, labels, predictions, and weights are
  * integers in 1e-5 units ([[FP]]); the sigmoid is the piecewise-linear
  * HARD sigmoid `clamp(½ + z/4, 0, 1)` (Courbariaux et al. 2015's
  * BinaryConnect trick), so every margin, prediction, gradient, and
  * weight update is EXACTLY representable and bit-identical in any
  * engine at any partitioning — full-batch gradient descent whose entire
  * training trajectory the DuckDB oracle replays as unrolled-epoch CTEs.
  * (Float LR depends on summation order and libm exp; this doesn't.)
  * All floor-divisions route through exact doubles; the only magnitude
  * that grows with the corpus is the per-bucket gradient sum, and
  * [[train]] GUARDS it with an executable `require` (|G_b| ≤ 2⁵³/lrNum)
  * rather than a narrative bound. A corpus that trips it should train on
  * a deterministic sample — which is what production quality classifiers
  * do anyway (fastText gates train on ~10⁶ docs and score the full
  * corpus; scoring here is corpus-scale, training state is
  * `buckets`-bounded).
  *
  * Scale shape:
  *  - FEATURES are built once, in ONE map-only projection: the
  *    [[graft.plans.CharGramBuckets]] codegen expression emits each
  *    doc's bucket histogram pre-aggregated (same portable md5 bucket as
  *    [[Dsir.featureBucket]], bit-identical to the oracle's), the gram
  *    total is just `length − 2`, and the bias entry concatenates onto
  *    the list — no corpus-character-sized explode, no (doc, bucket)
  *    aggregation, no joins. The exploded (doc, bucket, x, y) frame —
  *    bounded by docs·min(grams, buckets+1) rows — is repartitioned by
  *    doc and localCheckpoint'ed so every epoch re-scans a materialized
  *    narrow table co-located on the doc key.
  *  - Each EPOCH is two bounded jobs off that table: margins = one
  *    exchange-free aggregation on the doc key (weights ship as a
  *    `buckets`-sized literal array inside the projection — index
  *    metadata, the [[Clustering]] centroid pattern); gradient = one join
  *    (only the docs-sized error side shuffles; the feature side reuses
  *    its partitioning) + one bucket aggregation with map-side combine.
  *    The per-epoch driver collect is ≤ buckets+1 rows — bounded model
  *    state, never corpus rows.
  *  - SCORING is one pass of the same margin plan with the final weights:
  *    no training-only state survives into the scoring plan.
  *
  * Determinism notes mirrored by the oracle:
  *  - features x_{d,b} = floor(cnt·FP / tot_d) — length-normalized
  *    (fastText's mean-of-features), exact integer;
  *  - bias = one extra feature at index `buckets` with x = FP;
  *  - epoch-1 margins under w₀ = 0 are all 0 ⇒ p = FP/2 exactly;
  *  - update w ← w − floor(lrNum·G / (n·FP)).
  */
object QualityClassifier {

  /** Fixed-point scale: 1e5 units ≈ 5 decimal digits. Chosen (vs the
    * repo's usual 1e6) so the worst-case gradient sum n·FP²/2 and the
    * update numerator lrNum·G stay below 2⁵³ for n up to ~10⁸ docs —
    * every floor-division in the trajectory is over exact doubles. */
  val FP: Long = 100000L

  /** A trained model: `weights(b)` in FP units for buckets 0..buckets-1,
    * plus the bias at index `buckets`. */
  final case class Model(weights: Array[Long], buckets: Int) {
    require(weights.length == buckets + 1,
      s"weights must be buckets+1 long (bias last), got ${weights.length} for $buckets")
  }

  /** (doc, bucket, x, y) feature grain: hashed char-3-gram counts,
    * length-normalized to FP units, bias row appended, label in FP units.
    * Repartitioned on the doc key and localCheckpoint'ed — the epochs and
    * the scoring pass all re-scan this one materialized table. */
  private def featureFrame(df: DataFrame, id: String, text: String,
                           label: Column, buckets: Int): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    // histograms are born per-doc-aggregated in ONE codegen pass
    // (graft.plans.CharGramBuckets) — the relational form exploded a row
    // per character into a corpus-sized (doc, bucket) aggregation, plus
    // a totals aggregation and two joins; here the total gram count is
    // just length-2 and the bias entry concatenates onto the entry list,
    // so the whole table is a single map-only projection
    val gb = coalesce(
      call_function("char_gram_buckets", col("__t"), lit(3), lit(buckets)),
      typedlit(Seq.empty[(Long, Long)])
        .cast("array<struct<b:bigint,cnt:bigint>>"))
    // the bias rides the entry list as bucket `buckets` (cnt unused); x is
    // computed per EXPLODED row — no arithmetic inside a HOF lambda, where
    // it would re-evaluate per element
    val entries = concat(gb, array(struct(lit(buckets.toLong).as("b"), lit(0L).as("cnt"))))
    df.select(col(id).as("__id"),
        when(label, lit(FP)).otherwise(lit(0L)).as("__y"),
        lower(col(text)).as("__t"))
      // floor at 1, not 0: a doc with fewer than 3 codepoints emits NO
      // gram entries (char_gram_buckets counts codepoints, same as
      // length() here and the oracle's substr), so __tot is then never
      // read by a gram row — the floor only removes the ÷0 → Infinity →
      // Long overflow hazard structurally instead of by that argument
      .select(col("__id"), col("__y"),
        greatest(length(col("__t")) - 2, lit(1)).cast("double").as("__tot"),
        explode(entries).as("__e"))
      .select(col("__id"), col("__y"), col("__e.b").as("__b"),
        when(col("__e.b") === buckets.toLong, lit(FP))
          .otherwise(floor(col("__e.cnt").cast("double") * lit(100000.0) / col("__tot")))
          .as("__x"))
      .repartition(col("__id"))
      .localCheckpoint()
  }

  /** Hard-sigmoid prediction in FP units from a raw margin
    * Σ w_b·x_{d,b} (FP² units): clamp(FP/2 + ⌊⌊mraw/FP⌋/4⌋, 0, FP). */
  private def pCol(mraw: Column): Column = {
    val m = floor(mraw.cast("double") / lit(100000.0))
    val d = floor(m.cast("double") / lit(4.0))
    greatest(lit(0L), least(lit(FP), lit(FP / 2) + d))
  }

  private def marginCol(weights: Array[Long]): Column =
    sum(element_at(typedlit(weights.toIndexedSeq),
      (col("__b") + 1).cast("int")) * col("__x"))

  /** Train `epochs` rounds of full-batch hard-sigmoid gradient descent.
    * EAGER (the [[Bpe.train]] contract): runs 2 bounded Spark jobs per
    * epoch at call time; per-epoch driver state is the buckets+1-row
    * gradient — bounded model metadata. */
  def train(df: DataFrame, id: String, text: String, label: Column,
            buckets: Int = 1024, epochs: Int = 3, lrNum: Long = 4L): Model =
    trainOnFeats(featureFrame(df, id, text, label, buckets), df.count(),
      buckets, epochs, lrNum)

  private def trainOnFeats(feats: DataFrame, n: Long, buckets: Int,
                           epochs: Int, lrNum: Long): Model = {
    require(buckets > 0 && epochs > 0, s"need buckets/epochs > 0, got $buckets/$epochs")
    require(lrNum >= 1L && lrNum <= 8L,
      s"lrNum must be in [1, 8] (exactness bound: lrNum·|G| < 2^53), got $lrNum")
    require(n > 0, "QualityClassifier.train: empty corpus")
    val w = Array.fill(buckets + 1)(0L)
    for (_ <- 1 to epochs) {
      val errs = feats
        .groupBy(col("__id"), col("__y"))
        .agg(marginCol(w).as("__mraw"))
        .select(col("__id"), (pCol(col("__mraw")) - col("__y")).as("__err"))
      val grad = feats.join(errs, "__id")
        .groupBy(col("__b")).agg(sum(col("__err") * col("__x")).as("__g"))
        .collect()
      grad.foreach { r =>
        val g = r.getLong(1)
        // executable exactness bound, not a narrative one: the floor
        // division below is exact only while its numerator is an exact
        // double — beyond this, train on a deterministic sample
        require(math.abs(g) <= (1L << 53) / lrNum,
          s"QualityClassifier.train: |gradient| ${math.abs(g)} exceeds the " +
            s"2^53/lrNum exact-double bound — train on a sample of the corpus " +
            "(scoring stays corpus-scale; see scaladoc)")
        w(r.getLong(0).toInt) -=
          math.floor((lrNum * g).toDouble / (n.toDouble * 100000.0)).toLong
      }
    }
    Model(w, buckets)
  }

  /** Score every document with a trained model: `(id, score_fp, pred)`
    * where score_fp ∈ [0, FP] is the hard-sigmoid quality score in FP
    * units and pred = score_fp ≥ FP/2. One feature pass + one doc-key
    * aggregation; the model rides as a literal array. */
  def score(df: DataFrame, id: String, text: String, label: Column,
            model: Model): DataFrame =
    scoreFeats(featureFrame(df, id, text, label, model.buckets), id, model)

  private def scoreFeats(feats: DataFrame, id: String, model: Model): DataFrame =
    feats.groupBy(col("__id"))
      .agg(marginCol(model.weights).as("__mraw"))
      .select(col("__id").as(id), pCol(col("__mraw")).as("score_fp"))
      .withColumn("pred", col("score_fp") >= lit(FP / 2))

  /** SHUFFLE-FREE scoring with a FROZEN model — the deployment shape: a
    * gate trained offline (ingest-phase, [[train]]/[[trainScore]]) scores
    * fresh data as a pure per-row projection. The margin folds inside the
    * row over the pre-aggregated gram histogram
    * (`Σ w[b]·floor(cnt·FP/tot)` via `aggregate`, + the bias term), so
    * there is NO explode, NO (doc, bucket) frame and NO exchange — which
    * makes it STREAMING-SAFE (append mode, zero state) and the right
    * scorer for a corpus the feature table was never built for. Integer
    * arithmetic is identical to the training-side margin, so scores are
    * bit-equal to [[score]]'s (spec-pinned).
    *
    * Output: (id, score_fp, pred) — the [[score]] schema. */
  def rowScore(df: DataFrame, id: String, text: String, model: Model): DataFrame = {
    graft.plans.GraftFunctions.register(df.sparkSession)
    val wLit = typedlit(model.weights.toIndexedSeq)
    val gb = coalesce(
      call_function("char_gram_buckets", col("__t"), lit(3), lit(model.buckets)),
      typedlit(Seq.empty[(Long, Long)])
        .cast("array<struct<b:bigint,cnt:bigint>>"))
    val mraw = aggregate(col("__gb"), lit(0L),
      (acc, e) => acc + element_at(wLit, (e.getField("b") + 1).cast("int")) *
        floor(e.getField("cnt").cast("double") * lit(100000.0) / col("__tot"))
          .cast("long")) +
      lit(model.weights(model.buckets)) * lit(FP)
    // same floor-at-1 as featureFrame: a sub-3-codepoint doc has an
    // empty histogram, so the lambda never divides — the floor only
    // removes the ÷0 hazard (bit-equality with score() is spec-pinned)
    df.select(col(id), lower(col(text)).as("__t"))
      .select(col(id), gb.as("__gb"),
        greatest(length(col("__t")) - 2, lit(1)).cast("double").as("__tot"))
      .select(col(id), pCol(mraw).as("score_fp"))
      .withColumn("pred", col("score_fp") >= lit(FP / 2))
  }

  /** train + score on the same corpus — the self-contained gate form.
    * The checkpointed feature table is built ONCE and shared between the
    * training epochs and the scoring pass (a separate train + score pays
    * the gram explode, hash aggregation, and checkpoint twice).
    *
    * `cacheKey` (the [[graft.operators.Dedup]] `bandedCacheKey`
    * contract): registered sibling queries that train the SAME gate on
    * the SAME static corpus — the score row, its PR-curve calibration,
    * the soft-sample policy — share one (features, model) build through
    * [[graft.operators.Scale.memo]] instead of re-running the feature
    * pass and the training epochs per query. The key must fingerprint
    * the corpus AND every training parameter; training a static gate is
    * ingest-phase work, which is exactly what the memo exists for. */
  def trainScore(df: DataFrame, id: String, text: String, label: Column,
                 buckets: Int = 1024, epochs: Int = 3,
                 cacheKey: Option[String] = None): DataFrame = {
    def build(): (DataFrame, Model) = {
      val feats = featureFrame(df, id, text, label, buckets)
      (feats, trainOnFeats(feats, df.count(), buckets, epochs, lrNum = 4L))
    }
    val (feats, model) = cacheKey match {
      case Some(k) => Scale.memo(k, df.sparkSession)(build())
      case None => build()
    }
    scoreFeats(feats, id, model)
  }
}
