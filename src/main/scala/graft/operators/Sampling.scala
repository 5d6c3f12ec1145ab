package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split assignment for training-data
  * pipelines.
  *
  * A training corpus needs train/val/test membership that is (a) stable
  * across reruns and cluster layouts — `df.sample()` depends on partition
  * layout and reshuffles every run, so a doc could silently migrate from
  * test to train between pipeline versions (leakage); (b) a pure per-row
  * function — no shuffle, no state, applies identically on a 100 TB corpus
  * or a stream; (c) portable — the same (id, salt) lands in the same split
  * in ANY engine, so downstream consumers can re-derive membership.
  *
  * The hash is the repo's portable construction (first 8 hex of md5 →
  * bigint; identical in Spark and DuckDB), salted so independent pipelines
  * draw independent assignments.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from a salted portable hash of the id. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Cumulative Poisson(1) CDF in ppm, k = 0..6 — the multiplicity
    * lookup for [[poissonBootstrapMeans]], generated once and embedded
    * as literals on BOTH engines (the z-order convention). */
  val BootThresholdsPpm: Array[Long] = {
    val e1 = math.exp(-1.0)
    var cum = 0.0
    var fact = 1.0
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      cum += e1 / fact
      (cum * 1e6).toLong
    }.toArray
  }

  /** HASH-DETERMINISTIC POISSON BOOTSTRAP — the resampling distribution
    * of the mean without any randomness state: resample `b` draws row i
    * with multiplicity m = F⁻¹_Poisson(1)(u_ib), where u_ib is the row's
    * portable salted ppm bucket for draw b (the Poisson bootstrap —
    * Chamandy et al. 2012, the bag-of-little-bootstraps building block;
    * Poisson(1) multiplicities ≡ with-replacement resampling as n grows).
    * Deterministic and engine-portable by the same md5 construction as
    * every sampler here, so the ORACLE reproduces every resample
    * exactly — a bootstrap you can hash-verify.
    *
    * Plan: ONE md5 per ROW (not per (row, draw) — measured 3.5 s vs
    * 0.5 s at sf0.1×32: the hash, not the explode, is the cost), mixed
    * to a per-draw bucket by a modular affine-multiplicative step over
    * the prime 10⁹+7 — plain int64 arithmetic with every intermediate
    * < 2⁶³ (ANSI-safe), identical in any engine, uniform to ~10⁻³
    * relative (p mod 10⁶ = 7; irrelevant at bootstrap precision). Then
    * one explode ×B at scan grain and one grouped aggregation to B rows
    * of exact integer sums (m ≤ 7, so Σ m·x_fp stays far inside int64);
    * the emitted table IS the bootstrap distribution of the mean — CI =
    * order statistics of the B means, taken downstream.
    * Output: (b, n_drawn, mean_b), b ∈ [0, draws). */
  def poissonBootstrapMeans(df: DataFrame, id: String, x: String,
                            draws: Int = 32, scale: Int = 4,
                            salt: String = "boot"): DataFrame = {
    require(draws >= 1 && scale >= 0 && scale <= 6,
      s"bad draws=$draws / scale=$scale")
    val unit = math.pow(10, scale).toLong
    val xq = (col(x).cast(s"decimal(18,$scale)") * unit).cast("long")
    // one portable 32-bit hash per row; per-draw mix keeps every
    // intermediate < (2³² + B·10⁶)·998244353 < 2⁶³
    val h = conv(substring(md5(concat(col(id).cast("string"), lit(salt))), 1, 8),
      16, 10).cast("long")
    val u = pmod((col("__h") + (col("b") + 1) * lit(1000003L)) * lit(998244353L),
      lit(1000000007L)) % 1000000
    val mult = BootThresholdsPpm.zipWithIndex.reverse
      .foldLeft(lit(BootThresholdsPpm.length): Column) {
        case (acc, (th, k)) => when(col("__u") < th, k).otherwise(acc)
      }
    // the repartition is a MATERIALIZATION BARRIER, not a distribution
    // choice: a Generate keeps only its generator's inputs below itself,
    // so without the exchange the md5 projection floats ABOVE the explode
    // and re-hashes once per (row × draw) — measured 3.2 s vs ~0.7 s at
    // sf0.1×32. (A 32-branch per-row multiplicity ARRAY was tried
    // instead and fell out of whole-stage codegen — slower than the
    // narrow 16-byte-row shuffle this costs.)
    df.filter(col(x).isNotNull)
      .select(xq.as("__xq"), h.as("__h"))
      .repartition()
      .select(col("__xq"), col("__h"),
        explode(typedlit((0 until draws).toArray)).as("b"))
      .withColumn("__u", u)
      .withColumn("__m", mult.cast("long"))
      .groupBy(col("b"))
      .agg(sum(col("__m")).as("n_drawn"),
        sum(col("__m") * col("__xq")).as("__swx"))
      .select(col("b").cast("long").as("b"), col("n_drawn"),
        when(col("n_drawn") > 0,
          round(col("__swx").cast("double") / col("n_drawn").cast("double") /
            lit(unit.toDouble), 6)).as("mean_b"))
  }

  /** Stable percentage sample: keeps ids whose bucket falls below `pct`
    * (of 100). Map-only — the filter pushes to the scan stage. */
  def sampleByHash(df: DataFrame, id: String, pct: Int,
                   salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(id), salt, 100) < pct)

  /** SOFT quality filter (the RefinedWeb/FineWeb policy): keep each row
    * with probability proportional to its quality score instead of a
    * hard threshold — a doc scoring 0.73 survives 73% of salt draws, so
    * borderline text is downsampled rather than cliff-dropped. `scoreFp`
    * is a fixed-point score in [0, 1e5] (the
    * [[graft.operators.QualityClassifier]] scale); the draw is the
    * portable salted md5 ppm bucket, so membership is deterministic,
    * engine-portable, and re-derivable by the oracle. Map-only. */
  def softFilterByScore(df: DataFrame, id: String, scoreFp: Column,
                        salt: String = "graft-soft"): DataFrame =
    df.filter(hashBucket(col(id), salt, 1000000) < scoreFp * lit(10L))

  /** Stratified sample: a different keep-percentage per stratum (e.g.
    * downsample dominant languages, keep all of rare ones — the standard
    * corpus-rebalancing move). Same per-row portable hash, so membership
    * stays stable and nested across pct changes; strata missing from
    * `pcts` fall back to `defaultPct`. Map-only, no shuffle: the strata
    * percentages compile into one CASE expression. */
  def stratifiedSampleByHash(df: DataFrame, id: String, stratum: String,
                             pcts: Map[String, Int], defaultPct: Int = 100,
                             salt: String = "graft"): DataFrame = {
    val pctCol = pcts.toSeq.sortBy(_._1).foldRight(lit(defaultPct)) {
      case ((k, p), rest) => when(col(stratum) === k, p).otherwise(rest)
    }
    df.filter(hashBucket(col(id), salt, 100) < pctCol)
  }

  /** DATA MIXING — subsample each group (source/domain/language) so the
    * surviving corpus matches a target mix (the curation move behind
    * "20% code, 30% web, ..." recipes; a DoReMi-style weight search would
    * feed its learned weights straight in here). Weights are RELATIVE
    * (never normalized — normalization order would introduce cross-engine
    * float drift; rates are scale-invariant in the weights): the binding
    * group (largest target share vs. availability) is kept ~whole and
    * every other group is hash-downsampled to match proportions. Groups
    * absent from `target` are dropped (weight zero).
    *
    * Everything stays in the plan: per-group counts (one groupBy of group
    * keys), the feasible kept-total K = min_g n_g/t_g (an aggregate over
    * the counts frame, not a driver collect), per-group keep rates in ppm
    * (floor — deterministic on both engines), then a broadcast join of
    * the #groups-row rate table and the portable salted-hash filter.
    * Same stability contract as every sampler here: membership is a pure
    * function of (id, salt), re-derivable in any engine. */
  def mixToTarget(df: DataFrame, id: String, groupCol: String,
                  target: Map[String, Double], salt: String = "graft-mix"): DataFrame = {
    require(target.nonEmpty && target.values.forall(_ > 0),
      s"target weights must be positive: $target")
    val tCol = target.toSeq.sortBy(_._1).foldRight(lit(null).cast("double")) {
      case ((k, w), rest) => when(col(groupCol) === k, lit(w)).otherwise(rest)
    }
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .withColumn("t_g", tCol).filter(col("t_g").isNotNull)
    // a target group with ZERO rows can't be mixed toward — silently
    // renormalizing over the present groups would hand back a corpus
    // arbitrarily far from the requested mix, so fail loudly. The collect
    // is bounded by |target| rows (counts is already target-filtered).
    val present = counts.select(col(groupCol)).collect()
      .map(_.getString(0)).toSet
    val missing = target.keySet -- present
    require(missing.isEmpty,
      s"mixToTarget: target groups absent from the data: ${missing.toSeq.sorted.mkString(", ")}")
    val kTotal = counts.agg(min(col("n_g").cast("double") / col("t_g")).as("k_total"))
    val rates = counts.crossJoin(broadcast(kTotal))
      .select(col(groupCol),
        floor(col("t_g") * col("k_total") / col("n_g") * lit(1000000))
          .cast("long").as("keep_ppm"))
    df.join(broadcast(rates), groupCol)
      .filter(hashBucket(col(id), salt, 1000000) < col("keep_ppm"))
      .drop("keep_ppm")
  }

  /** TEMPERATURE-SCALED MIXING — the mT5/XLM-R multilingual sampling rule
    * (public recipe: sample group i with probability ∝ n_i^α, α ∈ (0,1]):
    * the smallest group keeps ~100% and every larger group downsamples to
    * rate (n_min / n_g)^(1−α) — α=1 reproduces the natural distribution,
    * α→0 approaches uniform-per-group. This is [[mixToTarget]] with the
    * target weights derived IN-PLAN from the group counts themselves
    * (t_g = n_g^α), so no weight map ships from the driver and the mix
    * self-adjusts as the corpus grows. Same plan shape and membership
    * contract: one group-keyed count, a #groups-row broadcast rate table,
    * the portable salted-hash filter — membership is a pure function of
    * (id, salt). The floor'd ppm rate sits a libm-pow last-ulp away from a
    * boundary with probability ~2⁻³⁰ per group — the accepted ES-sampler
    * risk class, noted here because pow (unlike sqrt) is not guaranteed
    * correctly rounded. */
  def temperatureMix(df: DataFrame, id: String, groupCol: String,
                     alpha: Double, salt: String = "graft-mix"): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0, 1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("n_g"))
      .withColumn("t_g", pow(col("n_g").cast("double"), lit(alpha)))
    val kTotal = counts.agg(min(col("n_g").cast("double") / col("t_g")).as("k_total"))
    val rates = counts.crossJoin(broadcast(kTotal))
      .select(col(groupCol),
        floor(col("t_g") * col("k_total") / col("n_g") * lit(1000000))
          .cast("long").as("keep_ppm"))
    df.join(broadcast(rates), groupCol)
      .filter(hashBucket(col(id), salt, 1000000) < col("keep_ppm"))
      .drop("keep_ppm")
  }

  /** WEIGHTED sampling without replacement, k per group — deterministic
    * Efraimidis–Spirakis (A-ES): each row draws u ∈ (0,1] from the salted
    * portable hash of its id and scores `ln(u)/w`; the k highest scores
    * per group win. That is exactly sampling without replacement with
    * inclusion probability proportional to weight — but REPRODUCIBLE: the
    * draw is a pure function of (id, salt), so membership survives reruns,
    * repartitioning, and engine changes (the oracle re-derives it in SQL).
    *
    * Scale shape: one shuffle on the group key (the row_number window);
    * no global sort, no driver state. Scores are CONTINUOUS (distinct
    * 32-bit hashes, distinct weights ⇒ ties have ~2⁻³² probability, and
    * the id tie-breaker makes even those deterministic), and the score
    * itself is not emitted, so cross-libm `ln` drift in the last ulp
    * cannot flap a rank — gaps between order statistics of a continuous
    * draw dwarf 1e-16 relative error. */
  def weightedSamplePerGroup(df: DataFrame, id: String, weight: String,
                             group: String, k: Int,
                             salt: String = "graft-es"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(concat(col(id).cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("double")
    val u = (h + lit(1.0)) / lit(4294967296.0)
    val score = log(u) / col(weight).cast("double")
    val w = Window.partitionBy(col(group)).orderBy(score.desc, col(id))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** CLUSTER-BALANCED (diversity) sampling — the SemDeDup-companion
    * curation op: k-means the embedding space
    * ([[Clustering.kmeansAssign]], fixed-point ⇒ reproducible), then draw
    * `perCluster` rows per cluster with the deterministic
    * Efraimidis–Spirakis sample ([[weightedSamplePerGroup]], uniform
    * weights). Guarantees every semantic region contributes equally to the
    * sample regardless of how skewed the corpus is toward its dominant
    * mode — the opposite failure mode of uniform sampling, which
    * oversamples whatever dominates. Scale: map-only assignment passes +
    * one window shuffle on the cluster id; membership is a pure function
    * of (id, salt, corpus), stable across reruns and engines. */
  def clusterBalancedSample(emb: DataFrame, id: String, vec: String,
                            k: Int, iters: Int, perCluster: Int,
                            salt: String = "graft-es",
                            kmeansMemoKey: Option[String] = None): DataFrame = {
    val assign = Clustering.kmeansAssign(emb, id, vec, k, iters,
        memoKey = kmeansMemoKey)
      .select(col(id), col("cluster"))
    weightedSamplePerGroup(assign.withColumn("__w", lit(1.0)),
      id, "__w", "cluster", perCluster, salt).drop("__w")
  }

  /** DETERMINISTIC NEGATIVE SAMPLING — the recsys / contrastive-training
    * data op: for every user in `positives`, the first `n` catalog items
    * the user has NOT interacted with, ordered by the portable salted
    * hash of the (user, item) pair. Hash-ordering makes the negatives a
    * pure function of (user, catalog, salt): stable across reruns,
    * partitionings, and engines — resampling on every epoch-build is a
    * classic source of irreproducible training runs.
    *
    * Plan: distinct users × BROADCAST catalog (the catalog is the small
    * side by construction), anti-join the positive pairs, one window on
    * the user key. The window sorts |catalog| rows per user; at a 10⁶+
    * catalog, prefilter candidates by a hash-bucket cut (keep ≥ 4n
    * expected survivors) before the window — the top-n set is unchanged
    * whenever the cut keeps ≥ n survivors per user, and the cut is
    * checkable per user at run time. Output: (user, item, rank). */
  def negativeSample(positives: DataFrame, user: String, item: String,
                     catalog: DataFrame, n: Int,
                     salt: String = "graft-neg"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val users = positives.select(col(user)).distinct()
    // CONTRACT: `catalog` must be dimension-sized — the candidate set is
    // O(|users| · |catalog|) rows and the catalog must fit in a broadcast.
    // For an item universe beyond broadcast size use
    // [[negativeSampleBounded]], whose candidates are O(n) per user.
    // distinct(): duplicate catalog rows would become duplicate
    // (user, item) candidates occupying multiple ranks — repeated
    // negatives and a silently shrunken effective n.
    val cand = users.crossJoin(broadcast(catalog.select(col(item)).distinct()))
      .withColumn("__h", md5(concat(col(user).cast("string"), lit("|"),
        col(item).cast("string"), lit("|"), lit(salt))))
    val neg = cand.join(positives.select(col(user), col(item)).distinct(),
      Seq(user, item), "left_anti")
    val w = Window.partitionBy(col(user)).orderBy(col("__h"), col(item))
    neg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col(user), col(item), col("rank"))
  }

  /** SCALE-SAFE NEGATIVE SAMPLING — bounded per-user candidates for an
    * item universe too large to broadcast or to hash per user
    * ([[negativeSample]]'s O(|users|·|catalog|) wall): the catalog is
    * hash-bucketed ONCE (user-independent), each user probes a
    * deterministic window of `probeBuckets` buckets starting at its own
    * salted hash, and negatives are ranked by (probe position, pair hash)
    * WITHIN the window. Candidates per user = probeBuckets·|catalog|/nBuckets
    * — size nBuckets ∝ |catalog|/n and the whole query is O(n) rows per
    * user end-to-end, with candidate generation an EQUI-JOIN on the bucket
    * id (shuffle, AQE-sizeable), never a cartesian product.
    *
    * The sample is still a pure function of (user, catalog, salt) — a
    * different order than [[negativeSample]]'s global pair-hash rank, but
    * equally deterministic and uniform (both the item bucket and the
    * user's probe start are salted hashes); the exhaustive evaluation of
    * the SAME windowed rule is SQL-expressible, which is what the oracle
    * gate verifies row-for-row.
    *
    * A user whose window holds fewer than `n` un-interacted items (window
    * too small for its positives density) fails LOUDLY — a single-row
    * audit over the materialized result raises instead of silently
    * under-sampling; the fix is more probeBuckets (or fewer nBuckets). */
  def negativeSampleBounded(positives: DataFrame, user: String, item: String,
                            catalog: DataFrame, n: Int,
                            salt: String = "graft-neg",
                            nBuckets: Int = 64, probeBuckets: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(probeBuckets >= 1 && probeBuckets <= nBuckets,
      s"probeBuckets must be in [1, nBuckets]: $probeBuckets/$nBuckets")
    val users = positives.select(col(user)).distinct()
      .withColumn("__u0", hashBucket(col(user), salt + "-probe", nBuckets))
    val cat = catalog.select(col(item)).distinct()
      .withColumn("__b", hashBucket(col(item), salt + "-bucket", nBuckets))
    // the probe window: probeBuckets rows per user, bucket (u0 + j) % nBuckets
    val probes = users.select(col(user),
        explode(sequence(lit(0), lit(probeBuckets - 1))).as("__j"),
        col("__u0"))
      .withColumn("__b", (col("__u0") + col("__j")) % nBuckets)
    val cand = probes.join(cat, "__b")
      .withColumn("__h", md5(concat(col(user).cast("string"), lit("|"),
        col(item).cast("string"), lit("|"), lit(salt))))
    val neg = cand.join(positives.select(col(user), col(item)).distinct(),
      Seq(user, item), "left_anti")
    val w = Window.partitionBy(col(user)).orderBy(col("__j"), col("__h"), col(item))
    // materialized: consumed by both the output and the shortfall audit —
    // left lazy, the join+window subtree runs twice
    val ranked = neg.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= n)
      .select(col(user), col(item), col("rank"))
      .localCheckpoint()
    // shortfall audit: a single-row aggregate over the materialized result
    // (bounded collect — the IvfIndex-metadata precedent). Deliberately
    // DRIVER-side, not an in-plan raise_error guard column: a user whose
    // window holds ZERO negatives contributes no output row at all, so a
    // row-level guard would never evaluate on exactly the worst shortfall.
    val minNegs = users.select(col(user))
      .join(ranked.groupBy(col(user)).agg(count(lit(1)).as("__c")), Seq(user), "left")
      .agg(min(coalesce(col("__c"), lit(0L))))
      .head().getLong(0)
    require(minNegs >= n,
      s"negativeSampleBounded: a user has only $minNegs < $n negatives in its " +
        s"$probeBuckets/$nBuckets-bucket probe window — raise probeBuckets")
    ranked
  }

  /** BEST-OF-N / REJECTION-SAMPLING SELECTION — the RLHF data-prep step
    * between generation and SFT: of the n scored candidates per prompt,
    * keep the argmax-score one, ties to the smallest candidate id (a
    * total order — reruns and repartitions pick the identical winner),
    * and only when the winner clears `minScore` (a prompt whose BEST
    * candidate is still junk contributes nothing — the rejection half).
    * `score` is any column expression (a reward-model score, a quality
    * gate, a verifier pass-rate). One window per prompt group — the
    * prompt exchange is the only corpus-grain shuffle; emits the full
    * winning row + `score`. */
  def bestOfN(df: DataFrame, promptCol: String, candCol: String,
              score: Column, minScore: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(promptCol))
      .orderBy(col("__s").desc, col(candCol))
    df.withColumn("__s", score)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("__s") >= minScore)
      .drop("__rn")
      .withColumnRenamed("__s", "score")
  }

  /** Split assignment by cumulative percentage cuts (must sum to 100).
    * Adds `bucket` (0-99) and `split` columns; every id maps to exactly one
    * split, forever, on any engine. */
  def splitAssign(df: DataFrame, id: String,
                  cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
                  salt: String = "graft"): DataFrame = {
    require(cuts.map(_._2).sum == 100, s"split cuts must sum to 100: $cuts")
    val b = hashBucket(col(id), salt, 100)
    val boundaries = cuts.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = cuts.zip(boundaries).init.foldRight(lit(cuts.last._1)) {
      case (((name, _), upper), rest) => when(b < upper, name).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", assign)
  }

  /** LEAKAGE-SAFE SPLIT — split assignment at DUPLICATE-CLUSTER grain: two
    * near-identical documents in different cuts are silent eval leakage (a
    * training example that IS the test example up to a typo — the
    * contamination mode per-doc hashing cannot see), so membership must be
    * decided per duplicate GROUP, not per doc. `pairs` is any duplicate
    * pair set (doc_a, doc_b) — exact, MinHash+LSH, SimHash, fuzzy or
    * sorted-neighborhood; clusters are resolved with the O(log d)
    * pointer-jumping components pass ([[Dedup.dupGroups]]), unpaired docs
    * fall through as their own singleton group, and the [[splitAssign]]
    * portable salted hash runs on `group_id`. Every member of a cluster
    * therefore lands in the SAME cut, on any engine, forever; singleton
    * assignments equal plain `splitAssign(df, id)` (same hash, group_id =
    * id), so adopting the leakage-safe form migrates no unpaired doc.
    * Output: df + (group_id, bucket, split); `df` must not already carry
    * that column name. */
  def leakageSafeSplit(df: DataFrame, id: String, pairs: DataFrame,
                       cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
                       salt: String = "graft"): DataFrame = {
    require(!df.columns.contains("group_id"),
      "leakageSafeSplit adds a group_id column; the input already has one")
    val groups = Dedup.dupGroups(pairs).select(col("doc_id").as(id), col("group_id"))
    val withGroup = df.join(groups, Seq(id), "left")
      .withColumn("group_id", coalesce(col("group_id"), col(id)))
    splitAssign(withGroup, "group_id", cuts, salt)
  }

  /** DISTRIBUTED GLOBAL RUNNING SUM over a total order — the primitive
    * behind budget-bounded selection (token budgets, cost quotas, ordered
    * chunk assignment). A naive `Window.orderBy` with no partition key
    * moves the whole corpus into ONE task (Spark even warns); this is the
    * classic two-phase scan instead:
    *
    *  1. range-repartition + sort on the order keys (one shuffle — the
    *     same one any global sort pays), stamp `spark_partition_id`;
    *  2. per-partition partial sums → driver (ONE row per partition —
    *     bounded scheduler-metadata scale, like range boundaries
    *     themselves) → exclusive prefix offsets, broadcast back;
    *  3. per-row running sum = partition offset + within-partition window
    *     sum (each window partition is one range partition — no second
    *     shuffle).
    *
    * The order keys must be a TOTAL order (include a unique tiebreak):
    * range boundaries then cannot split equal keys, and the running sum is
    * identical whatever boundaries the sampler picked. The input is
    * materialized once (localCheckpoint): partials and final rows must see
    * the SAME partitioning, and the sort subtree should not replay.
    *
    * `value` must be INTEGRAL (token counts, byte sizes, row quotas — the
    * budget-selection domain): it is cast to long up front so partial sums,
    * driver offsets, and the output share one exact arithmetic domain; a
    * fractional value would silently truncate instead.
    *
    * Output: input rows + `out` = inclusive running sum of `value` in the
    * global order. */
  def withGlobalRunningSum(df: DataFrame, order: Seq[Column], value: Column,
                           out: String, partitions: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = value.cast("long") // one exact arithmetic domain end-to-end
    val p = if (partitions > 0) partitions
      else df.sparkSession.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val partials = sorted.groupBy(col("__pid"))
      .agg(sum(v).as("__psum"))
      .collect().map(r => r.getInt(0) -> r.getAs[Any]("__psum"))
      .sortBy(_._1)
    // exclusive prefix offsets in partition order (range partitions are
    // ordered by construction; empty partitions simply emit no partial, so
    // offsets are keyed by the pids actually present). Sums accumulate via
    // BigDecimal to stay exact for both long and decimal inputs.
    var acc = BigDecimal(0)
    val offsets = partials.map { case (pid, s) =>
      val off = (pid, acc)
      acc += (if (s == null) BigDecimal(0) else BigDecimal(s.toString))
      off
    }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.map { case (pid, off) => (pid, off.toLong) }
      .toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sorted.join(broadcast(offDf), Seq("__pid"))
      .withColumn(out, (col("__off") + sum(v).over(w)).cast("long"))
      .drop("__pid", "__off")
  }

  /** TOKEN-BUDGET SELECTION — take documents in a deterministic total
    * order until a token budget is exhausted (the "fill the training run"
    * selection every corpus assembly ends with; order by a quality score
    * descending and this is best-first corpus fill). Built on
    * [[withGlobalRunningSum]]; a document is kept iff its INCLUSIVE
    * running token count stays within the budget, so the kept set is a
    * prefix of the global order and re-runs (or re-partitions) can never
    * swap members. `order` may reference any column of `df` (all columns
    * ride through the prefix sum). Output: (id, n_tokens, cum_tokens) for
    * the kept prefix. */
  def tokenBudgetSelect(df: DataFrame, id: String, tokens: Column,
                        order: Seq[Column], budget: Long): DataFrame =
    withGlobalRunningSum(
      df.withColumn("n_tokens", tokens.cast("long")),
      order, col("n_tokens"), "cum_tokens")
      .filter(col("cum_tokens") <= budget)
      .select(col(id), col("n_tokens"), col("cum_tokens"))

  /** PER-GROUP TOKEN QUOTAS — the grouped sibling of [[tokenBudgetSelect]]:
    * within every group (source, language, domain), documents are taken in
    * the given order until that group's budget is exhausted — the corpus
    * REBALANCING selection (cap each source's contribution instead of the
    * global total). No global sort is needed here: the running sum
    * partitions by the group key, so this is ONE window over one shuffle
    * on `group` — each group's prefix is independent and the window state
    * is a single long. Skew caveat: only the OUTPUT is budget-bounded;
    * the window must still sort and scan a skewed group's FULL membership
    * on one task before the cum_tokens filter applies, so per-group
    * compute is linear in group size (a giant group is a straggler, not
    * an OOM — the running sum itself is O(1) state). If giant groups are
    * expected, pre-filter rows that cannot make the cut (e.g. by a
    * per-group approximate quantile on the order key) or two-phase the
    * prefix sum the way [[withGlobalRunningSum]] does across partitions.
    * Output: (id, group, n_tokens, cum_tokens) for the kept prefixes. */
  def groupBudgetSelect(df: DataFrame, id: String, group: String,
                        tokens: Column, orderWithinGroup: Seq[Column],
                        budgetPerGroup: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(group)).orderBy(orderWithinGroup: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetPerGroup)
      .select(col(id), col(group), col("n_tokens"), col("cum_tokens"))
  }
}
