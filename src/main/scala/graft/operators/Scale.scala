package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out machinery: the knobs a 100 TB deployment turns that small-SF
  * correctness tests never force. Each helper is semantics-preserving (its
  * spec asserts equivalence with the naive plan) so it can be applied to any
  * verified query without re-verification.
  */
object Scale {

  /** Process-local memo for BUILD-ONCE plan state — a checkpointed
    * banding, its guard statistics — keyed by a caller-provided corpus
    * fingerprint (the [[graft.operators.StateCache]] discipline applied to
    * in-memory state: banding a static corpus is ingest-phase work, and
    * twin queries or steady-state re-runs should not re-scan, re-hash and
    * re-count the same rows). The CALLER owns the key contract: it must
    * encode the corpus files (fingerprint them, so changed data can never
    * hit a stale entry) AND every parameter that shapes the built value
    * (shingle width, bands, rows, seed, …) — a key that omits a parameter
    * silently serves the other configuration's table. An entry built by a
    * stopped session is rebuilt (checkpointed blocks die with their
    * session). Entries live for the process; one per (corpus, params) —
    * bounded by the corpora a session touches. */
  private val buildMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (SparkSession, Any)]()
  def memo[T](key: String, spark: SparkSession)(build: => T): T = {
    // get-then-put rather than compute(): build runs OUTSIDE the map's
    // lock, so a build may itself call memo (nested keys) without hitting
    // ConcurrentHashMap's recursive-update restriction. The race this
    // admits — two threads building the same key concurrently, last put
    // wins — is benign: builds are idempotent (a checkpointed frame of the
    // same static corpus), so losing the race only re-pays the build once.
    // The map key carries the SESSION IDENTITY, so two live sessions that
    // share a corpus key each keep their own entry instead of thrashing
    // each other's cached frames (checkpointed blocks are session-owned).
    val k = (key, System.identityHashCode(spark))
    val cur = buildMemo.get(k)
    if (cur != null && (cur._1 eq spark)) cur._2.asInstanceOf[T]
    else {
      // a miss is the cheap moment to drop entries owned by stopped
      // sessions — their checkpointed blocks are gone, and purging here
      // bounds growth across many short-lived (e.g. test) sessions
      buildMemo.forEach { (kk, vv) =>
        if (vv._1.sparkContext.isStopped) buildMemo.remove(kk, vv): Unit
      }
      val built: (SparkSession, Any) = (spark, build)
      buildMemo.put(k, built)
      built._2.asInstanceOf[T]
    }
  }

  /** Materialized 1-row `__base` corpus-count frame for the volume guards.
    * EAGER (runs the count job at call time); build it once per static
    * corpus — typically under [[memo]] keyed by the corpus fingerprint —
    * and pass it to [[candidateVolumeGuard]] / [[bandVolumeGuard]] so twin
    * queries and steady-state re-runs share one count scan instead of
    * re-counting the corpus per guarded stage. */
  def baseCountFrame(corpus: DataFrame): DataFrame =
    broadcast(corpus.agg(count(lit(1)).as("__base")).localCheckpoint())

  /** Salted equi-join for skewed fact keys: fact rows get a random salt in
    * [0, salts), the dim side is exploded ×salts, and the join key becomes
    * (key, salt) — a hot key's rows spread over `salts` reducers instead of
    * one straggler. Use when AQE's skew-join split isn't available (e.g. the
    * dim side is too big to broadcast but small enough to replicate ×salts).
    *
    * Semantics-preserving for 1:N joins (each fact row still matches exactly
    * the dim rows of its key, via exactly one salt).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    // right/full outer would emit `salts` copies of unmatched dim rows (the
    // dim side is replicated) — reject rather than silently multiply.
    // semi/anti are safe: a fact row's salt always has a full dim replica,
    // so existence semantics are preserved and no dim rows are emitted.
    require(Set("inner", "left", "left_outer", "leftouter",
        "left_semi", "leftsemi", "semi", "left_anti", "leftanti", "anti")
        .contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left/semi/anti joins only, got $joinType")
    val saltedFact = fact.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Pre-aggregate before a skewed global aggregation: aggregate on
    * (key, salt) first — map-side-combine style — then merge partials on
    * key. Catalyst already does this for algebraic aggregates; this explicit
    * form is for aggregates where the partial state must stay bounded per
    * task (e.g. collect_set on a hot key). */
  def twoLevelAgg(df: DataFrame, key: String, salts: Int,
                  partial: Seq[Column], merge: Seq[Column]): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * salts).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(merge.head, merge.tail: _*)

  /** Salted SELF-join for banded candidate generation — the skew guard the
    * LSH band joins need that [[saltedJoin]] (fact×dim) can't provide. A
    * band-key self-join's task size is quadratic in the band's membership,
    * so ONE hot band (a boilerplate shingle shared corpus-wide, a
    * degenerate hyperplane region) becomes a single m²-pair straggler task
    * at scale while every other reducer idles — and AQE's skew split can't
    * help, because splitting ONE side of a self-join still replays the
    * whole other side of the key into each split.
    *
    * The guard: a first pass counts band membership (one map-side-combined
    * shuffle of (key, 1) rows); bands at or above `hotMin` members take the
    * salted route — each member lands in ONE of `salts` sub-buckets by a
    * secondary hash of its id, the right side is replicated ×`salts`, and
    * the join key becomes (band, salt), so the hot band's m² pairs spread
    * over `salts` reducers (each ~m²/salts) instead of one. Cold bands
    * join exactly as before, paying nothing.
    *
    * Pair-set identity (spec-asserted in ScaleSpec, and the gated queries
    * run against the SAME exhaustive oracles as their unsalted twins): an
    * unordered pair {a, b} in a hot band appears exactly once before the
    * final distinct — the left row for a (salt = h(a)) meets b's replica at
    * h(a); b's left row meets a's replica at h(b) but emits (b, a), which
    * the a < b filter drops — mirroring the unsalted join's own dedup.
    *
    * Cost model: the replicated side is ONLY the hot-band rows (≤ n·bands
    * rows with ≥ hotMin-member keys), so replication is bounded by
    * salts × |hot rows|, and |hot keys| ≤ |banded| / hotMin by pigeonhole —
    * which is why the hot-key list is broadcastable at production hotMin.
    * `banded` is localCheckpoint'ed: it feeds the size count plus both the
    * hot and cold splits (the minhashDupPairs multi-consumer discipline).
    *
    * `banded` must carry one row per (idCol, keyCol) membership; output is
    * the distinct (aName < bName) candidate pairs. */
  def saltedBandSelfJoin(banded: DataFrame, idCol: String, keyCol: String,
                         aName: String, bName: String,
                         salts: Int, hotMin: Int,
                         inputMaterialized: Boolean = false): DataFrame = {
    require(salts >= 2 && hotMin >= 2,
      s"need salts >= 2 and hotMin >= 2, got salts=$salts hotMin=$hotMin")
    // `inputMaterialized = true` skips the internal checkpoint: callers
    // whose banded frame already sits on a localCheckpoint (e.g. the
    // bandVolumeGuard chain, a constant-cost filter over materialized
    // rows) would otherwise pay a second full materialization of the same
    // data (measured ~+1s on the sf0.1 salted dedup board row).
    val b0 = banded.select(col(idCol), col(keyCol))
    val b = if (inputMaterialized) b0 else b0.localCheckpoint()
    // materialized: consumed by FOUR joins (hot/cold × left/right) — left
    // lazy, the count aggregate and its shuffle replay once per consumer
    // (the plan showed 4 identical HashAggregate+Exchange subtrees). The
    // frame is |keys with >= hotMin members| rows — bounded by
    // |banded|/hotMin (pigeonhole), the same bound that makes it
    // broadcastable.
    val hotKeys = b.groupBy(col(keyCol)).agg(count(lit(1)).as("__bn"))
      .filter(col("__bn") >= hotMin).select(col(keyCol)).localCheckpoint()
    val hot = b.join(broadcast(hotKeys), Seq(keyCol), "left_semi")
    val cold = b.join(broadcast(hotKeys), Seq(keyCol), "left_anti")
    val coldPairs = cold.select(col(idCol).as(aName), col(keyCol))
      .join(cold.select(col(idCol).as(bName), col(keyCol)), keyCol)
      .filter(col(aName) < col(bName))
      .select(col(aName), col(bName))
    // deterministic secondary hash — NOT rand(): both join sides must see
    // the same salt for a given id, and reruns must reproduce the pair set
    val sl = hot.withColumn("__salt", pmod(xxhash64(col(idCol)), lit(salts.toLong)))
    val sr = hot.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts.toLong - 1L))))
    // SHUFFLE_HASH is the point of the construction, so it is pinned, not
    // left to the planner: partitioning by (band, salt) is what spreads a
    // hot band's m² pairs over `salts` reducers. Left free, the planner
    // picks broadcast (replicated side under the threshold locally —
    // measured 2× slower here: one giant probe map against ~500-match keys
    // beats per-partition maps on neither cache locality nor build cost)
    // or sort-merge at scale (per-key group buffering — the exact straggler
    // shape the salt exists to break). The hint sits on the UNEXPLODED
    // side (sl): the hinted side becomes the SHJ build side, and a
    // (band, salt) partition of sl holds ~m/salts rows where the exploded
    // sr holds the full hot-band membership m — building on sl costs
    // salts× less memory for identical output.
    val hotPairs = sl.select(col(idCol).as(aName), col(keyCol), col("__salt"))
      .hint("shuffle_hash")
      .join(sr.select(col(idCol).as(bName), col(keyCol), col("__salt")),
        Seq(keyCol, "__salt"))
      .filter(col(aName) < col(bName))
      .select(col(aName), col(bName))
    coldPairs.union(hotPairs).distinct()
  }

  /** IN-PLAN CANDIDATE-VOLUME AUDIT for banded/bucketed pair generators:
    * every row of `cand` is gated on `|cand| <= factor × |corpus|`, and the
    * plan `raise_error`s — fails the job loudly — the moment a
    * candidate-generation stage regresses toward all-pairs (a degenerate
    * LSH band region, a duplicate-saturated corpus, an under-banded
    * configuration). The LSH scale contract is "linear in n with a
    * constant"; this makes the contract EXECUTABLE: at 100 TB an
    * accidental all-hot corpus raises instead of silently running ×100
    * pair volume (the measured Tier-B blow-up in SCALE_PROBE.md is the
    * motivation). The counts ride one broadcast-crossJoin'ed single-row
    * frame, so the per-row guard is a constant comparison; `cand` should
    * already be materialized by the caller (it feeds the count AND the
    * downstream verify). Semantics-preserving while silent: when the cap
    * holds, output ≡ input (the oracle gates stay hash-green).
    *
    * `baseCount` (optional) is a precomputed 1-row `__base` corpus-count
    * frame — pass [[baseCountFrame]]'s (possibly memoized) result so twin
    * queries over the same static corpus don't re-run the count scan. */
  def candidateVolumeGuard(cand: DataFrame, corpus: DataFrame,
                           factor: Double, what: String,
                           baseCount: Option[DataFrame] = None): DataFrame = {
    require(factor > 0, s"factor must be positive, got $factor")
    val outCols = cand.columns
    // the 1-row stats frame is materialized once: the guarded output is
    // typically consumed by several downstream joins (doc restriction +
    // verify), and an un-checkpointed stats subtree would re-run both
    // count aggregates per consumer (measured: +0.5-0.8 s per LSH query
    // when left lazy — the broadcast subtrees are NOT exchange-reused
    // across consumer plans)
    val stats = broadcast(cand.agg(count(lit(1)).as("__cand"))
      .crossJoin(baseCount.getOrElse(corpus.agg(count(lit(1)).as("__base"))))
      .localCheckpoint())
    cand.crossJoin(stats)
      .filter(when(col("__cand").cast("double") <=
          lit(factor) * col("__base").cast("double"), lit(true))
        .otherwise(raise_error(concat(
          lit(s"$what: candidate volume exceeds $factor x corpus size: "),
          col("__cand").cast("string"), lit(" candidates for "),
          col("__base").cast("string"), lit(" rows. If this corpus is "),
          lit("legitimately duplicate-saturated, raise the cap (e.g. "),
          lit("maxCandidatesPerDoc = Some(higher)) or disable it with "),
          lit("maxCandidatesPerDoc = None"))).cast("boolean")))
      .select(outCols.map(col): _*)
  }

  /** PRE-JOIN band-population gate — the upstream half of the candidate
    * audit. [[candidateVolumeGuard]] counts candidates AFTER the band
    * self-join, which on a truly all-hot 100 TB corpus means the m²-pair
    * shuffle has already run (and likely died) before the count can
    * compare. This guard reads only the BANDED rows (linear): per-band
    * populations m give Σ m(m−1)/2 pair slots, and since a unique pair
    * collides in at most `bands` bands, `slots > factor·n·bands` PROVES
    * `uniqueCandidates > factor·n` — so the raise here is sound (never
    * fires when the post-join gate wouldn't) and fires on the join's
    * INPUT rows, before any pair row exists. It under-fires when
    * collisions are sparse (slots ≈ unique), which is exactly when the
    * join is survivable and the post-join gate backstops. Callers should
    * pass a materialized `banded` (it feeds this stats pass AND both join
    * sides). `baseCount` (optional) is a precomputed 1-row `__base`
    * corpus-count frame (see [[baseCountFrame]]) so twin queries over the
    * same static corpus share one count scan. */
  def bandVolumeGuard(banded: DataFrame, keyCol: String, corpus: DataFrame,
                      factor: Double, bands: Int, what: String,
                      baseCount: Option[DataFrame] = None): DataFrame = {
    val outCols = banded.columns
    val slots = banded.groupBy(col(keyCol)).agg(count(lit(1)).as("__m"))
      .agg(coalesce(sum(col("__m").cast("double") * (col("__m") - 1).cast("double") / 2),
        lit(0.0)).as("__slots"))
    val stats = broadcast(slots
      .crossJoin(baseCount.getOrElse(corpus.agg(count(lit(1)).as("__base"))))
      .localCheckpoint())
    banded.crossJoin(stats)
      .filter(when(col("__slots") <=
          lit(factor) * col("__base").cast("double") * lit(bands.toDouble), lit(true))
        .otherwise(raise_error(concat(
          lit(s"$what: projected band candidates exceed $factor x corpus "),
          lit(s"(pre-join bound over $bands bands): "),
          col("__slots").cast("string"), lit(" pair slots for "),
          col("__base").cast("string"), lit(" rows. If this corpus is "),
          lit("legitimately duplicate-saturated, raise the cap (e.g. "),
          lit("maxCandidatesPerDoc = Some(higher)) or disable it with "),
          lit("maxCandidatesPerDoc = None"))).cast("boolean")))
      .select(outCols.map(col): _*)
  }

  /** Write a bucketed+sorted table: joins and aggregations on the bucket key
    * become shuffle-free (co-located) for every downstream reader — the
    * standard layout for a fact table that is joined on the same key by many
    * queries. Requires a metastore-backed table (saveAsTable). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Lake layout writer: partition pruning for free on `partitionCols`
    * (ingest date, topic, …) — the file-level analog of predicate pushdown.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Advisory repartition before a wide write so output files are ~target
    * size instead of one file per (possibly tiny) task. */
  def compactTo(df: DataFrame, targetPartitions: Int): DataFrame =
    df.repartition(targetPartitions)

  /** Small-file compaction of an existing parquet directory — the lake
    * maintenance job every streaming sink eventually needs (a micro-batch
    * sink writing N files per trigger turns a table into millions of
    * KB-files whose open/footer cost dominates every scan). Rewrites the
    * dir to ⌈bytes/targetBytes⌉ files and publishes by the same crash-safe
    * rename-aside swap as the streaming sinks: readers never see a
    * half-compacted table, and a crash at any point leaves either the old
    * or the new layout, never neither. Returns the output file count. */
  def compactDir(spark: SparkSession, path: String,
                 targetBytes: Long = 128L * 1024 * 1024): Int = {
    val p = new org.apache.hadoop.fs.Path(path)
    val old = new org.apache.hadoop.fs.Path(path + "_old")
    val next = new org.apache.hadoop.fs.Path(path + "_next")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash repair BEFORE doing anything (the same recoverSwap protocol as
    // the streaming sinks — without it the "either old or new layout"
    // claim is false in the window between the two renames):
    //  - table missing + _next present ⇒ crash mid-swap; _next is a
    //    complete compacted copy — publish it;
    //  - table present + _next present ⇒ crash before the swap started —
    //    drop the stale copy; leftover _old is debris either way (and
    //    must not survive into our rename(p, old), which would nest).
    if (fs.exists(next)) {
      if (!fs.exists(p)) {
        if (!fs.rename(next, p))
          throw new java.io.IOException(s"compactDir: recovery failed to publish $next")
      } else fs.delete(next, true): Unit
    } else if (!fs.exists(p) && fs.exists(old)) {
      // crash between move-aside and the _next write finishing its rename
      // chain cannot occur (write happens before any rename), but a crash
      // immediately after delete(next-recovery branch above) can leave a
      // lone _old: restore it rather than lose the table
      if (!fs.rename(old, p))
        throw new java.io.IOException(s"compactDir: recovery failed to restore $old")
    }
    fs.delete(old, true): Unit
    val bytes = fs.getContentSummary(p).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    spark.read.parquet(path).repartition(parts)
      .write.mode("overwrite").parquet(path + "_next")
    if (!fs.rename(p, old))
      throw new java.io.IOException(s"compactDir: failed to move $p aside")
    if (!fs.rename(next, p))
      throw new java.io.IOException(s"compactDir: failed to publish $next")
    fs.delete(old, true): Unit
    parts
  }

  /** Range-clustered write: rows are range-partitioned AND sorted within
    * partitions on `cols`, so each output file covers a disjoint slice of
    * the key space and its parquet min/max footer stats actually prune —
    * a point/range predicate on `cols` skips every non-overlapping file at
    * planning time (data skipping). Without the clustering, every file's
    * min/max spans the whole domain and the stats prune nothing. This is
    * the single-dimension form of Z-ordering; for multi-column skipping
    * interleave the key bits first. */
  def writeRangeClustered(df: DataFrame, path: String, cols: Seq[String],
                          files: Int): Unit =
    df.repartitionByRange(files, cols.map(col): _*)
      .sortWithinPartitions(cols.map(col): _*)
      .write.mode("overwrite").parquet(path)

  /** Z-value of up to four numeric columns: each column is min/max-scaled
    * to a 16-bit code and the codes' bits are INTERLEAVED (Morton order),
    * so nearby z-values are nearby in EVERY dimension at once. The scaling
    * bounds come in as literals (one tiny agg upstream) so the expression
    * stays pure-codegen per row. */
  def zValue(codes: Seq[(Column, Double, Double)]): Column = {
    require(codes.nonEmpty && codes.size <= 4,
      s"zValue interleaves 1-4 columns, got ${codes.size}")
    val n = codes.size
    val scaled = codes.map { case (c, lo, hi) =>
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      // clamp handles out-of-range stragglers (e.g. data appended after
      // the bounds were sampled) instead of wrapping their bits
      least(greatest(floor((c.cast("double") - lit(lo)) / lit(span) * 65535.0)
        .cast("long"), lit(0L)), lit(65535L))
    }
    (0 until 16).flatMap { bit =>
      scaled.zipWithIndex.map { case (s, j) =>
        shiftleft(shiftright(s, bit).bitwiseAND(lit(1L)), bit * n + j)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** HILBERT clustering key (2 columns) — [[zValue]]'s locality-tighter
    * sibling: the same 16-bit scaled cell codes, walked by the order-16
    * Hilbert curve ([[graft.plans.HilbertXy]]) instead of bit
    * interleaving. Consecutive Hilbert indexes are always grid-ADJACENT
    * cells (unit Manhattan step — spec-pinned by exhaustive small-order
    * enumeration), where the Morton curve jumps 2^k cells at every
    * quadrant seam, so range-partitioned files cover jump-free blocks:
    * tighter per-file min/max extents on BOTH dimensions for the same
    * one-range-shuffle write cost. Per-row codegen expression; clamping
    * and bounds semantics identical to [[zValue]]. */
  def hilbertValue(xc: (Column, Double, Double), yc: (Column, Double, Double)): Column = {
    graft.plans.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    def code(t: (Column, Double, Double)): Column = {
      val (c, lo, hi) = t
      val span = math.max(hi - lo, java.lang.Double.MIN_NORMAL)
      least(greatest(floor((c.cast("double") - lit(lo)) / lit(span) * 65535.0)
        .cast("long"), lit(0L)), lit(65535L))
    }
    call_function("hilbert_xy", code(xc), code(yc))
  }

  /** [[writeZOrdered]] along the Hilbert curve (2 clustering columns). */
  def writeHilbertOrdered(df: DataFrame, path: String,
                          xCol: String, yCol: String, files: Int): Unit = {
    val bounds = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    require(!bounds.anyNull,
      "writeHilbertOrdered: empty input or all-null clustering column — no bounds")
    df.withColumn("__h", hilbertValue(
        (col(xCol), bounds.getDouble(0), bounds.getDouble(1)),
        (col(yCol), bounds.getDouble(2), bounds.getDouble(3))))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions(col("__h"))
      .drop("__h")
      .write.mode("overwrite").parquet(path)
  }

  /** Z-ORDERED write — multi-column data skipping: rows are clustered
    * along the Morton curve of `cols`, so each output file covers a small
    * HYPER-RECTANGLE of the key space rather than a thin slice of one
    * column. Parquet min/max footer stats then prune files for predicates
    * on ANY of the clustered columns (a single-column range-cluster prunes
    * only its own column; with F files and c columns, a z-ordered file's
    * per-dimension extent shrinks ~F^(-1/c) of the domain). Bounds are one
    * cheap min/max aggregate over the input; the z-value itself is a
    * per-row codegen expression, and the layout is one range shuffle —
    * exactly the cost of the single-column writer. */
  def writeZOrdered(df: DataFrame, path: String, cols: Seq[String],
                    files: Int): Unit = {
    val aggs = cols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val bounds = df.agg(aggs.head, aggs.tail: _*).head()
    require(!bounds.anyNull,
      "writeZOrdered: empty input or all-null clustering column — no bounds")
    val codes = cols.zipWithIndex.map { case (c, i) =>
      (col(c), bounds.getDouble(2 * i), bounds.getDouble(2 * i + 1))
    }
    df.withColumn("__z", zValue(codes))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }
}
