package graft

import org.apache.spark.sql.functions._
import graft.operators.{Corpus, Dedup, Fuzzy, PqIndex, Recursion, Sampling, Similarity, TextAnalysis}

/** Training-data pipeline queries (dedup, similarity search, text analysis)
  * with DuckDB oracles. Same determinism rules as [[Queries]]; count-typed
  * outputs are cast to long because Spark `size`/`length` yield int32 while
  * DuckDB `len` yields int64.
  */
object QueriesExtras {

  /** Shared oracle CTE: distinct word 5-gram shingles per document —
    * mirrors Dedup.shingles(n=5) exactly (same tokenizer, same slice). */
  // Corpus contract for every '\s+' tokenizer below: text carries no
  // vertical tab (\x0B) — the one character where Java's \s (Spark) and
  // RE2's \s (DuckDB) disagree. Holds for all driver testdata (verified at
  // every sf); a corpus that can violate it needs the explicit class
  // "[ \t\n\f\r]+" on BOTH sides.
  private[graft] val ShingleBaseCte =
    "WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
    // position table sized from the CORPUS (max words + 1), so there is no
    // hard-coded bound to go stale: longer documents automatically widen
    // the table, exactly like the unbounded Spark side
    "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
    "sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i+4), ' ') AS g " +
    "FROM words JOIN pos ON pos.i <= len(w) - 4), " +
    "sizes AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id), "

  private val ShingleCte = ShingleBaseCte +
    "pairs AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter " +
    "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2) "

  private val JaccardPairsSql = ShingleCte +
    "SELECT doc_a, doc_b, CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) AS jaccard " +
    "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
    "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0 " +
    "ORDER BY doc_a, doc_b"

  private val qDedupExact = Q(
    (s, d) => Dedup.exactDedup(Tables.load(s, d, "documents"), "doc_id", "text")
      .orderBy(col("keep_id")),
    Some("SELECT md5(lower(trim(text))) AS fp, min(doc_id) AS keep_id, count(*) AS n_copies " +
      "FROM documents GROUP BY 1 ORDER BY keep_id"))

  private val qDedupNgramPairs = Q(
    (s, d) => Dedup.jaccardPairs(
        Dedup.shingles(Tables.load(s, d, "documents"), "doc_id", "text", 5),
        "doc_id", 0.8)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(JaccardPairsSql))

  /** Same semantics and oracle as q_dedup_ngram_pairs via PREFIX
    * FILTERING ([[Dedup.prefixJaccardPairs]]) — exact by construction
    * (the prefix-filter lemma), unlike the probabilistic LSH twin below:
    * three independent plans, one truth. */
  private val qDedupPrefixJaccard = Q(
    (s, d) => Dedup.prefixJaccardPairs(Tables.load(s, d, "documents"),
        "doc_id", "text", n = 5, threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(JaccardPairsSql))

  /** DIRECTED CONTAINMENT dedup ([[Dedup.prefixContainmentPairs]]):
    * |A∩B|/|A| ≥ 0.8 over the same 5-gram shingles — the partial-copy
    * signal symmetric Jaccard structurally misses (a paragraph quoted
    * inside a long document has containment ≈ 1, Jaccard ≈ 0). Exact by
    * the containment prefix-filter lemma (floor-based prefix length — see
    * the operator scaladoc for the FP-safety argument); the oracle is the
    * exhaustive directed shingle join. Every mutual near-dup from the
    * Jaccard family shows up here in BOTH orientations (containment ≥
    * jaccard pointwise), so the row also cross-checks that family. */
  private val qDedupContainment = Q(
    (s, d) => Dedup.prefixContainmentPairs(Tables.load(s, d, "documents"),
        "doc_id", "text", n = 5, threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(ShingleBaseCte +
      "dp AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter " +
      "FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id <> b.doc_id GROUP BY 1, 2) " +
      "SELECT doc_a, doc_b, CAST(inter AS DOUBLE)/sa.sz AS containment " +
      "FROM dp JOIN sizes sa ON sa.doc_id = doc_a " +
      "WHERE CAST(inter AS DOUBLE)/sa.sz >= 0.8e0 " +
      "ORDER BY doc_a, doc_b"))

  /** ROUGE-2 over lang-adjacent document pairs
    * ([[TextAnalysis.rougeN]]): each doc scored against the next doc_id
    * in its language — the deterministic stand-in for a
    * (candidate, reference) eval table. Exact clipped-multiset bigram
    * overlap (Lin 2004): one melted count aggregation computes both
    * sides' per-gram counts and the clipped min together (no per-side
    * frames, no self-join), one per-pair rollup — two shuffles. Zero-gram
    * sides score 0 by the standard convention; ratios rounded to 6 (the
    * cosine discipline). The oracle replays tokenize → bigrams (no
    * distinct — ROUGE is a MULTISET metric, unlike the shingle CTEs) →
    * full-outer per-gram counts → clipped rollup, with F1 composed from
    * the same unrounded p/r expressions in the same operation order. */
  private val qRouge2 = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.load(s, d, "documents")
      // pair KEYS through the per-lang window, texts joined back after:
      // a window that carried both text columns would sort the whole
      // corpus into |langs| partitions (measured 7.0 s vs 1.x for this
      // form at sf0.1) — the id-only window moves 16 bytes/row and the
      // wide text joins run at full shuffle parallelism
      val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
      val pairKeys = docs.select(col("lang"), col("doc_id"))
        .select(col("doc_id").as("cand_id"),
          lead(col("doc_id"), 1).over(w).as("ref_id"))
        .filter(col("ref_id").isNotNull)
      val pairs = pairKeys
        .join(docs.select(col("doc_id").as("cand_id"),
          col("text").as("cand_text")), "cand_id")
        .join(docs.select(col("doc_id").as("ref_id"),
          col("text").as("ref_text")), "ref_id")
      TextAnalysis.rougeN(pairs, Seq("cand_id", "ref_id"),
          "cand_text", "ref_text", n = 2)
        .orderBy(col("cand_id"))
    },
    Some("WITH prs AS (SELECT doc_id AS cand_id, " +
      "lead(doc_id) OVER w AS ref_id, text AS cand_text, " +
      "lead(text) OVER w AS ref_text FROM documents " +
      "WINDOW w AS (PARTITION BY lang ORDER BY doc_id)), " +
      "pp AS (SELECT * FROM prs WHERE ref_id IS NOT NULL), " +
      "ctk AS (SELECT cand_id, list_filter(string_split_regex(trim(cand_text), '\\s+'), t -> t <> '') AS w FROM pp), " +
      "rtk AS (SELECT cand_id, list_filter(string_split_regex(trim(ref_text), '\\s+'), t -> t <> '') AS w FROM pp), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 " +
      "FROM (SELECT w FROM ctk UNION ALL SELECT w FROM rtk) u))) AS i), " +
      "cg AS (SELECT cand_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g FROM ctk JOIN pos ON pos.i <= len(w) - 1), " +
      "rg AS (SELECT cand_id, array_to_string(list_slice(w, i, i + 1), ' ') AS g FROM rtk JOIN pos ON pos.i <= len(w) - 1), " +
      "cc AS (SELECT cand_id, g, count(*) AS nc FROM cg GROUP BY 1, 2), " +
      "rc AS (SELECT cand_id, g, count(*) AS nr FROM rg GROUP BY 1, 2), " +
      "j AS (SELECT COALESCE(cc.cand_id, rc.cand_id) AS cand_id, " +
      "COALESCE(cc.nc, 0) AS nc, COALESCE(rc.nr, 0) AS nr " +
      "FROM cc FULL OUTER JOIN rc ON cc.cand_id = rc.cand_id AND cc.g = rc.g), " +
      "agg AS (SELECT cand_id, SUM(LEAST(nc, nr)) AS clipped, " +
      "SUM(nc) AS ctot, SUM(nr) AS rtot FROM j GROUP BY 1) " +
      "SELECT p.cand_id, p.ref_id, " +
      "round(CASE WHEN COALESCE(ctot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(ctot AS DOUBLE) ELSE 0.0e0 END, 6) AS \"precision\", " +
      "round(CASE WHEN COALESCE(rtot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(rtot AS DOUBLE) ELSE 0.0e0 END, 6) AS recall, " +
      "round(CASE WHEN (CASE WHEN COALESCE(ctot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(ctot AS DOUBLE) ELSE 0.0e0 END) + " +
      "(CASE WHEN COALESCE(rtot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(rtot AS DOUBLE) ELSE 0.0e0 END) > 0 " +
      "THEN 2.0e0 * (CASE WHEN COALESCE(ctot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(ctot AS DOUBLE) ELSE 0.0e0 END) * " +
      "(CASE WHEN COALESCE(rtot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(rtot AS DOUBLE) ELSE 0.0e0 END) / " +
      "((CASE WHEN COALESCE(ctot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(ctot AS DOUBLE) ELSE 0.0e0 END) + " +
      "(CASE WHEN COALESCE(rtot, 0) > 0 THEN CAST(clipped AS DOUBLE)/CAST(rtot AS DOUBLE) ELSE 0.0e0 END)) " +
      "ELSE 0.0e0 END, 6) AS f1 " +
      "FROM pp p LEFT JOIN agg a ON a.cand_id = p.cand_id ORDER BY p.cand_id"))

  /** Shared banding-cache key for the MinHash-LSH document twins (plain,
    * salted, groups, provenance): fingerprints the documents FILES plus
    * the banding parameters — see [[graft.operators.Scale.memo]]. */
  private def docBandKey(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/documents.parquet", "minhashband|n=5|h=128|b=32|r=4")

  /** Same semantics as q_dedup_ngram_pairs — and the same oracle — but via
    * the MinHash+LSH scale path (P(missed pair | j>=0.8) ≈ 5e-8). */
  private val qDedupMinhashLsh = Q(
    (s, d) => Dedup.nearDupPairs(Tables.load(s, d, "documents"),
        "doc_id", "text", 5, 0.8, bandedCacheKey = Some(docBandKey(s, d)))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(JaccardPairsSql))

  /** [[Dedup.nearDupPairsSalted]] — the HOT-BAND SKEW GUARD twin of
    * q_dedup_minhash_lsh, against the SAME exact-Jaccard oracle (the
    * q_j1_linkage_salted pattern extended to banded self-joins: the gate
    * itself proves salting is semantics-preserving). hotMin is set LOW
    * here (4) so the gate actually exercises the salted route at test sf —
    * the duplicate clusters' shared band keys all cross it — while cold
    * bands keep taking the plain join; production uses a hotMin sized to
    * the reducer budget (default 4096), where by pigeonhole the hot-key
    * list is ≤ |banded|/4096 rows and broadcastable. */
  private val qDedupMinhashLshSalted = Q(
    (s, d) => Dedup.nearDupPairsSalted(Tables.load(s, d, "documents"),
        "doc_id", "text", 5, 0.8, salts = 4, hotMin = 4,
        bandedCacheKey = Some(docBandKey(s, d)))
      .orderBy(col("doc_a"), col("doc_b")),
    Some(JaccardPairsSql))

  /** The INCREMENTAL near-dup path over N arriving batches ≡ the batch
    * LSH oracle: the corpus is split into 4 deterministic micro-batches
    * (doc_id mod 4) and fed through the persisted signature-index sink
    * ([[graft.streaming.Streaming.incrementalNearDupSink]]: new docs join
    * their band keys against keys derived from new ∪ indexed signatures,
    * exact-verify, append);
    * the accumulated pairs state must equal the all-at-once
    * q_dedup_minhash_lsh result — same exact-Jaccard SQL oracle. The
    * state build is ingest-phase work (like the IVF index): built once
    * per (corpus, params) via [[graft.operators.StateCache]] and reused
    * across calls AND JVMs, so gate and bench execute the pairs
    * read-back against published state. Incremental
    * completeness argument: a pair (a,b) with a arriving before b is
    * found in b's batch — b's new keys join against the index that
    * already holds a's keys — and same-batch pairs join within newKeys;
    * the same ~5e-8 LSH miss probability as the batch twin applies. */
  private val qNeardupIncremental = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
      val stateDir = graft.operators.StateCache.ensure(s,
        s"$d/documents.parquet", s"$d|n=5|t=0.8|batches=4|state=sigs",
        "graft-incdedup", Seq("sigs", "pairs")) { tmp =>
        (0L until 4L).foreach(b => graft.streaming.Streaming.incrementalNearDupSink(
          "doc_id", "text", tmp, ngram = 5, threshold = 0.8)(
          docs.filter(col("doc_id") % 4 === b), b))
        // the sink commits sigs by MOVING staged part files (no Spark
        // write job → no _SUCCESS marker), but StateCache detects a
        // published build by that marker — stamp it, or every call
        // re-ingests the corpus
        val fs = new org.apache.hadoop.fs.Path(tmp)
          .getFileSystem(s.sparkContext.hadoopConfiguration)
        fs.create(new org.apache.hadoop.fs.Path(s"$tmp/sigs/_SUCCESS"), true).close()
      }
      s.read.parquet(s"$stateDir/pairs")
        .select(col("doc_a"), col("doc_b"), col("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    Some(JaccardPairsSql))

  /** Duplicate-CLUSTER resolution over the exact near-dup pairs: connected
    * components via distributed min-label propagation
    * ([[Dedup.dupGroups]]). The oracle computes the same components with a
    * recursive CTE (min id reachable in the undirected pair graph), so the
    * gate verifies the iterative distributed loop against a closed-form
    * fixpoint — chains A~B, B~C must collapse to one group on both sides. */
  private val qDedupGroups = Q(
    (s, d) => Dedup.dupGroups(
        Dedup.jaccardPairs(
          Dedup.shingles(Tables.load(s, d, "documents"), "doc_id", "text", 5),
          "doc_id", 0.8))
      .orderBy(col("doc_id")),
    Some("WITH RECURSIVE " + ShingleCte.stripPrefix("WITH ") +
      ", jp AS (SELECT doc_a, doc_b " +
      "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM jp UNION ALL SELECT doc_b, doc_a FROM jp), " +
      "reach(id, r) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id) " +
      "SELECT id AS doc_id, min(r) AS group_id FROM reach GROUP BY id ORDER BY doc_id"))

  /** Duplicate PROVENANCE over the same exact near-dup pairs — Spark 4's
    * engine-native `WITH RECURSIVE` ([[Recursion.dupProvenance]]): each doc
    * with an earlier near-dup gets the min id transitively reachable
    * through smaller-id near-dups (`origin_id`) and its shortest
    * derivation length (`hops`) — the lineage dupGroups' label propagation
    * discards. The id-oriented pair graph makes the `UNION ALL` walk a
    * strictly-decreasing DAG traversal (terminates structurally; Spark has
    * no distinct-mode recursion). The oracle is the IDENTICAL recursion in
    * DuckDB over the shingle-derived pairs — both engines execute the same
    * recursive SQL, the strongest cross-engine pin the surface allows. */
  private val qDupProvenance = Q(
    (s, d) => Recursion.dupProvenance(s,
        Dedup.jaccardPairs(
          Dedup.shingles(Tables.load(s, d, "documents"), "doc_id", "text", 5),
          "doc_id", 0.8))
      .orderBy(col("doc_id")),
    Some("WITH RECURSIVE " + ShingleCte.stripPrefix("WITH ") +
      ", jp AS (SELECT doc_a, doc_b " +
      "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0), " +
      "walk(doc_id, anc, hops) AS (SELECT doc_b, doc_a, CAST(1 AS BIGINT) FROM jp " +
      "UNION ALL SELECT w.doc_id, p.doc_a, w.hops + 1 FROM walk w JOIN jp p ON p.doc_b = w.anc), " +
      "origin AS (SELECT doc_id, min(anc) AS origin_id FROM walk GROUP BY doc_id) " +
      "SELECT o.doc_id, o.origin_id, min(w.hops) AS hops " +
      "FROM origin o JOIN walk w ON w.doc_id = o.doc_id AND w.anc = o.origin_id " +
      "GROUP BY o.doc_id, o.origin_id ORDER BY o.doc_id"))

  /** The SCALE composition for provenance: MinHash+LSH banded candidates
    * feed the SAME recursion against the SAME oracle as the
    * exhaustive-pairs form — the provenance analogue of
    * [[qDedupGroupsLsh]], proving band + verify + recursive walk compose
    * without changing lineage semantics (the production pair path at
    * corpus scale is always the banded one). */
  private val qDupProvenanceLsh = Q(
    (s, d) => Recursion.dupProvenance(s,
        Dedup.nearDupPairs(Tables.load(s, d, "documents"),
          "doc_id", "text", 5, 0.8, bandedCacheKey = Some(docBandKey(s, d))))
      .orderBy(col("doc_id")),
    qDupProvenance.sql)

  /** Shared spine oracle: the recursive day densification (DuckDB executes
    * the same recursion both Spark forms must reproduce). */
  private val SpineOracleSql =
    "WITH RECURSIVE bounds AS (SELECT user_id, " +
      "min(CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) AS d0, " +
      "max(CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT)) AS d1 " +
      "FROM events GROUP BY user_id), " +
      "spine(user_id, day, d1) AS (SELECT user_id, d0, d1 FROM bounds " +
      "UNION ALL SELECT user_id, day + 1, d1 FROM spine WHERE day < d1), " +
      "counts AS (SELECT user_id, CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day, " +
      "count(*) AS n FROM events GROUP BY 1, 2) " +
      "SELECT s.user_id, s.day, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_events " +
      "FROM spine s LEFT JOIN counts c ON c.user_id = s.user_id AND c.day = s.day " +
      "ORDER BY s.user_id, s.day"

  /** Day-grain DENSIFICATION (gap filling) of the events stream — the
    * production single-pass form ([[Recursion.activitySpine]]:
    * `sequence(d0, d1)` exploded + day-count left join; rows = Σ span
    * days, group-key shuffles only). Epoch-day integers, the
    * q_cohort_retention convention. */
  private val qActivitySpine = Q(
    (s, d) => Recursion.activitySpine(
        Tables.load(s, d, "events"), "user_id", "ts")
      .orderBy(col("user_id"), col("day")),
    Some(SpineOracleSql))

  /** The SAME densification as an engine-native recursive CTE
    * ([[Recursion.activitySpineRecursive]]) against the SAME oracle — one
    * `day + 1` level per union-loop iteration, bounded by the max span
    * (29 days in every driver sf; `spark.sql.cteRecursionLevelLimit`
    * defaults to 100). Pins that Spark recursion ≡ sequence+explode ≡
    * DuckDB recursion on real data; production densification stays with
    * [[qActivitySpine]]'s form. */
  private val qActivitySpineRecursive = Q(
    (s, d) => Recursion.activitySpineRecursive(s,
        Tables.load(s, d, "events"), "user_id", "ts")
      .orderBy(col("user_id"), col("day")),
    Some(SpineOracleSql))

  /** LINEAR GAP INTERPOLATION ([[Recursion.interpolateDaily]]): the
    * feature-engineering step after densification — event-less days
    * inside a user's span fill by the straight line between the nearest
    * observed days, edges stay null (no extrapolation). Daily totals
    * aggregate as exact DECIMAL before ONE double conversion; the oracle
    * mirrors the spine, the ignoreNulls nearest-observation windows, and
    * the interpolation expression term-for-term. */
  private val qInterpolateGaps = Q(
    (s, d) => Recursion.interpolateDaily(
        Tables.load(s, d, "events"), "user_id", "ts", "value")
      .orderBy(col("user_id"), col("day")),
    Some("WITH daily AS (SELECT user_id, " +
      "CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day, " +
      "SUM(CAST(value AS DECIMAL(18,6))) AS v FROM events GROUP BY 1, 2), " +
      "bounds AS (SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY 1), " +
      "spine AS (SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM bounds), " +
      "j AS (SELECT s.user_id, s.day, CAST(v AS DOUBLE) AS vd FROM spine s " +
      "LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day), " +
      "w AS (SELECT user_id, day, vd, " +
      "last_value(vd IGNORE NULLS) OVER pw AS pv, " +
      "last_value(CASE WHEN vd IS NOT NULL THEN day END IGNORE NULLS) OVER pw AS pd, " +
      "first_value(vd IGNORE NULLS) OVER fw AS nv, " +
      "first_value(CASE WHEN vd IS NOT NULL THEN day END IGNORE NULLS) OVER fw AS nd " +
      "FROM j WINDOW pw AS (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), " +
      "fw AS (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)) " +
      "SELECT user_id, day, round(CASE WHEN vd IS NOT NULL THEN vd " +
      "WHEN pv IS NOT NULL AND nv IS NOT NULL THEN pv + (nv - pv) * " +
      "(CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE)) END, 6) AS value, " +
      "(vd IS NULL AND pv IS NOT NULL AND nv IS NOT NULL) AS interpolated " +
      "FROM w ORDER BY user_id, day"))

  /** CUSUM CHANGE-POINT ALARMS ([[graft.operators.Profiler.cusumAlarms]],
    * slack 25, threshold 250 over per-user daily spend): the sequential
    * drift detector as three stock windows via the prefix-min identity —
    * the `max(0, s + d)` recurrence never materializes. Daily totals are
    * exact-DECIMAL; the day grain makes the window order unique, and the
    * running double sums accumulate in the same left-to-right order on
    * both engines, so round(6) statistics hash-match. */
  private val qCusumAlarms = Q(
    (s, d) => {
      val day = floor(unix_micros(col("ts")) / lit(86400000000L)).cast("long")
      // ts IS NOT NULL: a NULL day would become a group key whose window
      // position differs across engines (Spark NULLS FIRST, DuckDB
      // NULLS LAST) — the q_cusum_twosided latent-divergence class
      val daily = Tables.load(s, d, "events").filter(col("ts").isNotNull)
        .groupBy(col("user_id"), day.as("day"))
        .agg(sum(col("value").cast("decimal(18,6)")).as("v"))
      graft.operators.Profiler.cusumAlarms(daily, "user_id", "day", "v",
          slack = 25.0, h = 250.0)
        .withColumn("v", col("v").cast("double"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("WITH daily AS (SELECT user_id, " +
      "CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS day, " +
      "SUM(CAST(value AS DECIMAL(18,6))) AS v FROM events " +
      "WHERE ts IS NOT NULL GROUP BY 1, 2), " +
      "m AS (SELECT user_id, day, v, " +
      "CAST(SUM(v) OVER (PARTITION BY user_id) AS DOUBLE) / " +
      "CAST(COUNT(*) OVER (PARTITION BY user_id) AS DOUBLE) AS mu FROM daily), " +
      "p AS (SELECT user_id, day, v, " +
      "SUM(CAST(v AS DOUBLE) - mu - 25.0e0) OVER (PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp FROM m), " +
      "sct AS (SELECT user_id, day, v, pp - least(0.0e0, MIN(pp) OVER " +
      "(PARTITION BY user_id ORDER BY day " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS cs FROM p) " +
      "SELECT user_id, day, CAST(v AS DOUBLE) AS v, round(cs, 6) AS cusum, " +
      "cs > 250.0e0 AS alarm FROM sct ORDER BY user_id, day"))

  /** Decontamination against a benchmark subset (src0 plays the eval set):
    * fraction of each corpus doc's 5-gram shingles appearing anywhere in
    * the benchmark. Semi-join against the benchmark's distinct shingles —
    * linear in corpus shingles, no pair explosion. */
  private val qContamination = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Dedup.contaminationScore(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 5)
        .orderBy(col("doc_id"))
    },
    // inlined variant of ShingleCte carrying `source`; same corpus-sized
    // position table (no hard-coded bound)
    Some("WITH words AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "sh AS (SELECT DISTINCT doc_id, source, array_to_string(list_slice(w, i, i+4), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w) - 4), " +
      "bs AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'), " +
      "cs AS (SELECT doc_id, g FROM sh WHERE source <> 'src0'), " +
      "sizes AS (SELECT doc_id, count(*) AS n_shingles FROM cs GROUP BY 1), " +
      "hits AS (SELECT doc_id, count(*) AS contaminated FROM cs WHERE g IN (SELECT g FROM bs) GROUP BY 1) " +
      "SELECT s.doc_id, COALESCE(h.contaminated, 0) AS contaminated, s.n_shingles, " +
      "CAST(COALESCE(h.contaminated, 0) AS DOUBLE) / s.n_shingles AS contamination " +
      "FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id ORDER BY s.doc_id"))

  /** Per-language embedding centroids in exact fixed-point (see
    * [[Similarity.groupCentroids]]: order-independent long sums ⇒ the same
    * centroid at any partitioning, which a double `avg` cannot promise). */
  private val qGroupCentroids = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("lang"))
      val emb = Tables.load(s, d, "embeddings")
      Similarity.groupCentroids(
          emb.join(docs, emb("vec_id") === docs("doc_id")), "lang", "embedding")
        .orderBy(col("lang"), col("dim")) },
    Some("WITH j AS (SELECT lang, embedding FROM embeddings JOIN documents ON vec_id = doc_id " +
      "WHERE embedding IS NOT NULL), " +
      "x AS (SELECT lang, generate_subscripts(embedding, 1) AS dim, " +
      "CAST(trunc(unnest(embedding::DOUBLE[]) * 1000000e0) AS BIGINT) AS q FROM j), " +
      "a AS (SELECT lang, dim, CAST(SUM(q) AS BIGINT) AS s, count(*) AS n FROM x GROUP BY 1, 2) " +
      "SELECT lang, CAST(dim AS BIGINT) AS dim, CAST(s AS DOUBLE) / 1000000e0 / n AS centroid " +
      "FROM a ORDER BY lang, dim"))

  /** The SCALE composition end-to-end: MinHash+LSH pair generation feeding
    * cluster resolution, against the SAME recursive-CTE oracle as the
    * exhaustive-pairs path — the gate proves banding + verification +
    * label propagation compose without changing semantics. */
  private val qDedupGroupsLsh = Q(
    (s, d) => Dedup.dupGroups(
        Dedup.nearDupPairs(Tables.load(s, d, "documents"),
          "doc_id", "text", 5, 0.8, bandedCacheKey = Some(docBandKey(s, d))))
      .orderBy(col("doc_id")),
    qDedupGroups.sql)

  /** C4-style corpus-level boilerplate removal: 10-word segments appearing
    * in >= 3 distinct documents are dropped everywhere, documents
    * reassembled from the survivors (15 such segments exist at sf0.01, so
    * the purge path is genuinely exercised, not a no-op). */
  private val qBoilerplatePurge = Q(
    (s, d) => Dedup.purgeBoilerplate(Tables.load(s, d, "documents"),
        "doc_id", "text", segWords = 10, minDocs = 3)
      .orderBy(col("doc_id")),
    // segment-index table sized from the corpus (max segments at 10
    // words each) — no hard-coded bound (same contract as ShingleCte)
    Some("WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "pos AS (SELECT unnest(range(0, (SELECT COALESCE(max(len(w)), 0) // 10 + 1 FROM words))) AS j), " +
      "segs AS (SELECT doc_id, j AS seg_idx, array_to_string(list_slice(w, j*10+1, j*10+10), ' ') AS seg " +
      "FROM words JOIN pos ON j*10 < len(w)), " +
      "common AS (SELECT seg FROM (SELECT DISTINCT seg, doc_id FROM segs) GROUP BY seg HAVING count(*) >= 3), " +
      "kept AS (SELECT * FROM segs WHERE seg NOT IN (SELECT seg FROM common)), " +
      "totals AS (SELECT doc_id, count(*) AS n_total FROM segs GROUP BY 1), " +
      "ck AS (SELECT doc_id, count(*) AS n_kept, string_agg(seg, ' ' ORDER BY seg_idx) AS clean_text " +
      "FROM kept GROUP BY 1) " +
      "SELECT t.doc_id, CAST(t.n_total - COALESCE(c.n_kept, 0) AS BIGINT) AS n_removed, " +
      "CAST(COALESCE(c.n_kept, 0) AS BIGINT) AS n_kept, COALESCE(c.clean_text, '') AS clean_text " +
      "FROM totals t LEFT JOIN ck c ON t.doc_id = c.doc_id ORDER BY t.doc_id"))

  /** URL-key dedup (CCNet/C4's one-doc-per-canonical-URL pass). The corpus
    * has no URL column, so both engines PLANT the same messy URL from
    * doc_id arithmetic — uppercase scheme/host, www, default port,
    * trailing slash, utm_* params and a fragment are all noise the
    * canonicalizer must strip; host/path/id params are the real key (140
    * canonical groups at sf0.01, all with >1 copy). */
  private val qUrlDedup = Q(
    (s, d) => {
      val url = concat(
        lit("HTTPS://WWW.Example"), (col("doc_id") % 5).cast("string"),
        lit(".COM"), when(col("doc_id") % 3 === 0, lit(":443")).otherwise(lit("")),
        lit("/Docs/p"), (col("doc_id") % 7).cast("string"),
        when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("")),
        lit("?utm_source=s"), col("doc_id").cast("string"),
        lit("&id="), (col("doc_id") % 4).cast("string"),
        lit("&utm_campaign=c"), (col("doc_id") % 9).cast("string"),
        lit("#f"), (col("doc_id") % 11).cast("string"))
      TextAnalysis.urlDedup(
          Tables.load(s, d, "documents").select(col("doc_id"), url.as("url")),
          "doc_id", "url")
        .orderBy(col("canon_url"))
    },
    Some("WITH u AS (SELECT doc_id, " +
      "'HTTPS://WWW.Example' || CAST(doc_id % 5 AS VARCHAR) || '.COM' || " +
      "CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END || " +
      "'/Docs/p' || CAST(doc_id % 7 AS VARCHAR) || " +
      "CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END || " +
      "'?utm_source=s' || CAST(doc_id AS VARCHAR) || " +
      "'&id=' || CAST(doc_id % 4 AS VARCHAR) || " +
      "'&utm_campaign=c' || CAST(doc_id % 9 AS VARCHAR) || " +
      "'#f' || CAST(doc_id % 11 AS VARCHAR) AS url FROM documents), " +
      "s1 AS (SELECT doc_id, regexp_replace(url, '#.*$', '') AS nofrag FROM u), " +
      "s2 AS (SELECT doc_id, lower(regexp_extract(nofrag, '^([^/?#]*://[^/?#]*)', 1)) AS prefix, " +
      "regexp_extract(nofrag, '^[^/?#]*://[^/?#]*(.*)$', 1) AS rest FROM s1), " +
      "s3 AS (SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(prefix, " +
      "'^(https?://)www\\.', '\\1'), '^(https://[^/?#:]*):443$', '\\1'), '^(http://[^/?#:]*):80$', '\\1') AS hostp, " +
      "regexp_extract(rest, '^([^?]*)', 1) AS path, " +
      "regexp_extract(rest, '^[^?]*\\?(.*)$', 1) AS query FROM s2), " +
      "s4 AS (SELECT doc_id, hostp, regexp_replace(path, '/+$', '') AS cpath, " +
      "array_to_string(list_filter(string_split(query, '&'), p -> p <> '' AND NOT starts_with(p, 'utm_')), '&') AS q FROM s3), " +
      "canon AS (SELECT doc_id, hostp || cpath || CASE WHEN q = '' THEN '' ELSE '?' || q END AS canon_url FROM s4) " +
      "SELECT canon_url, min(doc_id) AS keep_id, count(*) AS n_copies " +
      "FROM canon GROUP BY 1 ORDER BY canon_url"))

  /** Sketch path for the dashboard's distinct-count tiles: per-event-type
    * approx distinct users via mergeable HLL sketches — the SELF-CERTIFYING
    * form ([[graft.operators.Sketches.approxDistinctAudited]]): the HLL
    * estimate is checked in-plan against the exact count under the
    * published 1.04/√m bound (×6 safety) and the query `raise_error`s
    * outside it, so the emitted (event_type, exact_distinct,
    * hll_within_bound) row set is fully hash-gated while the sketch path
    * is still the thing being exercised. Merge ≡ direct-build and the
    * tighter ±3σ accuracy contract stay spec-asserted in SketchesSpec. */
  /** KMV pairwise set-operation estimates
    * ([[graft.operators.Sketches.kmvPairwise]]): distinct-user overlap
    * between every pair of event types from k=64 minimum-hash sketches —
    * the intersection question HLL cannot answer. Unlike the HLL gate
    * (audited, because DataSketches has no SQL mirror) this sketch is
    * deterministic end to end — portable md5 hashes, total orders, IEEE
    * division in matched operand order — so DuckDB replays the whole
    * estimator (k-mins, kth-minimum cardinality, union-sketch Jaccard)
    * bit-identically. Groups with ≤ k distinct hashes carry exact counts
    * by construction. */
  private val qKmvIntersect = Q(
    (s, d) => graft.operators.Sketches.kmvPairwise(
        Tables.load(s, d, "events"), "event_type", "user_id", k = 64)
      .orderBy(col("group_a"), col("group_b")),
    Some("WITH hs AS (SELECT DISTINCT event_type AS g, " +
      "('0x' || substr(md5(CAST(user_id AS VARCHAR) || 'graft-kmv'), 1, 8))::BIGINT AS h " +
      "FROM events WHERE user_id IS NOT NULL), " +
      "skk AS (SELECT g, h, rk FROM (SELECT g, h, " +
      "row_number() OVER (PARTITION BY g ORDER BY h) AS rk FROM hs) WHERE rk <= 64), " +
      "est AS (SELECT n.g, n.n_h, CASE WHEN n.n_h <= 64 THEN CAST(n.n_h AS DOUBLE) " +
      "ELSE CAST(63 AS DOUBLE) * 4294967296e0 / (CAST(m.hk AS DOUBLE) + 1e0) END AS est " +
      "FROM (SELECT g, count(*) AS n_h FROM hs GROUP BY g) n " +
      "JOIN (SELECT g, max(CASE WHEN rk = 64 THEN h END) AS hk FROM skk GROUP BY g) m ON n.g = m.g), " +
      "gs AS (SELECT DISTINCT g FROM skk), " +
      "pr AS (SELECT a.g AS ga, b.g AS gb FROM gs a, gs b WHERE a.g < b.g), " +
      "uni AS (SELECT ga, gb, h, max(ia) AS ia, max(ib) AS ib FROM (" +
      "SELECT p.ga, p.gb, s.h, 1 AS ia, 0 AS ib FROM pr p JOIN skk s ON s.g = p.ga " +
      "UNION ALL SELECT p.ga, p.gb, s.h, 0, 1 FROM pr p JOIN skk s ON s.g = p.gb) " +
      "GROUP BY ga, gb, h), " +
      "rkd AS (SELECT ga, gb, h, ia, ib, " +
      "row_number() OVER (PARTITION BY ga, gb ORDER BY h) AS rk FROM uni), " +
      "un AS (SELECT ga, gb, count(*) AS n_u FROM uni GROUP BY ga, gb), " +
      "kp AS (SELECT ga, gb, count(*) AS ku, max(CASE WHEN rk = 64 THEN h END) AS hku, " +
      "CAST(SUM(ia * ib) AS BIGINT) AS n_both FROM rkd WHERE rk <= 64 GROUP BY ga, gb) " +
      "SELECT group_a, group_b, est_a, est_b, est_union, est_jaccard, " +
      "est_jaccard * est_union AS est_intersection FROM (" +
      "SELECT kp.ga AS group_a, kp.gb AS group_b, ea.est AS est_a, eb.est AS est_b, " +
      "CASE WHEN ea.n_h <= 64 AND eb.n_h <= 64 THEN CAST(un.n_u AS DOUBLE) " +
      "ELSE CAST(63 AS DOUBLE) * 4294967296e0 / (CAST(kp.hku AS DOUBLE) + 1e0) END AS est_union, " +
      "CAST(kp.n_both AS DOUBLE) / CAST(kp.ku AS DOUBLE) AS est_jaccard " +
      "FROM kp JOIN un ON un.ga = kp.ga AND un.gb = kp.gb " +
      "JOIN est ea ON ea.g = kp.ga JOIN est eb ON eb.g = kp.gb) " +
      "ORDER BY group_a, group_b"))

  private val qHllDistinct = Q(
    (s, d) => graft.operators.Sketches.approxDistinctAudited(
        Tables.load(s, d, "events"), Seq("event_type"), "user_id")
      .orderBy(col("event_type")),
    Some("SELECT event_type, count(DISTINCT user_id) AS exact_distinct, " +
      "true AS hll_within_bound FROM events GROUP BY 1 ORDER BY 1"))

  /** Mergeable quantile sketch, grouped form — the KLL member of the
    * sketch family ([[graft.operators.QuantileSketch]], Karnin-Lang-
    * Liberty FOCS'16), SELF-CERTIFYING like the HLL gate above: per
    * event type the sketch's p50/p95 estimates are audited in-plan
    * against the exact (q±5%)-quantile rank window and the query
    * `raise_error`s outside it; the emitted columns are the EXACT
    * quantiles (the q_grouped_quantiles Spark-percentile ≡ DuckDB-
    * quantile_cont contract) plus the audited flag — fully hash-gated,
    * sketch path exercised. */
  private val qQuantileSketch = Q(
    (s, d) => graft.operators.QuantileSketch.groupedQuantilesAudited(
        Tables.load(s, d, "events"), "event_type", "value")
      .orderBy(col("event_type")),
    Some("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
      "round(quantile_cont(value, 0.95), 6) AS p95, " +
      "count(value) AS n_valued, true AS kll_within_bound " +
      "FROM events WHERE value IS NOT NULL GROUP BY 1 ORDER BY 1"))

  /** The corpus-wide persisted-layout path: per-shard KLL sketches
    * (user_id mod 8 — a stand-in for the lake's partition key) merged
    * at the SKETCH level, quantile-queried, and audited against the
    * exact global quantiles. Proves the "persist KBs next to each
    * partition, merge instead of re-sort" story end-to-end. */
  private val qQuantileSketchMerged = Q(
    (s, d) => graft.operators.QuantileSketch.mergedQuantilesAudited(
        Tables.load(s, d, "events")
          .withColumn("shard", col("user_id") % 8),
        "shard", "value"),
    Some("SELECT round(quantile_cont(value, 0.5), 6) AS p50, " +
      "round(quantile_cont(value, 0.95), 6) AS p95, " +
      "count(value) AS n_valued, true AS kll_within_bound " +
      "FROM events WHERE value IS NOT NULL"))

  /** Unigram LM quality score: avg token log-prob under the corpus's own
    * unigram distribution (round(6) soaks up cross-libm ln drift). */
  private val qUnigramLogprob = Q(
    (s, d) => TextAnalysis.unigramLogProb(Tables.load(s, d, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
      "freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1), " +
      "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM freq) " +
      "SELECT doc_id, count(*) AS n_tokens, " +
      "round(avg(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))), 6) AS avg_logprob " +
      "FROM toks JOIN freq USING (tok) CROSS JOIN tot " +
      "GROUP BY doc_id ORDER BY doc_id"))

  /** Text normalization ([[TextAnalysis.normalizeText]]) over a PLANTED
    * messy variant (the corpus text is already clean, so the query wraps
    * it in uppercase, typographic quotes, a tab and an em-dash — the
    * planting is mirrored in the oracle, the normalization chain is what
    * the gate verifies: translate → lower → whitespace collapse → trim,
    * identical in java.util.regex and RE2). */
  private val qNormalizeText = Q(
    (s, d) => Tables.load(s, d, "documents").select(col("doc_id"),
        TextAnalysis.normalizeText(concat(
          lit("  “"), upper(substring(col("text"), 1, 40)),
          lit("”\t— "), col("text"))).as("norm"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, trim(regexp_replace(lower(translate(" +
      "'  “' || upper(substring(text, 1, 40)) || '”' || chr(9) || '— ' || text, " +
      "'’‘“”—–', '''''\"\"--')), " +
      "'[\\s\\x00-\\x1f]+', ' ', 'g')) AS norm " +
      "FROM documents ORDER BY doc_id"))

  /** Sentence segmentation ([[TextAnalysis.sentences]]) over planted
    * punctuation (the corpus has none): three terminated sentences plus an
    * unterminated tail per doc; the oracle rebuilds the same
    * extract-trim-filter-posexplode chain with parallel unnest. */
  private val qSentences = Q(
    (s, d) => TextAnalysis.sentences(
        Tables.load(s, d, "documents").select(col("doc_id"),
          concat(substring(col("text"), 1, 50), lit(". "), col("source"),
            lit(" excels! Is "), col("lang"), lit(" ok? "),
            substring(col("text"), 51, 40)).as("planted")),
        "doc_id", "planted")
      .orderBy(col("doc_id"), col("sent_idx")),
    Some("WITH planted AS (SELECT doc_id, substring(text, 1, 50) || '. ' || source || " +
      "' excels! Is ' || lang || ' ok? ' || substring(text, 51, 40) AS p FROM documents), " +
      "ss AS (SELECT doc_id, list_filter(list_transform(" +
      "regexp_extract_all(p, '[^.!?]*[.!?]+|[^.!?]+$'), x -> trim(x)), x -> x <> '') AS l " +
      "FROM planted) " +
      "SELECT doc_id, unnest(range(0, len(l))) AS sent_idx, unnest(l) AS sentence " +
      "FROM ss ORDER BY doc_id, sent_idx"))

  /** Bigram LM with unigram interpolation
    * ([[TextAnalysis.bigramLogProb]], λ=0.7): the oracle rebuilds the full
    * Jelinek–Mercer estimator in SQL — parallel-unnest slices zip the
    * bigram instances, both count tables, and the interpolation formula
    * mirrored token-for-token (the `(1.0e0 - 0.7e0)` form matches Spark's
    * `lit(1.0) - lit(0.7)` bit-exactly). Docs with < 2 tokens have no
    * bigram and are absent on both sides. */
  private val qBigramLogprob = Q(
    (s, d) => TextAnalysis.bigramLogProb(Tables.load(s, d, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH w AS (SELECT doc_id, list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS ws FROM documents), " +
      "toks AS (SELECT doc_id, unnest(ws) AS tok FROM w), " +
      "uni AS (SELECT tok, count(*) AS ucnt FROM toks GROUP BY tok), " +
      "tot AS (SELECT CAST(SUM(ucnt) AS DOUBLE) AS n_total FROM uni), " +
      "bg AS (SELECT doc_id, unnest(list_slice(ws, 1, len(ws) - 1)) AS w1, " +
      "unnest(list_slice(ws, 2, len(ws))) AS w2 FROM w WHERE len(ws) >= 2), " +
      "bi AS (SELECT w1, w2, count(*) AS bcnt FROM bg GROUP BY w1, w2) " +
      "SELECT doc_id, count(*) AS n_bigrams, " +
      "round(avg(ln(0.7e0 * (CAST(bcnt AS DOUBLE) / CAST(c1.ucnt AS DOUBLE)) " +
      "+ (1.0e0 - 0.7e0) * (CAST(c2.ucnt AS DOUBLE) / n_total))), 6) AS avg_logprob " +
      "FROM bg JOIN bi USING (w1, w2) JOIN uni c1 ON c1.tok = bg.w1 " +
      "JOIN uni c2 ON c2.tok = bg.w2 CROSS JOIN tot " +
      "GROUP BY doc_id ORDER BY doc_id"))

  /** Data mixing: subsample sources to a 1:2:3:4:5 target over
    * src0..src4 (other sources weight zero → dropped). Rates are derived
    * in-plan from actual counts; the hash filter is the portable salted
    * md5 bucket, so DuckDB reproduces membership exactly. */
  private val qMixSources = Q(
    (s, d) => Sampling.mixToTarget(
        Tables.load(s, d, "documents").select(col("doc_id"), col("source")),
        "doc_id", "source",
        Map("src0" -> 1.0, "src1" -> 2.0, "src2" -> 3.0, "src3" -> 4.0, "src4" -> 5.0))
      .select(col("doc_id"), col("source"))
      .orderBy(col("doc_id")),
    Some("WITH t(g, w) AS (VALUES ('src0', 1e0), ('src1', 2e0), ('src2', 3e0), ('src3', 4e0), ('src4', 5e0)), " +
      "counts AS (SELECT source AS g, count(*) AS n_g FROM documents GROUP BY 1), " +
      "j AS (SELECT t.g, w AS t_g, n_g FROM t JOIN counts USING (g)), " +
      "k AS (SELECT min(CAST(n_g AS DOUBLE) / t_g) AS k_total FROM j), " +
      "r AS (SELECT g, CAST(floor(t_g * k_total / n_g * 1000000) AS BIGINT) AS keep_ppm FROM j CROSS JOIN k) " +
      "SELECT doc_id, source FROM documents JOIN r ON source = r.g " +
      "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft-mix'), 1, 8))::BIGINT % 1000000 < keep_ppm " +
      "ORDER BY doc_id"))

  /** Temperature-scaled language mix
    * ([[graft.operators.Sampling.temperatureMix]], α=0.5): the mT5
    * sampling rule with the per-group weights (n^α) derived in-plan; the
    * oracle rebuilds counts, powers, the binding-group K, the floor'd ppm
    * rates, and the hash filter — the whole self-adjusting mix re-derived
    * declaratively. */
  private val qTemperatureMix = Q(
    (s, d) => graft.operators.Sampling.temperatureMix(
        Tables.load(s, d, "documents").select(col("doc_id"), col("lang")),
        "doc_id", "lang", alpha = 0.5)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("WITH counts AS (SELECT lang AS g, count(*) AS n_g FROM documents GROUP BY 1), " +
      "j AS (SELECT g, pow(CAST(n_g AS DOUBLE), 0.5e0) AS t_g, n_g FROM counts), " +
      "k AS (SELECT min(CAST(n_g AS DOUBLE) / t_g) AS k_total FROM j), " +
      "r AS (SELECT g, CAST(floor(t_g * k_total / n_g * 1000000) AS BIGINT) AS keep_ppm " +
      "FROM j CROSS JOIN k) " +
      "SELECT doc_id, lang FROM documents JOIN r ON lang = r.g " +
      "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft-mix'), 1, 8))::BIGINT % 1000000 < keep_ppm " +
      "ORDER BY doc_id"))

  private val qDedupSimhash = Q(
    (s, d) => Dedup.simhash32(Tables.load(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w FROM documents), " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS hv FROM toks), " +
      "bits AS (SELECT doc_id, i, SUM(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS s " +
      "FROM h, (SELECT unnest(range(0, 32)) AS i) t GROUP BY doc_id, i) " +
      "SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash " +
      "FROM bits GROUP BY doc_id ORDER BY doc_id"))

  /** SimHash pairing at hamming <= 1 through the pigeonhole-bucketed plan,
    * verified against the brute-force self-join oracle — the same
    * scale-plan-vs-exact-oracle pattern as q_dedup_minhash_lsh. (On this
    * small-vocabulary synthetic corpus 32-bit simhash collides heavily;
    * the bucketing contract, not the threshold, is what's under test.) */
  private val qSimhashPairs = Q(
    (s, d) => Dedup.simhashPairs(Tables.load(s, d, "documents"),
        "doc_id", "text", maxHamming = 1)
      .orderBy(col("doc_a"), col("doc_b")),
    Some("WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w FROM documents), " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS hv FROM toks), " +
      "bits AS (SELECT doc_id, i, SUM(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS s " +
      "FROM h, (SELECT unnest(range(0, 32)) AS i) t GROUP BY doc_id, i), " +
      "sh AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash " +
      "FROM bits GROUP BY doc_id) " +
      "SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, " +
      "CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming " +
      "FROM sh a JOIN sh b ON a.doc_id < b.doc_id " +
      "WHERE bit_count(xor(a.simhash, b.simhash)) <= 1 ORDER BY doc_a, doc_b"))

  private val CosD = "embedding::DOUBLE[]"
  private def cosSql(a: String, b: String) =
    s"round(list_dot_product($a, $b) / (sqrt(list_dot_product($a, $a)) * sqrt(list_dot_product($b, $b))), 6)"

  private val qAnnBruteTopk = Q(
    (s, d) => Similarity.bruteForceTopK(Tables.load(s, d, "embeddings"),
      "vec_id", "embedding", anchorId = 0L, k = 10),
    Some("WITH q AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) " +
      s"SELECT vec_id, ${cosSql(CosD, "qe")} AS cosine FROM embeddings, q " +
      "WHERE vec_id <> 0 ORDER BY cosine DESC, vec_id LIMIT 10"))

  private val qEmbNeardupPairs = Q(
    (s, d) => Similarity.cosinePairs(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.45)
      .orderBy(col("vec_a"), col("vec_b")),
    Some("SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, " +
      cosSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]") + " AS cosine " +
      "FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id " +
      "WHERE " + cosSql("a.embedding::DOUBLE[]", "b.embedding::DOUBLE[]") + " >= 0.45e0 " +
      "ORDER BY vec_a, vec_b"))

  /** Shared banding-cache key for the hyperplane-LSH twins: fingerprints
    * the embeddings FILES plus the banding parameters, so the
    * salted/unsalted twins (and steady-state re-runs) reuse one
    * checkpointed banding while any corpus regeneration misses the cache
    * by construction (see [[graft.operators.Similarity.lshCosinePairs]]'s
    * `bandedCacheKey` scaladoc). */
  private def embBandKey(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/embeddings.parquet", "lshband|b=48|r=4|seed=42")

  /** Same semantics as q_emb_neardup_pairs — and the SAME oracle — via the
    * banded hyperplane LSH scale path (the q_j1_salted / minhash pattern:
    * the gate itself proves the bucketed plan is semantics-preserving).
    * Candidates come from a band-key equi-join, never a cartesian product.
    *
    * TRIAGE NOTE: unlike the MinHash path (miss ≈ 5e-8), sign-LSH recall at
    * this corpus's adversarial threshold (cos 0.45 ⇒ p ≈ 0.648) is "only"
    * 1 - 8e-5 per pair; the seeded planes make any given corpus
    * deterministic (this one: 100% recall at every sf), but a future
    * regenerated corpus with many pairs just above threshold could fail the
    * hash gate through a genuine LSH miss. A red row here should be triaged
    * as an LSH recall miss (raise `bands`), NOT as an arithmetic bug — the
    * scoring arithmetic is byte-shared with the exhaustive path. At a
    * realistic near-dup threshold (cos ≥ 0.9) the same b/r gives miss
    * ≈ 1e-14, so the production configuration is provably safe. */
  private val qEmbNeardupLsh = Q(
    (s, d) => Similarity.lshCosinePairs(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.45,
        bandedCacheKey = Some(embBandKey(s, d)))
      .orderBy(col("vec_a"), col("vec_b")),
    qEmbNeardupPairs.sql)

  /** Hyperplane-LSH pairs through the HOT-BAND SKEW GUARD
    * ([[graft.operators.Scale.saltedBandSelfJoin]] via `saltHotBands`) —
    * same oracle as the exhaustive and plain-LSH twins. hotMin = 4 forces
    * the salted route at test sf (these near-random embeddings put many
    * vectors in shared bands at cos-threshold 0.45 — exactly the
    * degenerate-band regime the guard exists for); the pair set must come
    * out identical. */
  private val qEmbNeardupLshSalted = Q(
    (s, d) => Similarity.lshCosinePairs(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", threshold = 0.45,
        saltHotBands = Some((4, 4)),
        bandedCacheKey = Some(embBandKey(s, d)))
      .orderBy(col("vec_a"), col("vec_b")),
    qEmbNeardupPairs.sql)

  /** F2-recursive over a NESTED value (struct with a string field and a
    * string array), the testdata-analog oracle for
    * [[graft.functions.Functions.brandRenameAll]] — emitted as scalars
    * because the checker can't hash struct cells. */
  private val qF2RenameNested = Q(
    (s, d) => {
      val built = Tables.load(s, d, "documents").select(col("doc_id"),
        struct(
          concat(lit("https://twitter.com/u/"), col("source")).as("url"),
          array(col("source"), concat(col("source"), lit(" likes Twitter")))
            .as("tags")).as("meta"))
      graft.functions.Functions.brandRenameAll(built)
        .select(col("doc_id"), col("meta.url").as("url"),
          col("meta.tags").getItem(1).as("tag"))
        .orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, " +
      "replace(replace('https://twitter.com/u/' || source, 'Twitter', 'X'), 'twitter', 'x') AS url, " +
      "replace(replace(source || ' likes Twitter', 'Twitter', 'X'), 'twitter', 'x') AS tag " +
      "FROM documents ORDER BY doc_id"))

  /** Approximate (multi-probe hyperplane LSH), HASH-GATED: approximate ≠
    * unverifiable. The whole probe pipeline is a deterministic function of
    * (corpus, seeded planes), so the oracle REPLAYS it declaratively: the
    * 6 seeded hyperplanes are embedded as %.17e literals (exact double
    * round-trip), DuckDB recomputes each vector's sign-bit bucket, the
    * hamming ≤ 3 probe set, the exact re-scoring, and the recall@10
    * against brute force — every stage of [[Similarity.annTopK]] +
    * [[Similarity.withRecallAudit]] mirrored bit-for-bit. The in-plan
    * recall audit stays (the floor raises on garbage at ANY sf, including
    * ones the oracle never sees).
    *
    * Probe budget (6 planes, hamming ≤ 3 ≈ 2/3 of buckets) is
    * deliberately generous: these synthetic embeddings are near-random
    * (max pairwise cosine ≈ 0.5), the adversarial case for any
    * sign-LSH — there is no cluster structure to exploit, so certifying
    * the bucketing/probing/scoring machinery requires a wide probe. On a
    * real clustered corpus the same machinery runs with 12+ planes and
    * hamming ≤ 2 (the [[Similarity.annTopK]] defaults). Measured
    * recall@10 here: 1.0 / 0.8 / 0.8 at sf0.001/0.01/0.1 (deterministic
    * — seeded planes). */
  private val qAnnLshTopk = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.withRecallAudit(
        Similarity.annTopK(emb, "vec_id", "embedding", anchorId = 0L, k = 10,
          nPlanes = 6, maxHammingProbe = 3),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.6)
    },
    Some(annLshSql(maxHamming = 3)))

  /** The declarative replay of [[Similarity.annTopK]] +
    * [[Similarity.withRecallAudit]] shared by the hyperplane-LSH ANN rows
    * (one probe-width knob): the 6 seeded hyperplanes are embedded as
    * %.17e literals (exact double round-trip), DuckDB recomputes each
    * vector's sign-bit bucket, the hamming ≤ `maxHamming` probe set, the
    * exact re-scoring, and the recall@10 against brute force. */
  private def annLshSql(maxHamming: Int): String = {
    // the SAME construction annTopK uses: hyperplanes(6, 64, seed=42),
    // bucket bit i = [dot(v, plane_i) >= 0] weighted 2^i
    val planes = Similarity.hyperplanes(6, 64)
    // Locale.ROOT: %e under a comma-decimal default locale (de_DE)
    // would render "1,23e+00" and break the generated SQL
    def lit(p: Array[Double]) = p
      .map(v => String.format(java.util.Locale.ROOT, "%.17e", Double.box(v)))
      .mkString("[", ", ", "]")
    val bucket = planes.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_dot_product(v, ${lit(p)}) >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    "WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      s"b AS (SELECT vec_id, v, CAST($bucket AS BIGINT) AS bucket FROM e), " +
      "q AS (SELECT v AS qv, bucket AS qbucket FROM b WHERE vec_id = 0), " +
      "approx AS (SELECT b.vec_id, " + cosSql("b.v", "q.qv") + " AS cosine " +
      s"FROM b, q WHERE bit_count(xor(b.bucket, q.qbucket)) <= $maxHamming AND b.vec_id <> 0 " +
      "ORDER BY cosine DESC, b.vec_id LIMIT 10), " +
      "brute AS (SELECT vec_id FROM (SELECT e.vec_id, " + cosSql("e.v", "q.qv") +
      " AS c FROM e, q WHERE e.vec_id <> 0) ORDER BY c DESC, vec_id LIMIT 10), " +
      "rec AS (SELECT CAST(count(*) AS DOUBLE) / 10 AS recall_at_k " +
      "FROM approx WHERE vec_id IN (SELECT vec_id FROM brute)) " +
      "SELECT approx.vec_id, approx.cosine, rec.recall_at_k FROM approx, rec"
  }

  /** Hyperplane-LSH ANN at a SECOND, quality-gated operating point — the
    * q_ann_ivfpq_probe_audit pattern applied to the sign-LSH family: same
    * seeded planes and probe machinery as q_ann_lsh_topk, but the probe
    * widens to hamming ≤ 4 (57 of 64 buckets — pruning still genuine, and
    * with per-bit agreement 2/3 at this corpus's adversarial cos≈0.5
    * regime a true neighbor lands inside the probe set w.p. ≈ 0.98, so
    * the achieved recall is solidly high) and the in-plan floor is
    * TIGHTENED to 0.8 (vs the production row's 0.6; measured recall@10 on
    * the seeded planes: 1.0 / 0.9 / 0.9 at sf0.001/0.01/0.1) so a
    * bucketing, probe-selection, or scoring regression that degrades
    * retrieval fails the round via raise_error, while the floor keeps
    * the same one-notch headroom as the IVF-PQ audit against a future
    * corpus regeneration. Hash-green on top (the IVF-PQ audit can't be —
    * MLlib float codebooks aren't SQL-replayable; these seeded planes
    * are). */
  private val qAnnLshProbeAudit = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.withRecallAudit(
        Similarity.annTopK(emb, "vec_id", "embedding", anchorId = 0L, k = 10,
          nPlanes = 6, maxHammingProbe = 4),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.8)
    },
    Some(annLshSql(maxHamming = 4)))

  /** IVF ANN with full probing (nprobe == nlist) degenerates to exact
    * search, so it shares the brute-force oracle — the gate verifies the
    * build→quantize→probe→score pipeline end-to-end. Production uses
    * nprobe << nlist (see SimilaritySpec for the approximate mode).
    * The quantizer build is OFFLINE ([[graft.operators.IvfIndex]]): built
    * once per corpus into a cell-partitioned index dir, so the query here
    * is the probe path only — centroid metadata read + pruned cell scan. */
  private val qAnnIvfTopk = Q(
    (s, d) => {
      val idx = graft.operators.IvfIndex.ensure(
        Tables.load(s, d, "embeddings"), "vec_id", "embedding", d,
        nlist = 8, trainLimit = 10000)
      graft.operators.IvfIndex.topK(s, idx, "vec_id", "embedding",
        anchorId = 0L, k = 10, nprobe = 8)
    },
    qAnnBruteTopk.sql)

  /** The anchor's raw vector as query metadata (one-row bounded collect —
    * the same driver-side anchor resolution PQ/IVF-PQ would do in a
    * vector-search service; never a corpus-sized collect). */
  private def anchorVec(emb: org.apache.spark.sql.DataFrame): Array[Double] =
    emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>"))
      .head().getSeq[Double](0).toArray

  /** PQ ANN — asymmetric-distance search over seeded m×k codebooks
    * ([[PqIndex]]): the lossy-compression path is approximate by
    * construction, so like q_ann_lsh_topk it gets the rows-only driver
    * check; exactness properties (lossless on-codebook corpus ≡ brute
    * force, recall floor) are spec-verified in PqIndexSpec. Deterministic:
    * seeded k-means on the id-ordered training prefix, distance ties break
    * on id. Codebook training + corpus encoding are OFFLINE
    * ([[PqIndex.ensure]], the IvfIndex discipline): published once per
    * (corpus, params), so this query is the probe path — codebook
    * metadata read + LUT scoring over the persisted codes. */
  private val qAnnPqTopk = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val dir = PqIndex.ensure(emb, "vec_id", "embedding", d,
        m = 8, k = 64, coarseNlist = 8)
      // nprobe = all cells: pure-PQ mode — every code is LUT-scored,
      // then the 10x shortlist is exact-reranked ([[PqIndex.topKReranked]],
      // the production two-stage shape). The recall audit
      // ([[Similarity.withRecallAudit]]) raises below the floor, so the
      // rows-only gate cannot pass on garbage rows.
      Similarity.withRecallAudit(
        PqIndex.topKReranked(s, dir, emb, "vec_id", "embedding", anchorVec(emb),
          anchorId = 0L, topK = 10, shortlist = 100, nprobe = 8),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.5)
    },
    None)

  /** Unrolled fixed-point Lloyd CTEs for ONE PQ subspace (`p`-prefixed so
    * multiple subspaces coexist in a single query): the KmeansSqlWith
    * construction over the sliced embedding `[lo..hi]` (1-based inclusive,
    * DuckDB list slicing), ending in three consumable CTEs — `{p}c{iters}`
    * (final centroids), `{p}asg` (final assignment = the PQ code, ties to
    * the smallest code) and `{p}lut` (the anchor's exact int distance to
    * every final centroid: its own rows of the final distance table). */
  private def pqSubspaceCtes(p: String, k: Int, iters: Int, lo: Int, hi: Int): String = {
    def round(n: Int, cdims: String): String =
      s"${p}d$n AS (SELECT d.vec_id, cd.c, SUM((d.x - cd.y) * (d.x - cd.y)) AS dd " +
      s"FROM ${p}dims d JOIN $cdims cd USING (i) GROUP BY d.vec_id, cd.c), " +
      s"${p}a$n AS (SELECT vec_id, c FROM (SELECT vec_id, c, " +
      s"row_number() OVER (PARTITION BY vec_id ORDER BY dd, c) AS rn FROM ${p}d$n) WHERE rn = 1), " +
      s"${p}m$n AS (SELECT a.c, d.i, CAST(floor(CAST(SUM(d.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS y " +
      s"FROM ${p}dims d JOIN ${p}a$n a USING (vec_id) GROUP BY a.c, d.i), " +
      s"${p}c$n AS (SELECT s.c, s.i, COALESCE(m.y, s.y) AS y " +
      s"FROM $cdims s LEFT JOIN ${p}m$n m ON s.c = m.c AND s.i = m.i)"
    s"${p}q AS (SELECT vec_id, list_transform((embedding::DOUBLE[])[$lo:$hi], " +
      "x -> CAST(trunc(x * 1000000e0) AS BIGINT)) AS v FROM embeddings), " +
      s"${p}dims AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS i FROM ${p}q), " +
      s"${p}c0 AS (SELECT c, unnest(v) AS y, unnest(range(1, len(v) + 1)) AS i " +
      s"FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v FROM ${p}q) WHERE c < $k), " +
      (1 to iters).map(n => round(n, s"${p}c${n - 1}")).mkString(", ") + ", " +
      s"${p}df AS (SELECT d.vec_id, cd.c, SUM((d.x - cd.y) * (d.x - cd.y)) AS dd " +
      s"FROM ${p}dims d JOIN ${p}c$iters cd USING (i) GROUP BY d.vec_id, cd.c), " +
      s"${p}asg AS (SELECT vec_id, c FROM (SELECT vec_id, c, " +
      s"row_number() OVER (PARTITION BY vec_id ORDER BY dd, c) AS rn FROM ${p}df) WHERE rn = 1), " +
      s"${p}lut AS (SELECT c, dd FROM ${p}df WHERE vec_id = 0)"
  }

  /** EXACT-PQ twin ([[graft.operators.PqIndex.exactTopKReranked]]) — the
    * hash-gated form of the PQ retrieve-then-rerank pipeline: fixed-point
    * Lloyd codebooks per subspace (the q_kmeans_assign construction, m=2
    * k=4 iters=2 over dim 64), argmin encode, exact int64 ADC shortlist
    * (top-100 by (distance, id)), exact cosine rerank. Every stage is
    * deterministic integer/rounded arithmetic, so DuckDB replays the whole
    * pipeline bit-identically — upgrading the PQ family from rows-only
    * (q_ann_pq_topk, MLlib codebooks + recall audit) to hash-gated, the
    * same twin discipline as q_bpe_merges for BPE. */
  private val qAnnPqExactTopk = Q(
    (s, d) => graft.operators.PqIndex.exactTopKReranked(
      Tables.load(s, d, "embeddings"), "vec_id", "embedding",
      m = 2, k = 4, iters = 2, dim = 64, anchorId = 0L, topK = 10, shortlist = 100),
    Some("WITH " + pqSubspaceCtes("s0", 4, 2, 1, 32) + ", " +
      pqSubspaceCtes("s1", 4, 2, 33, 64) + ", " +
      "adc AS (SELECT a0.vec_id, l0.dd + l1.dd AS approx " +
      "FROM s0asg a0 JOIN s1asg a1 USING (vec_id) " +
      "JOIN s0lut l0 ON l0.c = a0.c JOIN s1lut l1 ON l1.c = a1.c " +
      "WHERE a0.vec_id <> 0), " +
      "short AS (SELECT vec_id FROM adc ORDER BY approx, vec_id LIMIT 100), " +
      "qa AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) " +
      s"SELECT e.vec_id, ${cosSql("e.embedding::DOUBLE[]", "qe")} AS cosine " +
      "FROM embeddings e JOIN short USING (vec_id), qa " +
      "ORDER BY cosine DESC, e.vec_id LIMIT 10"))

  /** EXACT-IVF-PQ twin ([[graft.operators.PqIndex.exactIvfPqTopKReranked]])
    * — the PQ twin plus the coarse stage: a fixed-point k-means over the
    * FULL vector (the same `pqSubspaceCtes` construction, slice 1..64)
    * assigns cells, the anchor probes its `nprobe`=2 nearest of 4 cells
    * (exact int distance, ties to the smaller cell — `cclut ORDER BY dd,
    * c`), and only probed-cell rows enter the ADC shortlist. Hash-gates
    * cell pruning, the one stage the PQ twin doesn't cover. */
  private val qAnnIvfpqExactTopk = Q(
    (s, d) => graft.operators.PqIndex.exactIvfPqTopKReranked(
      Tables.load(s, d, "embeddings"), "vec_id", "embedding",
      m = 2, k = 4, iters = 2, dim = 64, coarseK = 4, nprobe = 2,
      anchorId = 0L, topK = 10, shortlist = 100),
    Some("WITH " + pqSubspaceCtes("cc", 4, 2, 1, 64) + ", " +
      pqSubspaceCtes("s0", 4, 2, 1, 32) + ", " +
      pqSubspaceCtes("s1", 4, 2, 33, 64) + ", " +
      "probe AS (SELECT c FROM cclut ORDER BY dd, c LIMIT 2), " +
      "adc AS (SELECT a0.vec_id, l0.dd + l1.dd AS approx " +
      "FROM s0asg a0 JOIN s1asg a1 USING (vec_id) JOIN ccasg ca USING (vec_id) " +
      "JOIN s0lut l0 ON l0.c = a0.c JOIN s1lut l1 ON l1.c = a1.c " +
      "WHERE a0.vec_id <> 0 AND ca.c IN (SELECT c FROM probe)), " +
      "short AS (SELECT vec_id FROM adc ORDER BY approx, vec_id LIMIT 100), " +
      "qa AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0) " +
      s"SELECT e.vec_id, ${cosSql("e.embedding::DOUBLE[]", "qe")} AS cosine " +
      "FROM embeddings e JOIN short USING (vec_id), qa " +
      "ORDER BY cosine DESC, e.vec_id LIMIT 10"))

  /** IVF-PQ — the production ANN index shape (coarse cells prune WHICH
    * rows are scanned, PQ codes compress WHAT is scanned). The coarse
    * quantizer is an m=1 codebook: k cells over the full vector — the
    * same seeded training path as the subspace codebooks. Rows-only, as
    * above. */
  private val qAnnIvfpqTopk = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val dir = PqIndex.ensure(emb, "vec_id", "embedding", d,
        m = 8, k = 64, coarseNlist = 8)
      // nprobe < nlist: coarse cells prune the scan (partition pruning on
      // the published cell layout), PQ codes compress what remains, the
      // shortlist is exact-reranked. The floor is lower than pure-PQ's:
      // cell pruning is a genuine recall trade (the audit column reports
      // the achieved value).
      Similarity.withRecallAudit(
        PqIndex.topKReranked(s, dir, emb, "vec_id", "embedding", anchorVec(emb),
          anchorId = 0L, topK = 10, shortlist = 100, nprobe = 4),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.4)
    },
    None)

  /** IVF-PQ at a SECOND, quality-gated operating point — the regression
    * gate on APPROXIMATION QUALITY the exact-arithmetic twins don't give
    * (they pin the mechanics; this row pins the achieved recall). Same
    * published index as q_ann_ivfpq_topk, but the shortlist is widened to
    * 400 so cell pruning — not rerank truncation — is the binding
    * approximation, with nprobe = 6 of 8 cells still a genuine prune;
    * the in-plan floor is TIGHTENED to 0.8 (vs the production row's
    * permissive 0.4). Measured recall@10 on the deterministic seeded
    * index: 1.0 / 1.0 / 0.9 at sf0.001/0.01/0.1 — a codebook, layout, or
    * probe-selection regression that degrades retrieval below 0.8 fails
    * the round via raise_error instead of passing a rows-only check.
    * Rows-only by construction (MLlib float k-means codebooks are not
    * SQL-replayable); the audit column IS the certificate. */
  private val qAnnIvfpqProbeAudit = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val dir = PqIndex.ensure(emb, "vec_id", "embedding", d,
        m = 8, k = 64, coarseNlist = 8)
      Similarity.withRecallAudit(
        PqIndex.topKReranked(s, dir, emb, "vec_id", "embedding", anchorVec(emb),
          anchorId = 0L, topK = 10, shortlist = 400, nprobe = 6),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.8)
    },
    None)

  /** Plain-PQ at the SAME quality-gated operating point — closing the
    * audit-parity gap (VERDICT r16 #5): LSH and IVF-PQ carried tightened
    * 0.8-floor probe audits; plain PQ had only its exact-arithmetic twin
    * (q_ann_pq_exact_topk pins the mechanics, not the achieved recall of
    * the PRODUCTION MLlib-codebook path). Same published index as
    * q_ann_pq_topk, pure-PQ mode (nprobe = all 8 cells — no coarse
    * pruning, so ADC quantization error + rerank truncation are the only
    * approximations), shortlist widened to 400 so codebook quality — not
    * shortlist truncation — is the binding term, and the in-plan floor
    * TIGHTENED to 0.8 (vs the production row's permissive 0.5). Measured
    * recall@10 on the deterministic seeded index: 1.0 / 1.0 / 1.0 at
    * sf0.001/0.01/0.1 — an ADC-quality (codebook training, encode, LUT
    * scoring) regression below 0.8 now fails the round via raise_error.
    * Rows-only by construction (MLlib float codebooks are not
    * SQL-replayable); the audit column IS the certificate, and the
    * exact twin stays the hash-gated mechanics check. */
  private val qAnnPqProbeAudit = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val dir = PqIndex.ensure(emb, "vec_id", "embedding", d,
        m = 8, k = 64, coarseNlist = 8)
      Similarity.withRecallAudit(
        PqIndex.topKReranked(s, dir, emb, "vec_id", "embedding", anchorVec(emb),
          anchorId = 0L, topK = 10, shortlist = 400, nprobe = 8),
        emb, "vec_id", "embedding", anchorId = 0L, k = 10, minRecall = 0.8)
    },
    None)

  private val qTextStats = Q(
    (s, d) => {
      val st = TextAnalysis.textStats(Tables.load(s, d, "documents"), "doc_id", "text")
      st.select(col("doc_id"),
        col("n_chars_calc").cast("long").as("n_chars_calc"),
        col("n_words").cast("long").as("n_words"),
        col("n_distinct_words").cast("long").as("n_distinct_words"),
        col("n_tokens").cast("long").as("n_tokens"),
        col("n_stopwords").cast("long").as("n_stopwords"),
        col("avg_word_len"))
        .orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, length(text) AS n_chars_calc, " +
      "len(string_split_regex(trim(text), '\\s+')) AS n_words, " +
      "len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_words, " +
      "len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS n_tokens, " +
      "len(regexp_extract_all(lower(text), '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS n_stopwords, " +
      "CAST(list_aggregate(list_transform(string_split_regex(trim(text), '\\s+'), x -> length(x)), 'sum') AS DOUBLE) " +
      "/ len(string_split_regex(trim(text), '\\s+')) AS avg_word_len " +
      "FROM documents ORDER BY doc_id"))

  private val qQualityScore = Q(
    (s, d) => TextAnalysis.qualityScore(Tables.load(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH st AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS nw, " +
      "len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS nd, " +
      "len(regexp_extract_all(lower(text), '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS ns FROM documents) " +
      "SELECT doc_id, least(CAST(nw AS DOUBLE) / 100.0e0, 1.0e0) * 0.4e0 " +
      "+ (CAST(nd AS DOUBLE) / nw) * 0.3e0 + (CAST(ns AS DOUBLE) / nw) * 0.3e0 AS quality " +
      "FROM st ORDER BY doc_id"))

  private val qLangId = Q(
    (s, d) => {
      val li = TextAnalysis.langId(Tables.load(s, d, "documents"), "doc_id", "text")
      val casts = TextAnalysis.profiles.map { case (l, _) =>
        col(s"score_$l").cast("long").as(s"score_$l") }
      li.select((col("doc_id") +: casts :+ col("pred_lang")): _*).orderBy(col("doc_id"))
    },
    Some {
      val scoreExprs = TextAnalysis.profiles.map { case (l, re) =>
        s"len(regexp_extract_all(lower(text), '$re')) AS score_$l"
      }.mkString(", ")
      val best = "greatest(" + TextAnalysis.profiles.map(p => s"score_${p._1}").mkString(", ") + ")"
      val cases = TextAnalysis.profiles.map { case (l, _) =>
        s"WHEN score_$l = $best AND $best > 0 THEN '$l'" }.mkString(" ")
      s"WITH st AS (SELECT doc_id, $scoreExprs FROM documents) " +
        s"SELECT doc_id, ${TextAnalysis.profiles.map(p => s"score_${p._1}").mkString(", ")}, " +
        s"CASE $cases ELSE 'und' END AS pred_lang FROM st ORDER BY doc_id"
    })

  /** Rolling k-gram window fingerprint; oracle reuses the shingle CTE. */
  private val qWinnowFingerprint = Q(
    (s, d) => TextAnalysis.winnowFingerprint(Tables.load(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "sh AS (SELECT DISTINCT doc_id, array_to_string(list_slice(w, i, i+4), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w) - 4) " +
      "SELECT doc_id, min(('0x' || substr(md5(g), 1, 8))::BIGINT) AS winnow_fp " +
      "FROM sh GROUP BY doc_id ORDER BY doc_id"))

  private val qFingerprint = Q(
    (s, d) => TextAnalysis.fingerprint(Tables.load(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, md5(lower(trim(text))) AS fp, " +
      "('0x' || substr(md5(lower(trim(text))), 1, 8))::BIGINT AS fp_bucket " +
      "FROM documents ORDER BY doc_id"))

  /** PII redaction over a synthesized pii-bearing column (the testdata
    * corpus carries no genuine PII, so the query PLANTS a url + email +
    * phone per row and the gate verifies all three pattern passes and
    * their fixed order on both engines — RE2-compatible regexes behave
    * identically in Spark and DuckDB). */
  private val qRedactPii = Q(
    (s, d) => {
      val raw = concat(col("text"),
        lit(" see https://"), col("source"), lit(".example.com/u?x=1 or mail "),
        col("source"), lit("@example.org, tel +1 555 123 4567."))
      Tables.load(s, d, "documents")
        .select(col("doc_id"), TextAnalysis.redactPii(raw).as("redacted"))
        .orderBy(col("doc_id"))
    },
    Some("SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(" +
      "text || ' see https://' || source || '.example.com/u?x=1 or mail ' || source || '@example.org, tel +1 555 123 4567.', " +
      s"'${TextAnalysis.UrlRe}', '<URL>', 'g'), " +
      s"'${TextAnalysis.EmailRe}', '<EMAIL>', 'g'), " +
      s"'${TextAnalysis.PhoneRe}', '<PHONE>', 'g') AS redacted " +
      "FROM documents ORDER BY doc_id"))

  /** Binary-column metadata (multimodal plumbing surface): payload size in
    * bytes + content hash over the binary payload. */
  private val qBinaryMeta = Q(
    (s, d) => Tables.load(s, d, "documents")
      .select(col("doc_id"),
        octet_length(col("text")).cast("long").as("payload_bytes"),
        md5(col("text")).as("payload_md5"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, octet_length(encode(text)) AS payload_bytes, " +
      "md5(text) AS payload_md5 FROM documents ORDER BY doc_id"))

  /** REAL IMAGE CODEC, HASH-GATED (round 11 — closes the "media decode is
    * a stub" gap for images): per document, an 8×8 RGB image whose pixels
    * are a deterministic md5 formula of (doc_id, x, y) is PNG-ENCODED and
    * then DECODED back through the JDK's actual ImageIO codec
    * ([[graft.operators.Multimodal.ImageIoCodec]]), per-channel sums are
    * computed from the DECODED pixels, and a 4×4 nearest-neighbor RESIZE
    * ([[graft.operators.Multimodal.ImageIoCodec.resizeNearest]]) is
    * summed the same way. The DuckDB oracle computes identical statistics
    * straight from the md5 formula — no codec at all — so the hash gate
    * passing proves the real encoder+decoder reproduced EVERY pixel (PNG
    * is lossless) and the resize sampled exactly floor(x·sw/tw) grid
    * points. An in-plan round-trip check additionally raises on any
    * pixel mismatch, so a silently-lossy codec can't even reach the
    * oracle compare. mapPartitions (not a UDF): one codec context per
    * partition, the documented batching contract for wide media rows. */
  private val qImageDecode = Q(
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal.ImageIoCodec
      val (w, h) = (8, 8)
      val feats = Tables.load(s, d, "documents")
        .select(col("doc_id"))
        // the Multimodal discipline: spread rows before the codec stage —
        // the sf parquet is one file, and without this the per-row
        // encode/decode work serializes onto its few scan partitions
        // (measured 6.6 s -> ~1 s at sf0.1)
        .repartition(64, col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          // first 3 digest bytes == first 6 hex chars of md5 (the
          // oracle's substr(md5, 1..6)) — no hex string round-trip
          it.map { id =>
            val px = Array.tabulate(w * h) { i =>
              val dg = md.digest(s"$id:${i % w}:${i / w}".getBytes("UTF-8"))
              ((dg(0) & 0xff) << 16) | ((dg(1) & 0xff) << 8) | (dg(2) & 0xff)
            }
            val png = ImageIoCodec.encodePng(w, h, px)
            val (dw, dh, dp) = ImageIoCodec.decode(png).getOrElse(
              throw new IllegalStateException(s"q_image_decode: undecodable PNG for doc $id"))
            if (dw != w || dh != h || !java.util.Arrays.equals(dp, px))
              throw new IllegalStateException(
                s"q_image_decode: lossy codec round-trip for doc $id")
            val rs = ImageIoCodec.resizeNearest(dw, dh, dp, 4, 4)
            def sum(ps: Array[Int], shift: Int): Long =
              ps.foldLeft(0L)((a, p) => a + ((p >> shift) & 0xff))
            (id, dw.toLong, dh.toLong,
              sum(dp, 16), sum(dp, 8), sum(dp, 0), sum(rs, 16))
          }
        }
        .toDF("doc_id", "width", "height", "sum_r", "sum_g", "sum_b", "sum_r4")
      feats.orderBy(col("doc_id"))
    },
    Some("WITH px AS (SELECT doc_id, x, y, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 1, 2))::BIGINT AS r, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 3, 2))::BIGINT AS g, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 5, 2))::BIGINT AS b " +
      "FROM documents, (SELECT unnest(range(0, 8)) AS x) xs, (SELECT unnest(range(0, 8)) AS y) ys) " +
      "SELECT doc_id, CAST(8 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height, " +
      "CAST(SUM(r) AS BIGINT) AS sum_r, CAST(SUM(g) AS BIGINT) AS sum_g, " +
      "CAST(SUM(b) AS BIGINT) AS sum_b, " +
      "CAST(SUM(CASE WHEN x % 2 = 0 AND y % 2 = 0 THEN r ELSE 0 END) AS BIGINT) AS sum_r4 " +
      "FROM px GROUP BY doc_id ORDER BY doc_id"))

  /** IMAGE NEAR-DUP DEDUP over the REAL codec, hash-gated — the
    * image-modality analogue of q_dedup_simhash/q_simhash_pairs: groups
    * of five documents share a deterministic 16×16 base image (md5 pixel
    * formula over the group's base id) with a one-pixel per-member tweak,
    * every image goes through the REAL PNG encode→decode
    * ([[graft.operators.Multimodal.ImageIoCodec]]) and nearest-neighbor
    * 8×8 resize, gets the classic aHash perceptual fingerprint
    * ([[graft.operators.Multimodal.aHash64]] — integer luma vs integer
    * mean), and pairs within hamming ≤ 1 come from the PIGEONHOLE
    * bucketed join ([[graft.operators.Multimodal.hammingPairs64]]: two
    * 32-bit bands, a ≤1-bit difference must leave one band intact —
    * equi-join candidates, never a cartesian). The DuckDB oracle builds
    * the same 64 bits per document straight from the pixel formula (no
    * codec) and takes TRUE hamming ≤ 1 pairs — so the gate
    * simultaneously proves the codec round-trip, the resize grid, the
    * integer aHash arithmetic, and the pigeonhole construction's
    * exactness. */
  private val qImagePhashDedup = Q(
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal
      import graft.operators.Multimodal.ImageIoCodec
      val hashes = Tables.load(s, d, "documents")
        .select(col("doc_id"))
        // partition by the GROUP key: the five members of a dup group
        // land together, so the shared 256-pixel base image is computed
        // once per group (the per-partition memo below), not per member
        .repartition(64, col("doc_id") - col("doc_id") % 5)
        .as[Long]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          // first 3 digest BYTES are the first 6 hex chars — no hex
          // string round-trip (1.28M md5 calls per sf0.1 run otherwise
          // dominate the codec being measured)
          def rgb(sIn: String): Int = {
            val dg = md.digest(sIn.getBytes("UTF-8"))
            ((dg(0) & 0xff) << 16) | ((dg(1) & 0xff) << 8) | (dg(2) & 0xff)
          }
          val memo = scala.collection.mutable.Map.empty[Long, Array[Int]]
          it.map { id =>
            val src = id - id % 5
            val base = memo.getOrElseUpdate(src,
              Array.tabulate(256)(i => rgb(s"$src:${i % 16}:${i / 16}")))
            val px = base.clone()
            px(0) = px(0) ^ ((id % 5).toInt << 16) // per-member 1-pixel tweak
            val png = ImageIoCodec.encodePng(16, 16, px)
            val (dw, dh, dp) = ImageIoCodec.decode(png).getOrElse(
              throw new IllegalStateException(s"q_image_phash_dedup: undecodable PNG for $id"))
            (id, Multimodal.aHash64(ImageIoCodec.resizeNearest(dw, dh, dp, 8, 8)))
          }
        }.toDF("doc_id", "ahash")
      Multimodal.hammingPairs64(hashes, "doc_id", "ahash", maxHamming = 1)
        .orderBy(col("id_a"), col("id_b"))
    },
    Some("WITH base AS (SELECT doc_id, doc_id - doc_id % 5 AS src FROM documents), " +
      "g AS (SELECT unnest(range(0, 8)) AS v), " +
      "pxl AS (SELECT b.doc_id, gx.v AS x, gy.v AS y, " +
      "CASE WHEN gx.v = 0 AND gy.v = 0 THEN " +
      "xor(('0x' || substr(md5(b.src::VARCHAR || ':0:0'), 1, 2))::BIGINT, b.doc_id % 5) " +
      "ELSE ('0x' || substr(md5(b.src::VARCHAR || ':' || (2*gx.v)::VARCHAR || ':' || (2*gy.v)::VARCHAR), 1, 2))::BIGINT END AS r, " +
      "('0x' || substr(md5(b.src::VARCHAR || ':' || (2*gx.v)::VARCHAR || ':' || (2*gy.v)::VARCHAR), 3, 2))::BIGINT AS gc, " +
      "('0x' || substr(md5(b.src::VARCHAR || ':' || (2*gx.v)::VARCHAR || ':' || (2*gy.v)::VARCHAR), 5, 2))::BIGINT AS bc " +
      "FROM base b, g gx, g gy), " +
      "lum AS (SELECT doc_id, y*8 + x AS i, (r*299 + gc*587 + bc*114) // 1000 AS luma FROM pxl), " +
      "m AS (SELECT doc_id, SUM(luma) // 64 AS mean FROM lum GROUP BY 1), " +
      "bits AS (SELECT l.doc_id, i, CASE WHEN luma > mean THEN 1 ELSE 0 END AS bit " +
      "FROM lum l JOIN m USING (doc_id)), " +
      "ham AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, " +
      "CAST(SUM(CASE WHEN a.bit <> b.bit THEN 1 ELSE 0 END) AS BIGINT) AS hamming " +
      "FROM bits a JOIN bits b ON a.i = b.i AND a.doc_id < b.doc_id GROUP BY 1, 2) " +
      "SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 1 ORDER BY id_a, id_b"))

  /** REAL AUDIO CODEC, HASH-GATED — the audio-modality member of the
    * q_image_decode family: per document, 256 samples of 16-bit PCM from
    * a deterministic integer formula are WAV-ENCODED
    * ([[graft.operators.Multimodal.WavCodec]]: spec-exact RIFF layout)
    * and DECODED BACK through the JDK's actual AudioSystem parser; the
    * output statistics (sample count, sum, sum of squares, count of
    * sign-changes — an integer zero-crossing feature) come from the
    * DECODED samples, with an in-plan round-trip raise on any sample
    * mismatch. The DuckDB oracle computes identical statistics straight
    * from the formula — PCM is lossless, so the gate passing proves the
    * real audio parser reproduced every sample. Video remains the one
    * honestly-stubbed modality (no codec in the JDK). */
  private val qAudioDecode = Q(
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal.WavCodec
      val n = 256
      val feats = Tables.load(s, d, "documents")
        .select(col("doc_id"))
        .repartition(64, col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          // per-partition decoder: the AudioSystem static convenience
          // serializes on a synchronized global provider lookup
          val decdr = new WavCodec.Decoder
          it.map { id =>
            val samples = Array.tabulate(n)(i =>
              (((id * 31 + i.toLong * 7) % 65536L) - 32768L).toShort)
            val wav = WavCodec.encodePcm16(samples, 8000)
            val (_, dec) = decdr.decode(wav).getOrElse(
              throw new IllegalStateException(s"q_audio_decode: undecodable WAV for $id"))
            if (!java.util.Arrays.equals(dec, samples))
              throw new IllegalStateException(
                s"q_audio_decode: lossy PCM round-trip for doc $id")
            val sum = dec.foldLeft(0L)(_ + _)
            val sumSq = dec.foldLeft(0L)((a, v) => a + v.toLong * v)
            val signChanges = (1 until n).count(i =>
              (dec(i) >= 0) != (dec(i - 1) >= 0)).toLong
            (id, dec.length.toLong, sum, sumSq, signChanges)
          }
        }.toDF("doc_id", "n_samples", "sum_s", "sum_sq", "sign_changes")
      feats.orderBy(col("doc_id"))
    },
    Some("WITH sm AS (SELECT doc_id, i, (doc_id * 31 + i * 7) % 65536 - 32768 AS v " +
      "FROM documents, (SELECT unnest(range(0, 256)) AS i) t) " +
      "SELECT doc_id, CAST(count(*) AS BIGINT) AS n_samples, " +
      "CAST(SUM(v) AS BIGINT) AS sum_s, CAST(SUM(v * v) AS BIGINT) AS sum_sq, " +
      "CAST(SUM(CASE WHEN i > 0 AND ((v >= 0) <> " +
      "((doc_id * 31 + (i - 1) * 7) % 65536 - 32768 >= 0)) THEN 1 ELSE 0 END) AS BIGINT) AS sign_changes " +
      "FROM sm GROUP BY doc_id ORDER BY doc_id"))

  /** MULTI-FRAME DECODE + FRAME SAMPLING over a real container, hash-gated
    * — the video-surface member of the q_image/q_audio_decode family: per
    * document an ANIMATED GIF of four 8×8 md5-formula frames is written
    * through the JDK's GIF writer and read back frame-by-frame through
    * the JDK's GIF reader ([[graft.operators.Multimodal.GifAnimCodec]] —
    * ≤64 colors per frame palettizes losslessly), frames 0 and 2 are
    * SAMPLED (stride 2 — the frame-sample stage running against a real
    * multi-frame payload, not a byte-window fake), and their channel sums
    * come from the DECODED pixels with an in-plan raise on any pixel
    * mismatch. The DuckDB oracle computes identical sums straight from
    * the formula at frames 0 and 2. True interframe codecs stay honestly
    * out of scope (nothing in the JDK decodes them). */
  private val qVideoFrames = Q(
    (s, d) => {
      import s.implicits._
      import graft.operators.Multimodal.GifAnimCodec
      val (w, h, nf) = (8, 8, 4)
      val feats = Tables.load(s, d, "documents")
        .select(col("doc_id"))
        .repartition(64, col("doc_id"))
        .as[Long]
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          // per-PARTITION codec handles: per-row ImageIO writer/reader
          // construction contends on the global SPI registry across the
          // executor threads (measured: the row ran at single-thread
          // speed) — this is exactly the per-partition init the
          // Multimodal mapPartitions contract exists for
          val enc = new GifAnimCodec.Encoder
          val decdr = new GifAnimCodec.Decoder
          def rgb(sIn: String): Int = {
            val dg = md.digest(sIn.getBytes("UTF-8"))
            ((dg(0) & 0xff) << 16) | ((dg(1) & 0xff) << 8) | (dg(2) & 0xff)
          }
          it.map { id =>
            val frames = (0 until nf).map(f =>
              Array.tabulate(w * h)(i => rgb(s"$id:$f:${i % w}:${i / w}")))
            val gif = enc.encode(w, h, frames)
            val dec = decdr.decodeFrames(gif).getOrElse(
              throw new IllegalStateException(s"q_video_frames: undecodable GIF for $id"))
            if (dec.length != nf || dec.zip(frames).exists { case ((dw, dh, dp), src) =>
                dw != w || dh != h || !java.util.Arrays.equals(dp, src) })
              throw new IllegalStateException(
                s"q_video_frames: lossy frame round-trip for doc $id")
            // frame-sample: stride-2 over the decoded sequence
            def sums(f: Int): (Long, Long, Long) = {
              val px = dec(f)._3
              (px.foldLeft(0L)((a, p) => a + ((p >> 16) & 0xff)),
                px.foldLeft(0L)((a, p) => a + ((p >> 8) & 0xff)),
                px.foldLeft(0L)((a, p) => a + (p & 0xff)))
            }
            val (r0, g0, b0) = sums(0)
            val (r2, g2, b2) = sums(2)
            (id, dec.length.toLong, r0, g0, b0, r2, g2, b2)
          }
        }.toDF("doc_id", "n_frames", "sum_r_f0", "sum_g_f0", "sum_b_f0",
          "sum_r_f2", "sum_g_f2", "sum_b_f2")
      feats.orderBy(col("doc_id"))
    },
    Some("WITH px AS (SELECT doc_id, f, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || f::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 1, 2))::BIGINT AS r, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || f::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 3, 2))::BIGINT AS g, " +
      "('0x' || substr(md5(doc_id::VARCHAR || ':' || f::VARCHAR || ':' || x::VARCHAR || ':' || y::VARCHAR), 5, 2))::BIGINT AS b " +
      "FROM documents, (SELECT unnest([0, 2]) AS f) fs, " +
      "(SELECT unnest(range(0, 8)) AS x) xs, (SELECT unnest(range(0, 8)) AS y) ys) " +
      "SELECT doc_id, CAST(4 AS BIGINT) AS n_frames, " +
      "CAST(SUM(CASE WHEN f = 0 THEN r ELSE 0 END) AS BIGINT) AS sum_r_f0, " +
      "CAST(SUM(CASE WHEN f = 0 THEN g ELSE 0 END) AS BIGINT) AS sum_g_f0, " +
      "CAST(SUM(CASE WHEN f = 0 THEN b ELSE 0 END) AS BIGINT) AS sum_b_f0, " +
      "CAST(SUM(CASE WHEN f = 2 THEN r ELSE 0 END) AS BIGINT) AS sum_r_f2, " +
      "CAST(SUM(CASE WHEN f = 2 THEN g ELSE 0 END) AS BIGINT) AS sum_g_f2, " +
      "CAST(SUM(CASE WHEN f = 2 THEN b ELSE 0 END) AS BIGINT) AS sum_b_f2 " +
      "FROM px GROUP BY doc_id ORDER BY doc_id"))

  /** AS-OF JOIN — purchase attribution: for every purchase event, the most
    * recent PRIOR (ts <= purchase ts) non-purchase event of the same user.
    * The Spark plan is [[graft.operators.Ops.asofJoin]]'s single-shuffle
    * sort-merge shape; the oracle is the declarative form (LEFT JOIN
    * LATERAL ... ORDER BY ts DESC LIMIT 1), so the gate proves the
    * running-window implementation equals the point-in-time lookup
    * semantics, including unmatched-left nulls and the max-event_id
    * tie-break. Timestamps are emitted as epoch micros (both engines
    * truncate the parquet nanos identically). */
  private val qAsofAttrib = Q(
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val others = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      graft.operators.Ops.asofJoin(purchases, others, Seq("user_id"),
          "ts", "ts", tieBreak = Seq("event_id"))
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof.event_id").as("prev_event_id"),
          unix_micros(col("asof.ts")).as("prev_ts_us"),
          col("asof.event_type").as("prev_type"))
        .orderBy(col("event_id"))
    },
    Some("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "o AS (SELECT user_id, ts, event_id, event_type FROM events WHERE event_type <> 'purchase') " +
      "SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, " +
      "l.prev_event_id, l.prev_ts_us, l.prev_type " +
      "FROM p LEFT JOIN LATERAL (" +
      "SELECT o.event_id AS prev_event_id, epoch_us(o.ts) AS prev_ts_us, o.event_type AS prev_type " +
      "FROM o WHERE o.user_id = p.user_id AND o.ts <= p.ts " +
      "ORDER BY o.ts DESC, o.event_id DESC LIMIT 1) l ON TRUE " +
      "ORDER BY event_id"))

  /** FORWARD AS-OF JOIN — the symmetric completion of [[qAsofAttrib]]:
    * for every purchase, the EARLIEST following (ts >= purchase ts)
    * non-purchase event of the same user — "what did the user do next".
    * Same single-shuffle union+running-window machinery scanning time
    * reversed (`direction = "forward"`); the oracle mirrors the lateral
    * lookup with `ts >= … ORDER BY ts ASC, event_id DESC LIMIT 1`, so the
    * gate pins equal-ts inclusivity, the tie rule, and unmatched-left
    * nulls in the forward direction too. */
  private val qAsofForward = Q(
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val others = ev.filter(col("event_type") =!= "purchase")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      graft.operators.Ops.asofJoin(purchases, others, Seq("user_id"),
          "ts", "ts", tieBreak = Seq("event_id"), direction = "forward")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("ts_us"),
          col("asof.event_id").as("next_event_id"),
          unix_micros(col("asof.ts")).as("next_ts_us"),
          col("asof.event_type").as("next_type"))
        .orderBy(col("event_id"))
    },
    Some("WITH p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'), " +
      "o AS (SELECT user_id, ts, event_id, event_type FROM events WHERE event_type <> 'purchase') " +
      "SELECT p.event_id, p.user_id, epoch_us(p.ts) AS ts_us, " +
      "l.next_event_id, l.next_ts_us, l.next_type " +
      "FROM p LEFT JOIN LATERAL (" +
      "SELECT o.event_id AS next_event_id, epoch_us(o.ts) AS next_ts_us, o.event_type AS next_type " +
      "FROM o WHERE o.user_id = p.user_id AND o.ts >= p.ts " +
      "ORDER BY o.ts ASC, o.event_id DESC LIMIT 1) l ON TRUE " +
      "ORDER BY event_id"))

  /** INTERVAL JOIN — view→click attribution: every (view, click) pair of
    * the same user where the click lands within two hours AFTER the view
    * (exclusive of the view instant). Unlike [[qAsofAttrib]] (one match
    * per row) this emits ALL window matches. The Spark plan is
    * [[graft.operators.Ops.intervalJoin]]'s time-bucketed equi-join —
    * the shuffle key is (user_id, time-bucket), so a hot user's pairs
    * scatter across its time range instead of one task — while the oracle
    * is the declarative theta-join; the gate proves bucket replication +
    * residual filtering loses and duplicates nothing at the bucket
    * boundaries. Both sides compare epoch MICROS (the parquet nanos
    * truncate identically in Tables.load and epoch_us). */
  private val qIntervalJoin = Q(
    (s, d) => {
      val ev = Tables.load(s, d, "events")
      val views = ev.filter(col("event_type") === "view")
        .select(col("event_id").as("view_id"), col("user_id"), col("ts").as("v_ts"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("c_ts"))
      graft.operators.Ops.intervalJoin(views, clicks, Seq("user_id"),
          "v_ts", "c_ts", lowerUs = 0L, upperUs = 2L * 3600L * 1000000L)
        .select(col("view_id"), col("click_id"), col("user_id"),
          (unix_micros(col("c_ts")) - unix_micros(col("v_ts"))).as("delta_us"))
        .orderBy(col("view_id"), col("click_id"))
    },
    Some("SELECT v.event_id AS view_id, c.event_id AS click_id, " +
      "v.user_id AS user_id, epoch_us(c.ts) - epoch_us(v.ts) AS delta_us " +
      "FROM events v JOIN events c ON v.user_id = c.user_id " +
      "AND v.event_type = 'view' AND c.event_type = 'click' " +
      "AND epoch_us(c.ts) > epoch_us(v.ts) " +
      "AND epoch_us(c.ts) <= epoch_us(v.ts) + 7200000000 " +
      "ORDER BY view_id, click_id"))

  /** Corpus vocabulary ([[graft.operators.TextAnalysis.vocabulary]]):
    * token term/doc frequencies at min-count 5, the tokenizer-training
    * corpus-stats pass. One map-side-combined aggregation; output is
    * vocabulary-sized regardless of corpus size. */
  private val qVocabulary = Q(
    (s, d) => graft.operators.TextAnalysis.vocabulary(
        Tables.load(s, d, "documents"), "doc_id", "text", minCount = 5L)
      .orderBy(col("term_freq").desc, col("tok")),
    Some("WITH toks AS (SELECT doc_id, " +
      "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents) " +
      "SELECT tok, count(*) AS term_freq, count(DISTINCT doc_id) AS doc_freq " +
      "FROM toks WHERE tok <> '' GROUP BY tok HAVING count(*) >= 5 " +
      "ORDER BY term_freq DESC, tok"))

  /** K-MEANS cluster assignment ([[graft.operators.Clustering]]): Lloyd's
    * algorithm, k=8, 2 update iterations from the 8 smallest-id seeds, in
    * FIXED-POINT arithmetic (trunc(x·10⁶) int64 vectors, exact integer
    * distances, floor-divided integer centroid means) — so the full
    * iterative algorithm is bit-identical in any engine and the oracle is
    * the same two Lloyd iterations written as SQL CTEs. This is the
    * curation primitive behind semantic dedup and diversity-balanced
    * sampling; determinism-by-construction is what makes a 100 TB
    * clustering job reproducible. */
  /** Shared k-means oracle CTE chain (k=8, 2 Lloyd iterations — must match
    * every registered kmeans query's parameters): quantized vectors `q`,
    * dimension table `dims`, seed centroids `c0`, two unrolled rounds
    * (d/a/m/c per round: distances, argmin assignment with ties → smallest
    * cluster, floor-mean update, empty clusters keeping their previous
    * centroid), final distances `df`, and the final assignment `asg`. */
  private[graft] val KmeansSqlWith: String = {
    def round(n: Int, cdims: String): String =
      s"d$n AS (SELECT d.vec_id, cd.c, SUM((d.x - cd.y) * (d.x - cd.y)) AS dd " +
      s"FROM dims d JOIN $cdims cd USING (i) GROUP BY d.vec_id, cd.c), " +
      s"a$n AS (SELECT vec_id, c FROM (SELECT vec_id, c, " +
      s"row_number() OVER (PARTITION BY vec_id ORDER BY dd, c) AS rn FROM d$n) WHERE rn = 1), " +
      s"m$n AS (SELECT a.c, d.i, CAST(floor(CAST(SUM(d.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS y " +
      s"FROM dims d JOIN a$n a USING (vec_id) GROUP BY a.c, d.i), " +
      s"c$n AS (SELECT s.c, s.i, COALESCE(m.y, s.y) AS y " +
      s"FROM $cdims s LEFT JOIN m$n m ON s.c = m.c AND s.i = m.i)"
    "WITH q AS (SELECT vec_id, list_transform(embedding::DOUBLE[], " +
      "x -> CAST(trunc(x * 1000000e0) AS BIGINT)) AS v FROM embeddings), " +
      "dims AS (SELECT vec_id, unnest(v) AS x, unnest(range(1, len(v) + 1)) AS i FROM q), " +
      "c0 AS (SELECT c, unnest(v) AS y, unnest(range(1, len(v) + 1)) AS i " +
      "FROM (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v FROM q) WHERE c < 8), " +
      round(1, "c0") + ", " + round(2, "c1") + ", " +
      "df AS (SELECT d.vec_id, cd.c, SUM((d.x - cd.y) * (d.x - cd.y)) AS dd " +
      "FROM dims d JOIN c2 cd USING (i) GROUP BY d.vec_id, cd.c), " +
      "asg AS (SELECT vec_id, CAST(c AS INT) AS cluster, CAST(dd AS BIGINT) AS dist2 " +
      "FROM (SELECT vec_id, c, dd, row_number() OVER (PARTITION BY vec_id ORDER BY dd, c) AS rn " +
      "FROM df) WHERE rn = 1)"
  }

  /** Memo key for the k-means model family (the [[QueriesCuration]]
    * clfKey contract: corpus fingerprint + every parameter shaping the
    * training) — q_kmeans_assign, q_semdedup, q_cluster_sample and
    * q_silhouette all train the SAME k=8/2-round model, so the collect
    * rounds run once per corpus and siblings pay assignment only. */
  private[graft] def kmeansKey(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/embeddings.parquet", "kmeans|k=8|i=2|s=1e6")

  private val qKmeansAssign = Q(
    (s, d) => graft.operators.Clustering.kmeansAssign(
        Tables.load(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2,
        memoKey = Some(kmeansKey(s, d)))
      .orderBy(col("vec_id")),
    Some(KmeansSqlWith +
      " SELECT vec_id, cluster, dist2 FROM asg ORDER BY vec_id"))

  /** SEMDEDUP ([[graft.operators.Similarity.semDedup]]): k-means clusters
    * (the exact fixed-point construction gated by q_kmeans_assign), then
    * within each cluster every vector with a smaller-id neighbor at rounded
    * cosine ≥ 0.45 is dropped. The oracle reuses the same unrolled-Lloyd
    * CTEs plus a correlated NOT EXISTS over raw double cosines — the gate
    * proves the whole pipeline (clustering + cluster-restricted pair stage
    * + survivor anti-join) is bit-identical cross-engine. The quadratic
    * compare is cluster-bounded (Σ|cluster|² ≈ n²/k), which is the entire
    * point of SemDeDup at 100 TB. */
  private val qSemDedup = Q(
    (s, d) => Similarity.semDedup(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", k = 8, iters = 2, threshold = 0.45,
        kmeansMemoKey = Some(kmeansKey(s, d)))
      .orderBy(col("vec_id")),
    Some(KmeansSqlWith +
      ", e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings) " +
      "SELECT a.vec_id AS vec_id, a.cluster FROM asg a JOIN e ea ON ea.vec_id = a.vec_id " +
      "WHERE NOT EXISTS (SELECT 1 FROM asg b JOIN e eb ON eb.vec_id = b.vec_id " +
      "WHERE b.cluster = a.cluster AND b.vec_id < a.vec_id " +
      "AND " + cosSql("ea.v", "eb.v") + " >= 0.45e0) " +
      "ORDER BY a.vec_id"))

  /** Per-user OLS value trend ([[graft.operators.Profiler.groupTrend]]):
    * slope/intercept of event value over the hour index, from exact
    * DECIMAL(18,4) moments (value carries ≤3 decimals — the
    * q_rolling_range precision note) in one grouped pass. */
  private val qUserTrend = Q(
    // DAY index, not hour: the hour index's decimal square overflows
    // DuckDB's int64 decimal arithmetic (internal 4.7e9² > 2⁶³); day
    // squares stay comfortably inside for both engines
    (s, d) => graft.operators.Profiler.groupTrend(
        Tables.load(s, d, "events").filter(col("value").isNotNull)
          .select(col("user_id"),
            floor(unix_micros(col("ts")) / lit(86400000000L)).as("day"),
            col("value")),
        "user_id", "day", "value", yScale = 4)
      .orderBy(col("user_id")),
    Some("WITH e AS (SELECT user_id, floor(epoch_us(ts) / 86400000000) AS x, value AS y " +
      "FROM events WHERE value IS NOT NULL), " +
      "mom AS (SELECT user_id, count(*) AS n, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sx, " +
      "CAST(SUM(CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sy, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(y AS DECIMAL(18,4))) AS DOUBLE) AS sxy, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,0)) * CAST(x AS DECIMAL(18,0))) AS DOUBLE) AS sxx " +
      "FROM e GROUP BY user_id) " +
      "SELECT user_id, n, " +
      "round(CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) = 0.0e0 THEN NULL " +
      "ELSE (CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx) END, 6) AS slope, " +
      "round(CASE WHEN (CAST(n AS DOUBLE) * sxx - sx * sx) = 0.0e0 THEN NULL " +
      "ELSE (sy - ((CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx) " +
      "/ CAST(n AS DOUBLE) END, 6) AS intercept " +
      "FROM mom ORDER BY user_id"))

  /** FUNNEL ANALYSIS — the ordered-step conversion staple: how many users
    * viewed, then clicked AFTER their first view, then purchased AFTER
    * that click. Per user: first view ts, first click ts strictly after
    * it, first purchase ts strictly after that — three conditional
    * min-aggregations, the middle two needing the previous stage's
    * result, so the plan is one user-grain aggregation plus two
    * user-keyed self-aggregation joins (each shuffles user grain, never
    * event grain, after the first). The oracle chains the same three
    * stages as CTEs. Output: one row of stage counts. */
  private val qFunnel = Q(
    (s, d) => {
      val ev = Tables.load(s, d, "events")
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val va = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t_view"))
      val cb = ev.filter(col("event_type") === "click")
        .join(va, "user_id").filter(col("us") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
      val pc = ev.filter(col("event_type") === "purchase")
        .join(cb, "user_id").filter(col("us") > col("t_click"))
        .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
      va.agg(count(lit(1)).as("n_view"))
        .crossJoin(cb.agg(count(lit(1)).as("n_click_after")))
        .crossJoin(pc.agg(count(lit(1)).as("n_purchase_after")))
    },
    Some("WITH va AS (SELECT user_id, min(epoch_us(ts)) AS t_view FROM events " +
      "WHERE event_type = 'view' GROUP BY user_id), " +
      "cb AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_click FROM events e " +
      "JOIN va ON e.user_id = va.user_id " +
      "WHERE e.event_type = 'click' AND epoch_us(e.ts) > va.t_view GROUP BY e.user_id), " +
      "pc AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_purchase FROM events e " +
      "JOIN cb ON e.user_id = cb.user_id " +
      "WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > cb.t_click GROUP BY e.user_id) " +
      "SELECT (SELECT count(*) FROM va) AS n_view, " +
      "(SELECT count(*) FROM cb) AS n_click_after, " +
      "(SELECT count(*) FROM pc) AS n_purchase_after"))

  /** COHORT RETENTION — the other dashboard staple: users grouped by
    * first-activity week (cohort), counted by distinct activity in each
    * subsequent week offset. One user-grain first-activity aggregation,
    * joined back (user-keyed) onto events, then a (cohort, offset)
    * distinct-count — the standard two-shuffle plan. Weeks are epoch
    * micros `div` 7 days — INTEGER division on both engines (Spark `div`,
    * DuckDB `//`): `floor(long / long)` routes through double division and
    * Spark's `floor(double)` is LONG while DuckDB's is DOUBLE, so the week
    * column hashed differently (the round-6 red row). Timestamps are
    * post-epoch, so truncating and flooring division coincide. */
  private val qCohortRetention = Q(
    (s, d) => {
      val ev = Tables.load(s, d, "events").select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
      ev.join(first, "user_id")
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("wk_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("cohort_wk"), col("wk_offset"))
    },
    Some("WITH e AS (SELECT user_id, epoch_us(ts) // 604800000000 AS wk FROM events), " +
      "f AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY user_id) " +
      "SELECT cohort_wk, wk - cohort_wk AS wk_offset, count(DISTINCT e.user_id) AS n_users " +
      "FROM e JOIN f ON e.user_id = f.user_id GROUP BY cohort_wk, wk_offset " +
      "ORDER BY cohort_wk, wk_offset"))

  /** Gini concentration ([[graft.operators.Profiler.gini]]) of document
    * character mass per source: the corpus-audit inequality metric; the
    * oracle re-derives ranks, exact long sums, and the mirrored formula. */
  private val qGini = Q(
    (s, d) => graft.operators.Profiler.gini(
        Tables.load(s, d, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars")
      .orderBy(col("source")),
    Some("WITH r AS (SELECT source, n_chars, " +
      "CAST(row_number() OVER (PARTITION BY source ORDER BY n_chars) AS BIGINT) AS rk " +
      "FROM documents WHERE n_chars IS NOT NULL), " +
      "a AS (SELECT source, count(*) AS n, CAST(SUM(n_chars) AS BIGINT) AS sx, " +
      "CAST(SUM(rk * n_chars) AS BIGINT) AS srx FROM r GROUP BY source) " +
      "SELECT source, n, " +
      "round((2.0e0 * CAST(srx AS DOUBLE)) / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)) " +
      "- CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS gini " +
      "FROM a ORDER BY source"))

  /** Winsorized mean ([[graft.operators.Profiler.winsorizedMean]]) of
    * document length per source at α = 1/20: the clip ranks are integer
    * arithmetic (`(n+19) div 20` ≡ DuckDB `(n+19) // 20`), the bounds are
    * rank-picked values (tie-safe), sums are exact longs, and only the
    * final division is floating — mirrored, round(6). */
  private val qWinsorized = Q(
    (s, d) => graft.operators.Profiler.winsorizedMean(
        Tables.load(s, d, "documents").select(col("source"), col("n_chars")),
        "source", "n_chars")
      .orderBy(col("source")),
    Some("WITH r AS (SELECT source, n_chars, row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rk " +
      "FROM documents WHERE n_chars IS NOT NULL), " +
      "b AS (SELECT source, count(*) AS n, (count(*) + 19) // 20 AS klo FROM r GROUP BY source), " +
      "bd AS (SELECT b.source, b.n, MAX(CASE WHEN r.rk = b.klo THEN r.n_chars END) AS lo, " +
      "MAX(CASE WHEN r.rk = b.n + 1 - b.klo THEN r.n_chars END) AS hi " +
      "FROM r JOIN b USING (source) GROUP BY b.source, b.n) " +
      "SELECT d.source, n, lo, hi, " +
      "round(CAST(SUM(LEAST(GREATEST(d.n_chars, lo), hi)) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS winsorized_mean " +
      "FROM documents d JOIN bd ON d.source = bd.source WHERE d.n_chars IS NOT NULL " +
      "GROUP BY d.source, n, lo, hi ORDER BY d.source"))

  /** Distribution drift ([[graft.operators.Profiler.distributionDrift]]):
    * PSI + KL of the document-length distribution between the src0-9 and
    * src10-19 snapshot halves, 50-char bins. Integer-ratio ln (one libm
    * call, round(6)), Laplace smoothing over the observed bin union,
    * decimal-exact headline sums of the rounded terms. */
  private val qDriftPsi = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val sid = expr("CAST(substring(source, 4, 8) AS INT)")
      graft.operators.Profiler.distributionDrift(
        docs.filter(sid < 10), docs.filter(sid >= 10), "n_chars", 50L)
    },
    Some("WITH ca AS (SELECT n_chars // 50 AS bin, count(*) AS n_a FROM documents " +
      "WHERE CAST(substr(source, 4) AS INT) < 10 AND n_chars IS NOT NULL GROUP BY 1), " +
      "cb AS (SELECT n_chars // 50 AS bin, count(*) AS n_b FROM documents " +
      "WHERE CAST(substr(source, 4) AS INT) >= 10 AND n_chars IS NOT NULL GROUP BY 1), " +
      "j AS (SELECT COALESCE(ca.bin, cb.bin) AS bin, COALESCE(n_a, 0) AS n_a, " +
      "COALESCE(n_b, 0) AS n_b FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin), " +
      "st AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b, count(*) AS nbins FROM j), " +
      "t AS (SELECT bin, n_a, n_b, " +
      "round((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + nbins AS DOUBLE) " +
      "- CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + nbins AS DOUBLE)) " +
      "* ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS psi_term, " +
      "round(CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + nbins AS DOUBLE) " +
      "* ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS kl_term " +
      "FROM j CROSS JOIN st) " +
      "SELECT bin, n_a, n_b, psi_term, kl_term, " +
      "CAST(SUM(CAST(psi_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS psi, " +
      "CAST(SUM(CAST(kl_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS kl " +
      "FROM t ORDER BY bin"))

  /** Trailing 7-day z-score anomaly flags
    * ([[graft.operators.Profiler.rollingZscore]]) on daily revenue per
    * event type: integer cent moments inside the ordered frame, z is one
    * exact division over one IEEE sqrt — bit-identical cross-engine, so
    * the |z| > 2 flag can never straddle the oracle. Warm-up and
    * zero-variance rows are NULL z / false. */
  private val qRollingZscore = Q(
    (s, d) => graft.operators.Profiler.rollingZscore(
        Tables.load(s, d, "events")
          .select(col("event_type"), expr("unix_micros(ts) div 86400000000").as("day"), col("value"))
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("x")),
        "event_type", "day", "x", n = 7)
      .orderBy(col("event_type"), col("day")),
    Some("WITH dly AS (SELECT event_type, epoch_us(ts) // 86400000000 AS day, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS x FROM events GROUP BY 1, 2), " +
      "u AS (SELECT event_type, day, x, CAST(CAST(x AS DECIMAL(18,2)) * 100 AS BIGINT) AS xu FROM dly), " +
      "m AS (SELECT event_type, day, x, xu, count(xu) OVER w AS c, " +
      "SUM(xu) OVER w AS s, SUM(xu * xu) OVER w AS q FROM u " +
      "WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)), " +
      "z AS (SELECT event_type, day, x, " +
      "CASE WHEN c = 7 AND c * q - s * s > 0 THEN " +
      "round(CAST(c * xu - s AS DOUBLE) / sqrt(CAST(c * q - s * s AS DOUBLE)), 6) END AS z " +
      "FROM m) " +
      "SELECT event_type, day, x, z, COALESCE(abs(z) > 2.0e0, false) AS is_anomaly " +
      "FROM z ORDER BY event_type, day"))

  /** Exact-sum Pearson correlation
    * ([[graft.operators.Profiler.pearson]]) over three lineitem pairs in
    * one pass: correlation is scale-invariant, so values lift exactly to
    * value·100 LONGs (≤2-decimal money/rate columns) and the six moments
    * per pair are integer multiply-sums at DECIMAL scale 0 — exact at any
    * partitioning, one correctly-rounded int→double conversion per moment
    * on both engines, and ~5× cheaper than decimal-moment arithmetic. The
    * final formula is mirrored operand-for-operand, round(6) soaks sqrt
    * ulp drift. */
  private val qCorrelation = Q(
    (s, d) => graft.operators.Profiler.pearson(
        Tables.load(s, d, "lineitem"),
        Seq(("l_quantity", "l_extendedprice"),
          ("l_quantity", "l_discount"),
          ("l_extendedprice", "l_discount")))
      .orderBy(col("x_col"), col("y_col")),
    Some {
      def lng(c: String) = s"CAST(CAST($c AS DECIMAL(18,2)) * 100 AS BIGINT)"
      // hi/lo split at 2^30 mirrored from Profiler.pearson: hi sums and lo
      // sums are exact BIGINTs; hi*2^30 is an exact double multiply, so
      // each rebuilt moment carries exactly one rounding on both engines
      def m(x: String, y: String) = {
        def p(a: String, b: String, n: String) =
          s"CAST(SUM((${lng(a)} * ${lng(b)}) >> 30) AS DOUBLE) * 1073741824e0 + " +
          s"CAST(SUM((${lng(a)} * ${lng(b)}) & 1073741823) AS DOUBLE) AS $n"
        s"SELECT '$x' AS x_col, '$y' AS y_col, count(*) AS n, " +
        s"CAST(SUM(${lng(x)}) AS DOUBLE) AS sx, " +
        s"CAST(SUM(${lng(y)}) AS DOUBLE) AS sy, " +
        s"${p(x, y, "sxy")}, ${p(x, x, "sxx")}, ${p(y, y, "syy")} " +
        s"FROM lineitem WHERE $x IS NOT NULL AND $y IS NOT NULL"
      }
      "WITH mom AS (" +
        Seq(m("l_quantity", "l_extendedprice"), m("l_quantity", "l_discount"),
          m("l_extendedprice", "l_discount")).mkString(" UNION ALL ") + ") " +
        "SELECT x_col, y_col, n, " +
        "round(CASE WHEN (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * " +
        "sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) = 0.0e0 THEN NULL " +
        "ELSE (CAST(n AS DOUBLE) * sxy - sx * sy) / " +
        "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END, 6) AS corr " +
        "FROM mom ORDER BY x_col, y_col"
    })

  /** Exact kNN graph ([[Similarity.knnGraph]], k=3): every vector's three
    * nearest neighbors with deterministic (cosine desc, id) ranks; the
    * oracle is the declarative window over all pairs. At corpus scale the
    * same scoring+window tail runs on banded-LSH / IVF candidates. */
  private val qKnnGraph = Q(
    (s, d) => Similarity.knnGraph(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", k = 3)
      .orderBy(col("vec_id"), col("rank")),
    Some("WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "s AS (SELECT q.vec_id AS q_id, c.vec_id AS neighbor_id, " +
      cosSql("q.v", "c.v") + " AS cosine " +
      "FROM e q JOIN e c ON c.vec_id <> q.vec_id) " +
      "SELECT q_id AS vec_id, neighbor_id, cosine, rank FROM (" +
      "SELECT q_id, neighbor_id, cosine, " +
      "CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, neighbor_id) AS BIGINT) AS rank " +
      "FROM s) WHERE rank <= 3 ORDER BY vec_id, rank"))

  /** Span corruption ([[TextAnalysis.spanCorrupt]], spanLen=5): the
    * T5-style denoising dataset, span position a pure hash function of
    * the doc id. The oracle rebuilds slices and sentinels with DuckDB's
    * inclusive-end list_slice mapped index-for-index onto Spark's
    * length-based slice. */
  private val qSpanCorrupt = Q(
    (s, d) => TextAnalysis.spanCorrupt(Tables.load(s, d, "documents"),
        "doc_id", "text", spanLen = 5)
      .orderBy(col("doc_id")),
    Some("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws " +
      "FROM documents WHERE trim(text) <> ''), " +
      "p AS (SELECT doc_id, ws, len(ws) AS n, " +
      "('0x' || substr(md5(doc_id::VARCHAR || '|graft-span'), 1, 8))::BIGINT % (len(ws) - 5) AS st " +
      "FROM w WHERE len(ws) > 6) " +
      "SELECT doc_id, n AS n_tokens, st AS span_start, " +
      "array_to_string(list_concat(list_concat(list_slice(ws, 1, st), ['<extra_id_0>']), " +
      "list_slice(ws, st + 6, n)), ' ') AS input, " +
      "array_to_string(list_concat(['<extra_id_0>'], list_slice(ws, st + 1, st + 5)), ' ') AS target " +
      "FROM p ORDER BY doc_id"))

  /** Deterministic negative sampling
    * ([[graft.operators.Sampling.negativeSample]], n=5) for a demo cohort
    * (custkey < 100) against the part catalog: positives are the parts
    * each customer actually ordered; negatives are the first five
    * never-ordered parts in portable-hash order. The oracle re-derives
    * hash order, anti-join, and ranks in SQL — the sample is a pure
    * function of (user, catalog, salt) on any engine. */
  private val qNegativeSample = Q(
    (s, d) => {
      val pos = Tables.load(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_custkey").as("user_id"))
        .join(Tables.load(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey").as("item_id")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("user_id"), col("item_id"))
      graft.operators.Sampling.negativeSample(pos, "user_id", "item_id",
          Tables.load(s, d, "part").select(col("p_partkey").as("item_id")), n = 5)
        .orderBy(col("user_id"), col("rank"))
    },
    Some("WITH pos AS (SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_custkey < 100), " +
      "users AS (SELECT DISTINCT user_id FROM pos), " +
      "cand AS (SELECT user_id, p_partkey AS item_id, " +
      "md5(user_id::VARCHAR || '|' || p_partkey::VARCHAR || '|graft-neg') AS h " +
      "FROM users CROSS JOIN part), " +
      "neg AS (SELECT user_id, item_id, h FROM cand c WHERE NOT EXISTS " +
      "(SELECT 1 FROM pos WHERE pos.user_id = c.user_id AND pos.item_id = c.item_id)) " +
      "SELECT user_id, item_id, CAST(rn AS BIGINT) AS rank FROM (" +
      "SELECT user_id, item_id, row_number() OVER (PARTITION BY user_id ORDER BY h, item_id) AS rn " +
      "FROM neg) WHERE rn <= 5 ORDER BY user_id, rank"))

  /** MaxSim late-interaction retrieval ([[Similarity.maxSimTopK]],
    * ColBERT recipe): pseudo-docs of 5 token vectors (`vec_id div 5`),
    * query = doc 0's tokens, score = Σ_q max_t cos(q,t) in exact
    * micro-unit LONG arithmetic (trunc quantization — the
    * [[Clustering]]/int8 convention), only the final /1e6 floating. The
    * oracle re-derives the two-level max/sum declaratively. */
  private val qMaxsimTopk = Q(
    (s, d) => {
      val toks = Tables.load(s, d, "embeddings")
        .withColumn("doc", expr("vec_id div 5"))
      Similarity.maxSimTopK(
        toks.filter(col("doc") =!= 0).select(col("doc"), col("embedding")),
        "doc", "embedding",
        toks.filter(col("doc") === 0).select(col("vec_id"), col("embedding")),
        "vec_id", k = 10)
    },
    Some("WITH t AS (SELECT vec_id // 5 AS doc, vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT vec_id AS qtok, v AS qv FROM t WHERE doc = 0), " +
      "s AS (SELECT t.doc, q.qtok, " +
      "CAST(trunc((list_dot_product(t.v, q.qv) / " +
      "(sqrt(list_dot_product(t.v, t.v)) * sqrt(list_dot_product(q.qv, q.qv)))) * 1000000e0) AS BIGINT) AS qc " +
      "FROM t CROSS JOIN q WHERE t.doc <> 0), " +
      "m AS (SELECT doc, qtok, max(qc) AS mx FROM s GROUP BY doc, qtok) " +
      "SELECT doc, CAST(SUM(mx) AS DOUBLE) / 1000000e0 AS maxsim, count(*) AS n_qtok " +
      "FROM m GROUP BY doc ORDER BY maxsim DESC, doc LIMIT 10"))

  /** Hard-negative mining ([[Similarity.hardNegatives]], k=5) for a
    * 20-anchor training batch: per anchor, the five most cosine-similar
    * corpus vectors with a DIFFERENT label — the contrastive-training
    * negatives near the decision boundary. Oracle: label-filtered join +
    * the kNN window. */
  private val qHardNegatives = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
          emb.filter(col("vec_id") < 20), k = 5)
        .orderBy(col("anchor_id"), col("rank"))
    },
    Some("WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings), " +
      "a AS (SELECT vec_id AS anchor_id, label AS albl, v AS av FROM e WHERE vec_id < 20), " +
      "s AS (SELECT a.anchor_id, e.vec_id AS neg_id, " +
      cosSql("e.v", "a.av") + " AS cosine FROM e JOIN a ON e.label <> a.albl) " +
      "SELECT anchor_id, neg_id, cosine, rank FROM (" +
      "SELECT anchor_id, neg_id, cosine, " +
      "CAST(row_number() OVER (PARTITION BY anchor_id ORDER BY cosine DESC, neg_id) AS BIGINT) AS rank " +
      "FROM s) WHERE rank <= 5 ORDER BY anchor_id, rank"))

  /** Hybrid-retrieval fusion ([[graft.operators.Ops.rrfFuse]]): the BM25
    * lexical top-10 (the `q_bm25_topk` probe) ⊕ the cosine vector top-10
    * (the `q_ann_brute_topk` anchor) merged by reciprocal rank — the
    * public RRF recipe, rank-based so the incomparable score scales need
    * no calibration. Shared id space: `vec_id` ≡ `doc_id` in the
    * testdata. The oracle chains both ranking derivations as CTEs and
    * the full-outer fusion arithmetic term-for-term. */
  private val qRrfHybrid = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val bm = TextAnalysis.bm25TopK(Tables.load(s, d, "documents"),
          "doc_id", "text", Seq("hash", "join", "spark", "window"), k = 10)
        .select(col("doc_id"), row_number().over(
          Window.orderBy(col("bm25").desc, col("doc_id"))).cast("long").as("rank"))
      val ann = Similarity.bruteForceTopK(Tables.load(s, d, "embeddings"),
          "vec_id", "embedding", anchorId = 0L, k = 10)
        .select(col("vec_id").as("doc_id"), row_number().over(
          Window.orderBy(col("cosine").desc, col("vec_id"))).cast("long").as("rank"))
      graft.operators.Ops.rrfFuse(Seq(bm, ann), "doc_id")
    },
    Some("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents), " +
      "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), " +
      "st AS (SELECT count(*) AS n_docs FROM documents), " +
      "av AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST((SELECT n_docs FROM st) AS DOUBLE) AS avgdl FROM dl), " +
      "tfq AS (SELECT doc_id, term, count(*) AS tf FROM toks " +
      "WHERE term IN ('hash', 'join', 'spark', 'window') GROUP BY 1, 2), " +
      "dfq AS (SELECT term, count(*) AS dfreq FROM tfq GROUP BY 1), " +
      "bm AS (SELECT doc_id, " +
      "round(SUM(ln(1e0 + (CAST(n_docs AS DOUBLE) - CAST(dfreq AS DOUBLE) + 0.5e0) / (CAST(dfreq AS DOUBLE) + 0.5e0)) " +
      "* (CAST(tf AS DOUBLE) * (1.2e0 + 1e0)) / (CAST(tf AS DOUBLE) + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / avgdl))), 6) AS bm25 " +
      "FROM tfq JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st CROSS JOIN av " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10), " +
      "bmr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY bm25 DESC, doc_id) AS BIGINT) AS rk0 FROM bm), " +
      "qv AS (SELECT embedding::DOUBLE[] AS qe FROM embeddings WHERE vec_id = 0), " +
      s"co AS (SELECT vec_id AS doc_id, ${cosSql(CosD, "qe")} AS cosine FROM embeddings, qv " +
      "WHERE vec_id <> 0 ORDER BY cosine DESC, vec_id LIMIT 10), " +
      "cor AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS rk1 FROM co) " +
      "SELECT COALESCE(bmr.doc_id, cor.doc_id) AS doc_id, rk0 AS rank_0, rk1 AS rank_1, " +
      "round(COALESCE(1e0 / (60e0 + CAST(rk0 AS DOUBLE)), 0e0) + " +
      "COALESCE(1e0 / (60e0 + CAST(rk1 AS DOUBLE)), 0e0), 6) AS rrf " +
      "FROM bmr FULL OUTER JOIN cor ON bmr.doc_id = cor.doc_id " +
      "ORDER BY rrf DESC, doc_id"))

  /** Bounded-candidate negative sampling
    * ([[graft.operators.Sampling.negativeSampleBounded]], n=5, 64 buckets,
    * probe 8) on the same demo cohort as `q_negative_sample`. The oracle
    * evaluates the SAME windowed rule exhaustively (all user×item pairs,
    * window predicate `(b − u0) mod 64 < 8`, rank by probe position then
    * pair hash) — so the gate proves the bounded equi-join plan
    * row-identical to the declarative definition, the
    * `q_emb_neardup_lsh` pattern applied to sampling. */
  private val qNegativeSampleBounded = Q(
    (s, d) => {
      val pos = Tables.load(s, d, "orders").filter(col("o_custkey") < 100)
        .select(col("o_orderkey"), col("o_custkey").as("user_id"))
        .join(Tables.load(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey").as("item_id")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("user_id"), col("item_id"))
      graft.operators.Sampling.negativeSampleBounded(pos, "user_id", "item_id",
          Tables.load(s, d, "part").select(col("p_partkey").as("item_id")), n = 5)
        .orderBy(col("user_id"), col("rank"))
    },
    Some("WITH pos AS (SELECT DISTINCT o_custkey AS user_id, l_partkey AS item_id " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey WHERE o_custkey < 100), " +
      "u AS (SELECT user_id, ('0x' || substr(md5(user_id::VARCHAR || 'graft-neg-probe'), 1, 8))::BIGINT % 64 AS u0 " +
      "FROM (SELECT DISTINCT user_id FROM pos)), " +
      "c AS (SELECT item_id, ('0x' || substr(md5(item_id::VARCHAR || 'graft-neg-bucket'), 1, 8))::BIGINT % 64 AS b " +
      "FROM (SELECT DISTINCT p_partkey AS item_id FROM part)), " +
      "cand AS (SELECT user_id, item_id, (b - u0 + 64) % 64 AS j, " +
      "md5(user_id::VARCHAR || '|' || item_id::VARCHAR || '|graft-neg') AS h " +
      "FROM u CROSS JOIN c WHERE (b - u0 + 64) % 64 < 8), " +
      "neg AS (SELECT user_id, item_id, j, h FROM cand ca WHERE NOT EXISTS " +
      "(SELECT 1 FROM pos WHERE pos.user_id = ca.user_id AND pos.item_id = ca.item_id)) " +
      "SELECT user_id, item_id, CAST(rn AS BIGINT) AS rank FROM (" +
      "SELECT user_id, item_id, row_number() OVER (PARTITION BY user_id ORDER BY j, h, item_id) AS rn " +
      "FROM neg) WHERE rn <= 5 ORDER BY user_id, rank"))

  /** Mutual-kNN dedup ([[Similarity.mutualKnnDedup]], k=3, cos ≥ 0.4):
    * edges only where both vectors rank each other top-3 AND clear the
    * threshold, components via label propagation, min-id survives. The
    * oracle chains the kNN window, the mutuality self-join, and the
    * recursive-CTE components (the q_neardup_purge pattern) — the whole
    * graph-based dedup composition re-derived declaratively. */
  private val qMutualKnnDedup = Q(
    (s, d) => Similarity.mutualKnnDedup(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", k = 3, threshold = 0.4)
      .select(col("vec_id"))
      .orderBy(col("vec_id")),
    Some("WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "s AS (SELECT q.vec_id AS a, c.vec_id AS b, " + cosSql("q.v", "c.v") + " AS cosine " +
      "FROM e q JOIN e c ON c.vec_id <> q.vec_id), " +
      "ranked AS (SELECT a, b, cosine, row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rk FROM s), " +
      "knn AS (SELECT a, b, cosine FROM ranked WHERE rk <= 3), " +
      "m AS (SELECT k1.a AS doc_a, k1.b AS doc_b FROM knn k1 " +
      "JOIN knn k2 ON k2.a = k1.b AND k2.b = k1.a " +
      "WHERE k1.a < k1.b AND k1.cosine >= 0.4e0), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM m UNION ALL SELECT doc_b, doc_a FROM m), " +
      "reach(id, root) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT ed.id, reach.root FROM edges ed JOIN reach ON ed.nbr = reach.id), " +
      "losers AS (SELECT id FROM reach GROUP BY id HAVING min(root) < id) " +
      "SELECT vec_id FROM embeddings WHERE vec_id NOT IN (SELECT id FROM losers) " +
      "ORDER BY vec_id"))

  /** Mutual-kNN dedup, BANDED-LSH FORM
    * ([[Similarity.mutualKnnDedupLsh]], same k=3 / cos ≥ 0.4): ranks
    * within band-join candidates instead of the all-pairs kNN build and
    * registers against the SAME recursive-CTE oracle as
    * `q_mutual_knn_dedup` — exactness follows from the rank lemma on
    * [[Similarity.mutualKnnDedupFromPairs]] (an above-threshold pair's
    * competitors are all above-threshold, hence all candidates). This is
    * the scale path: every stage is an equi-join or a degree-bounded
    * window; nothing quadratic remains. */
  private val qMutualKnnDedupLsh = Q(
    (s, d) => Similarity.mutualKnnDedupLsh(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding", k = 3, threshold = 0.4,
        bandedCacheKey = Some(embBandKey(s, d)))
      .select(col("vec_id"))
      .orderBy(col("vec_id")),
    qMutualKnnDedup.sql)

  /** Mutual-kNN dedup, BENIGN REGIME ([[Similarity.mutualKnnDedupLsh]]
    * at a REALISTIC near-dup threshold, cos ≥ 0.9) — the scale-contract
    * demonstration the 0.4-threshold row deliberately does not give. The
    * corpus plants exact near-dups (every 20th vector re-enters as a
    * 1.5× scalar multiple under a NEGATIVE id, so the min-id survivor
    * set differs from a pass-through and twins drop their originals):
    * parallel vectors share EVERY hyperplane sign bit, so planted-pair
    * recall is structural (p = 1), not probabilistic, while the
    * near-random rest of the corpus (max pairwise cos ≈ 0.55) collides
    * in a 16-bit band at ≤ p^16 ≈ 0.2% — the candidate set stays O(n)
    * and the eager audit PROVES it: lshCosinePairs counts the
    * materialized candidates at build time and throws if they ever
    * exceed 8·n, so the "never quadratic at a realistic threshold"
    * claim is executable, not narrative. Oracle: the same
    * recursive-CTE composition as `q_mutual_knn_dedup`, over the same
    * planted frame (list_transform twin derivation mirrored). */
  private val qMutualKnnDedupBenign = Q(
    (s, d) => {
      val emb = Tables.load(s, d, "embeddings")
      val base = emb.select(col("vec_id"),
        col("embedding").cast("array<double>").as("embedding"))
      val twins = emb.filter(col("vec_id") % 20 === 0)
        .select(negate(col("vec_id") + lit(1L)).as("vec_id"),
          transform(col("embedding").cast("array<double>"), x => x * lit(1.5))
            .as("embedding"))
      Similarity.mutualKnnDedupLsh(base.unionAll(twins), "vec_id", "embedding",
          k = 3, threshold = 0.9, bands = 24, rowsPerBand = 16,
          maxCandidatesPerVec = Some(8.0))
        .select(col("vec_id"))
        .orderBy(col("vec_id"))
    },
    Some("WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings " +
      "UNION ALL SELECT -(vec_id + 1) AS vec_id, " +
      "list_transform(embedding::DOUBLE[], x -> x * 1.5e0) AS v " +
      "FROM embeddings WHERE vec_id % 20 = 0), " +
      "s AS (SELECT q.vec_id AS a, c.vec_id AS b, " + cosSql("q.v", "c.v") + " AS cosine " +
      "FROM e q JOIN e c ON c.vec_id <> q.vec_id), " +
      "ranked AS (SELECT a, b, cosine, row_number() OVER (PARTITION BY a ORDER BY cosine DESC, b) AS rk FROM s), " +
      "knn AS (SELECT a, b, cosine FROM ranked WHERE rk <= 3), " +
      "m AS (SELECT k1.a AS doc_a, k1.b AS doc_b FROM knn k1 " +
      "JOIN knn k2 ON k2.a = k1.b AND k2.b = k1.a " +
      "WHERE k1.a < k1.b AND k1.cosine >= 0.9e0), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM m UNION ALL SELECT doc_b, doc_a FROM m), " +
      "reach(id, root) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT ed.id, reach.root FROM edges ed JOIN reach ON ed.nbr = reach.id), " +
      "losers AS (SELECT id FROM reach GROUP BY id HAVING min(root) < id) " +
      "SELECT vec_id FROM e WHERE vec_id NOT IN (SELECT id FROM losers) " +
      "ORDER BY vec_id"))

  /** END-TO-END CURATION PIPELINE — the flagship composition query: the
    * four stages a real corpus run chains, as ONE plan, each stage an
    * already-gated operator:
    *
    *   1. normalize ([[TextAnalysis.normalizeText]] over a planted messy
    *      wrapper — typography/case/whitespace)
    *   2. exact dedup on the md5 of the NORMALIZED text, first-wins by
    *      doc_id (the [[graft.operators.Ops.dedupFirstWins]] window form)
    *   3. quality gate: 5 ≤ token count ≤ 1000 on the normalized text
    *   4. deterministic split assignment ([[graft.operators.Sampling]])
    *
    * The oracle chains the same four stages as CTEs — what the gate
    * proves here is not any single operator (each has its own row) but
    * that the COMPOSITION is lossless: normalization feeds the dedup
    * fingerprint, the survivor set feeds the gate, the gate feeds the
    * split, with no stage reordering or column drift. One scan, one
    * fingerprint shuffle, one window — the whole pipeline is two
    * exchanges at any corpus size. */
  private val qCurationPipeline = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val planted = Tables.load(s, d, "documents").select(col("doc_id"),
        TextAnalysis.normalizeText(concat(
          lit("  “"), upper(substring(col("text"), 1, 30)), lit("”  "), col("text")))
          .as("norm"))
      val deduped = planted
        .withColumn("fp", md5(col("norm")))
        .withColumn("__rn", row_number().over(
          Window.partitionBy(col("fp")).orderBy(col("doc_id"))))
        .filter(col("__rn") === 1)
        // norm is single-space-collapsed and trimmed, so the token count
        // is a plain split on ' ' — no filter()-HOF for Catalyst to push
        // into a Filter node (the urlDedup HOF-IN-FILTER lesson)
        .withColumn("n_tokens",
          when(col("norm") === "", lit(0L))
            .otherwise(size(split(col("norm"), " ", -1)).cast("long")))
        .filter(col("n_tokens").between(5L, 1000L))
      graft.operators.Sampling.splitAssign(deduped, "doc_id")
        .select(col("doc_id"), col("fp"), col("n_tokens"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some("WITH norm AS (SELECT doc_id, trim(regexp_replace(lower(translate(" +
      "'  “' || upper(substring(text, 1, 30)) || '”  ' || text, " +
      "'’‘“”—–', '''''\"\"--')), '[\\s\\x00-\\x1f]+', ' ', 'g')) AS norm FROM documents), " +
      "fp AS (SELECT doc_id, norm, md5(norm) AS fp FROM norm), " +
      "ded AS (SELECT doc_id, norm, fp FROM (SELECT doc_id, norm, fp, " +
      "row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn FROM fp) WHERE rn = 1), " +
      "gated AS (SELECT doc_id, fp, CAST(CASE WHEN norm = '' THEN 0 " +
      "ELSE len(string_split(norm, ' ')) END AS BIGINT) AS n_tokens FROM ded) " +
      "SELECT doc_id, fp, n_tokens, " +
      "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split " +
      "FROM (SELECT doc_id, fp, n_tokens, " +
      "('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 8))::BIGINT % 100 AS b " +
      "FROM gated WHERE n_tokens BETWEEN 5 AND 1000) ORDER BY doc_id"))

  /** Compression-ratio signal, SELF-CERTIFYING form
    * ([[TextAnalysis.compressionRatioAudited]]): rows-only BY DESIGN —
    * zlib output is deterministic per zlib build but no SQL engine can
    * mirror it — yet the gate now carries two in-plan quality signals
    * (per-row (0, 1.1] bounds; planted repetitive-beats-scrambled
    * monotonicity), each a `raise_error` path, so shaped garbage cannot
    * pass. Ordering and determinism contracts live in the spec. */
  private val qCompressRatio = Q(
    (s, d) => TextAnalysis.compressionRatioAudited(Tables.load(s, d, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    None)

  /** Token entropy ([[TextAnalysis.tokenEntropy]]): Shannon entropy of
    * each doc's own token distribution — the repetition signal that needs
    * no corpus pass. round(6) soaks ln/summation-order noise (the
    * q_unigram_logprob precedent). */
  private val qTokenEntropy = Q(
    (s, d) => TextAnalysis.tokenEntropy(Tables.load(s, d, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents), " +
      "tc AS (SELECT doc_id, tok, count(*) AS c FROM toks WHERE tok <> '' GROUP BY doc_id, tok), " +
      "tn AS (SELECT doc_id, tok, c, CAST(SUM(c) OVER (PARTITION BY doc_id) AS BIGINT) AS n FROM tc) " +
      "SELECT doc_id, max(n) AS n_tokens, count(*) AS n_distinct, " +
      "round(-SUM((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS entropy " +
      "FROM tn GROUP BY doc_id ORDER BY doc_id"))

  /** BM25 top-k retrieval ([[TextAnalysis.bm25TopK]]) for a 4-term topic
    * probe over the document corpus — ranked retrieval with the Lucene idf
    * variant, k1=1.2, b=0.75. The oracle recomputes the identical formula
    * (mirrored operand order; `1.2e0 + 1e0` so both engines perform the
    * same IEEE add rather than parsing `2.2`); the per-doc sum of ≤ 4
    * ln-based contributions rounds to 6 places (q_unigram_logprob
    * precedent) and the LIMIT-k frontier is total-ordered by
    * (bm25 DESC, doc_id). */
  private val qBm25TopK = Q(
    (s, d) => TextAnalysis.bm25TopK(Tables.load(s, d, "documents"),
      "doc_id", "text", Seq("hash", "join", "spark", "window"), k = 10),
    Some("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents), " +
      "dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1), " +
      "st AS (SELECT count(*) AS n_docs FROM documents), " +
      "av AS (SELECT CAST(SUM(dl) AS DOUBLE) / CAST((SELECT n_docs FROM st) AS DOUBLE) AS avgdl FROM dl), " +
      "tfq AS (SELECT doc_id, term, count(*) AS tf FROM toks " +
      "WHERE term IN ('hash', 'join', 'spark', 'window') GROUP BY 1, 2), " +
      "dfq AS (SELECT term, count(*) AS dfreq FROM tfq GROUP BY 1) " +
      "SELECT doc_id, count(*) AS n_terms, " +
      "round(SUM(ln(1e0 + (CAST(n_docs AS DOUBLE) - CAST(dfreq AS DOUBLE) + 0.5e0) / (CAST(dfreq AS DOUBLE) + 0.5e0)) " +
      "* (CAST(tf AS DOUBLE) * (1.2e0 + 1e0)) / (CAST(tf AS DOUBLE) + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * CAST(dl AS DOUBLE) / avgdl))), 6) AS bm25 " +
      "FROM tfq JOIN dfq USING (term) JOIN dl USING (doc_id) CROSS JOIN st CROSS JOIN av " +
      "GROUP BY doc_id ORDER BY bm25 DESC, doc_id LIMIT 10"))

  /** OOV rate ([[TextAnalysis.oovRate]]) against the min-count-5 corpus
    * vocabulary ([[TextAnalysis.vocabulary]] — the q_vocabulary table):
    * the tokenizer-coverage audit, oracle re-deriving vocab membership and
    * the instance-share division in SQL. */
  private val qOovRate = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      TextAnalysis.oovRate(docs, "doc_id", "text",
          TextAnalysis.vocabulary(docs, "doc_id", "text", minCount = 5L))
        .orderBy(col("doc_id"))
    },
    Some("WITH toks AS (SELECT doc_id, tok FROM (SELECT doc_id, " +
      "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents) WHERE tok <> ''), " +
      "v AS (SELECT tok FROM (SELECT tok, count(*) AS tf FROM toks GROUP BY tok) WHERE tf >= 5) " +
      "SELECT doc_id, count(*) AS n_tokens, " +
      "CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov, " +
      "CAST(SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS oov_rate " +
      "FROM toks LEFT JOIN v ON toks.tok = v.tok GROUP BY doc_id ORDER BY doc_id"))

  /** Int8 symmetric embedding quantization
    * ([[Similarity.quantizeInt8]]): scale = max|x|/127, codes =
    * trunc(x/scale) — truncation toward zero on both engines (the
    * established [[graft.operators.Clustering]] convention; round()'s
    * half-way rule differs cross-engine), plus the per-vector max
    * reconstruction error. Codes are emitted pipe-joined (the gate hashes
    * flat columns), the scale and error as mirrored-arithmetic doubles. */
  private val qEmbQuantize = Q(
    (s, d) => Similarity.quantizeInt8(Tables.load(s, d, "embeddings"),
        "vec_id", "embedding")
      .select(col("vec_id"), col("scale"),
        concat_ws("|", transform(col("codes"), c => c.cast("string"))).as("codes_str"),
        col("max_abs_err"))
      .orderBy(col("vec_id")),
    Some("WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings), " +
      "q AS (SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS am FROM v), " +
      "s AS (SELECT vec_id, v, am, am / 127.0e0 AS scale FROM q), " +
      "c AS (SELECT vec_id, v, am, scale, CASE WHEN am = 0.0e0 " +
      "THEN list_transform(v, x -> CAST(0 AS BIGINT)) " +
      "ELSE list_transform(v, x -> CAST(trunc(x / scale) AS BIGINT)) END AS codes FROM s) " +
      "SELECT vec_id, scale, " +
      "array_to_string(list_transform(codes, x -> x::VARCHAR), '|') AS codes_str, " +
      "round(list_max(list_transform(range(1, len(v) + 1), " +
      "i -> abs(v[i] - CAST(codes[i] AS DOUBLE) * scale))), 6) AS max_abs_err " +
      "FROM c ORDER BY vec_id"))

  /** MAD outlier detection ([[graft.operators.Profiler.madOutliers]],
    * k=3) over event values per type: both medians are the exact discrete
    * lower-rank element, re-derived in the oracle with two row_number
    * rank-picks; the flag comparison is exact mirrored arithmetic. */
  private val qMadOutliers = Q(
    (s, d) => graft.operators.Profiler.madOutliers(
        Tables.load(s, d, "events").select(
          col("event_id"), col("event_type"), col("value")),
        "event_type", "value")
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"), col("is_outlier"))
      .orderBy(col("event_id")),
    Some("WITH e AS (SELECT event_id, event_type AS g, value AS v FROM events WHERE value IS NOT NULL), " +
      "r1 AS (SELECT g, v, row_number() OVER (PARTITION BY g ORDER BY v) AS rn, " +
      "count(*) OVER (PARTITION BY g) AS n FROM e), " +
      "med AS (SELECT g, max(CASE WHEN rn = CAST(floor((n - 1) * 0.5e0) AS BIGINT) + 1 THEN v END) AS med " +
      "FROM r1 GROUP BY g), " +
      "d AS (SELECT e.event_id, e.g, e.v, med.med, abs(e.v - med.med) AS absdev FROM e JOIN med USING (g)), " +
      "r2 AS (SELECT g, absdev, row_number() OVER (PARTITION BY g ORDER BY absdev) AS rn, " +
      "count(*) OVER (PARTITION BY g) AS n FROM d), " +
      "mad AS (SELECT g, max(CASE WHEN rn = CAST(floor((n - 1) * 0.5e0) AS BIGINT) + 1 THEN absdev END) AS mad " +
      "FROM r2 GROUP BY g) " +
      "SELECT d.event_id, d.g AS event_type, d.v AS value, d.med, mad.mad, " +
      "(mad.mad > 0.0e0 AND d.absdev > 3.0e0 * mad.mad) AS is_outlier " +
      "FROM d JOIN mad USING (g) ORDER BY event_id"))

  /** Cluster-balanced diversity sample
    * ([[graft.operators.Sampling.clusterBalancedSample]]): 5 vectors per
    * k-means cluster via the deterministic Efraimidis–Spirakis draw. The
    * oracle chains the unrolled-Lloyd CTEs with the same portable-hash
    * rank — the whole composition (clustering + per-cluster draw) is
    * re-derived in SQL, proving the sample is a pure function of
    * (corpus, salt) on any engine. */
  private val qClusterSample = Q(
    (s, d) => graft.operators.Sampling.clusterBalancedSample(
        Tables.load(s, d, "embeddings"), "vec_id", "embedding",
        k = 8, iters = 2, perCluster = 5,
        kmeansMemoKey = Some(kmeansKey(s, d)))
      .orderBy(col("vec_id")),
    Some(KmeansSqlWith +
      " SELECT vec_id, cluster FROM (SELECT vec_id, cluster, " +
      "row_number() OVER (PARTITION BY cluster ORDER BY " +
      "ln((('0x' || substr(md5(vec_id::VARCHAR || 'graft-es'), 1, 8))::BIGINT + 1.0) / 4294967296.0) / 1.0e0 DESC, " +
      "vec_id) AS rn FROM asg) WHERE rn <= 5 ORDER BY vec_id"))

  /** Deterministic train/val/test split assignment over the portable salted
    * hash ([[graft.operators.Sampling]]) — membership is a pure per-row
    * function of (id, salt), so it is stable across reruns, partitionings
    * and engines (no `df.sample()` leakage between pipeline versions). */
  private val qSplitAssign = Q(
    (s, d) => graft.operators.Sampling.splitAssign(
        Tables.load(s, d, "documents"), "doc_id")
      .select(col("doc_id"), col("bucket"), col("split"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, b AS bucket, " +
      "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split " +
      "FROM (SELECT doc_id, ('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 8))::BIGINT % 100 AS b " +
      "FROM documents) ORDER BY doc_id"))

  /** Leakage-safe split ([[graft.operators.Sampling.leakageSafeSplit]]):
    * split membership decided per near-dup CLUSTER (the q_dedup_groups
    * component pass over exhaustive 0.8-Jaccard pairs), so no two
    * near-identical docs straddle train/eval. The oracle chains the
    * recursive-CTE components, the singleton fallback, and the
    * q_split_assign portable-hash CASE — on `group_id` instead of
    * `doc_id`. */
  private val qLeakageSplit = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      graft.operators.Sampling.leakageSafeSplit(
          docs.select(col("doc_id"), col("text")), "doc_id",
          Dedup.jaccardPairs(Dedup.shingles(docs, "doc_id", "text", 5),
            "doc_id", 0.8))
        .select(col("doc_id"), col("group_id"), col("bucket"), col("split"))
        .orderBy(col("doc_id"))
    },
    Some("WITH RECURSIVE " + ShingleCte.stripPrefix("WITH ") +
      ", jp AS (SELECT doc_a, doc_b " +
      "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM jp UNION ALL SELECT doc_b, doc_a FROM jp), " +
      "reach(id, r) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id), " +
      "g AS (SELECT id, min(r) AS grp FROM reach GROUP BY id), " +
      "ag AS (SELECT d.doc_id, COALESCE(g.grp, d.doc_id) AS group_id " +
      "FROM documents d LEFT JOIN g ON d.doc_id = g.id) " +
      "SELECT doc_id, group_id, b AS bucket, " +
      "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split " +
      "FROM (SELECT doc_id, group_id, " +
      "('0x' || substr(md5(group_id::VARCHAR || 'graft'), 1, 8))::BIGINT % 100 AS b FROM ag) " +
      "ORDER BY doc_id"))

  /** PREFERENCE-PAIR LEAKAGE GUARD ([[graft.operators.PrefPairs]]):
    * dedup/decontamination at the (prompt, chosen, rejected) grain over
    * pairs synthesized arithmetically from documents — pair p's prompt /
    * chosen / rejected are docs 3p / 3p+1 / 3p+2, with two planted
    * defect classes so both guard stages have real work at every sf:
    * `p % 17 = 3` re-annotates the identical triple at id +2,000,000
    * (EXACT dup — must vanish, min id survives) and `p % 13 = 2` plants
    * a preference FLIP at id +1,000,000 (same prompt, chosen/rejected
    * swapped — survives exact dedup, must land in the SAME split as its
    * source and be stamped non-canonical). Prompt near-dup pairs come
    * from the exhaustive shingle-Jaccard generator (threshold 0.8) so
    * the oracle can replay them; the LSH generator swaps in at scale
    * (operator scaladoc). The oracle re-derives the ENTIRE kept set in
    * SQL: triple fingerprints, prompt shingle Jaccard, recursive-CTE
    * components, singleton fallback, portable split hash on group_id,
    * and the group-grain stamps. */
  /** The synthesized preference-pair corpus shared by the leakage guard
    * and the reward-margin audit (see [[qPrefLeakage]]'s scaladoc for
    * the planted-defect classes). */
  private def prefPairsSynth(docs: org.apache.spark.sql.DataFrame) = {
    def slot(k: Int, name: String) = docs.filter(col("doc_id") % 3 === k)
      .select(expr("doc_id div 3").as("pair_id"), col("text").as(name))
    val base = slot(0, "prompt").join(slot(1, "chosen"), "pair_id")
      .join(slot(2, "rejected"), "pair_id")
    val flipped = base.filter(col("pair_id") % 13 === 2)
      .select((col("pair_id") + 1000000L).as("pair_id"), col("prompt"),
        col("rejected").as("chosen"), col("chosen").as("rejected"))
    val copies = base.filter(col("pair_id") % 17 === 3)
      .select((col("pair_id") + 2000000L).as("pair_id"), col("prompt"),
        col("chosen"), col("rejected"))
    base.unionByName(flipped).unionByName(copies)
  }

  /** The [[prefPairsSynth]] synthesis as oracle CTEs, ending at
    * `qpp(pair_id, prompt, chosen, rejected)`. */
  private val PrefPairCtes: String =
    "q0 AS (SELECT doc_id // 3 AS pair_id, text AS prompt FROM documents WHERE doc_id % 3 = 0), " +
      "q1 AS (SELECT doc_id // 3 AS pair_id, text AS chosen FROM documents WHERE doc_id % 3 = 1), " +
      "q2 AS (SELECT doc_id // 3 AS pair_id, text AS rejected FROM documents WHERE doc_id % 3 = 2), " +
      "qbase AS (SELECT pair_id, prompt, chosen, rejected FROM q0 " +
      "JOIN q1 USING (pair_id) JOIN q2 USING (pair_id)), " +
      "qpp AS (SELECT * FROM qbase " +
      "UNION ALL SELECT pair_id + 1000000, prompt, rejected, chosen FROM qbase WHERE pair_id % 13 = 2 " +
      "UNION ALL SELECT pair_id + 2000000, prompt, chosen, rejected FROM qbase WHERE pair_id % 17 = 3)"

  private val qPrefLeakage = Q(
    (s, d) => {
      val pp = prefPairsSynth(Tables.load(s, d, "documents"))
      val kept = graft.operators.PrefPairs.exactSurvivors(
        pp, "pair_id", "prompt", "chosen", "rejected")
      val promptPairs = Dedup.jaccardPairs(
        Dedup.shingles(kept.select(col("pair_id"), col("prompt")),
          "pair_id", "prompt", 5), "pair_id", 0.8)
      graft.operators.PrefPairs.leakageGuard(kept, "pair_id", promptPairs)
        .select(col("pair_id"), col("group_id"), col("n_group_pairs"),
          col("is_canonical"), col("bucket"), col("split"))
        .orderBy(col("pair_id"))
    },
    Some("WITH RECURSIVE " + PrefPairCtes + ", " +
      "qek AS (SELECT pair_id, prompt, row_number() OVER (PARTITION BY " +
      "md5(lower(trim(prompt)) || chr(1) || lower(trim(chosen)) || chr(1) || lower(trim(rejected))) " +
      "ORDER BY pair_id) AS rn FROM qpp), " +
      "qkept AS (SELECT pair_id, prompt FROM qek WHERE rn = 1), " +
      "qw AS (SELECT pair_id, string_split_regex(trim(prompt), '\\s+') AS w FROM qkept), " +
      "qpos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM qw))) AS i), " +
      "qsh AS (SELECT DISTINCT pair_id, array_to_string(list_slice(w, i, i+4), ' ') AS g " +
      "FROM qw JOIN qpos ON qpos.i <= len(w) - 4), " +
      "qsz AS (SELECT pair_id, count(*) AS sz FROM qsh GROUP BY pair_id), " +
      "qint AS (SELECT a.pair_id AS doc_a, b.pair_id AS doc_b, count(*) AS inter " +
      "FROM qsh a JOIN qsh b ON a.g = b.g AND a.pair_id < b.pair_id GROUP BY 1, 2), " +
      "qjp AS (SELECT doc_a, doc_b FROM qint " +
      "JOIN qsz sa ON sa.pair_id = doc_a JOIN qsz sb ON sb.pair_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0), " +
      "qedges AS (SELECT doc_a AS id, doc_b AS nbr FROM qjp UNION ALL SELECT doc_b, doc_a FROM qjp), " +
      "qreach(id, r) AS (SELECT id, id FROM (SELECT DISTINCT id FROM qedges) t " +
      "UNION SELECT e.id, qreach.r FROM qedges e JOIN qreach ON e.nbr = qreach.id), " +
      "qg AS (SELECT id, min(r) AS grp FROM qreach GROUP BY id), " +
      "qag AS (SELECT k.pair_id, COALESCE(qg.grp, k.pair_id) AS group_id " +
      "FROM qkept k LEFT JOIN qg ON k.pair_id = qg.id), " +
      "qsp AS (SELECT pair_id, group_id, " +
      "('0x' || substr(md5(group_id::VARCHAR || 'graft'), 1, 8))::BIGINT % 100 AS b FROM qag) " +
      "SELECT pair_id, group_id, " +
      "count(*) OVER (PARTITION BY group_id) AS n_group_pairs, " +
      "pair_id = min(pair_id) OVER (PARTITION BY group_id) AS is_canonical, " +
      "b AS bucket, " +
      "CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'val' ELSE 'test' END AS split " +
      "FROM qsp ORDER BY pair_id"))

  /** The word/distinct/stopword stats triple of the quality formula as a
    * SQL expression set over a text column — the q_quality_score oracle's
    * arithmetic, parameterized so pair-grain texts score identically. */
  private def qualityStatsSql(text: String): String =
    s"len(string_split_regex(trim($text), '\\s+')) AS nw, " +
      s"len(list_distinct(string_split_regex(trim($text), '\\s+'))) AS nd, " +
      s"len(regexp_extract_all(lower($text), '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS ns"

  private val QualityFormulaSql: String =
    "least(CAST(nw AS DOUBLE) / 100.0e0, 1.0e0) * 0.4e0 " +
      "+ (CAST(nd AS DOUBLE) / nw) * 0.3e0 + (CAST(ns AS DOUBLE) / nw) * 0.3e0"

  /** BEST-OF-N SELECTION ([[graft.operators.Sampling.bestOfN]]): the
    * rejection-sampling step of RLHF data prep — documents regrouped as
    * 4 candidates per prompt (`prompt_id = doc_id div 4`), scored by the
    * hash-gated quality formula (standing in for the reward model), the
    * per-prompt argmax kept (ties to the smallest doc id) only when it
    * clears 0.35. The oracle re-derives winner AND threshold from the
    * identical mirrored double chain. */
  private val qBestOfN = Q(
    (s, d) => {
      val scored = TextAnalysis.qualityScore(
          Tables.load(s, d, "documents"), "doc_id", "text")
        .select(expr("doc_id div 4").as("prompt_id"), col("doc_id"),
          col("quality"))
      graft.operators.Sampling.bestOfN(scored, "prompt_id", "doc_id",
          col("quality"), minScore = 0.35)
        .select(col("prompt_id"), col("doc_id"), col("score"))
        .orderBy(col("prompt_id"))
    },
    Some("WITH bst AS (SELECT doc_id, " + qualityStatsSql("text") + " FROM documents), " +
      s"bq AS (SELECT doc_id // 4 AS prompt_id, doc_id, $QualityFormulaSql AS score FROM bst) " +
      "SELECT prompt_id, doc_id, score FROM (SELECT prompt_id, doc_id, score, " +
      "row_number() OVER (PARTITION BY prompt_id ORDER BY score DESC, doc_id) AS rn FROM bq) " +
      "WHERE rn = 1 AND score >= 0.35e0 ORDER BY prompt_id"))

  /** REWARD-MARGIN AUDIT ([[graft.operators.PrefPairs.rewardMargin]])
    * over the [[prefPairsSynth]] preference pairs, scored per side by
    * the quality formula: margin = q(chosen) − q(rejected) + its
    * decile-width histogram bin. The planted preference FLIPS surface as
    * exact negations of their source pairs' margins — the
    * annotation-conflict signal the audit exists to catch. Pair-grain
    * output; every value a mirrored double chain. */
  private val qDpoMargin = Q(
    (s, d) => {
      val pp = prefPairsSynth(Tables.load(s, d, "documents"))
      val cq = TextAnalysis.qualityScore(
          pp.select(col("pair_id"), col("chosen")), "pair_id", "chosen")
        .withColumnRenamed("quality", "chosen_q")
      val rq = TextAnalysis.qualityScore(
          pp.select(col("pair_id"), col("rejected")), "pair_id", "rejected")
        .withColumnRenamed("quality", "rejected_q")
      graft.operators.PrefPairs.rewardMargin(
          cq.join(rq, "pair_id"), col("chosen_q"), col("rejected_q"))
        .select(col("pair_id"), col("chosen_q"), col("rejected_q"),
          col("margin"), col("margin_bin"))
        .orderBy(col("pair_id"))
    },
    Some("WITH " + PrefPairCtes + ", " +
      "mch AS (SELECT pair_id, " + qualityStatsSql("chosen") + " FROM qpp), " +
      "mrj AS (SELECT pair_id, " + qualityStatsSql("rejected") + " FROM qpp), " +
      s"msc AS (SELECT c.pair_id, ($QualityFormulaSql) AS chosen_q, " +
      s"(${QualityFormulaSql.replace("nw", "rw").replace("nd", "rd").replace("ns", "rs")}) AS rejected_q " +
      "FROM mch c JOIN (SELECT pair_id, nw AS rw, nd AS rd, ns AS rs FROM mrj) r " +
      "ON c.pair_id = r.pair_id) " +
      "SELECT pair_id, chosen_q, rejected_q, round(chosen_q - rejected_q, 6) AS margin, " +
      "CAST(floor(round(chosen_q - rejected_q, 6) * 10e0) AS BIGINT) AS margin_bin " +
      "FROM msc ORDER BY pair_id"))

  /** CROSS-SOURCE CONTAMINATION GRID — pairwise shingle-Jaccard between
    * SOURCES (the slice-level companion of the per-document dedup rows):
    * a high-overlap source pair means one feed re-crawls another — the
    * mixture designer's dedup-before-weighting signal. Exact form: the
    * distinct (source, 5-gram) table self-joins on the shingle (the
    * [[Dedup.jaccardPairs]] shape at source grain — output is
    * source-PAIR grain, never corpus); only overlapping pairs emit (the
    * sparse grid). At 100 TB the exact join over the full shingle
    * vocabulary is the heavy-but-honest form — the KMV-sketch estimate
    * (the q_kmv_intersect machinery, k-row state per source) is the
    * scale path, swapped without touching consumers. */
  private val qSourceOverlap = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val ssh = Dedup.shingles(docs, "doc_id", "text", 5)
        .join(docs.select(col("doc_id"), col("source")), "doc_id")
        .select(col("source"), col("shingle")).distinct()
      val sz = ssh.groupBy(col("source")).agg(count(lit(1)).as("sz"))
      val inter = ssh.select(col("source").as("source_a"), col("shingle"))
        .join(ssh.select(col("source").as("source_b"), col("shingle")), "shingle")
        .filter(col("source_a") < col("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("inter"))
      inter
        .join(sz.select(col("source").as("source_a"), col("sz").as("n_a")), "source_a")
        .join(sz.select(col("source").as("source_b"), col("sz").as("n_b")), "source_b")
        .select(col("source_a"), col("source_b"), col("n_a"), col("n_b"),
          col("inter"),
          round(col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"), 6)
            .as("jaccard"))
        .orderBy(col("source_a"), col("source_b"))
    },
    Some(ShingleBaseCte.stripSuffix(", ") + ", " +
      "ssh AS (SELECT DISTINCT d.source, s.g FROM sh s JOIN documents d USING (doc_id)), " +
      "ssz AS (SELECT source, count(*) AS sz FROM ssh GROUP BY source), " +
      "sint AS (SELECT a.source AS source_a, b.source AS source_b, count(*) AS inter " +
      "FROM ssh a JOIN ssh b ON a.g = b.g AND a.source < b.source GROUP BY 1, 2) " +
      "SELECT source_a, source_b, sa.sz AS n_a, sb.sz AS n_b, inter, " +
      "round(CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter), 6) AS jaccard " +
      "FROM sint JOIN ssz sa ON sa.source = source_a JOIN ssz sb ON sb.source = source_b " +
      "ORDER BY source_a, source_b"))

  /** Stratified (per-language) downsampling over the stable hash — keeps
    * 20% of English docs, 50% of German, everything else untouched. The
    * oracle re-derives membership from the same portable hash, proving the
    * per-row CASE compiles to engine-independent semantics. */
  private val qStratifiedSample = Q(
    (s, d) => graft.operators.Sampling.stratifiedSampleByHash(
        Tables.load(s, d, "documents"), "doc_id", "lang",
        Map("en" -> 20, "de" -> 50))
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, lang FROM (SELECT doc_id, lang, " +
      "('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 8))::BIGINT % 100 AS b " +
      "FROM documents) WHERE b < (CASE WHEN lang = 'de' THEN 50 WHEN lang = 'en' THEN 20 ELSE 100 END) " +
      "ORDER BY doc_id"))

  /** Mention/hashtag rollup over planted social tags (the testdata corpus
    * carries none, so the query plants one mention + one hashtag per row —
    * the extraction regex and kind-split are what the gate verifies). */
  private val qSocialTags = Q(
    (s, d) => {
      val planted = Tables.load(s, d, "documents")
        .select(col("doc_id"),
          concat(col("text"), lit(" @"), col("source"), lit(" #"), col("lang"))
            .as("text"))
      TextAnalysis.socialTags(planted, "doc_id", "text")
        .groupBy(col("kind"), col("tag")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("kind"), col("tag"))
    },
    Some("WITH planted AS (SELECT doc_id, text || ' @' || source || ' #' || lang AS text FROM documents), " +
      "raw AS (SELECT doc_id, unnest(regexp_extract_all(text, '[@#][A-Za-z0-9_]+')) AS r FROM planted), " +
      "tags AS (SELECT doc_id, CASE WHEN substring(r, 1, 1) = '@' THEN 'mention' ELSE 'hashtag' END AS kind, " +
      "substring(r, 2) AS tag FROM raw) " +
      "SELECT kind, tag, count(*) AS cnt FROM tags GROUP BY 1, 2 ORDER BY kind, tag"))

  /** Gopher-style quality rules: per-rule boolean columns + conjunction,
    * so curation is auditable per rule. All-exact arithmetic (counts,
    * ratios, regexes) — both engines agree bit-for-bit. */
  private val qQualityFlags = Q(
    (s, d) => TextAnalysis.qualityFlags(
        Tables.load(s, d, "documents"), "doc_id", "text", minWords = 50)
      .orderBy(col("doc_id")),
    // bigram position table sized from the corpus, so ok_repetition is
    // computed over EVERY document's full bigram set — no domain cap to
    // go stale (same contract as ShingleCte)
    Some("WITH words AS (SELECT doc_id, text, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "bi AS (SELECT doc_id, array_to_string(list_slice(w, i, i+1), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w) - 1), " +
      "bistats AS (SELECT doc_id, count(*) AS nbi, count(DISTINCT g) AS nbid FROM bi GROUP BY 1), " +
      "st AS (SELECT doc_id, text, CAST(len(w) AS BIGINT) AS nw, " +
      "CAST(list_aggregate(list_transform(w, x -> length(x)), 'sum') AS DOUBLE) / len(w) AS mwl, " +
      "length(regexp_replace(text, '[A-Za-z0-9 \\t\\n\\f\\r]', '', 'g')) AS nsym, " +
      "len(regexp_extract_all(lower(text), '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS nstop FROM words) " +
      "SELECT s.doc_id, s.nw AS n_words, " +
      "(s.nw >= 50 AND s.nw <= 100000) AS ok_word_count, " +
      "(s.mwl >= 3.0e0 AND s.mwl <= 10.0e0) AS ok_word_len, " +
      "(CAST(s.nsym AS DOUBLE) / length(s.text) <= 0.1e0) AS ok_symbols, " +
      "(s.nstop >= 2) AS ok_stopwords, " +
      "(COALESCE(b.nbi, 0) = 0 OR CAST(b.nbi - b.nbid AS DOUBLE) / b.nbi <= 0.3e0) AS ok_repetition, " +
      "((s.nw >= 50 AND s.nw <= 100000) AND (s.mwl >= 3.0e0 AND s.mwl <= 10.0e0) " +
      "AND (CAST(s.nsym AS DOUBLE) / length(s.text) <= 0.1e0) AND (s.nstop >= 2) " +
      "AND (COALESCE(b.nbi, 0) = 0 OR CAST(b.nbi - b.nbid AS DOUBLE) / b.nbi <= 0.3e0)) AS keep " +
      "FROM st s LEFT JOIN bistats b USING (doc_id) ORDER BY s.doc_id"))

  /** Fixed-window document chunking with overlap (context-window prep):
    * deterministic chunk boundaries, no shuffle — the explode happens in
    * the scan stage. */
  private val qChunk = Q(
    (s, d) => TextAnalysis.chunk(Tables.load(s, d, "documents"),
        "doc_id", "text", size = 200, overlap = 40)
      .orderBy(col("doc_id"), col("chunk_id")),
    Some("WITH d AS (SELECT doc_id, text, length(text) AS len FROM documents WHERE length(text) > 0), " +
      // start-position table sized from the corpus (max chars + 1) —
      // no hard-coded bound (same contract as ShingleCte)
      "r AS (SELECT unnest(range(1, (SELECT COALESCE(max(len), 0) + 1 FROM d), 160)) AS start), " +
      "s AS (SELECT doc_id, text, start, (start - 1) // 160 + 1 AS cid " +
      "FROM d JOIN r ON r.start <= greatest(len - 40, 1)) " +
      "SELECT doc_id, CAST(cid AS BIGINT) AS chunk_id, substr(text, start, 200) AS chunk " +
      "FROM s ORDER BY doc_id, chunk_id"))

  /** Greedy per-language sequence packing at a 1000-token budget (word
    * count as the token proxy): the pretraining-stream cut, one window
    * shuffle, reproducible pack ids at any partitioning. */
  private val qPackSequences = Q(
    (s, d) => TextAnalysis.packSequences(Tables.load(s, d, "documents"),
        "doc_id", size(split(trim(col("text")), "\\s+")), budget = 1000L, groupCol = "lang")
      .orderBy(col("lang"), col("doc_id")),
    Some("WITH t AS (SELECT lang, doc_id, " +
      "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens FROM documents), " +
      "c AS (SELECT lang, doc_id, n_tokens, CAST(SUM(n_tokens) OVER " +
      "(PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM t) " +
      "SELECT lang, doc_id, n_tokens, cum_tokens, " +
      "CAST(floor((cum_tokens - n_tokens) / 1000) AS BIGINT) AS pack_id " +
      "FROM c ORDER BY lang, doc_id"))

  /** Per-document top-3 terms by (rational-idf) TF-IDF — see
    * [[TextAnalysis.tfIdfTopTerms]] for why idf is (N+1)/(df+1) and not
    * log: rational arithmetic is bit-identical across engines, log() is
    * only 1-ulp-close. */
  private val qTfidfTopTerms = Q(
    (s, d) => TextAnalysis.tfIdfTopTerms(
        Tables.load(s, d, "documents"), "doc_id", "text", k = 3)
      .orderBy(col("doc_id"), col("rnk")),
    Some("WITH toks AS (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term FROM documents), " +
      "tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY 1, 2), " +
      "dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1), " +
      "n AS (SELECT count(*) AS n_docs FROM documents), " +
      "scored AS (SELECT doc_id, term, tf, doc_freq, " +
      "CAST(tf AS DOUBLE) * CAST(n_docs + 1 AS DOUBLE) / CAST(doc_freq + 1 AS DOUBLE) AS tfidf " +
      "FROM tf JOIN dfq USING (term), n), " +
      "r AS (SELECT *, row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk FROM scored) " +
      "SELECT doc_id, rnk, term, tf, doc_freq, tfidf FROM r WHERE rnk <= 3 ORDER BY doc_id, rnk"))

  /** J1 via the skew-resilient salted join — deliberately verified against
    * the SAME oracle SQL as q_j1_linkage: the driver's gate itself proves
    * `Scale.saltedJoin` is semantics-preserving. */
  private val qJ1Salted = Q(
    (s, d) => graft.operators.Scale.saltedJoin(
        Tables.load(s, d, "orders").select(col("o_custkey").as("c_custkey"), col("o_orderkey")),
        Tables.load(s, d, "customer").select(col("c_custkey"), col("c_name")),
        "c_custkey", salts = 8)
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
      .orderBy(col("o_orderkey")),
    Some("SELECT o_orderkey, c_custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"))

  /** A9 map-shaped engagement log via the typed single-pass Aggregator
    * (reference shape: readme.md:15, show.py:104-110). The MapType itself
    * can't go through the checker (pandas can't sort unhashable cells), so
    * the map is re-emitted as its CANONICAL scalar encoding — entries sorted
    * by numeric key, rendered with `to_json` — and the DuckDB oracle builds
    * the byte-identical string with `string_agg(... ORDER BY key)`. The
    * value triple is exact longs (cnt / purchases / value-cents) so no float
    * formatting can diverge between the engines. */
  private val qA9EngagementMap = Q(
    (s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select(col("user_id"),
          unix_timestamp(date_trunc("hour", col("ts"))).as("hour_epoch"),
          lit(1L).as("cnt"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("purchases"),
          (coalesce(col("value"), lit(0.0)) * 100).cast("long").as("value_cents"))
        .as[(Long, Long, Long, Long, Long)]
        .groupByKey(_._1)
        .mapValues(r => (r._2, r._3, r._4, r._5))
        .agg(graft.operators.EngagementAggregator.aggregator.toColumn.name("engagement_log"))
        .toDF("user_id", "engagement_log")
        .select(col("user_id"),
          to_json(map_from_entries(array_sort(map_entries(col("engagement_log")))))
            .as("engagement_json"))
        .orderBy(col("user_id"))
    },
    Some("WITH ev AS (SELECT user_id, " +
      "CAST(extract(epoch FROM date_trunc('hour', ts)) AS BIGINT) AS hour_epoch, " +
      "CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p, " +
      "CAST(trunc(COALESCE(value, 0) * 100) AS BIGINT) AS vc FROM events), " +
      "agg AS (SELECT user_id, hour_epoch, count(*) AS cnt, " +
      "CAST(SUM(p) AS BIGINT) AS purchases, CAST(SUM(vc) AS BIGINT) AS value_cents " +
      "FROM ev GROUP BY 1, 2) " +
      "SELECT user_id, '{' || string_agg('\"' || hour_epoch || '\":[' || cnt || ',' || purchases || ',' || value_cents || ']', ',' ORDER BY hour_epoch) || '}' AS engagement_json " +
      "FROM agg GROUP BY user_id ORDER BY user_id"))

  /** A6 — global engagement stats over the per-user rollup (the reference
    * dashboard's Total Users / Avg Tweets / Max Views tiles, show.py:233-235)
    * as its own oracle row instead of riding on q_a5's shape. Integer
    * operands keep the avg division bit-identical across engines. */
  private val qA6EngagementStats = Q(
    (s, d) => Tables.load(s, d, "events")
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("total_events"),
        max(graft.functions.Functions.orZero(col("value").cast("long"))).as("max_v"))
      .agg(count(lit(1)).as("n_users"),
        (sum(col("total_events")).cast("double") / count(lit(1))).as("avg_events"),
        max(col("max_v")).as("max_value")),
    Some("WITH r AS (SELECT user_id, count(*) AS total_events, " +
      "max(COALESCE(CAST(trunc(value) AS BIGINT), 0)) AS max_v FROM events GROUP BY user_id) " +
      "SELECT count(*) AS n_users, " +
      "CAST(SUM(total_events) AS DOUBLE) / count(*) AS avg_events, " +
      "max(max_v) AS max_value FROM r"))

  // ---------------------------------------------------------------------
  // Corpus-hygiene suite (operators.Corpus): the cross-document cleanup
  // passes of a training-data pipeline, each gated end-to-end.
  // ---------------------------------------------------------------------

  /** CCNet-style corpus-wide paragraph dedup: 32-word paragraphs, first
    * occurrence (min (doc, pos)) survives, documents reconstructed from
    * their surviving paragraphs. The oracle rebuilds the identical strings
    * with a window + ordered string_agg. */
  private val qParagraphDedup = Q(
    (s, d) => Corpus.paragraphDedup(Tables.load(s, d, "documents"),
        "doc_id", "text", size = 32)
      .orderBy(col("doc_id")),
    Some("WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      // chunk-index table sized from the corpus (max chunks at size=32) —
      // no hard-coded bound to go stale (same contract as ShingleCte)
      "pos AS (SELECT unnest(range(0, (SELECT COALESCE(max(len(w)), 0) // 32 + 1 FROM words))) AS j), " +
      "chunks AS (SELECT doc_id, j AS pos, array_to_string(list_slice(w, j*32+1, j*32+32), ' ') AS chunk " +
      "FROM words JOIN pos ON pos.j <= (len(w)-1)//32), " +
      "ranked AS (SELECT doc_id, pos, chunk, " +
      "row_number() OVER (PARTITION BY md5(chunk) ORDER BY doc_id, pos) AS rk FROM chunks), " +
      "tot AS (SELECT doc_id, count(*) AS n_chunks FROM chunks GROUP BY 1), " +
      "reb AS (SELECT doc_id, count(*) AS n_kept, string_agg(chunk, ' ' ORDER BY pos) AS clean_text " +
      "FROM ranked WHERE rk = 1 GROUP BY doc_id) " +
      "SELECT t.doc_id, t.n_chunks, COALESCE(r.n_kept, 0) AS n_kept, " +
      "COALESCE(r.clean_text, '') AS clean_text " +
      "FROM tot t LEFT JOIN reb r USING (doc_id) ORDER BY t.doc_id"))

  /** Gopher-style repetition gates (word-based). Every ratio is a single
    * int→double division with identical operands on both engines — no
    * rounding needed. */
  private val qRepetitionStats = Q(
    (s, d) => Corpus.repetitionStats(Tables.load(s, d, "documents"),
        "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH words AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "base AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS n_words, " +
      "CAST(len(list_distinct(w)) AS DOUBLE)/len(w) AS distinct_word_ratio FROM words), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "g2 AS (SELECT doc_id, array_to_string(list_slice(w, i, i+1), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w)-1), " +
      "c2 AS (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY 1, 2), " +
      "s2 AS (SELECT doc_id, max(c) AS bi_max FROM c2 GROUP BY 1), " +
      "g3 AS (SELECT doc_id, array_to_string(list_slice(w, i, i+2), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w)-2), " +
      "c3 AS (SELECT doc_id, g, count(*) AS c FROM g3 GROUP BY 1, 2), " +
      "s3 AS (SELECT doc_id, sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS tri_dup, sum(c) AS tri_tot " +
      "FROM c3 GROUP BY 1) " +
      "SELECT b.doc_id, b.n_words, b.distinct_word_ratio, " +
      "COALESCE(CAST(s2.bi_max*2 AS DOUBLE)/b.n_words, 0e0) AS top_bigram_frac, " +
      "COALESCE(CAST(s3.tri_dup AS DOUBLE)/s3.tri_tot, 0e0) AS dup_trigram_frac " +
      "FROM base b LEFT JOIN s2 USING (doc_id) LEFT JOIN s3 USING (doc_id) ORDER BY b.doc_id"))

  /** Bloom-accelerated benchmark decontamination (src0 plays the eval
    * set, as in q_contamination). The bloom is a pre-filter with no false
    * negatives and the exact semi-join removes its false positives, so the
    * oracle is the plain exact anti-join — the gate proves the accelerated
    * plan is semantics-preserving (the q_j1_salted / minhash pattern). */
  private val qDecontaminateBloom = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      Corpus.decontaminate(
          docs.filter(col("source") =!= "src0")
            .select(col("doc_id"), col("source"), col("lang"), col("text")),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 5)
        .select(col("doc_id"), col("source"), col("lang"))
        .orderBy(col("doc_id"))
    },
    Some("WITH words AS (SELECT doc_id, source, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "sh AS (SELECT DISTINCT doc_id, source, array_to_string(list_slice(w, i, i+4), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w) - 4), " +
      "bench AS (SELECT DISTINCT g FROM sh WHERE source = 'src0'), " +
      "hits AS (SELECT DISTINCT doc_id FROM sh WHERE source <> 'src0' AND g IN (SELECT g FROM bench)) " +
      "SELECT doc_id, source, lang FROM documents " +
      "WHERE source <> 'src0' AND doc_id NOT IN (SELECT doc_id FROM hits) ORDER BY doc_id"))

  /** Near-dup purge: the corpus that remains after collapsing each
    * duplicate cluster (LSH pairs → connected components) to its min-id
    * canonical. The oracle derives the same survivor set from the
    * recursive-CTE components. Probabilistic gate, same terms as
    * q_dedup_minhash_lsh: the Spark side's candidates are MinHash+LSH
    * (P(missed pair | j>=0.8) ≈ 5e-8, growing with corpus size) while
    * the oracle is exact Jaccard, so an astronomically unlikely missed
    * candidate — or dupGroups hitting maxIter on a >20-diameter chain,
    * which throws loudly rather than passing — would fail this row. */
  private val qNeardupPurge = Q(
    (s, d) => Corpus.nearDupPurge(Tables.load(s, d, "documents"),
        "doc_id", "text", n = 5, threshold = 0.8,
        bandedCacheKey = Some(docBandKey(s, d)))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id")),
    Some("WITH RECURSIVE " + ShingleCte.stripPrefix("WITH ") +
      ", jp AS (SELECT doc_a, doc_b " +
      "FROM pairs JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b " +
      "WHERE CAST(inter AS DOUBLE)/(sa.sz + sb.sz - inter) >= 0.8e0), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM jp UNION ALL SELECT doc_b, doc_a FROM jp), " +
      "reach(id, r) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id), " +
      "losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) < id) " +
      "SELECT doc_id, source, lang FROM documents " +
      "WHERE doc_id NOT IN (SELECT id FROM losers) ORDER BY doc_id"))

  /** Shared window-table cache key for the exact-substring family (spans,
    * capped spans, purge): fingerprints the documents FILES plus the
    * window width — see [[graft.operators.Scale.memo]]. */
  private def docWinsKey(s: org.apache.spark.sql.SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/documents.parquet", "winhash|k=8")

  /** EXACT-SUBSTRING shared spans ([[Dedup.substringSpans]], k = 8) — the
    * Lee et al. 2022 span-grain dedup family: every maximal ≥ 8-token
    * verbatim run shared across two documents, with 1-based positions in
    * both. The oracle replays the identical construction declaratively
    * (positioned window md5s via unnest(range), hash self-join,
    * gaps-and-islands per (pair, diagonal)) — window slicing is mapped
    * explicitly between Spark's length-based `slice(w, i, k)` and
    * DuckDB's inclusive-end `w[i:i+k-1]` (the list-slice convention
    * divergence documented on q_span_corruption). */
  private val qSubstringSpans = Q(
    (s, d) => Dedup.substringSpans(Tables.load(s, d, "documents"),
        "doc_id", "text", k = 8, winsCacheKey = Some(docWinsKey(s, d)))
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start")),
    Some("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "wins AS (SELECT doc_id, pos, md5(array_to_string(w[pos:pos+7], ' ')) AS h FROM " +
      "(SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS pos FROM w)), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb " +
      "FROM wins a JOIN wins b ON a.h = b.h AND a.doc_id < b.doc_id), " +
      "isl AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag, " +
      "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS g FROM p) " +
      "SELECT doc_a, doc_b, min(pa) AS a_start, min(pb) AS b_start, " +
      "max(pa) - min(pa) + 8 AS len_tokens " +
      "FROM isl GROUP BY doc_a, doc_b, diag, g " +
      "ORDER BY doc_a, doc_b, a_start, b_start"))

  /** Span detection through the HOT-WINDOW GUARD
    * ([[Dedup.substringSpans]] with `maxDocFreq = 2`): windows shared by
    * more than 2 documents are dropped BEFORE the hash self-join — the
    * document-frequency ceiling that bounds per-hash fan-out at cap² when
    * corpus-wide boilerplate would otherwise make one window key m²
    * rows. The oracle REPLAYS the cap declaratively (df-per-window CTE +
    * semi-join), so the guard's exact semantics — including the spans it
    * legitimately splits or drops — are hash-gated, not narrative. */
  private val qSubstringSpansCapped = Q(
    (s, d) => Dedup.substringSpans(Tables.load(s, d, "documents"),
        "doc_id", "text", k = 8, maxDocFreq = Some(2),
        winsCacheKey = Some(docWinsKey(s, d)))
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start")),
    Some("WITH w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "wins0 AS (SELECT doc_id, pos, md5(array_to_string(w[pos:pos+7], ' ')) AS h FROM " +
      "(SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS pos FROM w)), " +
      "ok AS (SELECT h FROM (SELECT h, count(DISTINCT doc_id) AS df FROM wins0 GROUP BY h) WHERE df <= 2), " +
      "wins AS (SELECT wins0.* FROM wins0 WHERE h IN (SELECT h FROM ok)), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb " +
      "FROM wins a JOIN wins b ON a.h = b.h AND a.doc_id < b.doc_id), " +
      "isl AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag, " +
      "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS g FROM p) " +
      "SELECT doc_a, doc_b, min(pa) AS a_start, min(pb) AS b_start, " +
      "max(pa) - min(pa) + 8 AS len_tokens " +
      "FROM isl GROUP BY doc_a, doc_b, diag, g " +
      "ORDER BY doc_a, doc_b, a_start, b_start"))

  /** TOKEN-BUDGET SELECTION ([[Sampling.tokenBudgetSelect]], budget 50k
    * whitespace tokens in doc_id order): the "fill the training run"
    * prefix — documents kept while the inclusive running token count
    * stays within budget. The Spark side is the DISTRIBUTED two-phase
    * prefix sum ([[Sampling.withGlobalRunningSum]]: range-sort, bounded
    * per-partition partials to the driver, broadcast offsets + local
    * windows — never a single-partition global window); the oracle is the
    * single-node equivalent window sum, so the distributed machinery is
    * hash-gated against the declarative definition. */
  private val qTokenBudgetSelect = Q(
    (s, d) => Sampling.tokenBudgetSelect(Tables.load(s, d, "documents"),
        "doc_id", size(split(trim(col("text")), "\\s+")),
        Seq(col("doc_id")), budget = 50000L)
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, n_tokens, cum_tokens FROM " +
      "(SELECT doc_id, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens, " +
      "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) OVER (ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens " +
      "FROM documents) WHERE cum_tokens <= 50000 ORDER BY doc_id"))

  /** BEST-FIRST BUDGET FILL ([[Sampling.tokenBudgetSelect]] ordered by
    * (quality DESC, doc_id), budget 20k tokens): the real-world corpus
    * assembly move — spend the token budget on the highest-quality
    * documents first. The order key is the [[TextAnalysis.qualityScore]]
    * double (bit-identical across engines — q_quality_score's gate), the
    * machinery is the distributed two-phase prefix sum, and the oracle
    * replays quality + window sum declaratively. */
  private val qTokenBudgetQuality = Q(
    (s, d) => {
      val docs = Tables.load(s, d, "documents")
      val withQ = docs.join(
        TextAnalysis.qualityScore(docs, "doc_id", "text"), Seq("doc_id"))
      Sampling.tokenBudgetSelect(withQ, "doc_id",
          size(split(trim(col("text")), "\\s+")),
          Seq(col("quality").desc, col("doc_id")), budget = 20000L)
        .orderBy(col("doc_id"))
    },
    Some("WITH st AS (SELECT doc_id, len(string_split_regex(trim(text), '\\s+')) AS nw, " +
      "len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS nd, " +
      "len(regexp_extract_all(lower(text), '\\b(the|a|an|and|of|to|in|is|it|for)\\b')) AS ns FROM documents), " +
      "q AS (SELECT doc_id, least(CAST(nw AS DOUBLE) / 100.0e0, 1.0e0) * 0.4e0 " +
      "+ (CAST(nd AS DOUBLE) / nw) * 0.3e0 + (CAST(ns AS DOUBLE) / nw) * 0.3e0 AS quality, " +
      "CAST(nw AS BIGINT) AS n_tokens FROM st), " +
      "c AS (SELECT doc_id, n_tokens, CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM q) " +
      "SELECT doc_id, n_tokens, cum_tokens FROM c WHERE cum_tokens <= 20000 ORDER BY doc_id"))

  /** PER-SOURCE TOKEN QUOTAS ([[Sampling.groupBudgetSelect]], 5k tokens
    * per source in doc_id order): cap each source's contribution — corpus
    * rebalancing as a selection. One window over one shuffle on `source`;
    * each group's prefix is independent, so skew is bounded by the quota
    * itself. */
  private val qSourceBudgetSelect = Q(
    (s, d) => Sampling.groupBudgetSelect(Tables.load(s, d, "documents"),
        "doc_id", "source", size(split(trim(col("text")), "\\s+")),
        Seq(col("doc_id")), budgetPerGroup = 5000L)
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, source, n_tokens, cum_tokens FROM " +
      "(SELECT doc_id, source, CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT) AS n_tokens, " +
      "CAST(sum(len(string_split_regex(trim(text), '\\s+'))) OVER (PARTITION BY source ORDER BY doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens " +
      "FROM documents) WHERE cum_tokens <= 5000 ORDER BY doc_id"))

  /** EXACT-SUBSTRING PURGE ([[Dedup.substringDedup]], k = 8, span ≥ 20):
    * documents sharing a ≥ 20-token verbatim span form components
    * ([[Dedup.dupGroups]]), min-id survives — the composition row over
    * q_substring_spans, gated through the same recursive-CTE component
    * oracle as q_neardup_purge. */
  private val qSubstringDedup = Q(
    (s, d) => Dedup.substringDedup(Tables.load(s, d, "documents"),
        "doc_id", "text", k = 8, minSpanTokens = 20,
        winsCacheKey = Some(docWinsKey(s, d)))
      .select(col("doc_id"), col("source"), col("lang"))
      .orderBy(col("doc_id")),
    Some("WITH RECURSIVE w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS w FROM documents), " +
      "wins AS (SELECT doc_id, pos, md5(array_to_string(w[pos:pos+7], ' ')) AS h FROM " +
      "(SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS pos FROM w)), " +
      "p AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS pa, b.pos AS pb " +
      "FROM wins a JOIN wins b ON a.h = b.h AND a.doc_id < b.doc_id), " +
      "isl AS (SELECT doc_a, doc_b, pa, pb, pa - pb AS diag, " +
      "pa - row_number() OVER (PARTITION BY doc_a, doc_b, pa - pb ORDER BY pa) AS g FROM p), " +
      "spans AS (SELECT doc_a, doc_b, max(pa) - min(pa) + 8 AS len_tokens " +
      "FROM isl GROUP BY doc_a, doc_b, diag, g), " +
      "sp AS (SELECT DISTINCT doc_a, doc_b FROM spans WHERE len_tokens >= 20), " +
      "edges AS (SELECT doc_a AS id, doc_b AS nbr FROM sp UNION ALL SELECT doc_b, doc_a FROM sp), " +
      "reach(id, r) AS (SELECT id, id FROM (SELECT DISTINCT id FROM edges) t " +
      "UNION SELECT e.id, reach.r FROM edges e JOIN reach ON e.nbr = reach.id), " +
      "losers AS (SELECT id FROM reach GROUP BY id HAVING min(r) < id) " +
      "SELECT doc_id, source, lang FROM documents " +
      "WHERE doc_id NOT IN (SELECT id FROM losers) ORDER BY doc_id"))

  /** FastSS fuzzy entity matching over customer names. The Spark plan is
    * the deletion-neighborhood blocked join ([[Fuzzy.fuzzySelfMatch]]); the
    * oracle is the exhaustive all-pairs levenshtein — the gate proves the
    * blocking loses no pair (FastSS is exact for lev <= maxDist, and both
    * engines implement classic unit-cost edit distance). */
  private val qFuzzyMatch = Q(
    (s, d) => Fuzzy.fuzzySelfMatch(Tables.load(s, d, "customer"),
        "c_custkey", "c_name", maxDist = 1)
      .orderBy(col("id_a"), col("id_b")),
    Some("SELECT a.c_custkey AS id_a, b.c_custkey AS id_b, " +
      "CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist " +
      "FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey " +
      "WHERE levenshtein(a.c_name, b.c_name) <= 1 " +
      "ORDER BY id_a, id_b"))

  /** Multi-pass sorted-neighborhood linkage
    * ([[graft.operators.Dedup.sortedNeighborhoodPairs]]) over a PLANTED
    * dirty registry (every 7th part's name loses its 3rd character — the
    * qNormalizeText planting pattern, mirrored in the oracle). The head
    * typo defeats the forward sort pass by construction; the reverse pass
    * recovers it — the property the query exists to pin. The oracle
    * replays both rank windows as SQL, so the recall CONTRACT (window 4,
    * first-char blocks) is part of the gate, as with every LSH-family
    * query. */
  private val qSnmPairs = Q(
    (s, d) => Dedup.sortedNeighborhoodPairs(
        Tables.load(s, d, "part").select(col("p_partkey"),
          when(col("p_partkey") % 7 === 0,
            concat(substring(col("p_name"), 1, 2),
              col("p_name").substr(lit(4), length(col("p_name")))))
            .otherwise(col("p_name")).as("nm")),
        "p_partkey", "nm", window = 4, maxDist = 2)
      .orderBy(col("id_a"), col("id_b")),
    Some("WITH dirty AS (SELECT p_partkey, CASE WHEN p_partkey % 7 = 0 " +
      "THEN substring(p_name, 1, 2) || substring(p_name, 4) ELSE p_name END AS nm FROM part), " +
      "rf AS (SELECT p_partkey, nm, substring(nm, 1, 1) AS blk, " +
      "row_number() OVER (PARTITION BY substring(nm, 1, 1) ORDER BY nm, p_partkey) AS rk FROM dirty), " +
      "rr AS (SELECT p_partkey, nm, substring(reverse(nm), 1, 1) AS blk, " +
      "row_number() OVER (PARTITION BY substring(reverse(nm), 1, 1) ORDER BY reverse(nm), p_partkey) AS rk FROM dirty), " +
      "cf AS (SELECT least(a.p_partkey, b.p_partkey) AS id_a, greatest(a.p_partkey, b.p_partkey) AS id_b " +
      "FROM rf a JOIN rf b ON a.blk = b.blk AND b.rk - a.rk BETWEEN 1 AND 3), " +
      "cr AS (SELECT least(a.p_partkey, b.p_partkey) AS id_a, greatest(a.p_partkey, b.p_partkey) AS id_b " +
      "FROM rr a JOIN rr b ON a.blk = b.blk AND b.rk - a.rk BETWEEN 1 AND 3), " +
      "c AS (SELECT DISTINCT id_a, id_b FROM (SELECT * FROM cf UNION ALL SELECT * FROM cr)) " +
      "SELECT c.id_a, c.id_b, CAST(levenshtein(x.nm, y.nm) AS BIGINT) AS dist " +
      "FROM c JOIN dirty x ON c.id_a = x.p_partkey JOIN dirty y ON c.id_b = y.p_partkey " +
      "WHERE levenshtein(x.nm, y.nm) <= 2 ORDER BY id_a, id_b"))

  /** Z-VALUE (Morton interleave) of (p_partkey, p_retailprice) — the
    * clustering key [[graft.operators.Scale.writeZOrdered]] lays files out
    * by for multi-column data skipping (the layout's skipping effect is
    * spec-verified on real file footprints in ScaleSpec; THIS row gates
    * the key's arithmetic cross-engine). Each column min/max-scales to a
    * 16-bit code — IEEE division then floor, bit-identical in both
    * engines — and the codes' bits interleave into one BIGINT. The oracle
    * unrolls the 16-bit interleave as literal shift/mask terms generated
    * by the same Scala loop that builds the Spark expression, so the two
    * plans can't drift independently. */
  private val qZorderValue = Q(
    (s, d) => {
      val p = Tables.load(s, d, "part")
        .select(col("p_partkey"), col("p_retailprice"))
      val b = p.agg(
        min(col("p_partkey")).cast("double"), max(col("p_partkey")).cast("double"),
        min(col("p_retailprice")).cast("double"), max(col("p_retailprice")).cast("double"))
        .head()
      val z = graft.operators.Scale.zValue(Seq(
        (col("p_partkey"), b.getDouble(0), b.getDouble(1)),
        (col("p_retailprice"), b.getDouble(2), b.getDouble(3))))
      p.select(col("p_partkey"), z.as("zval")).orderBy(col("p_partkey"))
    },
    Some {
      // scaled 16-bit code of column expression e given lo/hi CTE fields
      def code(e: String, lo: String, hi: String): String =
        s"LEAST(GREATEST(CAST(floor((CAST($e AS DOUBLE) - $lo) / " +
          s"GREATEST($hi - $lo, 2.2250738585072014e-308) * 65535.0e0) AS BIGINT), 0), 65535)"
      // the same bit plan Scale.zValue emits: bit b of code j lands at b*2+j
      def spread(c: String, j: Int): String =
        (0 until 16).map(b => s"((($c >> $b) & 1) << ${b * 2 + j})").mkString(" | ")
      "WITH bounds AS (SELECT CAST(min(p_partkey) AS DOUBLE) AS klo, " +
        "CAST(max(p_partkey) AS DOUBLE) AS khi, " +
        "CAST(min(p_retailprice) AS DOUBLE) AS plo, " +
        "CAST(max(p_retailprice) AS DOUBLE) AS phi FROM part), " +
        "coded AS (SELECT p_partkey, " +
        code("p_partkey", "klo", "khi") + " AS ck, " +
        code("p_retailprice", "plo", "phi") + " AS cp " +
        "FROM part, bounds) " +
        s"SELECT p_partkey, (${spread("ck", 0)}) | (${spread("cp", 1)}) AS zval " +
        "FROM coded ORDER BY p_partkey"
    })

  val registry: Seq[(String, Q)] = Seq(
    "q_zorder_value" -> qZorderValue,
    "q_dedup_containment" -> qDedupContainment,
    "q_rouge2" -> qRouge2,
    "q_j1_linkage_salted" -> qJ1Salted,
    "q_a9_engagement_map" -> qA9EngagementMap,
    "q_a6_engagement_stats" -> qA6EngagementStats,
    "q_dedup_exact" -> qDedupExact,
    "q_dedup_ngram_pairs" -> qDedupNgramPairs,
    "q_dedup_prefix_jaccard" -> qDedupPrefixJaccard,
    "q_dedup_minhash_lsh" -> qDedupMinhashLsh,
    "q_dedup_minhash_lsh_salted" -> qDedupMinhashLshSalted,
    "q_neardup_incremental" -> qNeardupIncremental,
    "q_dedup_groups" -> qDedupGroups,
    "q_dedup_groups_lsh" -> qDedupGroupsLsh,
    "q_dup_provenance" -> qDupProvenance,
    "q_dup_provenance_lsh" -> qDupProvenanceLsh,
    "q_activity_spine" -> qActivitySpine,
    "q_activity_spine_recursive" -> qActivitySpineRecursive,
    "q_interpolate_gaps" -> qInterpolateGaps,
    "q_cusum_alarms" -> qCusumAlarms,
    "q_boilerplate_purge" -> qBoilerplatePurge,
    "q_url_dedup" -> qUrlDedup,
    "q_hll_distinct" -> qHllDistinct,
    "q_kmv_intersect" -> qKmvIntersect,
    "q_quantile_sketch" -> qQuantileSketch,
    "q_quantile_sketch_merged" -> qQuantileSketchMerged,
    "q_unigram_logprob" -> qUnigramLogprob,
    "q_bigram_logprob" -> qBigramLogprob,
    "q_normalize_text" -> qNormalizeText,
    "q_sentences" -> qSentences,
    "q_mix_sources" -> qMixSources,
    "q_dedup_simhash" -> qDedupSimhash,
    "q_simhash_pairs" -> qSimhashPairs,
    "q_contamination" -> qContamination,
    "q_group_centroids" -> qGroupCentroids,
    "q_ann_brute_topk" -> qAnnBruteTopk,
    "q_ann_lsh_topk" -> qAnnLshTopk,
    "q_ann_lsh_probe_audit" -> qAnnLshProbeAudit,
    "q_ann_ivf_topk" -> qAnnIvfTopk,
    "q_ann_pq_topk" -> qAnnPqTopk,
    "q_ann_pq_exact_topk" -> qAnnPqExactTopk,
    "q_ann_ivfpq_topk" -> qAnnIvfpqTopk,
    "q_ann_ivfpq_exact_topk" -> qAnnIvfpqExactTopk,
    "q_ann_ivfpq_probe_audit" -> qAnnIvfpqProbeAudit,
    "q_ann_pq_probe_audit" -> qAnnPqProbeAudit,
    "q_emb_neardup_pairs" -> qEmbNeardupPairs,
    "q_emb_neardup_lsh" -> qEmbNeardupLsh,
    "q_emb_neardup_lsh_salted" -> qEmbNeardupLshSalted,
    "q_f2_rename_nested" -> qF2RenameNested,
    "q_text_stats" -> qTextStats,
    "q_quality_score" -> qQualityScore,
    "q_lang_id" -> qLangId,
    "q_fingerprint" -> qFingerprint,
    "q_winnow_fingerprint" -> qWinnowFingerprint,
    "q_binary_meta" -> qBinaryMeta,
    "q_image_decode" -> qImageDecode,
    "q_image_phash_dedup" -> qImagePhashDedup,
    "q_audio_decode" -> qAudioDecode,
    "q_video_frames" -> qVideoFrames,
    "q_redact_pii" -> qRedactPii,
    "q_asof_attrib" -> qAsofAttrib,
    "q_asof_forward" -> qAsofForward,
    "q_interval_join" -> qIntervalJoin,
    "q_kmeans_assign" -> qKmeansAssign,
    "q_semdedup" -> qSemDedup,
    "q_cluster_sample" -> qClusterSample,
    "q_emb_quantize" -> qEmbQuantize,
    "q_mad_outliers" -> qMadOutliers,
    "q_token_entropy" -> qTokenEntropy,
    "q_oov_rate" -> qOovRate,
    "q_compress_ratio" -> qCompressRatio,
    "q_curation_pipeline" -> qCurationPipeline,
    "q_knn_graph" -> qKnnGraph,
    "q_mutual_knn_dedup" -> qMutualKnnDedup,
    "q_mutual_knn_dedup_lsh" -> qMutualKnnDedupLsh,
    "q_mutual_knn_dedup_benign" -> qMutualKnnDedupBenign,
    "q_negative_sample" -> qNegativeSample,
    "q_negative_sample_bounded" -> qNegativeSampleBounded,
    "q_maxsim_topk" -> qMaxsimTopk,
    "q_hard_negatives" -> qHardNegatives,
    "q_rrf_hybrid" -> qRrfHybrid,
    "q_span_corrupt" -> qSpanCorrupt,
    "q_temperature_mix" -> qTemperatureMix,
    "q_correlation" -> qCorrelation,
    "q_gini" -> qGini,
    "q_winsorized" -> qWinsorized,
    "q_drift_psi" -> qDriftPsi,
    "q_rolling_zscore" -> qRollingZscore,
    "q_user_trend" -> qUserTrend,
    "q_funnel" -> qFunnel,
    "q_cohort_retention" -> qCohortRetention,
    "q_vocabulary" -> qVocabulary,
    "q_split_assign" -> qSplitAssign,
    "q_leakage_split" -> qLeakageSplit,
    "q_pref_leakage" -> qPrefLeakage,
    "q_best_of_n" -> qBestOfN,
    "q_dpo_margin" -> qDpoMargin,
    "q_source_overlap" -> qSourceOverlap,
    "q_stratified_sample" -> qStratifiedSample,
    "q_tfidf_top_terms" -> qTfidfTopTerms,
    "q_bm25_topk" -> qBm25TopK,
    "q_chunk" -> qChunk,
    "q_pack_sequences" -> qPackSequences,
    "q_quality_flags" -> qQualityFlags,
    "q_social_tags" -> qSocialTags,
    "q_paragraph_dedup" -> qParagraphDedup,
    "q_repetition_stats" -> qRepetitionStats,
    "q_decontaminate_bloom" -> qDecontaminateBloom,
    "q_neardup_purge" -> qNeardupPurge,
    "q_substring_spans" -> qSubstringSpans,
    "q_substring_spans_capped" -> qSubstringSpansCapped,
    "q_token_budget_select" -> qTokenBudgetSelect,
    "q_token_budget_quality" -> qTokenBudgetQuality,
    "q_source_budget_select" -> qSourceBudgetSelect,
    "q_substring_dedup" -> qSubstringDedup,
    "q_fuzzy_match" -> qFuzzyMatch,
    "q_snm_pairs" -> qSnmPairs,
  )
}
