package graft

import org.apache.spark.sql.functions._
import graft.operators.{Clustering, Itemsets, Profiler, Skyline, SparseSim, TextAnalysis, TopK}

/** Round-14 analytics pack: the Pareto-skyline operator family, exact
  * EWMA smoothing, min-k% probability contamination scoring, and the
  * simplified-silhouette cluster-quality audit. Determinism follows the
  * [[Queries]] header rules (total-order `orderBy`, exact fixed-point /
  * DECIMAL cross-row arithmetic, identical per-row double operand order).
  */
object QueriesAnalytics {

  private def t(s: org.apache.spark.sql.SparkSession, d: String, n: String) =
    Tables.load(s, d, n)

  /** 2D PARETO SKYLINE ([[Skyline.skyline2d]]) — the "best trade-off"
    * frontier, here recency × value over the event stream: the events no
    * later event outvalues (every monitoring dashboard's "recent highs"
    * staleness/magnitude trade-off). The plan's only global-ordered
    * window runs on the DISTINCT-X frame after a parallel bucket prune —
    * survivor grain, not corpus grain — and the frontier keys join back
    * broadcast-small. The oracle replays the identical distinct-x
    * running-max formulation. */
  private val qSkyline = Q(
    (s, d) => Skyline.skyline2d(
        t(s, d, "events").select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"), col("value")),
        "us", "value")
      .orderBy(col("event_id")),
    Some("WITH ev AS (SELECT event_id, user_id, epoch_us(ts) AS us, value " +
      "FROM events), " +
      "g AS (SELECT us AS fx, max(value) AS gy FROM ev " +
      "WHERE us IS NOT NULL AND value IS NOT NULL GROUP BY 1), " +
      "r AS (SELECT fx, gy, max(gy) OVER (ORDER BY fx DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS rm FROM g), " +
      "f AS (SELECT fx, gy FROM r WHERE rm IS NULL OR rm < gy) " +
      "SELECT e.event_id, e.user_id, e.us, e.value " +
      "FROM ev e JOIN f ON e.us = f.fx AND e.value = f.gy " +
      "ORDER BY event_id"))

  /** N-DIMENSIONAL SKYLINE ([[Skyline.skylineNd]], d=3) over per-document
    * text stats (chars × distinct tokens × longest token): deterministic
    * hash-bucket local skylines (Σ|bucket|² as ONE equi-join, never a
    * cartesian) then a volume-gated exact refine over the candidates. The
    * oracle is the textbook correlated NOT EXISTS — the definition itself,
    * affordable at oracle scale precisely because the Spark side never
    * runs it. */
  private val qSkylineNd = Q(
    (s, d) => Skyline.skylineNd(
        t(s, d, "documents").select(col("doc_id"), col("n_chars"),
          size(array_distinct(split(trim(col("text")), "\\s+"))).cast("long").as("n_utoks"),
          array_max(transform(split(trim(col("text")), "\\s+"), x => length(x)))
            .cast("long").as("max_tok")),
        dims = Seq("n_chars", "n_utoks", "max_tok"))
      .select(col("doc_id"), col("n_chars"), col("n_utoks"), col("max_tok"))
      .orderBy(col("doc_id")),
    Some("WITH m AS (SELECT doc_id, n_chars, " +
      "CAST(len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS BIGINT) AS n_utoks, " +
      "CAST(list_max(list_transform(string_split_regex(trim(text), '\\s+'), " +
      "x -> length(x))) AS BIGINT) AS max_tok FROM documents) " +
      "SELECT doc_id, n_chars, n_utoks, max_tok FROM m a " +
      "WHERE NOT EXISTS (SELECT 1 FROM m b WHERE " +
      "b.n_chars >= a.n_chars AND b.n_utoks >= a.n_utoks AND b.max_tok >= a.max_tok " +
      "AND (b.n_chars > a.n_chars OR b.n_utoks > a.n_utoks OR b.max_tok > a.max_tok)) " +
      "ORDER BY doc_id"))

  /** EXACT EWMA ([[Profiler.ewmaSmooth]], α = 1/4): per-user smoothed
    * value level over the (ts, event_id)-ordered series in int64
    * fixed-point — the sequential recursion as ONE array fold per key,
    * replayed bit-exactly by DuckDB's `list_reduce` (both fold left from
    * the first element; the α-division is an arithmetic SHIFT on both
    * engines, so negative deviations floor identically). */
  private val qEwma = Q(
    // ts IS NOT NULL: the fold order is (us, event_id) and a NULL us
    // would sort NULLS FIRST in Spark vs DuckDB's list() NULLS LAST,
    // shifting the whole fold (the q_cusum_twosided fix, ADVICE r15)
    (s, d) => Profiler.ewmaSmooth(
        t(s, d, "events")
          .filter(col("value").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("value")),
        group = "user_id", seq = Seq("us", "event_id"), x = "value",
        alphaShift = 2, scale = 4)
      .orderBy(col("user_id")),
    Some("WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, " +
      "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq " +
      "FROM events WHERE value IS NOT NULL AND ts IS NOT NULL), " +
      "l AS (SELECT user_id, list(xq ORDER BY us, event_id) AS xs " +
      "FROM e GROUP BY user_id) " +
      "SELECT user_id, CAST(len(xs) AS BIGINT) AS n_obs, " +
      "list_reduce(xs, (acc, x) -> acc + ((x - acc) >> 2)) AS ewma_fp, " +
      "round(CAST(list_reduce(xs, (acc, x) -> acc + ((x - acc) >> 2)) AS DOUBLE) " +
      "/ 10000.0, 4) AS ewma " +
      "FROM l ORDER BY user_id"))

  /** SIMPLIFIED SILHOUETTE ([[Clustering.silhouette]]) of the gated
    * k-means clustering (k=8, 2 Lloyd rounds — the q_kmeans_assign
    * parameters): per-cluster mean/min/max of (b−a)/max(a,b) from the
    * best-two centroid distances, one [[graft.plans.Top2Dist2]] codegen
    * scan. The oracle reuses the unrolled-Lloyd CTE chain and takes
    * rank-1/rank-2 distances per vector; cross-row means go through
    * round(9)→DECIMAL(18,9) sums — exact and associative on both
    * engines. */
  private val qSilhouette = Q(
    (s, d) => Clustering.silhouette(
        t(s, d, "embeddings"), "vec_id", "embedding", k = 8, iters = 2,
        memoKey = Some(QueriesExtras.kmeansKey(s, d)))
      .orderBy(col("cluster")),
    Some(QueriesExtras.KmeansSqlWith + ", " +
      "t2 AS (SELECT vec_id, c, dd, row_number() OVER (PARTITION BY vec_id " +
      "ORDER BY dd, c) AS rn FROM df), " +
      "ab AS (SELECT a.vec_id, CAST(a.c AS INT) AS cluster, a.dd AS a2, b.dd AS b2 " +
      "FROM t2 a JOIN t2 b USING (vec_id) WHERE a.rn = 1 AND b.rn = 2), " +
      "sv AS (SELECT cluster, CASE WHEN greatest(sqrt(CAST(a2 AS DOUBLE)), " +
      "sqrt(CAST(b2 AS DOUBLE))) > 0.0e0 THEN " +
      "round((sqrt(CAST(b2 AS DOUBLE)) - sqrt(CAST(a2 AS DOUBLE))) / " +
      "greatest(sqrt(CAST(a2 AS DOUBLE)), sqrt(CAST(b2 AS DOUBLE))), 9) END AS s " +
      "FROM ab) " +
      "SELECT cluster, count(*) AS n_points, " +
      "round(CAST(SUM(CAST(s AS DECIMAL(18,9))) AS DOUBLE) / " +
      "CAST(count(s) AS DOUBLE), 6) AS avg_silhouette, " +
      "min(s) AS min_silhouette, max(s) AS max_silhouette " +
      "FROM sv GROUP BY cluster ORDER BY cluster"))

  /** MIN-K% PROBABILITY ([[TextAnalysis.minKProb]], k = 20%): the
    * membership-inference contamination score — mean log-prob of each
    * document's 20% least-probable tokens under the corpus unigram LM.
    * Ranking is by exact integer counts (monotone in probability), the
    * k cut is exact ceil arithmetic; only the final per-doc mean is a
    * rounded double (the q_unigram_logprob convention). */
  private val qMinKProb = Q(
    (s, d) => TextAnalysis.minKProb(t(s, d, "documents"), "doc_id", "text", kDen = 5)
      .orderBy(col("doc_id")),
    Some("WITH toks AS (SELECT doc_id, " +
      "unnest(string_split_regex(trim(text), '\\s+')) AS tok FROM documents), " +
      "freq AS (SELECT tok, count(*) AS cnt FROM toks GROUP BY 1), " +
      "tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n_total FROM freq), " +
      "sc AS (SELECT doc_id, cnt, " +
      "count(*) OVER (PARTITION BY doc_id) AS n, " +
      "row_number() OVER (PARTITION BY doc_id ORDER BY cnt, tok) AS rn " +
      "FROM toks JOIN freq USING (tok)) " +
      "SELECT doc_id, max(n) AS n_tokens, count(*) AS k_used, " +
      "round(avg(ln(CAST(cnt AS DOUBLE) / CAST(n_total AS DOUBLE))), 6) " +
      "AS min_k_avg_logprob " +
      "FROM sc CROSS JOIN tot WHERE rn <= CAST(floor((n + 4) / 5.0) AS BIGINT) " +
      "GROUP BY doc_id ORDER BY doc_id"))

  /** Random-projection parameters: m = 16 directions (√16 = 4 keeps the
    * JL divisor exact), d = 64 (the embeddings table's dimension — the
    * oracle's literal sign matrix is d-wide, so a corpus with another
    * dimension nulls out and fails on row count, loudly). */
  private val RpM = 16
  private val RpD = 64
  private lazy val RpSigns = graft.operators.RandProj.signs(RpM, RpD)
  private lazy val RpValuesSql = (0 until RpM).map { j =>
    s"($j, [${RpSigns(j).map(v => s"${v.toDouble}").mkString(",")}])"
  }.mkString(", ")

  /** JOHNSON–LINDENSTRAUSS RANDOM PROJECTION ([[graft.operators.RandProj
    * .project]]): embeddings onto 16 fixed ±1 directions — the
    * training-free, shuffle-free dimensionality reducer (one codegen'd
    * array_dot scan). Every intermediate is an exactly-representable
    * integer (quantized components, ±1 sums ≪ 2⁵³), so DuckDB's
    * sequential `list_dot_product` over the SAME literal sign matrix
    * (the z-order generated-literals convention) reproduces every bit;
    * the gated payload is the INTEGER fixed-point projection — the JL
    * normalization (÷ scale·√m) is left to consumers because quantized
    * projections land exactly on decimal rounding ties, where the two
    * engines' round() implementations legitimately disagree. */
  private val qRandProj = Q(
    (s, d) => graft.operators.RandProj.project(
        t(s, d, "embeddings"), "vec_id", "embedding", m = RpM, d = RpD)
      .orderBy(col("vec_id"), col("j")),
    Some("WITH q AS (SELECT vec_id, list_transform(embedding::DOUBLE[], " +
      "x -> CAST(CAST(trunc(x * 1000000e0) AS BIGINT) AS DOUBLE)) AS qv " +
      "FROM embeddings WHERE embedding IS NOT NULL), " +
      s"s(j, sv) AS (SELECT * FROM (VALUES $RpValuesSql) t(j, sv)), " +
      "p AS (SELECT vec_id, j, list_dot_product(qv, sv) AS yd " +
      "FROM q CROSS JOIN s) " +
      "SELECT vec_id, j, CAST(yd AS BIGINT) AS y_fp FROM p ORDER BY vec_id, j"))

  /** JOIN-SIZE ESTIMATE ([[Profiler.joinSizeEstimate]]): the exact output
    * cardinality of orders ⋈ lineitem from key-grain count products —
    * the planner statistic that costs count-row shuffles, never fact-row
    * shuffles, plus the worst key's skew share. Integral arithmetic end
    * to end (Spark `div` ≡ DuckDB `//` on nonnegative counts). */
  private val qJoinSize = Q(
    (s, d) => Profiler.joinSizeEstimate(
        t(s, d, "orders").select(col("o_orderkey").as("jk")),
        t(s, d, "lineitem").select(col("l_orderkey").as("jk")), "jk"),
    Some("WITH ca AS (SELECT o_orderkey AS jk, count(*) AS ca FROM orders " +
      "WHERE o_orderkey IS NOT NULL GROUP BY 1), " +
      "cb AS (SELECT l_orderkey AS jk, count(*) AS cb FROM lineitem " +
      "WHERE l_orderkey IS NOT NULL GROUP BY 1), " +
      "j AS (SELECT jk, ca * cb AS contrib FROM ca JOIN cb USING (jk)), " +
      "tot AS (SELECT CAST(COALESCE(SUM(contrib), 0) AS BIGINT) AS est_rows, " +
      "count(*) AS n_keys_common FROM j), " +
      "top AS (SELECT jk AS max_key, contrib AS max_contrib FROM j " +
      "ORDER BY contrib DESC, jk LIMIT 1) " +
      "SELECT est_rows, (SELECT count(*) FROM ca) AS n_keys_left, " +
      "(SELECT count(*) FROM cb) AS n_keys_right, n_keys_common, " +
      "max_key, max_contrib, " +
      "CASE WHEN est_rows > 0 THEN (max_contrib * 1000000) // est_rows " +
      "ELSE 0 END AS skew_ppm " +
      "FROM tot CROSS JOIN top"))

  /** χ² INDEPENDENCE ([[Profiler.chiSquareIndependence]]) of language ×
    * source over the corpus — "is language confounded with source?", the
    * stratification sanity check. Counts exact, one rounded double chain
    * per CELL (category grain), DECIMAL(28,9) cell sums. */
  private val qChi2 = Q(
    (s, d) => Profiler.chiSquareIndependence(
        t(s, d, "documents"), "lang", "source"),
    Some("WITH r AS (SELECT lang, source FROM documents " +
      "WHERE lang IS NOT NULL AND source IS NOT NULL), " +
      "joint AS (SELECT lang, source, count(*) AS o FROM r GROUP BY 1, 2), " +
      "m1 AS (SELECT lang, count(*) AS rl FROM r GROUP BY 1), " +
      "m2 AS (SELECT source, count(*) AS cs FROM r GROUP BY 1), " +
      "nn AS (SELECT count(*) AS n FROM r), " +
      // zero-cell identity: chi2 = N + Σ_observed ((o−e)²/e − e)
      "cells AS (SELECT CAST(round(" +
      "(CAST(o AS DOUBLE) - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "(CAST(o AS DOUBLE) - CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)) / " +
      "(CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)) - " +
      "CAST(rl AS DOUBLE) * CAST(cs AS DOUBLE) / CAST(n AS DOUBLE), 9) " +
      "AS DECIMAL(28,9)) AS t, n " +
      "FROM joint JOIN m1 USING (lang) JOIN m2 USING (source) CROSS JOIN nn), " +
      "k1 AS (SELECT count(*) AS n_c1 FROM m1), " +
      "k2 AS (SELECT count(*) AS n_c2 FROM m2) " +
      "SELECT n, n_c1, n_c2, (n_c1 - 1) * (n_c2 - 1) AS dof, " +
      "round(greatest(0.0e0, CAST(n AS DOUBLE) + CAST(SUM(t) AS DOUBLE)), 6) AS chi2, " +
      "CASE WHEN n > 0 AND least(n_c1, n_c2) > 1 THEN " +
      "round(sqrt(greatest(0.0e0, CAST(n AS DOUBLE) + CAST(SUM(t) AS DOUBLE)) / " +
      "(CAST(n AS DOUBLE) * CAST(least(n_c1, n_c2) - 1 AS DOUBLE))), 6) END AS cramers_v " +
      "FROM cells CROSS JOIN k1 CROSS JOIN k2 GROUP BY n, n_c1, n_c2"))

  /** The oracle's 16 unrolled Hilbert levels — generated by the same loop
    * structure as the Spark walk (the z-order generated-literals
    * convention). MATERIALIZED per level: each level references the
    * previous one several times, and an inlining engine would otherwise
    * re-expand the chain exponentially (the tok_fairness lesson). */
  private lazy val HilbertLevelsSql: String = (0 until 16).map { i =>
    val b = 15 - i
    val s = 1L << b
    val s2 = s * s
    val rx = s"((hx >> $b) & 1)"
    val ry = s"((hy >> $b) & 1)"
    s"h${i + 1} AS MATERIALIZED (SELECT p_partkey, " +
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hy ELSE hy END) " +
      s"ELSE hx END AS hx, " +
      s"CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN ${s - 1} - hx ELSE hx END) " +
      s"ELSE hy END AS hy, " +
      s"hd + $s2 * xor(3 * $rx, $ry) AS hd FROM h$i)"
  }.mkString(", ")

  /** HILBERT CLUSTERING KEY ([[graft.operators.Scale.hilbertValue]]):
    * the z-order row's locality-tighter sibling over the same part
    * (key × price) plane — consecutive keys are always grid-adjacent
    * cells, so range-partitioned files cover jump-free blocks. The
    * oracle replays the scaled 16-bit codes and all 16 walk levels as
    * MATERIALIZED CTEs; two's-complement BIGINT arithmetic matches Java
    * longs bit for bit (flips can pass through negative intermediates —
    * part of the recurrence, identical on both engines). */
  private val qHilbertValue = Q(
    (s, d) => {
      val p = t(s, d, "part").select(col("p_partkey"), col("p_retailprice"))
      val b = p.agg(
        min(col("p_partkey")).cast("double"), max(col("p_partkey")).cast("double"),
        min(col("p_retailprice")).cast("double"), max(col("p_retailprice")).cast("double"))
        .head()
      p.select(col("p_partkey"),
          graft.operators.Scale.hilbertValue(
            (col("p_partkey"), b.getDouble(0), b.getDouble(1)),
            (col("p_retailprice"), b.getDouble(2), b.getDouble(3))).as("hval"))
        .orderBy(col("p_partkey"))
    },
    Some {
      def code(e: String, lo: String, hi: String): String =
        s"LEAST(GREATEST(CAST(floor((CAST($e AS DOUBLE) - $lo) / " +
          s"GREATEST($hi - $lo, 2.2250738585072014e-308) * 65535.0e0) AS BIGINT), 0), 65535)"
      "WITH bounds AS (SELECT CAST(min(p_partkey) AS DOUBLE) AS klo, " +
        "CAST(max(p_partkey) AS DOUBLE) AS khi, " +
        "CAST(min(p_retailprice) AS DOUBLE) AS plo, " +
        "CAST(max(p_retailprice) AS DOUBLE) AS phi FROM part), " +
        "h0 AS (SELECT p_partkey, " +
        code("p_partkey", "klo", "khi") + " AS hx, " +
        code("p_retailprice", "plo", "phi") + " AS hy, " +
        "CAST(0 AS BIGINT) AS hd FROM part, bounds), " +
        HilbertLevelsSql + " " +
        "SELECT p_partkey, hd AS hval FROM h16 ORDER BY p_partkey"
    })

  // planted script alphabets (26 chars each) — the corpus text is ASCII,
  // so script detection is exercised on a deterministic transliteration
  // by doc_id bucket, mirrored verbatim in the oracle
  private val AbcLatin = "abcdefghijklmnopqrstuvwxyz"
  private val AbcHan = "一二三四五六七八九十百千万亿中文数据处理系统大模型训"
  private val AbcCyr = "абвгдежзийклмнопрстуфхцчшщ"
  private val AbcGreek = "αβγδεζηθικλμνξοπρστυφχψωϊϋ"
  private val AbcHangul = "가나다라마바사아자차카타파하거너더러머버서어저처커터"

  /** UNICODE-SCRIPT PROFILE ([[TextAnalysis.scriptProfile]]) over planted
    * transliterations (doc_id mod 5 picks the script): exact per-script
    * character counts + dominant script — the routing signal langID
    * can't provide when the script itself is wrong. Java `\p{IsX}` and
    * RE2 `\p{X}` agree on the planted alphabets; the gate carries no
    * doubles. */
  private val qScriptDetect = Q(
    (s, d) => {
      val planted = when(pmod(col("doc_id"), lit(5)) === 0,
          translate(substring(col("text"), 1, 60), AbcLatin, AbcHan))
        .when(pmod(col("doc_id"), lit(5)) === 1,
          translate(substring(col("text"), 1, 60), AbcLatin, AbcCyr))
        .when(pmod(col("doc_id"), lit(5)) === 2,
          translate(substring(col("text"), 1, 60), AbcLatin, AbcGreek))
        .when(pmod(col("doc_id"), lit(5)) === 3,
          translate(substring(col("text"), 1, 60), AbcLatin, AbcHangul))
        .otherwise(substring(col("text"), 1, 60))
      TextAnalysis.scriptProfile(
          t(s, d, "documents").select(col("doc_id"), planted.as("pt")),
          "doc_id", "pt")
        .orderBy(col("doc_id"))
    },
    Some {
      def tr(target: String) = s"translate(substring(text, 1, 60), '$AbcLatin', '$target')"
      def cnt(cls: String) =
        s"CAST(len(regexp_extract_all(pt, '[\\p{$cls}]')) AS BIGINT)"
      "WITH p AS (SELECT doc_id, CASE doc_id % 5 " +
        s"WHEN 0 THEN ${tr(AbcHan)} WHEN 1 THEN ${tr(AbcCyr)} " +
        s"WHEN 2 THEN ${tr(AbcGreek)} WHEN 3 THEN ${tr(AbcHangul)} " +
        "ELSE substring(text, 1, 60) END AS pt FROM documents), " +
        s"c AS (SELECT doc_id, ${cnt("Han")} AS n_han, " +
        s"${cnt("Cyrillic")} AS n_cyrillic, ${cnt("Greek")} AS n_greek, " +
        s"${cnt("Hangul")} AS n_hangul, ${cnt("Latin")} AS n_latin FROM p) " +
        "SELECT doc_id, n_han, n_cyrillic, n_greek, n_hangul, n_latin, " +
        "CASE WHEN n_han >= n_cyrillic AND n_han >= n_greek AND n_han >= n_hangul " +
        "AND n_han >= n_latin AND n_han > 0 THEN 'han' " +
        "WHEN n_cyrillic >= n_greek AND n_cyrillic >= n_hangul " +
        "AND n_cyrillic >= n_latin AND n_cyrillic > 0 THEN 'cyrillic' " +
        "WHEN n_greek >= n_hangul AND n_greek >= n_latin AND n_greek > 0 THEN 'greek' " +
        "WHEN n_hangul >= n_latin AND n_hangul > 0 THEN 'hangul' " +
        "ELSE 'latin' END AS dominant_script " +
        "FROM c ORDER BY doc_id"
    })

  /** BENFORD FIRST-DIGIT AUDIT ([[Profiler.benfordAudit]]) of the event
    * value column: exact integer leading digits (decimal-string of the
    * fixed-point int — no log10 near power-of-ten boundaries), integral
    * ppm shares, and the Benford expectations as literals generated once
    * driver-side into BOTH engines. */
  private val qBenford = Q(
    (s, d) => Profiler.benfordAudit(t(s, d, "events"), "value", scale = 4)
      .orderBy(col("digit")),
    Some {
      val caseSql = "CASE digit " + (1 to 9).map(dd =>
        s"WHEN $dd THEN ${(math.log10(1.0 + 1.0 / dd) * 1e6).toLong}")
        .mkString(" ") + " END"
      "WITH v AS (SELECT CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vq " +
        "FROM events WHERE value IS NOT NULL), " +
        "d AS (SELECT CAST(substring(CAST(vq AS VARCHAR), 1, 1) AS BIGINT) AS digit, " +
        "count(*) AS n FROM v WHERE vq > 0 GROUP BY 1), " +
        "t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM d) " +
        s"SELECT digit, n, (n * 1000000) // nt AS observed_ppm, " +
        s"CAST($caseSql AS BIGINT) AS benford_ppm, " +
        s"(n * 1000000) // nt - CAST($caseSql AS BIGINT) AS diff_ppm " +
        "FROM d CROSS JOIN t ORDER BY digit"
    })

  /** SNAPSHOT DIFF ([[graft.operators.Changelog.snapshotDiff]]): the CDC
    * delta between two last-write-wins snapshots of the user table —
    * `before` built from a replica missing a quarter of the change
    * stream (event_id ≡ 0 mod 4 withheld), `after` from the full stream
    * — one full-outer key join, null-safe per-column compare, unchanged
    * keys vanish. The oracle rebuilds both snapshots with the
    * q_cdc_apply window and mirrors the op/compare logic. */
  private val qSnapshotDiff = Q(
    (s, d) => {
      def snap(df: org.apache.spark.sql.DataFrame) = graft.operators.Changelog.cdcApply(
        df.select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value")),
        key = Seq("user_id"), seq = Seq("ts", "event_id"),
        opCol = col("event_type"), deleteOp = "error")
      val ev = t(s, d, "events")
      graft.operators.Changelog.snapshotDiff(
          snap(ev.filter(pmod(col("event_id"), lit(4)) =!= 0)), snap(ev),
          key = Seq("user_id"), cols = Seq("event_id", "event_type", "value"))
        .orderBy(col("user_id"))
    },
    Some {
      def snap(name: String, where: String) =
        s"$name AS (SELECT user_id, event_id, event_type, value FROM (" +
          "SELECT user_id, event_id, event_type, value, " +
          "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
          s"FROM events $where) WHERE rn = 1 AND event_type <> 'error')"
      "WITH " + snap("b", "WHERE event_id % 4 <> 0") + ", " + snap("a", "") + " " +
        "SELECT COALESCE(b.user_id, a.user_id) AS user_id, " +
        "CASE WHEN b.user_id IS NULL THEN 'insert' " +
        "WHEN a.user_id IS NULL THEN 'delete' ELSE 'update' END AS op, " +
        "b.event_id AS event_id_before, a.event_id AS event_id_after, " +
        "b.event_type AS event_type_before, a.event_type AS event_type_after, " +
        "b.value AS value_before, a.value AS value_after " +
        "FROM b FULL OUTER JOIN a ON b.user_id = a.user_id " +
        "WHERE b.user_id IS NULL OR a.user_id IS NULL OR " +
        "NOT (b.event_id IS NOT DISTINCT FROM a.event_id " +
        "AND b.event_type IS NOT DISTINCT FROM a.event_type " +
        "AND b.value IS NOT DISTINCT FROM a.value) " +
        "ORDER BY user_id"
    })

  /** MARKOV TRANSITION MATRIX ([[Profiler.transitionMatrix]]): the
    * first-order behavior model of the event stream — per-user
    * consecutive event-type pairs, counted into a |states|²-max cell
    * table with integral ppm shares. */
  private val qMarkov = Q(
    (s, d) => Profiler.transitionMatrix(
        t(s, d, "events"), "user_id", Seq("ts", "event_id"), "event_type")
      .orderBy(col("from_state"), col("to_state")),
    Some("WITH p AS (SELECT user_id, event_type AS from_state, " +
      "lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_state " +
      "FROM events WHERE event_type IS NOT NULL), " +
      "c AS (SELECT from_state, to_state, count(*) AS n FROM p " +
      "WHERE to_state IS NOT NULL GROUP BY 1, 2), " +
      "ft AS (SELECT from_state, CAST(SUM(n) AS BIGINT) AS tot FROM c GROUP BY 1) " +
      "SELECT c.from_state, c.to_state, c.n, (c.n * 1000000) // ft.tot AS p_ppm " +
      "FROM c JOIN ft USING (from_state) ORDER BY from_state, to_state"))

  /** WELCH'S T-TEST ([[Profiler.welchTTest]]): view vs purchase value —
    * the A/B readout from exact DECIMAL moments, one fixed double chain
    * for t and the Welch–Satterthwaite df, mirrored operand for operand. */
  private val qAbTtest = Q(
    (s, d) => Profiler.welchTTest(
        t(s, d, "events"), "event_type", "value", a = "view", b = "purchase"),
    Some {
      def mean(s: String) = s"sx_$s / CAST(n_$s AS DOUBLE)"
      def va(s: String) =
        s"(sxx_$s - sx_$s * sx_$s / CAST(n_$s AS DOUBLE)) / (CAST(n_$s AS DOUBLE) - 1.0e0)"
      def se2(s: String) = s"${va(s)} / CAST(n_$s AS DOUBLE)"
      "WITH m AS (SELECT event_type, count(*) AS n, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sx, " +
        "CAST(SUM(CAST(value AS DECIMAL(18,4)) * CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sxx " +
        "FROM events WHERE value IS NOT NULL AND event_type IN ('view', 'purchase') " +
        "GROUP BY 1), " +
        "a AS (SELECT n AS n_a, sx AS sx_a, sxx AS sxx_a FROM m WHERE event_type = 'view'), " +
        "b AS (SELECT n AS n_b, sx AS sx_b, sxx AS sxx_b FROM m WHERE event_type = 'purchase') " +
        s"SELECT n_a, n_b, round(${mean("a")}, 6) AS mean_a, round(${mean("b")}, 6) AS mean_b, " +
        s"CASE WHEN n_a > 1 AND n_b > 1 THEN round((${mean("a")} - ${mean("b")}) / " +
        s"sqrt(${se2("a")} + ${se2("b")}), 6) END AS t_stat, " +
        s"CASE WHEN n_a > 1 AND n_b > 1 THEN round((${se2("a")} + ${se2("b")}) * " +
        s"(${se2("a")} + ${se2("b")}) / (${se2("a")} * ${se2("a")} / (CAST(n_a AS DOUBLE) - 1.0e0) + " +
        s"${se2("b")} * ${se2("b")} / (CAST(n_b AS DOUBLE) - 1.0e0)), 6) END AS welch_df " +
        "FROM a CROSS JOIN b"
    })

  /** MOJIBAKE DETECT + REPAIR ([[TextAnalysis.mojibakeHits]] /
    * [[TextAnalysis.fixMojibake]]) over planted encoding damage (doc_id
    * mod 4 picks the injected digraph; one bucket stays clean): exact
    * signature counts via length arithmetic — no regex — and the
    * chained-replace repair, both generated from ONE Scala table into
    * both engines. */
  private val qMojibake = Q(
    (s, d) => {
      val planted = when(pmod(col("doc_id"), lit(4)) === 0,
          replace(col("text"), lit("e"), lit("Ã©")))
        .when(pmod(col("doc_id"), lit(4)) === 1,
          replace(col("text"), lit("o"), lit("Ã³")))
        .when(pmod(col("doc_id"), lit(4)) === 2,
          replace(col("text"), lit("a"), lit("â€™")))
        .otherwise(col("text"))
      t(s, d, "documents")
        .select(col("doc_id"), planted.as("pt"))
        .select(col("doc_id"),
          TextAnalysis.mojibakeHits(col("pt")).as("n_hits"),
          substring(TextAnalysis.fixMojibake(col("pt")), 1, 50).as("fixed50"))
        .orderBy(col("doc_id"))
    },
    Some {
      val hits = TextAnalysis.MojibakeTable.map { case (p, _) =>
        s"(length(pt) - length(replace(pt, '$p', ''))) // ${p.length}"
      }.mkString("(", " + ", ")")
      val repaired = TextAnalysis.MojibakeTable.foldLeft("pt") {
        case (e, (p, r)) => s"replace($e, '$p', '$r')"
      }
      "WITH p AS (SELECT doc_id, CASE doc_id % 4 " +
        "WHEN 0 THEN replace(text, 'e', 'Ã©') " +
        "WHEN 1 THEN replace(text, 'o', 'Ã³') " +
        "WHEN 2 THEN replace(text, 'a', 'â€™') " +
        "ELSE text END AS pt FROM documents) " +
        s"SELECT doc_id, CAST($hits AS BIGINT) AS n_hits, " +
        s"substring($repaired, 1, 50) AS fixed50 " +
        "FROM p ORDER BY doc_id"
    })

  /** POISSON BOOTSTRAP ([[graft.operators.Sampling.poissonBootstrapMeans]],
    * B = 32): the hash-deterministic resampling distribution of the mean
    * event value — every resample's membership reproduced exactly by the
    * oracle from the portable md5 draw and the Poisson(1) inverse-CDF
    * ppm table generated into both engines. A bootstrap you can
    * hash-verify. */
  private val qBootstrap = Q(
    (s, d) => graft.operators.Sampling.poissonBootstrapMeans(
        t(s, d, "events"), "event_id", "value", draws = 32)
      .orderBy(col("b")),
    Some {
      val th = graft.operators.Sampling.BootThresholdsPpm
      val caseSql = "CASE " + th.zipWithIndex.map { case (t, k) =>
        s"WHEN uu < $t THEN $k" }.mkString(" ") + s" ELSE ${th.length} END"
      "WITH e AS (SELECT event_id, " +
        "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq " +
        "FROM events WHERE value IS NOT NULL), " +
        "h AS (SELECT event_id, xq, ('0x' || substr(md5(CAST(event_id AS VARCHAR) " +
        "|| 'boot'), 1, 8))::BIGINT AS hh FROM e), " +
        "x AS (SELECT hh, xq, b FROM h CROSS JOIN " +
        "(SELECT unnest(range(0, 32)) AS b) bs), " +
        "u AS (SELECT b, xq, " +
        "((hh + (b + 1) * 1000003) * 998244353) % 1000000007 % 1000000 AS uu " +
        "FROM x), " +
        s"m AS (SELECT b, xq, CAST($caseSql AS BIGINT) AS mm FROM u) " +
        "SELECT b, CAST(SUM(mm) AS BIGINT) AS n_drawn, " +
        "CASE WHEN SUM(mm) > 0 THEN round(CAST(SUM(mm * xq) AS DOUBLE) / " +
        "CAST(SUM(mm) AS DOUBLE) / 10000.0e0, 6) END AS mean_b " +
        "FROM m GROUP BY b ORDER BY b"
    })

  /** RFM SEGMENTATION ([[Profiler.rfmSegments]]): recency × frequency ×
    * monetary quintiles per user with fully-deterministic ntile orders
    * (metric, then key) and the 3-digit segment code — the classic
    * customer-value grid, key-grain windows only. */
  private val qRfm = Q(
    (s, d) => Profiler.rfmSegments(
        t(s, d, "events"), "user_id", "ts", "value")
      .orderBy(col("user_id")),
    Some("WITH k AS (SELECT user_id, max(epoch_us(ts)) AS lastus, " +
      "count(*) AS f_cnt, " +
      "CAST(COALESCE(SUM(CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT)), 0) " +
      "AS BIGINT) AS m_fp " +
      "FROM events WHERE ts IS NOT NULL GROUP BY 1), " +
      "r AS (SELECT user_id, f_cnt, m_fp, " +
      "(max(lastus) OVER () - lastus) // 86400000000 AS r_days FROM k), " +
      "q AS (SELECT user_id, r_days, f_cnt, m_fp, " +
      "CAST(ntile(5) OVER (ORDER BY r_days DESC, user_id) AS BIGINT) AS r_q, " +
      "CAST(ntile(5) OVER (ORDER BY f_cnt, user_id) AS BIGINT) AS f_q, " +
      "CAST(ntile(5) OVER (ORDER BY m_fp, user_id) AS BIGINT) AS m_q FROM r) " +
      "SELECT user_id, r_days, f_cnt, m_fp, r_q, f_q, m_q, " +
      "r_q * 100 + f_q * 10 + m_q AS segment " +
      "FROM q ORDER BY user_id"))

  /** TWO-SAMPLE KS ([[Profiler.ksTest]]): view vs purchase value
    * distributions — D found over exact integer numerators at the
    * distinct-value grain; only the final division and √-normalization
    * are rounded doubles, mirrored operand for operand. */
  private val qKsTest = Q(
    (s, d) => Profiler.ksTest(
        t(s, d, "events"), "event_type", "value", a = "view", b = "purchase"),
    Some("WITH pv AS (SELECT value, " +
      "SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS ca, " +
      "SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cb " +
      "FROM events WHERE value IS NOT NULL " +
      "AND event_type IN ('view', 'purchase') GROUP BY value), " +
      "cum AS (SELECT value, " +
      "SUM(ca) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma, " +
      "SUM(cb) OVER (ORDER BY value ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb, " +
      "SUM(ca) OVER () AS na, SUM(cb) OVER () AS nb FROM pv), " +
      "agg AS (SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b, " +
      "CAST(max(abs(cuma * nb - cumb * na)) AS BIGINT) AS d_num FROM cum) " +
      "SELECT n_a, n_b, d_num, " +
      "round(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d, " +
      "CASE WHEN n_a > 0 AND n_b > 0 THEN " +
      "round(sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / " +
      "CAST(n_a + n_b AS DOUBLE)) * " +
      "(CAST(d_num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) " +
      "END AS ks_stat FROM agg"))

  /** GLOBAL EXACT TOP-K BY TOTAL ([[TopK.globalTopK]]) — the classic
    * distributed threshold-algorithm shape the board lacked: top-10
    * customers by exact lifetime spend (cents fixed-point). The Spark
    * side shuffles ≤ k·P per-partition heads + candidate partials, never
    * the full customer-grain aggregate; the proven-exact answer matches
    * the oracle's plain GROUP BY / ORDER BY / LIMIT definition. The
    * fallback path (near-uniform totals) returns the identical frame, so
    * the row is deterministic under any partitioning. */
  private val qGlobalTopk = Q(
    (s, d) => TopK.globalTopK(
        t(s, d, "orders"),
        col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"),
        k = 10)
      .select(col("k").as("o_custkey"), col("total").as("total_cents"))
      .orderBy(col("total_cents").desc, col("o_custkey")),
    Some("SELECT o_custkey, " +
      "CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) " +
      "AS total_cents FROM orders " +
      "WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL " +
      "GROUP BY o_custkey ORDER BY total_cents DESC, o_custkey LIMIT 10"))

  /** ALL-PAIRS TF-IDF COSINE ([[SparseSim.cosinePairsOver]], τ = 4/5)
    * over the dedup family's word 5-gram shingles — the WEIGHTED
    * set-similarity row beside q_dedup_ngram_pairs' unweighted Jaccard:
    * rare shared shingles count for more. Shingle features, not raw
    * unigrams, by the operator's feature-choice contract (this corpus is
    * 31 distinct words, every one in ~78% of documents — no rarity tail,
    * nothing any prefix filter could cut; shingles are combinatorially
    * rare and prune hard). Bayardo prefix filter on a rarest-first
    * global order; candidates = prefix ⋈ postings, never the feature
    * self-join. The oracle replays the exhaustive definition from the
    * SAME shingle CTE with the identical fixed-point weights
    * (floor-quantized idf, HUGEINT dot ≡ DECIMAL(38,0) dot). */
  private val qSparseCos = Q(
    (s, d) => SparseSim.cosinePairsOver(
        graft.operators.Dedup.shingles(t(s, d, "documents"), "doc_id", "text", 5),
        "doc_id", "shingle", tauNum = 4, tauDen = 5)
      .orderBy(col("doc_a"), col("doc_b")),
    Some(QueriesExtras.ShingleBaseCte +
      "tf AS (SELECT doc_id AS doc, g AS term, count(*) AS tf FROM sh GROUP BY 1, 2), " +
      "dfq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1), " +
      "n AS (SELECT count(DISTINCT doc) AS n_docs FROM tf), " +
      "wq AS (SELECT doc, term, tf * (((n_docs + 1) * 1000) // (doc_freq + 1)) AS w " +
      "FROM tf JOIN dfq USING (term) CROSS JOIN n), " +
      "norms AS (SELECT doc, sum(CAST(w AS HUGEINT) * w) AS norm2 FROM wq GROUP BY 1), " +
      "dots AS (SELECT a.doc AS doc_a, b.doc AS doc_b, " +
      "sum(CAST(a.w AS HUGEINT) * b.w) AS dot " +
      "FROM wq a JOIN wq b USING (term) WHERE a.doc < b.doc GROUP BY 1, 2), " +
      "scored AS (SELECT doc_a, doc_b, CAST(dot AS DOUBLE) / " +
      "sqrt(CAST(na.norm2 AS DOUBLE) * CAST(nb.norm2 AS DOUBLE)) AS c " +
      "FROM dots JOIN norms na ON na.doc = dots.doc_a " +
      "JOIN norms nb ON nb.doc = dots.doc_b) " +
      "SELECT doc_a, doc_b, round(c, 6) AS cos FROM scored " +
      "WHERE c >= 0.8e0 ORDER BY doc_a, doc_b"))

  /** FREQUENT ITEM PAIRS ([[Itemsets.frequentPairs]], support ≥ 1/2)
    * over per-document token sets — A-priori level 2: the within-basket
    * pair join runs only over individually-frequent items (L1), and the
    * fractional threshold is an exact integer compare. The oracle
    * replays the identical L1-restricted join. */
  private val qFreqPairs = Q(
    (s, d) => Itemsets.frequentPairs(
        t(s, d, "documents").select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("tok")),
        basket = "doc_id", item = "tok", minNum = 1, minDen = 2),
    Some("WITH b AS (SELECT DISTINCT doc_id AS b, " +
      "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS i FROM documents), " +
      "nb AS (SELECT count(DISTINCT b) AS n_baskets FROM b), " +
      "l1 AS (SELECT i, count(*) AS s FROM b GROUP BY 1 " +
      "HAVING count(*) * 2 >= (SELECT n_baskets FROM nb) * 1), " +
      "bf AS (SELECT b.b, b.i, l1.s FROM b JOIN l1 USING (i)), " +
      "p AS (SELECT a.i AS item_a, c.i AS item_b, count(*) AS support, " +
      "min(a.s) AS support_a, min(c.s) AS support_b " +
      "FROM bf a JOIN bf c ON a.b = c.b AND a.i < c.i GROUP BY 1, 2), " +
      "f AS (SELECT item_a, item_b, support, support_a, support_b, n_baskets " +
      "FROM p CROSS JOIN nb WHERE support * 2 >= n_baskets * 1) " +
      "SELECT item_a, item_b, support, support_a, support_b, " +
      "round(CAST(support AS DOUBLE) * CAST(n_baskets AS DOUBLE) / " +
      "(CAST(support_a AS DOUBLE) * CAST(support_b AS DOUBLE)), 6) AS lift " +
      "FROM f ORDER BY support DESC, item_a, item_b"))

  /** WOE / INFORMATION VALUE ([[Profiler.woeIv]]): how predictive is
    * `source` of lang = 'en'? Shares [[Profiler]]'s drift core — IV is
    * the PSI sum over category bins — so the oracle is the q_drift_psi
    * SQL with categories as bins and pos/neg as the two sides. */
  private val qWoeIv = Q(
    (s, d) => Profiler.woeIv(t(s, d, "documents"), "source", col("lang") === "en"),
    Some("WITH r AS (SELECT source, lang FROM documents WHERE source IS NOT NULL), " +
      "ca AS (SELECT source AS bin, count(*) AS n_a FROM r WHERE lang = 'en' GROUP BY 1), " +
      "cb AS (SELECT source AS bin, count(*) AS n_b FROM r " +
      "WHERE NOT (lang = 'en') GROUP BY 1), " +
      "j AS (SELECT COALESCE(ca.bin, cb.bin) AS bin, COALESCE(n_a, 0) AS n_a, " +
      "COALESCE(n_b, 0) AS n_b FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin), " +
      "st AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b, count(*) AS nbins FROM j), " +
      "t AS (SELECT bin, n_a, n_b, " +
      "round(ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / " +
      "CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS woe, " +
      "round((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + nbins AS DOUBLE) " +
      "- CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + nbins AS DOUBLE)) " +
      "* ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / " +
      "CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS iv_term " +
      "FROM j CROSS JOIN st) " +
      "SELECT bin AS source, n_a AS n_pos, n_b AS n_neg, woe, iv_term, " +
      "CAST(SUM(CAST(iv_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS iv " +
      "FROM t ORDER BY source"))

  /** TIME-OF-WEEK SEASONALITY ([[Profiler.seasonalProfile]]) of event
    * values: ≤ 168 slot rows via pure integer epoch calendar math (no
    * locale-dependent dayofweek on either engine). */
  private val qSeasonal = Q(
    (s, d) => Profiler.seasonalProfile(t(s, d, "events"), "ts", "value"),
    Some("WITH e AS (SELECT ((epoch_us(ts) // 86400000000 + 4) % 7) AS dow, " +
      "((epoch_us(ts) // 3600000000) % 24) AS hour, " +
      "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vq " +
      "FROM events WHERE ts IS NOT NULL AND value IS NOT NULL), " +
      "s AS (SELECT dow, hour, count(*) AS n, " +
      "SUM(CAST(vq AS DECIMAL(28,0))) AS sq FROM e GROUP BY 1, 2), " +
      "t AS (SELECT SUM(n) AS n_all, SUM(sq) AS sq_all FROM s) " +
      "SELECT dow, hour, n, " +
      "round(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e4, 6) AS mean_value, " +
      "round((CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / 1e4) / " +
      "(CAST(sq_all AS DOUBLE) / CAST(n_all AS DOUBLE) / 1e4), 6) AS lift " +
      "FROM s CROSS JOIN t ORDER BY dow, hour"))

  /** TWO-SIDED CUSUM SUMMARY ([[Profiler.cusumTwoSided]], k = 1.0,
    * h = 50.0) per user over the (ts, event_id)-ordered value series —
    * the group-grain companion row to q_cusum_alarms' per-point
    * trajectory: same prefix-sum identity, n-scaled integer arithmetic
    * (multiplying through by n removes the one division whose negative
    * floor/truncate semantics differ across engines), both directions,
    * one row per user. The oracle replays the identical windows. */
  private val qCusum = Q(
    // ts IS NOT NULL matches q_burstiness below: a NULL ts would sort
    // NULLS FIRST in Spark windows vs DuckDB's NULLS LAST default,
    // shifting the whole prefix-sum trajectory (ADVICE r15)
    (s, d) => Profiler.cusumTwoSided(
        t(s, d, "events")
          .filter(col("value").isNotNull && col("ts").isNotNull)
          .select(col("user_id"), unix_micros(col("ts")).as("us"),
            col("event_id"), col("value")),
        group = "user_id", seq = Seq("us", "event_id"), x = "value",
        slack = 1.0, threshold = 50.0, scale = 4)
      .orderBy(col("user_id")),
    Some("WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, " +
      "CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS xq " +
      "FROM events WHERE value IS NOT NULL AND ts IS NOT NULL), " +
      "w AS (SELECT user_id, us, event_id, xq, " +
      "count(*) OVER (PARTITION BY user_id) AS n, " +
      "SUM(xq) OVER (PARTITION BY user_id) AS tot, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY us, event_id) AS rn " +
      "FROM e), " +
      "p AS (SELECT user_id, n, rn, " +
      "SUM(n * xq - tot - n * 10000) OVER (PARTITION BY user_id " +
      "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp, " +
      "SUM(tot - n * xq - n * 10000) OVER (PARTITION BY user_id " +
      "ORDER BY us, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pn, " +
      "us, event_id FROM w), " +
      "sx AS (SELECT user_id, n, rn, " +
      "pp - least(0, min(pp) OVER (PARTITION BY user_id ORDER BY us, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sp, " +
      "pn - least(0, min(pn) OVER (PARTITION BY user_id ORDER BY us, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS sn FROM p) " +
      "SELECT user_id, count(*) AS n_obs, " +
      "round(CAST(max(sp) AS DOUBLE) / CAST(max(n) * 10000 AS DOUBLE), 6) AS smax_pos, " +
      "round(CAST(max(sn) AS DOUBLE) / CAST(max(n) * 10000 AS DOUBLE), 6) AS smax_neg, " +
      "min(CASE WHEN sp > n * 500000 OR sn > n * 500000 THEN rn END) AS first_alarm " +
      "FROM sx GROUP BY user_id ORDER BY user_id"))

  /** BINNED WOE / IV ([[Profiler.woeIv]] composed over fixed-width
    * value bins): is the event value predictive of event_type =
    * 'purchase'? The continuous-feature form every scorecard uses —
    * same shared drift core, bins via exact floor arithmetic (DuckDB
    * CAST(double AS BIGINT) ROUNDS, so both engines floor first).
    * SIGN-SAFE binning (ADVICE r15): `floor(value / 20)` on both
    * engines — the earlier `floor(value) div 20` vs `// 20` pair agreed
    * only for non-negative values (Spark `div` truncates toward zero,
    * DuckDB `//` floors, e.g. -7: 0 vs -1). Same IEEE double divide by
    * 20 on both sides, then floor, then an exact integral cast. */
  private val qWoeIvBinned = Q(
    (s, d) => Profiler.woeIv(
        t(s, d, "events").filter(col("value").isNotNull)
          .withColumn("vbin", floor(col("value") / lit(20.0)).cast("long")),
        "vbin", col("event_type") === "purchase"),
    Some("WITH r AS (SELECT CAST(floor(value / 20e0) AS BIGINT) AS vbin, event_type " +
      "FROM events WHERE value IS NOT NULL), " +
      "ca AS (SELECT vbin AS bin, count(*) AS n_a FROM r " +
      "WHERE event_type = 'purchase' GROUP BY 1), " +
      "cb AS (SELECT vbin AS bin, count(*) AS n_b FROM r " +
      "WHERE NOT (event_type = 'purchase') GROUP BY 1), " +
      "j AS (SELECT COALESCE(ca.bin, cb.bin) AS bin, COALESCE(n_a, 0) AS n_a, " +
      "COALESCE(n_b, 0) AS n_b FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin), " +
      "st AS (SELECT SUM(n_a) AS tot_a, SUM(n_b) AS tot_b, count(*) AS nbins FROM j), " +
      "t AS (SELECT bin, n_a, n_b, " +
      "round(ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / " +
      "CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS woe, " +
      "round((CAST(n_a + 1 AS DOUBLE) / CAST(tot_a + nbins AS DOUBLE) " +
      "- CAST(n_b + 1 AS DOUBLE) / CAST(tot_b + nbins AS DOUBLE)) " +
      "* ln(CAST((n_a + 1) * (tot_b + nbins) AS DOUBLE) / " +
      "CAST((n_b + 1) * (tot_a + nbins) AS DOUBLE)), 6) AS iv_term " +
      "FROM j CROSS JOIN st) " +
      "SELECT bin AS vbin, n_a AS n_pos, n_b AS n_neg, woe, iv_term, " +
      "CAST(SUM(CAST(iv_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS iv " +
      "FROM t ORDER BY vbin"))

  /** FLESCH READING-EASE ([[TextAnalysis.readability]]): the published
    * readability quality signal — vowel-group syllables with the
    * per-word ≥1 floor counted globally, sentence runs floored at 1;
    * exact integer counts, one double chain, round(6). */
  private val qReadability = Q(
    (s, d) => TextAnalysis.readability(t(s, d, "documents"), "doc_id", "text")
      .orderBy(col("doc_id")),
    Some("WITH w AS (SELECT doc_id, trim(lower(text)) AS lt, text FROM documents), " +
      "m AS (SELECT doc_id, " +
      "CAST(CASE WHEN length(trim(text)) = 0 THEN 0 " +
      "ELSE len(string_split_regex(lt, '\\s+')) END AS BIGINT) AS n_words, " +
      "CAST(greatest(len(regexp_extract_all(text, '[.!?]+', 0)), 1) AS BIGINT) AS n_sentences, " +
      "CAST(len(regexp_extract_all(lt, '[aeiouy]+', 0)) + " +
      "len(list_filter(string_split_regex(lt, '\\s+'), " +
      "x -> NOT regexp_matches(x, '[aeiouy]'))) AS BIGINT) AS n_syllables " +
      "FROM w) " +
      "SELECT doc_id, n_words, n_sentences, n_syllables, " +
      "CASE WHEN n_words > 0 THEN round(206.835e0 " +
      "- 1.015e0 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE)) " +
      "- 84.6e0 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6) " +
      "END AS flesch FROM m ORDER BY doc_id"))

  /** INTER-ARRIVAL BURSTINESS ([[Profiler.burstiness]]) per user over
    * the event stream — (σ−μ)/(σ+μ) of the gap distribution, the
    * bot-vs-human shape signal rate alone misses. Exact integer gap
    * moments (HUGEINT ≡ DECIMAL(38,0) for Σg²); one mirrored double
    * chain. */
  private val qBurstiness = Q(
    (s, d) => Profiler.burstiness(
        t(s, d, "events").filter(col("ts").isNotNull)
          .select(col("user_id"), col("ts"),
            unix_micros(col("ts")).as("us"), col("event_id")),
        group = "user_id", seq = Seq("us", "event_id"), ts = "ts")
      .orderBy(col("user_id")),
    Some("WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id FROM events " +
      "WHERE ts IS NOT NULL), " +
      "g AS (SELECT user_id, us - lag(us) OVER (PARTITION BY user_id " +
      "ORDER BY us, event_id) AS gap FROM e), " +
      "a AS (SELECT user_id, count(*) AS n_gaps, CAST(SUM(gap) AS BIGINT) AS sg, " +
      "SUM(CAST(gap AS HUGEINT) * gap) AS sg2 FROM g WHERE gap IS NOT NULL " +
      "GROUP BY 1), " +
      "b AS (SELECT user_id, n_gaps, " +
      "CAST(sg AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS mu, " +
      "CAST(sg2 AS DOUBLE) / CAST(n_gaps AS DOUBLE) AS m2 FROM a), " +
      "c AS (SELECT user_id, n_gaps, mu, " +
      "sqrt(greatest(m2 - mu * mu, 0e0)) AS sigma FROM b) " +
      "SELECT user_id, n_gaps, CAST(floor(mu) AS BIGINT) AS mean_gap_us, " +
      "CASE WHEN n_gaps >= 2 AND sigma + mu > 0e0 THEN " +
      "round((sigma - mu) / (sigma + mu), 6) END AS burstiness " +
      "FROM c ORDER BY user_id"))

  /** SPEARMAN ρ ([[Profiler.spearman]]) between quantity and discount
    * over lineitem — both quantized to exact integers (quantity is
    * integral; discount via the DECIMAL(4,2)·100 exact-cents trick), so
    * every midrank and moment sum is an exact integer and only the final
    * ρ is a mirrored double chain. The two marginal windows run over ≤ 50
    * and ≤ 11 distinct values — the documented bounded-cardinality
    * window contract. */
  private val qSpearman = Q(
    (s, d) => Profiler.spearman(t(s, d, "lineitem"),
      col("l_quantity"),
      (col("l_discount").cast("decimal(4,2)") * 100).cast("long")),
    Some("WITH r AS (SELECT CAST(l_quantity AS BIGINT) AS x, " +
      "CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS y " +
      "FROM lineitem WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL), " +
      "cells AS (SELECT x, y, count(*) AS w FROM r GROUP BY 1, 2), " +
      "mx AS (SELECT x, count(*) AS c FROM r GROUP BY 1), " +
      "rx AS (SELECT x, 2 * COALESCE(SUM(c) OVER (ORDER BY x " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2x FROM mx), " +
      "my AS (SELECT y, count(*) AS c FROM r GROUP BY 1), " +
      "ry AS (SELECT y, 2 * COALESCE(SUM(c) OVER (ORDER BY y " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2y FROM my), " +
      "s AS (SELECT CAST(SUM(w) AS BIGINT) AS n, " +
      "SUM(CAST(w AS HUGEINT) * r2x) AS sx, SUM(CAST(w AS HUGEINT) * r2y) AS sy, " +
      "SUM(CAST(w AS HUGEINT) * r2x * r2y) AS sxy, " +
      "SUM(CAST(w AS HUGEINT) * r2x * r2x) AS sxx, " +
      "SUM(CAST(w AS HUGEINT) * r2y * r2y) AS syy " +
      "FROM cells JOIN rx USING (x) JOIN ry USING (y)), " +
      "kx AS (SELECT count(*) AS n_x FROM mx), " +
      "ky AS (SELECT count(*) AS n_y FROM my) " +
      "SELECT COALESCE(n, 0) AS n, n_x, n_y, " +
      "CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0e0 " +
      "AND CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0e0 THEN " +
      "round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * " +
      "sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) " +
      "- CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS rho " +
      "FROM s CROSS JOIN kx CROSS JOIN ky"))

  /** JENSEN–SHANNON DIVERGENCE ([[TextAnalysis.jsDivergence]]) between
    * the `lang = 'en'` slice's token distribution and the rest of the
    * corpus — per-token contributions plus the windowed total, the
    * [[qWoeIv]] output shape. The slice predicate is NULL-SAFE on both
    * engines (the q_clf_auc lesson). */
  private val qJsDivergence = Q(
    (s, d) => TextAnalysis.jsDivergence(
        t(s, d, "documents"), "text", col("lang") <=> lit("en"))
      .orderBy(col("term")),
    Some("WITH tk AS (SELECT (lang IS NOT DISTINCT FROM 'en') AS sl, " +
      "unnest(list_filter(string_split_regex(trim(lower(text)), '\\s+'), " +
      "t -> t <> '')) AS term FROM documents), " +
      "c AS (SELECT term, " +
      "CAST(SUM(CASE WHEN sl THEN 1 ELSE 0 END) AS BIGINT) AS n_p, " +
      "CAST(SUM(CASE WHEN sl THEN 0 ELSE 1 END) AS BIGINT) AS n_q " +
      "FROM tk GROUP BY 1), " +
      "tt AS (SELECT SUM(n_p) AS np_t, SUM(n_q) AS nq_t FROM c), " +
      "pq AS (SELECT term, n_p, n_q, " +
      "CAST(n_p AS DOUBLE) / CAST(np_t AS DOUBLE) AS p, " +
      "CAST(n_q AS DOUBLE) / CAST(nq_t AS DOUBLE) AS q, np_t, nq_t " +
      "FROM c CROSS JOIN tt), " +
      "t2 AS (SELECT term, n_p, n_q, " +
      "CASE WHEN np_t > 0 AND nq_t > 0 THEN round(" +
      "(CASE WHEN n_p > 0 THEN p * ln(p / ((p + q) / 2e0)) ELSE 0e0 END) / 2e0 + " +
      "(CASE WHEN n_q > 0 THEN q * ln(q / ((p + q) / 2e0)) ELSE 0e0 END) / 2e0" +
      ", 9) END AS js_term FROM pq) " +
      "SELECT term, n_p, n_q, js_term, " +
      "CAST(SUM(CAST(js_term AS DECIMAL(20,9))) OVER () AS DOUBLE) AS jsd " +
      "FROM t2 ORDER BY term"))

  /** ZIPF FIT ([[TextAnalysis.zipfFit]]) over the corpus frequency
    * spectrum — one row, log-log OLS at the vocabulary grain. The
    * intercept reuses the UNROUNDED slope expression on both engines. */
  private val qZipfFit = Q(
    (s, d) => TextAnalysis.zipfFit(t(s, d, "documents"), "text"),
    Some("WITH tk AS (SELECT unnest(list_filter(" +
      "string_split_regex(trim(lower(text)), '\\s+'), t -> t <> '')) AS term " +
      "FROM documents), " +
      "tc AS (SELECT term, count(*) AS cnt FROM tk GROUP BY 1), " +
      "rk AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, term) AS rank FROM tc), " +
      "xy AS (SELECT ln(CAST(rank AS DOUBLE)) AS x, " +
      "ln(CAST(cnt AS DOUBLE)) AS y, cnt FROM rk), " +
      "s AS (SELECT CAST(count(*) AS BIGINT) AS n_types, " +
      "CAST(SUM(cnt) AS BIGINT) AS n_tokens, " +
      "SUM(CAST(round(x, 9) AS DECIMAL(28,9))) AS sx, " +
      "SUM(CAST(round(y, 9) AS DECIMAL(28,9))) AS sy, " +
      "SUM(CAST(round(x * y, 9) AS DECIMAL(28,9))) AS sxy, " +
      "SUM(CAST(round(x * x, 9) AS DECIMAL(28,9))) AS sxx FROM xy) " +
      "SELECT n_types, n_tokens, " +
      "CASE WHEN n_types > 1 THEN round(" +
      "(CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS slope, " +
      "CASE WHEN n_types > 1 THEN round((CAST(sy AS DOUBLE) - " +
      "(CAST(n_types AS DOUBLE) * CAST(sxy AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) / " +
      "(CAST(n_types AS DOUBLE) * CAST(sxx AS DOUBLE) " +
      "- CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE)) / " +
      "CAST(n_types AS DOUBLE), 6) END AS intercept FROM s"))

  /** GOLDEN-RECORD SURVIVORSHIP ([[graft.operators.Dedup.goldenRecord]])
    * over per-user event records, ordered newest-first on the total
    * (ts desc, event_id desc) order: each user collapses to one record
    * whose fields independently take the first non-null value — the MDM
    * merge step after duplicate detection. NULL ts filtered on both
    * engines (the ordered-operator NULL-ordering contract). */
  private val qGoldenRecord = Q(
    (s, d) => graft.operators.Dedup.goldenRecord(
        t(s, d, "events").filter(col("ts").isNotNull)
          .select(col("user_id"), col("event_type"), col("value"),
            col("ts"), col("event_id")),
        group = "user_id",
        order = Seq(col("ts").desc, col("event_id").desc),
        fields = Seq("event_type", "value"))
      .orderBy(col("user_id")),
    Some("WITH e AS (SELECT user_id, event_type, value, ts, event_id " +
      "FROM events WHERE ts IS NOT NULL), " +
      "w AS (SELECT user_id, " +
      "first_value(event_type IGNORE NULLS) OVER pw AS event_type, " +
      "first_value(value IGNORE NULLS) OVER pw AS value, " +
      "count(*) OVER (PARTITION BY user_id) AS n_records, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
      "FROM e WINDOW pw AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) " +
      "SELECT user_id, event_type, value, CAST(n_records AS BIGINT) AS n_records " +
      "FROM w WHERE rn = 1 ORDER BY user_id"))

  /** LANGUAGE-ID CLASSIFICATION REPORT
    * ([[Profiler.classificationReport]] over
    * [[TextAnalysis.langId]] predictions vs the labeled `lang`): the
    * multi-class eval row beside the binary AUC/PR pair — per-class
    * precision/recall/F1 + accuracy at class grain. The oracle rebuilds
    * the identical langId argmax from the same `profiles` table the
    * Spark expression is generated from. */
  /** The langId-vs-label confusion cells, generated from the SAME
    * [[TextAnalysis.profiles]] table the Spark expression is built
    * from — shared by the classification report and Cohen's κ oracles.
    * Ends at `cells(a, p, n)`. */
  private def langConfusionCtes: String = {
    val scoreExprs = TextAnalysis.profiles.map { case (l, re) =>
      s"len(regexp_extract_all(lower(text), '$re')) AS score_$l"
    }.mkString(", ")
    val best = "greatest(" +
      TextAnalysis.profiles.map(p => s"score_${p._1}").mkString(", ") + ")"
    val cases = TextAnalysis.profiles.map { case (l, _) =>
      s"WHEN score_$l = $best AND $best > 0 THEN '$l'" }.mkString(" ")
    s"WITH st AS (SELECT doc_id, lang, $scoreExprs FROM documents), " +
      s"pr AS (SELECT lang AS a, CASE $cases ELSE 'und' END AS p FROM st " +
      "WHERE lang IS NOT NULL), " +
      "cells AS (SELECT a, p, count(*) AS n FROM pr GROUP BY 1, 2)"
  }

  private val qLangConfusion = Q(
    (s, d) => Profiler.classificationReport(
        TextAnalysis.langId(t(s, d, "documents"), "doc_id", "text")
          .join(t(s, d, "documents").select(col("doc_id"), col("lang")), "doc_id"),
        actual = col("lang"), predicted = col("pred_lang"))
      .orderBy(col("cls")),
    Some {
      langConfusionCtes + ", " +
        "cls AS (SELECT a AS cls FROM cells UNION SELECT p FROM cells), " +
        "act AS (SELECT a AS cls, SUM(n) AS na FROM cells GROUP BY 1), " +
        "prd AS (SELECT p AS cls, SUM(n) AS np FROM cells GROUP BY 1), " +
        "tpc AS (SELECT a AS cls, n AS tp FROM cells WHERE a = p), " +
        "j AS (SELECT cls, CAST(COALESCE(na, 0) AS BIGINT) AS n_actual, " +
        "CAST(COALESCE(np, 0) AS BIGINT) AS n_pred, " +
        "CAST(COALESCE(tp, 0) AS BIGINT) AS tp FROM cls " +
        "LEFT JOIN act USING (cls) LEFT JOIN prd USING (cls) " +
        "LEFT JOIN tpc USING (cls)) " +
        "SELECT cls, n_actual, n_pred, tp, n_pred - tp AS fp, " +
        "n_actual - tp AS fn, " +
        "CASE WHEN n_pred > 0 THEN round(CAST(tp AS DOUBLE) / " +
        "CAST(n_pred AS DOUBLE), 6) END AS \"precision\", " +
        "CASE WHEN n_actual > 0 THEN round(CAST(tp AS DOUBLE) / " +
        "CAST(n_actual AS DOUBLE), 6) END AS recall, " +
        "CASE WHEN n_actual + n_pred > 0 THEN round(CAST(2 * tp AS DOUBLE) / " +
        "CAST(n_actual + n_pred AS DOUBLE), 6) END AS f1, " +
        "CASE WHEN SUM(n_actual) OVER () > 0 THEN " +
        "round(CAST(SUM(tp) OVER () AS DOUBLE) / " +
        "CAST(SUM(n_actual) OVER () AS DOUBLE), 6) END AS accuracy " +
        "FROM j ORDER BY cls"
    })

  /** COHEN'S κ ([[Profiler.cohenKappa]]) between the langId prediction
    * and the labeled `lang` — the chance-corrected single-number
    * companion to [[qLangConfusion]]'s per-class report, sharing its
    * confusion-cell oracle CTEs. */
  private val qLangKappa = Q(
    (s, d) => Profiler.cohenKappa(
        TextAnalysis.langId(t(s, d, "documents"), "doc_id", "text")
          .join(t(s, d, "documents").select(col("doc_id"), col("lang")), "doc_id"),
        col("lang"), col("pred_lang")),
    Some(langConfusionCtes + ", " +
      "act AS (SELECT a AS cls, SUM(n) AS na FROM cells GROUP BY 1), " +
      "prd AS (SELECT p AS cls, SUM(n) AS np FROM cells GROUP BY 1), " +
      "tot AS (SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n, " +
      "CAST(COALESCE(SUM(CASE WHEN a = p THEN n ELSE 0 END), 0) AS BIGINT) " +
      "AS agree FROM cells), " +
      "pe AS (SELECT COALESCE(SUM(CAST(na AS HUGEINT) * np), 0) AS pe_num " +
      "FROM act JOIN prd USING (cls)) " +
      "SELECT n, " +
      "CASE WHEN n > 0 THEN round(CAST(agree AS DOUBLE) / CAST(n AS DOUBLE), 6) " +
      "END AS po, " +
      "CASE WHEN n > 0 THEN round(CAST(pe_num AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) END AS pe, " +
      "CASE WHEN n > 0 AND CAST(pe_num AS DOUBLE) / " +
      "(CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1e0 THEN " +
      "round((CAST(agree AS DOUBLE) / CAST(n AS DOUBLE) " +
      "- CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / " +
      "(1e0 - CAST(pe_num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) " +
      "END AS kappa FROM tot CROSS JOIN pe"))

  /** MUTUAL INFORMATION ([[Profiler.mutualInformation]]) between `lang`
    * and `source` over documents — is the source field informative of
    * language (a stratification/leakage audit every mixture design
    * wants)? Cell/marginal grains only; the oracle replays the
    * identical rounded-term DECIMAL sums. */
  private val qMutualInfo = Q(
    (s, d) => Profiler.mutualInformation(
      t(s, d, "documents"), col("lang"), col("source")),
    Some("WITH r AS (SELECT lang AS x, source AS y FROM documents " +
      "WHERE lang IS NOT NULL AND source IS NOT NULL), " +
      "cells AS (SELECT x, y, count(*) AS nxy FROM r GROUP BY 1, 2), " +
      "mx AS (SELECT x, SUM(nxy) AS nx FROM cells GROUP BY 1), " +
      "my AS (SELECT y, SUM(nxy) AS ny FROM cells GROUP BY 1), " +
      "nt AS (SELECT CAST(COALESCE(SUM(nxy), 0) AS BIGINT) AS n FROM cells), " +
      "mi AS (SELECT COALESCE(SUM(CAST(round(" +
      "(CAST(nxy AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln((CAST(nxy AS DOUBLE) * CAST(n AS DOUBLE)) / " +
      "(CAST(nx AS DOUBLE) * CAST(ny AS DOUBLE))), 9) AS DECIMAL(20,9))), 0) " +
      "AS miv FROM cells JOIN mx USING (x) JOIN my USING (y) CROSS JOIN nt), " +
      "e1 AS (SELECT COALESCE(SUM(CAST(round(" +
      "-(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln(CAST(nx AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(20,9))), 0) " +
      "AS ha FROM mx CROSS JOIN nt), " +
      "e2 AS (SELECT COALESCE(SUM(CAST(round(" +
      "-(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)) * " +
      "ln(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS DECIMAL(20,9))), 0) " +
      "AS hb FROM my CROSS JOIN nt), " +
      "k1 AS (SELECT CAST(count(*) AS BIGINT) AS n_c1 FROM mx), " +
      "k2 AS (SELECT CAST(count(*) AS BIGINT) AS n_c2 FROM my) " +
      "SELECT n, n_c1, n_c2, round(CAST(miv AS DOUBLE), 6) AS mi, " +
      "CASE WHEN CAST(ha AS DOUBLE) > 0e0 AND CAST(hb AS DOUBLE) > 0e0 THEN " +
      "round(CAST(miv AS DOUBLE) / sqrt(CAST(ha AS DOUBLE) * CAST(hb AS DOUBLE)), 6) " +
      "END AS nmi FROM nt CROSS JOIN mi CROSS JOIN e1 CROSS JOIN e2 " +
      "CROSS JOIN k1 CROSS JOIN k2"))

  val registry: Seq[(String, Q)] = Seq(
    "q_skyline" -> qSkyline,
    "q_skyline_nd" -> qSkylineNd,
    "q_ewma" -> qEwma,
    "q_silhouette" -> qSilhouette,
    "q_min_k_prob" -> qMinKProb,
    "q_rand_proj" -> qRandProj,
    "q_join_size" -> qJoinSize,
    "q_chi2_independence" -> qChi2,
    "q_hilbert_value" -> qHilbertValue,
    "q_script_detect" -> qScriptDetect,
    "q_benford" -> qBenford,
    "q_snapshot_diff" -> qSnapshotDiff,
    "q_markov_transitions" -> qMarkov,
    "q_ab_ttest" -> qAbTtest,
    "q_mojibake" -> qMojibake,
    "q_bootstrap_ci" -> qBootstrap,
    "q_rfm_segments" -> qRfm,
    "q_ks_test" -> qKsTest,
    "q_global_topk" -> qGlobalTopk,
    "q_sparse_cosine_join" -> qSparseCos,
    "q_frequent_pairs" -> qFreqPairs,
    "q_woe_iv" -> qWoeIv,
    "q_seasonal_profile" -> qSeasonal,
    "q_cusum_twosided" -> qCusum,
    "q_woe_iv_binned" -> qWoeIvBinned,
    "q_readability" -> qReadability,
    "q_burstiness" -> qBurstiness,
    "q_spearman" -> qSpearman,
    "q_js_divergence" -> qJsDivergence,
    "q_zipf_fit" -> qZipfFit,
    "q_golden_record" -> qGoldenRecord,
    "q_lang_confusion" -> qLangConfusion,
    "q_lang_kappa" -> qLangKappa,
    "q_mutual_info" -> qMutualInfo)
}
