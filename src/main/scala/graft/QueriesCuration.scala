package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Bpe, Changelog, Dsir, Expectations, Graph, Profiler, Sampling}

/** Round-6 curation / table-maintenance pack: changelog materialization
  * (SCD2 history, CDC snapshot), reproducible weighted sampling, and
  * DSIR-style importance weighting — the operators a lakehouse-grade
  * training-data pipeline runs between ingestion and tokenization.
  * Determinism follows the [[Queries]] header rules; the `events` table
  * plays the role of a keyed change stream (user_id = key, ts/event_id =
  * total version order, event_type = op code).
  */
object QueriesCuration {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Memo keys for the trained-model families (the docBandKey contract:
    * corpus fingerprint + every parameter that shapes the build). */
  private def clfKey(s: SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/documents.parquet", "qualityclf|b=1024|e=3|lr=4|label=en")
  private def knKey(s: SparkSession, d: String): String =
    graft.operators.StateCache.fingerprint(
      s, s"$d/documents.parquet", "knbigram|ref=en|D=0.75|eps=0.1")

  /** SCD2 history build ([[Changelog.scd2]]): purchase events as attribute
    * changes of their user; every version becomes a validity interval
    * `[valid_from, valid_to)` with the open interval flagged current. One
    * window pass on the key — no self-join, no driver state. */
  private val qScd2Build = Q(
    (s, d) => Changelog.scd2(
        t(s, d, "events").filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts"), col("value")),
        key = Seq("user_id"), seq = Seq("ts", "event_id"))
      .select(col("user_id"), col("event_id"), col("value"),
        col("valid_from"), col("valid_to"), col("is_current"))
      .orderBy(col("user_id"), col("valid_from"), col("event_id")),
    Some("SELECT user_id, event_id, value, ts AS valid_from, " +
      "lead(ts) OVER w AS valid_to, " +
      "(lead(ts) OVER w IS NULL) AS is_current " +
      "FROM events WHERE event_type = 'purchase' " +
      "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id) " +
      "ORDER BY user_id, valid_from, event_id"))

  /** CDC snapshot ([[Changelog.cdcApply]]): latest change per user wins,
    * users whose latest record is the delete op ('error' here) vanish —
    * the Debezium-style compaction semantics. Same single key-shuffle. */
  private val qCdcApply = Q(
    (s, d) => Changelog.cdcApply(
        t(s, d, "events")
          .select(col("user_id"), col("event_id"), col("ts"),
            col("event_type"), col("value")),
        key = Seq("user_id"), seq = Seq("ts", "event_id"),
        opCol = col("event_type"), deleteOp = "error")
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id")),
    Some("SELECT user_id, event_id, event_type, value FROM (" +
      "SELECT user_id, event_id, event_type, value, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn " +
      "FROM events) WHERE rn = 1 AND event_type <> 'error' ORDER BY user_id"))

  /** Weighted sample, 5 docs per language, inclusion probability ∝ doc
    * length ([[Sampling.weightedSamplePerGroup]]): the deterministic
    * Efraimidis–Spirakis draw — the oracle re-derives the exact same
    * sample from the portable hash, proving reproducibility-by-
    * construction across engines. */
  private val qWeightedSample = Q(
    (s, d) => Sampling.weightedSamplePerGroup(
        t(s, d, "documents").select(col("doc_id"), col("lang"), col("n_chars")),
        id = "doc_id", weight = "n_chars", group = "lang", k = 5)
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, lang, n_chars FROM (" +
      "SELECT doc_id, lang, n_chars, row_number() OVER (PARTITION BY lang ORDER BY " +
      "ln((('0x' || substr(md5(doc_id::VARCHAR || 'graft-es'), 1, 8))::BIGINT + 1.0) / 4294967296.0) " +
      "/ CAST(n_chars AS DOUBLE) DESC, doc_id) AS rn FROM documents) " +
      "WHERE rn <= 5 ORDER BY doc_id"))

  /** DSIR importance weights ([[Dsir.importanceWeights]]): hashed-unigram
    * log importance of every document toward the English subset as the
    * target domain. The oracle rebuilds the full hashed-feature estimator
    * in SQL — bucket hash, add-one smoothing, and the per-doc log-ratio
    * sum (round(6) soaks cross-libm ln drift, the repo convention). */
  private val qDsirWeights = Q(
    (s, d) => Dsir.importanceWeights(
        t(s, d, "documents"), id = "doc_id", text = "text",
        isTarget = col("lang") === "en", buckets = 1024)
      .orderBy(col("doc_id")),
    Some("WITH toks AS (SELECT doc_id, lang = 'en' AS it, " +
      "unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tok FROM documents), " +
      "tk AS (SELECT doc_id, it, ('0x' || substr(md5(tok), 1, 8))::BIGINT % 1024 AS b " +
      "FROM toks WHERE tok <> ''), " +
      "bs AS (SELECT b, count(*) AS cnt_c, " +
      "CAST(SUM(CASE WHEN it THEN 1 ELSE 0 END) AS BIGINT) AS cnt_t FROM tk GROUP BY b), " +
      "tot AS (SELECT CAST(SUM(cnt_c) AS BIGINT) AS tot_c, " +
      "CAST(SUM(cnt_t) AS BIGINT) AS tot_t FROM bs) " +
      "SELECT doc_id, count(*) AS n_tokens, " +
      "round(SUM(ln((cnt_t + 1.0) / (tot_t + 1024.0)) - ln((cnt_c + 1.0) / (tot_c + 1024.0))), 6) AS log_weight " +
      "FROM tk JOIN bs USING (b), tot GROUP BY doc_id ORDER BY doc_id"))

  /** BPE tokenization ([[Bpe]]): train [[BpeRounds]] merges on the
    * corpus' own word-frequency table (distributed stats,
    * vocabulary-bounded driver iteration), then encode every document in
    * the scan stage via the `bpe_encode` codegen expression. HASH-GREEN
    * since round 12: the oracle ([[BpeEncodeSql]]) replays the same
    * unrolled merge rounds as q_bpe_merges and reads each corpus word's
    * encoding off the final training state — valid because sequential
    * rank-order application ≡ the encoder's lowest-rank-first loop for
    * in-vocab words, and the eval corpus IS the training corpus. BpeSpec
    * still pins the encoder against an independent reference (including
    * out-of-vocab words, which the SQL identity cannot cover). The gate
    * runs the SELF-CERTIFYING [[Bpe.encodeAudited]] form: losslessness
    * (decode∘encode ≡ id) is asserted in-plan over the full column with a
    * `raise_error` on the first violating document. Tokens are emitted
    * pipe-joined so the gate hashes a flat deterministic column. */
  private val qBpeEncode = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val model = Bpe.train(docs, "text", numMerges = BpeRounds)
      Bpe.encodeAudited(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("n_tokens"),
          concat_ws("|", col("tokens")).as("tokens_str"))
        .orderBy(col("doc_id"))
    },
    Some(BpeEncodeSql))

  /** Oracle SQL for [[qBpeMerges]]: the SAME 8 greedy merge rounds as
    * unrolled CTEs (the q_pagerank convention — iterate-in-SQL so a
    * sequential engine proves the learned state bit-for-bit). Per round r:
    * `p` counts adjacent symbol pairs weighted by word frequency, `b`
    * picks the winner (count desc, then lexicographic — DuckDB's binary
    * collation ≡ Scala's on this ASCII corpus), and the merge application
    * reproduces GREEDY LEFT-TO-RIGHT pairing exactly: marked positions
    * (sym=a, next=b) are grouped into maximal consecutive runs and only
    * EVEN offsets within a run merge — for a≠b runs are singletons (all
    * merge); for a=b a k-run yields floor(k/2) merges from the left,
    * which is precisely the scan loop's semantics. Rows whose predecessor
    * merged are absorbed; positions renumber. CTEs are MATERIALIZED —
    * inlined, the 8-round chain re-evaluates exponentially. An exhausted
    * round (no pair with weighted count ≥ 2) yields an empty `b`, whose
    * cross join empties all later states: the SQL emits exactly the
    * rounds the Scala early-stop emits. */
  /** Merge rounds both BPE oracles unroll — and the `numMerges` the
    * encode query trains, so the SQL-provable training state and the
    * applied model are the same object. */
  private lazy val BpeRounds = 8

  /** The WITH-chain shared by [[BpeMergesSql]] and [[BpeEncodeSql]]:
    * tokenize, build the vocab, unroll [[BpeRounds]] greedy merge rounds.
    * `s<BpeRounds>` is the final per-word symbol state — which, because
    * sequential rank-order application ≡ the encoder's lowest-rank-first
    * loop for any word of the training vocab (a later merge's compound
    * symbol cannot appear inside an earlier merge's pair), is also the
    * ENCODING of every corpus word. */
  private lazy val BpeTrainCtes: String = {
    def round(r: Int): String = {
      val prev = s"s${r - 1}"
      s"p$r AS MATERIALIZED (SELECT a, b, SUM(f) AS cnt FROM (" +
        s"SELECT f, sym AS a, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS b FROM $prev) " +
        "WHERE b IS NOT NULL GROUP BY a, b HAVING SUM(f) >= 2), " +
        s"b$r AS MATERIALIZED (SELECT a, b FROM p$r ORDER BY cnt DESC, a, b LIMIT 1), " +
        s"m$r AS (SELECT s.w, s.f, s.pos, s.sym, CASE WHEN s.sym = b$r.a " +
        s"AND lead(s.sym) OVER (PARTITION BY s.w ORDER BY s.pos) = b$r.b " +
        s"THEN 1 ELSE 0 END AS mk FROM $prev s, b$r), " +
        s"g$r AS (SELECT w, f, pos, sym, mk, CASE WHEN mk = 1 " +
        "THEN pos - row_number() OVER (PARTITION BY w, mk ORDER BY pos) END AS runid " +
        s"FROM m$r), " +
        s"x$r AS (SELECT w, f, pos, sym, CASE WHEN mk = 1 " +
        "AND (row_number() OVER (PARTITION BY w, runid ORDER BY pos) % 2) = 1 " +
        s"THEN 1 ELSE 0 END AS do_merge FROM g$r), " +
        s"s$r AS MATERIALIZED (SELECT w, f, " +
        "row_number() OVER (PARTITION BY w ORDER BY pos) AS pos, " +
        "CASE WHEN do_merge = 1 THEN sym || nxt ELSE sym END AS sym FROM (" +
        "SELECT *, lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt, " +
        s"lag(do_merge) OVER (PARTITION BY w ORDER BY pos) AS pm FROM x$r) " +
        "WHERE COALESCE(pm, 0) = 0)"
    }
    "WITH " + ToksCte + ", " +
      "vocab AS (SELECT w, count(*) AS f FROM toks WHERE w <> '' GROUP BY w), " +
      "s0 AS MATERIALIZED (SELECT w, f, pos, substring(w, pos, 1) AS sym FROM (" +
      "SELECT w, f, unnest(range(1, length(w) + 1)) AS pos FROM vocab)), " +
      (1 to BpeRounds).map(round).mkString(", ")
  }

  /** The corpus-word CTE both tokenizer oracles start from — factored so
    * the fairness audit can compose BOTH training chains in ONE top-level
    * WITH (nesting the chains as derived-table subqueries defeats DuckDB's
    * MATERIALIZED hints and the unrolled rounds re-evaluate
    * exponentially). */
  private lazy val ToksCte: String =
    "toks AS (SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w FROM documents)"

  /** Per-document word occurrences with position — the shared encode-side
    * prefix of both tokenizer oracles. */
  private lazy val DocOccCtes: String =
    "docw AS (SELECT doc_id, arr, unnest(range(1, len(arr) + 1)) AS ord FROM (" +
      "SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS arr FROM documents)), " +
      "occ AS (SELECT doc_id, ord, arr[ord] AS w FROM docw WHERE arr[ord] <> '')"

  private lazy val BpeMergesSql: String =
    BpeTrainCtes + " " +
      (1 to BpeRounds).map(r =>
        s"SELECT CAST($r AS INT) AS rank, a AS lhs, b AS rhs FROM b$r")
        .mkString(" UNION ALL ") +
      " ORDER BY rank"

  /** Oracle SQL for [[qBpeEncode]]: replay the learned model over every
    * document. Word occurrences keep their position (`ord`), each joins
    * the final training state `s<BpeRounds>` for its encoded symbol
    * sequence (see [[BpeTrainCtes]] for why that state IS the encoding),
    * and per-document aggregation reassembles the pipe-joined token
    * stream in (word, symbol) order. A document with no non-empty words
    * encodes to zero tokens. */
  /** Shared encode-side CTE chain (train + per-doc token counts) — the
    * common prefix of [[BpeEncodeSql]] and the tokenize→pack pipeline
    * oracle. Ends with `agg` (doc_id, n_tokens, tokens_str). */
  private lazy val BpeEncodeCtes: String =
    BpeTrainCtes + ", " + DocOccCtes + ", " +
      s"enc AS (SELECT o.doc_id, o.ord, s.pos, s.sym FROM occ o JOIN s$BpeRounds s ON o.w = s.w), " +
      "agg AS (SELECT doc_id, CAST(count(*) AS INT) AS n_tokens, " +
      "string_agg(sym, '|' ORDER BY ord, pos) AS tokens_str FROM enc GROUP BY doc_id)"

  private lazy val BpeEncodeSql: String =
    BpeEncodeCtes + " " +
      "SELECT d.doc_id, COALESCE(a.n_tokens, 0) AS n_tokens, " +
      "COALESCE(a.tokens_str, '') AS tokens_str " +
      "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"

  /** BPE MERGE-TABLE LEARNING, oracle-gated ([[Bpe.train]]): the first 8
    * learned merges (rank, lhs, rhs) from the documents corpus — the
    * training half of the BPE split, now a hash-green executable claim
    * (q_bpe_encode remains the rows-only application half with its
    * in-plan round-trip audit). Scale shape is [[Bpe]]'s: corpus → word
    * frequencies in ONE map-side-combined aggregation (shuffled bytes are
    * vocabulary-, not corpus-sized), then the merge loop runs on that
    * bounded table driver-side — maxVocab-guarded, the documented bounded
    * collect. 8 rounds keeps the oracle's unrolled CTE chain reviewable;
    * rank is the merge priority the encoder consumes. */
  private val qBpeMerges = Q(
    (s, d) => {
      val model = Bpe.train(t(s, d, "documents"), "text", numMerges = 8)
      import s.implicits._
      model.merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "lhs", "rhs")
        .orderBy(col("rank"))
    },
    Some(BpeMergesSql))

  /** PAGERANK over the customer↔supplier trade graph ([[Graph.pageRank]]):
    * 3 exact fixed-point iterations (integer micro-unit ranks, floor'd
    * divisions — the kmeans determinism construction), symmetric distinct
    * edges from orders⋈lineitem with namespaced node ids. The oracle
    * unrolls the SAME three rounds as SQL CTEs, so the driver gate proves
    * the distributed iteration bit-matches a sequential engine. */
  private val qPageRank = Q(
    (s, d) => {
      val base = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
        .join(t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(concat(lit("c"), col("o_custkey")).as("c"),
          concat(lit("s"), col("l_suppkey")).as("su"))
        .distinct()
      val edges = base.select(col("c").as("src"), col("su").as("dst"))
        .union(base.select(col("su"), col("c")))
      Graph.pageRank(edges, iters = 3)
        .orderBy(col("rank").desc, col("node"))
    },
    Some("WITH base AS (SELECT DISTINCT 'c' || o_custkey AS c, 's' || l_suppkey AS su " +
      "FROM orders JOIN lineitem ON o_orderkey = l_orderkey), " +
      "e AS (SELECT c AS src, su AS dst FROM base UNION ALL SELECT su, c FROM base), " +
      "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e), " +
      "od AS (SELECT src, count(*) AS od FROM e GROUP BY src), " +
      "r0 AS (SELECT node, CAST(1000000 AS DOUBLE) AS rank FROM nodes), " +
      "c1 AS (SELECT e.dst, SUM(FLOOR(r.rank / od.od)) AS m FROM e " +
      "JOIN r0 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst), " +
      "r1 AS (SELECT n.node, 150000 + FLOOR(85.0 * COALESCE(c1.m, 0) / 100.0) AS rank " +
      "FROM nodes n LEFT JOIN c1 ON n.node = c1.dst), " +
      "c2 AS (SELECT e.dst, SUM(FLOOR(r.rank / od.od)) AS m FROM e " +
      "JOIN r1 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst), " +
      "r2 AS (SELECT n.node, 150000 + FLOOR(85.0 * COALESCE(c2.m, 0) / 100.0) AS rank " +
      "FROM nodes n LEFT JOIN c2 ON n.node = c2.dst), " +
      "c3 AS (SELECT e.dst, SUM(FLOOR(r.rank / od.od)) AS m FROM e " +
      "JOIN r2 r ON e.src = r.node JOIN od ON e.src = od.src GROUP BY e.dst), " +
      "r3 AS (SELECT n.node, 150000 + FLOOR(85.0 * COALESCE(c3.m, 0) / 100.0) AS rank " +
      "FROM nodes n LEFT JOIN c3 ON n.node = c3.dst) " +
      "SELECT node, CAST(rank AS BIGINT) AS rank FROM r3 ORDER BY rank DESC, node"))

  /** Shared co-purchase-graph edge CTE (p_size ≤ 15): `e` = normalized
    * distinct edges — the SQL twin of [[coPurchaseEdges]], cited by every
    * graph-analytics oracle so the edge definition exists exactly once on
    * each side. */
  private val CoPurchaseEdgeCte: String =
    "WITH le AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 15)), " +
      "e AS (SELECT DISTINCT least(x.l_partkey, y.l_partkey) AS a, " +
      "greatest(x.l_partkey, y.l_partkey) AS b " +
      "FROM le x JOIN le y ON x.l_orderkey = y.l_orderkey AND x.l_partkey < y.l_partkey)"

  /** Triangle CTE chain on top of [[CoPurchaseEdgeCte]]: `t` = id-ordered
    * 3-way-join triangles, `tc` = per-node triangle counts. */
  private val TriangleSqlWith: String = CoPurchaseEdgeCte +
      ", t AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM e e1 " +
      "JOIN e e2 ON e2.a = e1.b JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b), " +
      "n AS (SELECT x AS node FROM t UNION ALL SELECT y FROM t UNION ALL SELECT z FROM t), " +
      "tc AS (SELECT node, count(*) AS triangles FROM n GROUP BY node)"

  /** Part co-purchase graph (parts appearing in the same order,
    * restricted to p_size ≤ 15 to keep the gate-sized graph honest — ~10k
    * edges at sf0.01), shared by both graph-analytics queries so the edge
    * definition cannot diverge from the single [[TriangleSqlWith]] oracle
    * CTE they both cite. */
  private def coPurchaseEdges(s: SparkSession, d: String): DataFrame = {
    val smallParts = t(s, d, "part").filter(col("p_size") <= 15)
      .select(col("p_partkey"))
    val le = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
    val x = le.select(col("l_orderkey").as("ok"), col("l_partkey").as("pa"))
    val y = le.select(col("l_orderkey").as("ok"), col("l_partkey").as("pb"))
    x.join(y, "ok").filter(col("pa") < col("pb"))
      .select(col("pa").as("src"), col("pb").as("dst"))
  }

  /** TRIANGLE COUNTING ([[Graph.triangleCounts]]) over the part
    * co-purchase graph. The Spark plan is the DEGREE-ORIENTED
    * construction — wedges only from each node's (deg,id)-ordered
    * out-neighbors, closed with a semi join, so a hub node cannot blow up
    * the wedge count — while the oracle is the declarative id-ordered
    * 3-way self-join; the gate proves the oriented plan finds exactly the
    * same triangles. */
  private val qTriangles = Q(
    (s, d) => Graph.triangleCounts(coPurchaseEdges(s, d)).orderBy(col("node")),
    Some(TriangleSqlWith + " SELECT node, triangles FROM tc ORDER BY node"))

  /** LOCAL CLUSTERING COEFFICIENT ([[Graph.clusteringCoefficient]]) on the
    * same graph: per node, 2·triangles / (deg·(deg−1)) — one integer
    * division mirrored operand-for-operand, so no rounding tolerance is
    * needed. Degree-1 nodes report 0.0 on both sides. */
  private val qClusteringCoef = Q(
    (s, d) => Graph.clusteringCoefficient(coPurchaseEdges(s, d)).orderBy(col("node")),
    Some(TriangleSqlWith +
      ", deg AS (SELECT node, count(*) AS deg FROM " +
      "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node) " +
      "SELECT d.node AS node, d.deg AS deg, COALESCE(tc.triangles, 0) AS triangles, " +
      "CASE WHEN d.deg >= 2 THEN (2.0e0 * COALESCE(tc.triangles, 0)) / (d.deg * (d.deg - 1)) " +
      "ELSE 0.0e0 END AS lcc " +
      "FROM deg d LEFT JOIN tc ON d.node = tc.node ORDER BY node"))

  /** K-CORE PEELING ([[Graph.kCore]], k=3, 3 rounds) on the co-purchase
    * graph: the oracle unrolls the same three synchronous peeling rounds
    * as CTEs (a converged earlier round is idempotent, so early-break and
    * full-unroll agree), with the convergence flag re-derived from the
    * last two rounds' edge counts. */
  private val qKcore = Q(
    (s, d) => Graph.kCore(coPurchaseEdges(s, d), k = 3, rounds = 3)
      .orderBy(col("node")),
    Some {
      def round(i: Int, prev: String): String =
        s"d$i AS (SELECT node, count(*) AS deg FROM " +
        s"(SELECT a AS node FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY node), " +
        s"k$i AS (SELECT node FROM d$i WHERE deg >= 3), " +
        s"e$i AS (SELECT a, b FROM $prev WHERE a IN (SELECT node FROM k$i) " +
        s"AND b IN (SELECT node FROM k$i))"
      CoPurchaseEdgeCte +
        ", " + round(1, "e") + ", " + round(2, "e1") + ", " + round(3, "e2") + " " +
        "SELECT node, count(*) AS deg, " +
        "((SELECT count(*) FROM e3) = (SELECT count(*) FROM e2)) AS converged " +
        "FROM (SELECT a AS node FROM e3 UNION ALL SELECT b FROM e3) " +
        "GROUP BY node ORDER BY node"
    })

  /** BFS HOPS ([[Graph.bfsHops]], 3 rounds) on the symmetrized
    * co-purchase graph from its min-id node: the oracle unrolls the same
    * three min-propagation rounds as CTEs. */
  private val qBfsHops = Q(
    (s, d) => {
      val und = coPurchaseEdges(s, d)
      val sym = und.unionByName(und.select(col("dst").as("src"), col("src").as("dst")))
      val seeds = und.agg(min(col("src")).as("node"))
      Graph.bfsHops(sym, seeds, rounds = 3).orderBy(col("node"))
    },
    Some {
      def round(i: Int, prev: String): String =
        s"h$i AS (SELECT node, min(hop) AS hop FROM (" +
        s"SELECT node, hop FROM $prev UNION ALL " +
        s"SELECT es.v AS node, $prev.hop + 1 AS hop FROM es JOIN $prev ON es.u = $prev.node) " +
        s"GROUP BY node)"
      CoPurchaseEdgeCte +
        ", es AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "h0 AS (SELECT (SELECT min(a) FROM e) AS node, CAST(0 AS BIGINT) AS hop), " +
        round(1, "h0") + ", " + round(2, "h1") + ", " + round(3, "h2") + " " +
        "SELECT node, CAST(hop AS BIGINT) AS hop FROM h3 ORDER BY node"
    })

  /** LABEL-PROPAGATION COMMUNITIES ([[Graph.labelPropagation]], 3 rounds)
    * on the co-purchase graph: the deterministic synchronous LPA (most
    * frequent neighbor+self label, ties to the smallest) whose every round
    * is a pure function of the last — so the oracle unrolls the SAME three
    * rounds as CTEs, each a join + count + row_number argmax, and the gate
    * proves the distributed iteration matches a sequential engine label
    * for label. */
  private val qLabelProp = Q(
    (s, d) => Graph.labelPropagation(coPurchaseEdges(s, d), rounds = 3)
      .orderBy(col("node")),
    Some {
      def round(i: Int, prev: String): String =
        s"v$i AS (SELECT und.v AS node, l.label FROM und JOIN $prev l ON und.u = l.node " +
        s"UNION ALL SELECT node, label FROM $prev), " +
        s"c$i AS (SELECT node, label, count(*) AS c FROM v$i GROUP BY 1, 2), " +
        s"l$i AS (SELECT node, label FROM (SELECT node, label, " +
        s"row_number() OVER (PARTITION BY node ORDER BY c DESC, label) AS rn FROM c$i) WHERE rn = 1)"
      CoPurchaseEdgeCte +
        ", und AS (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e), " +
        "l0 AS (SELECT DISTINCT u AS node, u AS label FROM und), " +
        round(1, "l0") + ", " + round(2, "l1") + ", " + round(3, "l2") + " " +
        "SELECT node, label FROM l3 ORDER BY node"
    })

  /** DEGREE ASSORTATIVITY ([[Graph.degreeAssortativity]]) of the
    * co-purchase graph: Newman's r as an exact-moment Pearson pass over
    * symmetrized endpoint-degree pairs; the oracle rebuilds degrees,
    * pairs, and the six moments in SQL. */
  private val qAssortativity = Q(
    (s, d) => Graph.degreeAssortativity(coPurchaseEdges(s, d)),
    Some(CoPurchaseEdgeCte +
      ", deg AS (SELECT node, count(*) AS deg FROM " +
      "(SELECT a AS node FROM e UNION ALL SELECT b FROM e) GROUP BY node), " +
      "wd AS (SELECT da.deg AS da, db.deg AS db FROM e " +
      "JOIN deg da ON da.node = e.a JOIN deg db ON db.node = e.b), " +
      "p AS (SELECT CAST(da AS DOUBLE) AS x, CAST(db AS DOUBLE) AS y FROM wd " +
      "UNION ALL SELECT CAST(db AS DOUBLE), CAST(da AS DOUBLE) FROM wd), " +
      "mom AS (SELECT count(*) AS n, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sx, " +
      "CAST(SUM(CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sy, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS sxy, " +
      "CAST(SUM(CAST(x AS DECIMAL(18,2)) * CAST(x AS DECIMAL(18,2))) AS DOUBLE) AS sxx, " +
      "CAST(SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS DOUBLE) AS syy " +
      "FROM p WHERE x IS NOT NULL AND y IS NOT NULL) " +
      "SELECT 'dx' AS x_col, 'dy' AS y_col, n, " +
      "round(CASE WHEN (sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * " +
      "sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) = 0.0e0 THEN NULL " +
      "ELSE (CAST(n AS DOUBLE) * sxy - sx * sy) / " +
      "(sqrt(CAST(n AS DOUBLE) * sxx - sx * sx) * sqrt(CAST(n AS DOUBLE) * syy - sy * sy)) END, 6) AS corr " +
      "FROM mom"))

  /** PMI co-occurrence ([[graft.operators.Ops.pmiPairs]], minCount 3) on
    * the p_size ≤ 15 order/part baskets: association strength beyond
    * independence, the stats twin of the triangle/Jaccard views of the
    * same data. Oracle mirrors counts and the PMI formula
    * operand-for-operand. */
  private val qPmiPairs = Q(
    (s, d) => {
      val smallParts = t(s, d, "part").filter(col("p_size") <= 15)
        .select(col("p_partkey"))
      val baskets = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"))
        .join(broadcast(smallParts), col("l_partkey") === col("p_partkey"), "left_semi")
      graft.operators.Ops.pmiPairs(baskets, "l_orderkey", "l_partkey", minCount = 3L)
        .orderBy(col("item_a"), col("item_b"))
    },
    Some("WITH b AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size <= 15)), " +
      "tot AS (SELECT CAST(count(DISTINCT bk) AS DOUBLE) AS n_baskets FROM b), " +
      "cnt AS (SELECT it, count(*) AS n_i FROM b GROUP BY it), " +
      "p AS (SELECT x.it AS item_a, y.it AS item_b, count(*) AS n_ab FROM b x " +
      "JOIN b y ON x.bk = y.bk AND x.it < y.it GROUP BY 1, 2) " +
      "SELECT item_a, item_b, n_ab, " +
      "round(ln((CAST(n_ab AS DOUBLE) * n_baskets) / (CAST(ca.n_i AS DOUBLE) * cb.n_i)), 6) AS pmi " +
      "FROM p JOIN cnt ca ON ca.it = item_a JOIN cnt cb ON cb.it = item_b CROSS JOIN tot " +
      "WHERE n_ab >= 3 ORDER BY item_a, item_b"))

  /** Table profile ([[Profiler.profile]]) of `customer`: one aggregation
    * pass → column-grain quality summary. The oracle is the literal
    * per-column UNION ALL — same stats, table-scan-per-column — which the
    * single-pass Expand plan must match number for number. */
  private val qProfileTable = Q(
    (s, d) => Profiler.profile(t(s, d, "customer")).orderBy(col("col_name")),
    Some {
      def num(c: String) =
        s"SELECT '$c' AS col_name, count(*) AS n_rows, " +
          s"count(*) - count($c) AS n_nulls, count(DISTINCT $c) AS n_distinct, " +
          s"CAST(min($c) AS DOUBLE) AS min_val, CAST(max($c) AS DOUBLE) AS max_val FROM customer"
      def str(c: String) =
        s"SELECT '$c', count(*), count(*) - count($c), count(DISTINCT $c), " +
          s"CAST(min(length($c)) AS DOUBLE), CAST(max(length($c)) AS DOUBLE) FROM customer"
      Seq(num("c_custkey"), str("c_name"), num("c_nationkey"),
        num("c_acctbal"), str("c_mktsegment"))
        .mkString("", " UNION ALL ", " ORDER BY col_name")
    })

  /** Join-key skew report ([[Profiler.skewReport]]) over lineitem's three
    * shuffle-key candidates — the pre-flight diagnostic for
    * salting/AQE-skew decisions (l_returnflag's 3 values vs l_partkey's
    * ~uniform spread must produce wildly different skew_ratios). Oracle:
    * per-column window rank + share/skew arithmetic, UNION ALL'd —
    * row_number-then-filter equals distributed-top-k-then-rerank because
    * the (cnt DESC, key) order is total. */
  private val qSkewReport = Q(
    (s, d) => Profiler.skewReport(t(s, d, "lineitem"),
        Seq("l_partkey", "l_suppkey", "l_returnflag"), topN = 5)
      .orderBy(col("col_name"), col("rnk")),
    Some {
      def one(c: String) =
        s"SELECT '$c' AS col_name, CAST(k AS VARCHAR) AS key_value, cnt, rn AS rnk, " +
        "round(CAST(cnt AS DOUBLE) * 100.0e0 / CAST(total AS DOUBLE), 6) AS share_pct, " +
        "round(CAST(cnt AS DOUBLE) * CAST(nd AS DOUBLE) / CAST(total AS DOUBLE), 6) AS skew_ratio " +
        "FROM (SELECT k, cnt, row_number() OVER (ORDER BY cnt DESC, k) AS rn, " +
        "CAST(SUM(cnt) OVER () AS BIGINT) AS total, COUNT(*) OVER () AS nd " +
        s"FROM (SELECT $c AS k, count(*) AS cnt FROM lineitem GROUP BY 1)) WHERE rn <= 5"
      Seq(one("l_partkey"), one("l_suppkey"), one("l_returnflag"))
        .mkString("", " UNION ALL ", " ORDER BY col_name, rnk")
    })

  /** SKEW REPORT OVER LSH BAND KEYS — the pre-flight a band self-join runs
    * before committing to a plan: [[Profiler.skewReport]] pointed at the
    * banded candidate keys themselves, so a pipeline can SEE the hot band
    * (the boilerplate shingle, the degenerate hyperplane region) and size
    * [[graft.operators.Scale.saltedBandSelfJoin]]'s (salts, hotMin) from
    * measured band membership instead of guessing. Gated end-to-end on a
    * DuckDB-reproducible banding: SimHash fingerprints ([[Dedup.simhash32]],
    * md5 word hashes — the q_simhash_pairs oracle arithmetic) split into
    * four 8-bit bands, keys "band:value"; the oracle recomputes the same
    * fingerprints, bands, counts, and skew arithmetic in SQL. skew_ratio =
    * cnt·nd/total — a hot band's ratio tells you directly how many × the
    * mean reducer its join task would be. */
  private val qBandSkewReport = Q(
    (s, d) => {
      val sh = graft.operators.Dedup.simhash32(
        t(s, d, "documents"), "doc_id", "text")
      val banded = sh.select(explode(array((0 until 4).map { j =>
        concat(lit(j.toString), lit(":"),
          shiftright(col("simhash"), 8 * j).bitwiseAND(lit(255L)).cast("string"))
      }: _*)).as("band_key"))
      Profiler.skewReport(banded, Seq("band_key"), topN = 10)
        .orderBy(col("col_name"), col("rnk"))
    },
    Some("WITH toks AS (SELECT doc_id, unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS w FROM documents), " +
      "h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS hv FROM toks), " +
      "bits AS (SELECT doc_id, i, SUM(CASE WHEN ((hv >> i) & 1) = 1 THEN 1 ELSE -1 END) AS s " +
      "FROM h, (SELECT unnest(range(0, 32)) AS i) t GROUP BY doc_id, i), " +
      "sh AS (SELECT doc_id, CAST(SUM(CASE WHEN s > 0 THEN (1::BIGINT << i) ELSE 0 END) AS BIGINT) AS simhash " +
      "FROM bits GROUP BY doc_id), " +
      "bands AS (SELECT CAST(j AS VARCHAR) || ':' || CAST((simhash >> (8*j)) & 255 AS VARCHAR) AS k " +
      "FROM sh, (SELECT unnest(range(0, 4)) AS j) u), " +
      "counts AS (SELECT k, count(*) AS cnt FROM bands GROUP BY 1) " +
      "SELECT 'band_key' AS col_name, k AS key_value, cnt, rn AS rnk, " +
      "round(CAST(cnt AS DOUBLE) * 100.0e0 / CAST(total AS DOUBLE), 6) AS share_pct, " +
      "round(CAST(cnt AS DOUBLE) * CAST(nd AS DOUBLE) / CAST(total AS DOUBLE), 6) AS skew_ratio " +
      "FROM (SELECT k, cnt, row_number() OVER (ORDER BY cnt DESC, k) AS rn, " +
      "CAST(SUM(cnt) OVER () AS BIGINT) AS total, COUNT(*) OVER () AS nd FROM counts) " +
      "WHERE rn <= 10 ORDER BY col_name, rnk"))

  /** Declarative data-quality gate ([[Expectations.check]]): six rules
    * over lineitem — range, ordering, null, referential (order key must
    * exist in orders, via the broadcast [[Expectations.withFkExists]]
    * helper), plus one deliberately-violated threshold so the counting
    * path is exercised — ALL evaluated in one aggregate pass over one
    * scan (per-rule conditional sums, map-side combined). Violation =
    * predicate false OR NULL: three-valued logic must fail a quality
    * check, not slip past it. Oracle recomputes every rule as CASE sums
    * over the same left join. */
  private val qExpectations = Q(
    (s, d) => {
      import Expectations.Rule
      val li = Expectations.withFkExists(
        t(s, d, "lineitem"), "l_orderkey",
        t(s, d, "orders"), "o_orderkey", "order_exists")
      Expectations.check(li, Seq(
        Rule("discount_range", col("l_discount") >= 0.0 && col("l_discount") <= 1.0),
        Rule("order_exists", col("order_exists")),
        Rule("qty_le_25", col("l_quantity") <= 25.0),
        Rule("qty_positive", col("l_quantity") > 0.0),
        Rule("returnflag_domain", col("l_returnflag").isin("A", "N", "R")),
        Rule("tax_nonneg", col("l_tax") >= 0.0)))
        .orderBy(col("rule"))
    },
    Some("WITH j AS (SELECT l.*, (o.o_orderkey IS NOT NULL) AS order_exists " +
      "FROM lineitem l LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o " +
      "ON l.l_orderkey = o.o_orderkey), " +
      "a AS (SELECT CAST(count(*) AS BIGINT) AS n, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(l_discount >= 0.0e0 AND l_discount <= 1.0e0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_discount_range, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(order_exists, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_order_exists, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(l_quantity <= 25.0e0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_le_25, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(l_quantity > 0.0e0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_positive, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(l_returnflag IN ('A', 'N', 'R'), FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_returnflag_domain, " +
      "CAST(SUM(CASE WHEN NOT COALESCE(l_tax >= 0.0e0, FALSE) THEN 1 ELSE 0 END) AS BIGINT) AS v_tax_nonneg FROM j) " +
      "SELECT rule, n AS n_rows, v AS n_violations, " +
      "CAST(v AS DOUBLE) / CAST(n AS DOUBLE) AS violation_rate FROM (" +
      "SELECT 'discount_range' AS rule, n, v_discount_range AS v FROM a " +
      "UNION ALL SELECT 'order_exists', n, v_order_exists FROM a " +
      "UNION ALL SELECT 'qty_le_25', n, v_qty_le_25 FROM a " +
      "UNION ALL SELECT 'qty_positive', n, v_qty_positive FROM a " +
      "UNION ALL SELECT 'returnflag_domain', n, v_returnflag_domain FROM a " +
      "UNION ALL SELECT 'tax_nonneg', n, v_tax_nonneg FROM a) ORDER BY rule"))

  /** END-TO-END TOKENIZE → PACK pipeline (the q_curation_pipeline
    * discipline applied to the tokenizer family): BPE-train on the corpus
    * ([[Bpe.train]], 8 merges), encode every document
    * ([[Bpe.encodeAudited]] — its per-doc token counts are the
    * hash-green q_bpe_encode claim), then greedily pack documents into
    * fixed token-budget training sequences per language
    * ([[graft.operators.TextAnalysis.packSequences]], budget 8192 BPE
    * tokens). One plan end to end; the oracle replays the SAME
    * composition — the unrolled merge rounds, the per-doc counts, and
    * the running-sum pack cut — as one CTE chain, so the COMPOSITION is
    * gated, not just the stages. Scale shape: BPE stats are
    * vocabulary-bounded, the pack is one window per language partition. */
  private val qTokenizePack = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val model = Bpe.train(docs, "text", numMerges = BpeRounds)
      val counts = Bpe.encodeAudited(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("n_tokens"))
      val withLang = docs.select(col("doc_id"), col("lang")).join(counts, "doc_id")
      graft.operators.TextAnalysis.packSequences(withLang, "doc_id",
          col("n_tokens"), budget = 8192L, groupCol = "lang")
        .orderBy(col("lang"), col("doc_id"))
    },
    Some(BpeEncodeCtes + ", " +
      "nt AS (SELECT d.lang, d.doc_id, CAST(COALESCE(a.n_tokens, 0) AS BIGINT) AS n_tokens " +
      "FROM documents d LEFT JOIN agg a USING (doc_id)), " +
      "c AS (SELECT lang, doc_id, n_tokens, CAST(SUM(n_tokens) OVER " +
      "(PARTITION BY lang ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens FROM nt) " +
      "SELECT lang, doc_id, n_tokens, cum_tokens, " +
      "CAST(floor((cum_tokens - n_tokens) / 8192) AS BIGINT) AS pack_id " +
      "FROM c ORDER BY lang, doc_id"))

  /** SYNTHETIC CHAT TURNS — documents deterministically regrouped into
    * 8-turn conversations (`conv_id = doc_id div 8`, `turn_idx =
    * doc_id % 8`) with arithmetic-derived roles, so both engines derive
    * the identical corpus: turn 0 is `system`, except every 7th
    * conversation starts `user` (the no-system-prompt case) and
    * `conv % 11 = 3` starts `assistant` (INVALID start); later turns
    * alternate user/assistant from the start offset, with two planted
    * defect classes — `doc_id % 101 = 7` yields the unknown role `tool`
    * and `doc_id % 37 = 5` flips the expected role (alternation break).
    * All arithmetic on non-negative longs (`div` ≡ `//`, `%` ≡ `%`). */
  private def chatTurns(docs: DataFrame): DataFrame = {
    val conv = expr("doc_id div 8")
    val turn = col("doc_id") % 8
    val offset = when((conv % 11 =!= 3) && (conv % 7 =!= 0), 1L).otherwise(0L)
    val base = when((turn + 1 - offset) % 2 === 1, "user").otherwise("assistant")
    val start = when(conv % 11 === 3, "assistant")
      .when(conv % 7 === 0, "user").otherwise("system")
    val flip = when(base === "user", "assistant").otherwise("user")
    val later = when(col("doc_id") % 101 === 7, "tool")
      .when(col("doc_id") % 37 === 5, flip)
      .otherwise(base)
    docs.select(col("doc_id"), conv.as("conv_id"), turn.as("turn_idx"),
      when(turn === 0, start).otherwise(later).as("role"), col("text"))
  }

  /** The [[chatTurns]] synthesis + per-turn rule flags as oracle CTEs,
    * ending at `f1(conv_id, turn_idx, role, n_tokens, rn, prev)` —
    * shared by the chat audit and chat-pack oracles. `n_tokens` is the
    * BPE count + 1 end-of-turn token (requires [[BpeEncodeCtes]]'s `agg`
    * in scope when `withTokens`). */
  private def chatTurnCtes(withTokens: Boolean): String = {
    val tok = if (withTokens)
      ", CAST(COALESCE(a.n_tokens, 0) + 1 AS BIGINT) AS n_tokens" else ""
    val join = if (withTokens) " LEFT JOIN agg a USING (doc_id)" else ""
    s"ct AS (SELECT doc_id, doc_id // 8 AS conv_id, doc_id % 8 AS turn_idx, text$tok " +
      s"FROM documents d$join), " +
      "cr1 AS (SELECT *, CASE WHEN conv_id % 11 <> 3 AND conv_id % 7 <> 0 " +
      "THEN 1 ELSE 0 END AS o FROM ct), " +
      "cr2 AS (SELECT *, CASE WHEN (turn_idx + 1 - o) % 2 = 1 THEN 'user' " +
      "ELSE 'assistant' END AS base FROM cr1), " +
      "crt AS (SELECT * EXCLUDE (o, base), CASE WHEN turn_idx = 0 THEN " +
      "CASE WHEN conv_id % 11 = 3 THEN 'assistant' " +
      "WHEN conv_id % 7 = 0 THEN 'user' ELSE 'system' END " +
      "ELSE CASE WHEN doc_id % 101 = 7 THEN 'tool' " +
      "WHEN doc_id % 37 = 5 THEN (CASE WHEN base = 'user' THEN 'assistant' " +
      "ELSE 'user' END) ELSE base END END AS role FROM cr2), " +
      "f1 AS (SELECT *, row_number() OVER cw AS rn, lag(role) OVER cw AS prev " +
      "FROM crt WINDOW cw AS (PARTITION BY conv_id ORDER BY turn_idx))"
  }

  /** The per-turn validity flag both chat oracles fold: rule 2 at rn=1,
    * rules 2+3 later (each branch implies the role is known). */
  private val ChatRowOk: String =
    "CASE WHEN rn = 1 THEN " +
      "(CASE WHEN role IN ('system','user') THEN 1 ELSE 0 END) " +
      "ELSE (CASE WHEN role IN ('user','assistant') AND role <> prev " +
      "AND (prev <> 'system' OR role = 'user') THEN 1 ELSE 0 END) END"

  /** CHAT ROLE-VALIDATION AUDIT ([[graft.operators.Chat
    * .validateConversations]] over [[chatTurns]]): the per-conversation
    * system/user/assistant alternation report — the SFT-ingest gate.
    * Conversation grain; the oracle refolds the identical lag-based
    * rules. */
  private val qChatAudit = Q(
    (s, d) => graft.operators.Chat.validateConversations(
        chatTurns(t(s, d, "documents")), "conv_id", "turn_idx", "role")
      .orderBy(col("conv_id")),
    Some("WITH " + chatTurnCtes(withTokens = false) + ", " +
      "ca AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns, " +
      "min(CASE WHEN role IN ('system','user','assistant') THEN 1 ELSE 0 END) = 1 AS roles_known, " +
      "min(CASE WHEN rn = 1 THEN (CASE WHEN role IN ('system','user') THEN 1 ELSE 0 END) ELSE 1 END) = 1 AS starts_ok, " +
      s"min($ChatRowOk) = 1 AS alternates_ok, " +
      "max(CASE WHEN role = 'assistant' THEN 1 ELSE 0 END) = 1 AS has_assistant, " +
      "arg_max(role, rn) = 'assistant' AS ends_assistant " +
      "FROM f1 GROUP BY conv_id) " +
      "SELECT conv_id, n_turns, roles_known, starts_ok, alternates_ok, " +
      "has_assistant, ends_assistant, " +
      "roles_known AND alternates_ok AND has_assistant AS valid " +
      "FROM ca ORDER BY conv_id"))

  /** SFT CHAT FLATTEN → LOSS-MASK → PACK ([[graft.operators.Chat
    * .chatPack]]): the full transcript-prep composition as ONE gated
    * plan — [[chatTurns]] conversations are role-validated (invalid
    * dropped whole), trailing non-assistant turns trimmed, each turn
    * BPE-encoded ([[Bpe.encodeAudited]] counts + 1 end-of-turn token)
    * and assigned its loss-mask token span, and conversations greedily
    * packed into 2048-token sequences across 4 shards. The oracle
    * replays the ENTIRE composition — BPE training rounds, per-turn
    * counts, validation fold, trim, span cumsum, shard pack cut — as
    * one CTE chain, so the composition is hash-gated end to end. */
  /** The full chat pack oracle chain (BPE encode + turn synthesis +
    * validation fold + trim + span cumsum + shard pack cut), ending at
    * `cf3` (turn grain with spans) and `cpk` (conv_id, pack_id) —
    * shared by the pack row and the pack-efficiency audit. */
  private lazy val ChatPackCtes: String =
    BpeEncodeCtes + ", " + chatTurnCtes(withTokens = true) + ", " +
      s"cf2 AS (SELECT *, min($ChatRowOk) OVER cwf AS conv_ok, " +
      "max(CASE WHEN role = 'assistant' THEN rn END) OVER cwf AS last_a " +
      "FROM f1 WINDOW cwf AS (PARTITION BY conv_id)), " +
      "cf3 AS (SELECT conv_id, turn_idx, role, n_tokens, " +
      "SUM(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tok_end, " +
      "SUM(n_tokens) OVER (PARTITION BY conv_id) AS conv_tokens " +
      "FROM cf2 WHERE conv_ok = 1 AND last_a IS NOT NULL AND rn <= last_a), " +
      "cconv AS (SELECT DISTINCT conv_id, conv_id % 4 AS shard, conv_tokens FROM cf3), " +
      "ccum AS (SELECT conv_id, shard, SUM(conv_tokens) OVER (PARTITION BY shard " +
      "ORDER BY conv_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum, " +
      "conv_tokens FROM cconv), " +
      "cpk AS (SELECT conv_id, CAST(floor((cum - conv_tokens) / 2048) AS BIGINT) AS pack_id FROM ccum)"

  /** The full chatPack frame (turn grain) shared by [[qChatPack]] and
    * the pack-efficiency audit. */
  private def chatPacked(s: SparkSession, d: String) = {
    val docs = t(s, d, "documents")
    val model = Bpe.train(docs, "text", numMerges = BpeRounds)
    val counts = Bpe.encodeAudited(docs, "doc_id", "text", model)
      .select(col("doc_id"), col("n_tokens"))
    val turns = chatTurns(docs).join(counts, "doc_id")
      .select(col("conv_id"), col("turn_idx"), col("role"),
        (col("n_tokens") + 1).cast("long").as("n_tokens"))
    graft.operators.Chat.chatPack(turns, "conv_id", "turn_idx", "role",
      col("n_tokens"), budget = 2048L, shards = 4)
  }

  private val qChatPack = Q(
    (s, d) => chatPacked(s, d).orderBy(col("conv_id"), col("turn_idx")),
    Some(ChatPackCtes +
      " SELECT CAST(conv_id % 4 AS BIGINT) AS shard, conv_id, turn_idx, role, " +
      "n_tokens, CAST(tok_end - n_tokens AS BIGINT) AS tok_start, " +
      "CAST(tok_end AS BIGINT) AS tok_end, role = 'assistant' AS loss_mask, " +
      "CAST(conv_tokens AS BIGINT) AS conv_tokens, pack_id " +
      "FROM cf3 JOIN cpk USING (conv_id) ORDER BY conv_id, turn_idx"))

  /** CHAT-TEMPLATE RENDERING ([[graft.operators.Chat
    * .renderConversations]]): the [[qChatPack]] conversations rendered to
    * their actual training strings — validate → drop invalid → trim →
    * `<|role|>\n`-tagged segments concatenated in turn order, with the
    * assistant-body mask-char count. The rendered string is hash-gated
    * BYTE-FOR-BYTE (string_agg ORDER BY replays the ordered-struct
    * concat), so any template, ordering, or trim regression shows as a
    * hash break. */
  private val qChatRender = Q(
    (s, d) => graft.operators.Chat.renderConversations(
        chatTurns(t(s, d, "documents")), "conv_id", "turn_idx", "role", "text")
      .orderBy(col("conv_id")),
    Some("WITH " + chatTurnCtes(withTokens = false) + ", " +
      s"rf2 AS (SELECT *, min($ChatRowOk) OVER cwf AS conv_ok, " +
      "max(CASE WHEN role = 'assistant' THEN rn END) OVER cwf AS last_a " +
      "FROM f1 WINDOW cwf AS (PARTITION BY conv_id)), " +
      "rfk AS (SELECT conv_id, turn_idx, role, text FROM rf2 " +
      "WHERE conv_ok = 1 AND last_a IS NOT NULL AND rn <= last_a), " +
      "ragg AS (SELECT conv_id, CAST(count(*) AS BIGINT) AS n_turns, " +
      "string_agg('<|' || role || '|>' || chr(10) || text || chr(10) || '<|end|>' || chr(10), " +
      "'' ORDER BY turn_idx) AS rendered, " +
      "CAST(COALESCE(SUM(CASE WHEN role = 'assistant' THEN length(text) ELSE 0 END), 0) AS BIGINT) " +
      "AS n_mask_chars FROM rfk GROUP BY conv_id) " +
      "SELECT conv_id, n_turns, rendered, CAST(length(rendered) AS BIGINT) AS n_chars, " +
      "n_mask_chars FROM ragg ORDER BY conv_id"))

  /** PACKING-EFFICIENCY AUDIT over the [[chatPacked]] frame — the
    * context-window utilization report every packing run publishes
    * before training: per (shard, pack), how many conversations landed,
    * tokens used, the largest member, the fill ratio against the
    * 2048-token budget (capped at 1 — a pack whose LAST conversation
    * straddles the cut reads full), and the over-budget flag (a single
    * conversation larger than the context window — the truncate-or-split
    * decision row). Pack grain (≪ conv grain ≪ corpus); the audit adds
    * one aggregation over the conv-grain frame. */
  private val qPackEfficiency = Q(
    (s, d) => chatPacked(s, d)
      .select(col("shard"), col("pack_id"), col("conv_id"), col("conv_tokens"))
      .distinct()
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_convs"),
        sum(col("conv_tokens")).as("used_tokens"),
        max(col("conv_tokens")).as("max_conv_tokens"))
      .select(col("shard"), col("pack_id"), col("n_convs"),
        col("used_tokens"), col("max_conv_tokens"),
        round(least(col("used_tokens").cast("double") / lit(2048.0), lit(1.0)), 6)
          .as("fill_ratio"),
        (col("max_conv_tokens") > 2048L).as("over_budget"))
      .orderBy(col("shard"), col("pack_id")),
    Some(ChatPackCtes + " " +
      "SELECT shard, pack_id, CAST(count(*) AS BIGINT) AS n_convs, " +
      "CAST(SUM(conv_tokens) AS BIGINT) AS used_tokens, " +
      "CAST(MAX(conv_tokens) AS BIGINT) AS max_conv_tokens, " +
      "round(least(CAST(SUM(conv_tokens) AS DOUBLE) / 2048e0, 1.0e0), 6) AS fill_ratio, " +
      "MAX(conv_tokens) > 2048 AS over_budget " +
      "FROM ccum JOIN cpk USING (conv_id) " +
      "GROUP BY shard, pack_id ORDER BY shard, pack_id"))

  /** K-ANONYMITY SUPPRESSION ([[graft.operators.Privacy.kAnonymize]]) over
    * customer with quasi-identifiers (nation, market segment, 2000-unit
    * balance bucket): groups under k=4 rows release '*' in every QI
    * column. The oracle replays the group counts with one window — the
    * operator itself uses the broadcast-join shape (the fact side never
    * shuffles; see the operator scaladoc). floor(acctbal/2000e0) is IEEE
    * division + floor, bit-identical cross-engine. */
  private val qKAnonymize = Q(
    (s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey").as("nation_q"),
          col("c_mktsegment").as("segment_q"),
          floor(col("c_acctbal") / lit(2000.0)).cast("long").as("bal_q"))
      graft.operators.Privacy
        .kAnonymize(cust, Seq("nation_q", "segment_q", "bal_q"), k = 4)
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, " +
      "CASE WHEN n >= 4 THEN CAST(nation_q AS VARCHAR) ELSE '*' END AS nation_q, " +
      "CASE WHEN n >= 4 THEN segment_q ELSE '*' END AS segment_q, " +
      "CASE WHEN n >= 4 THEN CAST(bal_q AS VARCHAR) ELSE '*' END AS bal_q " +
      "FROM (SELECT c_custkey, c_nationkey AS nation_q, c_mktsegment AS segment_q, " +
      "CAST(floor(c_acctbal/2000e0) AS BIGINT) AS bal_q, " +
      "count(*) OVER (PARTITION BY c_nationkey, c_mktsegment, " +
      "CAST(floor(c_acctbal/2000e0) AS BIGINT)) AS n FROM customer) " +
      "ORDER BY c_custkey"))

  /** K/L-DIVERSITY AUDIT ([[graft.operators.Privacy.lDiversityAudit]]):
    * per (nation, balance-bucket) group, size and distinct market
    * segments with the k=10 / l=3 compliance flags — the pre-release scan
    * that finds groups k-anonymity alone would wrongly pass (large but
    * sensitive-homogeneous). One aggregation, |groups| output rows. */
  private val qLDiversity = Q(
    (s, d) => {
      val cust = t(s, d, "customer")
        .select(col("c_nationkey").as("nation_q"),
          floor(col("c_acctbal") / lit(2000.0)).cast("long").as("bal_q"),
          col("c_mktsegment"))
      graft.operators.Privacy
        .lDiversityAudit(cust, Seq("nation_q", "bal_q"), "c_mktsegment",
          k = 10, l = 3)
        .orderBy(col("nation_q"), col("bal_q"))
    },
    Some("SELECT c_nationkey AS nation_q, " +
      "CAST(floor(c_acctbal/2000e0) AS BIGINT) AS bal_q, " +
      "count(*) AS n, count(DISTINCT c_mktsegment) AS l_distinct, " +
      "count(*) >= 10 AS k_anonymous, " +
      "count(DISTINCT c_mktsegment) >= 3 AS l_diverse " +
      "FROM customer GROUP BY 1, 2 ORDER BY nation_q, bal_q"))

  /** LAPLACE-NOISED HISTOGRAM ([[graft.operators.Privacy.dpNoisyCount]]):
    * customer counts per nation at eps = 1, noise drawn from the keyed
    * PRF (portable md5 hash of the group value + salt) through the
    * inverse Laplace CDF — deterministic, so the oracle replays the draw
    * in SQL and the row is hash-green despite being 'noisy'. Rounded to
    * 6 decimals so cross-libm ln drift can't flap the gate. */
  private val qDpHistogram = Q(
    (s, d) => graft.operators.Privacy
      .dpNoisyCount(t(s, d, "customer").select(col("c_nationkey")),
        "c_nationkey", eps = 1.0,
        salt = graft.operators.Privacy.TestOnlyPublicSalt)
      .orderBy(col("c_nationkey")),
    Some("SELECT c_nationkey, n, round(n + -1.0e0 * sign(u) * " +
      "ln(1.0e0 - 2.0e0 * abs(u)), 6) AS noisy_n FROM (" +
      "SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n, " +
      "(CAST(('0x' || substr(md5(CAST(c_nationkey AS VARCHAR) || 'graft-dp'), 1, 8))::BIGINT AS DOUBLE) " +
      "+ 0.5e0) / 4294967296.0e0 - 0.5e0 AS u " +
      "FROM customer GROUP BY 1) ORDER BY c_nationkey"))

  /** Unrolled-epoch CTE chain for the quality-classifier oracle: replays
    * [[graft.operators.QualityClassifier.train]]'s full fixed-point
    * gradient-descent trajectory (hard-sigmoid, FP = 1e5, lr = 4/n) in
    * SQL — the q_kmeans_assign/q_pagerank discipline applied to a learned
    * model. Epoch 1 folds to a constant (w₀ = 0 ⇒ p = FP/2 exactly);
    * epochs 2..E rebuild margins/predictions/gradients under the previous
    * weight table. Every value is an exact integer or an exact-double
    * floor division, so the trained scores hash-match bit-for-bit. */
  private def qualityClfSql(epochs: Int): String =
    qualityClfCtes(epochs) + " " +
      "SELECT doc_id, score_fp, score_fp >= 50000 AS pred FROM scored ORDER BY doc_id"

  /** The shared training-replay prefix: WITH ... ends at `scored`
    * (doc_id, score_fp) — the final-epoch scores of every document.
    * [[qualityClfSql]] reads predictions off it; the PR-curve oracle
    * aggregates it. */
  private def qualityClfCtes(epochs: Int): String = {
    def upd(e: String, prevW: Option[String]): String = {
      val base = prevW.map(p => s"COALESCE($p.w, 0)").getOrElse("0")
      val join = prevW.map(p => s" LEFT JOIN $p USING (b)").getOrElse("")
      s"SELECT $e.b, $base - CAST(FLOOR(CAST(4 * $e.g AS DOUBLE) / " +
        s"(CAST(n AS DOUBLE) * 100000.0)) AS BIGINT) AS w FROM $e$join, nn"
    }
    def pExpr(mraw: String): String =
      s"GREATEST(0, LEAST(100000, 50000 + CAST(FLOOR(FLOOR(CAST($mraw AS DOUBLE) " +
        "/ 100000.0) / 4.0) AS BIGINT)))"
    def epoch(r: Int): String =
      s"m$r AS (SELECT x.doc_id, CAST(SUM(COALESCE(w${r - 1}.w, 0) * x.x) AS BIGINT) AS mraw " +
        s"FROM x LEFT JOIN w${r - 1} USING (b) GROUP BY x.doc_id), " +
        s"p$r AS (SELECT doc_id, ${pExpr("mraw")} AS p FROM m$r), " +
        s"e$r AS (SELECT x.b, CAST(SUM((p$r.p - tl.y) * x.x) AS BIGINT) AS g " +
        s"FROM x JOIN p$r USING (doc_id) JOIN tl USING (doc_id) GROUP BY x.b), " +
        s"w$r AS MATERIALIZED (${upd(s"e$r", Some(s"w${r - 1}"))})"
    "WITH tl AS (SELECT doc_id, lower(text) AS txt, " +
      "CASE WHEN lang = 'en' THEN 100000 ELSE 0 END AS y FROM documents), " +
      "gr AS (SELECT doc_id, substring(txt, pos, 3) AS g FROM (" +
      "SELECT doc_id, txt, unnest(range(1, length(txt) - 1)) AS pos FROM tl " +
      "WHERE length(txt) >= 3)), " +
      "c AS (SELECT doc_id, ('0x' || substr(md5(g), 1, 8))::BIGINT % 1024 AS b, " +
      "count(*) AS cnt FROM gr GROUP BY 1, 2), " +
      "tt AS (SELECT doc_id, CAST(SUM(cnt) AS BIGINT) AS tot FROM c GROUP BY 1), " +
      "x AS MATERIALIZED (SELECT doc_id, b, CAST(FLOOR(CAST(cnt AS DOUBLE) * 100000.0 " +
      "/ CAST(tot AS DOUBLE)) AS BIGINT) AS x FROM c JOIN tt USING (doc_id) " +
      "UNION ALL SELECT doc_id, 1024, 100000 FROM tl), " +
      "nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tl), " +
      "e1 AS (SELECT x.b, CAST(SUM((50000 - tl.y) * x.x) AS BIGINT) AS g " +
      "FROM x JOIN tl USING (doc_id) GROUP BY x.b), " +
      s"w1 AS MATERIALIZED (${upd("e1", None)}), " +
      (2 to epochs).map(epoch).mkString(", ") + ", " +
      s"ms AS (SELECT x.doc_id, CAST(SUM(COALESCE(w$epochs.w, 0) * x.x) AS BIGINT) AS mraw " +
      s"FROM x LEFT JOIN w$epochs USING (b) GROUP BY x.doc_id), " +
      s"scored AS (SELECT doc_id, ${pExpr("mraw")} AS score_fp FROM ms)"
  }

  /** TRAIN-AND-SCORE QUALITY CLASSIFIER
    * ([[graft.operators.QualityClassifier]]): fastText-style logistic
    * gate over hashed char-3-gram features, trained IN-PLAN for 3
    * fixed-point full-batch epochs (hard sigmoid, integer weights) and
    * scored as one scan+agg pass — the most-used curation operator a
    * corpus pipeline runs between heuristic filters and tokenization.
    * The label here is the lang='en' flag (the [[qDsirWeights]] target
    * convention); the oracle replays the ENTIRE training trajectory as
    * unrolled-epoch CTEs, so the gate hash-verifies the learned model
    * itself, not just the scoring pass. QualityClassifierSpec proves the
    * learned boundary separates planted junk from clean text. */
  private val qQualityClf = Q(
    (s, d) => graft.operators.QualityClassifier
      .trainScore(t(s, d, "documents"), "doc_id", "text",
        label = col("lang") === "en", buckets = 1024, epochs = 3,
        cacheKey = Some(clfKey(s, d)))
      .orderBy(col("doc_id")),
    Some(qualityClfSql(3)))

  /** AHO–CORASICK BLOCKLIST FILTER ([[graft.operators.Blocklist]]): per
    * document, the sorted-distinct blocklisted terms it contains, their
    * count, and the drop flag — C4-style badword gating as ONE scan
    * stage (the `ac_matches` codegen automaton walks each row once
    * regardless of lexicon size; BlocklistSpec proves the plan shape).
    * The planted lexicon exercises the automaton's hard cases — nested
    * suffixes (`scan`/`can`/`an`), a shared prefix pair (`tab`/`table`),
    * a cross-word phrase with a space (`fast sort`), an embedded term
    * (`que` inside `query`), and an absent term (`xyzzy`). The oracle
    * mirrors with a bounded OR-of-`contains` over the same planted
    * lexicon — valid only because the oracle's lexicon is tiny; the
    * Spark plan's whole point is that it does NOT scale with lexicon
    * size. */
  private val qBlocklistFilter = Q(
    (s, d) => graft.operators.Blocklist
      .audit(t(s, d, "documents"), "doc_id", "text",
        Seq("an", "can", "fast sort", "merge", "que", "scan", "tab",
          "table", "xyzzy"))
      .select(col("doc_id"), array_join(col("hits"), "|").as("hits_str"),
        col("n_hits"), col("blocked"))
      .orderBy(col("doc_id")),
    Some("WITH pats(p) AS (VALUES ('an'), ('can'), ('fast sort'), ('merge'), " +
      "('que'), ('scan'), ('tab'), ('table'), ('xyzzy')), " +
      "m AS (SELECT d.doc_id, p FROM documents d, pats WHERE contains(lower(d.text), p)), " +
      "h AS (SELECT doc_id, string_agg(p, '|' ORDER BY p) AS hits_str, " +
      "CAST(count(*) AS INT) AS n_hits FROM m GROUP BY doc_id) " +
      "SELECT d.doc_id, COALESCE(h.hits_str, '') AS hits_str, " +
      "COALESCE(h.n_hits, 0) AS n_hits, COALESCE(h.n_hits, 0) > 0 AS blocked " +
      "FROM documents d LEFT JOIN h USING (doc_id) ORDER BY doc_id"))

  /** DP-unroll bound of the unigram-LM oracle: positions 1..12 are
    * unrolled as CTEs, so the oracle covers words up to 12 chars; the
    * Spark query REQUIRES the training corpus fits (the expression
    * itself handles any length). */
  private val UniMaxLen = 12
  private val UniMaxPiece = 4

  /** One unrolled Viterbi pass under cost table `ct`: CTEs `v{n}_0..12`,
    * each position keeping the arg-min (cost, np, path) state over the
    * ≤ [[UniMaxPiece]] pieces that could end there —
    * `row_number() OVER (ORDER BY cost, np, path)` IS the codec's
    * tie-break. `seg{n}` reads each word's state at its own length. */
  private def uniViterbi(n: Int, ct: String): String = {
    def pos(j: Int): String = {
      val branches = (1 to math.min(UniMaxPiece, j)).map { l =>
        s"SELECT s.w, s.f, s.cost + c.cost AS cost, s.np + 1 AS np, " +
          s"CASE WHEN s.path = '' THEN c.p ELSE s.path || '|' || c.p END AS path " +
          s"FROM v${n}_${j - l} s JOIN $ct c ON c.p = substring(s.w, ${j - l + 1}, $l) " +
          s"WHERE length(s.w) >= $j"
      }.mkString(" UNION ALL ")
      s"v${n}_$j AS (SELECT w, f, cost, np, path FROM (" +
        "SELECT w, f, cost, np, path, " +
        "row_number() OVER (PARTITION BY w ORDER BY cost, np, path) AS rn " +
        s"FROM ($branches) cands) rk WHERE rn = 1)"
    }
    s"v${n}_0 AS (SELECT w, f, CAST(0 AS BIGINT) AS cost, 0 AS np, '' AS path FROM w0), " +
      (1 to UniMaxLen).map(pos).mkString(", ") + ", " +
      s"seg$n AS MATERIALIZED (SELECT w, f, np, path FROM (" +
      (1 to UniMaxLen).map(j => s"SELECT w, f, np, path, $j AS j FROM v${n}_$j")
        .mkString(" UNION ALL ") +
      ") u WHERE j = length(w))"
  }

  /** Requantized cost table after a recount: vocabulary narrows to the
    * pieces the round's segmentations used; single chars never die
    * (frequency floor 1 — the coverage guarantee). */
  private def uniRecount(n: Int, prevC: String): String =
    s"f$n AS (SELECT unnest(string_split(path, '|')) AS p, f FROM seg$n), " +
      s"f${n}g AS (SELECT p, CAST(SUM(f) AS BIGINT) AS fr FROM f$n GROUP BY p), " +
      s"c$n AS MATERIALIZED (SELECT p, 64 - (length(bin(fr)) - 1) AS cost FROM (" +
      s"SELECT $prevC.p, COALESCE(f${n}g.fr, " +
      s"CASE WHEN length($prevC.p) = 1 THEN 1 ELSE 0 END) AS fr " +
      s"FROM $prevC LEFT JOIN f${n}g ON $prevC.p = f${n}g.p) WHERE fr >= 1)"

  /** Oracle for [[qUnigramTok]]: replays the ENTIRE trajectory —
    * substring seeding, 2 hard-EM rounds (Viterbi E-step + recount
    * M-step), and the final per-word Viterbi — in exact integer
    * arithmetic (costs are `64 − ⌊log₂ f⌋` via `length(bin(f)) − 1`),
    * then reads each document's encoding off the final per-word
    * segmentation, BPE-oracle style (valid because the eval corpus IS
    * the training corpus). */
  /** The unigram training chain (seeding → 2 hard-EM rounds → final
    * per-word Viterbi), factored for the same one-top-level-WITH
    * composition reason as [[ToksCte]]. Ends with `seg3`. */
  private lazy val UniTrainCtes: String =
    "w0 AS MATERIALIZED (SELECT w, CAST(count(*) AS BIGINT) AS f FROM toks WHERE w <> '' GROUP BY w), " +
      s"sl AS (SELECT w, f, unnest(range(1, ${UniMaxPiece + 1})) AS l FROM w0), " +
      "sp AS (SELECT w, f, l, unnest(range(1, length(w) - l + 2)) AS s FROM sl WHERE l <= length(w)), " +
      "seed AS MATERIALIZED (SELECT substring(w, CAST(s AS INT), CAST(l AS INT)) AS p, " +
      "CAST(SUM(f) AS BIGINT) AS fr FROM sp GROUP BY 1), " +
      "c0 AS MATERIALIZED (SELECT p, 64 - (length(bin(fr)) - 1) AS cost FROM seed), " +
      uniViterbi(1, "c0") + ", " + uniRecount(1, "c0") + ", " +
      uniViterbi(2, "c1") + ", " + uniRecount(2, "c1") + ", " +
      uniViterbi(3, "c2")

  private lazy val UnigramTokSql: String =
    "WITH " + ToksCte + ", " + UniTrainCtes + ", " + DocOccCtes + ", " +
      "enc AS (SELECT o.doc_id, o.ord, s.np, s.path FROM occ o JOIN seg3 s ON o.w = s.w), " +
      "agg AS (SELECT doc_id, CAST(SUM(np) AS INT) AS n_pieces, " +
      "string_agg(path, '|' ORDER BY ord) AS pieces_str FROM enc GROUP BY doc_id) " +
      "SELECT d.doc_id, COALESCE(a.n_pieces, 0) AS n_pieces, " +
      "COALESCE(a.pieces_str, '') AS pieces_str " +
      "FROM documents d LEFT JOIN agg a USING (doc_id) ORDER BY doc_id"

  /** UNIGRAM-LM TOKENIZATION ([[graft.operators.UnigramLm]]): train a
    * SentencePiece-style piece table by 2 integer-exact hard-EM rounds
    * over the corpus' word-frequency table (distributed stats,
    * vocabulary-bounded driver iteration — the [[qBpeEncode]] contract),
    * then Viterbi-encode every document in the scan stage via the
    * `unigram_encode` codegen expression. HASH-GREEN the way
    * q_bpe_encode is: the oracle replays seeding, both EM rounds, and
    * the final segmentation as unrolled CTEs. The driver-side `require`
    * keeps the gate honest: the oracle's DP unroll covers words ≤
    * [[UniMaxLen]] chars, so a corpus that outgrows it fails LOUDLY
    * instead of hash-drifting. Pieces are emitted pipe-joined so the
    * gate hashes a flat deterministic column. */
  private val qUnigramTok = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val model = graft.operators.UnigramLm.train(
        docs, "text", maxPieceLen = UniMaxPiece, rounds = 2)
      require(model.maxWordLen <= UniMaxLen,
        s"q_unigram_tok: corpus word of length ${model.maxWordLen} exceeds " +
          s"the oracle's $UniMaxLen-position DP unroll")
      graft.operators.UnigramLm.encode(docs, "doc_id", "text", model)
        .select(col("doc_id"), col("n_pieces"),
          array_join(col("pieces"), "|").as("pieces_str"))
        .orderBy(col("doc_id"))
    },
    Some(UnigramTokSql))

  /** SMALL-FILE COMPACTION PLAN ([[graft.operators.Compaction.plan]]):
    * the lakehouse maintenance op — bin-pack each partition's small
    * files into target-size rewrite groups from the table's file
    * inventory (metadata grain), next-fit-decreasing so the greedy
    * packing is ONE window pass and exactly replayable in SQL (the
    * operator scaladoc explains why NFD, not FFD, is the windowed — and
    * therefore cross-engine-verifiable — form). The inventory here is
    * modeled deterministically from the documents table (file id =
    * doc_id, partition = lang, size = n_chars) so the DuckDB oracle
    * replays the identical plan from the same parquet; a production
    * caller feeds the real file listing. */
  private val qCompactionPlan = Q(
    (s, d) => graft.operators.Compaction.plan(
        t(s, d, "documents").select(col("lang"), col("doc_id"),
          col("n_chars").cast("long").as("size_bytes")),
        partCols = Seq("lang"), fileId = "doc_id", sizeCol = "size_bytes",
        targetBytes = 8192L)
      .orderBy(col("lang"), col("bin"), col("doc_id")),
    Some("WITH f AS (SELECT lang, doc_id, CAST(n_chars AS BIGINT) AS size_bytes " +
      "FROM documents), " +
      "s AS (SELECT lang, doc_id, size_bytes, CAST(FLOOR(CAST(" +
      "SUM(size_bytes) OVER (PARTITION BY lang ORDER BY size_bytes DESC, doc_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - size_bytes " +
      "AS DOUBLE) / 8192.0) AS BIGINT) AS bin FROM f WHERE size_bytes < 8192), " +
      "b AS (SELECT lang, doc_id, size_bytes, CAST(-1 AS BIGINT) AS bin " +
      "FROM f WHERE size_bytes >= 8192), " +
      "u AS (SELECT * FROM s UNION ALL SELECT * FROM b) " +
      "SELECT lang, doc_id, size_bytes, bin, " +
      "CASE WHEN bin = -1 THEN CAST(1 AS BIGINT) " +
      "ELSE count(*) OVER (PARTITION BY lang, bin) END AS bin_files, " +
      "CASE WHEN bin = -1 THEN size_bytes " +
      "ELSE CAST(SUM(size_bytes) OVER (PARTITION BY lang, bin) AS BIGINT) END AS bin_bytes " +
      "FROM u ORDER BY lang, bin, doc_id"))

  /** TOKENIZER FAIRNESS AUDIT — the standard multilingual-tokenizer
    * equity report (tokens-per-byte / bytes-per-token by language, plus
    * each language's token premium relative to English): a tokenizer
    * trained on a skewed corpus charges under-represented languages more
    * tokens per byte of content, which directly prices their context
    * window and training compute. Both trained tokenizers are audited —
    * the [[qBpeEncode]] BPE model and the [[qUnigramTok]] unigram-LM
    * model, each trained exactly as its own gated row trains it — so the
    * oracle replays BOTH training trajectories (the unrolled-merge and
    * unrolled-Viterbi CTE chains, composed as DuckDB nested-WITH
    * subqueries) and the fairness table is hash-verified end to end.
    * Premiums are computed in one fixed operation order
    * (`tok_l·bytes_en / (bytes_l·tok_en)`, exact integer-valued doubles
    * < 2⁵³ before one division) so both engines emit identical bits.
    * Aggregation is one |langs|-row groupBy; the per-doc frame joins the
    * two encode passes on the doc key — nothing here outgrows the
    * tokenizer rows already on the board. */
  private val qTokFairness = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val bpeModel = Bpe.train(docs, "text", numMerges = BpeRounds)
      val uniModel = graft.operators.UnigramLm.train(
        docs, "text", maxPieceLen = UniMaxPiece, rounds = 2)
      require(uniModel.maxWordLen <= UniMaxLen,
        s"q_tok_fairness: corpus word of length ${uniModel.maxWordLen} " +
          s"exceeds the oracle's $UniMaxLen-position DP unroll")
      val bytes = docs.select(col("doc_id"), col("lang"),
        octet_length(col("text")).cast("long").as("nb"))
      val bpeTok = Bpe.encodeAudited(docs, "doc_id", "text", bpeModel)
        .select(col("doc_id"), col("n_tokens").cast("long").as("bt"))
      val uniTok = graft.operators.UnigramLm.encode(docs, "doc_id", "text", uniModel)
        .select(col("doc_id"), col("n_pieces").cast("long").as("up"))
      val agg = bytes
        .join(bpeTok, Seq("doc_id"), "left").join(uniTok, Seq("doc_id"), "left")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("nb")).as("n_bytes"),
          sum(coalesce(col("bt"), lit(0L))).as("bpe_tokens"),
          sum(coalesce(col("up"), lit(0L))).as("uni_pieces"))
      val en = agg.filter(col("lang") === "en")
        .select(col("n_bytes").as("__eb"), col("bpe_tokens").as("__et"),
          col("uni_pieces").as("__eu"))
      def ratio(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
        when(den === 0, lit(null))
          .otherwise(round(num.cast("double") / den.cast("double"), 6))
      def premium(tok: org.apache.spark.sql.Column, etok: org.apache.spark.sql.Column) =
        when(col("n_bytes") === 0 || etok === 0, lit(null))
          .otherwise(round(tok.cast("double") * col("__eb").cast("double") /
            (col("n_bytes").cast("double") * etok.cast("double")), 6))
      agg.crossJoin(broadcast(en))
        .select(col("lang"), col("n_docs"), col("n_bytes"),
          col("bpe_tokens"), col("uni_pieces"),
          ratio(col("n_bytes"), col("bpe_tokens")).as("bpe_bytes_per_token"),
          ratio(col("n_bytes"), col("uni_pieces")).as("uni_bytes_per_piece"),
          premium(col("bpe_tokens"), col("__et")).as("bpe_premium_vs_en"),
          premium(col("uni_pieces"), col("__eu")).as("uni_premium_vs_en"))
        .orderBy(col("lang"))
    },
    // ONE top-level WITH composing both training chains (nesting them as
    // derived-table subqueries defeats DuckDB's MATERIALIZED hints and
    // the unrolled rounds re-evaluate exponentially); the encode tails
    // are renamed benc/bagg / uenc/uagg to avoid CTE-name collisions
    Some("WITH " + ToksCte + ", " +
      BpeTrainCtes.stripPrefix("WITH " + ToksCte + ", ") + ", " +
      UniTrainCtes + ", " + DocOccCtes + ", " +
      s"benc AS (SELECT o.doc_id, o.ord FROM occ o JOIN s$BpeRounds s ON o.w = s.w), " +
      "bagg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS bt FROM benc GROUP BY doc_id), " +
      "uagg AS (SELECT o.doc_id, CAST(SUM(s.np) AS BIGINT) AS up " +
      "FROM occ o JOIN seg3 s ON o.w = s.w GROUP BY o.doc_id), " +
      "per AS (SELECT d.doc_id, d.lang, strlen(d.text) AS nb, " +
      "COALESCE(bagg.bt, 0) AS bt, COALESCE(uagg.up, 0) AS up " +
      "FROM documents d LEFT JOIN bagg USING (doc_id) LEFT JOIN uagg USING (doc_id)), " +
      "ag AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs, " +
      "CAST(SUM(nb) AS BIGINT) AS n_bytes, CAST(SUM(bt) AS BIGINT) AS bpe_tokens, " +
      "CAST(SUM(up) AS BIGINT) AS uni_pieces FROM per GROUP BY lang), " +
      "en AS (SELECT n_bytes AS eb, bpe_tokens AS et, uni_pieces AS eu " +
      "FROM ag WHERE lang = 'en') " +
      "SELECT lang, n_docs, n_bytes, bpe_tokens, uni_pieces, " +
      "CASE WHEN bpe_tokens = 0 THEN NULL ELSE " +
      "round(CAST(n_bytes AS DOUBLE) / CAST(bpe_tokens AS DOUBLE), 6) END AS bpe_bytes_per_token, " +
      "CASE WHEN uni_pieces = 0 THEN NULL ELSE " +
      "round(CAST(n_bytes AS DOUBLE) / CAST(uni_pieces AS DOUBLE), 6) END AS uni_bytes_per_piece, " +
      "CASE WHEN n_bytes = 0 OR et = 0 THEN NULL ELSE " +
      "round(CAST(bpe_tokens AS DOUBLE) * CAST(eb AS DOUBLE) / " +
      "(CAST(n_bytes AS DOUBLE) * CAST(et AS DOUBLE)), 6) END AS bpe_premium_vs_en, " +
      "CASE WHEN n_bytes = 0 OR eu = 0 THEN NULL ELSE " +
      "round(CAST(uni_pieces AS DOUBLE) * CAST(eb AS DOUBLE) / " +
      "(CAST(n_bytes AS DOUBLE) * CAST(eu AS DOUBLE)), 6) END AS uni_premium_vs_en " +
      "FROM ag, en ORDER BY lang"))

  /** CLASSIFIER PR-CURVE ([[graft.operators.Profiler.prCurve]]): the
    * threshold-calibration sweep over the trained quality classifier's
    * scores — train → score → calibrate as ONE gated plan (the
    * [[qTokenizePack]] composition discipline). One row per distinct
    * score with exact integer tp/fp/fn and the derived precision /
    * recall / F1 (F1 from the raw counts, never the rounded ratios).
    * The oracle extends the [[qualityClfCtes]] training replay with the
    * same score-descending cumulative window. */
  private val qClfPrCurve = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val scored = graft.operators.QualityClassifier.trainScore(
        docs, "doc_id", "text", label = col("lang") === "en",
        buckets = 1024, epochs = 3, cacheKey = Some(clfKey(s, d)))
      graft.operators.Profiler.prCurve(
          scored.join(docs.select(col("doc_id"), col("lang")), "doc_id"),
          "score_fp", label = col("lang") === "en")
        .orderBy(col("thr").desc)
    },
    Some(qualityClfCtes(3) + ", " +
      "per AS (SELECT score_fp AS thr, " +
      "CAST(SUM(CASE WHEN tl.y = 100000 THEN 1 ELSE 0 END) AS BIGINT) AS pos, " +
      "CAST(SUM(CASE WHEN tl.y = 100000 THEN 0 ELSE 1 END) AS BIGINT) AS neg " +
      "FROM scored JOIN tl USING (doc_id) GROUP BY 1), " +
      "cum AS (SELECT thr, CAST(SUM(pos) OVER (ORDER BY thr DESC) AS BIGINT) AS tp, " +
      "CAST(SUM(neg) OVER (ORDER BY thr DESC) AS BIGINT) AS fp, " +
      "CAST(SUM(pos) OVER () AS BIGINT) AS tot FROM per) " +
      "SELECT thr, tp, fp, tot - tp AS fn, " +
      "round(CAST(tp AS DOUBLE) / (tp + fp), 6) AS \"precision\", " +
      "CASE WHEN tot > 0 THEN round(CAST(tp AS DOUBLE) / tot, 6) END AS recall, " +
      "round(CAST(2 * tp AS DOUBLE) / (2 * tp + fp + tot - tp), 6) AS f1 " +
      "FROM cum ORDER BY thr DESC"))

  /** CLASSIFIER ROC AUC ([[graft.operators.Profiler.auc]]): the exact
    * Mann–Whitney rank statistic over the same trained scores q_clf_pr
    * sweeps — train → score → one-number eval as ONE gated plan. The
    * oracle extends the [[qualityClfCtes]] replay with the identical
    * distinct-score midrank cumulative.
    *
    * The eval label is NULL-SAFE (`<=>`): training's
    * `when(label, …).otherwise(…)` already treats a NULL lang as
    * negative, and the oracle's `CASE WHEN lang = 'en' … ELSE 0` counts
    * such docs in n_neg — but `auc`'s contract DROPS null labels, so a
    * plain `===` would silently diverge the moment a fixture carries a
    * NULL-lang document (ADVICE r15). */
  private val qClfAuc = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val scored = graft.operators.QualityClassifier.trainScore(
        docs, "doc_id", "text", label = col("lang") === "en",
        buckets = 1024, epochs = 3, cacheKey = Some(clfKey(s, d)))
      graft.operators.Profiler.auc(
        scored.join(docs.select(col("doc_id"), col("lang")), "doc_id"),
        "score_fp", label = col("lang") <=> lit("en"))
    },
    Some(qualityClfCtes(3) + ", " +
      "per AS (SELECT score_fp AS s2, count(*) AS n, " +
      "CAST(SUM(CASE WHEN tl.y = 100000 THEN 1 ELSE 0 END) AS BIGINT) AS np " +
      "FROM scored JOIN tl USING (doc_id) GROUP BY 1), " +
      "wauc AS (SELECT n, np, 2 * COALESCE(SUM(n) OVER (ORDER BY s2 " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + n + 1 AS r2 FROM per) " +
      "SELECT CAST(SUM(np) AS BIGINT) AS n_pos, " +
      "CAST(SUM(n - np) AS BIGINT) AS n_neg, " +
      "CASE WHEN SUM(np) > 0 AND SUM(n - np) > 0 THEN " +
      "round(CAST(SUM(CAST(np AS HUGEINT) * r2) - SUM(np) * (SUM(np) + 1) AS DOUBLE) / " +
      "(2e0 * CAST(SUM(np) AS DOUBLE) * CAST(SUM(n - np) AS DOUBLE)), 6) END AS auc " +
      "FROM wauc"))

  /** CLASSIFIER RELIABILITY DIAGRAM + ECE
    * ([[graft.operators.Profiler.calibration]]): the calibration audit
    * over the same trained scores the PR curve sweeps and the AUC
    * ranks — per probability-decile confidence vs empirical accuracy
    * plus the expected calibration error. Null-safe label (the
    * q_clf_auc lesson); the oracle extends [[qualityClfCtes]] with the
    * identical integer binning and DECIMAL gap sum. */
  private val qClfCalibration = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val scored = graft.operators.QualityClassifier.trainScore(
        docs, "doc_id", "text", label = col("lang") === "en",
        buckets = 1024, epochs = 3, cacheKey = Some(clfKey(s, d)))
      graft.operators.Profiler.calibration(
          scored.join(docs.select(col("doc_id"), col("lang")), "doc_id"),
          "score_fp", label = col("lang") <=> lit("en"),
          fpUnit = graft.operators.QualityClassifier.FP, bins = 10)
        .orderBy(col("bin"))
    },
    Some(qualityClfCtes(3) + ", " +
      "cb AS (SELECT least((score_fp * 10) // 100000, 9) AS bin, score_fp, " +
      "CASE WHEN tl.y = 100000 THEN 1 ELSE 0 END AS y " +
      "FROM scored JOIN tl USING (doc_id)), " +
      "cg AS (SELECT bin, count(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos, " +
      "CAST(SUM(score_fp) AS BIGINT) AS sfp FROM cb GROUP BY 1), " +
      "ct AS (SELECT bin, CAST(n AS BIGINT) AS n, n_pos, " +
      "round(CAST(sfp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000e0), 6) AS confidence, " +
      "round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS accuracy, " +
      "round(abs(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) " +
      "- CAST(sfp AS DOUBLE) / (CAST(n AS DOUBLE) * 100000e0)) " +
      "* (CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)), 9) AS gap_term " +
      "FROM cg) " +
      "SELECT bin, n, n_pos, confidence, accuracy, gap_term, " +
      "round(CAST(SUM(CAST(gap_term AS DECIMAL(20,9))) OVER () AS DOUBLE), 6) AS ece " +
      "FROM ct ORDER BY bin"))

  /** KNESER–NEY PERPLEXITY GATE ([[graft.operators.TextAnalysis.knLogProb]]):
    * the CCNet-style learned-LM filter — train interpolated-KN bigrams on
    * the `lang = 'en'` reference slice, score EVERY document (en docs
    * land near the model's own entropy; other languages and token soup
    * fall to the uniform floor). The oracle rebuilds the entire
    * estimator — pair counts, continuation/context distinct counts, the
    * discount split, the uniform floor — formula-for-formula in SQL. */
  private val qKnPerplexity = Q(
    (s, d) => graft.operators.TextAnalysis.knLogProb(
        t(s, d, "documents"), "doc_id", "text", ref = col("lang") === "en",
        cacheKey = Some(knKey(s, d)))
      .orderBy(col("doc_id")),
    Some(knCtes + " SELECT doc_id, n_bigrams, kn_logprob FROM kn ORDER BY doc_id"))

  /** The KN estimator replay, factored so [[qKnPerplexity]] and the
    * CCNet-style bucket row share one mirror: ends at
    * `kn(doc_id, n_bigrams, kn_logprob)`. */
  private def knCtes: String =
    ("WITH w AS (SELECT doc_id, lang, " +
      "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x <> '') AS ws " +
      "FROM documents), " +
      "bgall AS (SELECT doc_id, lang, unnest(list_slice(ws, 1, len(ws) - 1)) AS w1, " +
      "unnest(list_slice(ws, 2, len(ws))) AS w2 FROM w WHERE len(ws) >= 2), " +
      "bi AS (SELECT w1, w2, count(*) AS bcnt FROM bgall WHERE lang = 'en' GROUP BY 1, 2), " +
      "ctx AS (SELECT w1, SUM(bcnt) AS c1, count(*) AS n1p_ctx FROM bi GROUP BY 1), " +
      "pred AS (SELECT w2, count(*) AS n1p_pred FROM bi GROUP BY 1), " +
      "tot AS (SELECT CAST(count(*) AS DOUBLE) AS t_bigrams FROM bi), " +
      "vt AS (SELECT CAST(count(DISTINCT tok) AS DOUBLE) AS v_train FROM " +
      "(SELECT unnest(ws) AS tok FROM w WHERE lang = 'en')), " +
      "sc AS (SELECT doc_id, bcnt, c1, n1p_ctx, " +
      "CAST(coalesce(n1p_pred, 0) AS DOUBLE) / t_bigrams AS pcont, v_train " +
      "FROM bgall LEFT JOIN bi USING (w1, w2) LEFT JOIN ctx USING (w1) " +
      "LEFT JOIN pred USING (w2) CROSS JOIN tot CROSS JOIN vt), " +
      "pr AS (SELECT doc_id, (1.0e0 - 0.1e0) * " +
      "(CASE WHEN c1 IS NOT NULL THEN " +
      "greatest(CAST(coalesce(bcnt, 0) AS DOUBLE) - 0.75e0, 0.0e0) / CAST(c1 AS DOUBLE) " +
      "+ 0.75e0 * CAST(n1p_ctx AS DOUBLE) / CAST(c1 AS DOUBLE) * pcont " +
      "ELSE pcont END) + 0.1e0 / (v_train + 1.0e0) AS p FROM sc), " +
      "kn AS (SELECT doc_id, count(*) AS n_bigrams, round(avg(ln(p)), 6) AS kn_logprob " +
      "FROM pr GROUP BY doc_id)")

  /** Unrolled integer power iteration for the PCA oracle: Gram build,
    * 2^20 matrix normalization, `iters` matvec + L∞-renormalize rounds —
    * every step HUGEINT-exact with the positive-mod floor-division
    * identity, mirroring [[graft.operators.Pca.topEigvec]] bit for bit.
    * dim is pinned to the testdata's 64 (the Spark side derives it; a
    * regenerated corpus with another width fails the compare loudly). */
  private def pcaCtes(iters: Int, dim: Int = 64): String = {
    val rounds = (1 to iters).map { k =>
      s"w$k AS MATERIALIZED (SELECT gn.i AS i, SUM(gn.g * v${k - 1}.val) AS w " +
        s"FROM gn JOIN v${k - 1} ON gn.j = v${k - 1}.i GROUP BY 1), " +
        s"m$k AS (SELECT MAX(abs(w)) AS m FROM w$k), " +
        s"v$k AS MATERIALIZED (SELECT i, (w * 4096 - ((w * 4096 % m + m) % m)) // m AS val " +
        s"FROM w$k CROSS JOIN m$k)"
    }.mkString(", ")
    "WITH e AS MATERIALIZED (SELECT vec_id, i - 1 AS i, " +
      "CAST(round(CAST(embedding[i] AS DOUBLE) * 128.0e0) AS BIGINT) AS ei " +
      s"FROM embeddings, (SELECT unnest(range(1, ${dim + 1})) AS i) ii), " +
      "g AS MATERIALIZED (SELECT a.i AS i, b.i AS j, SUM(a.ei * b.ei) AS g " +
      "FROM e a JOIN e b USING (vec_id) GROUP BY 1, 2), " +
      "gmax AS (SELECT MAX(abs(g)) AS m FROM g), " +
      "gn AS MATERIALIZED (SELECT i, j, (CAST(g AS HUGEINT) * 1048576 - " +
      "((CAST(g AS HUGEINT) * 1048576 % m + m) % m)) // m AS g " +
      "FROM g CROSS JOIN gmax), " +
      s"v0 AS (SELECT i, CAST(4096 AS HUGEINT) AS val " +
      s"FROM (SELECT unnest(range(0, $dim)) AS i) vi), " +
      rounds
  }

  /** PCA TOP-1 PROJECTION ([[graft.operators.Pca.projectTop1]]): the
    * embedding-whitening diagnostic — quantize once, exact integer Gram,
    * 12 integer power-iteration rounds (driver-side on the dim²-bounded
    * matrix), then score every vector with the eigenvector as a literal.
    * The oracle replays the ENTIRE training trajectory (Gram → normalize
    * → 12 matvec/renorm rounds) as unrolled HUGEINT CTEs, so the learned
    * direction — not just the projections — is hash-verified. */
  private val qPcaProject = Q(
    (s, d) => graft.operators.Pca.projectTop1(
        t(s, d, "embeddings"), "vec_id", "embedding", iters = 12)
      .orderBy(col("vec_id")),
    Some(pcaCtes(12) + " SELECT vec_id, CAST(pc1_fp AS BIGINT) AS pc1_fp, " +
      "round(CAST(pc1_fp AS DOUBLE) / 524288.0e0, 6) AS pc1 FROM " +
      "(SELECT e.vec_id, SUM(e.ei * v.val) AS pc1_fp FROM e " +
      "JOIN v12 v USING (i) GROUP BY 1) ORDER BY vec_id"))

  /** Unrolled fixed-point EM for the Fellegi–Sunter oracle: each epoch
    * is an E-step CTE (the posterior's double chain, every division
    * parenthesized so both engines build the identical IEEE tree,
    * floor-quantized to FP units), an integer-sum aggregate, and a
    * parameter CTE of clamped HUGEINT floor divisions — mirroring
    * [[graft.operators.RecordLinkage.emLinkage]]'s driver BigInt math
    * exactly (all operands positive, so `//` truncation IS floor). */
  private def fsCtes(epochs: Int): String = {
    val fields = Seq("a_type", "a_time", "a_val")
    val fcols = fields.mkString(", ")
    def lik(param: String, f: String): String =
      s"((CASE WHEN $f = 1 THEN CAST($param AS DOUBLE) " +
        s"ELSE CAST(100000 - $param AS DOUBLE) END) / 100000.0e0)"
    def chain(prefix: String): String = fields.zipWithIndex
      .map { case (f, i) => lik(s"$prefix${i + 1}", f) }.mkString(" * ")
    def estep(name: String, pr: String): String =
      s"$name AS MATERIALIZED (SELECT id_a, id_b, $fcols, " +
        "CAST(floor(num / den * 100000.0e0) AS BIGINT) AS w FROM (" +
        s"SELECT id_a, id_b, $fcols, num, " +
        "num + (CAST(100000 - p AS DOUBLE) / 100000.0e0) * (luprod) AS den " +
        s"FROM (SELECT id_a, id_b, $fcols, p, " +
        s"(CAST(p AS DOUBLE) / 100000.0e0) * (${chain("m")}) AS num, " +
        s"${chain("u")} AS luprod FROM pv CROSS JOIN $pr) t1) t2)"
    val rounds = (1 to epochs).map { k =>
      estep(s"e$k", s"pr${k - 1}") + ", " +
        s"g$k AS (SELECT SUM(w) AS s, count(*) AS n, " +
        fields.indices.map(i =>
          s"SUM(w * ${fields(i)}) AS sa${i + 1}, SUM(${fields(i)}) AS ca${i + 1}")
          .mkString(", ") + s" FROM e$k), " +
        s"pr$k AS (SELECT least(greatest(s // n, 1), 99999) AS p, " +
        fields.indices.map { i =>
          s"least(greatest((CAST(sa${i + 1} AS HUGEINT) * 100000) // s, 1), 99999) AS m${i + 1}, " +
            s"least(greatest(((CAST(ca${i + 1} AS HUGEINT) * 100000 - sa${i + 1}) * 100000) " +
            s"// (CAST(n AS HUGEINT) * 100000 - s), 1), 99999) AS u${i + 1}"
        }.mkString(", ") + s" FROM g$k)"
    }.mkString(", ")
    "WITH rr AS (SELECT event_id AS id, user_id AS blk, " +
      "row_number() OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rk " +
      "FROM events), " +
      "prs AS (SELECT a.id AS id_a, b.id AS id_b FROM rr a JOIN rr b " +
      "ON a.blk = b.blk AND b.rk - a.rk BETWEEN 1 AND 2), " +
      "pv AS MATERIALIZED (SELECT id_a, id_b, " +
      "CASE WHEN ea.event_type = eb.event_type THEN 1 ELSE 0 END AS a_type, " +
      "CASE WHEN abs(epoch_us(ea.ts) - epoch_us(eb.ts)) <= 3600000000 THEN 1 ELSE 0 END AS a_time, " +
      "CASE WHEN abs(ea.value - eb.value) <= 10.0e0 THEN 1 ELSE 0 END AS a_val " +
      "FROM prs JOIN events ea ON ea.event_id = id_a " +
      "JOIN events eb ON eb.event_id = id_b), " +
      "pr0 AS (SELECT 10000 AS p, 90000 AS m1, 90000 AS m2, 90000 AS m3, " +
      "10000 AS u1, 10000 AS u2, 10000 AS u3), " +
      rounds + ", " + estep("ef", s"pr$epochs")
  }

  /** FELLEGI–SUNTER LINKAGE ([[graft.operators.RecordLinkage.emLinkage]]):
    * blocked sorted-neighborhood candidates over the event stream (same
    * user, time-adjacent — window 3), comparison vector = (same type,
    * within 1 h, value within 10), match weights learned by 3 rounds of
    * fixed-point EM. The oracle replays candidate generation AND the
    * whole EM trajectory — the learned parameters, not just the final
    * weights, are hash-verified. */
  private val qFsLinkage = Q(
    (s, d) => {
      import graft.operators.RecordLinkage
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), col("value"), unix_micros(col("ts")).as("ts_us"))
      val attrs = (side: String) => ev.select(col("event_id").as(side),
        col("event_type").as(s"ty_$side"), col("value").as(s"v_$side"),
        col("ts_us").as(s"t_$side"))
      val pairs = RecordLinkage.blockedWindowPairs(ev, "event_id",
          col("user_id"), col("ts_us"), window = 3)
        .join(attrs("id_a"), "id_a").join(attrs("id_b"), "id_b")
        .select(col("id_a"), col("id_b"),
          when(col("ty_id_a") === col("ty_id_b"), 1L).otherwise(0L).as("a_type"),
          when(abs(col("t_id_a") - col("t_id_b")) <= lit(3600000000L), 1L)
            .otherwise(0L).as("a_time"),
          when(abs(col("v_id_a") - col("v_id_b")) <= lit(10.0), 1L)
            .otherwise(0L).as("a_val"))
      val (scored, _) = RecordLinkage.emLinkage(pairs,
        Seq("a_type", "a_time", "a_val"), epochs = 3)
      scored.orderBy(col("id_a"), col("id_b"))
    },
    Some(fsCtes(3) + " SELECT id_a, id_b, CAST(a_type AS BIGINT) AS a_type, " +
      "CAST(a_time AS BIGINT) AS a_time, CAST(a_val AS BIGINT) AS a_val, " +
      "w AS w_fp, w >= 50000 AS is_match FROM ef ORDER BY id_a, id_b"))

  /** HTML TEXT EXTRACTION ([[graft.operators.TextAnalysis.htmlExtract]])
    * over PLANTED markup (the corpus has none — the [[qSentences]]
    * planting discipline): every document is wrapped in a full page with
    * a title, a style block, a script block whose JS string contains a
    * decoy `</p>` tag and a bare `<`, and entity-encoded text. The
    * oracle rebuilds the same wrap and the same strip/decode chain
    * regex-for-regex (RE2-compatible patterns; `&amp;` decoded last). */
  private val qHtmlExtract = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val html = concat(
        lit("<html><head><title>"), col("source"), lit(" #"), col("doc_id"),
        lit("</title><style>p {color: #333}</style></head><body><p>"),
        substring(col("text"), 1, 60),
        lit("</p><script type=\"text/js\">var s = \"</p>\"; if (1 < 2) f();</script><p>Tom &amp; Jerry &lt;3 "),
        col("lang"), lit("&gt;</p><br/></body></html>"))
      val (title, body) = graft.operators.TextAnalysis.htmlExtract(html)
      docs.select(col("doc_id"), title.as("title"), body.as("body"))
        .orderBy(col("doc_id"))
    },
    Some("WITH h AS (SELECT doc_id, '<html><head><title>' || source || ' #' || " +
      "CAST(doc_id AS VARCHAR) || '</title><style>p {color: #333}</style></head><body><p>' || " +
      "substring(text, 1, 60) || " +
      "'</p><script type=\"text/js\">var s = \"</p>\"; if (1 < 2) f();</script><p>Tom &amp; Jerry &lt;3 ' || " +
      "lang || '&gt;</p><br/></body></html>' AS html FROM documents), " +
      "s1 AS (SELECT doc_id, html, regexp_replace(regexp_replace(regexp_replace(html, " +
      "'(?s)<head(\\s[^>]*)?>.*?</head>', ' ', 'g'), " +
      "'(?s)<script[^>]*>.*?</script>', ' ', 'g'), " +
      "'(?s)<style[^>]*>.*?</style>', ' ', 'g') AS nb FROM h), " +
      "s2 AS (SELECT doc_id, html, regexp_replace(nb, '<[^>]*>', ' ', 'g') AS nt FROM s1), " +
      "s3 AS (SELECT doc_id, html, regexp_replace(regexp_replace(regexp_replace(" +
      "regexp_replace(regexp_replace(regexp_replace(nt, " +
      "'&lt;', '<', 'g'), '&gt;', '>', 'g'), '&quot;', '\"', 'g'), " +
      "'&#39;', '''', 'g'), '&nbsp;', ' ', 'g'), '&amp;', '&', 'g') AS dec FROM s2) " +
      "SELECT doc_id, regexp_extract(html, '(?s)<title>(.*?)</title>', 1) AS title, " +
      "trim(regexp_replace(dec, '[\\s\\x00-\\x1f]+', ' ', 'g')) AS body " +
      "FROM s3 ORDER BY doc_id"))

  /** φ-FREQUENT TOKENS ([[graft.operators.HeavyHitters.frequentItems]],
    * k = 49): exact items with frequency > n/50 over the corpus token
    * stream, found by per-partition Misra–Gries candidate pruning + one
    * exact verification pass — the shuffle carries ≤ k·partitions
    * candidate rows plus the qualifying counts, never the vocabulary.
    * The oracle is the GROUP-BY-HAVING definition of φ-frequency (the
    * output is exact by the two-pass construction, so the pruning stage
    * needs no oracle of its own). */
  private val qHeavyHitters = Q(
    (s, d) => graft.operators.HeavyHitters.frequentItems(
      t(s, d, "documents").select(
        explode(graft.operators.TextAnalysis.words(lower(col("text")))).as("tok"))
        .filter(col("tok") =!= ""),
      col("tok"), k = 49),
    Some("WITH toks AS (SELECT unnest(list_filter(string_split_regex(" +
      "trim(lower(text)), '\\s+'), x -> x <> '')) AS item FROM documents), " +
      "tot AS (SELECT count(*) AS n_total FROM toks) " +
      "SELECT item, count(*) AS cnt, n_total FROM toks CROSS JOIN tot " +
      "GROUP BY item, n_total HAVING count(*) * 50 > n_total " +
      "ORDER BY cnt DESC, item"))

  /** N-GRAM SPAN SCRUB ([[graft.operators.Corpus.ngramScrub]], n = 4,
    * src0 as the benchmark — the [[qContamination]] convention):
    * surgical decontamination that removes only benchmark-matching
    * token spans and keeps the rest of each document. Every corpus doc
    * appears in the output with exact kept/removed counts and the
    * reassembled clean text; the oracle rebuilds positioned grams,
    * covered slots, the anti-join, and the ordered reassembly. */
  private val qNgramScrub = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      graft.operators.Corpus.ngramScrub(
          docs.filter(col("source") =!= "src0"),
          docs.filter(col("source") === "src0"),
          "doc_id", "text", n = 4)
        .orderBy(col("doc_id"))
    },
    Some("WITH words AS (SELECT doc_id, source, " +
      "list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS w " +
      "FROM documents), " +
      "pos AS (SELECT unnest(range(1, (SELECT COALESCE(max(len(w)), 0) + 1 FROM words))) AS i), " +
      "grams AS (SELECT doc_id, source, i AS p, " +
      "array_to_string(list_slice(w, i, i + 3), ' ') AS g " +
      "FROM words JOIN pos ON pos.i <= len(w) - 3), " +
      "bs AS (SELECT DISTINCT g FROM grams WHERE source = 'src0'), " +
      "covered AS (SELECT DISTINCT doc_id, p + o AS pos FROM " +
      "(SELECT doc_id, p FROM grams WHERE source <> 'src0' AND g IN (SELECT g FROM bs)) h " +
      "CROSS JOIN (SELECT unnest(range(0, 4)) AS o) oo), " +
      "toks AS (SELECT doc_id, i AS pos, w[i] AS tok FROM words " +
      "JOIN pos ON pos.i <= len(w) WHERE source <> 'src0'), " +
      "kept AS (SELECT t.doc_id, t.pos, t.tok FROM toks t LEFT JOIN covered c " +
      "ON t.doc_id = c.doc_id AND t.pos = c.pos WHERE c.pos IS NULL), " +
      "ka AS (SELECT doc_id, count(*) AS n_kept, " +
      "string_agg(tok, ' ' ORDER BY pos) AS clean_text FROM kept GROUP BY 1), " +
      "base AS (SELECT doc_id, len(w) AS n_tokens FROM words WHERE source <> 'src0') " +
      "SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens, " +
      "COALESCE(ka.n_kept, 0) AS n_kept, " +
      "CAST(b.n_tokens AS BIGINT) - COALESCE(ka.n_kept, 0) AS n_removed, " +
      "COALESCE(ka.clean_text, '') AS clean_text " +
      "FROM base b LEFT JOIN ka USING (doc_id) ORDER BY b.doc_id"))

  /** SOFT QUALITY SAMPLE ([[graft.operators.Sampling.softFilterByScore]]
    * over [[graft.operators.QualityClassifier.trainScore]]): train the
    * quality gate, then keep each document with probability equal to its
    * learned score — the RefinedWeb/FineWeb soft-filter policy that
    * downsamples borderline text instead of cliff-dropping it. Train →
    * score → stochastic-by-hash keep as ONE gated plan; the oracle
    * replays the training CTEs and re-derives membership from the same
    * portable md5 ppm draw. */
  private val qSoftQualitySample = Q(
    (s, d) => {
      val scored = graft.operators.QualityClassifier.trainScore(
        t(s, d, "documents"), "doc_id", "text",
        label = col("lang") === "en", buckets = 1024, epochs = 3,
        cacheKey = Some(clfKey(s, d)))
      graft.operators.Sampling.softFilterByScore(
          scored, "doc_id", col("score_fp"))
        .select(col("doc_id"), col("score_fp"))
        .orderBy(col("doc_id"))
    },
    Some(qualityClfCtes(3) + " SELECT doc_id, score_fp FROM scored " +
      "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || 'graft-soft'), 1, 8))::BIGINT " +
      "% 1000000 < score_fp * 10 ORDER BY doc_id"))

  /** CCNet PERPLEXITY BUCKETS: the head/middle/tail split CCNet ships —
    * score every doc under the reference-trained KN model
    * ([[qKnPerplexity]]'s estimator), then cut each LANGUAGE at its own
    * exact discrete terciles ([[graft.operators.Ops.histogramQuantiles]]
    * rank-pick — no interpolation, so both engines pick the identical
    * boundary values) and label head (most reference-like) / middle /
    * tail. Train → score → per-group calibrate → label as ONE gated
    * plan. */
  private val qPplBuckets = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val scored = graft.operators.TextAnalysis.knLogProb(
          docs, "doc_id", "text", ref = col("lang") === "en",
          cacheKey = Some(knKey(s, d)))
        .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      val qs = graft.operators.Ops.histogramQuantiles(scored, "lang", "kn_logprob",
        Seq(1.0 / 3, 2.0 / 3))
      scored.join(broadcast(qs.select(col("lang"), col("p33"), col("p67"))), "lang")
        .select(col("doc_id"), col("lang"), col("kn_logprob"),
          when(col("kn_logprob") > col("p67"), "head")
            .when(col("kn_logprob") > col("p33"), "middle")
            .otherwise("tail").as("ppl_bucket"))
        .orderBy(col("doc_id"))
    },
    Some(knCtes + ", " +
      "wl AS (SELECT doc_id, lang, kn_logprob FROM kn JOIN documents USING (doc_id)), " +
      "vc AS (SELECT lang, kn_logprob AS v, count(*) AS c FROM wl GROUP BY 1, 2), " +
      "cum AS (SELECT lang, v, " +
      "SUM(c) OVER (PARTITION BY lang ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc, " +
      "SUM(c) OVER (PARTITION BY lang) AS n FROM vc), " +
      "qs AS (SELECT lang, " +
      "MIN(CASE WHEN cumc >= CAST(floor((n - 1) * (1.0e0 / 3.0e0)) AS BIGINT) + 1 THEN v END) AS p33, " +
      "MIN(CASE WHEN cumc >= CAST(floor((n - 1) * (2.0e0 / 3.0e0)) AS BIGINT) + 1 THEN v END) AS p67 " +
      "FROM cum GROUP BY 1) " +
      "SELECT doc_id, wl.lang, kn_logprob, " +
      "CASE WHEN kn_logprob > p67 THEN 'head' WHEN kn_logprob > p33 THEN 'middle' " +
      "ELSE 'tail' END AS ppl_bucket FROM wl JOIN qs ON wl.lang = qs.lang " +
      "ORDER BY doc_id"))

  /** QUALITY-SIGNALS TABLE — the wide per-document table every curation
    * pipeline MATERIALIZES before gating decisions: identity + size
    * stats + the trained classifier score + the reference-LM logprob,
    * as ONE gated plan. Composes the two trained-model families through
    * their shared [[graft.operators.Scale.memo]] entries (the board
    * pays scoring only), and the oracle concatenates BOTH training
    * replays — the knCtes and qualityClfCtes chains are name-disjoint
    * by construction — so two learned models hash-verify in a single
    * row. kn_logprob is null for <2-token docs (the unscorable
    * convention); the left join preserves them. */
  private val qQualitySignals = Q(
    (s, d) => {
      val docs = t(s, d, "documents")
      val nTok = size(filter(
        graft.operators.TextAnalysis.words(lower(col("text"))), w => w =!= ""))
      val clf = graft.operators.QualityClassifier.trainScore(
          docs, "doc_id", "text", label = col("lang") === "en",
          buckets = 1024, epochs = 3, cacheKey = Some(clfKey(s, d)))
        .select(col("doc_id"), col("score_fp"))
      val kn = graft.operators.TextAnalysis.knLogProb(
          docs, "doc_id", "text", ref = col("lang") === "en",
          cacheKey = Some(knKey(s, d)))
        .select(col("doc_id"), col("kn_logprob"))
      docs.select(col("doc_id"), col("lang"), col("n_chars"),
          nTok.cast("long").as("n_tokens"))
        .join(clf, "doc_id")
        .join(kn, Seq("doc_id"), "left")
        .orderBy(col("doc_id"))
    },
    Some(knCtes + ", " + qualityClfCtes(3).stripPrefix("WITH ") +
      " SELECT d.doc_id, d.lang, d.n_chars, " +
      "CAST(len(list_filter(string_split_regex(trim(lower(d.text)), '\\s+'), " +
      "x -> x <> '')) AS BIGINT) AS n_tokens, scored.score_fp, kn.kn_logprob " +
      "FROM documents d JOIN scored USING (doc_id) LEFT JOIN kn USING (doc_id) " +
      "ORDER BY doc_id"))

  val registry: Seq[(String, Q)] = Seq(
    "q_quality_clf" -> qQualityClf,
    "q_kn_perplexity" -> qKnPerplexity,
    "q_pca_project" -> qPcaProject,
    "q_fs_linkage" -> qFsLinkage,
    "q_html_extract" -> qHtmlExtract,
    "q_heavy_hitters" -> qHeavyHitters,
    "q_ngram_scrub" -> qNgramScrub,
    "q_soft_quality_sample" -> qSoftQualitySample,
    "q_ppl_buckets" -> qPplBuckets,
    "q_quality_signals" -> qQualitySignals,
    "q_blocklist_filter" -> qBlocklistFilter,
    "q_unigram_tok" -> qUnigramTok,
    "q_tok_fairness" -> qTokFairness,
    "q_compaction_plan" -> qCompactionPlan,
    "q_clf_pr_curve" -> qClfPrCurve,
    "q_clf_auc" -> qClfAuc,
    "q_clf_calibration" -> qClfCalibration,
    "q_expectations" -> qExpectations,
    "q_k_anonymize" -> qKAnonymize,
    "q_l_diversity" -> qLDiversity,
    "q_dp_histogram" -> qDpHistogram,
    "q_tokenize_pack" -> qTokenizePack,
    "q_chat_audit" -> qChatAudit,
    "q_chat_pack" -> qChatPack,
    "q_chat_render" -> qChatRender,
    "q_pack_efficiency" -> qPackEfficiency,
    "q_bpe_encode" -> qBpeEncode,
    "q_bpe_merges" -> qBpeMerges,
    "q_pagerank" -> qPageRank,
    "q_triangles" -> qTriangles,
    "q_clustering_coef" -> qClusteringCoef,
    "q_kcore" -> qKcore,
    "q_assortativity" -> qAssortativity,
    "q_bfs_hops" -> qBfsHops,
    "q_label_prop" -> qLabelProp,
    "q_pmi_pairs" -> qPmiPairs,
    "q_profile_table" -> qProfileTable,
    "q_skew_report" -> qSkewReport,
    "q_band_skew_report" -> qBandSkewReport,
    "q_scd2_build" -> qScd2Build,
    "q_cdc_apply" -> qCdcApply,
    "q_weighted_sample" -> qWeightedSample,
    "q_dsir_weights" -> qDsirWeights,
  )
}
