package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.operators.Ops

/** Named query registry — the engine's query library (SURVEY.md §2 inventory
  * re-expressed over the driver testdata per §7.1's role mapping), each with
  * an equivalent DuckDB oracle SQL.
  *
  * Determinism rules (SURVEY.md §5/§7.4):
  *  - every query ends in a total-order `orderBy` mirrored by `ORDER BY`;
  *  - double SUMs go through DECIMAL(18,2) then back to double — exact and
  *    associative, so the hash compare cannot be broken by summation order;
  *  - per-row double arithmetic uses identical operand order both sides
  *    (IEEE 754 ops are exactly rounded, hence bit-identical);
  *  - no wall-clock anywhere.
  */
/** One named query: Spark plan + optional DuckDB oracle SQL. */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String])

object Queries {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Exact associative money-sum: double → decimal(18,2) → sum → double. */
  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private val SqlDsum = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Testdata-analog influence score (SURVEY.md §7.1: c_acctbal plays
    * followersCount, c_custkey plays statusesCount, c_nationkey plays
    * friendsCount) — F1 with the reference's 0.5/0.3/0.2 weights. */
  private def custScore: Column =
    Functions.influenceScore(col("c_acctbal"), col("c_custkey"), col("c_nationkey"))
  private val SqlCustScore =
    "(COALESCE(c_acctbal, 0.0e0)*0.5e0 + COALESCE(c_custkey, 0)*0.3e0 - COALESCE(c_nationkey, 0)*0.2e0)"

  // =====================================================================
  // §2.2 projections / filters
  // =====================================================================

  private val qP1Projection = Q(
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), upper(col("c_mktsegment")).as("segment"))
      .orderBy(col("c_custkey")),
    Some("SELECT c_custkey, c_name, upper(c_mktsegment) AS segment FROM customer ORDER BY c_custkey"))

  private val qP5PointLookup = Q(
    (s, d) => t(s, d, "customer")
      .filter(col("c_custkey") === 42)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal")),
    Some("SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42"))

  private val qP6FilterEq = Q(
    (s, d) => t(s, d, "orders")
      .filter(col("o_custkey") === 37)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey")),
    Some("SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_custkey = 37 ORDER BY o_orderkey"))

  private val qP7KolGate = Q(
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey"), col("c_name"), custScore.as("influence_score"))
      .filter(col("influence_score") >= 2000.0)
      .orderBy(col("c_custkey")),
    Some(s"SELECT c_custkey, c_name, $SqlCustScore AS influence_score FROM customer " +
      s"WHERE $SqlCustScore >= 2000.0e0 ORDER BY c_custkey"))

  private val qP11NullGuard = Q(
    (s, d) => t(s, d, "events")
      .filter(col("value").isNotNull && col("props").isNotNull)
      .select(col("event_id"), col("user_id"), col("value"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, user_id, value FROM events WHERE value IS NOT NULL AND props IS NOT NULL ORDER BY event_id"))

  // =====================================================================
  // §2.3 scalar functions
  // =====================================================================

  private val qF1Influence = Q(
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey"), custScore.as("influence_score"))
      .orderBy(col("c_custkey")),
    Some(s"SELECT c_custkey, $SqlCustScore AS influence_score FROM customer ORDER BY c_custkey"))

  private val qF2BrandRename = Q(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Functions.brandRename(concat(lit("https://twitter.com/u/"), col("source"))).as("url"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, replace(replace('https://twitter.com/u/' || source, 'Twitter', 'X'), 'twitter', 'x') AS url " +
      "FROM documents ORDER BY doc_id"))

  private val qF4FilenameEpoch = Q(
    (s, d) => t(s, d, "documents")
      .select(col("doc_id"),
        Functions.filenameEpoch(
          concat(col("source"), lit("_"), col("n_chars").cast("string"), lit(".json"))).as("file_ts"))
      .orderBy(col("doc_id")),
    Some("SELECT doc_id, CAST(regexp_extract(source || '_' || CAST(n_chars AS VARCHAR) || '.json', " +
      "'_([0-9]+)\\.json$', 1) AS BIGINT) AS file_ts FROM documents ORDER BY doc_id"))

  private val qF5JsonProps = Q(
    (s, d) => t(s, d, "events")
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy(col("event_id")),
    Some("SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events ORDER BY event_id"))

  // =====================================================================
  // §2.4 joins
  // =====================================================================

  private val qJ1Linkage = Q(
    (s, d) => Ops.dimJoin(
        t(s, d, "orders").select(col("o_custkey").as("c_custkey"), col("o_orderkey")),
        t(s, d, "customer").select(col("c_custkey"), col("c_name")),
        Seq("c_custkey"))
      .select(col("o_orderkey"), col("c_custkey"), col("c_name"))
      .orderBy(col("o_orderkey")),
    Some("SELECT o_orderkey, c_custkey, c_name FROM orders JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"))

  private val qJ2DimEnrich = Q(
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"), col("c_nationkey"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = t(s, d, "region").select(col("r_regionkey"), col("r_name"))
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("r_name"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_name, n_name, r_name FROM customer " +
      "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey ORDER BY c_custkey"))

  private val qJ3Anti = Q(
    (s, d) => Ops.antiJoin(
        t(s, d, "customer").select(col("c_custkey"), col("c_name")),
        t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
      .orderBy(col("c_custkey")),
    Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"))

  private val qJ3Semi = Q(
    (s, d) => Ops.semiJoin(
        t(s, d, "customer").select(col("c_custkey"), col("c_name")),
        t(s, d, "orders").select(col("o_custkey").as("c_custkey")),
        Seq("c_custkey"))
      .orderBy(col("c_custkey")),
    Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS " +
      "(SELECT 1 FROM orders WHERE o_custkey = c_custkey) ORDER BY c_custkey"))

  // =====================================================================
  // §2.5 aggregations
  // =====================================================================

  private val qA1Rollup = Q(
    (s, d) => t(s, d, "events")
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("total_events"),
        dsum(Functions.orZeroD(col("value"))).as("total_value"),
        max(Functions.orZeroD(col("value"))).as("max_value"),
        countDistinct(col("event_type")).as("n_types"))
      .orderBy(col("user_id")),
    Some("SELECT user_id, count(*) AS total_events, " +
      SqlDsum("COALESCE(value, 0)") + " AS total_value, " +
      "max(COALESCE(value, 0)) AS max_value, count(DISTINCT event_type) AS n_types " +
      "FROM events GROUP BY user_id ORDER BY user_id"))

  private val qA2MergePartials = Q(
    (s, d) => {
      val partials = t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("cnt"), max(Functions.orZeroD(col("value"))).as("mx"))
      Ops.mergePartials(partials, Seq("user_id"), Seq("cnt"), Seq("mx"))
        .withColumnRenamed("cnt", "total_events")
        .withColumnRenamed("mx", "max_value")
        .orderBy(col("user_id"))
        .select(col("user_id"), col("total_events"), col("max_value"))
    },
    Some("SELECT user_id, CAST(SUM(cnt) AS BIGINT) AS total_events, MAX(mx) AS max_value FROM " +
      "(SELECT user_id, event_type, count(*) AS cnt, max(COALESCE(value,0)) AS mx " +
      " FROM events GROUP BY user_id, event_type) GROUP BY user_id ORDER BY user_id"))

  private val qA3Histogram = Q(
    (s, d) => Ops.histogram(t(s, d, "customer"), "c_mktsegment")
      .orderBy(col("c_mktsegment")),
    Some("SELECT c_mktsegment, count(*) AS cnt FROM customer " +
      "WHERE c_mktsegment IS NOT NULL GROUP BY c_mktsegment ORDER BY c_mktsegment"))

  private val qA4EventHistogram = Q(
    (s, d) => Ops.histogram(t(s, d, "events"), "event_type")
      .orderBy(col("event_type")),
    Some("SELECT event_type, count(*) AS cnt FROM events " +
      "WHERE event_type IS NOT NULL GROUP BY event_type ORDER BY event_type"))

  private val qA5GlobalStats = Q(
    (s, d) => t(s, d, "customer").agg(
      count(lit(1)).as("n"),
      (dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"),
      max(col("c_acctbal")).as("max_bal")),
    Some("SELECT count(*) AS n, " + SqlDsum("c_acctbal") + " / count(*) AS avg_bal, " +
      "max(c_acctbal) AS max_bal FROM customer"))

  private val qA7Distinct = Q(
    (s, d) => t(s, d, "customer").select(col("c_mktsegment")).distinct()
      .orderBy(col("c_mktsegment")),
    Some("SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment"))

  private val qA8DedupFirstWins = Q(
    (s, d) => Ops.dedupFirstWins(
        t(s, d, "events").select(col("user_id"), col("event_id"), col("ts"), col("event_type")),
        Seq("user_id"), Seq(col("ts"), col("event_id")))
      .orderBy(col("user_id")),
    Some("SELECT user_id, event_id, ts, event_type FROM events " +
      "QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) = 1 ORDER BY user_id"))

  private val qA9EngagementSeries = Q(
    (s, d) => t(s, d, "events")
      .groupBy(col("user_id"), window(col("ts"), "1 hour"))
      .agg(
        count(lit(1)).as("n_events"),
        dsum(Functions.orZeroD(col("value"))).as("sum_value"),
        count(when(col("event_type") === "purchase", 1)).as("n_purchases"))
      .select(col("user_id"), col("window.start").as("hour_ts"),
        col("n_events"), col("sum_value"), col("n_purchases"))
      .orderBy(col("user_id"), col("hour_ts")),
    Some("SELECT user_id, date_trunc('hour', ts) AS hour_ts, count(*) AS n_events, " +
      SqlDsum("COALESCE(value,0)") + " AS sum_value, " +
      "count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchases " +
      "FROM events GROUP BY user_id, date_trunc('hour', ts) ORDER BY user_id, hour_ts"))

  // =====================================================================
  // §2.6 top-k  +  §2.7 set ops
  // =====================================================================

  private val qT1Top5Influence = Q(
    (s, d) => Ops.topK(
        t(s, d, "customer").select(col("c_custkey"), col("c_name"), custScore.as("influence_score")),
        5, Seq(col("influence_score").desc, col("c_custkey"))),
    Some(s"SELECT c_custkey, c_name, $SqlCustScore AS influence_score FROM customer " +
      "ORDER BY influence_score DESC, c_custkey LIMIT 5"))

  private val qT2Top5Active = Q(
    (s, d) => Ops.topK(
        t(s, d, "events").groupBy(col("user_id")).agg(count(lit(1)).as("total_events")),
        5, Seq(col("total_events").desc, col("user_id"))),
    Some("SELECT user_id, count(*) AS total_events FROM events GROUP BY user_id " +
      "ORDER BY total_events DESC, user_id LIMIT 5"))

  private val qUnionNames = Q(
    (s, d) => Ops.unionAll(Seq(
        t(s, d, "customer").select(col("c_name").as("name")),
        t(s, d, "supplier").select(col("s_name").as("name"))))
      .orderBy(col("name")),
    Some("SELECT name FROM (SELECT c_name AS name FROM customer UNION ALL SELECT s_name AS name FROM supplier) ORDER BY name"))

  // =====================================================================
  // headline analytics (bench workhorses; TPC-H-shaped)
  // =====================================================================

  private val q1PricingSummary = Q(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") <= to_timestamp(lit("1998-09-02")))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        (sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double")).as("sum_disc_price"),
        (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        (dsum(col("l_extendedprice")) / count(lit(1))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, " +
      SqlDsum("l_extendedprice") + " AS sum_base_price, " +
      "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price, " +
      "sum(l_quantity) / count(*) AS avg_qty, " +
      SqlDsum("l_extendedprice") + " / count(*) AS avg_price, " +
      "count(*) AS count_order " +
      "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
      "GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"))

  private val q3TopRevenue = Q(
    (s, d) => {
      val cust = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey"))
        .limit(10)
    },
    Some("SELECT o_orderkey, o_orderdate, " +
      "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey " +
      "WHERE c_mktsegment = 'BUILDING' " +
      "GROUP BY o_orderkey, o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10"))

  private val q5RegionRevenue = Q(
    (s, d) => {
      val r = t(s, d, "region").select(col("r_regionkey"), col("r_name"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("n_name"))
    },
    Some("SELECT n_name, r_name, " +
      "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
      "count(*) AS n_items " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey " +
      "JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY n_name, r_name ORDER BY n_name"))

  private val q6RevenueForecast = Q(
    (s, d) => t(s, d, "lineitem")
      .filter(col("l_shipdate") >= to_timestamp(lit("1994-01-01")) &&
        col("l_shipdate") < to_timestamp(lit("1995-01-01")) &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sum((col("l_extendedprice") * col("l_discount")).cast("decimal(18,4)"))
        .cast("double").as("revenue"),
        count(lit(1)).as("n_items")),
    Some("SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue, " +
      "count(*) AS n_items FROM lineitem " +
      "WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00' AND l_shipdate < TIMESTAMP '1995-01-01 00:00:00' " +
      "AND l_discount BETWEEN 0.05e0 AND 0.07e0 AND l_quantity < 24"))

  /** Grouping sets: region/nation revenue with ROLLUP subtotals and a grand
    * total. Grouped-out columns surface as NULL in both engines; ORDER BY
    * needs explicit NULLS FIRST in DuckDB to mirror Spark's asc default. */
  private val qRollupRevenue = Q(
    (s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = t(s, d, "region").select(col("r_regionkey"), col("r_name"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders").select(col("o_custkey"), col("o_totalprice"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup(col("r_name"), col("n_name"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("SELECT r_name, n_name, " + SqlDsum("o_totalprice") + " AS revenue, count(*) AS n_orders " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey " +
      "GROUP BY ROLLUP (r_name, n_name) " +
      "ORDER BY r_name NULLS FIRST, n_name NULLS FIRST"))

  private val qWindowRunning = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          sum(col("value").cast("decimal(18,2)")).over(w).cast("double").as("running_value"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("SELECT user_id, event_id, ts, CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER " +
      "(PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value " +
      "FROM events ORDER BY user_id, ts, event_id"))

  /** Inter-event gaps via lag(): per user, microseconds since the previous
    * event — the session-gap primitive behind sessionization and
    * inactivity analysis. Same single-shuffle window shape as
    * q_window_running; first event per user has a NULL gap. */
  private val qLagGaps = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("SELECT user_id, event_id, ts, " +
      "epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us " +
      "FROM events ORDER BY user_id, ts, event_id"))

  /** Ranking-function suite over one window (rank / dense_rank /
    * percent_rank / ntile): all four share a single partitioning+sort, so
    * Catalyst plans ONE window exchange. The window order carries a
    * c_custkey tie-break — rank() tolerates ties but ntile/percent_rank
    * outputs depend on total order. */
  private val qRankFunctions = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_mktsegment, c_acctbal, " +
      "CAST(rank() OVER w AS BIGINT) AS rnk, " +
      "CAST(dense_rank() OVER w AS BIGINT) AS drnk, " +
      "percent_rank() OVER w AS prnk, " +
      "CAST(ntile(4) OVER w AS BIGINT) AS quartile " +
      "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) " +
      "ORDER BY c_custkey"))

  /** CUBE grouping sets: counts at every (event_type × hour) granularity
    * including both margins and the grand total, in ONE pass — Catalyst
    * expands the cube into a single Expand + aggregate, the reference's
    * "recompute each dashboard tile separately" pattern collapsed into one
    * shuffle. Margin rows are identified by GROUPING(), never by the NULL
    * the cube emits — a genuinely-null data key relabels to its own
    * sentinel, so the margin and the null group can never collide into
    * indistinguishable output rows (which would also break the total-order
    * ORDER BY). */
  private val qCubeCounts = Q(
    (s, d) => t(s, d, "events")
      .select(col("event_type"), hour(col("ts")).cast("long").as("hr"))
      .cube(col("event_type"), col("hr"))
      // grouping() is only resolvable inside the cube's own aggregate
      // projection, so the margin markers are computed here and consumed
      // by the relabeling select below
      .agg(count(lit(1)).as("cnt"),
        grouping(col("event_type")).as("g_et"), grouping(col("hr")).as("g_hr"))
      .select(
        when(col("g_et") === 1, "ALL")
          .otherwise(coalesce(col("event_type"), lit("NULL"))).as("event_type"),
        when(col("g_hr") === 1, -1L)
          .otherwise(coalesce(col("hr"), lit(-2L))).as("hr"),
        col("cnt"))
      .orderBy(col("event_type"), col("hr")),
    Some("SELECT CASE WHEN GROUPING(event_type) = 1 THEN 'ALL' ELSE COALESCE(event_type, 'NULL') END AS event_type, " +
      "CASE WHEN GROUPING(hr) = 1 THEN -1 ELSE COALESCE(hr, -2) END AS hr, count(*) AS cnt " +
      "FROM (SELECT event_type, CAST(extract(hour FROM ts) AS BIGINT) AS hr FROM events) " +
      "GROUP BY CUBE (event_type, hr) ORDER BY event_type, hr"))

  /** Grouped exact quantiles (p50/p95 per event type): Spark `percentile`
    * and DuckDB `quantile_cont` share the same linear-interpolation
    * definition (index p·(n−1), lower + frac·(upper−lower)); round(6)
    * absorbs any final-ulp difference between the two implementations of
    * that arithmetic. Exact percentile needs the group sorted — at corpus
    * scale swap in `approx_percentile` (t-digest, mergeable partial aggs)
    * and keep this as the verification twin. */
  private val qGroupedQuantiles = Q(
    (s, d) => t(s, d, "events")
      .groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.5)"), 6).as("p50"),
        round(expr("percentile(value, 0.95)"), 6).as("p95"),
        count(col("value")).as("n_valued"))
      .orderBy(col("event_type")),
    Some("SELECT event_type, round(quantile_cont(value, 0.5), 6) AS p50, " +
      "round(quantile_cont(value, 0.95), 6) AS p95, count(value) AS n_valued " +
      "FROM events GROUP BY event_type ORDER BY event_type"))

  /** Batch sessionization: a session breaks where the inter-event gap
    * exceeds 30 minutes; session_id = running count of breaks per user
    * (composable windows: lag → flag → cumulative sum, ONE shuffle — all
    * three windows share the same partitioning and sort, so Catalyst plans
    * a single Exchange+Sort). The streaming twin is
    * [[graft.streaming.Streaming.sessionEngagement]] (session_window). */
  private val qSessionize = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val gapUs = unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          when(gapUs.isNull || gapUs > 30L * 60 * 1000000, 1L).otherwise(0L).as("brk"))
        .withColumn("session_id", sum(col("brk")).over(wRun))
        .select(col("user_id"), col("event_id"), col("ts"), col("session_id"))
        .orderBy(col("user_id"), col("ts"), col("event_id"))
    },
    Some("WITH g AS (SELECT user_id, event_id, ts, " +
      "epoch_us(ts) - lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us " +
      "FROM events), " +
      "b AS (SELECT user_id, event_id, ts, " +
      "CASE WHEN gap_us IS NULL OR gap_us > 1800000000 THEN 1 ELSE 0 END AS brk FROM g) " +
      "SELECT user_id, event_id, ts, " +
      "CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id " +
      "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id " +
      "FROM b ORDER BY user_id, ts, event_id"))

  /** Pivot: per-user event-type counts as columns (the dashboard matrix
    * shape). The pivot VALUES are passed explicitly — with an inferred
    * pivot Spark runs an extra distinct scan to discover them, and at
    * scale the value set is schema knowledge, not data. Absent cells are 0,
    * not null (count semantics). */
  private val qPivotEventCounts = Q(
    (s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = t(s, d, "events").groupBy(col("user_id"))
        .pivot("event_type", types).agg(count(lit(1)))
      p.select(col("user_id") +:
          types.map(tp => coalesce(col(tp), lit(0L)).as(s"n_$tp")): _*)
        .orderBy(col("user_id"))
    },
    Some("SELECT user_id, " +
      Seq("click", "error", "purchase", "signup", "view").map(tp =>
        s"CAST(SUM(CASE WHEN event_type = '$tp' THEN 1 ELSE 0 END) AS BIGINT) AS n_$tp")
        .mkString(", ") +
      " FROM events GROUP BY user_id ORDER BY user_id"))

  // =====================================================================
  // registry
  // =====================================================================

  val registry: Seq[(String, Q)] = Seq(
    "q_p1_projection" -> qP1Projection,
    "q_p5_point_lookup" -> qP5PointLookup,
    "q_p6_filter_eq" -> qP6FilterEq,
    "q_p7_kol_gate" -> qP7KolGate,
    "q_p11_null_guard" -> qP11NullGuard,
    "q_f1_influence" -> qF1Influence,
    "q_f2_brand_rename" -> qF2BrandRename,
    "q_f4_filename_epoch" -> qF4FilenameEpoch,
    "q_f5_json_props" -> qF5JsonProps,
    "q_j1_linkage" -> qJ1Linkage,
    "q_j2_dim_enrich" -> qJ2DimEnrich,
    "q_j3_anti" -> qJ3Anti,
    "q_j3_semi" -> qJ3Semi,
    "q_a1_rollup" -> qA1Rollup,
    "q_a2_merge_partials" -> qA2MergePartials,
    "q_a3_histogram" -> qA3Histogram,
    "q_a4_event_histogram" -> qA4EventHistogram,
    "q_a5_global_stats" -> qA5GlobalStats,
    "q_a7_distinct" -> qA7Distinct,
    "q_a8_dedup_first_wins" -> qA8DedupFirstWins,
    "q_a9_engagement_series" -> qA9EngagementSeries,
    "q_t1_top5_influence" -> qT1Top5Influence,
    "q_t2_top5_active" -> qT2Top5Active,
    "q_union_names" -> qUnionNames,
    "q1_pricing_summary" -> q1PricingSummary,
    "q3_top_revenue" -> q3TopRevenue,
    "q5_region_revenue" -> q5RegionRevenue,
    "q6_revenue_forecast" -> q6RevenueForecast,
    "q_rollup_revenue" -> qRollupRevenue,
    "q_window_running" -> qWindowRunning,
    "q_lag_gaps" -> qLagGaps,
    "q_sessionize" -> qSessionize,
    "q_cube_counts" -> qCubeCounts,
    "q_rank_functions" -> qRankFunctions,
    "q_grouped_quantiles" -> qGroupedQuantiles,
    "q_pivot_event_counts" -> qPivotEventCounts,
  ) ++ QueriesTpch.registry ++ QueriesExtras.registry ++
    QueriesRelational.registry ++ QueriesCuration.registry ++
    QueriesAnalytics.registry

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map { case (n, q) =>
      // register library functions into the exact session the driver hands
      // us (SparkSession.active alone could target a different session in a
      // multi-session JVM)
      n -> { (s: SparkSession, d: String) =>
        graft.plans.GraftFunctions.register(s); q.fn(s, d)
      }
    }.toMap

  def oracleSql: Map[String, String] =
    registry.collect { case (n, q) if q.sql.isDefined => n -> q.sql.get }.toMap

}
