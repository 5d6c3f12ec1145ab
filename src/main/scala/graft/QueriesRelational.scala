package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational-breadth pack beyond the TPC-H shapes in [[QueriesTpch]]:
  * the remaining ANSI-SQL surface a reference user would expect from a
  * complete analytics engine, each with a DuckDB oracle.
  *
  *  - explicit GROUPING SETS (rollup/cube are in [[Queries]]; the free-form
  *    set list is its own Catalyst shape — `Expand` with an arbitrary
  *    projection list, one pass, no union-of-aggregates re-scan)
  *  - INTERSECT / EXCEPT set semantics (distinct-based set ops plan as
  *    left-semi / left-anti over aggregated children, NOT row unions)
  *  - FULL OUTER join reconciliation (both-sides-preserved merge with
  *    coalesced keys — the "compare two pipeline versions" primitive)
  *  - EXISTS as a COLUMN (existence flag on every row, not a filter —
  *    plans as a left join against the distinct key set)
  *  - distribution window functions (ntile / percent_rank / cume_dist)
  *
  * Determinism follows the [[Queries]] header rules: total-order sorts
  * mirrored in the oracle, exact DECIMAL money sums, and window orderings
  * made total with the unique key so tie order cannot flap.
  */
object QueriesRelational {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private val SqlDsum = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"

  /** Free-form GROUPING SETS: revenue by (nation, priority), by nation,
    * and the grand total — one `Expand`-based aggregation pass (NOT a
    * union of three scans; at 100 TB re-scanning the fact per set is the
    * difference between one shuffle and three). Margin rows are relabeled
    * via grouping() exactly like the cube query, so NULL group values and
    * NULL margins cannot collide. */
  private val qGroupingSets = Q(
    (s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders").select(col("o_custkey"), col("o_orderpriority"), col("o_totalprice"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupingSets(
          Seq(Seq(col("n_name"), col("o_orderpriority")), Seq(col("n_name")), Seq()),
          col("n_name"), col("o_orderpriority"))
        .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"),
          grouping(col("n_name")).as("g_n"), grouping(col("o_orderpriority")).as("g_p"))
        .select(
          when(col("g_n") === 1, "ALL").otherwise(col("n_name")).as("nation"),
          when(col("g_p") === 1, "ALL").otherwise(col("o_orderpriority")).as("priority"),
          col("revenue"), col("n_orders"))
        .orderBy(col("nation"), col("priority"))
    },
    Some("SELECT CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nation, " +
      "CASE WHEN GROUPING(o_orderpriority) = 1 THEN 'ALL' ELSE o_orderpriority END AS priority, " +
      SqlDsum("o_totalprice") + " AS revenue, count(*) AS n_orders " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey " +
      "GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), ()) " +
      "ORDER BY nation, priority"))

  /** INTERSECT / EXCEPT set semantics over two derived key sets (customers
    * holding urgent orders vs customers holding low-priority orders).
    * Spark plans set ops as aggregate + left-semi / left-anti — distinct
    * first, so the join inputs are already key-grain (at scale: the semi
    * join shuffles |keys|, not |orders|). Both branches come back in one
    * tagged frame so the single oracle covers both semantics. */
  private val qSetOps = Q(
    (s, d) => {
      def keysOf(p: String): DataFrame =
        t(s, d, "orders").filter(col("o_orderpriority") === p)
          .select(col("o_custkey").as("c_key"))
      val urgent = keysOf("1-URGENT")
      val low = keysOf("5-LOW")
      urgent.intersect(low).withColumn("tag", lit("both"))
        .unionByName(urgent.except(low).withColumn("tag", lit("urgent_only")))
        .select(col("tag"), col("c_key"))
        .orderBy(col("tag"), col("c_key"))
    },
    Some("SELECT 'both' AS tag, c_key FROM (" +
      "SELECT o_custkey AS c_key FROM orders WHERE o_orderpriority = '1-URGENT' " +
      "INTERSECT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') " +
      "UNION ALL SELECT 'urgent_only', c_key FROM (" +
      "SELECT o_custkey AS c_key FROM orders WHERE o_orderpriority = '1-URGENT' " +
      "EXCEPT SELECT o_custkey FROM orders WHERE o_orderpriority = '5-LOW') " +
      "ORDER BY tag, c_key"))

  /** FULL OUTER reconciliation: per-customer revenue from urgent vs
    * low-priority orders, both sides preserved (a customer with only one
    * kind appears with the other side zeroed). The two aggregations reduce
    * to customer grain BEFORE the full join — at scale the outer join
    * shuffles |customers|, not |orders| — and the coalesced key keeps one
    * key column. */
  private val qFullOuterRecon = Q(
    (s, d) => {
      def rev(p: String, out: String): DataFrame =
        t(s, d, "orders").filter(col("o_orderpriority") === p)
          .groupBy(col("o_custkey")).agg(dsum(col("o_totalprice")).as(out))
      val u = rev("1-URGENT", "urgent_rev").withColumnRenamed("o_custkey", "u_key")
      val l = rev("5-LOW", "low_rev").withColumnRenamed("o_custkey", "l_key")
      u.join(l, u("u_key") === l("l_key"), "full_outer")
        .select(
          coalesce(col("u_key"), col("l_key")).as("c_key"),
          coalesce(col("urgent_rev"), lit(0.0)).as("urgent_rev"),
          coalesce(col("low_rev"), lit(0.0)).as("low_rev"))
        .withColumn("delta", col("urgent_rev") - col("low_rev"))
        .orderBy(col("c_key"))
    },
    Some("SELECT COALESCE(u_key, l_key) AS c_key, " +
      "COALESCE(urgent_rev, 0.0e0) AS urgent_rev, COALESCE(low_rev, 0.0e0) AS low_rev, " +
      "COALESCE(urgent_rev, 0.0e0) - COALESCE(low_rev, 0.0e0) AS delta FROM (" +
      "SELECT o_custkey AS u_key, " + SqlDsum("o_totalprice") + " AS urgent_rev " +
      "FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1) u " +
      "FULL OUTER JOIN (" +
      "SELECT o_custkey AS l_key, " + SqlDsum("o_totalprice") + " AS low_rev " +
      "FROM orders WHERE o_orderpriority = '5-LOW' GROUP BY 1) l ON u_key = l_key " +
      "ORDER BY c_key"))

  /** EXISTS as a column: every customer, flagged with whether they hold an
    * urgent order — existence as DATA, not as a filter (the "enrich with a
    * boolean, let downstream decide" shape). Plans as a left join against
    * the DISTINCT urgent key set: the distinct runs first so the join
    * probe is key-grain, and the flag is a null-check on the joined key —
    * no row multiplication even for customers with many urgent orders. */
  private val qExistsFlag = Q(
    (s, d) => {
      val urgent = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey")).distinct()
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("c_acctbal"),
          col("o_custkey").isNotNull.as("has_urgent"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_acctbal, " +
      "EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderpriority = '1-URGENT') AS has_urgent " +
      "FROM customer ORDER BY c_custkey"))

  /** Distribution window functions — ntile(4) / percent_rank / cume_dist
    * over customers within their market segment, by account balance. The
    * window ordering includes the unique key, making it TOTAL: ntile's
    * bucket boundaries and cume_dist's tie plateaus are then identical on
    * any engine and any partitioning (ntile over a tied, non-total order
    * is nondeterministic by definition). One shuffle on the segment key
    * serves all three functions. */
  private val qWindowDist = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("c_mktsegment"))
        .orderBy(col("c_acctbal"), col("c_custkey"))
      t(s, d, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
        .withColumn("quartile", ntile(4).over(w).cast("long"))
        .withColumn("pct_rank", percent_rank().over(w))
        .withColumn("cume", cume_dist().over(w))
        .orderBy(col("c_mktsegment"), col("c_custkey"))
    },
    Some("SELECT c_mktsegment, c_custkey, c_acctbal, " +
      "CAST(ntile(4) OVER w AS BIGINT) AS quartile, " +
      "percent_rank() OVER w AS pct_rank, cume_dist() OVER w AS cume " +
      "FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey) " +
      "ORDER BY c_mktsegment, c_custkey"))

  /** Time-RANGE window frame: per-user rolling 1-hour event count and
    * value sum — `RANGE BETWEEN <interval> PRECEDING AND CURRENT ROW`, the
    * frame shape none of the existing window queries exercise (ROWS frames
    * count rows; RANGE frames cut on the ORDER key's VALUE, so the frame
    * widens and narrows with event density — the standard trailing-window
    * feature for fraud/rate monitoring). The order key is epoch
    * MICROSECONDS (integer, identical in both engines — interval frames
    * on raw timestamps would drag in engine time semantics); value sums
    * pass through DECIMAL(18,4), exact for this data's ≤3-decimal values,
    * so the rolling sum cannot drift with evaluation order. One shuffle
    * on the user key serves both aggregates. */
  private val qRollingRange = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("es"))
        .rangeBetween(-3600000000L, 0L)
      t(s, d, "events")
        .withColumn("es", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"), col("es"),
          count(lit(1)).over(w).as("cnt_1h"),
          sum(col("value").cast("decimal(18,4)")).over(w).cast("double").as("sum_1h"))
        .orderBy(col("user_id"), col("es"), col("event_id"))
    },
    Some("SELECT user_id, event_id, epoch_us(ts) AS es, " +
      "count(*) OVER w AS cnt_1h, " +
      "CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h " +
      "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts) " +
      "RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) " +
      "ORDER BY user_id, es, event_id"))

  /** UNPIVOT (wide → long): the inverse of the pivot query — measure
    * columns melt into (metric, val) rows, the normalization step before
    * generic per-metric aggregation or ML feature long-tables. Map-only
    * (each input row emits one row per measure in the scan stage — no
    * shuffle, no join against a metric dimension). */
  private val qUnpivot = Q(
    (s, d) => t(s, d, "customer")
      .select(col("c_custkey"),
        col("c_acctbal").cast("double").as("acctbal"),
        col("c_nationkey").cast("double").as("nationkey"))
      .unpivot(Array(col("c_custkey")), Array(col("acctbal"), col("nationkey")),
        "metric", "val")
      .orderBy(col("c_custkey"), col("metric")),
    Some("SELECT c_custkey, metric, val FROM (" +
      "SELECT c_custkey, CAST(c_acctbal AS DOUBLE) AS acctbal, " +
      "CAST(c_nationkey AS DOUBLE) AS nationkey FROM customer) " +
      "UNPIVOT (val FOR metric IN (acctbal, nationkey)) " +
      "ORDER BY c_custkey, metric"))

  /** Sort-free exact discrete quantiles
    * ([[graft.operators.Ops.histogramQuantiles]]): value-count histogram +
    * cumulative window over DISTINCT values — the scale twin of
    * `q_grouped_quantiles`' sort-based `percentile` (shuffle bounded by
    * bins, not rows). The oracle derives the same lower-rank element via
    * `row_number`: with ties, the VALUE at any rank is deterministic even
    * though the row is not. */
  private val qHistQuantiles = Q(
    (s, d) => graft.operators.Ops.histogramQuantiles(
        t(s, d, "events"), "event_type", "value", Seq(0.5, 0.95))
      .orderBy(col("event_type")),
    Some("WITH r AS (SELECT event_type, value AS v, " +
      "row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn, " +
      "count(*) OVER (PARTITION BY event_type) AS n " +
      "FROM events WHERE value IS NOT NULL) " +
      "SELECT event_type, " +
      "max(CASE WHEN rn = CAST(floor((n - 1) * 0.5e0) AS BIGINT) + 1 THEN v END) AS p50, " +
      "max(CASE WHEN rn = CAST(floor((n - 1) * 0.95e0) AS BIGINT) + 1 THEN v END) AS p95, " +
      "count(*) AS n_valued FROM r GROUP BY event_type ORDER BY event_type"))

  /** Year-over-year ratio — the BI staple the row-level lag queries don't
    * cover: lag runs over the AGGREGATED grain (nation × year revenue),
    * so the plan is one fact aggregation then a window on the tiny
    * aggregate (the shuffle after the agg moves |nations × years| rows,
    * not the fact). First year per nation has no prior → NULL ratio. The
    * division's operand order is mirrored; revenue is decimal-exact. */
  private val qYoyRevenue = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t(s, d, "orders").select(col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      val w = Window.partitionBy(col("nation")).orderBy(col("yr"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("long").as("yr"))
        .agg(dsum(col("o_totalprice")).as("revenue"))
        .withColumn("prev_revenue", lag(col("revenue"), 1).over(w))
        .withColumn("yoy_ratio", round(col("revenue") / col("prev_revenue"), 6))
        .orderBy(col("nation"), col("yr"))
    },
    Some("WITH agg AS (SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS yr, " +
      SqlDsum("o_totalprice") + " AS revenue " +
      "FROM orders JOIN customer ON o_custkey = c_custkey " +
      "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name, year(o_orderdate)) " +
      "SELECT nation, yr, revenue, " +
      "lag(revenue) OVER w AS prev_revenue, " +
      "round(revenue / lag(revenue) OVER w, 6) AS yoy_ratio " +
      "FROM agg WINDOW w AS (PARTITION BY nation ORDER BY yr) " +
      "ORDER BY nation, yr"))

  /** TRENDING — time-bucketed top-k per group: the top-3 parts by shipped
    * quantity within every ship-month. The composed shape none of the
    * single-window queries cover: aggregate to (bucket, item) grain
    * FIRST (partial+final hash agg — the fact never reaches the window),
    * then rank within the bucket and cut at k. Quantity sums are
    * integer-valued doubles (exact), and the rank order ties on the item
    * key, so the top-3 set cannot flap. */
  private val qTrending = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("month")).orderBy(col("qty").desc, col("l_partkey"))
      t(s, d, "lineitem")
        .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"), col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 3)
        .orderBy(col("month"), col("rank"))
    },
    Some("SELECT month, l_partkey, qty, rank FROM (" +
      "SELECT month, l_partkey, qty, " +
      "CAST(row_number() OVER (PARTITION BY month ORDER BY qty DESC, l_partkey) AS BIGINT) AS rank " +
      "FROM (SELECT strftime(l_shipdate, '%Y-%m') AS month, l_partkey, sum(l_quantity) AS qty " +
      "FROM lineitem GROUP BY 1, 2)) WHERE rank <= 3 ORDER BY month, rank"))

  /** VARIANT — Spark 4's semi-structured type as the ingestion surface for
    * schema-on-read lakes: real event columns are serialized to nested
    * JSON (`to_json` over a struct with a nested object and an array),
    * parsed to a VARIANT (`parse_json` — the binary semi-structured
    * encoding, NOT a schema-fixed struct), and every leaf re-extracted
    * with typed `variant_get` paths (nested object field, array index).
    * The oracle reads the SAME values straight off the source columns —
    * the gate is therefore a LOSSLESSNESS proof: columns → JSON → VARIANT
    * → typed paths returns bit-identical data. Scale shape: wholly
    * scan-stage (serialize/parse/extract are per-row expressions, no
    * shuffle added), which is exactly why VARIANT works at ingest scale —
    * shredding happens at the scan, and only extracted leaves flow on.
    * Doubles are deliberately excluded from the JSON round-trip (their
    * decimal rendering is engine-specific; VariantSpec pins double
    * behavior on the Spark side alone). */
  private val qVariantExtract = Q(
    (s, d) => {
      val j = to_json(struct(
        col("user_id").as("u"),
        col("event_type").as("t"),
        struct(get_json_object(col("props"), "$.k").cast("long").as("k")).as("p"),
        array(col("user_id") % 7, col("user_id") % 3).as("a")))
      t(s, d, "events")
        .select(col("event_id"), parse_json(j).as("v"))
        .select(col("event_id"),
          variant_get(col("v"), "$.u", "bigint").as("u"),
          variant_get(col("v"), "$.t", "string").as("t"),
          variant_get(col("v"), "$.p.k", "bigint").as("k"),
          variant_get(col("v"), "$.a[1]", "bigint").as("a1"))
        .orderBy(col("event_id"))
    },
    Some("SELECT event_id, user_id AS u, event_type AS t, " +
      "CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
      "user_id % 3 AS a1 FROM events ORDER BY event_id"))

  val registry: Seq[(String, Q)] = Seq(
    "q_variant_extract" -> qVariantExtract,
    "q_trending" -> qTrending,
    "q_grouping_sets" -> qGroupingSets,
    "q_hist_quantiles" -> qHistQuantiles,
    "q_yoy_revenue" -> qYoyRevenue,
    "q_rolling_range" -> qRollingRange,
    "q_unpivot" -> qUnpivot,
    "q_setops" -> qSetOps,
    "q_full_outer_recon" -> qFullOuterRecon,
    "q_exists_flag" -> qExistsFlag,
    "q_window_dist" -> qWindowDist,
  )
}
