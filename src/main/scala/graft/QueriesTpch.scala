package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-shaped relational breadth pack: the classic analytic query shapes
  * (beyond the q1/q3/q5/q6 headliners in [[Queries]]) re-expressed over the
  * driver testdata, each with a DuckDB oracle. The point is PLAN coverage —
  * every shape here exercises a distinct Catalyst capability a reference
  * user would expect from a full analytics engine:
  *
  *  - q2 shape:  per-group argmax via a correlated scalar subquery —
  *               planned as ONE window over the group, not a self-join
  *  - q4 shape:  EXISTS with a non-equi conjunct → left-semi join
  *  - q10 shape: fact-dim-fact join + agg + top-k
  *  - q12 shape: conditional aggregation (CASE inside SUM)
  *  - q14 shape: promo share — two conditional sums in one pass, no re-scan
  *  - q15 shape: agg-of-agg (ties-exact argmax over an aggregated view)
  *  - q16 shape: count(DISTINCT) under a dim filter with IN-list pushdown
  *  - q18 shape: HAVING over a grouped fact, enriched after the filter
  *  - q19 shape: OR-of-ANDs disjunctive predicate — pushdown-hostile shape
  *  - q22 shape: global scalar subquery (broadcast) + anti join
  *  - q11 shape: HAVING against a fraction-of-total global scalar
  *  - q13 shape: left-outer count distribution — zero-match groups survive
  *  - q17 shape: correlated scalar AVG gate → window avg, one shuffle
  *  - q20 shape: chained IN + correlated aggregate threshold → window total
  *  - q21 shape: chained EXISTS/NOT EXISTS multi-correlation → one
  *               per-order aggregation joined back at line grain
  *  - q7 shape:  dual-role dimension (nation ×2) + disjunctive pair filter
  *  - q8 shape:  share-of-total over the deepest join tree (6 tables)
  *  - q9 shape:  profit arithmetic inside the agg over a LIKE-filtered dim
  *
  * Determinism: money sums through DECIMAL (see [[Queries]] header);
  * l_quantity holds integer-valued doubles (exact under double summation in
  * any order, < 2^53), so plain SUM is order-safe there; every query ends
  * in a mirrored total-order ORDER BY.
  */
object QueriesTpch {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def dsum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")
  private val SqlDsum = (x: String) => s"CAST(SUM(CAST($x AS DECIMAL(18,2))) AS DOUBLE)"
  private def revSum(price: Column, disc: Column): Column =
    sum((price * (lit(1.0) - disc)).cast("decimal(18,4)")).cast("double")
  private val SqlRevSum =
    "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE)"

  /** q2 shape — suppliers carrying their nation's maximum account balance.
    * The reference formulation is a correlated scalar subquery (max within
    * the outer row's nation); the Spark-first plan is a single window max
    * over s_nationkey — one shuffle on the group key, no self-join, no
    * correlated re-execution. */
  private val qTop1PerGroup = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("s_nationkey"))
      t(s, d, "supplier")
        .withColumn("nation_max", max(col("s_acctbal")).over(w))
        .filter(col("s_acctbal") === col("nation_max"))
        .select(col("s_suppkey"), col("s_name"), col("s_nationkey"), col("s_acctbal"))
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_name, s_nationkey, s_acctbal FROM supplier s " +
      "WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2 " +
      "WHERE s2.s_nationkey = s.s_nationkey) ORDER BY s_suppkey"))

  /** q4 shape — order-priority checking: orders with at least one line item
    * shipped after the order date, counted by priority. EXISTS with a
    * non-equi conjunct plans as a LEFT SEMI join (shuffle on the order key,
    * the extra predicate evaluated inside the join), then a 5-group agg. */
  private val q4PriorityCheck = Q(
    (s, d) => {
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(li, o("o_orderkey") === li("l_orderkey") &&
          li("l_shipdate") > o("o_orderdate"), "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"))
        .orderBy(col("o_orderpriority"))
    },
    Some("SELECT o_orderpriority, count(*) AS n_orders FROM orders " +
      "WHERE EXISTS (SELECT 1 FROM lineitem " +
      "WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate) " +
      "GROUP BY o_orderpriority ORDER BY o_orderpriority"))

  /** q10 shape — revenue lost to returns, per customer, top 20. The order
    * of operations matters at scale: lineitem is FILTERED to returns before
    * the join (pushdown), aggregated revenue flows through the two joins,
    * and the customer dim is broadcast. */
  private val q10ReturnedRevenue = Q(
    (s, d) => {
      val li = t(s, d, "lineitem").filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("SELECT c_custkey, c_name, " + SqlRevSum + " AS revenue " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey WHERE l_returnflag = 'R' " +
      "GROUP BY c_custkey, c_name ORDER BY revenue DESC, c_custkey LIMIT 20"))

  /** q12 shape — conditional aggregation: per line status, how many items
    * belong to critical-priority orders vs not. One join, one pass, two
    * CASE-sums — the "pivot a flag into two counters" primitive. */
  private val q12PriorityByStatus = Q(
    (s, d) => {
      val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderpriority"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_linestatus"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(sum(when(hi, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(hi, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_linestatus"))
    },
    Some("SELECT l_linestatus, " +
      "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count, " +
      "CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count " +
      "FROM lineitem JOIN orders ON l_orderkey = o_orderkey " +
      "GROUP BY l_linestatus ORDER BY l_linestatus"))

  /** q14 shape — promo revenue share: both the conditional and the total
    * sum come out of ONE aggregation pass (no second scan for the
    * denominator). The part dim is broadcast; the division's operand order
    * is mirrored in the oracle so the double arithmetic is bit-identical. */
  private val q14PromoShare = Q(
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
      val p = t(s, d, "part").select(col("p_partkey"), col("p_type"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO",
              (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("promo_revenue"),
          revSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
        .select(
          (lit(100.0) * col("promo_revenue") / col("total_revenue")).as("promo_share"),
          col("promo_revenue"), col("total_revenue"))
    },
    Some("SELECT 100.0e0 * promo_revenue / total_revenue AS promo_share, promo_revenue, total_revenue FROM (" +
      "SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' " +
      "THEN CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4)) " +
      "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue, " +
      SqlRevSum + " AS total_revenue " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey)"))

  /** q15 shape — the top supplier(s) by shipped revenue: an aggregation
    * (revenue per supplier) consumed twice, once for the global max and
    * once for the final rows. Decimal sums make revenue ties EXACT — the
    * argmax can't flap with partition order. Spark computes the aggregated
    * view once and joins its scalar max back (broadcast); the oracle uses
    * the reference's correlated formulation over a CTE. */
  private val q15TopSupplier = Q(
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      val rev = li.groupBy(col("l_suppkey"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("total_revenue"))
      val mx = rev.agg(max(col("total_revenue")).as("max_revenue"))
      rev.join(broadcast(mx), rev("total_revenue") === mx("max_revenue"))
        .join(broadcast(sup), rev("l_suppkey") === sup("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("WITH rev AS (SELECT l_suppkey, " + SqlRevSum + " AS total_revenue " +
      "FROM lineitem GROUP BY l_suppkey) " +
      "SELECT s_suppkey, s_name, total_revenue FROM rev JOIN supplier ON l_suppkey = s_suppkey " +
      "WHERE total_revenue = (SELECT max(total_revenue) FROM rev) ORDER BY s_suppkey"))

  /** q16 shape — supplier variety per part segment: count(DISTINCT) under a
    * dimension filter with an IN-list. The brand exclusion and size IN-list
    * push into the part scan; the distinct-count shuffles once on the group
    * keys with the supplier key as the distinct child. */
  private val q16SupplierCount = Q(
    (s, d) => {
      val p = t(s, d, "part")
        .filter(col("p_brand") =!= "Brand#45" &&
          col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 49))
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val li = t(s, d, "lineitem").select(col("l_partkey"), col("l_suppkey"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
    },
    Some("SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey " +
      "WHERE p_brand <> 'Brand#45' AND p_size IN (1,4,9,14,19,23,36,49) " +
      "GROUP BY p_brand, p_type, p_size " +
      "ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"))

  /** q18 shape — large-volume orders: HAVING over a grouped fact, customer
    * enrichment AFTER the filter (the group-filter-join order that keeps
    * the join input small at scale — joining first would enrich every order
    * only to discard almost all of them). */
  private val q18LargeOrders = Q(
    (s, d) => {
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_quantity"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_name"))
      val big = li.groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity")).as("total_qty"))
        .filter(col("total_qty") > 150.0)
      big.join(o, big("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
          col("o_totalprice"), col("total_qty"))
        .orderBy(col("o_orderkey"))
    },
    Some("SELECT c_custkey, c_name, o_orderkey, o_totalprice, total_qty FROM " +
      "(SELECT l_orderkey, sum(l_quantity) AS total_qty FROM lineitem " +
      "GROUP BY l_orderkey HAVING sum(l_quantity) > 150.0e0) " +
      "JOIN orders ON l_orderkey = o_orderkey " +
      "JOIN customer ON o_custkey = c_custkey ORDER BY o_orderkey"))

  /** q19 shape — disjunctive (OR-of-ANDs) predicate revenue: the
    * pushdown-hostile shape. The part-side conjuncts can't prune the fact
    * scan, but the common `p_partkey` equi-join still broadcasts, and the
    * disjunction evaluates post-join in one codegen stage. */
  private val q19DisjunctiveRevenue = Q(
    (s, d) => {
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val p = t(s, d, "part").select(col("p_partkey"), col("p_brand"), col("p_size"))
      val cond =
        (col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11) && col("p_size").between(1, 5)) ||
        (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20) && col("p_size").between(1, 10)) ||
        (col("p_brand") === "Brand#34" && col("l_quantity").between(20, 30) && col("p_size").between(1, 15))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .filter(cond)
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"),
          count(lit(1)).as("n_items"))
    },
    Some("SELECT " + SqlRevSum + " AS revenue, count(*) AS n_items " +
      "FROM lineitem JOIN part ON l_partkey = p_partkey WHERE " +
      "(p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11 AND p_size BETWEEN 1 AND 5) OR " +
      "(p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20 AND p_size BETWEEN 1 AND 10) OR " +
      "(p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30 AND p_size BETWEEN 1 AND 15)"))

  /** q22 shape — well-funded customers with no urgent orders: a GLOBAL
    * scalar subquery (the positive-balance average, one row, broadcast to
    * every partition) gates the fact filter, then an anti join removes
    * customers holding any urgent-priority order. (The reference shape
    * anti-joins on order EXISTENCE; in this testdata every customer has
    * orders, which would verify an always-empty result — the priority
    * restriction keeps the identical plan with live rows.) The exact
    * decimal average keeps the threshold — and so the row set — identical
    * at any partitioning. */
  private val q22IdleBalances = Q(
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"), col("c_acctbal"))
      val avgPos = c.filter(col("c_acctbal") > 0.0)
        .agg((dsum(col("c_acctbal")) / count(lit(1))).as("avg_bal"))
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"))
      c.crossJoin(broadcast(avgPos))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    },
    Some("SELECT c_custkey, c_acctbal FROM customer " +
      "WHERE c_acctbal > (SELECT " + SqlDsum("c_acctbal") + " / count(*) " +
      "FROM customer WHERE c_acctbal > 0.0e0) " +
      "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey " +
      "AND o_orderpriority = '1-URGENT') " +
      "ORDER BY c_custkey"))

  /** q13 shape — customer order-count distribution with a join-condition
    * filter: customers with ZERO qualifying orders MUST appear in the
    * c_count=0 group, which is exactly what an inner join would lose. The
    * priority restriction lives in the LEFT OUTER join's ON clause (pushed
    * to the right side before the join — equivalent, and prunes the fact
    * scan); `count(o_orderkey)` counts matches only (NULL-skipping), then a
    * second tiny aggregation folds customers into count-of-counts. */
  private val q13OrderDistribution = Q(
    (s, d) => {
      val c = t(s, d, "customer").select(col("c_custkey"))
      val o = t(s, d, "orders").filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("SELECT c_count, count(*) AS custdist FROM (" +
      "SELECT c_custkey, count(o_orderkey) AS c_count FROM customer " +
      "LEFT OUTER JOIN orders ON c_custkey = o_custkey AND o_orderpriority = '1-URGENT' " +
      "GROUP BY c_custkey) GROUP BY c_count ORDER BY custdist DESC, c_count DESC"))

  /** q17 shape — small-quantity-order revenue: the correlated scalar AVG
    * gate (`l_quantity < 0.5 * avg over the same part`). The reference
    * formulation re-executes a subquery per row; the Spark-first plan is a
    * single window avg over l_partkey — ONE shuffle, no self-join, no
    * re-scan. Brand parts are broadcast before the window so only the
    * relevant partitions shuffle (filtering whole partkey-partitions does
    * not change any per-part average). Determinism: l_quantity sums are
    * integer-valued doubles (exact), revenue goes through DECIMAL, and the
    * threshold's operand order (0.5 * (sum/cnt)) is mirrored in the oracle
    * so the boundary comparison is bit-identical. */
  private val q17SmallQtyRevenue = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("l_partkey"))
      val p = t(s, d, "part").filter(col("p_brand") === "Brand#12").select(col("p_partkey"))
      val li = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
        .withColumn("thr",
          lit(0.5) * (sum(col("l_quantity")).over(w) / count(lit(1)).over(w)))
        .filter(col("l_quantity") < col("thr"))
        .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
          count(lit(1)).as("n_items"))
    },
    Some("SELECT " + SqlDsum("l_extendedprice") + " / 7.0e0 AS avg_yearly, " +
      "count(*) AS n_items FROM lineitem JOIN part ON p_partkey = l_partkey " +
      "WHERE p_brand = 'Brand#12' AND l_quantity < " +
      "(SELECT 0.5e0 * (sum(l_quantity) / count(*)) FROM lineitem l2 " +
      "WHERE l2.l_partkey = p_partkey)"))

  /** q20 shape — dominant suppliers of a part family: the chained
    * IN / correlated-aggregate-threshold shape (the testdata has no
    * partsupp, so the supply relation is lineitem aggregated to
    * (part, supplier) grain — same nesting, live data). A supplier
    * qualifies if, for some 'small%' part, its shipped quantity exceeds
    * 15% of that part's total across all suppliers. Spark plan: one
    * groupBy to supply grain, a window total per part (no second
    * aggregation or self-join — the partition-total is computed in the
    * same shuffle the semi-filtered supply already sits in), then two
    * semi joins. Quantity sums are integer-valued doubles → exact, so the
    * 15% boundary cannot flap with partition order. */
  private val q20DominantSuppliers = Q(
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val wp = Window.partitionBy(col("l_partkey"))
      val qualParts = t(s, d, "part").filter(col("p_name").like("small%"))
        .select(col("p_partkey"))
      val supply = t(s, d, "lineitem")
        .groupBy(col("l_partkey"), col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
      val dominant = supply
        .join(broadcast(qualParts), supply("l_partkey") === qualParts("p_partkey"), "left_semi")
        .withColumn("part_total", sum(col("qty")).over(wp))
        .filter(col("qty") > lit(0.15) * col("part_total"))
        .select(col("l_suppkey"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      sup.join(dominant, sup("s_suppkey") === dominant("l_suppkey"), "left_semi")
        .orderBy(col("s_suppkey"))
    },
    Some("SELECT s_suppkey, s_name FROM supplier WHERE s_suppkey IN (" +
      "SELECT l_suppkey FROM (SELECT l_partkey, l_suppkey, sum(l_quantity) AS qty " +
      "FROM lineitem GROUP BY 1, 2) sp " +
      "WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') " +
      "AND qty > 0.15e0 * (SELECT sum(l_quantity) FROM lineitem l2 " +
      "WHERE l2.l_partkey = sp.l_partkey)) ORDER BY s_suppkey"))

  /** q21 shape — suppliers who kept orders waiting: chained EXISTS /
    * NOT EXISTS with multi-correlation (same order, DIFFERENT supplier).
    * The testdata has no receipt/commit dates, so "late" is shipping more
    * than a year after the order date. The reference formulation is two
    * correlated subqueries per lineitem row; the Spark-first rewrite
    * computes per-order supplier counts ONCE (countDistinct + conditional
    * countDistinct in one aggregation) and joins them back — EXISTS
    * becomes `n_supp >= 2`, NOT EXISTS becomes `n_late_supp = 1` (the row
    * itself is late, so its supplier being the only late one is exactly
    * the NOT-EXISTS-other-late-supplier condition). Keeps lineitem grain
    * throughout, so numwait counts late LINES exactly like the oracle's
    * count(*) over l1. */
  private val q21WaitingSuppliers = Q(
    (s, d) => {
      val o = t(s, d, "orders").filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val j = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .withColumn("late", col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 365 DAYS"))
      val perOrder = j.groupBy(col("l_orderkey").as("po_orderkey"))
        .agg(countDistinct(col("l_suppkey")).as("n_supp"),
          countDistinct(when(col("late"), col("l_suppkey"))).as("n_late_supp"))
      val sup = t(s, d, "supplier").select(col("s_suppkey"), col("s_name"))
      j.filter(col("late"))
        .join(perOrder, col("l_orderkey") === col("po_orderkey"))
        .filter(col("n_supp") >= 2 && col("n_late_supp") === 1)
        .join(broadcast(sup), col("l_suppkey") === sup("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(10)
    },
    Some("SELECT s_name, count(*) AS numwait " +
      "FROM supplier, lineitem l1, orders " +
      "WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey " +
      "AND o_orderstatus = 'F' " +
      "AND l1.l_shipdate > o_orderdate + INTERVAL 365 DAY " +
      "AND EXISTS (SELECT 1 FROM lineitem l2 " +
      "WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey) " +
      "AND NOT EXISTS (SELECT 1 FROM lineitem l3 " +
      "JOIN orders o2 ON o2.o_orderkey = l3.l_orderkey " +
      "WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey " +
      "AND l3.l_shipdate > o2.o_orderdate + INTERVAL 365 DAY) " +
      "GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 10"))

  /** q11 shape — important part stock: per-group value sums gated by a
    * GLOBAL threshold derived from the same aggregate (HAVING sum >
    * fraction-of-total). The last of the 22 classic shapes: unlike q22
    * (scalar gates a ROW filter) the scalar here gates the GROUP filter,
    * and unlike q15 (argmax against the view) the threshold is a scaled
    * mean, so the aggregated view feeds BOTH the scalar and the final rows.
    * Spark computes the per-part view once, derives the one-row threshold
    * from it (broadcast), and filters — no re-aggregation, no self-join.
    * The testdata has no partsupp, so supply value is lineitem's
    * price×quantity restricted to one nation's suppliers (q20's supply
    * mapping). The threshold is 2× the mean per-part value — the
    * scale-invariant form of the reference's `FRACTION × total` (TPC-H
    * scales its fraction by 1/SF for exactly this reason). Determinism:
    * per-row double products mirror operand order, sums go through
    * DECIMAL (exact at any partitioning), and the threshold comparison
    * `2.0 * (total / n)` is mirrored token-for-token in the oracle. */
  private val q11ImportantStock = Q(
    (s, d) => {
      val supp = t(s, d, "supplier")
        .join(broadcast(t(s, d, "nation").filter(col("n_name") === "NATION_18")
          .select(col("n_nationkey"))), col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"))
      val perPart = t(s, d, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"),
          (col("l_extendedprice") * col("l_quantity")).cast("decimal(18,2)").as("v"))
        .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"), "left_semi")
        .groupBy(col("l_partkey"))
        .agg(sum(col("v")).as("value_dec"))
      val thr = perPart.agg(
        (lit(2.0) * (sum(col("value_dec")).cast("double") / count(lit(1)))).as("threshold"))
      perPart.crossJoin(broadcast(thr))
        .filter(col("value_dec").cast("double") > col("threshold"))
        .select(col("l_partkey"), col("value_dec").cast("double").as("value"))
        .orderBy(col("value").desc, col("l_partkey"))
    },
    Some("WITH supp AS (SELECT s_suppkey FROM supplier " +
      "JOIN nation ON s_nationkey = n_nationkey WHERE n_name = 'NATION_18'), " +
      "pp AS (SELECT l_partkey, SUM(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS value_dec " +
      "FROM lineitem WHERE l_suppkey IN (SELECT s_suppkey FROM supp) GROUP BY l_partkey) " +
      "SELECT l_partkey, CAST(value_dec AS DOUBLE) AS value FROM pp " +
      "WHERE CAST(value_dec AS DOUBLE) > " +
      "2.0e0 * ((SELECT CAST(SUM(value_dec) AS DOUBLE) FROM pp) / (SELECT count(*) FROM pp)) " +
      "ORDER BY value DESC, l_partkey"))

  /** q7 shape — volume shipping between two nations, by direction and
    * year: the two-dimension-role join (nation joined TWICE, once through
    * supplier and once through customer) with a disjunctive pair filter.
    * Scale order: both dim sides are pre-filtered to the two nations and
    * broadcast, so ~2/25 of lineitem survives the first (broadcast) join
    * BEFORE the only shuffle (the fact-fact join with orders). */
  private val q7VolumeShipping = Q(
    (s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val sup = t(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_18", "NATION_19"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val cust = t(s, d, "customer")
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .filter(col("n_name").isin("NATION_18", "NATION_19"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_suppkey"),
        col("l_shipdate"), col("l_extendedprice"), col("l_discount"))
      li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_18" && col("cust_nation") === "NATION_19") ||
          (col("supp_nation") === "NATION_19" && col("cust_nation") === "NATION_18"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).cast("long").as("l_year"))
        .agg(revSum(col("l_extendedprice"), col("l_discount")).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("SELECT supp_nation, cust_nation, l_year, " + SqlRevSum + " AS revenue FROM (" +
      "SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation, " +
      "year(l_shipdate) AS l_year, l_extendedprice, l_discount " +
      "FROM supplier JOIN lineitem ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON s_nationkey = n1.n_nationkey " +
      "JOIN nation n2 ON c_nationkey = n2.n_nationkey " +
      "WHERE (n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19') " +
      "OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18')) " +
      "GROUP BY supp_nation, cust_nation, l_year " +
      "ORDER BY supp_nation, cust_nation, l_year"))

  /** q8 shape — national market share: the share-of-total aggregation
    * (conditional numerator and full denominator from ONE pass — the q14
    * primitive) on top of the deepest join tree in the pack (part →
    * lineitem → orders → customer → nation → region, plus the supplier
    * nation as the share dimension). Customer-side region filter and the
    * part-type filter both push to their dim scans and broadcast. */
  private val q8MarketShare = Q(
    (s, d) => {
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      val r = t(s, d, "region").filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      val custAsia = t(s, d, "customer")
        .join(broadcast(n.join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
          .select(col("n_nationkey"))), col("c_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("c_custkey"))
      val sup = t(s, d, "supplier")
        .join(broadcast(n.select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val p = t(s, d, "part").filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      val vol = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(custAsia), col("o_custkey") === col("c_custkey"), "left_semi")
        .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", vol)
            .otherwise(lit(0).cast("decimal(18,4)"))).cast("double").as("nation_volume"),
          sum(vol).cast("double").as("total_volume"))
        .select(col("o_year"),
          (col("nation_volume") / col("total_volume")).as("mkt_share"),
          col("nation_volume"), col("total_volume"))
        .orderBy(col("o_year"))
    },
    Some("SELECT o_year, nation_volume / total_volume AS mkt_share, nation_volume, total_volume FROM (" +
      "SELECT year(o_orderdate) AS o_year, " +
      "CAST(SUM(CASE WHEN n2.n_name = 'NATION_1' " +
      "THEN CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4)) " +
      "ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume, " +
      "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_volume " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN customer ON c_custkey = o_custkey " +
      "JOIN nation n1 ON c_nationkey = n1.n_nationkey " +
      "JOIN region ON n1.n_regionkey = r_regionkey " +
      "JOIN nation n2 ON s_nationkey = n2.n_nationkey " +
      "WHERE r_name = 'ASIA' AND p_type = 'PROMO' " +
      "GROUP BY o_year) ORDER BY o_year"))

  /** q9 shape — product-type profit by nation and year: profit arithmetic
    * inside the aggregation over a part-name LIKE filter (no partsupp in
    * the testdata, so supply cost is retail price × quantity — same
    * expression shape as the reference's ps_supplycost term). The profit
    * expression's two double products and their difference are mirrored
    * verbatim in the oracle before the DECIMAL cast, so the sum is
    * bit-identical at any partitioning. */
  private val q9ProductProfit = Q(
    (s, d) => {
      val p = t(s, d, "part").filter(col("p_name").like("%widget%"))
        .select(col("p_partkey"), col("p_retailprice"))
      val n = t(s, d, "nation").select(col("n_nationkey"), col("n_name"))
      val sup = t(s, d, "supplier")
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("nation"))
      val o = t(s, d, "orders").select(col("o_orderkey"), col("o_orderdate"))
      val li = t(s, d, "lineitem").select(col("l_orderkey"), col("l_partkey"),
        col("l_suppkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val amount = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
        - col("p_retailprice") * col("l_quantity")).cast("decimal(18,4)")
      li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("nation"), year(col("o_orderdate")).cast("long").as("o_year"))
        .agg(sum(amount).cast("double").as("sum_profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("SELECT n_name AS nation, year(o_orderdate) AS o_year, " +
      "CAST(SUM(CAST(l_extendedprice * (1.0e0 - l_discount) " +
      "- p_retailprice * l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_profit " +
      "FROM part JOIN lineitem ON p_partkey = l_partkey " +
      "JOIN supplier ON s_suppkey = l_suppkey " +
      "JOIN orders ON o_orderkey = l_orderkey " +
      "JOIN nation ON s_nationkey = n_nationkey " +
      "WHERE p_name LIKE '%widget%' " +
      // grouped by the raw expressions: the alias `nation` would resolve
      // to the TABLE nation, not the select-list alias
      "GROUP BY n_name, year(o_orderdate) ORDER BY nation, o_year DESC"))

  val registry: Seq[(String, Q)] = Seq(
    "q2_top1_per_group" -> qTop1PerGroup,
    "q4_priority_check" -> q4PriorityCheck,
    "q10_returned_revenue" -> q10ReturnedRevenue,
    "q12_priority_by_status" -> q12PriorityByStatus,
    "q14_promo_share" -> q14PromoShare,
    "q15_top_supplier" -> q15TopSupplier,
    "q16_supplier_count" -> q16SupplierCount,
    "q18_large_orders" -> q18LargeOrders,
    "q19_disjunctive_revenue" -> q19DisjunctiveRevenue,
    "q22_idle_balances" -> q22IdleBalances,
    "q13_order_distribution" -> q13OrderDistribution,
    "q17_small_qty_revenue" -> q17SmallQtyRevenue,
    "q20_dominant_suppliers" -> q20DominantSuppliers,
    "q21_waiting_suppliers" -> q21WaitingSuppliers,
    "q11_important_stock" -> q11ImportantStock,
    "q7_volume_shipping" -> q7VolumeShipping,
    "q8_market_share" -> q8MarketShare,
    "q9_product_profit" -> q9ProductProfit,
  )
}
