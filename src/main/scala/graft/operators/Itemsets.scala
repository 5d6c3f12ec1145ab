package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** FREQUENT ITEMSETS, level 2 — the A-priori candidate prune (Agrawal &
  * Srikant, VLDB'94) as a relational plan: find every unordered item
  * PAIR appearing together in at least a `minNum/minDen` fraction of
  * baskets, with the association metrics a recommender reads off
  * (confidence is directional, so the symmetric LIFT ships instead).
  *
  * The A-priori prune is the scale story: a pair's support cannot exceed
  * either item's support, so the within-basket self-join runs ONLY over
  * items that individually pass the threshold (L1). Per-basket work is
  * |basket ∩ L1|² instead of |basket|² — at 100 TB the long tail of
  * rare items (most of any real catalog) never enters the join, and the
  * candidate stream is basket-grain parallel with no global state. The
  * threshold is a FRACTION (support·minDen ≥ n_baskets·minNum, exact
  * integer compare), so the same registered query is scale-free across
  * corpus sizes.
  *
  * Exactness: set semantics per basket (distinct items), all supports
  * exact int64 counts; `lift = support·n_baskets / (s_a·s_b)` is the one
  * per-row double chain (identical operand order in the oracle),
  * rounded to 6.
  *
  * Output: (item_a, item_b, support, support_a, support_b, lift),
  * item_a < item_b, ordered by support desc then items. */
object Itemsets {

  def frequentPairs(df: DataFrame, basket: String, item: String,
                    minNum: Long, minDen: Long): DataFrame = {
    require(minNum > 0 && minDen > 0 && minNum <= minDen,
      s"frequentPairs: need 0 < minNum/minDen <= 1, got $minNum/$minDen")
    val b = df.select(col(basket).as("b"), col(item).as("i"))
      .filter(col("b").isNotNull && col("i").isNotNull)
      .distinct()
    val nB = b.agg(count_distinct(col("b")).as("n_baskets"))
    // L1: the A-priori frontier — items individually frequent
    val l1 = b.groupBy(col("i")).agg(count(lit(1)).as("s"))
      .crossJoin(broadcast(nB))
      .filter(col("s") * minDen >= col("n_baskets") * minNum)
    val bf = b.join(l1.select(col("i"), col("s")), "i")
    // candidate pairs: within-basket self-join over L1 items only
    val pairs = bf.select(col("b"), col("i").as("item_a"), col("s").as("sa"))
      .join(bf.select(col("b"), col("i").as("item_b"), col("s").as("sb")), "b")
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("support"),
        // min == the value (supports are constant per item within the
        // group) — no order-dependence even in appearance
        min(col("sa")).as("support_a"), min(col("sb")).as("support_b"))
      .crossJoin(broadcast(nB))
      .filter(col("support") * minDen >= col("n_baskets") * minNum)
    pairs.select(col("item_a"), col("item_b"), col("support"),
        col("support_a"), col("support_b"),
        round(col("support").cast("double") * col("n_baskets").cast("double") /
          (col("support_a").cast("double") * col("support_b").cast("double")),
          6).as("lift"))
      .orderBy(col("support").desc, col("item_a"), col("item_b"))
  }
}
