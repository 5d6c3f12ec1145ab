package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph analytics over edge DataFrames. Companion to the
  * iterative fixed-point family ([[Clustering.kmeansAssign]],
  * [[Dedup.dupGroups]]): a bounded number of join+aggregate rounds, each
  * round one shuffle keyed by vertex, no driver-side graph state — the
  * plan a 100 TB edge list needs (adjacency stays distributed; only the
  * iteration COUNT is fixed).
  */
object Graph {

  /** PageRank with EXACT arithmetic: ranks live in integer micro-units
    * (scale = 10⁶ = rank 1.0) carried as integer-valued doubles (< 2⁵³,
    * so every sum is exact and order-independent), and every division
    * passes through `floor` — IEEE division is exactly rounded and a
    * ratio of integers bounded away from the next integer by ≥ 1/divisor
    * floors identically in any engine, so the WHOLE iteration is
    * bit-reproducible cross-engine (the kmeans fixed-point argument; see
    * the oracle, which unrolls the same rounds as SQL CTEs).
    *
    * Per round, for each node v:
    *   rank'(v) = floor(scale·(100−d)/100) + floor(d·Σ_{u→v} floor(rank(u)/outdeg(u)) / 100)
    *
    * with damping d in percent. Nodes = every edge endpoint; a node with
    * no OUT-edges contributes nothing (its mass leaks — the standard
    * simplification; feed symmetric edges if the graph should conserve
    * mass). Each round is two shuffles (join ranks onto edge sources,
    * re-aggregate onto destinations); the out-degree table is computed
    * once. Output: (node, rank) in micro-units. */
  def pageRank(edges: DataFrame, iters: Int, dampingPct: Int = 85,
               scale: Long = 1000000L): DataFrame = {
    require(iters >= 1 && dampingPct >= 0 && dampingPct <= 100)
    val e = edges.select(col("src").cast("string"), col("dst").cast("string"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst"))).distinct()
    val outdeg = e.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val base = math.floorDiv(scale * (100L - dampingPct), 100L).toDouble
    var ranks = nodes.withColumn("rank", lit(scale.toDouble))
    (1 to iters).foreach { _ =>
      val contribs = e
        .join(ranks, e("src") === ranks("node"))
        .join(outdeg, "src")
        .select(col("dst"), floor(col("rank") / col("od")).as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_mass"))
      ranks = nodes.join(contribs, nodes("node") === contribs("dst"), "left_outer")
        .select(col("node"),
          (lit(base) + floor(lit(dampingPct.toDouble) * coalesce(col("in_mass"), lit(0.0)) / 100.0))
            .as("rank"))
    }
    ranks.select(col("node"), col("rank").cast("long").as("rank"))
  }
}
