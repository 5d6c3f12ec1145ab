package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-out machinery: the knobs a 100 TB deployment turns that small-SF
  * correctness tests never force. Each helper is semantics-preserving (its
  * spec asserts equivalence with the naive plan) so it can be applied to any
  * verified query without re-verification.
  */
object Scale {

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
}
