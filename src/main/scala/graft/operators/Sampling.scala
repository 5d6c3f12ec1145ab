package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling / dataset-split assignment for training-data
  * pipelines.
  *
  * A training corpus needs train/val/test membership that is (a) stable
  * across reruns and cluster layouts — `df.sample()` depends on partition
  * layout and reshuffles every run, so a doc could silently migrate from
  * test to train between pipeline versions (leakage); (b) a pure per-row
  * function — no shuffle, no state, applies identically on a 100 TB corpus
  * or a stream; (c) portable — the same (id, salt) lands in the same split
  * in ANY engine, so downstream consumers can re-derive membership.
  *
  * The hash is the repo's portable construction (first 8 hex of md5 →
  * bigint; identical in Spark and DuckDB), salted so independent pipelines
  * draw independent assignments.
  */
object Sampling {

  /** Uniform bucket in [0, buckets) from a salted portable hash of the id. */
  def hashBucket(id: Column, salt: String, buckets: Int): Column =
    conv(substring(md5(concat(id.cast("string"), lit(salt))), 1, 8), 16, 10)
      .cast("long") % buckets

  /** Stable percentage sample: keeps ids whose bucket falls below `pct`
    * (of 100). Map-only — the filter pushes to the scan stage. */
  def sampleByHash(df: DataFrame, id: String, pct: Int,
                   salt: String = "graft"): DataFrame =
    df.filter(hashBucket(col(id), salt, 100) < pct)

  /** Stratified sample: a different keep-percentage per stratum (e.g.
    * downsample dominant languages, keep all of rare ones — the standard
    * corpus-rebalancing move). Same per-row portable hash, so membership
    * stays stable and nested across pct changes; strata missing from
    * `pcts` fall back to `defaultPct`. Map-only, no shuffle: the strata
    * percentages compile into one CASE expression. */
  def stratifiedSampleByHash(df: DataFrame, id: String, stratum: String,
                             pcts: Map[String, Int], defaultPct: Int = 100,
                             salt: String = "graft"): DataFrame = {
    val pctCol = pcts.toSeq.sortBy(_._1).foldRight(lit(defaultPct)) {
      case ((k, p), rest) => when(col(stratum) === k, p).otherwise(rest)
    }
    df.filter(hashBucket(col(id), salt, 100) < pctCol)
  }

  /** Split assignment by cumulative percentage cuts (must sum to 100).
    * Adds `bucket` (0-99) and `split` columns; every id maps to exactly one
    * split, forever, on any engine. */
  def splitAssign(df: DataFrame, id: String,
                  cuts: Seq[(String, Int)] = Seq("train" -> 80, "val" -> 10, "test" -> 10),
                  salt: String = "graft"): DataFrame = {
    require(cuts.map(_._2).sum == 100, s"split cuts must sum to 100: $cuts")
    val b = hashBucket(col(id), salt, 100)
    val boundaries = cuts.scanLeft(0)(_ + _._2).tail // cumulative upper bounds
    val assign = cuts.zip(boundaries).init.foldRight(lit(cuts.last._1)) {
      case (((name, _), upper), rest) => when(b < upper, name).otherwise(rest)
    }
    df.withColumn("bucket", b).withColumn("split", assign)
  }
}
