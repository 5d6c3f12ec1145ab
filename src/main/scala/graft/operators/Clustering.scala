package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over an embedding column — clustering as a
  * QUERY, for the corpus-curation jobs that need cluster ids in a pipeline
  * (semantic dedup by cluster, diversity-balanced sampling, IVF-style
  * sharding) rather than a fitted model object.
  *
  * The twist that makes it gate-able: FIXED-POINT arithmetic. Vectors are
  * quantized to integers (trunc(x·10⁶), the same quantization the LSH
  * oracle uses), distances are exact int64 sums of squares, and centroid
  * updates floor-divide integer sums — so every assignment and every
  * centroid is EXACTLY representable and bit-identical in any engine at
  * any partitioning. Float k-means results depend on summation order;
  * this one is deterministic by construction, which is also what you want
  * from a 100 TB curation job that must be reproducible run-to-run.
  * (The /1e6 quantization error is far below any distance that matters
  * for clustering unit-scale embeddings.)
  *
  * Scale shape per iteration:
  *  - assignment: centroids ship as LITERALS inside one codegen'd
  *    projection (k·dim doubles — metadata, like [[IvfIndex]]'s probe) —
  *    a map-only pass, no shuffle, no join;
  *  - update: posexplode to (cluster, dim) grain then ONE partial+final
  *    hash aggregation — k·dim result rows regardless of corpus size.
  *    The k·dim driver collect per iteration is bounded index metadata
  *    (512 values at k=8, dim=64), never corpus rows.
  * The quantized projection is localCheckpoint'ed once so the `iters`
  * passes re-scan a materialized narrow table, not the source plan.
  *
  * Empty-cluster rule: a cluster that captures no points keeps its
  * previous centroid (the standard Lloyd fallback), mirrored in the
  * oracle via LEFT JOIN + COALESCE.
  */
object Clustering {

  /** trunc-toward-zero integer quantization, mirroring the oracle's
    * `CAST(trunc(x * 1000000e0) AS BIGINT)` (long cast truncates). */
  private def quantize(vec: Column, scale: Double): Column =
    transform(vec.cast("array<double>"), x => (x * scale).cast("long"))

  /** Nearest-centroid assignment via the native codegen expression
    * [[graft.plans.ArgminDist2]] (exact integer distances, ties → smallest
    * cluster id — the semantics of the k-column `aggregate(zip_with(...))`
    * + `array_position(ds, array_min(ds))` construction it replaces, which
    * ran interpreted per centroid per row and made the assignment pass the
    * most expensive query in the bench). One tight generated loop over the
    * cached centroid matrix; returns (cluster, dist2) field columns. */
  private def assignCols(centroids: Array[Array[Long]]): (Column, Column) = {
    graft.plans.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    val s = call_function("argmin_dist2", col("__qv"),
      typedlit(centroids.flatten.toIndexedSeq), lit(centroids.length))
    (s.getField("cluster"), s.getField("dist2").cast("long"))
  }

  /** Lloyd's k-means, `iters` iterations from deterministic seeds (the k
    * rows with the smallest `id`). Returns `(id, cluster, dist2)`:
    * cluster = 0-based index of the nearest final centroid, dist2 = exact
    * squared quantized distance to it.
    *
    * `memoKey` (the [[graft.operators.StateCache]] trained-model-family
    * contract): when set, the TRAINING — the checkpointed quantized
    * projection plus the `iters` collect-update rounds — runs once per
    * (corpus fingerprint, parameters) and every sibling consumer
    * (assignment, SemDeDup, balanced sampling, silhouette) reuses the
    * centroids; the assignment pass itself is a cheap codegen scan and
    * is re-planned per caller. The fixed-point training is deterministic,
    * so memoization cannot change any result — only who pays the
    * collect rounds. */
  def kmeansAssign(emb: DataFrame, id: String, vec: String,
                   k: Int, iters: Int, scale: Double = 1e6,
                   memoKey: Option[String] = None): DataFrame =
    kmeansFit(emb, id, vec, k, iters, scale, memoKey)._2

  /** Assignment-only pass against FROZEN centroids (a serving/monitoring
    * shape: the codebook was trained elsewhere — [[kmeansFit]], a
    * published index, a reference snapshot — and new rows are scored
    * without retraining). Same quantization and [[graft.plans
    * .ArgminDist2]] tie-break as the training pass, so a row re-assigned
    * against the centroids kmeansFit returned lands in the identical
    * cluster. Map-only codegen scan: no shuffle, streaming-safe. */
  def assignToCentroids(emb: DataFrame, id: String, vec: String,
                        centroids: Array[Array[Long]],
                        scale: Double = 1e6): DataFrame = {
    require(centroids.nonEmpty, "assignToCentroids: need >= 1 centroid")
    val q = emb.filter(col(vec).isNotNull)
      .select(col(id), quantize(col(vec), scale).as("__qv"))
    val (cluster, d2) = assignCols(centroids)
    q.select(col(id), cluster.as("cluster"), d2.as("dist2"))
  }

  /** [[kmeansAssign]] plus the final quantized centroids — for consumers
    * that need the codebook itself (PQ's anchor lookup table), not just the
    * assignment. centroids(c)(i) is exact fixed-point (·scale). */
  def kmeansFit(emb: DataFrame, id: String, vec: String,
                k: Int, iters: Int, scale: Double = 1e6,
                memoKey: Option[String] = None): (Array[Array[Long]], DataFrame) =
    memoKey match {
      case Some(key) =>
        Scale.memo(s"$key:kmeansfit", emb.sparkSession)(
          kmeansFitBuild(emb, id, vec, k, iters, scale))
      case None => kmeansFitBuild(emb, id, vec, k, iters, scale)
    }

  private def kmeansFitBuild(emb: DataFrame, id: String, vec: String,
                             k: Int, iters: Int, scale: Double): (Array[Array[Long]], DataFrame) = {
    require(k > 0 && iters > 0, s"need k > 0 and iters > 0, got k=$k iters=$iters")
    val q = emb.filter(col(vec).isNotNull)
      .select(col(id), quantize(col(vec), scale).as("__qv"))
      .localCheckpoint()
    val seeds: Array[Array[Long]] = q.orderBy(col(id)).limit(k)
      .select(col("__qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    require(seeds.length == k, s"corpus has ${seeds.length} rows, need k=$k seeds")
    var centroids = seeds
    for (_ <- 1 to iters) {
      val (cluster, _) = assignCols(centroids)
      val sums = q.select(cluster.as("__c"), posexplode(col("__qv")).as(Seq("__pos", "__x")))
        .groupBy(col("__c"), col("__pos"))
        .agg(sum(col("__x")).as("__sx"), count(lit(1)).as("__n"))
        .collect() // k·dim rows: index metadata, not corpus data
      val byCluster = sums.groupBy(_.getInt(0))
      centroids = centroids.zipWithIndex.map { case (prev, c) =>
        byCluster.get(c).fold(prev) { rows => // empty cluster keeps its centroid
          val next = prev.clone()
          rows.foreach { r =>
            // floor(sum/count) in double: exact for |sum| < 2^53, and the
            // quotient can't sit within an ulp of an integer (denominator
            // bounds the fractional part away from 0), so the floor is the
            // true integer mean — identical in any engine
            next(r.getInt(1)) = math.floor(r.getLong(2).toDouble / r.getLong(3)).toLong
          }
          next
        }
      }
    }
    val (cluster, d2) = assignCols(centroids)
    (centroids, q.select(col(id), cluster.as("cluster"), d2.as("dist2")))
  }

  /** SIMPLIFIED SILHOUETTE (Hruschka et al.'s centroid-distance variant of
    * Rousseeuw 1987) — the cluster-quality audit a curation pipeline runs
    * after [[kmeansFit]] before trusting cluster ids for semantic dedup or
    * balanced sampling: per point, a(i) = distance to its OWN centroid and
    * b(i) = distance to the nearest OTHER centroid, s(i) = (b−a)/max(a,b)
    * ∈ [−1, 1] (NULL when the point sits exactly on two centroids —
    * max(a,b) = 0). Unlike the full silhouette's O(n²) pairwise form, the
    * centroid form is O(n·k): both distances come from ONE pass of the
    * [[graft.plans.Top2Dist2]] codegen expression over the same quantized
    * vectors the clustering used — a map-only scan, no join, no shuffle
    * beyond the final k-row aggregation.
    *
    * Determinism: distances are exact integer dist², √ is exactly rounded,
    * and the per-point score is rounded to 9 places BEFORE the cross-row
    * mean so the aggregation runs on exact DECIMAL(18,9) sums — associative
    * and bit-identical in any engine at any partitioning (the repo's
    * standard exact-mean construction).
    *
    * Returns one row per cluster: (cluster, n_points, avg_silhouette,
    * min_silhouette, max_silhouette). Low/negative averages mark clusters
    * whose members sit closer to a neighboring centroid — the k-was-wrong
    * signal. */
  def silhouette(emb: DataFrame, id: String, vec: String,
                 k: Int, iters: Int, scale: Double = 1e6,
                 memoKey: Option[String] = None): DataFrame = {
    require(k >= 2, s"silhouette needs k >= 2, got $k")
    val (centroids, _) = kmeansFit(emb, id, vec, k, iters, scale, memoKey)
    graft.plans.GraftFunctions.register(org.apache.spark.sql.SparkSession.active)
    val q = emb.filter(col(vec).isNotNull)
      .select(col(id), quantize(col(vec), scale).as("__qv"))
    val t2 = call_function("top2_dist2", col("__qv"),
      typedlit(centroids.flatten.toIndexedSeq), lit(k))
    val a = sqrt(col("__a2").cast("double"))
    val b = sqrt(col("__b2").cast("double"))
    val s = when(greatest(a, b) > 0.0, round((b - a) / greatest(a, b), 9))
    q.select(t2.getField("cluster").as("cluster"),
        t2.getField("dist2").cast("long").as("__a2"),
        t2.getField("dist2b").cast("long").as("__b2"))
      .select(col("cluster"), s.as("__s"))
      .groupBy(col("cluster"))
      .agg(count(lit(1)).as("n_points"),
        round(sum(col("__s").cast("decimal(18,9)")).cast("double") /
          count(col("__s")).cast("double"), 6).as("avg_silhouette"),
        min(col("__s")).as("min_silhouette"),
        max(col("__s")).as("max_silhouette"))
  }
}
