package graft.operators

import org.apache.spark.sql.{DataFrame, Column, Dataset}
import org.apache.spark.sql.functions._

/** φ-FREQUENT ITEMS by the two-pass MISRA–GRIES construction (Misra &
  * Gries 1982; the mergeable-summaries form of Agarwal et al. 2013) —
  * the heavy-hitters primitive a corpus profiler runs where a full
  * `GROUP BY` is wasteful: find every item whose frequency exceeds
  * n/(k+1) WITHOUT shuffling one row per distinct item.
  *
  *  - PASS 1 (candidate pruning): each partition runs a k-counter
  *    Misra–Gries summary — O(k) state, one pass, no shuffle. MG
  *    guarantees any item with LOCAL frequency > n_p/(k+1) survives its
  *    partition summary, and a globally-(n/(k+1))-heavy item must be
  *    locally heavy in at least one partition (pigeonhole over the
  *    partition sizes), so the union of partition candidates is a
  *    SUPERSET of every qualifying item — ≤ k·partitions rows, bounded
  *    by cluster width, never by the corpus or its vocabulary.
  *  - PASS 2 (exact verification): one broadcast semi-join of the
  *    corpus against the candidate set, one COUNT per candidate, and
  *    the exact threshold filter `cnt·(k+1) > n`.
  *
  * The OUTPUT is therefore exact and deterministic — precisely the
  * items with true count > n/(k+1), with their true counts — even
  * though intermediate candidate sets may vary with partitioning (the
  * per-partition summaries are an internal pruning detail; the
  * guarantee that matters, superset-ness, holds under ANY split — the
  * spec pins this with a partitioning-variance property). That is what
  * makes the row ORACLE-GATEABLE where a raw MG estimate (rows-only,
  * error-bounded) would not be: the DuckDB mirror is just the
  * GROUP-BY-HAVING definition of φ-frequency.
  *
  * `mapPartitions` is justified here the way the [[Multimodal]] codec
  * contract justifies it: per-partition imperative state (the k-counter
  * map) IS the algorithm, and nothing relational expresses "decrement
  * all counters" without materializing the full item histogram MG
  * exists to avoid. */
object HeavyHitters {

  /** One partition's Misra–Gries summary: the surviving candidate keys
    * of a k-counter sweep. Pure function of the iteration order within
    * the partition (deterministic for a deterministic scan). */
  private[graft] def mgCandidates(it: Iterator[String], k: Int): Iterator[String] = {
    val counters = scala.collection.mutable.HashMap.empty[String, Long]
    it.foreach { item =>
      if (counters.contains(item)) counters(item) += 1L
      else if (counters.size < k) counters(item) = 1L
      else {
        // decrement-all; drop zeros (the classic O(1) amortized step)
        val dead = List.newBuilder[String]
        counters.keysIterator.foreach { key =>
          val c = counters(key) - 1L
          if (c == 0L) dead += key else counters(key) = c
        }
        dead.result().foreach(counters.remove)
      }
    }
    counters.keysIterator.toList.iterator
  }

  /** Exact φ-frequent items of `key`: every item with
    * count·(k+1) > n, with its exact count. Output:
    * (item, cnt, n_total), cnt descending then item.
    *
    * DETERMINISTIC-INPUT REQUIREMENT: `df` is evaluated THREE times (the
    * MG candidate sweep, the n_total count, the exact verification
    * counts). For a deterministic plan — any parquet/table scan and
    * deterministic transforms, i.e. every registered caller — the three
    * passes see the same rows and the superset/exactness guarantees
    * hold. A non-deterministic input (an unseeded sample, a changing
    * source, rand()) must be materialized first
    * (`df.localCheckpoint()`): otherwise the passes can disagree and the
    * guarantee silently breaks. Not checkpointed here — that would tax
    * every deterministic caller with an extra materialization job to
    * protect a caller class this repo doesn't have. */
  def frequentItems(df: DataFrame, key: Column, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val spark = df.sparkSession
    import spark.implicits._
    val items: Dataset[String] = df.select(key.cast("string").as("item"))
      .filter(col("item").isNotNull).as[String]
    val cands = items.mapPartitions(it => mgCandidates(it, k))
      .toDF("item").distinct()
    val total = items.groupBy().agg(count(lit(1)).as("n_total"))
    items.toDF("item")
      .join(broadcast(cands), Seq("item"), "left_semi")
      .groupBy(col("item")).agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(k + 1L) > col("n_total"))
      .orderBy(col("cnt").desc, col("item"))
  }
}
