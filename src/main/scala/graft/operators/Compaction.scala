package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SMALL-FILE COMPACTION PLANNER — the lakehouse maintenance operator the
  * curation pack (SCD2 / CDC / z-order) was still missing: given a table's
  * FILE INVENTORY (one row per data file with its partition values and
  * size), bin-pack the small files of each partition into target-size
  * rewrite groups and emit a deterministic PLAN TABLE a maintenance job
  * can execute (read each bin's files, write one file, swap). Streaming
  * ingest — including this repo's own near-dup sink, which commits one
  * file per micro-batch by design — accretes exactly the small-file
  * problem this plans away; the 20×250-doc profile in SCALE.md measures
  * scan task time climbing 1.7× from file accretion alone.
  *
  * Packing discipline: per partition, files smaller than `targetBytes`
  * sort by (size DESC, file id) and fill bins by the running-sum cut —
  * `bin = ⌊cumulative-size-before / target⌋` — i.e. NEXT-FIT DECREASING.
  * NFD is the windowed form of greedy bin packing: it is ONE window pass
  * (a single hash exchange on the partition columns), deterministic under
  * any input partitioning, and exactly replayable in plain SQL — which is
  * what makes the plan hash-verifiable cross-engine. (Classic first-fit
  * decreasing keeps per-bin residual state and is inherently sequential;
  * its packing is at best ~11/9 OPT vs NFD's 2×OPT worst case, but a
  * compaction plan optimizes I/O granularity, not bin count — every NFD
  * bin except a partition's last holds ≥ target/2 bytes by construction,
  * which is all a rewrite job needs.) Files already ≥ `targetBytes` are
  * emitted with `bin = -1`: they are left alone, the Iceberg/Delta
  * binpack convention.
  *
  * Output: one row per input file — (partition cols…, file id, size,
  * `bin`, `bin_files`, `bin_bytes`) — where `bin_files`/`bin_bytes`
  * aggregate the file's bin within its partition (bin −1 rows report
  * their own size). `bin_files > 1` is the "worth rewriting" predicate; a
  * single-file bin costs a rewrite and saves nothing, so executors skip
  * it. At 100 TB the inventory is TABLE METADATA (millions of rows, not
  * data): one window + one aggregation over metadata-grain rows. */
object Compaction {

  def plan(files: DataFrame, partCols: Seq[String], fileId: String,
           sizeCol: String, targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val part: Seq[Column] = partCols.map(col)
    val w = Window.partitionBy(part: _*)
      .orderBy(col(sizeCol).desc, col(fileId))
    val small = files.filter(col(sizeCol) < targetBytes)
      .withColumn("__cum",
        coalesce(sum(col(sizeCol)).over(w) - col(sizeCol), lit(0L)))
      .withColumn("bin", floor(col("__cum").cast("double") / targetBytes))
      .drop("__cum")
    val big = files.filter(col(sizeCol) >= targetBytes)
      .withColumn("bin", lit(-1L))
    val wb = Window.partitionBy(part :+ col("bin"): _*)
    small.unionByName(big)
      .withColumn("bin_files",
        when(col("bin") === -1L, lit(1L)).otherwise(count(lit(1)).over(wb)))
      .withColumn("bin_bytes",
        when(col("bin") === -1L, col(sizeCol).cast("long"))
          .otherwise(sum(col(sizeCol)).over(wb).cast("long")))
  }
}
