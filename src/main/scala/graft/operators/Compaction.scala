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

  /** `partCols = Nil` plans a single un-partitioned directory (one
    * whole-frame window — the inventory is metadata-grain, so the
    * single-partition window is the point, not a hazard). */
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

  // -------------------------------------------------------------------
  // SELECTIVE EXECUTION over a plain parquet directory. Scale.compactDir
  // rewrites the WHOLE table behind a rename-aside swap — correct but
  // O(table) per maintenance run. This executor rewrites ONLY the
  // multi-file bins the planner found (the incremental maintenance a
  // micro-batch sink's one-file-per-batch accretion needs), which means
  // the live directory is edited in place and crash safety needs a
  // WRITE-AHEAD MANIFEST instead of a directory swap:
  //
  //   1. STAGE:  each multi-file bin is rewritten into
  //              `<dir>_binstage/b<bin>/` (the live dir untouched);
  //   2. MANIFEST: `_binstage/_PLAN` — the original file names every
  //              staged bin replaces — is written to a temp name and
  //              RENAMED in (atomic publish: a partial manifest can
  //              never be read as complete);
  //   3. COMMIT: delete the listed originals, then move each staged
  //              file in as `c<bin>-<partname>` (unique by part-file
  //              UUID), then drop the stage dir.
  //
  // Crash windows, repaired by [[recoverDir]] (run at every entry):
  // stage without manifest ⇒ pre-commit crash, stage is debris — drop
  // it; stage WITH manifest ⇒ the commit is REDOne idempotently
  // (delete-if-present, move-unless-present — both phases re-runnable
  // from any prefix). Originals are deleted BEFORE merged files move in,
  // so no reader ever sees a row twice (exactness over availability, the
  // repo's exactly-once bias); the loss window closes at the next
  // recovery because the staged bins still hold every row.
  // -------------------------------------------------------------------

  private def fsOf(spark: org.apache.spark.sql.SparkSession,
                   dir: String): org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Crash repair for [[executeOnDir]]'s commit protocol; safe (and a
    * no-op) on a directory with no pending stage. */
  def recoverDir(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val fs = fsOf(spark, dir)
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_binstage")
    if (!fs.exists(stage)) return
    val manifest = new org.apache.hadoop.fs.Path(stage, "_PLAN")
    if (!fs.exists(manifest)) { fs.delete(stage, true): Unit; return }
    commitStage(fs, new org.apache.hadoop.fs.Path(dir), stage, manifest)
  }

  /** Idempotent commit: every phase re-runnable from any prefix. */
  private def commitStage(fs: org.apache.hadoop.fs.FileSystem,
                          dir: org.apache.hadoop.fs.Path,
                          stage: org.apache.hadoop.fs.Path,
                          manifest: org.apache.hadoop.fs.Path): Unit = {
    val victims = {
      val in = fs.open(manifest)
      try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toList
      finally in.close()
    }
    victims.foreach { name =>
      fs.delete(new org.apache.hadoop.fs.Path(dir, name), false): Unit
    }
    fs.listStatus(stage).filter(_.isDirectory).foreach { binDir =>
      val bin = binDir.getPath.getName.stripPrefix("b")
      fs.listStatus(binDir.getPath)
        .filter(_.getPath.getName.startsWith("part-")).foreach { f =>
          val target = new org.apache.hadoop.fs.Path(dir, s"c$bin-${f.getPath.getName}")
          if (fs.exists(target)) fs.delete(f.getPath, false): Unit
          else if (!fs.rename(f.getPath, target))
            throw new java.io.IOException(s"compaction commit: rename to $target failed")
        }
    }
    fs.delete(stage, true): Unit
  }

  /** Plan and execute a selective compaction of one plain parquet
    * directory: real file sizes from the listing, [[plan]]'s next-fit-
    * decreasing bins, then the stage → manifest → commit protocol above.
    * Single-file and ≥-target bins are never touched (their bytes are
    * never rewritten — the incremental win over a whole-table rewrite).
    * One Spark write per rewritten bin: a maintenance job's cost profile,
    * bounded by the bin count, with every read an explicit file list.
    * Returns (bins rewritten, files removed). Single-writer, like every
    * table-maintenance op; concurrent readers see exact-or-missing rows
    * mid-commit, never duplicates, and recovery restores exactness. */
  def executeOnDir(spark: org.apache.spark.sql.SparkSession, dir: String,
                   targetBytes: Long): (Int, Int) = {
    import spark.implicits._
    recoverDir(spark, dir)
    val fs = fsOf(spark, dir)
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val inv = fs.listStatus(dirPath)
      .filter(f => f.isFile && (f.getPath.getName.startsWith("part-") ||
        f.getPath.getName.startsWith("c")))
      .map(f => (f.getPath.getName, f.getLen)).toSeq
    if (inv.isEmpty) return (0, 0)
    val bins = plan(inv.toDF("file", "size"), Nil, "file", "size", targetBytes)
      .filter(col("bin") >= 0L && col("bin_files") > 1L)
      .select(col("bin"), col("file"))
      .as[(Long, String)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).sorted).toMap
    if (bins.isEmpty) return (0, 0)
    val stage = new org.apache.hadoop.fs.Path(s"${dir}_binstage")
    fs.delete(stage, true): Unit
    bins.toSeq.sortBy(_._1).foreach { case (bin, files) =>
      spark.read.parquet(files.map(f => s"$dir/$f"): _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(s"${dir}_binstage/b$bin")
    }
    // atomic manifest publish: temp write + rename
    val tmp = new org.apache.hadoop.fs.Path(stage, "_PLAN.tmp")
    val out = fs.create(tmp, true)
    try out.write(bins.values.flatten.toSeq.sorted.mkString("\n")
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val manifest = new org.apache.hadoop.fs.Path(stage, "_PLAN")
    if (!fs.rename(tmp, manifest))
      throw new java.io.IOException(s"compaction: manifest publish failed at $manifest")
    commitStage(fs, dirPath, stage, manifest)
    (bins.size, bins.values.map(_.length).sum - bins.size)
  }
}
