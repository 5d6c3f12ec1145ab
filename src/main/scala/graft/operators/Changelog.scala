package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Change-log materialization: the two standard ways a stream of keyed
  * change records becomes a queryable table.
  *
  *  - [[scd2]] keeps ALL versions as validity intervals (slowly-changing
  *    dimension type 2) — the "as of any time" shape.
  *  - [[cdcApply]] keeps the LATEST version per key, honoring deletes —
  *    the snapshot shape (what a CDC sink like Debezium→lake compaction
  *    produces).
  *
  * Both are one shuffle on the key: Spark plans the version ordering as a
  * window over the key partition, so a 100 TB changelog distributes by
  * key with no driver state and no second pass. The version order MUST be
  * total per key (pass a tie-breaker in `seq`) — with a tied order the
  * survivor/interval assignment is engine-dependent by definition.
  */
object Changelog {

  /** SCD2 intervals: one row per version with `valid_from` = its change
    * time, `valid_to` = the NEXT version's change time (null = still
    * current), `is_current` flagging the open interval. `seq` is the total
    * per-key version order, first column doubling as the interval bound. */
  def scd2(changes: DataFrame, key: Seq[String], seq: Seq[String]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(seq.map(col): _*)
    changes
      .withColumn("valid_from", col(seq.head))
      .withColumn("valid_to", lead(col(seq.head), 1).over(w))
      .withColumn("is_current", col("valid_to").isNull)
  }

  /** CDC snapshot: latest record per key wins; keys whose latest record is
    * a delete (`opCol` === `deleteOp`) vanish. One window pass — the
    * row_number and the delete check ride the same key shuffle. */
  def cdcApply(changes: DataFrame, key: Seq[String], seq: Seq[String],
               opCol: Column, deleteOp: String): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*)
      .orderBy(seq.map(c => col(c).desc): _*)
    changes
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && opCol =!= deleteOp)
      .drop("__rn")
  }

  /** SNAPSHOT DIFF — the reconciliation op behind incremental syncs,
    * backfill audits, and replication checks: given two keyed snapshots
    * of the same table, emit the CDC delta that turns `before` into
    * `after` — one row per changed key with op ∈ {insert, update,
    * delete} and every compare column's before/after value side by side.
    * Unchanged keys produce NOTHING (the delta is the point: at 100 TB
    * you ship the diff, not the snapshot).
    *
    * Plan: ONE full-outer key join + a null-safe any-column-differs
    * filter — key-grain shuffle on both snapshots, no window, no
    * driver state. `update` uses null-safe equality (`<=>`) per column,
    * so a null→value or value→null flip is a real update, and keys
    * present in both with identical compare columns vanish from the
    * output. Output columns: key…, op, then `<c>_before`/`<c>_after`
    * per compare column, so downstream MERGE writers see old and new in
    * one row. */
  def snapshotDiff(before: DataFrame, after: DataFrame,
                   key: Seq[String], cols: Seq[String]): DataFrame = {
    require(key.nonEmpty && cols.nonEmpty, "snapshotDiff needs key and compare cols")
    val b = before.select((key ++ cols).map(col): _*)
      .withColumn("__inb", lit(true))
      .select(key.map(col) ++ cols.map(c => col(c).as(s"${c}_before")) :+ col("__inb"): _*)
    val a = after.select((key ++ cols).map(col): _*)
      .withColumn("__ina", lit(true))
      .select(key.map(col) ++ cols.map(c => col(c).as(s"${c}_after")) :+ col("__ina"): _*)
    val anyDiff = cols.map(c => !(col(s"${c}_before") <=> col(s"${c}_after")))
      .reduce(_ || _)
    val op = when(col("__inb").isNull, "insert")
      .when(col("__ina").isNull, "delete")
      .otherwise("update")
    b.join(a, key, "full")
      .filter(col("__inb").isNull || col("__ina").isNull || anyDiff)
      .select(key.map(col) ++ Seq(op.as("op")) ++
        cols.flatMap(c => Seq(col(s"${c}_before"), col(s"${c}_after"))): _*)
  }
}
