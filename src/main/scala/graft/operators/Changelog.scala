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
}
