package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Offline inspection of a streaming query's checkpointed state — Spark 4's
  * State Data Source. At 100 TB a stateful pipeline's failure mode is
  * usually IN THE STATE (a key that never times out, a session buffer that
  * grows without bound, skew onto one store partition), and restarting with
  * debug logging is not an option; these readers answer "what is in the
  * store right now" as a plain DataFrame job against the checkpoint files,
  * no running query required, scanning state-store partitions in parallel
  * exactly like any other source.
  *
  * Both readers are BATCH reads of streaming state: safe against a live
  * query (they read committed snapshot files, never the working set) and
  * usable in the same session that runs the query.
  */
object StateInspect {

  /** The keyed state of `checkpoint`'s stateful operator as rows of
    * (key struct, value struct, partition_id) — for
    * `flatMapGroupsWithState` operators like
    * [[Streaming.statefulSessions]], `value` is the state encoder's
    * product schema (the open-session buffer). Defaults to the LATEST
    * committed batch and operator 0; pass options to point elsewhere. */
  def stateStore(spark: SparkSession, checkpoint: String,
                 options: Map[String, String] = Map.empty): DataFrame =
    options.foldLeft(spark.read.format("statestore")) {
      case (r, (k, v)) => r.option(k, v)
    }.load(checkpoint)

  /** The checkpoint's operator/state-store CATALOG — one row per stateful
    * operator per store (operator id + name, store name, partition count,
    * min/max committed batch): the "what state does this pipeline even
    * have" map you need before [[stateStore]], and the quick health check
    * that batches are committing (maxBatchId advances). */
  def stateMetadata(spark: SparkSession, checkpoint: String): DataFrame =
    spark.read.format("state-metadata").load(checkpoint)
}
