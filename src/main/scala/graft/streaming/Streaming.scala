package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.Row
import graft.Pipelines

/** Structured Streaming wiring for the reference's speed layer (SURVEY.md
  * §2.8). The reference consumed Kafka record-at-a-time with at-least-once
  * auto-commit (consumer1.py:41-48,155-172) and hand-rolled a batch ledger
  * (consumer2.py:300-348); here the same semantics are micro-batch
  * pipelines with `checkpointLocation` (exactly-once to idempotent sinks —
  * strictly stronger, ST1/ST4) and the hand-rolled ledger is deleted.
  *
  * Batch/stream share the SAME transform functions from [[graft.Pipelines]]
  * — the streaming wrapper only changes the source and sink, never the
  * semantics, so everything verified in batch holds on the stream.
  */
object Streaming {

  /** Speed-layer transform on a streaming users source (E1): preprocess +
    * score. `ingestTs` fixed per run for determinism in tests. */
  def speedLayer(usersStream: DataFrame, ingestTs: Long): DataFrame =
    Pipelines.preprocessUsers(usersStream, ingestTs)

  /** ST5 — the event-time showcase the reference lacks: watermarked tumbling
    * window over event time. Batch twin is q_a9_engagement_series, so the
    * streaming results are checkable against a verified batch plan. */
  def windowedEngagement(events: DataFrame, watermark: String = "10 minutes",
                         win: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(col("user_id"), window(col("ts"), win))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(col("user_id"), col("window.start").as("hour_ts"),
        col("n_events"), col("sum_value"))

  /** S6 insert-if-absent sink (consumer1.py:123-133) as a foreachBatch
    * upsert into a parquet-backed state dir: left-anti join against existing
    * keys, append only new ids — idempotent, so at-least-once replay
    * degrades to exactly-once (first-write-wins, A8).
    *
    * At scale the state table would be a transactional table format keyed
    * by `_id`; the anti-join-then-append shape is identical.
    */
  def insertIfAbsentSink(keyCol: String, stateDir: String)
                        (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    // deterministic intra-batch survivor: total order over the remaining cols
    val tiebreak = batch.columns.filterNot(_ == keyCol) match {
      case Array() => Seq(col(keyCol))
      case rest => rest.toSeq.map(col)
    }
    val deduped = graft.operators.Ops.dedupFirstWins(batch, Seq(keyCol), tiebreak)
    val fresh =
      try {
        val existing = spark.read.parquet(stateDir).select(col(keyCol))
        deduped.join(existing, Seq(keyCol), "left_anti")
      } catch { case _: org.apache.spark.sql.AnalysisException => deduped }
    fresh.write.mode("append").parquet(stateDir)
  }

  /** Wire a streaming DataFrame into the insert-if-absent sink with
    * checkpointing (ST4: replaces the reference's batch_status ledger). */
  def startUpsertStream(df: DataFrame, keyCol: String, stateDir: String,
                        checkpointDir: String): StreamingQuery =
    df.writeStream
      .outputMode(OutputMode.Update())
      .option("checkpointLocation", checkpointDir)
      .foreachBatch(insertIfAbsentSink(keyCol, stateDir) _)
      .trigger(Trigger.AvailableNow())
      .start()

  /** ST3-equivalent file micro-batch source: the reference polled a dir and
    * took ≤6 files per 20 s (consumer2.py:27-28); Spark's file source with
    * maxFilesPerTrigger does the discovery, ordering and bookkeeping. */
  def fileSource(spark: SparkSession, schema: org.apache.spark.sql.types.StructType,
                 path: String, maxFilesPerTrigger: Int = 6): DataFrame =
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .json(path)
}
