package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.{StateInspect, Streaming}

class StateInspectSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(min: Int): Timestamp = new Timestamp(min * 60L * 1000L)

  test("statestore reader sees exactly the open sessions; metadata catalogs the operator") {
    implicit val sq = spark.sqlContext
    val ckpt = Files.createTempDirectory("graft_state_inspect").toString
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Streaming.statefulSessions(mem.toDS(),
        watermark = "5 minutes", gapMs = 10L * 60 * 1000)
      .writeStream.outputMode("append").format("memory")
      .queryName("state_inspect_sessions")
      .option("checkpointLocation", ckpt).start()
    try {
      // three users, all sessions still open (final watermark :15 = :20−5
      // closes nothing: the oldest session's timeout is :06+10 = :16):
      // user 1 has TWO open sessions (the :06→:18 jump exceeds the 10-min
      // gap), users 2 and 3 one each
      mem.addData((1L, ts(5)), (1L, ts(6)), (2L, ts(7)))
      q.processAllAvailable()
      mem.addData((1L, ts(18)), (3L, ts(19)), (3L, ts(20)))
      q.processAllAvailable()
      assert(spark.table("state_inspect_sessions").isEmpty) // nothing closed

      // the state store IS the source of truth for what's open — read it
      // offline and reconstruct (user -> open sessions with event counts)
      // value wraps the user schema: struct<groupState: SessionBuf,
      // timeoutTimestamp> for flatMapGroupsWithState operators
      val state = StateInspect.stateStore(spark, ckpt)
        .select(col("key.value").as("user_id"),
          explode(col("value.groupState.sessions")).as("s"))
        .select(col("user_id"), col("s.start"), col("s.lastTs"), col("s.n"))
        .as[(Long, Long, Long, Long)].collect().toSet
      def us(min: Int): Long = min * 60L * 1000000L
      assert(state == Set(
        (1L, us(5), us(6), 2L), (1L, us(18), us(18), 1L),
        (2L, us(7), us(7), 1L), (3L, us(19), us(20), 2L)))

      // catalog: one flatMapGroupsWithState operator on one default store;
      // maxBatchId only bounds progress from below (processAllAvailable
      // appends no-data timeout batches beyond the two data batches)
      val meta = StateInspect.stateMetadata(spark, ckpt)
        .select("operatorId", "operatorName", "stateStoreName", "maxBatchId")
        .as[(Long, String, String, Long)].collect()
      assert(meta.length == 1)
      val (opId, opName, storeName, maxBatch) = meta.head
      assert(opId == 0L && opName == "flatMapGroupsWithState"
        && storeName == "default" && maxBatch >= 1L)

      // closing user 2's session via watermark advance must EVICT it from
      // the store: state reflects emission, not history
      mem.addData((2L, ts(60)))
      q.processAllAvailable()
      mem.addData((2L, ts(61))) // second batch applies the raised watermark
      q.processAllAvailable()
      val users = StateInspect.stateStore(spark, ckpt)
        .select(col("key.value").as("u"), explode(col("value.groupState.sessions")))
        .select(col("u")).distinct().as[Long].collect().toSet
      // sessions ending by :20 all timed out under watermark :55; only
      // user 2's fresh :60-:61 session remains open
      assert(users == Set(2L))
      assert(spark.table("state_inspect_sessions").count() == 4L)
    } finally q.stop()
  }
}
