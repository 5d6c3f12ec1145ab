package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

case class Ev(user_id: Long, ts: Timestamp, value: Double)

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  test("ST5 windowed engagement over MemoryStream matches the batch twin") {
    implicit val sq = spark.sqlContext
    val mem = MemoryStream[Ev]
    val q = Streaming.windowedEngagement(mem.toDF(), watermark = "10 minutes", win = "10 minutes")
      .writeStream.outputMode("complete").format("memory").queryName("eng").start()
    try {
      mem.addData(Ev(1, ts(1), 2.0), Ev(1, ts(2), 3.0), Ev(2, ts(1), 1.0))
      q.processAllAvailable()
      mem.addData(Ev(1, ts(11), 7.0)) // next window
      q.processAllAvailable()
      val got = spark.table("eng")
        .select($"user_id", $"hour_ts", $"n_events", $"sum_value")
        .orderBy($"user_id", $"hour_ts")
        .as[(Long, Timestamp, Long, Double)].collect()
      assert(got sameElements Array(
        (1L, ts(0), 2L, 5.0), (1L, ts(10), 1L, 7.0), (2L, ts(0), 1L, 1.0)))
      // batch twin over the same rows produces the same aggregate
      val batch = Seq(Ev(1, ts(1), 2.0), Ev(1, ts(2), 3.0), Ev(2, ts(1), 1.0), Ev(1, ts(11), 7.0))
        .toDF()
        .groupBy($"user_id", window($"ts", "10 minutes"))
        .agg(count(lit(1)).as("n"), sum($"value".cast("decimal(18,2)")).cast("double").as("sv"))
        .select($"user_id", $"window.start", $"n", $"sv")
        .orderBy($"user_id", $"window.start")
        .as[(Long, Timestamp, Long, Double)].collect()
      assert(batch sameElements got)
    } finally q.stop()
  }

  test("insert-if-absent sink: at-least-once replay degrades to exactly-once") {
    val dir = java.nio.file.Files.createTempDirectory("graft_state").toString + "/state"
    val b1 = Seq(("a", 1), ("b", 2), ("a", 0)).toDF("_id", "v") // intra-batch dup
    Streaming.insertIfAbsentSink("_id", dir)(b1, 0L)
    Streaming.insertIfAbsentSink("_id", dir)(b1, 0L) // full replay of batch
    val b2 = Seq(("b", 99), ("c", 3)).toDF("_id", "v") // cross-batch dup
    Streaming.insertIfAbsentSink("_id", dir)(b2, 1L)
    val got = spark.read.parquet(dir).orderBy($"_id").as[(String, Int)].collect()
    assert(got sameElements Array(("a", 0), ("b", 2), ("c", 3)))
  }

  test("streaming upsert query end-to-end with checkpoint") {
    implicit val sq = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_stream").toString
    val mem = MemoryStream[(String, Int)]
    mem.addData(("x", 1), ("y", 2), ("x", 3))
    val q = Streaming.startUpsertStream(mem.toDF().toDF("_id", "v"), "_id",
      s"$tmp/state", s"$tmp/ckpt")
    q.awaitTermination()
    val got = spark.read.parquet(s"$tmp/state").orderBy($"_id").as[(String, Int)].collect()
    assert(got.map(_._1) sameElements Array("x", "y"))
  }
}
