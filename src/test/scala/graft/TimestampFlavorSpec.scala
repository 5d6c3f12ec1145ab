package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift guard (round-8 postmortem): a testdata regeneration flipped
  * `events.ts` from TIMESTAMP(NANOS) to TIMESTAMP_NTZ and silently orphaned
  * every `unix_micros` call site at analysis time — 9 queries gone from the
  * round without a single wrong answer. This spec makes that class of drift
  * un-ignorable: the SAME registry the driver runs must *analyze* against
  * events data written in every parquet timestamp flavor a real lake emits.
  *
  * Analysis-only (`queryExecution.analyzed`), not execution: the breakage
  * mode is DATATYPE_MISMATCH at analysis, and analysis of all ~170 queries
  * is cheap enough to run per flavor.
  */
class TimestampFlavorSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  /** A temp sf dir identical to sf0.001 except `events.ts` carries the given
    * flavor. LTZ = isAdjustedToUTC micros (Spark's own default write); NTZ =
    * plain `timestamp[us]` (what pandas writes without UTC adjustment — the
    * round-8 poison). */
  private def flavorDir(flavor: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft_ts_$flavor").toString
    for (n <- Tables.names) {
      val df = Tables.load(spark, "/root/testdata/sf0.001", n)
      val out =
        if (n == "events" && flavor == "ntz")
          df.withColumn("ts", col("ts").cast(TimestampNTZType))
        else df
      out.write.mode("overwrite").parquet(s"$dir/$n.parquet")
    }
    dir
  }

  for (flavor <- Seq("ltz", "ntz")) {
    test(s"every registered query analyzes against $flavor-flavored events") {
      val dir = flavorDir(flavor)
      // verify the fixture really carries the flavor under test (a cast that
      // silently didn't round-trip through parquet would void the spec)
      val readBack = spark.read.parquet(s"$dir/events.parquet").schema("ts").dataType
      val expected = if (flavor == "ntz") TimestampNTZType else TimestampType
      assert(readBack == expected, s"fixture wrote $readBack, wanted $expected")
      val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try { fn(spark, dir).queryExecution.analyzed; None }
        catch { case e: Throwable =>
          Some(s"$name: ${Option(e.getMessage).getOrElse(e.toString).linesIterator.take(2).mkString(" ")}")
        }
      }
      assert(failures.isEmpty, s"queries failing analysis on $flavor events:\n${failures.mkString("\n")}")
    }
  }

  test("normalizeEventTs yields identical micros for all three source flavors") {
    import spark.implicits._
    val micros = Seq(1700000000000000L, 1700000123456789L)
    val ltz = micros.toDF("us").select(timestamp_micros($"us").as("ts"))
    val ntz = ltz.select($"ts".cast(TimestampNTZType).as("ts"))
    val nanosAsLong = micros.map(_ * 1000).toDF("ts") // TIMESTAMP(NANOS) read as long
    def microsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] = {
      val out = Tables.normalizeEventTs(df)
      assert(out.schema("ts").dataType == TimestampType)
      out.select(unix_micros($"ts")).as[Long].collect().toSeq.sorted
    }
    assert(microsOf(ltz) == micros.sorted)
    assert(microsOf(ntz) == micros.sorted)
    assert(microsOf(nanosAsLong) == micros.sorted)
  }
}
