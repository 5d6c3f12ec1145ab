package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Source/sink format breadth: the lake is parquet, but a complete engine
  * must also ingest/export the interchange formats without corrupting the
  * exact values the oracle gates hash on. The hazard is TIMESTAMPS — this
  * repo's TIMESTAMP_NTZ history (see Tables.normalizeEventTs) plus the
  * text formats' default second/millisecond rendering make micro-grain
  * event times the thing most likely to silently truncate in a
  * CSV/JSON hop. Pinned here: ORC round-trips every table bit-exactly
  * with zero options; CSV/JSON round-trip micro-grain timestamps exactly
  * ONLY under an explicit micros timestampFormat, which is therefore the
  * library's documented export contract for text formats.
  */
class FormatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val d = "/root/testdata/sf0.001"
  private def tmp(tag: String) = Files.createTempDirectory(s"graft_fmt_$tag").toString

  private def sortedRows(df: DataFrame, key: String): Seq[String] =
    df.orderBy(col(key)).collect().map(_.toString).toSeq

  test("ORC round-trips events and lineitem bit-exactly with no options") {
    Seq("events" -> "event_id", "lineitem" -> "l_orderkey").foreach {
      case (t, key) =>
        val base = Tables.load(spark, d, t)
        val out = tmp(s"orc_$t")
        base.write.mode("overwrite").orc(out)
        val back = spark.read.orc(out)
        assert(back.schema == base.schema, s"$t schema drift through ORC")
        assert(sortedRows(back, key) == sortedRows(base, key), s"$t values")
    }
  }

  // the micros format is the contract: default text rendering truncates
  // sub-millisecond event times and the hash gate would flag it downstream
  private val MicrosFmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"

  test("CSV round-trips micro-grain events exactly under the micros contract") {
    val base = Tables.load(spark, d, "events")
    // events carry sub-millisecond timestamps, so the pin is non-vacuous
    assert(base.filter(unix_micros(col("ts")) % 1000 =!= 0).count() > 0)
    val out = tmp("csv_events")
    base.write.mode("overwrite")
      .option("header", "true").option("timestampFormat", MicrosFmt)
      .csv(out)
    val back = spark.read
      .option("header", "true").option("timestampFormat", MicrosFmt)
      .schema(base.schema).csv(out)
    assert(sortedRows(back, "event_id") == sortedRows(base, "event_id"))
  }

  test("JSON round-trips micro-grain events exactly under the micros contract") {
    val base = Tables.load(spark, d, "events")
    val out = tmp("json_events")
    base.write.mode("overwrite")
      .option("timestampFormat", MicrosFmt).json(out)
    val back = spark.read
      .option("timestampFormat", MicrosFmt).schema(base.schema).json(out)
    assert(sortedRows(back, "event_id") == sortedRows(base, "event_id"))
  }

  test("the default text rendering DOES truncate micros — the contract is load-bearing") {
    val base = Tables.load(spark, d, "events")
    val out = tmp("csv_default")
    base.write.mode("overwrite").option("header", "true").csv(out)
    val back = spark.read.option("header", "true").schema(base.schema).csv(out)
    // same row count, but sub-millisecond precision is gone on some rows
    assert(back.count() == base.count())
    assert(sortedRows(back, "event_id") != sortedRows(base, "event_id"))
  }
}
