package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Table registry over the driver's parquet testdata (TESTDATA.md) plus the
  * reference's logical-table schemas (FIXTURES.md §A) used by the
  * streaming/JSON ingest path and unit tests.
  *
  * Parquet is self-describing, so testdata readers rely on the file schema
  * (Catalyst still prunes columns / pushes filters into the scan). The
  * explicit StructTypes below mirror the reference's declared schemas
  * (reference: consumer2/consumer2.py:78-114) for the schema'd-JSON path
  * (SURVEY.md §2.1 S9), where inference would be a scale hazard: at 100 TB a
  * schema-inference pass is a full extra read of the lake.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** One logical table. Column pruning + predicate pushdown reach the scan
    * because nothing materializes between read and the first transform.
    *
    * `events.ts` arrives in whichever flavor the writer chose, and a real
    * lake has all of them; normalize every flavor to TimestampType (LTZ)
    * here, in ONE place, so the 11 downstream `unix_micros` call sites
    * never see anything else:
    *   - TIMESTAMP(NANOS): Spark's vectorized reader rejects it; read nanos
    *     as long (legacy conf) and truncate to micros with integer
    *     arithmetic — exact, no double round-trip.
    *   - TIMESTAMP_NTZ (plain `timestamp[us]`, e.g. pandas-written parquet
    *     without UTC adjustment): cast to TimestampType — exact under the
    *     repo-wide UTC session timezone (same wall-clock micros). */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/$name.parquet")
      normalizeEventTs(raw)
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize `ts` to TimestampType regardless of source flavor (see
    * [[load]]). Factored out so tests can poison a frame with each flavor
    * and assert every registered temporal query still analyzes. */
  def normalizeEventTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _: TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  def all(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, sfDir, n)).toMap

  // ---------------------------------------------------------------------
  // Reference logical tables (consumer2.py:78-109), used for the JSON/
  // streaming ingest path and fixtures. All nullable = permissive reads.
  // ---------------------------------------------------------------------

  /** projects_social_media (consumer2.py:80-84). `twitter` arrives as a JSON
    * *string* and is parsed with [[twitterSchema]] (consumer2.py:111-114). */
  val projectsSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("projectId", StringType),
    StructField("twitter", StringType),
    StructField("website", StringType),
    StructField("timestamp", LongType)))

  /** Inner schema of the `twitter` JSON string (consumer2.py:111-114). */
  val twitterSchema: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("url", StringType)))

  /** tweets (consumer2.py:86-93). */
  val tweetsSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("author", StringType),
    StructField("authorName", StringType),
    StructField("views", LongType),
    StructField("likes", LongType),
    StructField("replyCounts", LongType),
    StructField("retweetCounts", LongType),
    StructField("timestamp", LongType)))

  /** twitter_users (consumer2.py:95-107). */
  val usersSchema: StructType = StructType(Seq(
    StructField("_id", StringType),
    StructField("userName", StringType),
    StructField("url", StringType),
    StructField("favouritesCount", IntegerType),
    StructField("friendsCount", IntegerType),
    StructField("listedCount", IntegerType),
    StructField("mediaCount", IntegerType),
    StructField("followersCount", IntegerType),
    StructField("statusesCount", IntegerType),
    StructField("blue", BooleanType),
    StructField("location", StringType),
    StructField("timestamp", LongType)))

  /** events.props inner schema (FIXTURES.md §B). */
  val propsSchema: StructType = StructType(Seq(StructField("k", LongType)))
}
