package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.Streaming

/** End-to-end Lambda flow on reference-shaped data (SURVEY.md §5.4):
  * raw JSON lake (filename-epoch protocol) → schema'd batch read (E2) →
  * speed-layer transform (E1) → KOL gate + linkage + rollup + histograms,
  * asserting the derived collections against hand-computed goldens.
  */
class LambdaPipelineSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("raw lake -> E1 -> E2 produces the reference's derived collections") {
    val lake = java.nio.file.Files.createTempDirectory("graft_lake")
    // producer wrote one JSON file per record, filename carries ingest epoch
    java.nio.file.Files.writeString(lake.resolve("twitter_users_1700000001.json"),
      """{"_id":"u1","userName":"alice","url":"https://twitter.com/alice","followersCount":200,"statusesCount":30,"friendsCount":50,"blue":true,"location":"VN"}""")
    java.nio.file.Files.writeString(lake.resolve("twitter_users_1700000002.json"),
      """{"_id":"u2","userName":"bob","url":"https://twitter.com/bob","followersCount":10,"statusesCount":10,"friendsCount":500,"blue":false,"location":"VN"}""")
    val rawUsers = Streaming.withFilenameEpoch(
      spark.read.schema(Tables.usersSchema).json(lake.toString))
    assert(rawUsers.select(min($"file_ts")).as[Long].head() == 1700000001L)

    // E1: preprocess + score + gate
    val processed = Pipelines.preprocessUsers(rawUsers, ingestTs = 1700000100L)
    val kols = Pipelines.kolDetect(processed)
    assert(kols.select($"_id").as[String].collect().toSeq == Seq("u1"))
    // brand rename applied before landing (urls now x.com)
    assert(processed.filter($"url".contains("twitter")).count() == 0)

    // E2: linkage + rollup + histograms over the same batch
    val projects = Seq(
      ("p1", """{"id":"t1","url":"https://x.com/alice"}""", "w1")
    ).toDF("projectId", "twitter", "website")
    val tweets = Seq(
      ("u1", Some(10L), Some(4L), Some(1L), Some(2L), 1700000100L),
      ("u1", None, Some(6L), None, None, 1700000100L),
      ("u2", Some(3L), None, None, Some(9L), 1700000100L)
    ).toDF("author", "views", "likes", "replyCounts", "retweetCounts", "timestamp")

    val out = Pipelines.batchRecompute(spark, projects, processed, tweets)
    assert(out("linkage").as[(String, String)].collect().toSeq == Seq(("p1", "u1")))

    val rollup = out("rollup").orderBy($"author").collect()
    assert(rollup(0).getAs[Long]("total_likes") == 10 &&
      rollup(0).getAs[Long]("max_views") == 10 &&
      rollup(0).getAs[Long]("total_tweets") == 2)

    val loc = out("location_stats").as[(String, Long)].collect().toMap
    assert(loc == Map("VN" -> 2L))
    val blue = out("blue_stats").as[(Boolean, Long)].collect().toMap
    assert(blue == Map(true -> 1L, false -> 1L))
  }
}
