package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PipelinesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def usersFixture = Seq(
    // _id, userName, url, fav, friends, listed, media, followers, statuses, blue, location
    ("u1", "alice", Option("https://twitter.com/alice"), 1, 50, 1, 1, Option(200), Option(30), Option(true), Option("VN")),
    ("u2", "bob", Option("https://twitter.com/bob"), 1, 500, 1, 1, Option(10), Option(10), Option(false), Option.empty[String]),
    ("u3", "carol", Option.empty[String], 1, 0, 1, 1, Option.empty[Int], Option.empty[Int], Option.empty[Boolean], Option("VN"))
  ).toDF("_id", "userName", "url", "favouritesCount", "friendsCount", "listedCount",
    "mediaCount", "followersCount", "statusesCount", "blue", "location")

  test("E1 preprocess: rename applied to url, score computed, nulls->0") {
    val got = Pipelines.preprocessUsers(usersFixture, ingestTs = 1700000000L)
    val rows = got.select($"_id", $"url", $"influence_score").orderBy($"_id")
      .collect()
    assert(rows(0).getString(1) == "https://x.com/alice")
    assert(rows(0).getDouble(2) == 200 * 0.5 + 30 * 0.3 - 50 * 0.2) // 99
    assert(rows(2).getDouble(2) == 0.0) // all nulls -> 0
  }

  test("E1 KOL gate keeps only >= 50 with provenance") {
    val kols = Pipelines.kolDetect(Pipelines.preprocessUsers(usersFixture, 1700000000L))
    val got = kols.select($"_id", $"source", $"identified_at").as[(String, String, Long)].collect()
    assert(got sameElements Array(("u1", "real-time", 1700000000L)))
  }

  test("E2 linkage: JSON-parsed url equi-join, null urls dropped") {
    val projects = Seq(
      ("p1", """{"id":"t1","url":"https://x.com/alice"}"""),
      ("p2", """{"id":"t2","url":null}"""),
      ("p3", "malformed")
    ).toDF("projectId", "twitter")
    val users = Seq(("u1", "https://x.com/alice"), ("u2", "https://x.com/bob"))
      .toDF("_id", "url")
    val got = Pipelines.linkage(projects, users).as[(String, String)].collect()
    assert(got sameElements Array(("p1", "u1")))
  }

  test("E2 rollup: 8 measures + count, nulls -> 0") {
    val tweets = Seq(
      ("a1", Some(10L), Some(1L), Some(2L), Some(3L)),
      ("a1", None, Some(5L), None, Some(1L)),
      ("a2", Some(7L), None, None, None)
    ).toDF("author", "views", "likes", "replyCounts", "retweetCounts")
    val got = Pipelines.tweetRollup(tweets).orderBy($"author").collect()
    val a1 = got(0)
    assert(a1.getAs[Long]("total_tweets") == 2)
    assert(a1.getAs[Long]("total_views") == 10 && a1.getAs[Long]("max_views") == 10)
    assert(a1.getAs[Long]("total_likes") == 6 && a1.getAs[Long]("max_likes") == 5)
  }

  test("E1 KOL doc shape: RAW record fields (un-renamed, extras kept) + provenance") {
    // reference consumer1.py:137-150: kol_data = data.copy() — the raw
    // record as consumed (rename happens on preprocess_data's own copy),
    // plus influence_score / identified_at / source
    val raw = usersFixture.withColumn("extra_raw_field", lit("tolerated"))
    val kols = Pipelines.kolDetectRaw(raw, ingestTs = 1700000000L)
    val row = kols.head()
    assert(kols.count() == 1 && row.getAs[String]("_id") == "u1")
    assert(row.getAs[String]("url") == "https://twitter.com/alice") // raw, NOT renamed
    assert(row.getAs[String]("extra_raw_field") == "tolerated")     // permissive ingest survives
    assert(row.getAs[Double]("influence_score") == 99.0)
    assert(row.getAs[Long]("identified_at") == 1700000000L)
    assert(row.getAs[String]("source") == "real-time")
  }

  test("F2 recursive rename reaches struct fields, array elements, map values; null struct stays null") {
    import graft.functions.Functions
    val df = Seq(
      ("d1", Some(("Twitter HQ", Seq("twitter.com", "ok"))), Map("k" -> "Twitter")),
      ("d2", Option.empty[(String, Seq[String])], Map.empty[String, String])
    ).toDF("id", "meta", "m")
    val got = Functions.brandRenameAll(df).orderBy($"id").collect()
    val r1 = got(0)
    assert(r1.getStruct(1).getString(0) == "X HQ")
    assert(r1.getStruct(1).getSeq[String](1) == Seq("x.com", "ok"))
    assert(r1.getMap[String, String](2) == Map("k" -> "X")) // keys untouched, values renamed
    assert(got(1).isNullAt(1)) // null struct not resurrected as a row of nulls
  }

  test("E1 projects preprocess renames inside the twitter JSON string (url-consistent with users)") {
    val projects = Seq(("p1", "pr1", """{"id":"9","url":"https://twitter.com/alice"}""", "https://Twitter.com"))
      .toDF("_id", "projectId", "twitter", "website")
    val gotP = Pipelines.preprocessProjects(projects, 1700000000L).head()
    val gotU = Pipelines.preprocessUsers(usersFixture, 1700000000L)
      .filter($"_id" === "u1").head()
    // the renamed project twitter-url and the renamed user url still join
    val pUrl = get_json_object(lit(gotP.getAs[String]("twitter")), "$.url")
    assert(spark.range(1).select(pUrl).head().getString(0) == gotU.getAs[String]("url"))
    assert(gotP.getAs[String]("website") == "https://X.com")
  }

  test("A9 engagement map shape: ts -> [likes, replies, retweets]") {
    val tweets = Seq(
      ("a1", 100L, 1L, 2L, 3L), ("a1", 100L, 1L, 0L, 0L), ("a1", 200L, 5L, 5L, 5L)
    ).toDF("author", "timestamp", "likes", "replyCounts", "retweetCounts")
    val got = Pipelines.engagementChangeLogMap(tweets)
      .as[(String, Map[String, Seq[Long]])].head()
    assert(got._1 == "a1")
    assert(got._2("100") == Seq(2L, 2L, 3L) && got._2("200") == Seq(5L, 5L, 5L))
  }
}
