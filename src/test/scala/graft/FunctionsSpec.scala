package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Functions

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("F1 influence score: weighted sum, nulls treated as 0") {
    val df = Seq(
      (Some(100), Some(10), Some(50)), // 100*.5 + 10*.3 - 50*.2 = 43
      (None, Some(10), Some(50)),      // 0 + 3 - 10 = -7
      (Some(100), None, None)          // 50
    ).toDF("followers", "statuses", "friends")
    val got = df.select(Functions.influenceScore($"followers", $"statuses", $"friends").as("s"))
      .as[Double].collect()
    assert(got sameElements Array(43.0, -7.0, 50.0))
  }

  test("F2 brand rename: substring semantics hit URLs, case variants") {
    val got = Seq("Twitter says", "visit twitter.com/x", "no brand here")
      .toDF("s").select(Functions.brandRename($"s").as("s")).as[String].collect()
    assert(got sameElements Array("X says", "visit x.com/x", "no brand here"))
  }

  test("F2 is a fixpoint on its own output (apply-once discipline)") {
    val once = Seq("Twitter twitter TwitterTwitter").toDF("s")
      .select(Functions.brandRename($"s").as("s"))
    val twice = once.select(Functions.brandRename($"s").as("s"))
    assert(once.as[String].head() == twice.as[String].head())
  }

  test("F4 filename epoch: parses trailing epoch, malformed -> null") {
    val got = Seq("tweets_1736900000.json", "users_abc.json", "noext_123")
      .toDF("f").select(Functions.filenameEpoch($"f").as("ts"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(got sameElements Array(Some(1736900000L), None, None))
  }

  test("F5 JSON parse: valid struct, malformed -> null fields") {
    val got = Seq("""{"id":"1","url":"https://x.com/a"}""", "not json")
      .toDF("twitter")
      .select(Functions.parseJson($"twitter", Tables.twitterSchema).getField("url").as("url"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("https://x.com/a") && got(1).isEmpty)
  }
}
