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

  test("canonicalUrl: strips noise (case/www/port/utm/slash/fragment), keeps the key") {
    import graft.operators.TextAnalysis
    val got = Seq(
      "HTTPS://WWW.Example.COM:443/Docs/p1/?utm_source=a&id=2&utm_campaign=b#frag",
      "https://example.com/Docs/p1?id=2",          // already canonical
      "http://Example.com:80/a/?utm_x=1",          // http default port; query empties
      "https://example.com/Docs/p1?id=3",          // different real param -> different key
      "https://example.com/Docs/P1?id=2",          // path is case-sensitive
      "not a url")
      .toDF("u").select(TextAnalysis.canonicalUrl($"u").as("c")).as[String].collect()
    assert(got(0) == "https://example.com/Docs/p1?id=2")
    assert(got(1) == "https://example.com/Docs/p1?id=2")
    assert(got(2) == "http://example.com/a")
    assert(got(3) == "https://example.com/Docs/p1?id=3")
    assert(got(4) == "https://example.com/Docs/P1?id=2")
    assert(got(5) == "")
  }

  test("F5 JSON parse: valid struct, malformed -> null fields") {
    val got = Seq("""{"id":"1","url":"https://x.com/a"}""", "not json")
      .toDF("twitter")
      .select(Functions.parseJson($"twitter", Tables.twitterSchema).getField("url").as("url"))
      .collect().map(r => Option(r.getString(0)))
    assert(got(0).contains("https://x.com/a") && got(1).isEmpty)
  }
}
