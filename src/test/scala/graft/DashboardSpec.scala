package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DashboardSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val kols = Seq(
    ("u1", "alice", "https://x.com/alice", 200, 99.0, 5L),
    ("u2", "bob", "https://x.com/bob", 50, 60.0, 9L),
    ("u3", "carol", "https://x.com/carol", 10, 75.0, 2L)
  ).toDF("_id", "userName", "url", "followersCount", "influence_score", "total_tweets")

  val projects = Seq(
    ("p1", """{"id":"t","url":"https://x.com/alice"}""", "w1"),
    ("p2", """{"id":"t","url":"https://x.com/nobody"}""", "w2")
  ).toDF("projectId", "twitter", "website")

  test("KOL page: join, distinct projects, per-project filter, stats, top-k") {
    val linked = Dashboard.kolProjectJoin(kols, projects)
    assert(Dashboard.projectIds(linked).as[String].collect().toSeq == Seq("p1"))
    assert(Dashboard.kolsOfProject(linked, "p1").select($"_id").as[String].head() == "u1")
    val stats = Dashboard.kolStats(kols).as[(Long, Double, Double)].head()
    assert(stats == ((3L, (200 + 50 + 10) / 3.0, 99.0)))
    assert(Dashboard.topKols(kols, 2).select($"_id").as[String].collect().toSeq == Seq("u1", "u3"))
  }

  test("query page: engagement timeline unwraps map time-ascending") {
    val doc = Seq(("u1", Map("200" -> Seq(5L, 6L, 7L), "100" -> Seq(1L, 2L, 3L))))
      .toDF("_id", "engagementChangeLogs")
    val got = Dashboard.engagementTimeline(doc)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got sameElements Array(("u1", 100L, 1L, 2L, 3L), ("u1", 200L, 5L, 6L, 7L)))
  }

  test("general page: top active + engagement stats") {
    val users = kols.withColumn("max_views", $"total_tweets" * 100)
    assert(Dashboard.topActive(users, 1).select($"_id").as[String].head() == "u2")
    val es = Dashboard.engagementStats(users).as[(Long, Double, Long)].head()
    assert(es == ((3L, 16.0 / 3.0, 900L)))
  }
}
