package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Ops

/** Serving layer (E3) — the reference dashboard's page computations
  * (show.py) as library calls over the derived collections, so a user of
  * the reference can run every page query against this engine.
  *
  * The reference loaded whole Mongo collections into pandas per page
  * (show.py:48-52); here each page is a lazy plan. Call [[cacheBaseTables]]
  * on the base collections first — `.persist()` is the session-scoped
  * analog of the reference's 600 s Streamlit cache (S11); without it every
  * page call rescans its inputs.
  */
object Dashboard {

  /** S11 — persist the base collections a dashboard session serves from. */
  def cacheBaseTables(tables: Seq[DataFrame]): Seq[DataFrame] =
    tables.map(_.persist())

  /** KOL page (show.py:134-190): unwrap project url, join KOLs to projects
    * (J2), per-project filter (P8), global stats (A5), top-5 (T1). */
  def kolProjectJoin(kols: DataFrame, projects: DataFrame): DataFrame = {
    val p = projects.select(col("projectId"),
      from_json(col("twitter"), Tables.twitterSchema).getField("url").as("purl"),
      col("website"))
    kols.join(p, kols("url") === p("purl"), "inner").drop("purl")
  }

  def projectIds(linked: DataFrame): DataFrame =
    linked.select(col("projectId")).distinct()

  def kolsOfProject(linked: DataFrame, projectId: String): DataFrame =
    linked.filter(col("projectId") === lit(projectId))

  def kolStats(kols: DataFrame): DataFrame =
    kols.agg(count(lit(1)).as("n_kols"),
      (sum(col("followersCount").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_followers"),
      max(col("influence_score")).as("max_influence"))

  def topKols(kols: DataFrame, k: Int = 5): DataFrame =
    Ops.topK(kols, k, Seq(col("influence_score").desc, col("_id")))

  /** General page (show.py:193-240): histogram docs (P9/A3/A4), engagement
    * stats (A6), top-5 active (T2). */
  def statsOf(general: DataFrame, statsId: String): DataFrame =
    general.filter(col("_id") === lit(statsId))

  def engagementStats(users: DataFrame): DataFrame =
    users.agg(count(lit(1)).as("n_users"),
      (sum(col("total_tweets").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("avg_tweets"),
      max(col("max_views")).as("max_views"))

  def topActive(users: DataFrame, k: Int = 5): DataFrame =
    Ops.topK(users, k, Seq(col("total_tweets").desc, col("_id")))

  /** Query page (show.py:60-116): point lookups (P5/P6) and the engagement
    * time-series unwrap with numeric-ascending timestamps (F8/T4). */
  def projectLookup(projects: DataFrame, projectId: String): DataFrame =
    projects.filter(col("projectId") === lit(projectId)).limit(1)

  def userLookup(users: DataFrame, userName: String): DataFrame =
    users.filter(col("userName") === lit(userName)).limit(1)

  def tweetsOf(tweets: DataFrame, authorName: String): DataFrame =
    tweets.filter(col("authorName") === lit(authorName))

  /** map<ts,[likes,replies,retweets]> → time-ascending rows (show.py:103-116). */
  def engagementTimeline(userDoc: DataFrame): DataFrame =
    userDoc.select(col("_id"), explode(col("engagementChangeLogs")).as(Seq("ts", "triple")))
      .select(col("_id"), col("ts").cast("long").as("ts"),
        col("triple").getItem(0).as("likes"),
        col("triple").getItem(1).as("replies"),
        col("triple").getItem(2).as("retweets"))
      .orderBy(col("ts"))
}
