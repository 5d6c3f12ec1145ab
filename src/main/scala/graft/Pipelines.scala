package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Functions
import graft.operators.Ops

/** The reference's two computation pipelines re-expressed as genuine Spark
  * plans over reference-shaped DataFrames (FIXTURES.md §A schemas).
  *
  * E1 (speed layer, consumer1/consumer1.py:155-172): per-record preprocess →
  * fan-out. Here the per-record Python loop becomes one Column pipeline,
  * batch-callable and reused verbatim by the streaming wrapper
  * ([[graft.streaming.Streaming]]) — same code path for batch and stream.
  *
  * E2 (batch layer, consumer2/consumer2.py:300-353): the reference read each
  * micro-batch THREE times and aggregated driver-side after `.collect()`;
  * here each pass is a single Catalyst plan and the three passes share one
  * cached scan.
  */
object Pipelines {

  val KolThreshold = 50.0 // consumer1.py:39

  /** E1 user preprocessing (consumer1.py:94-109): recursive F2 brand rename
    * over the whole record (the reference renames BEFORE projecting, so
    * every string field including `location` is rewritten) + projection +
    * F1 influence score. `ingestTs` is data, not wall-clock (SURVEY.md
    * §7.4-3). */
  def preprocessUsers(users: DataFrame, ingestTs: Long): DataFrame =
    Functions.brandRenameAll(users).select(
      col("_id"), col("userName"), col("url"),
      col("favouritesCount"), col("friendsCount"), col("listedCount"),
      col("mediaCount"), col("followersCount"), col("statusesCount"),
      col("blue"), col("location"),
      Functions.influenceScore(
        col("followersCount"), col("statusesCount"), col("friendsCount"))
        .as("influence_score"),
      lit(ingestTs).as("timestamp"))

  /** E1 projects preprocessing (consumer1.py:75-81): recursive rename then
    * project. `twitter` is a JSON *string* column, so the rename hits its
    * raw text — renamed projects stay url-consistent with renamed users,
    * as the reference's Mongo collections do. */
  def preprocessProjects(projects: DataFrame, ingestTs: Long): DataFrame =
    Functions.brandRenameAll(projects).select(
      col("_id"), col("projectId"), col("twitter"), col("website"),
      lit(ingestTs).as("timestamp"))

  /** E1 tweets preprocessing (consumer1.py:82-93): recursive rename then
    * project the engagement measures. */
  def preprocessTweets(tweets: DataFrame, ingestTs: Long): DataFrame =
    Functions.brandRenameAll(tweets).select(
      col("_id"), col("author"), col("authorName"),
      col("views"), col("likes"), col("replyCounts"), col("retweetCounts"),
      lit(ingestTs).as("timestamp"))

  /** E1 preprocess fan-out keyed by topic (consumer1.py:71-109): the three
    * reference topic flows behind one dispatch, batch- and stream-callable.
    */
  def preprocessTopic(topic: String, df: DataFrame, ingestTs: Long): DataFrame =
    topic match {
      case "projects_social_media" => preprocessProjects(df, ingestTs)
      case "tweets"                => preprocessTweets(df, ingestTs)
      case "twitter_users"         => preprocessUsers(df, ingestTs)
      case other => throw new IllegalArgumentException(
        s"unknown topic '$other' (expected projects_social_media | tweets | twitter_users)")
    }

  /** E1 KOL gate (consumer1.py:135-143): threshold filter + provenance. */
  def kolDetect(preprocessed: DataFrame): DataFrame =
    preprocessed.filter(col("influence_score") >= KolThreshold)
      .withColumn("identified_at", col("timestamp"))
      .withColumn("source", lit("real-time"))

  /** E1 KOL gate, reference DOC shape (consumer1.py:137-150): the KOL
    * document is the RAW record as consumed — `preprocess_data` builds its
    * renamed copy without mutating `data`, and `kol_data = data.copy()` —
    * plus influence_score / identified_at / source. So every raw field the
    * permissive ingest tolerated survives into the KOL collection. */
  def kolDetectRaw(rawUsers: DataFrame, ingestTs: Long): DataFrame =
    rawUsers
      .withColumn("influence_score", Functions.influenceScore(
        col("followersCount"), col("statusesCount"), col("friendsCount")))
      .filter(col("influence_score") >= KolThreshold)
      .withColumn("identified_at", lit(ingestTs))
      .withColumn("source", lit("real-time"))

  /** E2 pass (a) — project↔user linkage J1 (consumer2.py:116-153): parse the
    * `twitter` JSON string, equi-join on url. The reference built two
    * driver-side dicts and intersected; this is the same join as a broadcast
    * hash join (projects is the small side). */
  def linkage(projects: DataFrame, users: DataFrame): DataFrame = {
    val p = projects
      .select(col("projectId"),
        Functions.parseJson(col("twitter"), Tables.twitterSchema).getField("url").as("url"))
      .filter(col("url").isNotNull)
    val u = users.select(col("_id").as("userId"), col("url"))
      .filter(col("url").isNotNull)
    u.join(broadcast(p), "url").select(col("projectId"), col("userId"))
  }

  /** E2 pass (b) — per-author rollup A1 (consumer2.py:159-191): 8-measure
    * grouped aggregate, nulls→0, partial+final hash agg replaces the
    * reference's driver dicts + Mongo $inc/$max. */
  def tweetRollup(tweets: DataFrame): DataFrame = {
    val measures = Seq("views", "likes", "replyCounts", "retweetCounts")
    val aggs =
      measures.map(m => sum(Functions.orZero(col(m))).as(s"total_$m")) ++
        measures.map(m => max(Functions.orZero(col(m))).as(s"max_$m"))
    tweets.groupBy(col("author"))
      .agg(count(lit(1)).as("total_tweets"), aggs: _*)
  }

  /** E2 pass (c) — global histograms A3/A4 (consumer2.py:243-276). */
  def locationStats(users: DataFrame): DataFrame = Ops.histogram(users, "location")
  def blueStats(users: DataFrame): DataFrame = Ops.histogram(users, "blue")

  /** A9 — engagement change log (declared in reference readme.md:15, never
    * implemented there): per (author, ingest window) engagement triple; the
    * map-shaped presentation (ts → [likes, replies, retweets]) the dashboard
    * expects (show.py:104-110) is a final map_from_entries over the
    * relational form, which is what gets verified. */
  def engagementChangeLog(tweets: DataFrame): DataFrame =
    tweets.groupBy(col("author"), col("timestamp"))
      .agg(sum(Functions.orZero(col("likes"))).as("likes"),
        sum(Functions.orZero(col("replyCounts"))).as("replies"),
        sum(Functions.orZero(col("retweetCounts"))).as("retweets"))

  def engagementChangeLogMap(tweets: DataFrame): DataFrame =
    engagementChangeLog(tweets)
      .groupBy(col("author"))
      .agg(map_from_entries(collect_list(struct(
        col("timestamp").cast("string"),
        array(col("likes"), col("replies"), col("retweets"))))).as("engagementChangeLogs"))

  /** Full E2 batch recompute: one cached scan, three passes, no .collect. */
  def batchRecompute(spark: SparkSession, projects: DataFrame, users: DataFrame,
                     tweets: DataFrame): Map[String, DataFrame] = {
    val u = users.cache()
    Map(
      "linkage" -> linkage(projects, u),
      "rollup" -> tweetRollup(tweets),
      "location_stats" -> locationStats(u),
      "blue_stats" -> blueStats(u),
      "engagement" -> engagementChangeLog(tweets))
  }
}
