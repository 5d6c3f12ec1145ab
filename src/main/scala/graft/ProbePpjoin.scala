package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement (round 14): candidate volume of the prefix-filter
  * Jaccard join without/with the PPJoin length + positional filters, to
  * record the reduction the filters buy at the bench scale. Replicates
  * the candidate stage of [[graft.operators.Dedup.prefixJaccardPairs]]
  * (rarest-first ranks, prefix explode) with each filter toggled; the
  * production operator applies both. Not part of the build contract. */
object ProbePpjoin {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("probe-ppjoin").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val t = 0.5
    // "adversarial": a small-vocabulary, variable-length corpus — every
    // doc shares SOME rare-ish shingle with many others (so the prefix
    // join alone floods), while few pairs clear t. The regime where the
    // length/positional filters earn their keep.
    val docsRaw =
      if (d == "adversarial") {
        // overlapping windows of one master sequence: every doc's shingles
        // come from the same ~400-shingle pool (mid-frequency everywhere —
        // rarest-first can't hide them in the suffix), but J ≥ t needs a
        // ~2/3 window overlap, so raw prefix candidates flood vs true pairs
        val rnd = new scala.util.Random(17)
        val master = (0 until 400).map(i => s"m$i")
        (1 to 4000).map { i =>
          val len = 10 + rnd.nextInt(40)
          val start = rnd.nextInt(400 - len)
          (i.toLong, master.slice(start, start + len).mkString(" "))
        }.toDF("doc_id", "text")
      } else Tables.load(spark, d, "documents")
    val sh = graft.operators.Dedup.shingles(docsRaw, "doc_id", "text", 5)
      .select(col("doc_id").as("doc"), col("shingle"))
    val order = sh.groupBy(col("shingle")).agg(count(lit(1)).as("tf"))
      .orderBy(col("tf"), col("shingle"))
      .select(col("shingle")).as[String]
      .rdd.zipWithIndex()
      .map { case (s, i) => (s, i + 1L) }
      .toDF("shingle", "rk")
    val docs = sh.join(order, "shingle")
      .groupBy(col("doc"))
      .agg(sort_array(collect_list(col("rk"))).as("rks"))
      .withColumn("sz", size(col("rks")))
      .withColumn("plen", (col("sz") - ceil(lit(t) * col("sz")) + 1).cast("int"))
      .localCheckpoint()
    val pfx = docs.select(col("doc"), col("sz"),
      posexplode(slice(col("rks"), lit(1), col("plen"))).as(Seq("p", "rk")))
    val joined = pfx.select(col("doc").as("doc_a"), col("sz").as("sz_a"),
        col("p").as("pa"), col("rk"))
      .join(pfx.select(col("doc").as("doc_b"), col("sz").as("sz_b"),
        col("p").as("pb"), col("rk")), "rk")
      .filter(col("doc_a") < col("doc_b"))
    val lenF = least(col("sz_a"), col("sz_b")).cast("double") >=
      lit(t) * greatest(col("sz_a"), col("sz_b")).cast("double") - lit(1e-9)
    val posF = (lit(1L) + least(col("sz_a") - col("pa") - 1,
        col("sz_b") - col("pb") - 1).cast("long")).cast("double") * (lit(1.0) + lit(t)) >=
      lit(t) * (col("sz_a") + col("sz_b")).cast("double") - lit(1e-9)
    def pairs(df: org.apache.spark.sql.DataFrame): Long =
      df.select(col("doc_a"), col("doc_b")).distinct().count()
    val raw = pairs(joined)
    val withLen = pairs(joined.filter(lenF))
    val withBoth = pairs(joined.filter(lenF && posF))
    val truePairs = graft.operators.Dedup
      .prefixJaccardPairs(docsRaw, "doc_id", "text", 5, t).count()
    println(s"PPJOIN $d t=$t cand_raw=$raw cand_len=$withLen " +
      s"cand_len_pos=$withBoth true_pairs=$truePairs")
    spark.stop()
  }
}
