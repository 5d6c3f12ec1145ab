package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: achieved recall@10 of the published IVF-PQ index
  * per (sf, shortlist, nprobe) operating point — the data that sized
  * q_ann_ivfpq_probe_audit's tightened 0.8 floor (round-11 brief item 5):
  * shortlist 400 / nprobe 6 measures 1.0 / 1.0 / 0.9 across the sfs.
  * Not part of the build contract; prints measurements and exits. */
object ProbeIvfpqRecall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("probe-ivfpq").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.load(spark, d, "embeddings")
      val dir = operators.PqIndex.ensure(emb, "vec_id", "embedding", d,
        m = 8, k = 64, coarseNlist = 8)
      val anchor = emb.filter(col("vec_id") === 0L)
        .select(col("embedding").cast("array<double>")).head()
        .getSeq[Double](0).toArray
      val brute = operators.Similarity
        .bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      for (sl <- Seq(100, 200, 400); np <- Seq(2, 3, 4, 6, 8)) {
        val got = operators.PqIndex.topKReranked(spark, dir, emb,
            "vec_id", "embedding", anchor, 0L, topK = 10, shortlist = sl,
            nprobe = np)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        println(s"PROBE $sf shortlist=$sl nprobe=$np recall@10=${(got & brute).size / 10.0}")
      }
    }
    spark.stop()
  }
}
