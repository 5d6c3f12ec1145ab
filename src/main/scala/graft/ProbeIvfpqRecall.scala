package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: achieved recall@10 of the published IVF-PQ index
  * per (sf, nprobe), to size q_ann_ivfpq_probe_audit's tightened floor
  * (round-11 brief item 5). Not part of the build contract. */
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
      for (np <- Seq(2, 3, 4, 6, 8)) {
        val got = operators.PqIndex.topKReranked(spark, dir, emb,
            "vec_id", "embedding", anchor, 0L, topK = 10, shortlist = 100,
            nprobe = np)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        println(s"PROBE $sf nprobe=$np recall@10=${(got & brute).size / 10.0}")
      }
    }
    spark.stop()
  }
}
