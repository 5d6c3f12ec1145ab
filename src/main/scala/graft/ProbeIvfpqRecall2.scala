package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProbeIvfpqRecall2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().appName("p2").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32).config("spark.ui.enabled", false)
      .getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.load(spark, d, "embeddings")
      val dir = operators.PqIndex.ensure(emb, "vec_id", "embedding", d, m = 8, k = 64, coarseNlist = 8)
      val anchor = emb.filter(col("vec_id") === 0L).select(col("embedding").cast("array<double>")).head().getSeq[Double](0).toArray
      val brute = operators.Similarity.bruteForceTopK(emb, "vec_id", "embedding", 0L, 10)
        .select(col("vec_id")).collect().map(_.getLong(0)).toSet
      for (sl <- Seq(200, 400); np <- Seq(4, 6, 8)) {
        val got = operators.PqIndex.topKReranked(spark, dir, emb, "vec_id", "embedding", anchor, 0L, 10, sl, np)
          .select(col("vec_id")).collect().map(_.getLong(0)).toSet
        println(s"PROBE $sf shortlist=$sl nprobe=$np recall@10=${(got & brute).size / 10.0}")
      }
    }
    spark.stop()
  }
}
