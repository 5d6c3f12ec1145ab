package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off measurement: candidate volume (pre-verify) of the two banded
  * LSH production paths at the test scale factors, to size the default
  * candidate-volume caps (round-11 brief item 2). Not part of the build
  * contract; prints counts and exits. */
object ProbeCandVolume {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("probe-cand").master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .getOrCreate()
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val d = s"/root/testdata/$sf"
      val emb = Tables.load(spark, d, "embeddings")
      val nVec = emb.count()
      val docs = Tables.load(spark, d, "documents").select(col("doc_id"), col("text"))
      val nDoc = docs.count()
      // emb path: replicate lshCosinePairs candidate build (no cap)
      val dim = emb.select(max(size(col("embedding")))).head().getInt(0)
      val planes = operators.Similarity.hyperplanes(48 * 4, dim, 42L)
      graft.plans.GraftFunctions.register(spark)
      val keysCol = call_function("lsh_band_keys",
        transform(col("embedding"), x => x.cast("double")),
        typedlit(planes.flatten.toIndexedSeq), lit(48), lit(4))
      val banded = emb.select(col("vec_id"), explode(keysCol).as("band_key"))
      val candE = banded.select(col("vec_id").as("vec_a"), col("band_key"))
        .join(banded.select(col("vec_id").as("vec_b"), col("band_key")), "band_key")
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct().count()
      // minhash path
      val sig = operators.Dedup.scanSignatures(docs, "doc_id", "text", 5, 128)
      val candM = operators.Dedup.lshCandidatePairs(sig, "doc_id", 32, 4).count()
      println(s"PROBE $sf nVec=$nVec candEmb=$candE perVec=${candE.toDouble / nVec} " +
        s"nDoc=$nDoc candMin=$candM perDoc=${candM.toDouble / nDoc}")
    }
    spark.stop()
  }
}
