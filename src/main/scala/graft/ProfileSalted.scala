package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Phase profiler for `q_emb_neardup_lsh_salted` (slowest quiet row after
  * the round-9 dupGroups fix): times the salted band self-join guard
  * against its unsalted twin at several (salts, hotMin) settings to locate
  * the overhead. Diagnostic main. */
object ProfileSalted {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $label%-36s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.operators.Similarity
    val emb = Tables.load(spark, sfDir, "embeddings")
    def q(salt: Option[(Int, Int)]) =
      Similarity.lshCosinePairs(emb, "vec_id", "embedding", threshold = 0.45,
        saltHotBands = salt).orderBy(col("vec_a"), col("vec_b"))
    // warmup
    time("warmup unsalted")(sink(q(None)))
    time("warmup salted(4,4)")(sink(q(Some((4, 4)))))
    for (_ <- 1 to 2) {
      time("unsalted")(sink(q(None)))
      time("salted(4,4)  all-hot")(sink(q(Some((4, 4)))))
    }
    // candidate generation only, no scoring
    import graft.operators.Scale
    import graft.plans.GraftFunctions
    GraftFunctions.register(spark)
    val planes = Similarity.hyperplanes(48 * 4, 64, 42L)
    val keysCol = call_function("lsh_band_keys",
      col("embedding").cast("array<double>"),
      typedlit(planes.flatten.toIndexedSeq), lit(48), lit(4))
    val banded = emb.select(col("vec_id"), explode(keysCol).as("band_key"))
    time("cand unsalted join+distinct") {
      sink(banded.select(col("vec_id").as("vec_a"), col("band_key"))
        .join(banded.select(col("vec_id").as("vec_b"), col("band_key")), "band_key")
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct())
    }
    time("cand salted(4,4)") {
      sink(Scale.saltedBandSelfJoin(banded, "vec_id", "band_key",
        "vec_a", "vec_b", 4, 4))
    }
    def hotJoin(hint: Option[String]): DataFrame = {
      val b = banded.select(col("vec_id"), col("band_key")).localCheckpoint()
      val sl = b.withColumn("__salt", pmod(xxhash64(col("vec_id")), lit(4L)))
      val sr0 = b.withColumn("__salt", explode(sequence(lit(0L), lit(3L))))
      val sr = hint.fold(sr0)(sr0.hint(_))
      sl.select(col("vec_id").as("vec_a"), col("band_key"), col("__salt"))
        .join(sr.select(col("vec_id").as("vec_b"), col("band_key"), col("__salt")),
          Seq("band_key", "__salt"))
        .filter(col("vec_a") < col("vec_b"))
        .select(col("vec_a"), col("vec_b")).distinct()
    }
    time("cand salted hot join plain")(sink(hotJoin(None)))
    time("cand salted hot join shuffle_hash")(sink(hotJoin(Some("shuffle_hash"))))
    time("cand salted hot join broadcast")(sink(hotJoin(Some("broadcast"))))
    println("[profile] plain hot join plan:")
    hotJoin(None).explain()
    spark.stop()
  }
}
