package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Phase-level profiler for `q_mutual_knn_dedup_lsh` (the slowest registry
  * row, 8.3 s quiet at sf0.1 in round 8). Times each stage of the
  * [[operators.Similarity.mutualKnnDedupLsh]] composition independently so
  * the optimization target is measured, not guessed: candidate generation
  * (band join + distinct), exact re-scoring (the double-sided vector join),
  * ranking window, mutuality join, and the label-propagation components
  * loop. Diagnostic main, run ad hoc:
  * `SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.ProfileMutual"`.
  */
object ProfileMutual {
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
      println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      r
    }
    def sink(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.load(spark, sfDir, "embeddings")
    // warm the JVM/codegen the way Bench does
    import graft.operators.{Dedup, Similarity}
    (1 to 2).foreach { i =>
      time(s"warmup full query #$i")(sink(
        Similarity.mutualKnnDedupLsh(emb, "vec_id", "embedding", k = 3, threshold = 0.4)))
    }
    time("full query (steady)")(sink(
      Similarity.mutualKnnDedupLsh(emb, "vec_id", "embedding", k = 3, threshold = 0.4)))

    // ---- phase breakdown (same composition, staged) -------------------
    val pairs = time("1 lshCosinePairs -> ckpt") {
      Similarity.lshCosinePairs(emb, "vec_id", "embedding", 0.4, 48, 4, 42L)
        .localCheckpoint()
    }
    println(s"[profile]   pairs rows = ${pairs.count()}")
    val directed = pairs
      .select(col("vec_a").as("a"), col("vec_b").as("b"), col("cosine"))
      .unionAll(pairs.select(col("vec_b").as("a"), col("vec_a").as("b"), col("cosine")))
    val w = Window.partitionBy(col("a")).orderBy(col("cosine").desc, col("b"))
    val ranked = time("2 rank window -> ckpt") {
      directed.withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3).select(col("a"), col("b"))
        .localCheckpoint()
    }
    val mutual = time("3 mutuality semi-join") {
      ranked.filter(col("a") < col("b"))
        .join(ranked.select(col("b").as("a"), col("a").as("b")), Seq("a", "b"), "left_semi")
        .select(col("a").as("doc_a"), col("b").as("doc_b"))
        .localCheckpoint()
    }
    println(s"[profile]   mutual edges = ${mutual.count()}")
    val losers = time("4 dupGroups (label prop)") {
      Dedup.dupGroups(mutual)
        .filter(col("group_id") =!= col("doc_id"))
        .select(col("doc_id").as("vec_id"))
        .localCheckpoint()
    }
    time("5 anti-join + sink")(sink(emb.join(losers, Seq("vec_id"), "left_anti")))

    // ---- candidate-scoring variants (diagnosis aid) -------------------
    import graft.plans.GraftFunctions
    GraftFunctions.register(spark)
    val asD: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      _.cast("array<double>")
    def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      call_function("array_dot", a, b)
    val planes = Similarity.hyperplanes(48 * 4, 64, 42L)
    val keysCol = call_function("lsh_band_keys",
      asD(col("embedding")), typedlit(planes.flatten.toIndexedSeq), lit(48), lit(4))
    val banded = emb.select(col("vec_id"), explode(keysCol).as("band_key"))
    val joined = banded.select(col("vec_id").as("vec_a"), col("band_key"))
      .join(banded.select(col("vec_id").as("vec_b"), col("band_key")), "band_key")
      .filter(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
    val va = emb.select(col("vec_id").as("vec_a"), asD(col("embedding")).as("va"),
      sqrt(dot(asD(col("embedding")), asD(col("embedding")))).as("na"))
    val vb = emb.select(col("vec_id").as("vec_b"), asD(col("embedding")).as("vb"),
      sqrt(dot(asD(col("embedding")), asD(col("embedding")))).as("nb"))
    def score(cand: DataFrame) = cand.join(va, "vec_a").join(vb, "vec_b")
      .select(col("vec_a"), col("vec_b"),
        round(when(col("na") * col("nb") === 0, lit(null).cast("double"))
          .otherwise(dot(col("va"), col("vb")) / (col("na") * col("nb"))), 6).as("cosine"))
      .filter(col("cosine") >= 0.4)
    time("A collisions only (no score)")(sink(joined))
    time("B early distinct, no score")(sink(joined.distinct()))
    time("C late: score all + dropDup")(sink(score(joined).dropDuplicates("vec_a", "vec_b")))
    time("D early: distinct + score")(sink(score(joined.distinct())))
    println("[profile] plan of C:")
    score(joined).dropDuplicates("vec_a", "vec_b").explain("formatted")
    spark.stop()
  }
}
