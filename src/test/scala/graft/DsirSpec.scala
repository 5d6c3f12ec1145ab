package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Dsir, Sampling}

class DsirSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("importanceWeights: target-like docs outscore off-domain docs") {
    // target domain speaks about alpha/beta, background about gamma/delta
    val docs = (
      (1 to 20).map(i => (i.toLong, "alpha beta alpha beta qux", true)) ++
      (21 to 40).map(i => (i.toLong, "gamma delta gamma delta qux", false)) ++
      Seq((100L, "alpha beta alpha", false),   // looks like target
          (101L, "gamma delta gamma", false))  // looks like background
    ).toDF("doc_id", "text", "is_t")
    val w = Dsir.importanceWeights(docs, "doc_id", "text", col("is_t"), buckets = 256)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(100L) > w(101L),
      s"target-like doc must outweigh background-like doc: $w")
    // weight is per-token log ratio — a pure-target trigram beats a mixed one
    assert(w(100L) > 0.0 && w(101L) < 0.0)
  }

  test("importanceWeights: partitioning-independent and token-count exact") {
    val docs = (1 to 50).map(i =>
      (i.toLong, s"tok${i % 7} tok${i % 5} tok${i % 3}", i % 4 == 0))
      .toDF("doc_id", "text", "is_t")
    val a = Dsir.importanceWeights(docs, "doc_id", "text", col("is_t"))
    val b = Dsir.importanceWeights(docs.repartition(11), "doc_id", "text", col("is_t"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    assert(a.filter(col("n_tokens") =!= 3).isEmpty)
  }

  test("weightedSamplePerGroup: exactly k per group, heavier rows win more often") {
    val rows = (1 to 400).map { i =>
      val g = if (i % 2 == 0) "even" else "odd"
      // half the rows carry 20× the weight
      val w = if (i <= 200) 20.0 else 1.0
      (i.toLong, g, w)
    }.toDF("id", "g", "w")
    val k = 25
    val sampled = Sampling.weightedSamplePerGroup(rows, "id", "w", "g", k)
      .as[(Long, String, Double)].collect()
    assert(sampled.groupBy(_._2).view.mapValues(_.length).toMap ==
      Map("even" -> k, "odd" -> k))
    // with a 20:1 weight ratio the heavy half should dominate the sample
    val heavy = sampled.count(_._1 <= 200)
    assert(heavy > 35, s"heavy rows won only $heavy of ${2 * k} slots")
    // reproducible under repartitioning
    val again = Sampling.weightedSamplePerGroup(rows.repartition(9), "id", "w", "g", k)
      .select(col("id")).as[Long].collect().sorted.toSeq
    assert(again == sampled.map(_._1).sorted.toSeq)
  }
}
