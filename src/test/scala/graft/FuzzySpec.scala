package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Fuzzy

class FuzzySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("fuzzySelfMatch finds substitution, deletion and insertion neighbors at maxDist=1") {
    val rows = Seq(
      (1L, "spark"),
      (2L, "sparc"),   // substitution          -> dist 1 to spark
      (3L, "spak"),    // deletion              -> dist 1 to spark
      (4L, "sparks"),  // insertion             -> dist 1 to spark
      (5L, "flink"),   // unrelated
      (6L, null.asInstanceOf[String])
    ).toDF("id", "name")
    val got = Fuzzy.fuzzySelfMatch(rows, "id", "name", maxDist = 1)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    // spak~sparc is dist 2, spak~sparks dist 2, sparc~sparks dist 2
    assert(got sameElements Array((1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L)))
  }

  test("fuzzySelfMatch maxDist=2 adds transpositions and double edits") {
    val rows = Seq(
      (1L, "spark"),
      (2L, "sprak"),   // transposition = dist 2
      (3L, "spark!!")  // two insertions = dist 2
    ).toDF("id", "name")
    val got = Fuzzy.fuzzySelfMatch(rows, "id", "name", maxDist = 2)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    // sprak ~ spark!! is distance 4 — correctly absent
    assert(got sameElements Array((1L, 2L, 2L), (1L, 3L, 2L)))
  }

  test("blocked plan ≡ exhaustive all-pairs on testdata customer names") {
    val cust = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    val got = Fuzzy.fuzzySelfMatch(cust, "c_custkey", "c_name", maxDist = 1)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    val a = cust.select($"c_custkey".as("id_a"), $"c_name".as("str_a"))
    val b = cust.select($"c_custkey".as("id_b"), $"c_name".as("str_b"))
    val exact = a.join(b, $"id_a" < $"id_b")
      .select($"id_a", $"id_b",
        levenshtein($"str_a", $"str_b").cast("long").as("dist"))
      .filter($"dist" <= 1)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect()
    assert(got.nonEmpty, "testdata customer names should contain distance-1 pairs")
    assert(got sameElements exact)
  }

  test("deletion variants of the empty string are just the empty string") {
    val got = Seq("" -> 0).toDF("s", "x")
      .select(Fuzzy.deletionVariants($"s", 2).as("v"))
      .as[Seq[String]].head()
    assert(got == Seq(""))
  }
}
