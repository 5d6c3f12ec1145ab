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

  test("dist-1 path edge cases: equal strings, empties, single chars, transposition excluded") {
    val rows = Seq(
      (1L, "spark"),
      (2L, "spark"),  // identical -> dist 0
      (3L, ""),       // empty
      (4L, ""),       // empty twin -> dist 0 to 3
      (5L, "a"),      // one char: dist 1 to empty (insertion)
      (6L, "b"),      // substitution of 5 at pos 1 -> dist 1; dist 1 to empties
      (7L, "ab"),     // dist 1 to "a" and "b" (insertion); dist 2 to "ba"
      (8L, "ba")      // transposition of 7 = dist 2 -> must NOT match 7
    ).toDF("id", "name")
    val got = Fuzzy.fuzzySelfMatch(rows, "id", "name", maxDist = 1)
      .orderBy($"id_a", $"id_b").as[(Long, Long, Long)].collect().toSeq
    val expected = Seq(
      (1L, 2L, 0L),             // equal non-empty
      (3L, 4L, 0L),             // equal empty
      (3L, 5L, 1L), (3L, 6L, 1L), (4L, 5L, 1L), (4L, 6L, 1L), // empty ↔ one char
      (5L, 6L, 1L),             // substitution at the only position
      (5L, 7L, 1L), (6L, 8L, 1L), // one-char ↔ two-char insertions
      (6L, 7L, 1L), (5L, 8L, 1L)) // "b"→"ab" prepend, "a"→"ba" prepend
      .sorted
    assert(got == expected) // notably absent: (7,8) — transposition is dist 2
  }
}
