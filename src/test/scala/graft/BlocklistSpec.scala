package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Blocklist

class BlocklistSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches ≡ naive per-pattern substring scan on a randomized corpus") {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcab" // tiny alphabet => dense overlaps
    val docs = (1 to 200).map { i =>
      (i.toLong, (1 to 30).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    val pats = Seq("a", "ab", "ba", "abc", "cab", "bcab", "aa", "ccc")
    val got = Blocklist.audit(docs.toDF("doc_id", "text"), "doc_id", "text", pats)
      .select($"doc_id", $"hits").as[(Long, Seq[String])].collect().toMap
    docs.foreach { case (id, text) =>
      val expect = pats.distinct.filter(text.contains(_)).sorted
      assert(got(id) == expect, s"doc $id '$text': ${got(id)} vs $expect")
    }
  }

  test("automaton edge cases: nested suffixes, shared prefixes, boundaries") {
    val df = Seq(
      (1L, "the scanner merges fast"),       // scan+can+an nested; merge embedded
      (2L, "TABLE"),                         // case-folded; tab prefix of table
      (3L, "fast sort"),                     // phrase = whole text
      (4L, ""),                              // empty text
      (5L, "xyzz yzzy")                      // near-miss of xyzzy across a space
    ).toDF("doc_id", "text")
    val pats = Seq("scan", "can", "an", "tab", "table", "merge", "fast sort", "xyzzy")
    val got = Blocklist.audit(df, "doc_id", "text", pats)
      .select($"doc_id", $"hits", $"blocked")
      .as[(Long, Seq[String], Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Seq("an", "can", "merge", "scan"), true)))
    assert(got(2L) == ((Seq("tab", "table"), true)))
    assert(got(3L) == ((Seq("fast sort"), true)))
    assert(got(4L) == ((Seq(), false)))
    assert(got(5L) == ((Seq(), false)))
  }

  test("null text yields null hits; empty patterns rejected") {
    val df = Seq((1L, Option("an apple")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val rows = Blocklist.audit(df, "doc_id", "text", Seq("apple"))
      .select($"doc_id", $"hits").collect()
    assert(rows.find(_.getLong(0) == 2L).exists(_.isNullAt(1)))
    assert(rows.find(_.getLong(0) == 1L).exists(_.getSeq[String](1) == Seq("apple")))
    val e = intercept[IllegalArgumentException] {
      Blocklist.audit(df, "doc_id", "text", Seq.empty)
    }
    assert(e.getMessage.contains("empty blocklist"))
  }

  test("ONE scan stage regardless of lexicon size: no join, no explode") {
    // a 5k-entry lexicon must produce the same plan shape as a 5-entry one
    val bigLexicon = (1 to 5000).map(i => s"badword$i")
    val df = Seq((1L, "clean text with badword137 inside")).toDF("doc_id", "text")
    val plan = Blocklist.audit(df, "doc_id", "text", bigLexicon)
      .queryExecution.executedPlan
    val txt = plan.toString
    assert(!txt.contains("Join") && !txt.contains("Generate"),
      s"blocklist audit must not join/explode:\n$txt")
    val hits = Blocklist.audit(df, "doc_id", "text", bigLexicon)
      .select($"hits").as[Seq[String]].head()
    // substring semantics: badword137 contains badword1 and badword13 too
    assert(hits == Seq("badword1", "badword13", "badword137"))
  }

  test("whole-stage codegen keeps the automaton in the generated stage") {
    // a range-backed frame (a LocalTableScan would fold the projection away)
    val df = spark.range(10).select($"id".as("doc_id"),
      concat(lit("doc "), $"id".cast("string")).as("text"))
    val plan = Blocklist.audit(df, "doc_id", "text", Seq("doc", "7"))
      .queryExecution.executedPlan.toString
    // the `*(n)` prefix is executedPlan.toString's WholeStageCodegen marker
    assert(plan.contains("*(1) Project") && plan.contains("ac_matches"),
      s"expected the ac_matches projection inside a codegen span:\n$plan")
    val hits = Blocklist.audit(df, "doc_id", "text", Seq("doc", "7"))
      .filter($"doc_id" === 7).select($"hits").as[Seq[String]].head()
    assert(hits == Seq("7", "doc"))
  }
}
