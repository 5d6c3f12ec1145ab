package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Expectations
import graft.operators.Expectations.Rule

class ExpectationsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("null predicates count as violations (three-valued logic fails the gate)") {
    val df = Seq[(Long, Option[Double])](
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(0.0)))
      .toDF("id", "v")
    val got = Expectations.check(df, Seq(
        Rule("v_nonneg", col("v") >= 0.0),
        Rule("v_present", col("v").isNotNull),
        Rule("all_pass", lit(true))))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    // v_nonneg: -1.0 violates AND the null row violates (null pred = fail)
    assert(got == Seq(
      ("all_pass", 4L, 0L, 0.0),
      ("v_nonneg", 4L, 2L, 0.5),
      ("v_present", 4L, 1L, 0.25)))
  }

  test("rule names with dots/backticks resolve (index-keyed intermediates)") {
    // a rule name is a display string — embedding it in a column name
    // made col() parse dots as struct access; the index-keyed form must
    // carry any legal string through unharmed
    val df = Seq((1L, 5.0), (2L, -1.0)).toDF("id", "v")
    val got = Expectations.check(df, Seq(
        Rule("fact.v`non-neg", col("v") >= 0.0),
        Rule("id.present", col("id").isNotNull)))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      ("fact.v`non-neg", 2L, 1L, 0.5),
      ("id.present", 2L, 0L, 0.0)))
  }

  test("empty input yields violation_rate 0.0, not NaN (gates stay decidable)") {
    val df = Seq.empty[(Long, Double)].toDF("id", "v")
    val got = Expectations.check(df, Seq(Rule("v_nonneg", col("v") >= 0.0)))
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("v_nonneg", 0L, 0L, 0.0)))
    // the downstream alerting shape: a threshold comparison must be
    // decidably false on empty input, not NaN-silently-false by accident
    assert(!got.head._4.isNaN)
  }

  test("violations drill-down returns the deterministic first-k per rule") {
    val df = (1L to 100L).map(i => (i, i % 3 == 0)).toDF("id", "ok")
    val got = Expectations.violations(df, Seq(Rule("ok", col("ok"))), "id", 5)
      .orderBy("id").as[(String, Long)].collect().toSeq
    // violators are ids not divisible by 3; first 5 by id
    assert(got == Seq(("ok", 1L), ("ok", 2L), ("ok", 4L), ("ok", 5L), ("ok", 7L)))
  }

  test("withFkExists: missing and null keys are false, present keys true") {
    val fact = Seq[(Option[Long], String)](
      (Some(10L), "a"), (Some(99L), "b"), (None, "c")).toDF("k", "tag")
    val dim = Seq(10L, 11L).toDF("dk")
    val got = Expectations.withFkExists(fact, "k", dim, "dk", "fk_ok")
      .orderBy("tag").select("tag", "fk_ok").as[(String, Boolean)].collect().toSeq
    assert(got == Seq(("a", true), ("b", false), ("c", false)))
  }

  test("streaming quality monitor: chunked totals ≡ batch check, replay is a no-op") {
    val dir = java.nio.file.Files.createTempDirectory("graft_qmon").toString + "/state"
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val rules = Seq(
      Rule("qty_le_25", col("l_quantity") <= 25.0),
      Rule("tax_nonneg", col("l_tax") >= 0.0))
    val sink = graft.streaming.Streaming.qualityMonitorSink(rules, dir) _
    // three micro-batches partitioned by a key residue
    (0L until 3L).foreach(b => sink(li.filter(col("l_orderkey") % 3 === b), b))
    val batchTruth = Expectations.check(li, rules)
      .select("rule", "n_rows", "n_violations", "violation_rate")
      .orderBy("rule").as[(String, Long, Long, Double)].collect().toSeq
    def state() = graft.streaming.Streaming.qualityState(spark, dir)
      .orderBy("rule").as[(String, Long, Long, Double)].collect().toSeq
    assert(state() == batchTruth)
    sink(li.filter(col("l_orderkey") % 3 === 1L), 1L) // replayed batch
    assert(state() == batchTruth, "replay must not double-count")
  }

  test("q_expectations on real lineitem: referential clean, threshold rule genuinely mixed") {
    val rows = SparkEntry.queries("q_expectations")(spark, "/root/testdata/sf0.001")
      .as[(String, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val (_, n, vQty, _) = rows("qty_le_25")
    assert(vQty > 0 && vQty < n, "threshold rule should be mixed, not vacuous")
    assert(rows("order_exists")._3 == 0L, "testdata lineitem FK is clean")
    assert(rows("returnflag_domain")._3 == 0L)
    assert(rows.values.forall(_._2 == n), "all rules see the same row count")
  }
}
