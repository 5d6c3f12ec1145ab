package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Privacy

/** [[graft.operators.Privacy]] — k-anonymity suppression, the l-diversity
  * audit, and PRF-Laplace noisy counts. */
class PrivacySpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def people = Seq(
    // (id, city, age_band, disease) — city+age_band are the QIs
    (1L, "oslo", "30s", "flu"),
    (2L, "oslo", "30s", "flu"),
    (3L, "oslo", "30s", "cold"),
    (4L, "oslo", "30s", "flu"),
    (5L, "bergen", "40s", "cold"),   // group of 2: suppressed at k=3
    (6L, "bergen", "40s", "cold"),
    (7L, "tromso", "20s", "flu")     // singleton: suppressed
  ).toDF("id", "city", "age_band", "disease")

  test("kAnonymize: groups >= k keep values, smaller groups release '*'") {
    val out = Privacy.kAnonymize(people, Seq("city", "age_band"), k = 3)
      .orderBy($"id").as[(Long, String, String, String)].collect()
    assert(out.take(4).forall(r => r._2 == "oslo" && r._3 == "30s"))
    assert(out.drop(4).forall(r => r._2 == "*" && r._3 == "*"))
    // non-QI columns pass through untouched
    assert(out.map(_._4) sameElements
      Array("flu", "flu", "cold", "flu", "cold", "cold", "flu"))
  }

  test("kAnonymize: null quasi values form a group and are never dropped") {
    val withNulls = people.unionByName(Seq(
      (8L, null.asInstanceOf[String], "50s", "flu"),
      (9L, null.asInstanceOf[String], "50s", "cold"),
      (10L, null.asInstanceOf[String], "50s", "flu"))
      .toDF("id", "city", "age_band", "disease"))
    val out = Privacy.kAnonymize(withNulls, Seq("city", "age_band"), k = 3)
      .orderBy($"id")
    assert(out.count() == 10, "null-QI rows must survive the join")
    // the 3-row null-city group meets k=3: age_band released, city stays
    // null (cast of null is null — '*' is only for under-k groups)
    val nullGroup = out.filter($"id" >= 8L)
      .select($"city", $"age_band").distinct().collect()
    assert(nullGroup.length == 1 &&
      nullGroup(0).isNullAt(0) && nullGroup(0).getString(1) == "50s")
  }

  test("kAnonymize: k=1 is the identity on group structure (nothing suppressed)") {
    val out = Privacy.kAnonymize(people, Seq("city", "age_band"), k = 1)
    assert(out.filter($"city" === "*").count() == 0)
  }

  test("lDiversityAudit: flags k-anonymous-but-homogeneous groups") {
    // bergen/40s: n=2 (fails k=2? no — meets k=2) with ONE distinct
    // disease — k-anonymous yet l-poor, the case the audit exists for
    val audit = Privacy.lDiversityAudit(
        people, Seq("city", "age_band"), "disease", k = 2, l = 2)
      .orderBy($"city", $"age_band")
      .as[(String, String, Long, Long, Boolean, Boolean)].collect()
    val bergen = audit.find(_._1 == "bergen").get
    assert(bergen._3 == 2 && bergen._4 == 1 && bergen._5 && !bergen._6)
    val oslo = audit.find(_._1 == "oslo").get
    assert(oslo._3 == 4 && oslo._4 == 2 && oslo._5 && oslo._6)
    val tromso = audit.find(_._1 == "tromso").get
    assert(!tromso._5 && !tromso._6)
  }

  test("kAnonymize property: released QI combinations never under k; suppression minimal") {
    // randomized corpus: the k-anonymity CONTRACT is that every released
    // (non-'*') quasi-identifier combination appears >= k times in the
    // output, and that only rows whose original group was under k were
    // suppressed (suppression must not over-fire)
    val rnd = new scala.util.Random(7)
    val rows = (1 to 400).map(i =>
      (i.toLong, s"c${rnd.nextInt(12)}", s"a${rnd.nextInt(6)}", s"d${rnd.nextInt(3)}"))
    val df = rows.toDF("id", "city", "age_band", "disease")
    val out = Privacy.kAnonymize(df, Seq("city", "age_band"), k = 5)
    val released = out.filter($"city" =!= "*")
      .groupBy($"city", $"age_band").count()
      .filter($"count" < 5).count()
    assert(released == 0, "a released QI combination appeared under k times")
    val suppressedIds = out.filter($"city" === "*")
      .select($"id").as[Long].collect().toSet
    val groupSizes = rows.groupBy(r => (r._2, r._3)).view.mapValues(_.size).toMap
    assert(rows.filter(r => suppressedIds(r._1))
      .forall(r => groupSizes((r._2, r._3)) < 5),
      "a row from an at-or-over-k group was suppressed")
    assert(suppressedIds.nonEmpty && suppressedIds.size < rows.size,
      "corpus must exercise both branches")
  }

  test("dpNoisyCount: deterministic per (value, salt), eps scales the noise") {
    val df = people.select($"city")
    val a = Privacy.dpNoisyCount(df, "city", eps = 1.0, salt = Privacy.TestOnlyPublicSalt)
      .orderBy($"city").as[(String, Long, Double)].collect()
    val b = Privacy.dpNoisyCount(df, "city", eps = 1.0, salt = Privacy.TestOnlyPublicSalt)
      .orderBy($"city").as[(String, Long, Double)].collect()
    assert(a sameElements b, "same salt => same draw")
    // raw counts exact; noise is bounded by the inverse-CDF at the
    // extreme u and nonzero for a hash that isn't exactly mid-range
    assert(a.map(r => (r._1, r._2)) sameElements
      Array(("bergen", 2L), ("oslo", 4L), ("tromso", 1L)))
    assert(a.forall(r => r._3 != r._2.toDouble))
    // a different salt is a different PRF key => a different draw
    val c = Privacy.dpNoisyCount(df, "city", eps = 1.0, salt = "other")
      .orderBy($"city").as[(String, Long, Double)].collect()
    assert(!(c sameElements a))
    // smaller eps => strictly larger |noise| (scale multiplies linearly)
    val wide = Privacy.dpNoisyCount(df, "city", eps = 0.1, salt = Privacy.TestOnlyPublicSalt)
      .orderBy($"city").as[(String, Long, Double)].collect()
    a.zip(wide).foreach { case (n1, n10) =>
      assert(math.abs(n10._3 - n10._2) > math.abs(n1._3 - n1._2))
    }
  }
}
