package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class VariantSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("variant handles heterogeneous arrays, JSON null, and typed path extraction") {
    val df = Seq("""[1, "a", {"b": 2}, null]""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    val row = df.select(
      variant_get(col("v"), "$[0]", "bigint"),
      variant_get(col("v"), "$[1]", "string"),
      variant_get(col("v"), "$[2].b", "bigint"),
      // JSON null is a VALUE a schema-fixed struct cannot represent
      // alongside ints in one array — the variant point
      is_variant_null(variant_get(col("v"), "$[3]", "variant")),
      is_variant_null(variant_get(col("v"), "$[0]", "variant")),
      schema_of_variant(col("v"))).head()
    assert(row.getLong(0) == 1L)
    assert(row.getString(1) == "a")
    assert(row.getLong(2) == 2L)
    assert(row.getBoolean(3))
    assert(!row.getBoolean(4))
    assert(row.getString(5) == "ARRAY<VARIANT>")
  }

  test("try_variant_get nulls on type mismatch and missing paths; strict get errors") {
    val df = Seq("""{"s": "abc", "n": 7}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    val row = df.select(
      try_variant_get(col("v"), "$.s", "bigint"),   // not a number
      try_variant_get(col("v"), "$.missing", "bigint"),
      try_variant_get(col("v"), "$.n", "bigint")).head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.getLong(2) == 7L)
    val ex = intercept[Exception] {
      df.select(variant_get(col("v"), "$.s", "bigint")).head()
    }
    assert(ex.getMessage.toLowerCase.contains("variant"))
  }

  test("numeric fidelity through variant: doubles and int64 extremes round-trip") {
    val big = Long.MaxValue
    val df = Seq(s"""{"d": 0.1, "big": $big, "neg": -0.0}""").toDF("j")
      .select(parse_json(col("j")).as("v"))
    val row = df.select(
      variant_get(col("v"), "$.d", "double"),
      variant_get(col("v"), "$.big", "bigint"),
      variant_get(col("v"), "$.neg", "double")).head()
    assert(row.getDouble(0) == 0.1)
    assert(row.getLong(1) == big) // int64 extreme survives (no double detour)
    // pinned caveat: JSON numbers with a decimal point parse as DECIMAL,
    // so -0.0 normalizes to +0.0 — variant does NOT preserve zero sign.
    // Pipelines that care must carry the sign out-of-band.
    assert(java.lang.Double.doubleToRawLongBits(row.getDouble(2)) == 0L)
  }

  test("q_variant_extract equals the direct-column projection on real events") {
    val d = "/root/testdata/sf0.001"
    val viaVariant = SparkEntry.queries("q_variant_extract")(spark, d)
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    val direct = Tables.load(spark, d, "events")
      .select(col("event_id"), col("user_id").as("u"), col("event_type").as("t"),
        get_json_object(col("props"), "$.k").cast("long").as("k"),
        (col("user_id") % 3).as("a1"))
      .orderBy(col("event_id"))
      .as[(Long, Long, String, Long, Long)].collect().toSeq
    assert(viaVariant.nonEmpty && viaVariant == direct)
  }
}
