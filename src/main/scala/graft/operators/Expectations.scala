package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality expectations — the validation gate a pipeline
  * runs before expensive downstream work (training ingest, publication).
  * A rule is a NAME plus a predicate Column over the frame; a row VIOLATES
  * a rule when the predicate is false OR null (SQL three-valued logic is
  * hostile to quality checks: an unexpectedly-null comparison must count
  * as a failure, not silently pass the filter).
  *
  * Scale shape: [[check]] evaluates EVERY rule in one aggregate pass over
  * one scan — per-rule conditional sums are map-side-combined partials, so
  * the cost at 100 TB is the scan plus one row per partition per rule of
  * shuffle, independent of violation count. Referential rules compose the
  * same way: left-join the dimension key first (broadcast for dim-sized
  * sides) and write the rule against the joined frame —
  * [[withFkExists]] is that helper. [[violations]] is the drill-down
  * companion: per-rule violating-row samples, bounded by `sampleK` per
  * rule via TakeOrdered semantics, never a full materialization.
  */
object Expectations {

  final case class Rule(name: String, pred: Column)

  private def violated(r: Rule): Column = !coalesce(r.pred, lit(false))

  /** One row per rule: (rule, n_rows, n_violations, violation_rate),
    * computed in a single aggregate pass. Deterministic: counts are exact
    * longs; the rate is one int64/int64 IEEE division. Intermediate
    * columns are keyed by rule INDEX (`__v_0`, `__v_1`, …) — rule names
    * are display strings and may legally contain dots/backticks that
    * would break `col()` resolution if embedded in column names. On an
    * EMPTY input frame the rate is a defined 0.0 (not 0/0 = NaN, which a
    * `rate > x` gate would silently pass). */
  def check(df: DataFrame, rules: Seq[Rule]): DataFrame = {
    require(rules.nonEmpty, "no rules")
    require(rules.map(_.name).distinct.size == rules.size, "duplicate rule names")
    val aggs = count(lit(1)).as("__n") +:
      rules.zipWithIndex.map { case (r, i) => sum(violated(r).cast("long")).as(s"__v_$i") }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val long = explode(array(rules.zipWithIndex.map { case (r, i) =>
      struct(lit(r.name).as("rule"), col(s"__v_$i").as("n_violations")) }: _*))
    wide.select(col("__n"), long.as("rv"))
      .select(col("rv.rule").as("rule"),
        col("__n").as("n_rows"),
        coalesce(col("rv.n_violations"), lit(0L)).as("n_violations"),
        when(col("__n") === 0, lit(0.0)).otherwise(
          coalesce(col("rv.n_violations"), lit(0L)).cast("double") /
            col("__n").cast("double")).as("violation_rate"))
  }

  /** Per-rule violating-row drill-down: up to `sampleK` violating rows per
    * rule, ordered by `idCol` (deterministic sample — the FIRST k by id,
    * not an arbitrary task-order k), with the rule name attached. One scan
    * per rule of the (already narrow) projection — drill-down is a debug
    * path, not the gate. */
  def violations(df: DataFrame, rules: Seq[Rule], idCol: String,
                 sampleK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val flagged = rules.map { r =>
      df.filter(violated(r)).select(lit(r.name).as("rule"), col(idCol))
    }.reduce(_ unionAll _)
    val w = Window.partitionBy(col("rule")).orderBy(col(idCol))
    flagged.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= sampleK).drop("__rk")
  }

  /** Referential-integrity helper: adds boolean `existsCol` = key present
    * in `dim(dimKey)` (broadcast left-semi-shaped: the dim side is
    * distinct-projected before the join). Null fact keys get false — a
    * null FK cannot claim existence. */
  def withFkExists(df: DataFrame, key: String,
                   dim: DataFrame, dimKey: String, existsCol: String): DataFrame = {
    val keys = dim.select(col(dimKey).as(key)).distinct()
      .withColumn(existsCol, lit(true))
    df.join(broadcast(keys), Seq(key), "left_outer")
      .withColumn(existsCol, coalesce(col(existsCol), lit(false)))
  }
}
