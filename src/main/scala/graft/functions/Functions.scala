package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StringType, StructType}

/** Scalar layer — SURVEY.md §2.3 F1-F8 as pure `Column` combinators.
  *
  * Everything here stays inside whole-stage codegen: built-in expressions
  * only, no UDFs, no driver-side logic. At 100 TB these run per-row in the
  * scan stage, so codegen-ability is the whole game.
  */
object Functions {

  /** F1 — influence score (reference: consumer1/consumer1.py:55-59):
    * `followers*0.5 + statuses*0.3 - friends*0.2`, nulls treated as 0.
    * Generic over the three input columns so the same combinator serves the
    * reference shape (followersCount/statusesCount/friendsCount) and the
    * testdata analog (c_acctbal/c_custkey/c_nationkey).
    */
  def influenceScore(followers: Column, statuses: Column, friends: Column): Column =
    coalesce(followers.cast("double"), lit(0.0)) * 0.5 +
      coalesce(statuses.cast("double"), lit(0.0)) * 0.3 -
      coalesce(friends.cast("double"), lit(0.0)) * 0.2

  /** F2 — brand rename (reference: consumer1/consumer1.py:61-69): literal
    * substring replace `"Twitter"→"X"` then `"twitter"→"x"`, applied to every
    * string value. Substring semantics are reference-faithful: URLs are hit
    * too (`twitter.com` → `x.com`). NOT idempotent on arbitrary input —
    * apply exactly once per record (SURVEY.md §7.4-1).
    */
  def brandRename(c: Column): Column =
    regexp_replace(regexp_replace(c, lit("Twitter"), lit("X")), lit("twitter"), lit("x"))

  /** F2 recursive — the reference's `replace_twitter_with_x_recursive`
    * (consumer1/consumer1.py:61-69) walks dicts/lists at any depth and
    * rewrites every STRING VALUE (dict keys are left alone). Here the walk
    * is schema-driven at plan time: the returned expression rewrites every
    * string leaf reachable through structs, arrays and map values — still
    * pure built-in expressions, so it stays inside codegen. Note a JSON
    * payload carried as a plain string column (e.g. projects.`twitter`) is a
    * string LEAF and gets the substring rename on its raw text, exactly as
    * the reference's `str` branch does. */
  def brandRenameDeep(c: Column, dt: DataType): Column = dt match {
    case StringType => brandRename(c)
    case st: StructType =>
      // struct() of a null struct's fields would resurrect it as a row of
      // nulls — guard to keep null structs null
      val rebuilt = struct(st.fields.toSeq.map(f =>
        brandRenameDeep(c.getField(f.name), f.dataType).as(f.name)): _*)
      when(c.isNull, lit(null).cast(st)).otherwise(rebuilt)
    case ArrayType(et, _) => transform(c, x => brandRenameDeep(x, et))
    case MapType(_, vt, _) => transform_values(c, (_, v) => brandRenameDeep(v, vt))
    case _ => c
  }

  /** F2 over a whole row: every column renamed recursively per its schema. */
  def brandRenameAll(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map(f =>
      brandRenameDeep(col(f.name), f.dataType).as(f.name)): _*)

  /** F3 — ingest-time stamp (reference: consumer1/consumer1.py:81,92,108).
    * Wall-clock is nondeterministic; verified queries must pass the
    * timestamp as data or a literal (SURVEY.md §7.4-3), so the combinator
    * takes an optional fixed epoch for tests.
    */
  def ingestStamp(fixedEpoch: Option[Long] = None): Column =
    fixedEpoch.map(lit(_)).getOrElse(unix_timestamp(current_timestamp()))

  /** F4 — filename-epoch extraction (reference: consumer2/consumer2.py:56-63):
    * `{topic}_{epoch}.json` → epoch long; malformed names → null (the
    * PERMISSIVE analog of the reference's ValueError-skip).
    */
  def filenameEpoch(c: Column): Column = {
    val m = regexp_extract(c, "_([0-9]+)\\.json$", 1)
    // no-match yields "" — map to null before the cast (ANSI-safe)
    when(m === "", lit(null)).otherwise(m).cast("long")
  }

  /** F5 — JSON string → struct (reference: consumer2/consumer2.py:111-114,126). */
  def parseJson(c: Column, schema: StructType): Column = from_json(c, schema)

  /** F7 — numeric default on null (reference: consumer2/consumer2.py:184-191). */
  def orZero(c: Column): Column = coalesce(c, lit(0L))

  /** F7 double variant. */
  def orZeroD(c: Column): Column = coalesce(c.cast("double"), lit(0.0))
}
