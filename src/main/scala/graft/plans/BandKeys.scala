package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: the LSH band keys of a MinHash signature in
  * ONE scan-stage pass.
  *
  * `band_keys(sig, bands, rows)` → `array<string>` of length `bands` where
  * `key[j] = "<j>:" || sig[j·rows] || "," || … || sig[j·rows + rows − 1]`
  * — bit-identical to the column chain it replaces
  * ([[graft.operators.Dedup.bandKeys]]):
  * `transform(sequence(0, bands−1), j => concat(j, ":", concat_ws(",",
  * transform(slice(sig, j·rows+1, rows), x => x.cast("string")))))`,
  * including the short-signature edge (a slice past the end joins the
  * elements that exist; signatures are always `bands·rows` long in
  * production so this matters only to the parity spec). A NULL signature
  * (shingle-less document) yields NULL — the row drops out at the
  * banding explode, exactly like the `when(isNotNull…)` guard it replaces.
  *
  * Why a native expression: the chain above is higher-order functions —
  * CodegenFallback, an interpreted expression-tree walk per element. Band
  * keys are derived AT PROBE TIME from stored signatures in the streaming
  * near-dup sink (state stays one row per document instead of `bands×`
  * larger), which re-derives the index side every micro-batch — the
  * interpreted cost was the dominant term of the fused probe job. Here
  * the whole key array is one tight loop over the signature's longs. */
case class BandKeys(sig: Expression, bands: Expression, rows: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(sig, bands, rows)

  override def checkInputDataTypes(): TypeCheckResult = sig.dataType match {
    case ArrayType(LongType, _)
      if bands.dataType == IntegerType && bands.foldable &&
         rows.dataType == IntegerType && rows.foldable =>
      val (b, r) = (bands.eval().asInstanceOf[Int], rows.eval().asInstanceOf[Int])
      if (b > 0 && r > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("band_keys: bands and rows must be > 0")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"band_keys: expects (array<long>, int literal, int literal), got " +
        s"(${sig.dataType.simpleString}, ${bands.dataType.simpleString}, " +
        s"${rows.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "band_keys"

  private lazy val bandsV: Int = bands.eval().asInstanceOf[Int]
  private lazy val rowsV: Int = rows.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = sig.eval(input)
    if (v == null) null
    else BandKeys.compute(v.asInstanceOf[ArrayData], bandsV, rowsV)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sGen = sig.genCode(ctx)
    // shared static helper keeps codegen and interpreted paths identical
    ev.copy(code = code"""
      ${sGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${sGen.isNull}) {
        ${ev.value} = graft.plans.BandKeys.compute(${sGen.value}, $bandsV, $rowsV);
        ${ev.isNull} = false;
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(sig = newChildren(0), bands = newChildren(1), rows = newChildren(2))
}

object BandKeys {
  /** See the class scaladoc for the exact semantics contract. */
  def compute(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val len = sig.numElements()
    val out = new Array[Any](bands)
    val sb = new java.lang.StringBuilder(24 * rows)
    var j = 0
    while (j < bands) {
      sb.setLength(0)
      sb.append(j).append(':')
      val from = j * rows
      val until = math.min(len, from + rows)
      var i = from
      while (i < until) {
        if (i > from) sb.append(',')
        sb.append(sig.getLong(i)): Unit
        i += 1
      }
      out(j) = UTF8String.fromString(sb.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}
