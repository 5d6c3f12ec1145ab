package graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Direct interpreted-eval coverage for the round-6 native expressions:
  * the gate queries exercise the CODEGEN path; a whole-stage fallback
  * (e.g. a >64KB generated method) silently switches to eval(), so the
  * two implementations must be pinned equal. */
class PlansExprSpec extends AnyFunSuite {

  test("ArgminDist2.eval: nearest centroid, ties to smallest id, ragged null") {
    val centroids = new GenericArrayData(Array[Long](0L, 0L, 10L, 10L, 3L, 4L))
    def ev(v: Array[Long]) = graft.plans.ArgminDist2(
      Literal(new GenericArrayData(v), ArrayType(LongType)),
      Literal(centroids, ArrayType(LongType)), Literal(3)).eval(InternalRow.empty)
    val r = ev(Array(1L, 1L)).asInstanceOf[InternalRow]
    assert(r.getInt(0) == 0 && r.getLong(1) == 2L)
    val r2 = ev(Array(4L, 5L)).asInstanceOf[InternalRow]
    assert(r2.getInt(0) == 2 && r2.getLong(1) == 2L)
    // equidistant from c0 (5,5)... pick smallest index on exact tie
    val tie = graft.plans.ArgminDist2(
      Literal(new GenericArrayData(Array(5L, 5L)), ArrayType(LongType)),
      Literal(new GenericArrayData(Array[Long](0L, 0L, 10L, 10L)), ArrayType(LongType)),
      Literal(2)).eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(tie.getInt(0) == 0)
    assert(ev(Array(1L)) == null) // ragged
  }

  test("Int8Quantize.eval matches the documented arithmetic") {
    val r = graft.plans.Int8Quantize(
      Literal(new GenericArrayData(Array(1.0, -0.5, 0.0)), ArrayType(DoubleType)))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    val scale = r.getDouble(0)
    val codes = r.getArray(1).asInstanceOf[ArrayData].toLongArray()
    assert(scale == 1.0 / 127.0)
    assert(codes sameElements Array(127L, -63L, 0L)) // trunc(-0.5/scale) = -63
    // zero vector
    val z = graft.plans.Int8Quantize(
      Literal(new GenericArrayData(Array(0.0, 0.0)), ArrayType(DoubleType)))
      .eval(InternalRow.empty).asInstanceOf[InternalRow]
    assert(z.getDouble(0) == 0.0 && z.getArray(1).toLongArray().forall(_ == 0L)
      && z.getDouble(2) == 0.0)
  }

  test("DeflateRatio.eval: repetitive < random, empty null, pure function") {
    def ev(s: String) = graft.plans.DeflateRatio(Literal(UTF8String.fromString(s),
      org.apache.spark.sql.types.StringType)).eval(InternalRow.empty)
    val rep = ev("abab" * 200).asInstanceOf[Double]
    val rnd = new scala.util.Random(3)
    val noise = ev(rnd.alphanumeric.take(800).mkString).asInstanceOf[Double]
    assert(rep < noise)
    assert(ev("") == null)
    assert(ev("xyz" * 100) == ev("xyz" * 100)) // deterministic
  }
}
