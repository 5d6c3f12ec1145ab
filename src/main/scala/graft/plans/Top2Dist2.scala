package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expression: nearest + runner-up centroid distances of a
  * quantized vector — the [[ArgminDist2]] loop tracking the best TWO exact
  * integer squared L2 distances in one pass.
  *
  * `top2_dist2(vec, centroids_flat, k)` →
  * `struct<cluster:int, dist2:long, dist2b:long>` where `cluster`/`dist2`
  * are exactly [[ArgminDist2]]'s result (ties → smallest index) and
  * `dist2b` is the smallest distance over the OTHER k−1 centroids (the
  * second-smallest distance overall; a tie with `dist2` is a legitimate
  * runner-up). Consumers: the simplified-silhouette audit
  * ([[graft.operators.Clustering.silhouette]]), where a(i) = √dist2 and
  * b(i) = √dist2b — one codegen'd scan instead of a k-way explode-join.
  *
  * `k ≥ 2` is required (a runner-up must exist). Null/ragged/overflow
  * semantics are [[ArgminDist2]]'s: null in → null out, overflow raises.
  */
case class Top2Dist2(vec: Expression, centroids: Expression, k: Expression)
    extends Expression {

  override def children: Seq[Expression] = Seq(vec, centroids, k)

  override def checkInputDataTypes(): TypeCheckResult = {
    def isLongArray(dt: DataType) = dt match {
      case ArrayType(LongType, _) => true
      case _ => false
    }
    if (!isLongArray(vec.dataType))
      TypeCheckResult.TypeCheckFailure(
        s"top2_dist2: vec must be array<long>, got ${vec.dataType.simpleString}")
    else if (!isLongArray(centroids.dataType) || !centroids.foldable)
      TypeCheckResult.TypeCheckFailure("top2_dist2: centroids must be a foldable array<long>")
    else if (k.dataType != IntegerType || !k.foldable)
      TypeCheckResult.TypeCheckFailure("top2_dist2: k must be an int literal")
    else if (k.eval().asInstanceOf[Int] < 2)
      TypeCheckResult.TypeCheckFailure("top2_dist2: k must be >= 2 (a runner-up must exist)")
    else TypeCheckResult.TypeCheckSuccess
  }

  override def dataType: DataType = StructType(Seq(
    StructField("cluster", IntegerType, nullable = false),
    StructField("dist2", LongType, nullable = false),
    StructField("dist2b", LongType, nullable = false)))
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "top2_dist2"

  private lazy val kV: Int = k.eval().asInstanceOf[Int]
  private lazy val centroidsV: Array[Long] =
    centroids.eval().asInstanceOf[ArrayData].toLongArray()
  private lazy val dim: Int = centroidsV.length / kV

  override def eval(input: InternalRow): Any = {
    val v = vec.eval(input)
    if (v == null) return null
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != dim) return null
    var i = 0
    while (i < dim) { if (a.isNullAt(i)) return null; i += 1 }
    var best = 0
    var bestD = Long.MaxValue
    var secondD = Long.MaxValue
    var c = 0
    while (c < kV) {
      var s = 0L
      i = 0
      val off = c * dim
      while (i < dim) {
        val d = a.getLong(i) - centroidsV(off + i)
        s = Math.addExact(s, Math.multiplyExact(d, d))
        i += 1
      }
      if (s < bestD) { secondD = bestD; bestD = s; best = c }
      else if (s < secondD) { secondD = s }
      c += 1
    }
    new GenericInternalRow(Array[Any](best, bestD, secondD))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecGen = vec.genCode(ctx)
    val ctRef = ctx.addReferenceObj("top2Centroids", centroidsV, "long[]")
    val best = ctx.freshName("best")
    val bestD = ctx.freshName("bestD")
    val secondD = ctx.freshName("secondD")
    val c = ctx.freshName("c")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val d = ctx.freshName("d")
    val off = ctx.freshName("off")
    val anyNull = ctx.freshName("anyNull")
    ev.copy(code = code"""
      ${vecGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.InternalRow ${ev.value} = null;
      if (!${vecGen.isNull} && ${vecGen.value}.numElements() == $dim) {
        boolean $anyNull = false;
        for (int $i = 0; $i < $dim; $i++) {
          if (${vecGen.value}.isNullAt($i)) { $anyNull = true; break; }
        }
        if (!$anyNull) {
          int $best = 0;
          long $bestD = Long.MAX_VALUE;
          long $secondD = Long.MAX_VALUE;
          for (int $c = 0; $c < $kV; $c++) {
            long $s = 0L;
            int $off = $c * $dim;
            for (int $i = 0; $i < $dim; $i++) {
              long $d = ${vecGen.value}.getLong($i) - $ctRef[$off + $i];
              $s = java.lang.Math.addExact($s, java.lang.Math.multiplyExact($d, $d));
            }
            if ($s < $bestD) { $secondD = $bestD; $bestD = $s; $best = $c; }
            else if ($s < $secondD) { $secondD = $s; }
          }
          ${ev.isNull} = false;
          ${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
            new Object[] { $best, $bestD, $secondD });
        }
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(vec = newChildren(0), centroids = newChildren(1), k = newChildren(2))
}
