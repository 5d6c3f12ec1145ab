package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** Native Catalyst expression: the full MinHash signature of a document's
  * shingle set in ONE scan-stage pass.
  *
  * `minhash_sig(shingles, numHashes)` → `array<long>` of length `numHashes`
  * where `sig[i] = min over shingles s of xxhash64(xxhash64(s), i)` — the
  * exact arithmetic of the column-expression pipeline
  * ([[graft.operators.Dedup.minHashSignatures]]): shingle hashed once with
  * Spark's `xxhash64` seed 42, then each permutation re-hashes that fixed
  * 8-byte value with the permutation index. Bit-identical signatures, so
  * banding produces the same candidate pairs.
  *
  * Why an expression instead of the explode → 128-min-aggregate pipeline:
  * the aggregate form materializes |shingles| rows per document, evaluates
  * 128 separate hash expression trees per row, and shuffles for the
  * per-document groupBy. Here the whole signature is a tight generated loop
  * over the in-row shingle array — no explode, no aggregation buffers, no
  * shuffle: at 100 TB the signature step becomes pure scan-stage compute
  * that pipelines into banding.
  *
  * Null semantics: a NULL array, or one with no shingles (document shorter
  * than the shingle width), yields NULL — the document drops out of
  * candidate generation, matching the aggregate pipeline where such a
  * document simply has no shingle rows. NULL elements are skipped.
  */
case class MinHashSig(shingles: Expression, numHashes: Expression) extends Expression {

  override def children: Seq[Expression] = Seq(shingles, numHashes)

  override def checkInputDataTypes(): TypeCheckResult = shingles.dataType match {
    case ArrayType(StringType, _)
      if numHashes.dataType == IntegerType && numHashes.foldable =>
      val n = numHashes.eval().asInstanceOf[Int]
      if (n > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure("minhash_sig: numHashes must be > 0")
    case _ => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig: expects (array<string>, int literal), got " +
        s"(${shingles.dataType.simpleString}, ${numHashes.dataType.simpleString})")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "minhash_sig"

  private lazy val numHashesV: Int = numHashes.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): Any = {
    val v = shingles.eval(input)
    if (v == null) null
    else MinHashSig.compute(v.asInstanceOf[ArrayData], numHashesV)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val shGen = shingles.genCode(ctx)
    // the loop lives in a shared static helper (also used by eval) — one
    // call per row keeps the generated method tiny and the two paths
    // arithmetically identical by construction
    ev.copy(code = code"""
      ${shGen.code}
      boolean ${ev.isNull} = true;
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
      if (!${shGen.isNull}) {
        ${ev.value} = graft.plans.MinHashSig.compute(${shGen.value}, $numHashesV);
        ${ev.isNull} = (${ev.value} == null);
      }""")
  }

  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(shingles = newChildren(0), numHashes = newChildren(1))
}

object MinHashSig {
  /** sig[i] = min_s xxhash64(xxhash64(s), i), Spark seed 42 throughout.
    * Returns null for an empty (or all-null) shingle array. */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var any = false
    var j = 0
    while (j < n) {
      val s = arr.getUTF8String(j)
      if (s != null) {
        any = true
        // xxhash64(shingle) = hashUTF8String(s, 42); xxhash64(h, i) hashes
        // the long child then the int child, each seeding the next
        val base = XXH64.hashLong(XXH64.hashUTF8String(s, 42L), 42L)
        var i = 0
        while (i < numHashes) {
          val v = XXH64.hashInt(i, base)
          if (v < sig(i)) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    if (!any) null else new GenericArrayData(sig)
  }
}
