package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Pca

/** Fixed-point PCA: integer power iteration semantics, exact projection
  * arithmetic, and the partitioning-invariance the fixed-point
  * discipline exists to buy. */
class PcaSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topEigvec: diagonal Gram converges to the dominant axis") {
    // G = diag(4, 1): gmax=4, Gn = diag(2^20, 2^18); each round shrinks
    // the off-axis component by x4, so 12 rounds from all-ones leave
    // exactly (4096, 0) after the floor divisions
    val v = Pca.topEigvec(Seq((0, 0, 4L), (0, 1, 0L), (1, 0, 0L), (1, 1, 1L)), iters = 12)
    assert(v.toSeq == Seq(4096L, 0L))
  }

  test("topEigvec: rejects empty and all-zero Gram matrices") {
    intercept[IllegalArgumentException](Pca.topEigvec(Nil, 5))
    intercept[IllegalArgumentException](Pca.topEigvec(Seq((0, 0, 0L), (1, 1, 0L)), 5))
  }

  test("projectTop1: axis-aligned corpus projects exactly e_i * 4096") {
    // all variance on axis 0: eigvec = (4096, 0, 0), so
    // pc1_fp = round(x*128) * 4096 exactly, pc1 = x (powers of two)
    val emb = Seq(
      (1L, Array(0.5f, 0.0f, 0.0f)),
      (2L, Array(-0.25f, 0.0f, 0.0f)),
      (3L, Array(1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Pca.projectTop1(emb, "vec_id", "embedding", iters = 8)
      .orderBy($"vec_id").as[(Long, Long, Double)].collect()
    assert(got.toSeq == Seq(
      (1L, 64L * 4096, 0.5), (2L, -32L * 4096, -0.25), (3L, 128L * 4096, 1.0)))
  }

  test("gram: integer overflow raises in-plan (ANSI), never wraps silently") {
    // e = round(3e8 * 128) ~ 3.8e10; e*e ~ 1.5e21 > 2^63 — the product
    // itself overflows, and the scaladoc's "guard raises in-plan" claim
    // rests on Spark 4 ANSI arithmetic; this spec pins that it DOES
    val df = Seq((1L, Array(3.0e8f, 0.0f)), (2L, Array(3.0e8f, 0.0f)))
      .toDF("vec_id", "embedding")
    val e = intercept[Exception](Pca.gram(df, "vec_id", "embedding").collect())
    def chain(t: Throwable): List[Throwable] =
      if (t == null) Nil else t :: chain(t.getCause)
    assert(chain(e).exists(c => c.getMessage != null &&
      (c.getMessage.toLowerCase.contains("overflow") ||
        c.getMessage.contains("ARITHMETIC_OVERFLOW"))), e.toString)
  }

  test("projectTop1: identical output under any partitioning (fixed-point)") {
    val base = (1 to 200).map { k =>
      val t = (k % 17 - 8) / 8.0f
      (k.toLong, Array(t, 0.3f * t + 0.01f * (k % 7), 0.05f * (k % 5)))
    }
    val a = Pca.projectTop1(base.toDF("vec_id", "embedding"), "vec_id", "embedding")
      .orderBy($"vec_id").as[(Long, Long, Double)].collect()
    val b = Pca.projectTop1(
        base.toDF("vec_id", "embedding").repartition(7, $"vec_id"),
        "vec_id", "embedding")
      .orderBy($"vec_id").as[(Long, Long, Double)].collect()
    assert(a sameElements b)
    // the dominant direction must order projections consistently with t:
    // correlation of pc1 with the axis-0 coordinate is far from zero
    val xs = base.map(_._2(0).toDouble)
    val ys = a.map(_._3)
    val n = xs.size
    val (mx, my) = (xs.sum / n, ys.sum / n)
    val cov = xs.zip(ys).map { case (x, y) => (x - mx) * (y - my) }.sum
    val sd = math.sqrt(xs.map(x => (x - mx) * (x - mx)).sum *
      ys.map(y => (y - my) * (y - my)).sum)
    assert(math.abs(cov / sd) > 0.99, s"corr = ${cov / sd}")
  }
}
