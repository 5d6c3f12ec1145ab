package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Clustering

class ClusteringSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Scala reference of the identical fixed-point algorithm. */
  private def refKmeans(rows: Seq[(Long, Seq[Float])], k: Int, iters: Int)
      : Map[Long, (Int, Long)] = {
    val q = rows.map { case (id, v) => id -> v.map(x => (x.toDouble * 1e6).toLong).toArray }
    var cents = q.sortBy(_._1).take(k).map(_._2.clone()).toArray
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def assign(v: Array[Long]): (Int, Long) = {
      val ds = cents.map(d2(v, _))
      val m = ds.min
      (ds.indexOf(m), m)
    }
    for (_ <- 1 to iters) {
      val groups = q.groupBy { case (_, v) => assign(v)._1 }
      cents = cents.zipWithIndex.map { case (prev, c) =>
        groups.get(c).fold(prev) { members =>
          val vs = members.map(_._2)
          prev.indices.map(i =>
            math.floor(vs.map(_(i)).sum.toDouble / vs.size).toLong).toArray
        }
      }
    }
    q.map { case (id, v) => id -> assign(v) }.toMap
  }

  private def rand(n: Int, dim: Int, seed: Long): Seq[(Long, Seq[Float])] = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map(i => (i.toLong, Seq.fill(dim)(rnd.nextFloat() * 2 - 1)))
  }

  test("kmeansAssign ≡ scala reference on seeded random data") {
    for (seed <- Seq(1L, 2L)) {
      val rows = rand(60, 8, seed)
      val got = Clustering.kmeansAssign(rows.toDF("vec_id", "embedding"),
          "vec_id", "embedding", k = 5, iters = 3)
        .as[(Long, Int, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got == refKmeans(rows, 5, 3))
    }
  }

  test("kmeansAssign is partitioning-invariant (exact integer arithmetic)") {
    val rows = rand(80, 6, 7L)
    def run(parts: Int) = Clustering.kmeansAssign(
        rows.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", k = 4, iters = 2)
      .orderBy($"vec_id").as[(Long, Int, Long)].collect().toSeq
    assert(run(1) == run(7))
  }

  test("empty clusters keep their previous centroid (duplicate seeds)") {
    // two identical seed points: every row is strictly closer to seed 0
    // than seed 1 (ties go to the smaller id), so cluster 1 empties out
    // and must carry its seed centroid instead of crashing or vanishing
    val rows = Seq(
      (1L, Seq(0f, 0f)), (2L, Seq(0f, 0f)), (3L, Seq(10f, 10f)),
      (4L, Seq(0.1f, 0.1f)), (5L, Seq(10.1f, 10f)))
    val got = Clustering.kmeansAssign(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 3, iters = 3)
      .as[(Long, Int, Long)].collect()
    assert(got.length == 5)
    assert(got.forall(r => r._2 >= 0 && r._2 < 3))
    assert(got.map(r => r._1 -> ((r._2, r._3))).toMap == refKmeans(rows, 3, 3))
  }
}
