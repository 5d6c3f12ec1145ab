package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Ops

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("A8 dedupFirstWins is deterministic: earliest (ts, id) survives") {
    val df = Seq(("u1", 5L, "e1"), ("u1", 3L, "e2"), ("u1", 3L, "e0"), ("u2", 9L, "e9"))
      .toDF("k", "ts", "payload")
    val got = Ops.dedupFirstWins(df, Seq("k"), Seq($"ts", $"payload"))
      .orderBy($"k").as[(String, Long, String)].collect()
    assert(got sameElements Array(("u1", 3L, "e0"), ("u2", 9L, "e9")))
  }

  test("J3 anti-join keeps only absent keys (insert-if-absent gate)") {
    val incoming = Seq(("a", 1), ("b", 2), ("c", 3)).toDF("_id", "v")
    val existing = Seq(("b", 99)).toDF("_id", "w")
    val got = Ops.antiJoin(incoming, existing, Seq("_id"))
      .orderBy($"_id").as[(String, Int)].collect()
    assert(got sameElements Array(("a", 1), ("c", 3)))
  }

  test("A2 merge of partial aggregates == direct aggregate (sum/max), random splits") {
    // property-style: 20 seeded random datasets with random partitionings —
    // the associativity invariant the reference's Mongo $inc/$max relies on
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 20) {
      val n = 1 + rnd.nextInt(40)
      val xs = List.fill(n)((s"p${rnd.nextInt(5)}", rnd.nextInt(1000).toLong))
      val df = xs.map { case (part, v) => ("k", part, v) }.toDF("k", "part", "v")
      val direct = df.groupBy($"k")
        .agg(count(lit(1)).as("cnt"), max($"v").as("mx"))
        .as[(String, Long, Long)].head()
      val partials = df.groupBy($"k", $"part")
        .agg(count(lit(1)).as("cnt"), max($"v").as("mx"))
      val merged = Ops.mergePartials(partials, Seq("k"), Seq("cnt"), Seq("mx"))
        .select($"k", $"cnt", $"mx").as[(String, Long, Long)].head()
      assert(direct == merged)
    }
  }

  test("T1 topK returns k rows in order with deterministic ties") {
    val df = Seq(("a", 3.0), ("b", 5.0), ("c", 5.0), ("d", 1.0)).toDF("id", "score")
    val got = Ops.topK(df, 2, Seq($"score".desc, $"id")).as[(String, Double)].collect()
    assert(got sameElements Array(("b", 5.0), ("c", 5.0)))
  }

  test("asofJoin: latest right row at-or-before each left ts, per key") {
    val left = Seq((1L, 10L, "p1"), (1L, 20L, "p2"), (2L, 5L, "p3"), (3L, 9L, "p4"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 25L, "r25"), (2L, 7L, "r7"))
      .toDF("k", "ts", "tag")
    val got = Ops.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select($"k", $"ts", $"name", $"asof.tag", $"asof.ts")
      .orderBy($"k", $"ts")
      .as[(Long, Long, String, Option[String], Option[Long])].collect()
    assert(got sameElements Array(
      (1L, 10L, "p1", Some("r10"), Some(10L)), // equal ts is INCLUSIVE
      (1L, 20L, "p2", Some("r15"), Some(15L)), // r25 is in the future
      (2L, 5L, "p3", None, None),              // nothing at-or-before -> null
      (3L, 9L, "p4", None, None)))             // key with no right rows at all
  }

  test("asofJoin forward: earliest right row at-or-after each left ts; nulls match nothing") {
    val left = Seq((1L, Some(10L), "p1"), (1L, Some(20L), "p2"),
      (2L, Some(50L), "p3"), (1L, None: Option[Long], "pnull"))
      .toDF("k", "ts", "name")
    val right = Seq((1L, 10L, "r10"), (1L, 15L, "r15"), (1L, 25L, "r25"), (2L, 7L, "r7"))
      .toDF("k", "ts", "tag")
    val got = Ops.asofJoin(left, right, Seq("k"), "ts", "ts", direction = "forward")
      .select($"name", $"asof.tag", $"asof.ts").orderBy($"name")
      .as[(String, Option[String], Option[Long])].collect()
    assert(got sameElements Array(
      ("p1", Some("r10"), Some(10L)),  // equal ts is INCLUSIVE forward too
      ("p2", Some("r25"), Some(25L)),  // r15 is in the past
      ("p3", None, None),              // nothing at-or-after -> null
      ("pnull", None, None)))          // null left ts admits no match
    // equal-ts forward ties resolve by the tieBreak column (same
    // last-in-tie-order rule as backward: the larger value wins)
    val l2 = Seq((1L, 10L, "p")).toDF("k", "ts", "name")
    val r2 = Seq((1L, 12L, 7L, "lo"), (1L, 12L, 9L, "hi")).toDF("k", "ts", "seq", "tag")
    val tie = Ops.asofJoin(l2, r2, Seq("k"), "ts", "ts",
        tieBreak = Seq("seq"), direction = "forward")
      .select($"asof.tag").as[String].collect()
    assert(tie sameElements Array("hi"))
  }

  test("asofJoin: null timestamps match nothing (either side)") {
    val left = Seq((1L, Some(5L), "p"), (1L, None, "pnull")).toDF("k", "ts", "name")
    val right = Seq((1L, None: Option[Long], "rnull"), (1L, Some(9L), "future"))
      .toDF("k", "ts", "tag")
    val got = Ops.asofJoin(left, right, Seq("k"), "ts", "ts")
      .select($"name", $"asof.tag").orderBy($"name")
      .as[(String, Option[String])].collect()
    // SQL semantics: ts <= anything is NULL for a null right row, and a
    // null left ts admits no prior row — both sides must yield no match
    assert(got sameElements Array(("p", None), ("pnull", None)))
  }

  test("asofJoin: equal right timestamps resolve by the tieBreak column") {
    val left = Seq((1L, 10L, "p")).toDF("k", "ts", "name")
    val right = Seq((1L, 10L, 7L, "lo"), (1L, 10L, 9L, "hi")).toDF("k", "ts", "seq", "tag")
    val got = Ops.asofJoin(left, right, Seq("k"), "ts", "ts", tieBreak = Seq("seq"))
      .select($"asof.tag").as[String].head()
    assert(got == "hi") // greatest tieBreak wins, deterministically
  }

  test("asofJoin ≡ brute-force reference on seeded random data (with nulls)") {
    val rnd = new scala.util.Random(1234)
    for (_ <- 1 to 5) {
      val left = (1 to 60).map(i => (rnd.nextInt(6).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100).toLong), i.toLong))
      val right = (1 to 80).map(i => (rnd.nextInt(6).toLong,
        if (rnd.nextInt(10) == 0) None else Some(rnd.nextInt(100).toLong), (1000 + i).toLong))
      val lDf = left.toDF("k", "ts", "lid")
      val rDf = right.toDF("k", "ts", "rid")
      val got = Ops.asofJoin(lDf, rDf, Seq("k"), "ts", "ts", tieBreak = Seq("rid"))
        .select($"lid", $"asof.rid").as[(Long, Option[Long])].collect().toMap
      // reference: per left row, scan all right rows of the key
      val expect = left.map { case (k, ts, lid) =>
        lid -> ts.flatMap { t =>
          right.filter(r => r._1 == k && r._2.exists(_ <= t))
            .sortBy(r => (r._2.get, r._3)).lastOption.map(_._3)
        }
      }.toMap
      assert(got == expect)
    }
  }

  test("intervalJoin: window is exclusive at lower, inclusive at upper") {
    val left = Seq((1L, 100L, 10L)).toDF("k", "lid", "lus")
      .withColumn("lts", timestamp_micros($"lus")).select("k", "lid", "lts")
    val right = Seq((1L, 200L, 10L), (1L, 201L, 11L), (1L, 202L, 15L), (1L, 203L, 16L))
      .toDF("k", "rid", "rus")
      .withColumn("rts", timestamp_micros($"rus")).select("k", "rid", "rts")
    // window (10+0, 10+5] = (10, 15]: 10 out (lower exclusive), 11 and 15
    // in, 16 out (upper inclusive ends at 15)
    val got = Ops.intervalJoin(left, right, Seq("k"), "lts", "rts", 0L, 5L)
      .select($"rid").as[Long].collect().sorted
    assert(got sameElements Array(201L, 202L))
  }

  test("intervalJoin ≡ brute force on seeded random data (no loss or dup at bucket edges)") {
    // window span 14 over ts range 200 → every pair straddles bucket
    // boundaries somewhere; equality with the brute-force theta-join proves
    // the ≤2-bucket replication loses nothing and duplicates nothing
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val left = (1 to 50).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong, i.toLong))
      val right = (1 to 70).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(200).toLong, (1000 + i).toLong))
      val (lo, hi) = (3L, 17L)
      val lDf = left.toDF("k", "lus", "lid")
        .withColumn("lts", timestamp_micros($"lus")).select("k", "lid", "lts")
      val rDf = right.toDF("k", "rus", "rid")
        .withColumn("rts", timestamp_micros($"rus")).select("k", "rid", "rts")
      val got = Ops.intervalJoin(lDf, rDf, Seq("k"), "lts", "rts", lo, hi)
        .select($"lid", $"rid").as[(Long, Long)].collect().toSeq.sorted
      val expect = (for {
        (lk, lt, lid) <- left
        (rk, rt, rid) <- right
        if lk == rk && rt > lt + lo && rt <= lt + hi
      } yield (lid, rid)).sorted
      assert(got == expect)
    }
  }

  test("histogramQuantiles picks exact lower-rank elements, ties and nulls handled") {
    // group a: sorted [1,1,2,3,10] n=5 -> p50 rank floor(4*.5)+1=3 -> 2;
    //          p95 rank floor(4*.95)+1=4 -> 3; p0 rank 1 -> 1; p100 rank 5 -> 10
    // group b: [5,5,5] all ties -> every quantile = 5
    val df = (Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0)) ++
      Seq(("b", 5.0), ("b", 5.0), ("b", 5.0)))
      .toDF("g", "v")
      .unionByName(Seq(("a", Option.empty[Double])).toDF("g", "v"))
    val got = Ops.histogramQuantiles(df, "g", "v", Seq(0.0, 0.5, 0.95, 1.0))
      .orderBy($"g").as[(String, Double, Double, Double, Double, Long)].collect()
    assert(got sameElements Array(
      ("a", 1.0, 2.0, 3.0, 10.0, 5L), ("b", 5.0, 5.0, 5.0, 5.0, 3L)))
    // distinct-value grain means repartitioning can't change the result
    val again = Ops.histogramQuantiles(df.repartition(7), "g", "v", Seq(0.0, 0.5, 0.95, 1.0))
      .orderBy($"g").as[(String, Double, Double, Double, Double, Long)].collect()
    assert(again sameElements got)
  }

  test("cusumAlarms: prefix-min identity reproduces the clamped recurrence") {
    import graft.operators.Profiler
    // group mean = 12; slack 2 -> deviations d = v - 14:
    // v: 10, 22, 4, 14, 10 -> d: -4, 8, -10, 0, -4
    // recurrence s = max(0, s + d): 0, 8, 0, 0, 0
    val df = Seq((1L, 10.0), (2L, 22.0), (3L, 4.0), (4L, 14.0), (5L, 10.0))
      .map { case (t, v) => ("g", t, v) }.toDF("g", "t", "v")
    val got = Profiler.cusumAlarms(df, "g", "t", "v", slack = 2.0, h = 3.0)
      .orderBy($"t").as[(String, Long, Double, Double, Boolean)].collect()
    assert(got.map(_._4).toSeq == Seq(0.0, 8.0, 0.0, 0.0, 0.0), got.mkString(","))
    // alarms strictly above h = 3: only the drift point
    assert(got.map(_._5).toSeq == Seq(false, true, false, false, false))
    // independent groups don't share state
    val two = (df.collect().map(r => ("h", r.getLong(1), r.getDouble(2) + 100)).toSeq)
      .toDF("g", "t", "v").unionByName(df)
    val g2 = Profiler.cusumAlarms(two, "g", "t", "v", slack = 2.0, h = 3.0)
      .filter($"g" === "h").orderBy($"t")
      .as[(String, Long, Double, Double, Boolean)].collect()
    assert(g2.map(_._4).toSeq == Seq(0.0, 8.0, 0.0, 0.0, 0.0), g2.mkString(","))
  }

  test("madOutliers flags spikes, not the bulk; all-equal group flags nothing") {
    import graft.operators.Profiler
    // group a: bulk around 10 (med 10, MAD 1), one spike at 100
    // group b: all equal -> MAD 0 -> nothing flagged
    val df = (Seq(9.0, 10.0, 10.0, 11.0, 100.0).zipWithIndex.map {
      case (v, i) => (i.toLong, "a", v)
    } ++ Seq((10L, "b", 5.0), (11L, "b", 5.0), (12L, "b", 5.0)))
      .toDF("id", "g", "v")
    val got = Profiler.madOutliers(df, "g", "v").orderBy($"id")
      .select($"id", $"is_outlier").as[(Long, Boolean)].collect().toMap
    assert(got(4L)) // the spike
    assert((0L to 3L).forall(!got(_)))
    assert((10L to 12L).forall(!got(_)))
  }

  test("madOutliers: histogram-derived MAD ≡ direct row-grain medians " +
    "(duplicate-heavy + asymmetric-fold groups)") {
    import graft.operators.Profiler
    // r17: the MAD histogram is folded from the value histogram
    // (|v − med| merges distinct values, counts summed) instead of
    // re-aggregating rows — equivalence must hold where the fold MERGES
    // bins: values symmetric around the median (|8|: 2 and 18 with med 10)
    // and heavy duplicates. Reference = medians computed directly on rows.
    val vals = Map(
      "sym" -> Seq(2.0, 2.0, 10.0, 10.0, 10.0, 18.0, 18.0, 30.0),
      "dup" -> Seq(1.0, 1.0, 1.0, 1.0, 7.0, 7.0, 9.0),
      "one" -> Seq(42.0))
    val df = vals.toSeq.flatMap { case (g, vs) => vs.map(v => (g, v)) }
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    def lowerRankMedian(xs: Seq[Double]): Double = {
      val s = xs.sorted
      s(math.floor((s.size - 1) * 0.5).toInt)
    }
    val expect = vals.map { case (g, vs) =>
      val med = lowerRankMedian(vs)
      val mad = lowerRankMedian(vs.map(v => math.abs(v - med)))
      g -> (med, mad)
    }
    val got = Profiler.madOutliers(df, "g", "v")
      .select($"g", $"med", $"mad").distinct()
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect, s"got $got, expect $expect")
  }

  test("quantilesFromCounts ≡ histogramQuantiles on the same data") {
    val df = Seq(("a", 1.0), ("a", 1.0), ("a", 2.0), ("a", 3.0), ("a", 10.0),
      ("b", 5.0), ("b", 5.0), ("b", 5.0)).toDF("g", "v")
    val vc = df.groupBy($"g", $"v".as("__v")).agg(count(lit(1)).as("__cnt"))
    val a = Ops.quantilesFromCounts(vc, "g", Seq(0.5, 0.95))
      .orderBy($"g").as[(String, Double, Double, Long)].collect()
    val b = Ops.histogramQuantiles(df, "g", "v", Seq(0.5, 0.95))
      .orderBy($"g").as[(String, Double, Double, Long)].collect()
    assert(a sameElements b)
  }

  test("pearson: perfect linear = 1, inverse = -1, constant = null") {
    import graft.operators.Profiler
    val df = Seq((1.0, 2.0, -1.0, 7.0), (2.0, 4.0, -2.0, 7.0),
      (3.0, 6.0, -3.0, 7.0), (4.0, 8.0, -4.0, 7.0))
      .toDF("x", "y2", "yneg", "const")
    val got = Profiler.pearson(df, Seq(("x", "y2"), ("x", "yneg"), ("x", "const")))
      .select($"x_col", $"y_col", $"corr").as[(String, String, Option[Double])]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("x", "y2")).contains(1.0))
    assert(got(("x", "yneg")).contains(-1.0))
    assert(got(("x", "const")).isEmpty) // zero variance -> undefined
  }

  test("groupTrend recovers exact slopes per group; zero-variance x is null") {
    import graft.operators.Profiler
    val df = (Seq((1.0, 5.0), (2.0, 7.0), (3.0, 9.0)).map { case (x, y) => ("up", x, y) } ++
      Seq(("flat", 4.0, 2.0), ("flat", 4.0, 8.0))) // same x for all rows
      .toDF("g", "x", "y")
    val got = Profiler.groupTrend(df, "g", "x", "y")
      .orderBy($"g").as[(String, Long, Option[Double], Option[Double])].collect()
    assert(got(0) == (("flat", 2L, None, None)))
    assert(got(1) == (("up", 3L, Some(2.0), Some(3.0)))) // y = 3 + 2x
  }

  test("gini: uniform = 0, total concentration -> (n-1)/n, tie-order-independent") {
    import graft.operators.Profiler
    val df = (Seq.fill(4)(("even", 10L)) ++
      Seq(("conc", 0L), ("conc", 0L), ("conc", 0L), ("conc", 100L)))
      .zipWithIndex.map { case ((g, v), i) => (i.toLong, g, v) }
      .toDF("id", "g", "v")
    val vals = Profiler.gini(df, "g", "v").orderBy($"g")
      .as[(String, Long, Double)].collect()
    assert(vals.find(_._1 == "even").get._3 == 0.0)
    // one row holds everything among n=4: gini = (n-1)/n = 0.75
    assert(vals.find(_._1 == "conc").get._3 == 0.75)
    // ties: any internal order of the three zeros gives the same result
    val again = Profiler.gini(df.repartition(5), "g", "v").orderBy($"g")
      .as[(String, Long, Double)].collect()
    assert(again sameElements vals)
  }

  test("skewReport: hot key tops the report with exact share and skew ratio") {
    import graft.operators.Profiler
    // key k: 'hot' x 60, 'a'..'d' x 10 each -> 100 rows, 5 distinct
    val rows = (Seq.fill(60)("hot") ++ Seq("a", "b", "c", "d").flatMap(Seq.fill(10)(_)))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }.toDF("k", "x")
    val got = Profiler.skewReport(rows, Seq("k"), topN = 2)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(got.length == 2)
    val hot = got.head
    // rank 1: 60/100 rows = 60% share; skew = 60 * 5 / 100 = 3x the mean key
    assert(hot == (("k", "hot", 60L, 1L, 60.0, 3.0)))
    // rank 2 ties at cnt=10 break by key value: 'a'
    assert(got(1) == (("k", "a", 10L, 2L, 10.0, 0.5)))
    // partitioning independence
    val again = Profiler.skewReport(rows.repartition(7), Seq("k"), topN = 2)
      .as[(String, String, Long, Long, Double, Double)].collect()
    assert(again sameElements got)
  }

  test("winsorizedMean: clips both tails, ignores nulls, exact on clean groups") {
    import graft.operators.Profiler
    // n=20, alphaDenom=4 -> klo=5, khi=16: clip at the 5th/16th values
    val tailed = (1L to 18L).map(("t", _)) ++ Seq(("t", -1000L), ("t", 9999L))
    val clean = Seq(("c", 10L), ("c", 20L), ("c", 30L), ("c", Long.MinValue))
      .map { case (g, v) => (g, if (v == Long.MinValue) null else v.toString) }
    val df = (tailed.map { case (g, v) => (g, v.toString) } ++ clean)
      .toDF("g", "vs").select($"g", $"vs".cast("long").as("v"))
    val got = Profiler.winsorizedMean(df, "g", "v", alphaDenom = 4)
      .orderBy($"g").as[(String, Long, Long, Long, Double)].collect()
    // clean group: n=3 (null dropped), klo=1 -> lo=min, hi=max, plain mean
    assert(got.find(_._1 == "c").get == (("c", 3L, 10L, 30L, 20.0)))
    val t = got.find(_._1 == "t").get
    // sorted: -1000, 1..18, 9999; rank5 value=4, rank16 value=15
    assert(t._3 == 4L && t._4 == 15L)
    // clipped: -1000->4; 1,2,3->4; 4..15 stay; 16,17,18->15; 9999->15
    // sum = 4 + 3*4 + (4..15).sum + 3*15 + 15 = 4+12+114+45+15 = 190
    assert(t._5 == 190.0 / 20.0)
    // partitioning independence
    val again = Profiler.winsorizedMean(df.repartition(7), "g", "v", alphaDenom = 4)
      .orderBy($"g").as[(String, Long, Long, Long, Double)].collect()
    assert(again sameElements got)
  }

  test("pmiPairs: complements positive, near-independence near zero, minCount prunes") {
    // items A,B co-occur in every basket (complements); C floats freely
    val baskets = Seq(
      (1L, "A"), (1L, "B"), (1L, "C"),
      (2L, "A"), (2L, "B"),
      (3L, "A"), (3L, "B"), (3L, "C"),
      (4L, "C"), (4L, "D")).toDF("bk", "it")
    val got = Ops.pmiPairs(baskets, "bk", "it", minCount = 2L)
      .orderBy($"item_a", $"item_b")
      .as[(String, String, Long, Double)].collect()
    val byPair = got.map(r => (r._1, r._2) -> r._4).toMap
    // A,B: n_ab=3, n_a=n_b=3, N=4 -> pmi = ln(3*4/9) = ln(4/3) > 0
    assert(math.abs(byPair(("A", "B")) - math.log(4.0 / 3.0)) < 1e-5)
    // A,C: n_ab=2, n_a=3, n_c=3, N=4 -> ln(8/9) < 0 (less than independent)
    assert(byPair(("A", "C")) < 0)
    // C,D co-occur once -> pruned by minCount=2
    assert(!byPair.contains(("C", "D")))
  }

  test("union tolerates asymmetric schemas") {
    val a = Seq(("x", 1)).toDF("name", "extra")
    val b = Seq("y").toDF("name")
    val got = Ops.unionAll(Seq(a, b)).orderBy($"name")
      .select($"name").as[String].collect()
    assert(got sameElements Array("x", "y"))
  }

  test("rrfFuse: overlap sums both lists, missing ranks contribute zero, n-way works") {
    val bm = Seq((1L, 1L), (2L, 2L)).toDF("id", "rank")
    val ann = Seq((2L, 1L), (3L, 2L)).toDF("id", "rank")
    val got = Ops.rrfFuse(Seq(bm, ann), "id")
      .select($"id", $"rrf").as[(Long, Double)].collect()
    // id 2 appears in both (1/62 + 1/61), ids 1/3 in one each
    val exp2 = BigDecimal(1.0 / 62 + 1.0 / 61).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._1 == 2L && got.head._2 == exp2, got.mkString(","))
    assert(got.map(_._1) sameElements Array(2L, 1L, 3L)) // rrf desc, id tiebreak
    // three-way fusion: a third list promotes its shared id
    val extra = Seq((3L, 1L)).toDF("id", "rank")
    val three = Ops.rrfFuse(Seq(bm, ann, extra), "id")
      .select($"id").as[Long].collect()
    assert(three.head == 3L || three.head == 2L) // 3: 1/62+1/61 vs 2: 1/62+1/61 — tie broken by id
    assert(three.take(2).toSet == Set(2L, 3L))
  }
}
