package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Sampling

class SamplingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val ids = (0L until 2000L).toDF("id")

  test("splitAssign: total, disjoint, stable, roughly proportional") {
    val assigned = Sampling.splitAssign(ids, "id")
    val counts = assigned.groupBy($"split").count().as[(String, Long)].collect().toMap
    assert(counts.values.sum == 2000)
    // md5 buckets are uniform; 80/10/10 within a loose tolerance
    assert(counts("train") > 1500 && counts("train") < 1700, counts.toString)
    assert(counts("val") > 120 && counts("val") < 280)
    assert(counts("test") > 120 && counts("test") < 280)
    // stability: a second run (different partitioning) assigns identically
    val again = Sampling.splitAssign(ids.repartition(7), "id")
    assert(assigned.select($"id", $"split").exceptAll(again.select($"id", $"split")).isEmpty)
    // salt independence: a different salt moves some ids between splits
    val other = Sampling.splitAssign(ids, "id", salt = "other")
    assert(!assigned.select($"id", $"split").exceptAll(other.select($"id", $"split")).isEmpty)
  }

  test("softFilterByScore: membership is exactly hash < score, rate tracks score") {
    // scores 0, 25k, 50k, 75k, 100k cycling over 2000 ids
    val scored = ids.withColumn("score_fp", ($"id" % 5) * 25000L)
    val kept = Sampling.softFilterByScore(scored, "id", $"score_fp")
      .as[(Long, Long)].collect().map(_._1).toSet
    // exact membership: re-derive the draw per row
    val expected = scored
      .withColumn("u", Sampling.hashBucket($"id", "graft-soft", 1000000))
      .filter($"u" < $"score_fp" * 10).as[(Long, Long, Long)].collect()
      .map(_._1).toSet
    assert(kept == expected)
    // zero-score rows never survive; full-score rows always do
    val byScore = scored.as[(Long, Long)].collect().groupBy(_._2)
    assert(byScore(0L).forall(r => !kept.contains(r._1)))
    assert(byScore(100000L).forall(r => kept.contains(r._1)))
    // keep-rate of the 50% band lands near half (portable-hash uniformity)
    val half = byScore(50000L).map(_._1)
    val rate = half.count(kept.contains).toDouble / half.length
    assert(rate > 0.4 && rate < 0.6, rate.toString)
  }

  test("sampleByHash keeps a stable subset of the requested size") {
    val s10 = Sampling.sampleByHash(ids, "id", 10)
    val n = s10.count()
    assert(n > 140 && n < 260, s"expected ~200, got $n")
    // subset property: a 20% sample contains the 10% sample (nested cuts)
    val s20 = Sampling.sampleByHash(ids, "id", 20)
    assert(s10.exceptAll(s20).isEmpty)
  }

  test("stratified sample keeps per-stratum rates and is a subset of the full set") {
    val rows = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "rare")).toDF("id", "lang")
    val kept = Sampling.stratifiedSampleByHash(rows, "id", "lang", Map("en" -> 20))
    val byLang = kept.groupBy($"lang").count().as[(String, Long)].collect().toMap
    assert(byLang("rare") == 500) // default 100%: untouched
    assert(byLang("en") > 60 && byLang("en") < 140, byLang.toString) // ~20% of 500
    // consistency with the flat sampler: same hash, same salt -> the kept
    // 'en' ids are exactly the flat 20% sample of the 'en' stratum
    val flat = Sampling.sampleByHash(rows.filter($"lang" === "en"), "id", 20)
    assert(kept.filter($"lang" === "en").exceptAll(flat).isEmpty)
    assert(flat.exceptAll(kept.filter($"lang" === "en")).isEmpty)
  }

  test("mixToTarget: kept mix tracks target, binding group whole, absent groups dropped, stable") {
    import graft.operators.Sampling
    // counts: a=3000, b=2000, c=1000; target a:b = 1:1 → K = 2000,
    // b keeps 100% (binding), a downsamples to ~2000, c (no weight) drops
    val df = (1 to 6000).map { i =>
      (i.toLong, if (i % 6 < 3) "a" else if (i % 6 < 5) "b" else "c")
    }.toDF("id", "g")
    val kept = Sampling.mixToTarget(df, "id", "g", Map("a" -> 1.0, "b" -> 1.0))
    val by = kept.groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(!by.contains("c"))
    assert(by("b") == 2000L, s"binding group must keep every row: $by")
    assert(math.abs(by("a") - 2000L) < 150, s"a should sample to ~2000: $by")
    // membership is a pure function of (id, salt): partitioning-independent
    val again = Sampling.mixToTarget(df.repartition(7), "id", "g",
      Map("a" -> 1.0, "b" -> 1.0)).select($"id").as[Long].collect().sorted
    assert(again sameElements kept.select($"id").as[Long].collect().sorted)
    // a target group with no rows cannot be mixed toward — must fail loudly,
    // not silently hand back a corpus far from the requested mix
    intercept[IllegalArgumentException] {
      Sampling.mixToTarget(df, "id", "g", Map("a" -> 1.0, "zzz" -> 1.0))
    }
  }

  test("temperatureMix: smallest group whole, larger groups at (n_min/n)^(1-a), a=1 natural") {
    // groups: small=200, big=1800
    val df = (1 to 2000).map(i => (i.toLong, if (i <= 200) "small" else "big"))
      .toDF("id", "g")
    val kept = Sampling.temperatureMix(df, "id", "g", alpha = 0.5)
      .groupBy($"g").count().as[(String, Long)].collect().toMap
    assert(kept("small") == 200L, s"smallest group must keep ~100%: $kept")
    // big keeps (200/1800)^0.5 ~ 0.333 -> ~600 rows
    assert(math.abs(kept("big") - 600L) < 80, kept.toString)
    // alpha = 1 reproduces the natural distribution (everything kept)
    val natural = Sampling.temperatureMix(df, "id", "g", alpha = 1.0).count()
    assert(natural == 2000L)
    // membership stable under repartitioning
    val again = Sampling.temperatureMix(df.repartition(7), "id", "g", alpha = 0.5)
      .select($"id").as[Long].collect().sorted
    val first = Sampling.temperatureMix(df, "id", "g", alpha = 0.5)
      .select($"id").as[Long].collect().sorted
    assert(again sameElements first)
  }

  test("negativeSample: n fresh items per user, no positives, reproducible") {
    import graft.operators.Sampling
    val pos = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "it")
    val catalog = (10L to 20L).toDF("it")
    val got = Sampling.negativeSample(pos, "u", "it", catalog, n = 3)
      .orderBy($"u", $"rank").as[(Long, Long, Long)].collect()
    assert(got.length == 6)
    val posSet = Set((1L, 10L), (1L, 11L), (2L, 10L))
    assert(got.forall { case (u, it, _) => !posSet((u, it)) })
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 1L, 2L, 3L))
    val again = Sampling.negativeSample(pos.repartition(4), "u", "it", catalog, n = 3)
      .orderBy($"u", $"rank").as[(Long, Long, Long)].collect()
    assert(again sameElements got)
  }

  test("negativeSample: duplicate catalog rows emit no repeated negatives") {
    import graft.operators.Sampling
    val pos = Seq((1L, 10L)).toDF("u", "it")
    val dupCatalog = ((10L to 15L) ++ (10L to 15L)).toDF("it") // every item twice
    val got = Sampling.negativeSample(pos, "u", "it", dupCatalog, n = 4)
      .orderBy($"rank").as[(Long, Long, Long)].collect()
    assert(got.map(_._2).distinct.length == 4, got.mkString(","))
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("negativeSampleBounded: valid ranks, no positives, loud shortfall") {
    import graft.operators.Sampling
    val pos = Seq((1L, 10L), (1L, 11L), (2L, 10L)).toDF("u", "it")
    val catalog = (10L to 40L).toDF("it")
    // full window (probe = all buckets): every user gets n clean negatives
    val got = Sampling.negativeSampleBounded(pos, "u", "it", catalog, n = 3,
        nBuckets = 8, probeBuckets = 8)
      .orderBy($"u", $"rank").as[(Long, Long, Long)].collect()
    assert(got.length == 6)
    val posSet = Set((1L, 10L), (1L, 11L), (2L, 10L))
    assert(got.forall { case (u, it, _) => !posSet((u, it)) })
    assert(got.map(_._3).toSeq == Seq(1L, 2L, 3L, 1L, 2L, 3L))
    // reproducible under repartitioning
    val again = Sampling.negativeSampleBounded(pos.repartition(4), "u", "it",
        catalog, n = 3, nBuckets = 8, probeBuckets = 8)
      .orderBy($"u", $"rank").as[(Long, Long, Long)].collect()
    assert(again sameElements got)
    // a probe window too small for n survivors raises loudly instead of
    // silently under-sampling (31 items over 1024 buckets: a 1-bucket
    // window holds ~0 items — including the zero-output-rows case a
    // row-level guard column could never see)
    val ex = intercept[Exception] {
      Sampling.negativeSampleBounded(pos, "u", "it", catalog, n = 3,
        nBuckets = 1024, probeBuckets = 1).collect()
    }
    assert(ex.getMessage.contains("probe window"),
      ex.getMessage)
  }

  test("clusterBalancedSample takes exactly perCluster per cluster, reproducibly") {
    import graft.operators.Sampling
    // two tight direction groups of 6 vectors each; k=2 seeds are ids 0/1
    val emb = ((0 to 10 by 2).map(i => (i.toLong, Array(1.0f, 0.001f * i, 0.0f))) ++
      (1 to 11 by 2).map(i => (i.toLong, Array(0.001f * i, 1.0f, 0.0f))))
      .toDF("vec_id", "embedding")
    val got = Sampling.clusterBalancedSample(emb, "vec_id", "embedding",
        k = 2, iters = 2, perCluster = 3)
      .orderBy($"vec_id").as[(Long, Int)].collect()
    assert(got.length == 6)
    assert(got.groupBy(_._2).view.mapValues(_.length).toMap == Map(0 -> 3, 1 -> 3))
    val again = Sampling.clusterBalancedSample(emb.repartition(5), "vec_id", "embedding",
        k = 2, iters = 2, perCluster = 3)
      .orderBy($"vec_id").as[(Long, Int)].collect()
    assert(again sameElements got)
  }

  test("leakageSafeSplit: clusters co-assigned, singletons match splitAssign") {
    val docs = (0L until 200L).toDF("doc_id")
    // chain 0~1, 1~2 (one cluster) and pair 10~11; everything else singleton
    val pairs = Seq((0L, 1L), (1L, 2L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = Sampling.leakageSafeSplit(docs, "doc_id", pairs)
      .select($"doc_id", $"group_id", $"split")
      .as[(Long, Long, String)].collect()
    val byId = got.map(r => r._1 -> (r._2, r._3)).toMap
    assert(got.length == 200)
    // whole chain collapses to min-id group 0, one split for all three
    assert(Seq(0L, 1L, 2L).map(byId(_)._1).toSet == Set(0L))
    assert(Seq(0L, 1L, 2L).map(byId(_)._2).toSet.size == 1)
    assert(byId(10L) == byId(11L) && byId(10L)._1 == 10L)
    // unpaired docs: own group, and the assignment equals plain splitAssign
    val plain = Sampling.splitAssign(docs, "doc_id")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    val singles = got.filter(r => !Set(0L, 1L, 2L, 10L, 11L).contains(r._1))
    assert(singles.forall(r => r._2 == r._1 && r._3 == plain(r._1)))
  }

  test("withGlobalRunningSum ≡ single-node prefix sum at any partitioning") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 500L).map(i => (i, rnd.nextInt(100).toLong))
    val expect = rows.sortBy(_._1).scanLeft((0L, 0L)) {
      case ((_, acc), (id, v)) => (id, acc + v)
    }.tail.toMap
    for (parts <- Seq(1, 3, 16, 64)) { // 64 > |rows|/8: exercises empty partitions
      val got = Sampling.withGlobalRunningSum(
          rows.toDF("id", "v").repartition(5), // arbitrary input layout
          Seq($"id"), $"v", "cum", partitions = parts)
        .select($"id", $"cum").as[(Long, Long)].collect().toMap
      assert(got == expect, s"parts=$parts")
    }
  }

  test("tokenBudgetSelect: kept set is the exact order prefix within budget") {
    val docs = Seq(
      (1L, "a b c"),          // 3 tokens, cum 3
      (2L, "d e f g"),        // 4, cum 7
      (3L, "h i"),            // 2, cum 9
      (4L, "j k l m n")       // 5, cum 14 > 10 — excluded
    ).toDF("doc_id", "text")
    val got = Sampling.tokenBudgetSelect(docs, "doc_id",
        size(split(trim($"text"), "\\s+")), Seq($"doc_id"), budget = 10L)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect()
    assert(got sameElements Array((1L, 3L, 3L), (2L, 4L, 7L), (3L, 2L, 9L)),
      got.mkString(","))
    // empty input: no rows, machinery survives zero partials
    val empty = Sampling.tokenBudgetSelect(docs.limit(0), "doc_id",
      size(split(trim($"text"), "\\s+")), Seq($"doc_id"), budget = 10L)
    assert(empty.count() == 0)
  }

  test("tokenBudgetSelect: best-first order spends the budget on high scores") {
    // order by (score desc, id): doc 3 (best) then doc 1 fill the budget;
    // doc 2 would fit alone but the prefix rule has already passed it over
    val docs = Seq(
      (1L, "a b c", 0.5),   // 3 tokens
      (2L, "d e", 0.1),     // 2 tokens
      (3L, "f g h i", 0.9)  // 4 tokens
    ).toDF("doc_id", "text", "score")
    val got = Sampling.tokenBudgetSelect(docs, "doc_id",
        size(split(trim($"text"), "\\s+")), Seq($"score".desc, $"doc_id"), budget = 8L)
      .orderBy($"doc_id").as[(Long, Long, Long)].collect()
    assert(got sameElements Array((1L, 3L, 7L), (3L, 4L, 4L)), got.mkString(","))
  }

  test("groupBudgetSelect: independent per-group prefixes under one quota") {
    val docs = Seq(
      (1L, "s1", "a b c"),      // s1 cum 3
      (2L, "s1", "d e f g"),    // s1 cum 7 > 5 — out
      (3L, "s2", "h i"),        // s2 cum 2
      (4L, "s2", "j k l"),      // s2 cum 5 — exactly the quota, kept
      (5L, "s2", "m")           // s2 cum 6 — out
    ).toDF("doc_id", "source", "text")
    val got = Sampling.groupBudgetSelect(docs, "doc_id", "source",
        size(split(trim($"text"), "\\s+")), Seq($"doc_id"), budgetPerGroup = 5L)
      .orderBy($"doc_id").select($"doc_id", $"cum_tokens")
      .as[(Long, Long)].collect()
    assert(got sameElements Array((1L, 3L), (3L, 2L), (4L, 5L)), got.mkString(","))
  }
}
