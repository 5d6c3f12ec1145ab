package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Sampling, TextAnalysis}

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

  test("chunk: overlap continuity, full coverage, no redundant tail chunk") {
    val text = ("abcdefghij" * 30) // 300 chars
    val docs = Seq((1L, text), (2L, "tiny")).toDF("doc_id", "text")
    val chunks = graft.operators.TextAnalysis.chunk(docs, "doc_id", "text",
        size = 100, overlap = 20)
      .orderBy($"doc_id", $"chunk_id").as[(Long, Long, String)].collect()
    val d1 = chunks.filter(_._1 == 1L).map(_._3)
    // starts at 1, 81, 161, 241 (bound: len-overlap = 280)
    assert(d1.length == 4)
    assert(d1(0) == text.substring(0, 100) && d1(1) == text.substring(80, 180))
    // consecutive chunks share exactly `overlap` chars
    assert(d1(0).takeRight(20) == d1(1).take(20))
    // union of chunks reconstructs the document (dedup the overlaps)
    assert(d1.head + d1.tail.map(_.drop(20)).mkString == text)
    // short doc -> one whole-doc chunk
    assert(chunks.filter(_._1 == 2L).map(_._3).toSeq == Seq("tiny"))
  }

  test("packSequences: packs cut at the budget, ids reproducible across partitionings") {
    val docs = (1L to 100L).map(i => (i, "w " * 40, "g")).toDF("doc_id", "text", "lang")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TextAnalysis.packSequences(df, "doc_id",
        size(split(trim($"text"), "\\s+")), budget = 100L, groupCol = "lang")
        .orderBy($"doc_id").as[(String, Long, Long, Long, Long)].collect()
    val got = run(docs)
    // 40 tokens/doc, budget 100: packs hold docs starting at offsets 0,40,80 ->
    // pack 0 gets 3 docs (starts 0/40/80), then the stream continues
    assert(got.take(3).map(_._5).toSeq == Seq(0L, 0L, 0L))
    assert(got(3)._5 == 1L) // starts at cum 120 -> pack 1
    // deterministic under repartitioning (window order is the contract)
    assert(run(docs.repartition(7)) sameElements got)
  }

  test("qualityFlags: each rule trips on its own pathology") {
    // 24 distinct words: unique bigrams, stopwords present, mean len ~4.8
    val good = "the quick brown fox jumps over lazy dogs and runs into green " +
      "fields while birds sing songs about bright morning sunshine near quiet rivers"
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, "too short to keep"),                    // word count
      (3L, ("a b c d " * 20).trim),                 // mean word length < 3
      (4L, good + " " + ("$$$ ###" * 40)),          // symbol share > 10%
      (5L, ("lorem ipsum dolor " * 20).trim),       // no English stopwords
      (6L, good + " " + ("spam spam " * 60).trim))  // bigram repetition
      .toDF("doc_id", "text")
    val flags = graft.operators.TextAnalysis.qualityFlags(docs, "doc_id", "text", minWords = 20)
      .orderBy($"doc_id")
      .select($"doc_id", $"ok_word_count", $"ok_word_len", $"ok_symbols",
        $"ok_stopwords", $"ok_repetition", $"keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(flags(0) == ((1L, true, true, true, true, true, true)))
    assert(!flags(1)._2 && !flags(1)._7) // short
    assert(!flags(2)._3)                 // tiny words
    assert(!flags(3)._4)                 // symbol-heavy
    assert(!flags(4)._5)                 // stopword-free
    assert(!flags(5)._6 && !flags(5)._7) // repetitive
  }

  test("unigramLogProb: rare-token gibberish scores below typical text") {
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the dog sat on the rug"),
      (3L, "the cat and the dog sat"),
      (4L, "zqxv jkwp mbfg tyhn qplz")) // tokens seen nowhere else
      .toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(corpus, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(got.map(_._2).forall(_ >= 5L)) // token counts carried through
    val scores = got.map(r => r._1 -> r._3).toMap
    assert(scores(4L) < scores(1L) && scores(4L) < scores(2L) && scores(4L) < scores(3L),
      scores.toString)
    // sanity: probabilities, so every avg log-prob is negative
    assert(scores.values.forall(_ < 0))
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

  test("compressionRatio: repetitive < prose < random; empty is null; deterministic") {
    import graft.operators.TextAnalysis
    val rnd = new scala.util.Random(11)
    val random = rnd.alphanumeric.take(400).mkString
    val df = Seq(
      (1L, "spam ham " * 50),                               // repetitive
      (2L, ("the quick brown fox jumps over the lazy dog " +
        "a stitch in time saves nine all that glitters is not gold ") * 4),
      (3L, random),                                          // incompressible-ish
      (4L, "")).toDF("doc_id", "text")
    val got = TextAnalysis.compressionRatio(df, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Option[Double])].collect()
    val r = got.map(x => x._1 -> x._3).toMap
    assert(r(1L).get < r(2L).get && r(2L).get < r(3L).get, r.toString)
    assert(r(4L).isEmpty)
    // pure per-row function: repartitioning changes nothing
    val again = TextAnalysis.compressionRatio(df.repartition(5), "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Option[Double])].collect()
    assert(again sameElements got)
  }

  test("spanCorrupt: lossless reassembly, sentinel placement, short docs dropped") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "one two three"), // 3 tokens <= spanLen+1 -> dropped
      (3L, "w x y z q r s t")).toDF("doc_id", "text")
    val got = TextAnalysis.spanCorrupt(df, "doc_id", "text", spanLen = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String, String)].collect()
    assert(got.map(_._1) sameElements Array(1L, 3L))
    got.foreach { case (_, n, st, input, target) =>
      assert(st >= 0 && st <= n - 2 - 1)
      val masked = target.split(" ").drop(1) // after the sentinel
      assert(masked.length == 2)
      // splicing the target back into the sentinel recovers the original
      val rebuilt = input.replace("<extra_id_0>", masked.mkString(" "))
      assert(rebuilt.split(" ").length == n)
    }
    // deterministic: same ids -> same spans on any partitioning
    val again = TextAnalysis.spanCorrupt(df.repartition(3), "doc_id", "text", spanLen = 2)
      .orderBy($"doc_id").as[(Long, Long, Long, String, String)].collect()
    assert(again sameElements got)
  }

  test("tokenEntropy: repeated token ~0, uniform distinct = ln(n)") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "spam spam spam spam"),
      (2L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenEntropy(df, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got(0) == ((1L, 4L, 1L, -0.0)) || got(0) == ((1L, 4L, 1L, 0.0)))
    assert(got(1)._2 == 4L && got(1)._3 == 4L)
    assert(math.abs(got(1)._4 - math.log(4.0)) < 1e-5)
  }

  test("oovRate counts token instances outside the vocabulary") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "known known rare"),
      (2L, "known known known")).toDF("doc_id", "text")
    val vocab = TextAnalysis.vocabulary(docs, "doc_id", "text", minCount = 3L)
    // only 'known' (5 instances) clears minCount=3; 'rare' is OOV
    val got = TextAnalysis.oovRate(docs, "doc_id", "text", vocab)
      .orderBy($"doc_id").as[(Long, Long, Long, Double)].collect()
    assert(got sameElements Array((1L, 3L, 1L, 1.0 / 3.0), (2L, 3L, 0L, 0.0)))
  }

  test("normalizeText folds typography, case, and whitespace runs") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "  “Hello—World”\t\tIt’s   FINE \n"),
      (2L, "already clean"),
      (3L, "")).toDF("id", "t")
    val got = df.select($"id", TextAnalysis.normalizeText($"t").as("n"))
      .orderBy($"id").as[(Long, String)].collect()
    assert(got sameElements Array(
      (1L, "\"hello-world\" it's fine"), (2L, "already clean"), (3L, "")))
  }

  test("sentences splits on terminator runs and keeps the unterminated tail") {
    import graft.operators.TextAnalysis
    val df = Seq(
      (1L, "One. Two!! Three?  tail no dot"),
      (2L, "no punctuation at all"),
      (3L, "...")).toDF("id", "t")
    val got = TextAnalysis.sentences(df, "id", "t")
      .orderBy($"id", $"sent_idx").as[(Long, Long, String)].collect()
    assert(got sameElements Array(
      (1L, 0L, "One."), (1L, 1L, "Two!!"), (1L, 2L, "Three?"), (1L, 3L, "tail no dot"),
      (2L, 0L, "no punctuation at all"), (3L, 0L, "...")))
  }

  test("bigramLogProb: shuffled word order scores below natural order") {
    import graft.operators.TextAnalysis
    val corpus = Seq(
      (1L, "the cat sat on the mat"),
      (2L, "the cat sat on the rug"),
      (3L, "the cat sat on the hat"),
      (4L, "mat the on sat cat the"), // same unigrams, unseen-order bigrams
      (5L, "solo")) // single token: no bigram, absent from output
      .toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogProb(corpus, "doc_id", "text")
      .orderBy($"doc_id").as[(Long, Long, Double)].collect()
    assert(got.map(_._1) sameElements Array(1L, 2L, 3L, 4L))
    assert(got.forall(_._2 == 5L)) // 6 tokens -> 5 bigram instances
    val scores = got.map(r => r._1 -> r._3).toMap
    // doc 4 shares every unigram with docs 1-3 but none of the common
    // bigrams: only the interpolated back-off saves it from -inf, and it
    // must score strictly below the naturally-ordered docs
    assert(scores(4L) < scores(1L) && scores(4L) < scores(2L) && scores(4L) < scores(3L),
      scores.toString)
    assert(scores.values.forall(_ < 0))
  }

  test("tfIdfTopTerms ranks rare terms above ubiquitous ones") {
    val docs = Seq(
      (1L, "common zebra zebra"),
      (2L, "common quartz quartz"),
      (3L, "common plain words here")).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", k = 1)
      .select($"doc_id", $"term").as[(Long, String)].collect().toMap
    // 'common' appears in every doc (df=3); the doc-unique terms win even
    // against tf=2 'common'
    assert(top(1L) == "zebra")
    assert(top(2L) == "quartz")
  }
}
