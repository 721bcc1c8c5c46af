package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, Versioning}
import graft.sources.Tables

class VersioningSpec extends GraftSuite {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("corpusDiff labels added/removed/changed/unchanged exactly") {
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "bravo"), (3L, "charlie CHANGED"), (4L, "delta")
    ).toDF("doc_id", "text")
    val got = Versioning.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff of a snapshot against itself is all unchanged") {
    val statuses = Versioning.corpusDiff(docs, docs)
      .select("status").distinct().as[String].collect().toSet
    assert(statuses === Set("unchanged"))
    assert(Versioning.corpusDiff(docs, docs).count() === docs.count())
  }

  test("diffSummary counts reconcile with the per-doc diff") {
    val oldSnap = docs.filter(col("doc_id") % 3 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
    val summary = Versioning.diffSummary(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.values.sum ===
      Versioning.corpusDiff(oldSnap, newSnap).count())
    // %3==0 docs not divisible by 5 exist only in new; %5==0 not by 3 only
    // in old; text is untouched so nothing is 'changed'
    assert(summary("added") > 0 && summary("removed") > 0)
    assert(!summary.contains("changed"))
  }

  test("qualityCutoff keeps exactly the docs at/above the p75 quality value") {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cutoffKept = TextAnalysis.qualityCutoff(docs, 0.75).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cutoffKept.nonEmpty)
    val minKept = cutoffKept.values.min
    // kept = every doc at/above the smallest kept score (value cutoff, so
    // ties are all-in); roughly the top quartile
    assert(scored.filter(_._2 >= minKept).keySet === cutoffKept.keySet)
    val frac = cutoffKept.size.toDouble / scored.size
    assert(frac >= 0.2 && frac <= 0.35, s"kept fraction $frac")
  }

  test("content-hash split partitions the corpus with sane proportions") {
    import spark.implicits._
    val split = TextAnalysis.splitByHash(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(split.length === docs.count())
    val frac = split.groupBy(_._2).view.mapValues(_.length.toDouble / split.length)
    assert(frac("train") > 0.8 && frac.getOrElse("val", 0.0) < 0.15 &&
      frac.getOrElse("test", 0.0) < 0.15)
    // byte-identical content lands in the same split (leakage safety)
    val twins = Seq((1000001L, "twin text payload"), (1000002L, "twin text payload"))
      .toDF("doc_id", "text")
    val s2 = TextAnalysis.splitByHash(twins).select("split")
      .collect().map(_.getString(0)).distinct
    assert(s2.length === 1)
  }

  test("tf-idf surfaces a doc's distinctive rare term above common ones") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the cat sat on the mat with zyggurat zyggurat zyggurat"),
      (2L, "the dog sat on the log near the fire"),
      (3L, "the bird sat on the wire by the sea")
    ).toDF("doc_id", "text")
    val top = TextAnalysis.tfIdfKeywords(fixture, k = 1).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(top(1L) === "zyggurat")
    // at most k rows per doc on the real corpus
    val perDoc = TextAnalysis.tfIdfKeywords(docs, k = 5)
      .groupBy("doc_id").count().collect()
    assert(perDoc.forall(_.getLong(1) <= 5))
  }

  test("gopher filter drops exactly the rule-violating fixtures") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"), // clean
      (2L, "a b"),                                   // too few tokens
      (3L, "the 99 11 22 33 44 55 66 77 88"),        // alpha_frac < 0.8
      (4L, "the cat the cat the cat the cat the cat"), // repetition
      (5L, "zz yy xx ww vv uu tt ss rr qq")          // no stopwords
    ).toDF("doc_id", "text")
    val got = TextAnalysis.gopherFilter(fixture).collect()
      .map(r => r.getLong(0) -> r.getInt(6)).toMap
    assert(got === Map(1L -> 1, 2L -> 0, 3L -> 0, 4L -> 0, 5L -> 0))
  }

  test("unigram logprob ranks common-token docs above rare-token docs") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "the the the the the the the the"), // all high-frequency
      (2L, "the the the the zzyzx qwfp vlurm"), // rare tail mixed in
      (3L, "zzyzx qwfp vlurm xylo kzzt brrk")  // all singletons
    ).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogProb(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got(1L) > got(2L) && got(2L) > got(3L))
    // token accounting on the real corpus
    val docs500 = docs
    val sumTokens = TextAnalysis.unigramLogProb(docs500)
      .agg(sum("n_tokens")).collect()(0).getLong(0)
    val expected = docs500
      .select(size(expr(TextAnalysis.tokensExpr)).as("n")).agg(sum("n"))
      .collect()(0).getLong(0)
    assert(sumTokens === expected)
  }

  test("token budget plan water-fills: small sources whole, large throttled") {
    import spark.implicits._
    def doc(id: Long, src: String, n: Int) =
      (id, Seq.fill(n)("w").mkString(" "), src)
    // A: 10 tokens, B: 100, C: 1000; budget 200 → A whole (10 < the 95
    // level), B and C throttled to the common level 95
    val docs3 = Seq(doc(1, "A", 10), doc(2, "B", 100), doc(3, "C", 1000))
      .toDF("doc_id", "text", "source")
    val plan = TextAnalysis.tokenBudgetPlan(docs3, 200L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getInt(2)))).toMap
    assert(plan("A") === ((10L, 1000)))
    assert(plan("B") === ((100L, 950)))  // floor(1000·95/100)
    assert(plan("C") === ((1000L, 95))) // floor(1000·95/1000)
    // kept tokens hit the budget up to flooring loss (< 1‰ per source)
    val kept = plan.values.map { case (t, p) => t * p / 1000.0 }.sum
    assert(kept <= 200.0 + 1e-9 && kept > 200.0 - 3.0)
    // budget >= total → every source kept whole
    val all = TextAnalysis.tokenBudgetPlan(docs3, 5000L).collect()
      .map(_.getInt(2))
    assert(all.forall(_ === 1000))
    // a larger source never gets a HIGHER keep rate (level is common)
    val real = TextAnalysis.tokenBudgetPlan(docs, 10000L).collect()
      .map(r => (r.getLong(1), r.getInt(2))).sortBy(_._1)
    assert(real.zip(real.tail).forall { case ((_, p1), (_, p2)) => p1 >= p2 })
  }

  test("bigram logprob separates coherent from scrambled text; unigram cannot") {
    import spark.implicits._
    // doc 1 and doc 2 are TOKEN-MULTISET-identical — doc 2 is doc 1 with
    // its word order scrambled. A unigram model scores them EXACTLY equal;
    // the bigram model must rank the coherent one higher because its
    // transitions recur across the corpus (docs 3-6 repeat the phrase).
    val phrase = "the quick brown fox jumps over the lazy dog"
    val scrambled = "dog the over quick lazy fox brown jumps the"
    val fixture = (Seq((1L, phrase), (2L, scrambled))
      ++ (3L to 6L).map(i => (i, phrase))).toDF("doc_id", "text")
    val bi = TextAnalysis.bigramLogProb(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val uni = TextAnalysis.unigramLogProb(fixture).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(uni(1L) === uni(2L),
      "unigram must be blind to word order (same token multiset)")
    assert(bi(1L) > bi(2L),
      s"bigram must prefer coherent transitions: ${bi(1L)} !> ${bi(2L)}")
    // bigram accounting: every doc with ≥2 tokens contributes len−1 grams
    val nB = TextAnalysis.bigramLogProb(docs).agg(sum("n_bigrams"))
      .collect()(0).getLong(0)
    val expected = docs
      .select(size(expr(TextAnalysis.tokensExpr)).as("n"))
      .filter(col("n") >= 2).agg(sum(col("n") - 1))
      .collect()(0).getLong(0)
    assert(nB === expected)
  }

  test("length histogram accounts for every document exactly once") {
    val hist = TextAnalysis.lengthHistogram(docs).collect()
    assert(hist.map(_.getLong(1)).sum === docs.count())
    hist.foreach { r =>
      val (bucket, mn, mx) = (r.getLong(0), r.getInt(3), r.getInt(4))
      assert(mn >= bucket * 16 && mx < (bucket + 1) * 16)
    }
  }

  test("quality tiers bucket monotonically and spread near-evenly") {
    val tiers = TextAnalysis.qualityTiers(docs, tiers = 10).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2)))
    assert(tiers.map(_._3).distinct.sorted.toSeq === (0 to 9))
    // monotone: a higher score never lands in a lower tier
    val sorted = tiers.sortBy(_._2)
    assert(sorted.map(_._3).sliding(2).forall(p => p(0) <= p(1)))
    // deciles over 500 docs: each tier within a loose band around 50
    val sizes = tiers.groupBy(_._3).view.mapValues(_.length)
    assert(sizes.values.forall(n => n >= 25 && n <= 85), sizes.toMap.toString)
  }

  test("per-source cap keeps at most maxDocs per source, deterministically") {
    val capped = TextAnalysis.capPerSource(docs, maxDocs = 10)
    val perSource = capped.groupBy("source").count().collect()
    assert(perSource.forall(_.getLong(1) <= 10))
    // sources with >10 docs are capped exactly at 10
    val bigSources = docs.groupBy("source").count()
      .filter(col("count") > 10).collect().map(_.getString(0)).toSet
    val cappedAt = perSource.filter(r => bigSources(r.getString(0)))
    assert(cappedAt.nonEmpty && cappedAt.forall(_.getLong(1) === 10))
    // deterministic across runs
    val again = TextAnalysis.capPerSource(docs, maxDocs = 10)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(again === capped.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("approx quality cutoff lands near the exact one") {
    val exact = TextAnalysis.qualityCutoff(docs, 0.75).count().toDouble
    val approx = TextAnalysis.qualityCutoffApprox(docs, 0.75).count().toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx kept $approx vs exact $exact")
  }

  test("temperature sampling: largest language keeps base rate, rarer keep more") {
    val out = TextAnalysis.sampleTemperature(docs, alpha = 0.5,
      basePermille = 200)
    val rates = out.select("lang_guess", "keep_permille").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rates.nonEmpty)
    val langCounts = TextAnalysis.langId(docs)
      .groupBy("lang_guess").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val biggest = langCounts.maxBy(_._2)._1
    assert(rates(biggest) === 200)
    assert(rates.values.forall(r => r >= 200 && r <= 1000))
    // flattening is monotone: smaller stratum -> keep-rate at least as high
    val bySize = langCounts.toSeq.sortBy(_._2).map(_._1)
    val ordered = bySize.map(rates)
    assert(ordered.zip(ordered.tail).forall { case (small, big) => small >= big })
    // deterministic: rerun yields the identical sample
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = TextAnalysis.sampleTemperature(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a === b)
  }

  test("shard plan covers the corpus; assignment is a seeded deal") {
    val docs = Tables.documents(spark, sf)
    val n = docs.count()
    val plan = TextAnalysis.shardPlan(docs, nShards = 16).collect()
    assert(plan.map(_.getLong(1)).sum == n, "every doc lands in one shard")
    assert(plan.length == 16 && plan.forall(_.getLong(1) > 0),
      "hash dealing must populate every shard at corpus size >> shards")
    // deterministic per seed; a different seed re-deals
    val a1 = TextAnalysis.shardAssign(docs).select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val a2 = TextAnalysis.shardAssign(docs).select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 == a2)
    val reDealt = TextAnalysis.shardAssign(docs, seed = "v2")
      .select("doc_id", "shard")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(a1 != reDealt, "changing the seed must re-deal the corpus")
  }
}
