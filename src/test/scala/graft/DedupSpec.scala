package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup
import graft.sources.Tables

class DedupSpec extends GraftSuite {

  private lazy val docs = Tables.documents(spark, sf)

  /** Naive reference Levenshtein — the spec's independent oracle. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) =>
      if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("one-pass simhash_sig is bit-identical to the exploded aggregate pipeline") {
    // r19 replaced simhash/simhashWide's explode → per-token hash →
    // 32/64 sum(CASE) aggregates → groupBy(doc) with one codegen'd pass
    // per document; the near-dup band stores and three oracle-checked
    // queries inherit the values, so parity must be EXACT — pinned here
    // against the legacy aggregate formula inlined verbatim, over the
    // real documents fixture plus edge docs (empty-ish/whitespace text).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edge = Seq((900001L, ""), // split("") = [""] — one empty token
      (900002L, "  leading and trailing whitespace padded text here  "),
      (900003L, "one"), (900004L, "repeat repeat repeat"))
      .toDF("doc_id", "text")
    val fixture = docs.select(col("doc_id"), col("text")).unionByName(edge)
    for (wide <- Seq(false, true)) {
      val bits = if (wide) 64 else 32
      val got = (if (wide) Dedup.simhashWide(fixture) else Dedup.simhash(fixture))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      // the legacy pipeline, verbatim: explode tokens → ±1 bit sums → sign
      val tokens = fixture
        .select(col("doc_id"),
          expr(graft.operators.TextAnalysis.tokensExpr).as("toks"))
        .select(col("doc_id"), explode(col("toks")).as("t"))
        .select(col("doc_id"),
          expr(graft.functions.Hashing.hash64("t")).as("h1"),
          expr(graft.functions.Hashing.hash64Hi("t")).as("h2"))
      val bitSums = (0 until bits).map { j =>
        val (src, b) = if (j < 32) ("h1", j) else ("h2", j - 32)
        sum(when(expr(s"(shiftright($src, $b) & 1) = 1"), 1).otherwise(-1))
          .as(s"b_$j")
      }
      val want = tokens.groupBy(col("doc_id"))
        .agg(bitSums.head, bitSums.tail: _*)
        .select(col("doc_id"),
          (0 until bits).map(j =>
            when(col(s"b_$j") > 0, lit(1L << j)).otherwise(lit(0L)))
            .reduce(_ + _).as("simhash"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got.keySet === want.keySet,
        s"wide=$wide: doc coverage differs (${got.size} vs ${want.size})")
      val diffs = got.collect { case (id, s) if want(id) != s => id }
      assert(diffs.isEmpty, s"wide=$wide: signatures differ: ${diffs.take(5)}")
    }
  }

  test("one-pass gram_hashes is bit-identical to the exploded concat pipeline") {
    // r19 replaced shingleRows/positionalGramRows' sequence-explode →
    // per-gram `toks[i] || ' ' || …` → md5-hex → conv(substring) with one
    // incremental-digest pass per document; every shingle-family surface
    // (ngram Jaccard, decontamination eval arrays, substring dedup)
    // inherits the hashes, so parity must be EXACT — pinned against the
    // legacy formula inlined verbatim, over the real fixture plus ragged
    // edge docs (leading/trailing whitespace → empty tokens).
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val edge = Seq((900001L, "a b"), // < n tokens at n=3: no grams
      (900002L, "  leading and trailing whitespace padded text here  "),
      (900003L, "exactly three tokens"),
      (900004L, "multi   interior    spaces collapse to empty tokens"))
      .toDF("doc_id", "text")
    val fixture = docs.select(col("doc_id"), col("text")).unionByName(edge)
    for (n <- Seq(3, 8)) {
      val got = Dedup.positionalGramRows(fixture, n)
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      val cat = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
      val want = fixture
        .select(col("doc_id"),
          expr(graft.operators.TextAnalysis.tokensExpr).as("toks"))
        .filter(size(col("toks")) >= n)
        .select(col("doc_id"), col("toks"),
          explode(expr(s"sequence(0, size(toks) - $n)")).as("i"))
        .select(col("doc_id"), col("i").cast("int").as("i"),
          expr(graft.functions.Hashing.hash64(s"($cat)")).as("h1"),
          expr(graft.functions.Hashing.hash64Hi(s"($cat)")).as("h2"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3)))
        .toSet
      assert(got === want, s"n=$n: gram hashes drifted from the legacy " +
        s"concat pipeline (${got.size} vs ${want.size} rows)")
    }
  }

  test("one-pass minhash_sig is bit-identical to the exploded SQL pipeline") {
    // round 13 replaced minhashSignatures' explode → per-shingle md5 →
    // groupBy(doc) shuffle with one codegen'd pass per document; every
    // MinHash surface (band stores, Jaccard estimates, the guard's
    // near-dup stage) inherits its values, so parity must be EXACT —
    // pinned here against the legacy formula inlined verbatim, over the
    // real documents fixture plus the edge docs the filter used to drop
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = 16
    val n = 3
    val edge = Seq((900001L, "one two"), // < n tokens: no signature
      (900002L, "  leading and trailing whitespace padded text here  "),
      (900003L, "exactly three tokens")).toDF("doc_id", "text")
    val fixture = docs.select(col("doc_id"), col("text")).unionByName(edge)
    val got = Dedup.minhashSignatures(fixture, k, n)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    // the legacy pipeline, verbatim (shingle rows -> k min aggregates)
    val cat = (0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")
    val mins = (0 until k).map(i =>
      min(col("h1") + lit(i.toLong) *
        col("h2").bitwiseAND(lit(graft.functions.Hashing.maskKM)))
        .as(s"m_$i"))
    val want = fixture
      .select(col("doc_id"),
        expr(graft.operators.TextAnalysis.tokensExpr).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(col("doc_id"), col("toks"),
        explode(expr(s"sequence(0, size(toks) - $n)")).as("i"))
      .select(col("doc_id"),
        expr(graft.functions.Hashing.hash64(s"($cat)")).as("h1"),
        expr(graft.functions.Hashing.hash64Hi(s"($cat)")).as("h2"))
      .groupBy(col("doc_id")).agg(mins.head, mins.tail: _*)
      .select(col("doc_id"),
        array((0 until k).map(i => col(s"m_$i")): _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toVector).toMap
    assert(got.size === want.size && got.keySet === want.keySet,
      s"doc coverage differs: ${got.size} vs ${want.size}")
    assert(!got.contains(900001L), "sub-n-token doc must yield no signature")
    val diffs = got.collect { case (id, s) if want(id) != s => id }
    assert(diffs.isEmpty, s"signatures differ for docs: ${diffs.take(5)}")
  }

  test("minhash banding recalls high-jaccard pairs (16 hashes, 4 bands)") {
    // expected recall for jaccard s: 1-(1-s^4)^4 — ~0.88 at s=0.8
    val exactHigh = Dedup.ngramJaccardPairs(docs, threshold = 0.8)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val candidates = Dedup.minhashCandidatePairs(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    if (exactHigh.nonEmpty) {
      val recall = exactHigh.count(candidates.contains).toDouble / exactHigh.size
      assert(recall >= 0.5,
        s"recall $recall over ${exactHigh.size} high-similarity pairs")
    }
    assert(candidates.nonEmpty)
  }

  test("simhash near-dups include exact duplicates at hamming 0") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "totally different words entirely here now")).toDF("doc_id", "text")
    val pairs = Dedup.simhashNearDups(corpus)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.exists { case (a, b, h) => a == 1L && b == 2L && h == 0 })
  }

  test("wide simhash near-dups match exact all-pairs hamming on the fixture") {
    import spark.implicits._
    // the 64-bit / 16-bit-band scale variant must be EXACT for hamming ≤ 3
    // (4 bands over 64 bits pigeonhole ≤3 flipped bits): compare against a
    // naive cross-join over the real sf0.001 documents table
    val docs = graft.sources.Tables.documents(spark, sf)
    val got = Dedup.simhashWideNearDups(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sig = Dedup.simhashWide(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val want = (for {
      (ida, sa) <- sig; (idb, sb) <- sig if ida < idb
      if java.lang.Long.bitCount(sa ^ sb) <= 3
    } yield (ida, idb)).toSet
    assert(got === want, "wide-band candidates must equal exact hamming ≤ 3")
    // the wide signature actually uses the high 32 bits (the whole point:
    // 65,536-value bands, not 256)
    assert(sig.exists { case (_, s) => (s >>> 32) != 0L },
      "no signature used its high 32 bits — wide simhash is not wide")
    val bandVals = Dedup.simhashBandsN(
      Dedup.simhashWide(docs), 16).select("band_byte")
      .collect().map(_.getInt(0))
    assert(bandVals.exists(_ > 255), "16-bit bands should exceed byte range")
    assert(bandVals.forall(v => v >= 0 && v <= 65535))
  }

  test("canonicalFromPairs reaches the fixpoint on a chain A~B~C~D") {
    import spark.implicits._
    val chainDocs = Seq(10L, 20L, 30L, 40L, 99L).toDF("doc_id")
    // chain 10~20, 20~30, 30~40 (transitive component) + isolated 99
    val pairs = Seq((10L, 20L), (20L, 30L), (30L, 40L)).toDF("doc_a", "doc_b")
    val expected = Map(10L -> 10L, 20L -> 10L, 30L -> 10L, 40L -> 10L,
      99L -> 99L)
    // distributed fixpoint — the over-threshold 100 TB path, forced
    val fixpoint = Dedup.canonicalFromPairs(chainDocs, pairs,
      maxDriverPairs = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fixpoint === expected)
    // adaptive driver union-find (the default small-pair-set path) must
    // agree exactly
    val driver = Dedup.canonicalFromPairs(chainDocs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(driver === expected)
  }

  test("union-find and distributed fixpoint agree on the real banding graph") {
    val pairs = Dedup.minhashCandidatePairs(docs).localCheckpoint(true)
    val viaUf = Dedup.canonicalFromPairs(docs, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaFixpoint = Dedup.canonicalFromPairs(docs, pairs, maxDriverPairs = 0)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUf === viaFixpoint)
  }

  test("decontamination flags exactly the docs sharing an n-gram with the eval set") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps high"),     // shares "quick brown fox"
      (2L, "completely unrelated training text here"),
      (3L, "short doc"),                          // < 3 tokens: no shingles
      (4L, "a quick brown fox appears again"))    // shares it too
      .toDF("doc_id", "text")
    val eval_ = Seq((100L, "benchmark with the quick brown fox inside"))
      .toDF("doc_id", "text")
    val out = Dedup.decontaminate(corpus, eval_)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(out(1L)._2 === 1 && out(1L)._1 >= 1)
    assert(out(4L) === ((1L, 1)))  // exactly "quick brown fox" overlaps
    assert(out(2L) === ((0L, 0)))
    assert(out(3L) === ((0L, 0))) // shingle-less docs are never flagged
    assert(out.keySet === Set(1L, 2L, 3L, 4L))

    // graded twin: same numerators, denominator = distinct shingles,
    // frac > 0 exactly where the boolean form flags
    val frac = Dedup.contaminationFraction(corpus, eval_)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3))))
      .toMap
    frac.foreach { case (id, (nSh, nOv, f)) =>
      assert(nOv === out(id)._1, s"doc $id overlap count diverged")
      assert((f > 0.0) === (out(id)._2 == 1), s"doc $id flag/frac mismatch")
      assert(f >= 0.0 && f <= 1.0 && nOv <= nSh)
    }
    // doc 4 "a quick brown fox appears again": 4 distinct shingles, 1 hit
    assert(frac(4L) === ((4L, 1L, 0.25)))
    assert(frac(3L) === ((0L, 0L, 0.0))) // shingle-less: 0/max(0,1)
  }

  test("sequence packing conserves chunks and respects the start-offset budget") {
    val chunks = graft.operators.TextAnalysis
      .chunkDocuments(docs, maxTokens = 32, overlap = 8)
    val packed = graft.operators.TextAnalysis
      .packSequences(docs, maxTokens = 32, overlap = 8, budget = 96)
    // conservation: every chunk lands in exactly one sequence
    assert(packed.agg(sum("n_chunks")).first().getLong(0) === chunks.count())
    // each sequence's token load is bounded by budget + one straddling
    // chunk (the pack-then-truncate contract) except nothing exceeds
    // budget + maxTokens
    val over = packed.filter(col("seq_tokens") > 96 + 32)
    assert(over.count() === 0)
  }

  test("chunking covers every token with the configured overlap") {
    val chunks = graft.operators.TextAnalysis
      .chunkDocuments(docs, maxTokens = 32, overlap = 8)
    // per doc: sum of chunk tokens == n_tokens + overlap * (n_chunks - 1)
    val agg = chunks.groupBy("doc_id")
      .agg(sum("n_tokens").as("chunk_token_sum"),
        count(lit(1)).as("n_chunks")).alias("c")
    val toks = docs.select(col("doc_id"),
      size(expr(graft.operators.TextAnalysis.tokensExpr)).as("n_tokens"))
      .alias("t")
    val bad = agg.join(toks, "doc_id")
      .filter(col("chunk_token_sum") =!=
        col("n_tokens") + lit(8) * (col("n_chunks") - 1))
    assert(bad.count() === 0)
  }

  test("incremental dedup flags exact and near duplicates of the reference") {
    import spark.implicits._
    val base = "one two three four five six seven eight nine ten eleven " +
      "twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen"
    val ref = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, base + " twenty")
    ).toDF("doc_id", "text")
    val fresh = Seq(
      // exact copy of ref 1 (whitespace-normalized) -> exact + near
      (10L, "  Alpha beta gamma delta epsilon zeta eta theta "),
      // one token changed out of 20 -> near only (17/19 shingles shared)
      (11L, base + " TWENTY_V2"),
      // novel -> neither
      (12L, "completely different content with no shared shingles at all")
    ).toDF("doc_id", "text")
    val got = Dedup.incrementalDedup(fresh, ref).collect()
      .map(r => r.getLong(0) -> ((r.getBoolean(1), r.getBoolean(2)))).toMap
    assert(got(10L) === ((true, true)))
    assert(got(11L) === ((false, true)))
    assert(got(12L) === ((false, false)))
  }

  test("cluster-size distribution accounts for the whole corpus") {
    val dist = Dedup.clusterSizeDistribution(docs,
      Dedup.minhashCandidatePairs(docs)).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(dist.map(_._2).sum === docs.count())
    // at least one real duplicate cluster exists in the fixture
    assert(Dedup.clusterSizeDistribution(docs,
      Dedup.minhashCandidatePairs(docs))
      .filter(col("cluster_size") > 1).count() > 0)
  }

  test("canonicalByQuality keeps exactly one member per cluster, the best one") {
    val pairs = Dedup.minhashCandidatePairs(docs)
    val quality = graft.operators.TextAnalysis.qualityScore(docs)
    val got = Dedup.canonicalByQuality(docs, pairs, quality).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    // one keeper per cluster
    val byCluster = got.groupBy(_._2)
    assert(byCluster.values.forall(_.count(_._4 == 1) === 1))
    // the keeper has the cluster's max quality (ties -> lowest doc_id)
    byCluster.values.foreach { members =>
      val keeper = members.find(_._4 == 1).get
      val best = members.map(_._3).max
      assert(keeper._3 === best)
      assert(keeper._1 === members.filter(_._3 == best).map(_._1).min)
    }
    // clusters are canonicalFromPairs' components, relabeled by nothing
    val labels = Dedup.canonicalFromPairs(docs, pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.forall { case (id, cl, _, _) => labels(id) === cl })
  }

  test("minhash jaccard estimate: identical docs estimate 1.0, all in [0,1]") {
    import spark.implicits._
    val fixture = Seq(
      (1L, "one two three four five six seven eight"),
      (2L, "one two three four five six seven eight"),
      (3L, "completely different words in this tiny document here")
    ).toDF("doc_id", "text")
    val est = Dedup.minhashJaccardEstimate(fixture).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(est.exists(e => e._1 == 1L && e._2 == 2L && e._3 == 1.0))
    // on the real corpus every estimate is a valid fraction of 16
    val real = Dedup.minhashJaccardEstimate(docs)
      .select("est_jaccard").collect().map(_.getDouble(0))
    assert(real.nonEmpty && real.forall(e => e >= 0.0 && e <= 1.0))
  }

  test("bloom-prefilter incremental dedup agrees with the plain semi-join") {
    import spark.implicits._
    val docs = graft.sources.Tables.documents(spark, sf)
    val fresh = docs.filter(col("doc_id") % 4 === 1)
    val ref = docs.filter(col("doc_id") % 4 =!= 1)
    val bloom = Dedup.incrementalDedupBloom(fresh, ref)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val plain = Dedup.incrementalDedup(fresh, ref)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(bloom === plain)
    // tiny-fpp sanity on a constructed fixture: exact copy flagged
    // (no false negatives), novel doc clean
    val r2 = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val f2 = Seq((10L, "  ALPHA beta   gamma "), (11L, "novel thing here"))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalDedupBloom(f2, r2, expectedRefDocs = 100)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(10L -> true, 11L -> false))
  }

  test("bloom near-dup prefilter agrees with the plain band semi-join") {
    val fresh = docs.filter(col("doc_id") % 4 === 1)
    val ref = docs.filter(col("doc_id") % 4 =!= 1)
    val bloom = Dedup.incrementalNearDupBloom(fresh, ref)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val plain = Dedup.incrementalDedup(fresh, ref)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(bloom === plain)
  }

  test("passage boilerplate removal scrubs shared passages, keeps order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "SHARED BOILER TEXT unique content one"),
      (2L, "aaa bbb ccc SHARED BOILER TEXT ddd eee fff"),
      (3L, "totally novel stuff"),
      (4L, "SHARED BOILER TEXT"),
      (5L, "SHARED BOILER TEXT")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .dedupPassages(docs, passageWords = 3, minDocs = 2)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "unique content one")
    // middle passage removed, surrounding order preserved
    assert(got(2L) === "aaa bbb ccc ddd eee fff")
    assert(got(3L) === "totally novel stuff")
    // all-boilerplate docs survive as rows with empty text
    assert(got(4L) === "" && got(5L) === "")
  }

  test("repetition signals: exact fractions on a constructed repeat") {
    import spark.implicits._
    // grams: "a b","b a","a b","b a","a b" -> n=5, distinct=2,
    // dup_frac=0.6, top ("a b")=3/5
    val one = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis.repetitionSignals(one).collect()(0)
    assert(r.getInt(1) === 5 && r.getInt(2) === 2)
    assert(math.abs(r.getDouble(3) - 0.6) < 1e-9)
    assert(math.abs(r.getDouble(4) - 0.6) < 1e-9)
    // sub-2-token docs are dropped, not NaN'd
    val tiny = Seq((2L, "solo")).toDF("doc_id", "text")
    assert(graft.operators.TextAnalysis.repetitionSignals(tiny).count() === 0)
  }

  test("exact substring spans: first occurrence exempt, islands merge") {
    import spark.implicits._
    // docs 1 and 2 share a 10-token run; with k=8 that run yields 3
    // duplicated grams per copy, merging into one maximal span.
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    // doc 1 holds the corpus-first occurrences (min (doc_id, i)) → exempt;
    // only doc 2's copy is flagged: grams at 1,2,3 merge to span [1, 11)
    assert(spans.toSeq === Seq((2L, 1, 10, 3L)))
    // keepFirst = false marks EVERY occurrence of a duplicated gram
    val all = Dedup.duplicateSpans(corpus, k = 8, keepFirst = false)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(all === Set((1L, 2, 10), (2L, 1, 10)))
  }

  test("exact substring trim removes flagged spans, keeps everything else") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"a1 a2 $shared a3 a4"),
      (2L, s"b1 $shared b2 b3 b4"),
      (3L, "c1 c2 c3")).toDF("doc_id", "text")
    val got = Dedup.trimDuplicateSpans(corpus, k = 8)
      .collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2), r.getString(3))))
      .toMap
    // first occurrence kept verbatim
    assert(got(1L) === ((14, 0L, s"a1 a2 $shared a3 a4")))
    // second copy trimmed: the 10 shared tokens vanish, order preserved
    assert(got(2L) === ((14, 10L, "b1 b2 b3 b4")))
    // sub-k docs pass through untouched
    assert(got(3L) === ((3, 0L, "c1 c2 c3")))
  }

  test("incremental substring spans: reference always wins, new-vs-new keeps first") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val novel = (0 until 10).map(i => s"n$i").mkString(" ")
    val ref = Seq((100L, s"r1 $shared r2")).toDF("doc_id", "text")
    val fresh = Seq(
      // duplicates the reference → flagged even though it's the lowest new id
      (1L, s"a1 $shared a2"),
      // novel 10-token run, first new occurrence → exempt
      (2L, s"b1 $novel b2"),
      // second new occurrence of the novel run → flagged
      (3L, s"c1 $novel c2")).toDF("doc_id", "text")
    val got = Dedup.duplicateSpansAgainst(fresh, ref)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    assert(got === Set((1L, 1, 10), (3L, 1, 10)))
    // reference docs never appear in the output
    assert(!got.exists(_._1 == 100L))
  }

  test("in-scan decontamination equals the semi-join form row for row") {
    val eval = docs.filter(col("doc_id") % 29 === 0)
    val join = Dedup.decontaminate(docs, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val scan = Dedup.decontaminateScan(docs, eval)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(scan === join, "physical strategy must not change the answer")
    assert(scan.exists(_._3 == 1), "fixture eval split must contaminate")
    // graded twin: one-pass numerator+denominator equals the join form
    val gJoin = Dedup.contaminationFraction(docs, eval)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val gScan = Dedup.contaminationFractionScan(docs, eval)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(gScan === gJoin, "graded scan twin drifted from the join form")
  }

  test("scan probe tokenize parity: leading/trailing whitespace") {
    import spark.implicits._
    // Spark's split(lower(text), '\s+') keeps trailing empty tokens
    // (limit -1) and a leading empty token before leading whitespace; the
    // JVM probe kernel must shingle the exact same token sequence or the
    // in-scan result drifts from the semi-join form on ragged text. The
    // trailing-space doc gains the extra gram "beta gamma <empty>", the
    // leading-space doc the gram "<empty> alpha beta".
    val ragged = Seq(
      (1L, "alpha beta gamma "),   // trailing whitespace
      (2L, " alpha beta gamma"),   // leading whitespace
      (3L, "alpha beta gamma"),    // clean twin
      (4L, "  padded   interior  words  here  ")).toDF("doc_id", "text")
    val eval = Seq((100L, "x alpha beta gamma y")).toDF("doc_id", "text")
    val join = Dedup.contaminationFraction(ragged, eval)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val scan = Dedup.contaminationFractionScan(ragged, eval)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(scan === join,
      "probe kernel tokenizes differently from split(lower(text)) on " +
        s"leading/trailing whitespace: $scan vs $join")
    // the ragged docs really do carry MORE shingles than the clean twin,
    // so this fixture exercises the empty-token grams, not a vacuous match
    val byDoc = join.map(t => t._1 -> t._2).toMap
    assert(byDoc(1L) === byDoc(3L) + 1 && byDoc(2L) === byDoc(3L) + 1,
      s"fixture lost its empty-token grams: $byDoc")
  }

  test("shard export writes one JSONL file per shard, membership == shardAssign") {
    import graft.operators.TextAnalysis
    val out = java.nio.file.Files
      .createTempDirectory("graft-export").toString + "/shards"
    TextAnalysis.exportShards(docs, out, nShards = 8)
    val schema = docs.schema
    val back = spark.read.text(out)
      .select(col("shard").cast("int").as("shard"),
        from_json(col("value"), schema).as("row"))
      .select(col("shard"), col("row.doc_id").as("doc_id"))
      .collect().map(r => (r.getLong(1), r.getInt(0)))
    val want = TextAnalysis.shardAssign(docs, nShards = 8)
      .select("doc_id", "shard")
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(back.toSet === want.toSet, "export membership drifted from plan")
    assert(back.length === want.length, "export duplicated or dropped rows")
    // one sequential file per shard directory — the trainer-reader contract
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(dirs.nonEmpty)
    dirs.foreach { d =>
      val files = d.listFiles().filter(_.getName.endsWith(".txt"))
      assert(files.length === 1,
        s"${d.getName}: ${files.length} files, expected exactly 1")
    }
  }

  test("substring dedup stats account for the corpus exactly") {
    import spark.implicits._
    val shared = (0 until 10).map(i => s"s$i").mkString(" ")
    val corpus = Seq(
      (1L, s"a1 a2 $shared a3 a4"),   // 14 tokens, first occurrence
      (2L, s"b1 $shared b2 b3 b4"),   // 14 tokens, 10 flagged
      (3L, "c1 c2 c3")).toDF("doc_id", "text")
    val r = Dedup.substrDedupStats(corpus).collect()(0)
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4)) === ((3L, 1L, 1L, 10L, 31L)))
    assert(math.abs(r.getDouble(5) - math.rint(10.0 / 31 * 1e6) / 1e6) < 1e-9)
    // span-free corpus: zeros, not nulls
    val clean = Seq((1L, "x1 x2 x3")).toDF("doc_id", "text")
    val z = Dedup.substrDedupStats(clean).collect()(0)
    assert((z.getLong(1), z.getLong(2), z.getLong(3)) === ((0L, 0L, 0L)))
  }

  test("substring spans merge overlapping-but-nonconsecutive gram runs") {
    import spark.implicits._
    // doc 2 repeats doc 1's prefix AND suffix with a 3-token novel gap —
    // two islands; each island's grams overlap within themselves
    val a = (0 until 9).map(i => s"a$i").mkString(" ")
    val b = (0 until 9).map(i => s"b$i").mkString(" ")
    val corpus = Seq(
      (1L, s"$a x1 x2 x3 $b"),
      (2L, s"$a y1 y2 y3 $b")).toDF("doc_id", "text")
    val spans = Dedup.duplicateSpans(corpus, k = 8)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    // doc 2: prefix grams at 0,1 → span [0, 9); suffix at 12,13 → [12, 21)
    assert(spans === Set((2L, 0, 9), (2L, 12, 9)))
  }

  test("editDistancePairs equals the naive all-pairs levenshtein (no false negatives)") {
    val prefixes = docs.filter(length(col("text")) >= 40)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = (for {
      (ida, sa) <- prefixes; (idb, sb) <- prefixes if ida < idb
      dist = lev(sa, sb) if dist <= 2
    } yield (ida, idb, dist)).toSet
    val got = Dedup.editDistancePairs(docs, k = 2, prefixLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === want,
      s"gram-filtered join diverged: missing ${want -- got}, extra ${got -- want}")
    assert(want.nonEmpty, "fixture must contain at least one near-dup prefix pair")
  }

  test("editDistancePairs: adversarial edits right at the k boundary") {
    import spark.implicits._
    val base = "the quick brown fox jumps over the lazy dog once mor"
    val corpus = Seq(
      1L -> base,                                  // identical → dist 0
      2L -> base,
      3L -> base.patch(4, "X", 1),                 // 1 substitution
      4L -> base.patch(10, "", 1).patch(30, "Zq", 0), // del + ins = 2
      5L -> base.patch(2, "ABC", 3).patch(20, "DEF", 3), // 6 subs: out
      6L -> ("Z" + base)                           // shift-by-one: 1 ins…
    ).toDF("doc_id", "text")
    val got = Dedup.editDistancePairs(corpus, k = 2, prefixLen = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // naive reference over the same prefixes decides membership
    val prefixes = corpus.collect()
      .map(r => (r.getLong(0), r.getString(1).substring(0, 40)))
    val want = (for {
      (ida, sa) <- prefixes; (idb, sb) <- prefixes if ida < idb
      dist = lev(sa, sb) if dist <= 2
    } yield (ida, idb, dist)).toSet
    assert(got === want)
    assert(got.contains((1L, 2L, 0)) && got.contains((1L, 3L, 1)))
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L),
      "six substitutions must stay out at k=2")
  }
}
