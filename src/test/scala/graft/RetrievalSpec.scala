package graft

import org.apache.spark.sql.functions._

import graft.operators.{Retrieval, TextAnalysis}

/** BM25 ranking semantics on a hand-built corpus (the sf0.01 oracle gate
  * covers engine-vs-DuckDB parity; this locks the RANKING behavior a
  * search user relies on). */
class RetrievalSpec extends GraftSuite {
  import spark.implicits._

  private def corpus = Seq(
    // doc 1: both query terms, twice each, short → top hit
    (1L, "spark merge spark merge"),
    // doc 2: both terms once, padded long → same tf, longer dl → below 1
    (2L, "spark merge aaa bbb ccc ddd eee fff ggg hhh iii jjj"),
    // doc 3: one term only
    (3L, "spark aaa bbb"),
    // doc 4: neither term — must not appear at all
    (4L, "xxx yyy zzz"),
    // docs 5-9: filler so idf has a corpus to discriminate against
    (5L, "aaa bbb ccc"), (6L, "ddd eee fff"), (7L, "ggg hhh iii"),
    (8L, "jjj kkk lll"), (9L, "mmm nnn ooo")
  ).toDF("doc_id", "text")

  test("bm25 ranks by tf, penalizes length, and drops no-match docs") {
    val got = Retrieval.bm25TopK(corpus, Seq("spark", "merge"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getDouble(1))
    val order = got.map(_._1).toSeq
    assert(order.take(3) === Seq(1L, 2L, 3L),
      s"expected tf-then-length ranking, got $order")
    assert(!order.contains(4L), "doc with no query terms must be absent")
    val byId = got.toMap
    assert(byId(1L) > byId(2L) && byId(2L) > byId(3L))
    assert(got.forall(_._2 > 0.0), "Lucene-variant idf is always positive")
  }

  test("bm25 term saturation: 10× the tf must not double the score") {
    // two docs of identical length: tf=50 vs tf=5. BM25's k1 saturation
    // means the 10× tf raises the score by well under 2× (an unsaturated
    // tf·idf would raise it 10×); ranking order is still preserved.
    val docs = (Seq((1L, Seq.fill(50)("spark").mkString(" ")),
      (2L, (Seq.fill(5)("spark") ++ Seq.fill(45)("pad")).mkString(" ")))
      ++ (3L to 12L).map(i => (i, "pad only doc"))).toDF("doc_id", "text")
    val scores = Retrieval.bm25TopK(docs, Seq("spark"), k = 5)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > scores(2L), "more occurrences still rank higher")
    assert(scores(1L) < 2.0 * scores(2L),
      s"tf=50 vs tf=5 must saturate: ${scores(1L)} !< 2 × ${scores(2L)}")
  }

  test("snippets clamp at doc edges, report the FIRST hit, skip no-hit docs") {
    val docs = Seq(
      (1L, "spark a b c d e f"),       // hit at position 0: left clamp
      (2L, "a b c d e f spark"),       // hit at the end: right clamp
      (3L, "a b c spark d e spark f"), // two hits: first one wins
      (4L, "a b c d e f g")            // no hit: excluded
    ).toDF("doc_id", "text")
    val got = Retrieval.snippets(docs, Seq("spark"), window = 2)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getString(3))))
      .toMap
    assert(got.keySet === Set(1L, 2L, 3L))
    assert(got(1L) === (("spark", 0, "spark a b")))
    assert(got(2L) === (("spark", 6, "e f spark")))
    assert(got(3L) === (("spark", 3, "b c spark d e")))
  }

  test("zipf fit recovers a negative slope with high r² on zipfian counts") {
    // synthesize a corpus whose token frequencies are exactly 120/rank:
    // the ln-ln regression must come back near slope −1 with r² ≈ 1
    val words = (1 to 30).flatMap { r =>
      Seq.fill(math.max(1, 120 / r))(s"w$r")
    }
    val doc = Seq((1L, words.mkString(" "))).toDF("doc_id", "text")
    val row = TextAnalysis.zipfFit(doc, vocabCap = 30).collect().head
    val (slope, r2) = (row.getDouble(0), row.getDouble(2))
    assert(slope < -0.8 && slope > -1.2, s"slope $slope should be ≈ −1")
    assert(r2 > 0.98, s"r² $r2 should be ≈ 1 on exact zipfian input")
    assert(row.getLong(3) === 30L)
  }

  test("RRF fusion: scores follow the rank formula; agreement beats either alone") {
    val docs = graft.sources.Tables.documents(spark, sf)
    val emb = graft.sources.Tables.embeddings(spark, sf)
    val out = Retrieval.hybridRrf(docs, emb, Seq("spark", "window", "merge"))
      .collect()
    assert(out.nonEmpty && out.length <= 10)
    // score is exactly the closed form of the two (nullable) ranks
    out.foreach { r =>
      val lex = if (r.isNullAt(1)) None else Some(r.getInt(1))
      val vec = if (r.isNullAt(2)) None else Some(r.getInt(2))
      assert(lex.nonEmpty || vec.nonEmpty)
      val want = lex.map(x => 1.0 / (60 + x)).getOrElse(0.0) +
        vec.map(x => 1.0 / (60 + x)).getOrElse(0.0)
      assert(math.abs(r.getDouble(3) - want) < 1e-6)
    }
    // ordering is (score desc, id asc)
    val scores = out.map(_.getDouble(3))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // the agreement property, analytically: any doc in BOTH top-10 lists
    // outranks any doc in only one list at rank >= 2 (1/(60+r1)+1/(60+r2)
    // > 1/61 requires both; worst both-case 2/70 > best single-case 1/61
    // fails — so assert the formula's actual guarantee: a both-lists doc
    // at ranks (i, j) beats a single-list doc at rank >= min(i, j))
    val both = out.filter(r => !r.isNullAt(1) && !r.isNullAt(2))
    val single = out.filter(r => r.isNullAt(1) ^ r.isNullAt(2))
    for (b <- both; s <- single) {
      val bMin = math.min(b.getInt(1), b.getInt(2))
      val sRank = if (s.isNullAt(1)) s.getInt(2) else s.getInt(1)
      if (sRank >= bMin)
        assert(b.getDouble(3) > s.getDouble(3),
          "agreement at equal-or-better rank must win")
    }
  }
}
