package graft

import org.apache.spark.sql.functions._

import graft.functions.BpeExpressions
import graft.operators.Bpe
import graft.sources.Tables

class BpeSpec extends GraftSuite {

  test("BPE training follows the textbook merge order on a tiny corpus") {
    // histogram: aa×2, ab×1 → pair counts (a,a)=2, (a,b)=1 → merge 0 =
    // (a,a); then words [aa]×2, [a,b]×1 → only pair (a,b) → merge 1
    val merges = Bpe.trainOnHistogram(Seq("aa" -> 2L, "ab" -> 1L), 10)
    assert(merges.map(m => (m.rank, m.left, m.right)) ===
      Seq((0, "a", "a"), (1, "a", "b")))
    // frequency ties break on the lexicographically smallest pair
    val tied = Bpe.trainOnHistogram(Seq("xy" -> 1L, "ab" -> 1L), 1)
    assert((tied.head.left, tied.head.right) === (("a", "b")))
  }

  test("mergePair fuses left-to-right without overlap") {
    assert(Bpe.mergePair(Array("a", "a", "a"), "a", "a").toSeq ===
      Seq("aa", "a"))
    assert(Bpe.mergePair(Array("a", "b", "a", "b"), "a", "b").toSeq ===
      Seq("ab", "ab"))
  }

  test("codegen'd encode applies merges greedily and round-trips the text") {
    import spark.implicits._
    val merges = Bpe.trainOnHistogram(Seq("aa" -> 2L, "ab" -> 1L), 10)
    val df = Seq((1L, "aab aa b"), (2L, "AA ab")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        BpeExpressions.bpeTokens(col("text"), merges).as("toks"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    // "aab": (a,a) fuses first (rank 0) → [aa, b]; "aa" → [aa]; "b" → [b]
    assert(got(1L) === Seq("aa", "b", "aa", "b"))
    // encode lowercases exactly like TextAnalysis.tokensExpr
    assert(got(2L) === Seq("aa", "ab"))
    // round-trip: concatenating a word's tokens reproduces the word
    assert(got(1L).mkString === "aabaab")
  }

  test("trained vocab and per-doc counts are deterministic on the fixture") {
    val docs = Tables.documents(spark, sf)
    val a = Bpe.train(docs, 30)
    val b = Bpe.train(docs, 30)
    assert(a === b, "training must be a pure function of the corpus")
    assert(a.length === 30)
    val counts = docs.select(col("doc_id"),
        size(BpeExpressions.bpeTokens(col("text"), a)).as("n"))
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(counts.nonEmpty && counts.forall(_._2 > 0))
    // learned merges compress: BPE token count is at most the character
    // count and at least the whitespace token count
    val ws = docs.select(col("doc_id"),
        size(expr(graft.operators.TextAnalysis.tokensExpr)).as("w"),
        length(col("text")).as("c"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2)))).toMap
    counts.foreach { case (id, n) =>
      val (w, c) = ws(id)
      assert(n >= w && n <= c, s"doc $id: $n tokens outside [$w, $c]")
    }
  }
}
