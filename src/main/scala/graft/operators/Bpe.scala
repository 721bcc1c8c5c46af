package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING over the corpus, plus the learned
  * vocabulary as a table — the "train a tokenizer on the crawl" step of a
  * training-data pipeline (Sennrich et al. 2016, arXiv:1508.07909), beyond
  * the whitespace/regex token counters in [[TextAnalysis]].
  *
  * Scale design — the standard two-level shape every production BPE
  * trainer uses (a tokenizer never trains on the token STREAM):
  *  1. ONE corpus-scale job reduces the text to a word histogram —
  *     `explode → groupBy(word) → count`, map-side partial aggregation, so
  *     the shuffle carries distinct words, not occurrences; the histogram
  *     is capped at `topWords` by frequency (deterministic tie-break on
  *     the word) via `TakeOrderedAndProject` — per-partition heaps, never
  *     a global sort. At 100 TB the corpus is petabytes but the capped
  *     histogram is a few MB.
  *  2. The merge loop runs driver-side over that bounded histogram —
  *     O(topWords × word-length) per merge, pure CPU on a few MB. This is
  *     NOT a driver-side loop over corpus data (the anti-pattern); it is
  *     the algorithm's own reduced state, the same way k-means iterates
  *     on collected centroids ([[Similarity]]).
  *
  * Determinism: merge selection breaks frequency ties on the
  * lexicographically smallest (left, right) pair, so the learned vocab is
  * a pure function of the histogram. Application of the learned merges is
  * the codegen'd [[graft.functions.BpeExpressions.bpeTokens]]. */
object Bpe {

  /** One learned merge: `left + right → left ++ right`, applied in `rank`
    * order. */
  final case class Merge(rank: Int, left: String, right: String)

  /** The corpus word histogram, capped at `topWords` most frequent words
    * (ties broken on the word — deterministic). The only corpus-scale job
    * in BPE training. */
  def wordHistogram(docs: DataFrame, topWords: Int = 65536): DataFrame =
    docs
      .select(explode(expr(TextAnalysis.tokensExpr)).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word")).limit(topWords)

  /** Merge `left+right` occurrences left-to-right in a symbol sequence. */
  private[graft] def mergePair(syms: Array[String], left: String,
                               right: String): Array[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == left && syms(i + 1) == right) {
        out += left + right
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.toArray
  }

  /** The driver-side merge loop: repeatedly take the highest-count
    * adjacent symbol pair (weighted by word frequency; ties → smallest
    * (left, right)) and fuse it, until `numMerges` rules exist or no pair
    * repeats. Exposed for the naive-reference property test. */
  private[graft] def trainOnHistogram(hist: Seq[(String, Long)],
                                      numMerges: Int): Seq[Merge] = {
    var words = hist.iterator
      .map { case (w, c) => (w.toCharArray.map(_.toString), c) }
      .toVector
    val merges = mutable.ArrayBuffer.empty[Merge]
    var done = false
    while (merges.length < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1) {
        val k = (syms(i), syms(i + 1))
        counts(k) = counts.getOrElse(k, 0L) + c
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), _) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(merges.length, l, r)
        words = words.map { case (syms, c) => (mergePair(syms, l, r), c) }
      }
    }
    merges.toSeq
  }

  /** Train `numMerges` BPE rules on the corpus (histogram job + driver
    * loop). */
  def train(docs: DataFrame, numMerges: Int = 200,
            topWords: Int = 65536): Seq[Merge] =
    trainOnHistogram(
      wordHistogram(docs, topWords).collect()
        .map(r => (r.getString(0), r.getLong(1))).toIndexedSeq,
      numMerges)

  /** The learned vocabulary as a table: `(rank, left, right, merged)`. */
  def vocabTable(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.rank, m.left, m.right, m.left + m.right))
      .toDF("rank", "left", "right", "merged")
  }
}
