package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Full-text retrieval over the document corpus — the search-engine
  * capability a training-data platform needs next to its dedup/quality
  * stack (query-relevant subcorpus extraction, hard-negative mining for
  * embedding training, eval-set retrieval baselines).
  *
  * BM25 (Robertson & Zaragoza 2009, "The Probabilistic Relevance
  * Framework") is the lexical-ranking baseline every production retrieval
  * system starts from; the reference's pipeline feeds Elasticsearch, whose
  * default similarity IS BM25 (practical scoring per its docs) — this is
  * the engine-side re-derivation of that ranking over the same corpus,
  * re-expressed as Spark relational algebra instead of a Lucene index.
  *
  * 100 TB shape: the query-term set is a literal pushed INTO the token
  * explode as a lambda filter, so the exploded stream — and everything
  * shuffled afterwards — is bounded by docs-containing-query-terms, never
  * the corpus token count. Corpus stats (N, avgdl) reduce to ONE row and
  * broadcast; per-term document frequencies are one tiny aggregate off the
  * already-filtered tf table (|terms| rows, broadcast back). Top-k is
  * TakeOrderedAndProject — no global sort. Nothing in the plan scales with
  * anything but the posting-list sizes of the query terms, which is exactly
  * the cost model of an inverted-index engine. */
object Retrieval {

  /** Top-k documents by BM25 score for a bag-of-words query.
    *
    * Scoring: `idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))` (the Lucene
    * variant — positive for every df), and per (doc, term)
    * `idf * tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`, summed per doc
    * and rounded to 6dp BEFORE ranking so the ordering is reproducible
    * across partitionings and engines (repo convention — float sums are
    * association-order-dependent; ties break to the smaller doc_id). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k: Int = 10,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty, "bm25TopK: query terms must be non-empty")
    val termsLit = terms.map(t => s"'${t.toLowerCase}'").mkString(", ")
    // one pass: doc length for every doc, tf restricted to query terms
    val toks = docs.select(col("doc_id"),
      expr(TextAnalysis.tokensExpr).as("toks"))
    val tf = toks
      .select(col("doc_id"), size(col("toks")).as("dl"),
        explode(expr(s"filter(toks, t -> t IN ($termsLit))")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    // df per query term (≤ |terms| rows) and 1-row corpus stats — both
    // broadcast; dl sums as BIGINT (exact), divides as double
    val df_ = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = toks.agg(count(lit(1)).cast("double").as("n"),
      (sum(size(col("toks"))).cast("double") /
        count(lit(1)).cast("double")).as("avgdl"))
    val idf = log(lit(1.0) +
      (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val norm = col("tf") * lit(k1 + 1.0) /
      (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    tf.join(broadcast(df_), "term")
      .join(broadcast(stats))
      .groupBy(col("doc_id"))
      .agg(round(sum(idf * norm), 6).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc)
      .limit(k)
  }

  /** KWIC (keyword-in-context) snippet extraction — the result-page half
    * of a search stack ([[bm25TopK]] ranks, this renders): for every doc
    * containing a query term, the ±`window`-token context around the
    * FIRST hit, plus the hit term and its 0-based position.
    *
    * Pure per-row array expressions over one scan — the first-hit
    * position is the min over the terms' `array_position`s (one
    * early-terminating scan per term, NO per-row index-array allocation —
    * the original `transform(sequence(...))` form materialized two
    * token-length arrays per document and benched 2.9 s vs 0.4 s at
    * sf0.1), the snippet a bounds-clamped `slice`; no shuffle, no UDF,
    * nothing leaves the row. Docs with no hit are filtered out by the
    * non-null position (the filter sits on the projection, so at scale
    * this composes with a pushed-down BM25 candidate semi-join). */
  def snippets(docs: DataFrame, terms: Seq[String],
               window: Int = 3): DataFrame = {
    require(terms.nonEmpty, "snippets: query terms must be non-empty")
    val firstPos = terms
      .map(t => s"nullif(array_position(toks, '${t.toLowerCase}'), 0)")
      .mkString(", ")
    docs.select(col("doc_id"), expr(TextAnalysis.tokensExpr).as("toks"))
      .withColumn("pos",
        (expr(s"array_min(array($firstPos))") - 1).cast("int"))
      .filter(col("pos").isNotNull)
      .select(col("doc_id"), expr("toks[pos]").as("hit_term"), col("pos"),
        expr(s"""array_join(slice(toks, greatest(0, pos - $window) + 1,
                 |  least(size(toks) - 1, pos + $window)
                 |    - greatest(0, pos - $window) + 1), ' ')""".stripMargin)
          .as("snippet"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack, Clarke &
    * Büttcher 2009): fuse the [[bm25TopK]] LEXICAL ranking with the
    * [[Similarity.knnBruteForce]] VECTOR ranking for one query —
    * `rrf(d) = Σ_sides 1/(k0 + rank_side(d))`, the score-scale-free
    * fusion every hybrid search stack defaults to (no tuning of
    * incomparable BM25/cosine magnitudes; rank is the only signal). An
    * id present in both lists beats one present in either alone — the
    * lexical/semantic agreement bonus is the point of hybrid search.
    *
    * Scale shape: both inputs arrive ALREADY bounded at n rows
    * (TakeOrderedAndProject on each side), so the fusion — the rank
    * windows, the full-outer join, the top-N — runs on ≤ 2n rows; the
    * distributed work is entirely inside the two upstream retrievers.
    * RRF terms are per-row arithmetic over exactly two doubles, no
    * accumulation, so the 6dp score is engine-exact. */
  def hybridRrf(docs: DataFrame, emb: DataFrame, terms: Seq[String],
                n: Int = 10, k0: Int = 60, topN: Int = 10): DataFrame = {
    // single-partition window is deliberate: input is the ≤ n-row top-k
    val wLex = Window.orderBy(col("score").desc, col("doc_id").asc)
    val lex = bm25TopK(docs, terms, n)
      .withColumn("lex_rnk", row_number().over(wLex))
      .select(col("doc_id").as("id"), col("lex_rnk"))
    val vec = Similarity.knnBruteForce(emb, n, nQueries = 1)
      .select(col("neighbor_id").as("id"), col("rank").as("vec_rnk"))
    lex.join(vec, Seq("id"), "full_outer")
      .select(col("id"), col("lex_rnk"), col("vec_rnk"),
        round(
          coalesce(lit(1.0) / (lit(k0) + col("lex_rnk")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(k0) + col("vec_rnk")), lit(0.0)), 6)
          .as("rrf_score"))
      .orderBy(col("rrf_score").desc, col("id").asc)
      .limit(topN)
  }
}
