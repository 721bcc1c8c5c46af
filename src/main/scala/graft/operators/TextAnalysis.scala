package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Text-analysis operators for a large-scale training-data pipeline:
  * token statistics, language identification, quality scoring, and document
  * fingerprinting over the `documents` table.
  *
  * Everything is per-row array/string expressions (`split`, higher-order
  * functions) — no UDFs, no shuffles, embarrassingly parallel at 100 TB:
  * each operator is a single projection over the scan, and column pruning
  * means only `doc_id`/`text` are ever read.
  */
object TextAnalysis {

  /** Lowercased whitespace tokens (bag, not set). */
  val tokensExpr = "split(lower(text), '\\\\s+')"

  /** Alphabetically-ordered language marker sets for the n-gram/stopword
    * language-ID heuristic. Real pipelines learn these profiles; the
    * operator shape (argmax of per-language marker hit counts, deterministic
    * tie-break on language code) is what matters. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("table", "column", "batch"),
    "en" -> Seq("the", "a", "data"),
    "es" -> Seq("customer", "value", "row"),
    "fr" -> Seq("merge", "join", "query"),
    "zh" -> Seq("spark", "stream", "vector"))

  val stopwords: Seq[String] = Seq("the", "a", "dup", "slow")

  private def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** Subword-style token counting: alongside whitespace tokens, count
    * BPE-ish units (word pieces and standalone punctuation,
    * `\w+|[^\w\s]`) — the cheap proxy for tokenizer cost used to budget
    * context windows before running a real BPE vocabulary. Pure codegen'd
    * regex, one projection. */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(expr(tokensExpr)).as("ws_tokens"),
      expr("CAST(regexp_count(text, '\\\\w+|[^\\\\w\\\\s]') AS INTEGER)")
        .as("bpe_ish_tokens"))

  /** Per-document token statistics: counts, distinct counts, mean length.
    *
    * Mean token length avoids the interpreted `aggregate()` lambda (the one
    * CodegenFallback left in round 1): the sum of whitespace-token lengths
    * IS the text length with all whitespace removed, so it's a codegen'd
    * `length(regexp_replace(...))` — the whole operator stays a single
    * WholeStageCodegen projection. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokensExpr))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct_tokens"),
        expr("round(CAST(length(regexp_replace(text, '\\\\s+', '')) AS DOUBLE) / size(toks), 6)")
          .as("avg_token_len"))

  /** Language ID: marker-hit count per language, argmax with alphabetical
    * tie-break (first language in [[langMarkers]] order wins ties). */
  def langId(docs: DataFrame): DataFrame =
    withLangGuess(docs).select(
      col("doc_id"), col("lang_guess"),
      greatest(langMarkers.map { case (l, _) => col(s"hits_$l") }: _*)
        .as("marker_hits"))

  /** All input columns + per-language `hits_*` counts + the argmax
    * `lang_guess` — the shared projection behind [[langId]] and
    * [[sampleStratified]]: everything stays a single codegen'd scan, no
    * join needed to pair the guess with other columns of the row. */
  private def withLangGuess(docs: DataFrame): DataFrame = {
    val hitCols = langMarkers.map { case (lang, words) =>
      lang -> expr(s"size(filter(toks, t -> t IN ${inList(words)}))")
    }
    val withHits = docs
      .withColumn("toks", expr(tokensExpr))
      .select(docs.columns.map(col) ++
        hitCols.map { case (l, c) => c.as(s"hits_$l") }: _*)
    // argmax CASE chain: lang_i wins if its hits >= every later lang's hits
    val langs = langMarkers.map(_._1)
    val guess = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
      case ((lang, i), elseCol) =>
        val geAllLater = langs.drop(i + 1)
          .map(l2 => col(s"hits_$lang") >= col(s"hits_$l2"))
          .reduce(_ && _)
        when(geAllLater, lit(lang)).otherwise(elseCol)
    }
    withHits.withColumn("lang_guess", guess)
  }

  /** Quality scoring: length/punctuation/stopword signals and a composite
    * score — the standard cheap pre-filter before expensive dedup stages. */
  def qualityScore(docs: DataFrame): DataFrame =
    withQualityCols(docs).select(
      col("doc_id"), col("n_tokens"), col("punct_ratio"),
      col("stopword_ratio"), col("quality_score"))

  /** Input rows that pass the quality gate, original columns only — the
    * composed-pipeline form of [[qualityScore]]. Because
    * [[withQualityCols]] keeps every input column, the gate is ONE
    * codegen'd projection + filter over the scan: no self-join of `docs`
    * against its own quality scores, so document text never crosses a
    * shuffle to get filtered. */
  def qualityKept(docs: DataFrame, minTokens: Int,
                  maxPunctRatio: Double): DataFrame =
    withQualityCols(docs)
      .filter(col("n_tokens") >= minTokens && col("punct_ratio") <= maxPunctRatio)
      .select(docs.columns.map(col).toIndexedSeq: _*)

  /** All input columns + the quality signals — shared by [[qualityScore]]
    * and [[datasetCard]] so the rollup does not re-derive them through a
    * second scan and a join. */
  private[graft] def withQualityCols(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokensExpr))
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("punct_ratio",
        expr("round(CAST(regexp_count(text, '[^\\\\w\\\\s]') AS DOUBLE) / length(text), 6)"))
      .withColumn("stopword_ratio",
        expr(s"round(CAST(size(filter(toks, t -> t IN ${inList(stopwords)})) AS DOUBLE) / size(toks), 6)"))
      .withColumn("quality_score",
        expr("round(ln(1 + n_tokens) * (1.0 - punct_ratio) * (1.0 + stopword_ratio), 6)"))
      .drop("toks")

  /** Context-window chunking: split each document into fixed-size token
    * chunks with `overlap` tokens of lookback — the packing step before
    * tokenization/embedding of long documents. Explode-first like the
    * dedup pipeline: chunk indices explode from a sequence, the slice +
    * join run as codegen'd array ops on the materialized token array —
    * one scan, no shuffle, parallel across documents AND chunks. */
  def chunkDocuments(docs: DataFrame, maxTokens: Int = 32,
                     overlap: Int = 8): DataFrame = {
    require(overlap < maxTokens, "overlap must be < maxTokens")
    val stride = maxTokens - overlap
    docs
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(expr(
          s"sequence(0, greatest(0, CAST(ceil((size(toks) - $maxTokens) / CAST($stride AS DOUBLE)) AS INT)))"))
          .as("chunk_id"))
      .select(col("doc_id"), col("chunk_id"),
        expr(s"array_join(slice(toks, chunk_id * $stride + 1, $maxTokens), ' ')")
          .as("chunk_text"),
        expr(s"size(slice(toks, chunk_id * $stride + 1, $maxTokens))")
          .as("n_tokens"))
  }

  /** Sequence packing — the step after [[chunkDocuments]] in a pretraining
    * pipeline: concatenate chunks into fixed-token-budget training
    * sequences. Packing is inherently order-dependent, so the scalable
    * contract is BUCKETED contiguous packing: documents hash into
    * `buckets` independent packing lanes (all of a document's chunks stay
    * in one lane), and within a lane chunks are packed in (doc_id,
    * chunk_id) order by running token count — a sequence is the set of
    * chunks whose cumulative-start offset falls in the same `budget`
    * window. One shuffle (the lane window), lanes pack in parallel,
    * results are deterministic for any cluster size, and the same window
    * arithmetic runs in the DuckDB oracle. (A chunk that straddles a
    * boundary belongs to the sequence its FIRST token falls in — the
    * "pack then truncate/pad" contract; the trailing sequence of a lane
    * may be short.) */
  def packSequences(docs: DataFrame, maxTokens: Int = 32, overlap: Int = 8,
                    budget: Int = 96, buckets: Int = 32): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val chunks = chunkDocuments(docs, maxTokens, overlap)
      .withColumn("lane",
        expr(s"pmod(${Hashing.hash64("cast(doc_id AS string)")}, $buckets)").cast("int"))
    val w = Window.partitionBy(col("lane")).orderBy(col("doc_id"), col("chunk_id"))
    chunks
      .withColumn("start_tok",
        coalesce(sum(col("n_tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .withColumn("seq_id", (col("start_tok") / budget).cast("long"))
      .groupBy(col("lane"), col("seq_id"))
      .agg(count(lit(1)).cast("int").as("n_chunks"),
        sum(col("n_tokens")).as("seq_tokens"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"))
  }

  /** Deterministic hash-based sampling: keep rows whose md5-derived hash of
    * `keyExpr` falls under `permille`/1000 — reproducible across runs,
    * engines, and cluster sizes (unlike `sample()`, whose output depends on
    * partitioning), and stable under data growth: a document keeps or loses
    * membership only based on its own key. */
  def sampleByHash(df: DataFrame, keyExpr: String, permille: Int): DataFrame =
    df.filter(expr(s"pmod(${Hashing.hash64(keyExpr)}, 1000) < $permille"))

  /** Stratified deterministic sampling by detected language — the mixture-
    * weight application step after reading [[langDistribution]]: each
    * stratum gets its own permille keep-rate (downsample the dominant
    * language, boost rare ones), membership decided by the same
    * content-hash rule as [[sampleByHash]] so the sample is reproducible
    * across runs, engines, and cluster sizes. One scan + the langId
    * projection — no shuffle; the rate lookup is a codegen'd CASE chain. */
  def sampleStratified(docs: DataFrame, permilleByLang: Map[String, Int],
                       defaultPermille: Int = 100): DataFrame = {
    val rate = permilleByLang.toSeq.sortBy(_._1).foldLeft(lit(defaultPermille)) {
      case (acc, (l, p)) => when(col("lang_guess") === l, lit(p)).otherwise(acc)
    }
    // lang_guess comes from the shared projection, not a join — text stays
    // on the row, so the hash filter and the guess run in one scan
    withLangGuess(docs)
      .filter(expr(s"pmod(${Hashing.hash64("text")}, 1000)") < rate)
      .select("doc_id", "lang_guess")
  }

  /** Mixture UPSAMPLING — the other half of mixture-weight control
    * ([[sampleStratified]] down-samples): each document is replicated
    * `epochsByLang(lang_guess)` times (default `defaultEpochs`) with a
    * 1-based epoch index, the way a pretraining mixture over-represents
    * scarce domains. A pure per-row `explode(sequence(...))` projection —
    * no shuffle, and the replication factor multiplies only the stratum
    * it targets, never the whole corpus. Deterministic: the same doc gets
    * the same epochs on any cluster size or rerun. */
  def upsampleStratified(docs: DataFrame, epochsByLang: Map[String, Int],
                         defaultEpochs: Int = 1): DataFrame = {
    val epochs = epochsByLang.toSeq.sortBy(_._1).foldLeft(lit(defaultEpochs)) {
      case (acc, (l, e)) => when(col("lang_guess") === l, lit(e)).otherwise(acc)
    }
    // epochs < 1 DROPS the stratum (explode of an empty array). The guard
    // matters: Spark's sequence(1, 0) counts DOWN to [1, 0] — without it a
    // zero-weight stratum would be duplicated instead of excluded.
    withLangGuess(docs)
      .select(col("doc_id"), col("lang_guess"),
        explode(when(epochs >= 1, sequence(lit(1), epochs))
          .otherwise(array().cast("array<int>"))).as("epoch"))
  }

  /** Corpus "dataset card" rollup — the per-language summary a data
    * curator publishes with a corpus: document counts, token totals, byte
    * totals, mean quality score, and exact p50/p95 token-length
    * percentiles. ONE scan (quality and language columns stack on the
    * same projection — no self-join, no second tokenization pass) + one
    * tiny grouped aggregation; the percentile is the exact interpolated
    * one (at most `n_langs` groups, so the per-group sort is bounded by
    * the largest stratum — at 100 TB swap in `percentile_approx` for a
    * single-pass sketch, the documented twin of
    * [[graft.operators.Relational.medianOverTimeApprox]]). */
  def datasetCard(docs: DataFrame): DataFrame =
    withQualityCols(withLangGuess(docs))
      .withColumn("n_bytes", length(col("text")))
      .groupBy(col("lang_guess"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        sum(col("n_bytes")).as("total_bytes"),
        expr("round(avg(quality_score), 6)").as("avg_quality"),
        round(percentile(col("n_tokens"), lit(0.5)), 4).as("p50_tokens"),
        round(percentile(col("n_tokens"), lit(0.95)), 4).as("p95_tokens"))

  /** Corpus language distribution — the rollup a data curator reads before
    * setting mixture weights: document counts and mean marker confidence
    * per detected language. */
  def langDistribution(docs: DataFrame): DataFrame =
    langId(docs)
      .groupBy(col("lang_guess"))
      .agg(count(lit(1)).as("n_docs"),
        expr("round(avg(CAST(marker_hits AS DOUBLE)), 6)").as("avg_marker_hits"))

  /** Full `(lang × source)` CUBE of corpus volume — every rollup slice a
    * curation dashboard asks for (per language, per source, per cell, and
    * the grand total) in ONE pass: Spark expands the grouping sets from a
    * single shuffle of the 2-column projection, so the corpus is scanned
    * once, not once per slice. `gid` is the standard grouping bit vector
    * (first cube column = most significant), distinguishing a NULL group
    * value from a rollup row — both engines encode it identically, which
    * is what makes the cube oracle-checkable. */
  def corpusCube(docs: DataFrame): DataFrame =
    docs.cube(col("lang"), col("source"))
      .agg(grouping_id().as("gid"),
        count(lit(1)).as("cnt"),
        sum(col("n_chars")).as("sum_chars"))

  /** PII redaction — the scrub pass every training corpus needs before the
    * model sees it: emails and long digit runs (phone/card/SSN shapes)
    * replaced with typed placeholder tokens. Pure codegen'd
    * `regexp_replace` chain — one projection over the scan, no shuffle. */
  def redactPii(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "\\+?\\d[\\d ()-]{6,}\\d"
    docs.select(
      col("doc_id"),
      regexp_replace(
        regexp_replace(col("text"), email, "<EMAIL>"),
        phone, "<NUMBER>").as("redacted"))
  }

  /** Document fingerprint: md5 of whitespace-normalized text plus its 60-bit
    * integer form (for bucketing/joins on a fixed-width key). */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm_text",
        regexp_replace(trim(lower(col("text"))), "\\s+", " "))
      .select(
        col("doc_id"),
        md5(col("norm_text")).as("fp"),
        expr(Hashing.hash64("norm_text")).as("fp_int"))

  /** Keep documents at or above the corpus-wide quality quantile `q` —
    * "top 25% by quality" as a VALUE cutoff, not a rank cutoff: the
    * quantile is ONE grouped-aggregate row cross-joined back (Catalyst
    * broadcasts a single-row side), so the corpus is never globally
    * sorted and never shuffled — scan → broadcast-compare → filter.
    *
    * The exact interpolated `percentile` is the oracle-mirrorable form;
    * it collects the quality values of the whole corpus into one
    * aggregation buffer, fine at verification scale. At 100 TB swap in
    * [[qualityCutoffApprox]] — identical plan shape with a single-pass
    * `approx_percentile` sketch (the same exact/approx twinning as
    * [[datasetCard]]'s percentiles vs
    * [[graft.operators.Relational.medianOverTimeApprox]]). */
  def qualityCutoff(docs: DataFrame, q: Double = 0.75): DataFrame =
    qualityCutoffOver(docs, round(percentile(col("quality_score"), lit(q)), 6))

  /** Single-pass sketch twin of [[qualityCutoff]] for the 100 TB path —
    * the cutoff value is approximate, so the kept set has no SQL oracle
    * (driver records a rows-only check); the plan shape is identical. */
  def qualityCutoffApprox(docs: DataFrame, q: Double = 0.75): DataFrame =
    qualityCutoffOver(docs,
      round(approx_percentile(col("quality_score"), lit(q), lit(10000)), 6))

  private def qualityCutoffOver(docs: DataFrame,
                                cutoffAgg: org.apache.spark.sql.Column): DataFrame = {
    val scored = withQualityCols(docs)
      .select(col("doc_id"), col("quality_score"))
    val cutoff = scored.agg(cutoffAgg.as("cutoff"))
    scored.join(cutoff) // 1-row side → BroadcastNestedLoopJoin, no shuffle
      .filter(col("quality_score") >= col("cutoff"))
      .select(col("doc_id"), col("quality_score"))
  }

  /** Corpus-wide top-k n-grams — the vocabulary/phrase report of a
    * dataset card (and the input to stop-phrase lists). Grouped count over
    * the exploded gram stream (map-side partials bound the shuffle by the
    * DISTINCT gram vocabulary), then `orderBy.limit` → Spark plans
    * TakeOrderedAndProject: per-partition top-k heaps, k rows to the
    * driver, never a global sort. */
  def topNgrams(docs: DataFrame, n: Int = 2, k: Int = 20): DataFrame =
    docs
      .select(expr(tokensExpr).as("toks"))
      .filter(size(col("toks")) >= n)
      .select(explode(expr(
        s"""transform(sequence(0, size(toks) - $n),
           |  i -> array_join(slice(toks, i + 1, $n), ' '))""".stripMargin))
        .as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram").asc)
      .limit(k)

  /** Deterministic train/val/test split by content hash — the
    * leakage-safe assignment rule (hashing CONTENT, not position or
    * arrival order, keeps byte-identical documents in the same split even
    * across corpus versions, and re-runs reproduce the split at any
    * parallelism). Pure projection over the scan, no shuffle — same
    * membership rule as [[sampleByHash]]. */
  def splitByHash(docs: DataFrame, valPermille: Int = 50,
                  testPermille: Int = 50): DataFrame =
    docs.select(col("doc_id"),
      expr(s"pmod(${Hashing.hash64("text")}, 1000)").as("b"))
      .select(col("doc_id"),
        when(col("b") < testPermille, "test")
          .when(col("b") < testPermille + valPermille, "val")
          .otherwise("train").as("split"))

  /** Top-k TF-IDF keywords per document — the classic content descriptor
    * (per-doc term frequency × inverse document frequency, ties → smaller
    * token). Three bounded shapes: TF is a grouped count over the exploded
    * token stream; DF falls out of TF by a second tiny aggregate (one row
    * per distinct (doc, token) already exists — no second corpus pass);
    * the corpus size joins as a broadcast 1-row; the top-k window
    * partitions by doc_id, so no global sort. Token strings ride the
    * (doc_id, token, tf) shuffle — bounded by the distinct doc-term list,
    * not raw corpus size. */
  def tfIdfKeywords(docs: DataFrame, k: Int = 5): DataFrame = {
    val tf = docs
      .select(col("doc_id"), explode(expr(tokensExpr)).as("keyword"))
      .groupBy(col("doc_id"), col("keyword"))
      .agg(count(lit(1)).as("tf"))
    val df_ = tf.groupBy(col("keyword")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("keyword").asc)
    tf.join(broadcast(df_.join(n)), "keyword")
      .select(col("doc_id"), col("keyword"), col("tf"),
        round(col("tf") * log(col("n") / col("df")), 6).as("score"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
  }

  /** Composite Gopher-rule document filter (Rae et al. 2021,
    * arXiv:2112.11446 Appendix A) — the rule stack production pipelines
    * apply before model-based scoring: token-count range, mean token
    * length range, alphabetic-token fraction, minimum stop-word count, and
    * the duplicate-2-gram repetition cap. Emits every signal plus the
    * conjunctive `keep` flag so downstream can audit WHICH rule dropped a
    * document (the flags are the dataset-card input).
    *
    * Pure per-row array expressions over one scan — no shuffle, no UDF;
    * same 100 TB shape as [[qualityScore]]. Thresholds default to scaled-
    * down Gopher values (the paper's 50-token minimum assumes web pages;
    * the fixtures are short documents). */
  def gopherFilter(docs: DataFrame, minTokens: Int = 5,
                   maxTokens: Int = 100000,
                   minMeanTokenLen: Double = 2.0,
                   maxMeanTokenLen: Double = 10.0,
                   minAlphaFrac: Double = 0.8,
                   minStopwords: Int = 1,
                   maxDupGramFrac: Double = 0.5): DataFrame =
    docs
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
      .withColumn("grams", expr(
        "CASE WHEN size(toks) >= 2 THEN transform(sequence(0, size(toks) - 2), i -> toks[i] || ' ' || toks[i + 1]) END"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        expr("round(aggregate(toks, 0L, (a, x) -> a + length(x)) / CAST(size(toks) AS DOUBLE), 6)")
          .as("mean_token_len"),
        expr("round(size(filter(toks, t -> t rlike '^[a-z]+$')) / CAST(size(toks) AS DOUBLE), 6)")
          .as("alpha_frac"),
        expr(s"size(filter(toks, t -> t IN ${inList(stopwords)}))")
          .as("n_stopwords"),
        expr("""CASE WHEN grams IS NULL THEN CAST(0.0 AS DOUBLE)
               |ELSE round(1.0 - CAST(size(array_distinct(grams)) AS DOUBLE) / size(grams), 6) END"""
          .stripMargin).as("dup_gram_frac"))
      .withColumn("keep",
        (col("n_tokens") >= minTokens && col("n_tokens") <= maxTokens &&
          col("mean_token_len") >= minMeanTokenLen &&
          col("mean_token_len") <= maxMeanTokenLen &&
          col("alpha_frac") >= minAlphaFrac &&
          col("n_stopwords") >= minStopwords &&
          col("dup_gram_frac") <= maxDupGramFrac).cast("int"))

  /** Unigram language-model score per document — the statistical quality
    * signal of the CCNet pipeline (Wenzek et al. 2020, arXiv:1911.00359,
    * which ranks by KenLM perplexity; the unigram form is the same shape
    * with the model computed in-engine): mean log P(token) under the
    * corpus's own unigram distribution. Natural-sounding documents score
    * high; keyboard-mash and rare-token soup score low.
    *
    * Scale shape: the vocabulary is a grouped count over the exploded
    * token stream (map-side partial counts; the shuffle carries (token,
    * count) pairs bounded by the DISTINCT vocabulary, not the corpus);
    * per-token log-probs then BROADCAST back onto the token stream —
    * a vocabulary is millions of rows at web scale, tens of MB, the
    * textbook broadcast dimension. Per-document summation runs on
    * DECIMAL(20,9) over 9dp-rounded logs so the total is
    * association-order-exact in any engine at any parallelism. */
  def unigramLogProb(docs: DataFrame): DataFrame = {
    val toks = docs.select(col("doc_id"), explode(expr(tokensExpr)).as("tok"))
    val vocab = toks.groupBy(col("tok")).agg(count(lit(1)).as("cnt"))
    val total = vocab.agg(sum(col("cnt")).as("total"))
    val lp = vocab.join(total) // 1-row side → broadcast, no shuffle
      .select(col("tok"),
        round(log(col("cnt") / col("total")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(20, 9)).as("lp"))
    toks.join(broadcast(lp), Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6)
          .as("mean_logprob"))
  }

  /** Sequence-length distribution: fixed-width buckets of per-document
    * token counts — the dataset-report histogram that drives context-length
    * and packing decisions. Integer bucket arithmetic (`div`), not
    * `floor(log2(...))`: float log at exact power-of-two boundaries is
    * engine-dependent in the last ulp, integer division is not. One scan,
    * one tiny-group shuffle. */
  def lengthHistogram(docs: DataFrame, bucketWidth: Int = 16): DataFrame =
    docs
      .select(size(expr(tokensExpr)).as("n_tokens"))
      .groupBy(expr(s"n_tokens div $bucketWidth").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))

  /** Multi-cutoff generalization of [[qualityCutoff]]: assign every
    * document a quality TIER (0 = bottom, `tiers - 1` = top) by exact
    * interpolated quantile boundaries — the bucketing a curation pipeline
    * uses for quality-stratified mixing (e.g. upsample the top decile).
    *
    * Same 100 TB shape as the single cutoff: the `tiers - 1` boundary
    * values are ONE aggregate row (Spark `percentile` over an array of
    * probabilities ≡ DuckDB `quantile_cont` — both exact interpolation,
    * IEEE-identical), broadcast back onto the scan; the tier is
    * `#cutoffs ≤ score`, a per-row filter over a tiny array. NOT `ntile`:
    * a rank-based ntile needs a global sort (single-partition window — the
    * scale-killer); boundary-value bucketing gives the same tiers up to
    * tie handling at zero extra shuffles. */
  def qualityTiers(docs: DataFrame, tiers: Int = 10): DataFrame = {
    val probs = (1 until tiers).map(_.toDouble / tiers)
    val scored = withQualityCols(docs)
      .select(col("doc_id"), col("quality_score"))
    val cuts = scored.agg(
      expr(s"transform(percentile(quality_score, array(${probs.mkString(",")})), c -> round(c, 6))")
        .as("cuts"))
    scored.join(cuts) // 1-row side → BroadcastNestedLoopJoin, no shuffle
      .select(col("doc_id"), col("quality_score"),
        expr("size(filter(cuts, c -> quality_score >= c))").as("tier"))
  }

  /** Per-source document cap — the domain-level throttle a crawl pipeline
    * applies so no single site dominates the corpus (cap pages per domain
    * before mixing): keep at most `maxDocs` documents per `source`,
    * selected by the deterministic content-hash order (reproducible at any
    * parallelism, no arrival-order dependence), ties broken by doc_id.
    *
    * Scale shape: the ranking window shuffles only (doc_id, source,
    * 8-byte hash) triples — text stays in its scan; callers semi-join the
    * survivors back on doc_id (same contract as [[Dedup.exactSurvivorIds]]).
    * Per-source skew is the window's partition skew; a source with
    * billions of pages still ranks in one partition, which is why the
    * payload is 24 bytes/row and not the document. */
  def capPerSource(docs: DataFrame, maxDocs: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("h").asc, col("doc_id").asc)
    docs
      .select(col("doc_id"), col("source"),
        expr(Hashing.hash64("text")).as("h"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= maxDocs)
      .select(col("doc_id"), col("source"), col("rk"))
  }

  /** Within-document repetition signals — the Gopher-style quality rule
    * (Rae et al. 2021, arXiv:2112.11446 Appendix A: drop documents whose
    * duplicate n-gram fraction is high): per document, the token-2-gram
    * count, distinct count, duplicate fraction, and the share of the
    * single most frequent 2-gram. Documents under 2 tokens have no
    * 2-grams and are dropped.
    *
    * Explode → two stacked aggregates on doc_id (round-4 rewrite): the
    * original per-row nested-HOF form computed the top-gram share as a
    * codegen'd O(distinct · total) loop PER DOCUMENT — quadratic in
    * document length, the wrong bound for book-length docs at 100 TB (and
    * 1.8 s of the sf0.1 sweep by itself). The grouped form shuffles
    * (doc_id, gram, count) partial rows once and every aggregate is
    * linear; same output bit-for-bit, same oracle. */
  def repetitionSignals(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(tokensExpr).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), i -> toks[i] || ' ' || toks[i + 1])"))
        .as("gram"))
      .groupBy(col("doc_id"), col("gram"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("total"), count(lit(1)).as("dist"),
        max(col("c")).as("top"))
      .select(
        col("doc_id"),
        col("total").cast("int").as("n_grams"),
        col("dist").cast("int").as("distinct_grams"),
        expr("round(1.0 - CAST(dist AS DOUBLE) / total, 6)")
          .as("dup_gram_frac"),
        expr("round(CAST(top AS DOUBLE) / total, 6)").as("top_gram_frac"))

  /** Passage-level boilerplate removal — the cross-document repeated-span
    * scrub a web-crawl pipeline runs before training (headers, footers,
    * cookie banners, licence blurbs): any fixed-width passage of
    * `passageWords` consecutive words appearing in at least `minDocs`
    * DISTINCT documents is dropped from every document; what remains is
    * re-assembled in original order. This is the bounded-window
    * approximation of exact substring dedup (Lee et al. 2021,
    * arXiv:2107.06499 — their suffix-array pass; a fixed passage grid
    * trades their arbitrary-boundary matches for a shuffle that carries
    * only 8-byte hashes).
    *
    * Scale shape: passages are hashed in the scan projection; the
    * document-frequency aggregate shuffles (hash, doc_id) pairs with
    * map-side partial distinct; the resulting BOILERPLATE set (passages
    * repeated across ≥ minDocs docs — small by construction, it is the
    * boilerplate vocabulary, not the corpus) broadcasts back as a LEFT ANTI
    * join, so passage text itself only moves in the final re-assembly
    * shuffle keyed by doc_id — the shuffle the output contract forces.
    * Output: one row per input doc, `text_clean` = surviving passages
    * joined in order ('' when everything was boilerplate). */
  def dedupPassages(docs: DataFrame, passageWords: Int = 8,
                    minDocs: Int = 2): DataFrame = {
    val p = docs
      .select(col("doc_id"), split(col("text"), " ").as("w"))
      .select(col("doc_id"), posexplode(expr(
        s"""transform(sequence(0, CAST(ceil(size(w) / ${passageWords}.0) AS INT) - 1),
           |  i -> array_join(slice(w, i * $passageWords + 1, $passageWords), ' '))"""
          .stripMargin)).as(Seq("idx", "passage")))
      .withColumn("h", expr(Hashing.hash64("passage")))
    val boiler = p.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("df"))
      .filter(col("df") >= minDocs)
      .select("h")
    val rebuilt = p.join(broadcast(boiler), Seq("h"), "left_anti")
      .groupBy(col("doc_id"))
      .agg(expr(
        "array_join(transform(array_sort(collect_list(struct(idx, passage))), x -> x.passage), ' ')")
        .as("text_clean"))
    docs.select(col("doc_id"))
      .join(rebuilt, Seq("doc_id"), "left_outer")
      .select(col("doc_id"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Temperature-based mixture sampling — the standard multilingual
    * rebalancing rule (sampling probability ∝ stratum-size^α, α < 1
    * flattens the distribution so rare languages are over-represented
    * relative to their share): each language's keep-rate is
    * `min(1000, floor(basePermille · (n_max / n_lang)^(1-α)))` permille,
    * so the LARGEST language keeps `basePermille`‰ and smaller ones keep
    * proportionally more. Membership is the same deterministic
    * content-hash rule as [[sampleByHash]].
    *
    * Two scans of shape that survives 100 TB: (1) the language histogram —
    * a grouped count whose output is `n_langs` rows; (2) the corpus scan
    * with the rate table BROADCAST-joined on `lang_guess` (a few rows), so
    * the corpus itself never shuffles. The rate arithmetic runs on the
    * tiny histogram, not per document. */
  def sampleTemperature(docs: DataFrame, alpha: Double = 0.5,
                        basePermille: Int = 200): DataFrame = {
    val withLang = withLangGuess(docs)
    val ratio = col("n_max").cast("double") / col("n_lang").cast("double")
    // sqrt (the α=0.5 default) is IEEE-correctly-rounded in both Spark and
    // DuckDB, so the oracle reproduces the rate table bit-for-bit; pow
    // carries a ≤1-ulp engine skew, acceptable for non-default α (the rate
    // only shifts if the product lands exactly on an integer boundary)
    val grown = if (1.0 - alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha)
    val rates = withLang
      .groupBy(col("lang_guess")).agg(count(lit(1)).as("n_lang"))
      .withColumn("n_max",
        max(col("n_lang")).over(org.apache.spark.sql.expressions.Window
          .partitionBy()))
      .select(col("lang_guess").as("rate_lang"),
        least(lit(1000), floor(lit(basePermille.toDouble) * grown))
          .cast("int").as("keep_permille"))
    withLang
      .join(broadcast(rates), col("lang_guess") === col("rate_lang"))
      .filter(expr(s"pmod(${Hashing.hash64("text")}, 1000)") < col("keep_permille"))
      .select(col("doc_id"), col("lang_guess"), col("keep_permille"))
  }

  /** Token-budget mixture plan — water-filling allocation of a total
    * token budget across sources: every source keeps all its tokens up to
    * a common level L, where L solves Σ min(T_s, L) = budget — the
    * standard answer to "fill N tokens from these crawls without letting
    * the biggest source drown the mixture" (small sources survive whole,
    * large sources are throttled to the same ceiling).
    *
    * Closed form, no iteration: with sources sorted by size ascending,
    * L_i = (budget − prefix_{i−1}) / (n − i + 1) is the level assuming
    * sources 1..i−1 are kept whole; the FIRST i where L_i < T_i binds.
    * Everything happens on the per-source histogram — n_sources rows —
    * after ONE corpus scan for token totals; the emitted keep_permille
    * column composes with the content-hash samplers
    * ([[sampleStratified]]) to apply the plan in a second scan-only pass.
    * Window functions over n_sources rows, not documents. */
  def tokenBudgetPlan(docs: DataFrame, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("tokens").asc, col("source").asc)
    val totals = docs
      .select(col("source"), size(expr(tokensExpr)).as("n"))
      .groupBy(col("source")).agg(sum(col("n")).as("tokens"))
    val leveled = totals
      .withColumn("rn", row_number().over(w))
      .withColumn("prefix",
        coalesce(sum(col("tokens")).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, -1)), lit(0L)))
      .withColumn("n_src", count(lit(1)).over(
        w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.unboundedFollowing)))
      .withColumn("level",
        (lit(budgetTokens) - col("prefix")).cast("double") /
          (col("n_src") - col("rn") + 1).cast("double"))
    // the binding level is the FIRST (smallest-rn) violated row — later
    // rows' levels are computed under a wrong keep-whole assumption and
    // undershoot, so min(level) would be wrong; min_by(level, rn) is right
    val binding = leveled.filter(col("level") < col("tokens"))
      .agg(min_by(col("level"), col("rn")).as("l"))
    leveled.join(broadcast(binding), joinExprs = lit(true), "left")
      .select(col("source"), col("tokens"),
        when(col("l").isNull || col("tokens") <= col("l"), lit(1000))
          .otherwise(floor(lit(1000.0) * col("l") / col("tokens")))
          .cast("int").as("keep_permille"))
  }

  /** Bigram-LM document scoring — the conditional upgrade of
    * [[unigramLogProb]] (CCNet-style model-based quality, one order up):
    * per document, the mean ln P(wᵢ | wᵢ₋₁) under the corpus's own bigram
    * distribution, P(w₂|w₁) = c(w₁w₂) / Σ_w c(w₁w). Repetitive template
    * text scores HIGH (its transitions dominate the model), incoherent
    * token soup scores LOW — the discriminator unigram models miss, since
    * shuffling a document leaves its unigram score unchanged.
    *
    * Scale shape: the bigram model is two grouped counts (the prefix
    * normalizer is a rollup OF the bigram table — no second corpus pass);
    * unlike the unigram vocab, the bigram vocabulary is NOT broadcast —
    * it grows super-Heaps with corpus size — so docs join the model on
    * the (w₁, w₂) shuffle key instead (per-doc gram rows vs model rows,
    * both map-side-combined). Log-probs ride as DECIMAL(20,9) so doc sums
    * are association-order-exact at any parallelism. */
  def bigramLogProb(docs: DataFrame): DataFrame = {
    val grams = docs.select(col("doc_id"), expr(tokensExpr).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(0, size(toks) - 2),
          |  i -> struct(toks[i] AS w1, toks[i+1] AS w2))""".stripMargin))
        .as("g"))
      .select(col("doc_id"), col("g.w1"), col("g.w2"))
    val bg = grams.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c2"))
    val pref = bg.groupBy(col("w1")).agg(sum(col("c2")).as("c1"))
    val model = bg.join(pref, "w1")
      .select(col("w1"), col("w2"),
        round(log(col("c2") / col("c1")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(20, 9)).as("lp"))
    grams.join(model, Seq("w1", "w2"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"),
        round(sum(col("lp")).cast("double") / count(lit(1)), 6)
          .as("mean_logprob"))
  }

  /** Zipf-law fit over the corpus token distribution — the corpus-health
    * diagnostic (natural text follows freq ∝ rank^s with s ≈ −1; a slope
    * far from −1 signals boilerplate floods, template spam, or truncated
    * vocabulary — the same signal dataset cards report). Returns the OLS
    * slope/intercept of ln(freq) on ln(rank) plus Pearson r², fit over the
    * top-`vocabCap` tokens.
    *
    * Scale shape: the token histogram is one exploded groupBy (map-side
    * partial counts); the head is TakeOrderedAndProject — `vocabCap` rows
    * total, NOT a global sort of the Heaps-law vocabulary — so the rank
    * window and regression aggregates run on a driver-bounded table. The
    * fit-on-the-head restriction is also the statistically honest form:
    * Zipf regressions are standardly fit on the high-frequency head, where
    * the power law holds. */
  def zipfFit(docs: DataFrame, vocabCap: Int = 1000): DataFrame = {
    val head = docs
      .select(explode(expr(tokensExpr)).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("freq"))
      .orderBy(col("freq").desc, col("tok").asc)
      .limit(vocabCap)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc, col("tok").asc)
    val (x, y) = (log(col("rank").cast("double")), log(col("freq").cast("double")))
    head
      .withColumn("rank", row_number().over(w))
      .agg(
        round(regr_slope(y, x), 6).as("slope"),
        round(regr_intercept(y, x), 6).as("intercept"),
        round(pow(corr(y, x), 2.0), 6).as("r2"),
        count(lit(1)).as("n_tokens"))
  }

  /** Quality-weighted sampling — keep probability PROPORTIONAL to the
    * document's quality score (normalized by the corpus max, a 1-row
    * broadcast), the soft alternative to a hard quality cutoff: the best
    * docs keep `basePermille`, a half-quality doc keeps half that.
    * Membership is the repo's deterministic content-hash rule (same as
    * [[sampleByHash]]/[[sampleStratified]]), so the sample is reproducible,
    * leakage-coherent across engines, and one codegen'd scan — no
    * rand(), no sort, no second pass. */
  def sampleWeighted(docs: DataFrame, basePermille: Int = 500): DataFrame = {
    val scored = withQualityCols(docs)
      .select(col("doc_id"), col("text"), col("quality_score"))
    val mx = scored.agg(max(col("quality_score")).as("max_q"))
    scored.join(broadcast(mx))
      .withColumn("keep_permille",
        floor(lit(basePermille.toDouble) * col("quality_score") / col("max_q"))
          .cast("int"))
      .filter(expr(s"pmod(${Hashing.hash64("text")}, 1000)") <
        col("keep_permille"))
      .select(col("doc_id"), col("quality_score"), col("keep_permille"))
  }

  /** CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    * document under the corpus LM ([[unigramLogProb]]), then split EACH
    * LANGUAGE into head/middle/tail at its own exact interpolated
    * terciles — the standard pre-training triage (keep head, sample
    * middle, drop tail), per-language because LM scores are not
    * comparable across languages. The cut table is 2 doubles per language
    * (broadcast, bounded by the language inventory); the corpus-sized
    * work is the LM scoring itself, and the bucket assignment is a
    * codegen'd two-way compare against the broadcast cuts — no sort, no
    * second scan. Scores and cuts are both 6dp-rounded before the
    * boundary compare, so the bucket edge is engine-stable. */
  def ccnetBuckets(docs: DataFrame): DataFrame = {
    val scored = docs.select(col("doc_id"), col("lang"))
      .join(unigramLogProb(docs).select(col("doc_id"), col("mean_logprob")),
        "doc_id")
    val cuts = scored.groupBy(col("lang")).agg(
      round(percentile(col("mean_logprob"), lit(1.0 / 3)), 6).as("p33"),
      round(percentile(col("mean_logprob"), lit(2.0 / 3)), 6).as("p66"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("mean_logprob"),
        when(col("mean_logprob") >= col("p66"), "head")
          .when(col("mean_logprob") >= col("p33"), "middle")
          .otherwise("tail").as("bucket"))
  }

  /** Training-export shard assignment: shard = seeded content-independent
    * hash of doc_id mod `nShards` — the deterministic corpus "shuffle"
    * every training run needs (stable across corpus versions for
    * unchanged ids; changing `seed` re-deals the whole corpus). A pure
    * projection — no shuffle, no state. */
  def shardAssign(docs: DataFrame, nShards: Int = 16,
                  seed: String = "v1"): DataFrame =
    docs.withColumn("shard",
      expr(s"pmod(${Hashing.hash64(s"concat(cast(doc_id AS STRING), '_$seed')")}, $nShards)")
        .cast("int"))

  /** Per-shard export manifest — the summary a training job reads before
    * consuming shards: doc/token/char volume and the dominant source per
    * shard (dominance ties → lexicographically smaller source). Two
    * bounded aggregations: (shard, source) cells first — ≤ nShards ×
    * n_sources rows — then a rank-1 window ON THE CELL TABLE and a
    * shard-level rollup; raw text never crosses an exchange, and token
    * counts use the repo's whitespace convention ([[tokenCounts]]). At
    * 100 TB this manifest is the handshake between the data pipeline and
    * the trainer — doc membership is [[shardAssign]]'s pure projection,
    * so writing the actual shards is an embarrassingly parallel
    * `partitionBy(shard)` with no extra planning. */
  def shardPlan(docs: DataFrame, nShards: Int = 16,
                seed: String = "v1"): DataFrame = {
    val cells = shardAssign(docs, nShards, seed)
      .select(col("shard"), col("source"),
        size(expr(tokensExpr)).cast("long").as("toks"),
        length(col("text")).cast("long").as("chars"))
      .groupBy(col("shard"), col("source"))
      .agg(count(lit(1)).as("src_docs"), sum(col("toks")).as("src_toks"),
        sum(col("chars")).as("src_chars"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(col("src_docs").desc, col("source").asc)
    cells
      .withColumn("rk", row_number().over(w))
      .groupBy(col("shard"))
      .agg(
        sum(col("src_docs")).as("n_docs"),
        sum(col("src_toks")).as("n_tokens"),
        sum(col("src_chars")).as("n_chars"),
        countDistinct(col("source")).as("n_sources"),
        max(when(col("rk") === 1, col("source"))).as("top_source"))
      .orderBy(col("shard"))
  }

  /** Materialize the training export: one JSONL directory per shard
    * (`outDir/shard=N/`), membership by [[shardAssign]]'s seeded pure
    * projection. The rows are clustered on the shard key before the write,
    * so each shard directory receives exactly ONE file per export (the
    * small-files discipline the streaming stores use) and a trainer's
    * reader streams one sequential file per shard. `to_json(struct(*))`
    * keeps the full row — schema evolution is the trainer's parse, not a
    * parquet contract — and the write is embarrassingly parallel: no
    * planning beyond the one clustering exchange. */
  def exportShards(docs: DataFrame, outDir: String, nShards: Int = 16,
                   seed: String = "v1"): Unit = {
    val cols = docs.columns.map(col)
    shardAssign(docs, nShards, seed)
      .select(col("shard"), to_json(struct(cols: _*)).as("value"))
      .repartition(col("shard"))
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .partitionBy("shard").text(outDir)
  }
}
