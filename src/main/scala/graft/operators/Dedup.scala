package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Hashing

/** Deduplication operators for training-data pipelines: exact (hash
  * group-by), MinHash+LSH banding, SimHash, and n-gram Jaccard — over the
  * `documents` table.
  *
  * Scale design:
  *  - Signatures (minhash/simhash) are per-row array expressions — a single
  *    projection over the scan, no shuffle, no UDF.
  *  - Candidate generation shuffles only (doc_id, band_key) pairs — a few
  *    dozen bytes/doc — never document text. The band join is an equi-join
  *    on the band hash, so Catalyst plans a shuffle hash-join partitioned by
  *    band_key; identical docs land in the same partition.
  *  - The shingle self-join for exact Jaccard caps per-shingle document
  *    frequency ([[maxShingleDf]]): ubiquitous shingles ("in the the")
  *    produce O(df²) candidate pairs — the classic skew bomb at 100 TB —
  *    and carry no similarity signal. Dropping them bounds the join fanout.
  *  - All hashes are md5-derived ([[Hashing.hash64]]) so the DuckDB oracle
  *    reproduces them bit-for-bit.
  */
object Dedup {

  /** Exact dedup: group by normalized-text fingerprint, keep the lowest
    * doc_id as canonical. Output one row per distinct content. */
  def exactDedup(docs: DataFrame): DataFrame =
    docs
      .withColumn("fp",
        md5(regexp_replace(trim(lower(col("text"))), "\\s+", " ")))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("canonical_id"),
        count(lit(1)).as("n_dups"))

  /** Distinct word n-gram shingles per document (the Jaccard universe). */
  def withShingles(docs: DataFrame, n: Int = 3): DataFrame =
    docs
      .withColumn("toks", expr(TextAnalysis.tokensExpr))
      .filter(size(col("toks")) >= n)
      .withColumn("sh", expr(
        s"""array_distinct(transform(sequence(0, size(toks) - $n),
           |  i -> ${(0 until n).map(j => s"toks[i + $j]").mkString(" || ' ' || ")}))"""
          .stripMargin))

  /** MinHash signatures: k independent md5-seeded min-hashes over the
    * shingle set. One pass, one array column, no shuffle. */
  def minhashSignatures(docs: DataFrame, k: Int = 16, n: Int = 3): DataFrame = {
    val h = Hashing.hash64("concat(cast(hh AS string), ':', s)")
    withShingles(docs, n)
      .select(col("doc_id"),
        expr(s"transform(sequence(0, ${k - 1}), hh -> array_min(transform(sh, s -> $h)))")
          .as("sig"))
  }

  /** LSH banding: split the signature into `bands` bands of `rowsPerBand`,
    * hash each band, and emit candidate pairs of documents agreeing on at
    * least one full band. Only (doc_id, band) rows are shuffled. */
  def minhashCandidatePairs(docs: DataFrame, k: Int = 16,
                            bands: Int = 4, n: Int = 3): DataFrame = {
    val rpb = k / bands
    val bandRows = minhashSignatures(docs, k, n)
      .select(col("doc_id"), expr(
        s"""explode(transform(sequence(0, ${bands - 1}), b -> struct(
           |  b AS band_id,
           |  md5(array_join(transform(slice(sig, b * $rpb + 1, $rpb),
           |                           x -> cast(x AS string)), ',')) AS band_key)))"""
          .stripMargin).as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_key"))
    val a = bandRows.alias("a")
    val b = bandRows.alias("b")
    a.join(b,
        col("a.band_id") === col("b.band_id") &&
          col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash over the token bag: per bit, sum ±1 contributions of
    * each token's hash bit; the signature bit is the sign of the sum.
    * Near-duplicates then differ in few bits (Hamming distance). */
  def simhash(docs: DataFrame): DataFrame = {
    val th = Hashing.hash64("t")
    docs
      .withColumn("toks", expr(TextAnalysis.tokensExpr))
      .withColumn("hs", expr(s"transform(toks, t -> $th)"))
      .select(col("doc_id"), expr(
        """aggregate(sequence(0, 31), CAST(0 AS BIGINT), (acc, j) ->
          |  acc + IF(aggregate(hs, 0, (a, h) -> a + IF((shiftright(h, j) & 1) = 1, 1, -1)) > 0,
          |           shiftleft(CAST(1 AS BIGINT), j), CAST(0 AS BIGINT)))"""
          .stripMargin).as("simhash"))
  }

  /** Skew guard for the shingle self-join: shingles appearing in more
    * documents than this are dropped before pairing. */
  val maxShingleDf = 100

  /** Exact n-gram Jaccard similarity for candidate pairs sharing at least
    * one (non-ubiquitous) shingle. Inverted-index self-join pattern:
    * explode → equi-join on shingle → per-pair intersection counts. */
  def ngramJaccardPairs(docs: DataFrame, n: Int = 3,
                        threshold: Double = 0.2): DataFrame = {
    val e = withShingles(docs, n)
      .select(col("doc_id"), size(col("sh")).as("sz"),
        explode(col("sh")).as("s"))
    val rare = e.groupBy(col("s")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxShingleDf)
      .select("s")
    val ef = e.join(rare, "s")
    val a = ef.alias("a")
    val b = ef.alias("b")
    a.join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sz").as("sza"), col("b.sz").as("szb"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        round(col("inter") * lit(1.0) / (col("sza") + col("szb") - col("inter")), 6))
      .filter(col("jaccard") > threshold)
      .select("doc_a", "doc_b", "jaccard")
  }
}
