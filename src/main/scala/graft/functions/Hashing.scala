package graft.functions

/** Cross-engine-deterministic hashing fragments.
  *
  * Content hashing for dedup/fingerprinting must produce the same value in
  * any engine that evaluates it (the correctness oracle runs the same logic
  * in DuckDB). Engine-native hashes (Spark's Murmur3 `hash()`, DuckDB's
  * `hash()`) differ, so we standardize on md5 — available and bit-identical
  * everywhere — and derive a 60-bit non-negative integer from its first 15
  * hex digits. 60 bits keeps the value comfortably inside a signed int64 in
  * every engine and loses nothing for min-hash / sign-bit purposes.
  *
  * These are SQL fragments (not UDFs): they stay inside Catalyst, fold into
  * whole-stage codegen, and need no closure serialization at 100 TB scale.
  */
object Hashing {

  /** SQL fragment: 60-bit integer hash of the given SQL string expression. */
  def hash64(sqlExpr: String): String =
    s"CAST(conv(substring(md5($sqlExpr), 1, 15), 16, 10) AS BIGINT)"

  /** DuckDB-equivalent fragment for [[hash64]] — used when generating oracle
    * SQL so both engines compute identical values. */
  def hash64DuckDb(sqlExpr: String): String =
    s"CAST(('0x' || substring(md5($sqlExpr), 1, 15)) AS BIGINT)"

  /** Second independent 60-bit hash from the same md5 (hex digits 17-31) —
    * the md5 is computed once per row (codegen subexpression elimination);
    * together with [[hash64]] it seeds Kirsch-Mitzenmacher double hashing
    * `h_i = h1 + i * (h2 & maskKM)` for k-wise hash families without k md5
    * evaluations per element. */
  def hash64Hi(sqlExpr: String): String =
    s"CAST(conv(substring(md5($sqlExpr), 17, 15), 16, 10) AS BIGINT)"

  def hash64HiDuckDb(sqlExpr: String): String =
    s"CAST(('0x' || substring(md5($sqlExpr), 17, 15)) AS BIGINT)"

  /** 2^56-1: caps h2 so `h1 + 15 * h2` stays well inside signed int64 in
    * every engine (DuckDB errors on BIGINT overflow; Spark would wrap). */
  val maskKM = 72057594037927935L

  /** Deterministic pseudo-random doubles in [-1, 1) for LSH hyperplanes —
    * generated once on the driver from a fixed seed and inlined as literals
    * into both the Spark plan and the oracle SQL, so the (tiny) plane matrix
    * never needs cross-engine hash parity and costs nothing per row. */
  def hyperplanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    // round to 6dp so the decimal literal round-trips identically
    Array.fill(numPlanes, dim)(math.rint(rng.nextDouble() * 2e6 - 1e6) / 1e6)
  }
}
