package graft.tools

import org.apache.spark.sql.DataFrame

/** The ONE result-set / centroid digest derivation every certification
  * gates its `hash_match` on ([[IvfIndexBench]], [[GuardIvfPipelineCert]])
  * — hoisted so a format tweak (row separator, digest truncation) can
  * never make two certs' hashes silently incomparable (the same
  * one-derivation discipline as `GuardNearDupCert.oracle`). */
private[tools] object CertHash {

  /** (row count, 16-hex MD5) of a `(query_id: long, neighbor_id: long,
    * score: double, rank: int)` result set, order-independent. */
  def resultHash(df: DataFrame): (Long, String) = {
    val rows = df.collect()
      .map(r => s"${r.getLong(0)}|${r.getLong(1)}|${r.getDouble(2)}|${r.getInt(3)}")
      .sorted
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach(s => md.update(s.getBytes("UTF-8")))
    (rows.length.toLong,
      md.digest().map("%02x".format(_)).mkString.take(16))
  }

  /** 16-hex MD5 over a centroid matrix's doubles in row-major order. */
  def centsDigest(cents: Array[Array[Double]]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    cents.foreach(_.foreach(d => md.update(
      java.nio.ByteBuffer.allocate(8).putDouble(d).array())))
    md.digest().map("%02x".format(_)).mkString.take(16)
  }
}
