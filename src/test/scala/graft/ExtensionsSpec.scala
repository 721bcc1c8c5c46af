package graft

import graft.functions.GraftExtensions
import graft.sources.Tables

/** SQL surface of the custom expressions via function registration. */
class ExtensionsSpec extends GraftSuite {

  test("cosine_sim and graft_hash64 are callable from SQL") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext_test")
    val row = spark.sql("""
      SELECT cosine_sim(a.embedding, b.embedding) AS sim,
             graft_hash64(CAST(a.vec_id AS STRING)) AS h
      FROM emb_ext_test a JOIN emb_ext_test b ON a.vec_id = 0 AND b.vec_id = 0
    """).first()
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-12) // self-similarity = 1
    assert(row.getLong(1) >= 0L)
  }

  test("SQL cosine_sim agrees with the Column API expression") {
    GraftExtensions.register(spark)
    Tables.embeddings(spark, sf).createOrReplaceTempView("emb_ext_test2")
    val viaSql = spark.sql("""
      SELECT a.vec_id, cosine_sim(a.embedding, b.embedding) AS s
      FROM emb_ext_test2 a JOIN emb_ext_test2 b ON b.vec_id = a.vec_id + 1
      WHERE a.vec_id < 20
    """).collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    import org.apache.spark.sql.functions._
    val emb = Tables.embeddings(spark, sf)
    val a = emb.select(col("vec_id"), col("embedding").as("ea"))
    val b = emb.select((col("vec_id") - 1).as("vec_id"), col("embedding").as("eb"))
    val viaApi = a.join(b, "vec_id").filter(col("vec_id") < 20)
      .select(col("vec_id"),
        graft.operators.Similarity.cosine(col("ea"), col("eb")).as("s"))
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(viaSql === viaApi)
  }
}
