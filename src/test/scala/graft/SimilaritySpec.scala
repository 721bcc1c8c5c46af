package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

class SimilaritySpec extends GraftSuite {

  private lazy val emb = Tables.embeddings(spark, sf)

  test("brute-force kNN: k neighbors per query, descending scores, no self") {
    val out = Similarity.knnBruteForce(emb, k = 5, nQueries = 10).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size === 10)
    assert(byQuery.values.forall(_.length == 5))
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    byQuery.values.foreach { rows =>
      val scores = rows.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("LSH ANN results are a subset of brute-force candidates scored identically") {
    val bf = Similarity.knnBruteForce(emb, k = Int.MaxValue - 1, nQueries = 10)
      .select("query_id", "neighbor_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ann = Similarity.annLsh(emb).collect()
    assert(ann.nonEmpty)
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bf.contains(key) && math.abs(bf(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("top-k aggregate kNN equals the window-sort kNN exactly") {
    val window = Similarity.knnBruteForce(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    val agg = Similarity.knnBruteForceAgg(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3))).toSet
    assert(agg === window)
  }

  test("IVF cells partition the corpus into at most nlist cells") {
    val cells = Similarity.ivfCells(emb, nlist = 16)
    assert(cells.count() === emb.count())
    val ids = cells.select("cell").distinct().collect().map(_.getInt(0))
    assert(ids.forall(c => c >= 0 && c < 16))
  }

  test("LSH near-dup pairs are a subset of exact near-dup pairs") {
    val exact = Similarity.nearDupPairs(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Similarity.nearDupPairsLsh(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact))
  }
}
