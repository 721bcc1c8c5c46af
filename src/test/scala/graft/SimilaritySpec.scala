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

  test("SemDeDup canonical labels close the IVF pair graph exactly") {
    val labels = Similarity.semDedupCanonical(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // total: one label per vector, label is a member id ≤ the member
    assert(labels.size === emb.count())
    labels.foreach { case (v, c) => assert(c <= v, s"label above id: $v→$c") }
    // every near-dup pair lands in one cluster
    val pairs = Similarity.nearDupPairsIvf(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty, "fixture must produce semantic pairs")
    pairs.foreach { case (a, b) =>
      assert(labels(a) === labels(b), s"pair ($a,$b) split across clusters")
    }
    // vectors in no pair keep themselves
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    labels.filterNot(kv => paired(kv._1)).foreach { case (v, c) =>
      assert(c === v, s"untouched vector re-labeled: $v→$c")
    }
  }

  test("SQ8: codes bounded, integer scores, high recall against exact kNN") {
    // codes live in [-127, 127] and match the JVM floor reference
    val scale = emb.select(explode(col("embedding")).as("x"))
      .agg(max(abs(col("x").cast("double")))).head().getDouble(0)
    val one = emb.orderBy(col("vec_id")).limit(1)
    val raw = one.head().getSeq[Float](1)
    val codes = one.select(graft.functions.VectorExpressions
        .sq8Encode(col("embedding"), scale))
      .head().getSeq[Int](0)
    assert(codes === raw.map(v => math.floor(v * 127.0 / scale).toInt))
    assert(codes.forall(c => c >= -127 && c <= 127))
    val out = Similarity.annSq8(emb, k = 5, nQueries = 10).collect()
    val byQuery = out.groupBy(_.getLong(0))
    assert(byQuery.size === 10 && byQuery.values.forall(_.length == 5))
    assert(out.forall(r => r.getLong(0) != r.getLong(1)))
    // quantized ranking tracks the exact one: recall@5 well above chance
    // (SQ8 keeps ~7 bits/dim — far higher fidelity than 4-subspace PQ)
    val exact = Similarity.knnBruteForce(emb, k = 5, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = out.count(r => exact((r.getLong(0), r.getLong(1))))
    assert(hits >= 40, s"SQ8 recall@5 too low: $hits/50")
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

  test("PQ: seed vectors encode to themselves with zero ADC self-distance") {
    val codebooks = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val seeds = emb.filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding"),
        graft.functions.PqExpressions.pqEncode(col("embedding"), codebooks, 4)
          .as("codes"))
      .withColumn("self_adist", graft.functions.PqExpressions
        .pqAdcScore(col("embedding"), col("codes"), codebooks, 4))
      .collect()
    seeds.foreach { r =>
      val id = r.getLong(0).toInt
      assert(r.getSeq[Int](2) === Seq(id, id, id, id),
        s"seed $id should quantize to its own centroid in every subspace")
      assert(r.getDouble(3) === 0.0)
    }
  }

  test("PQ top-k carries real signal: closer in ADC means closer in exact L2") {
    import spark.implicits._
    def l2(a: Seq[Float], b: Seq[Float]): Double =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val top = Similarity.annPq(emb, k = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val pqMean = top.map { case (q, n) => l2(vecs(q), vecs(n)) }.sum / top.length
    val queries = top.map(_._1).distinct
    val allMean = {
      val ds = for (q <- queries; (n, v) <- vecs if n != q)
        yield l2(vecs(q), v)
      ds.sum / ds.size
    }
    assert(pqMean < allMean * 0.8,
      s"PQ top-3 mean exact L2 $pqMean should beat the corpus mean $allMean")
  }

  test("trained PQ codebooks never worsen quantization distortion") {
    def distortion(cb: Array[Array[Double]]): Double =
      emb.select(
        graft.functions.PqExpressions.pqAdcScore(col("embedding"),
          graft.functions.PqExpressions.pqEncode(col("embedding"), cb, 4),
          cb, 4).as("d"))
        .agg(avg(col("d"))).collect()(0).getDouble(0)
    val seed = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val trained = Similarity.trainPqCodebooks(emb, m = 4, nCodes = 16)
    // Lloyd's on the same metric starts FROM the seed: mean self-ADC
    // (the k-means objective) must not increase, and on real data drops
    val ds = distortion(seed); val dt = distortion(trained)
    assert(dt <= ds * 1.0001, s"trained $dt vs seed $ds")
    assert(dt < ds * 0.9, s"expected a real distortion drop, got $dt vs $ds")
    // IVF-PQ returns k rows per query like the flat form
    val ivfpq = Similarity.annIvfPq(emb)
    assert(ivfpq.groupBy("query_id").count().collect().forall(_.getLong(1) <= 3))
  }

  test("clusterStats accounts for every vector; seed vectors score 1 with their centroid") {
    val stats = Similarity.clusterStats(emb, nlist = 16).collect()
    assert(stats.map(_.getLong(1)).sum === emb.count())
    // every seed vector IS its cell's centroid, so its cell's max cosine
    // is 1 (within rounding); affinity stats are valid cosines
    stats.foreach { r =>
      val (mean, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4))
      assert(mn <= mean && mean <= mx)
      assert(mx <= 1.000001)
    }
    assert(stats.exists(_.getDouble(4) >= 0.999999))
  }

  test("balanced training bisects into an EMPTY cell even on a tiny " +
      "corpus where no cell holds over 4x another (r16 verdict #3: the " +
      "code's single 4x condition silently exempted empty cells; the " +
      "scaladoc's empty-cell disjunct is now the behavior)") {
    import spark.implicits._
    // two tight 2-member clusters along e1 and e2; both seed centroids
    // point into the e1 cluster's half-space, so every member lands in
    // cell 0 and cell 1 starts EMPTY with counts (4, 0) — under the old
    // condition (fullest > 4*max(emptiest,1) = 4) nothing ever fired
    val dim = 8
    def v(hot: Int, eps: Double): Array[Float] = {
      val a = Array.fill(dim)(eps.toFloat)
      a(hot) = 1.0f
      a
    }
    val emb = Seq(
      (0L, v(0, 0.01).toSeq), (1L, v(0, 0.02).toSeq),
      (2L, v(1, 0.01).toSeq), (3L, v(1, 0.02).toSeq))
      .toDF("vec_id", "embedding")
    val seed = Array(
      Array.tabulate(dim)(i => if (i == 0) 0.9 else 0.1),
      Array.tabulate(dim)(i => if (i == 0) 0.8 else 0.05))
    val cents = Similarity.trainCentroidsBalanced(emb, seed, iters = 3)
    val counts = emb.withColumn("cell",
        graft.functions.VectorExpressions.argMaxDot(
          col("embedding"), cents))
      .groupBy("cell").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(counts.getOrElse(0, 0L) > 0 && counts.getOrElse(1, 0L) > 0,
      s"the empty cell must be seeded by a bisection of the fullest: " +
        s"$counts")
  }

  test("k-means-trained centroids beat the placeholder on quantization quality") {
    // quality = mean cosine of each vector to its assigned centroid;
    // Lloyd's iterations must not make this worse than the first-16 seed
    // (it starts FROM that seed), and on real data it should improve it
    val placeholder = Similarity.ivfCells(emb, nlist = 16)
    val trained = Similarity.ivfCellsTrained(emb, nlist = 16, iters = 5)
    // score each vector against its own centroid via a rejoin on cell id
    def meanSelfSim(celled: org.apache.spark.sql.DataFrame,
                    cents: Array[Array[Double]]): Double = {
      import spark.implicits._
      val centDf = cents.zipWithIndex
        .map { case (c, i) => (i, c.toSeq) }.toSeq.toDF("cell", "centroid")
      celled.join(broadcast(centDf), "cell")
        .select(avg(Similarity.cosine(col("v"), col("centroid"))).as("q"))
        .first().getDouble(0)
    }
    val seedCents = emb.filter(col("vec_id") < 16).orderBy("vec_id")
      .select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val trainedCents = Similarity.trainCentroids(emb, nlist = 16, iters = 5)
    val qSeed = meanSelfSim(placeholder, seedCents)
    val qTrained = meanSelfSim(trained, trainedCents)
    assert(qTrained >= qSeed - 1e-9,
      s"training degraded quantization: $qTrained < $qSeed")
    // shape contract of the trained ANN query
    val ann = Similarity.annIvfTrained(emb)
    assert(ann.groupBy("query_id").count().collect().forall(_.getLong(1) <= 3))
    assert(ann.filter(col("query_id") === col("neighbor_id")).count() === 0)
  }

  test("IVF multi-probe: recall(nprobe=2) >= recall(nprobe=1), exact at nprobe=nlist") {
    // ground truth: exact brute-force top-3 per query
    val truth = Similarity.knnBruteForce(emb, k = 3, nQueries = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val got = df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      got.intersect(truth).size.toDouble / truth.size
    }
    val r1 = recall(Similarity.annIvf(emb, k = 3, nQueries = 10))
    val r2 = recall(Similarity.annIvfMultiProbe(emb, k = 3, nQueries = 10,
      nprobe = 2))
    assert(r2 >= r1, s"multi-probe recall $r2 < single-probe $r1")
    // probing every cell searches the whole corpus -> exact results
    val rAll = recall(Similarity.annIvfMultiProbe(emb, k = 3, nQueries = 10,
      nprobe = 16))
    assert(rAll === 1.0, s"nprobe=nlist recall $rAll != 1.0")
    // nprobe=1 equals single-probe IVF row-for-row (ArgTopPDot element 0
    // is ArgMaxDot)
    val p1 = Similarity.annIvfMultiProbe(emb, k = 3, nQueries = 10, nprobe = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val ivf1 = Similarity.annIvf(emb, k = 3, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(p1 === ivf1)
    // the production composition: trained centroids + multi-probe never
    // recalls worse than trained single-probe
    val t1 = recall(Similarity.annIvfTrained(emb, k = 3, nQueries = 10))
    val t2 = recall(Similarity.annIvfTrainedMultiProbe(emb, k = 3,
      nQueries = 10, nprobe = 2))
    assert(t2 >= t1, s"trained multi-probe recall $t2 < single-probe $t1")
  }

  test("multi-table LSH recall >= single-table, still a subset of exact") {
    val exact = Similarity.nearDupPairs(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Similarity.nearDupPairsLsh(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.nearDupPairsLshMulti(emb)
      .select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(multi.subsetOf(exact), "multi-table produced a non-near-dup pair")
    assert(single.subsetOf(multi),
      "table 0 of the multi index is the single index — its pairs must all appear")
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

  test("IVF (SemDeDup) near-dup pairs are a subset of exact, scored identically") {
    val exact = Similarity.nearDupPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.nearDupPairsIvf(emb).collect()
    assert(ivf.nonEmpty)
    ivf.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(exact.contains(key) &&
        math.abs(exact(key) - r.getDouble(2)) < 1e-9)
    }
  }

  test("annRecall: in [0,1] per query; exactly 1 when nlist=1 (no pruning)") {
    val r = Similarity.annRecall(emb).collect()
    assert(r.length === 10, "one recall row per sampled query")
    assert(r.forall(row => row.getDouble(1) >= 0.0 && row.getDouble(1) <= 1.0))
    // nlist=1 puts the whole corpus in one cell: IVF IS brute force, so
    // cell pruning can lose nothing and recall must be exactly 1
    val perfect = Similarity.annRecall(emb, nlist = 1).collect()
    assert(perfect.forall(_.getDouble(1) === 1.0),
      s"nlist=1 recall must be 1.0: ${perfect.mkString(",")}")
  }

  test("MMR: lambda=1 is plain top-k; low lambda diversifies across clusters") {
    import spark.implicits._
    // vec 0 = query; 1-5 cluster tightly around the query direction,
    // 6-8 form a second, less-relevant but distinct direction
    def v(x: Double, y: Double, z: Double) =
      Array(x.toFloat, y.toFloat, z.toFloat)
    val emb3 = Seq(
      0L -> v(1, 0, 0),
      1L -> v(1, 0.01, 0), 2L -> v(1, 0.02, 0), 3L -> v(1, 0.03, 0),
      4L -> v(1, 0.04, 0), 5L -> v(1, 0.05, 0),
      6L -> v(0.5, 0.86, 0), 7L -> v(0.5, 0.87, 0), 8L -> v(0.5, 0.88, 0)
    ).toDF("vec_id", "embedding")
    val pure = Similarity.mmrRerank(emb3, k = 3, candidates = 8, lambda = 1.0)
      .collect().map(_.getLong(1)).toSeq
    assert(pure === Seq(1L, 2L, 3L),
      s"lambda=1 must reduce to relevance top-k, got $pure")
    val diverse = Similarity.mmrRerank(emb3, k = 3, candidates = 8,
        lambda = 0.3).collect().map(_.getLong(1)).toSet
    assert(diverse.exists(_ >= 6L),
      s"low lambda must pull in the second cluster, got $diverse")
    assert(diverse.exists(_ <= 5L), "the top hit still leads the selection")
    // scores are non-increasing in rank on the real corpus... not required
    // by MMR (penalties shift per step); instead lock determinism:
    val a = Similarity.mmrRerank(emb, k = 5).collect().map(_.getLong(1)).toSeq
    val b = Similarity.mmrRerank(emb, k = 5).collect().map(_.getLong(1)).toSeq
    assert(a === b && a.distinct.size === 5)
  }

  test("filtered kNN: every result shares the query's label; pre-filter is complete") {
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val labelN = labels.values.groupBy(identity).view.mapValues(_.size).toMap
    val pre = Similarity.knnFiltered(emb, k = 5, nQueries = 10).collect()
    assert(pre.forall(r => labels(r.getLong(1)) == labels(r.getLong(0))),
      "pre-filter must only return same-label neighbors")
    // completeness: each query gets min(k, same-label corpus size - 1)
    val byQ = pre.groupBy(_.getLong(0)).view.mapValues(_.length).toMap
    (0L until 10L).foreach { q =>
      val expect = math.min(5, labelN(labels(q)) - 1)
      assert(byQ.getOrElse(q, 0) == expect,
        s"query $q: got ${byQ.getOrElse(q, 0)}, want $expect")
    }
  }

  test("post-filter returns a same-scored subset with the documented deficit") {
    val labels = emb.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val pre = Similarity.knnFiltered(emb, k = 5, nQueries = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val post = Similarity.knnPostFilter(emb, k = 5, nQueries = 10).collect()
    assert(post.forall(r => labels(r.getLong(1)) == labels(r.getLong(0))))
    // every post-filter hit is a pre-filter hit with the identical score
    // (post-filter can only LOSE results, never find different ones)
    assert(post.forall(r => pre.get((r.getLong(0), r.getLong(1)))
      .contains(r.getDouble(2))),
      "post-filter results must be a subset of pre-filter, same scores")
    assert(post.length < pre.size,
      "on the label-diverse fixture the overfetch deficit must be visible")
  }

  test("filtered IVF results are a subset of filtered exact, scored identically") {
    val exact = Similarity.knnFiltered(emb, k = 1000000, nQueries = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.annIvfFiltered(emb, k = 3, nQueries = 10).collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => exact.get((r.getLong(0), r.getLong(1)))
      .contains(r.getDouble(2))))
  }

  test("retrieval eval: metrics in [0,1]; mrr consistent with first_rel_rank") {
    val rows = Similarity.retrievalEval(emb, k = 10, nQueries = 10).collect()
    assert(rows.length == 10)
    rows.foreach { r =>
      val (fr, mrr, ndcg) = (r.getInt(1), r.getDouble(2), r.getDouble(3))
      assert(mrr >= 0.0 && mrr <= 1.0 && ndcg >= 0.0 && ndcg <= 1.0)
      if (fr == 0) assert(mrr == 0.0)
      else assert(math.abs(mrr - 1.0 / fr) < 1e-6)
    }
    // a query whose top hits are all same-label must score ndcg near 1:
    // guaranteed to exist? not on every fixture — instead lock monotonicity:
    // ndcg is 0 exactly when no relevant result appears in the top k
    rows.foreach { r =>
      if (r.getInt(1) == 0) assert(r.getDouble(3) == 0.0,
        "no relevant hit in top-k must mean ndcg 0")
    }
  }
}
