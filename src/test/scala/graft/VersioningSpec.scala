package graft

import org.apache.spark.sql.functions._

import graft.operators.{TextAnalysis, Versioning}
import graft.sources.Tables

class VersioningSpec extends GraftSuite {

  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf)

  test("corpusDiff labels added/removed/changed/unchanged exactly") {
    val oldSnap = Seq(
      (1L, "alpha"), (2L, "bravo"), (3L, "charlie")
    ).toDF("doc_id", "text")
    val newSnap = Seq(
      (2L, "bravo"), (3L, "charlie CHANGED"), (4L, "delta")
    ).toDF("doc_id", "text")
    val got = Versioning.corpusDiff(oldSnap, newSnap).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("diff of a snapshot against itself is all unchanged") {
    val statuses = Versioning.corpusDiff(docs, docs)
      .select("status").distinct().as[String].collect().toSet
    assert(statuses === Set("unchanged"))
    assert(Versioning.corpusDiff(docs, docs).count() === docs.count())
  }

  test("diffSummary counts reconcile with the per-doc diff") {
    val oldSnap = docs.filter(col("doc_id") % 3 =!= 0)
    val newSnap = docs.filter(col("doc_id") % 5 =!= 0)
    val summary = Versioning.diffSummary(oldSnap, newSnap).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(summary.values.sum ===
      Versioning.corpusDiff(oldSnap, newSnap).count())
    // %3==0 docs not divisible by 5 exist only in new; %5==0 not by 3 only
    // in old; text is untouched so nothing is 'changed'
    assert(summary("added") > 0 && summary("removed") > 0)
    assert(!summary.contains("changed"))
  }

  test("qualityCutoff keeps exactly the docs at/above the p75 quality value") {
    val scored = TextAnalysis.qualityScore(docs)
      .select(col("doc_id"), col("quality_score")).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val cutoffKept = TextAnalysis.qualityCutoff(docs, 0.75).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(cutoffKept.nonEmpty)
    val minKept = cutoffKept.values.min
    // kept = every doc at/above the smallest kept score (value cutoff, so
    // ties are all-in); roughly the top quartile
    assert(scored.filter(_._2 >= minKept).keySet === cutoffKept.keySet)
    val frac = cutoffKept.size.toDouble / scored.size
    assert(frac >= 0.2 && frac <= 0.35, s"kept fraction $frac")
  }

  test("approx quality cutoff lands near the exact one") {
    val exact = TextAnalysis.qualityCutoff(docs, 0.75).count().toDouble
    val approx = TextAnalysis.qualityCutoffApprox(docs, 0.75).count().toDouble
    assert(math.abs(approx - exact) / exact < 0.1,
      s"approx kept $approx vs exact $exact")
  }

  test("temperature sampling: largest language keeps base rate, rarer keep more") {
    val out = TextAnalysis.sampleTemperature(docs, alpha = 0.5,
      basePermille = 200)
    val rates = out.select("lang_guess", "keep_permille").distinct().collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rates.nonEmpty)
    val langCounts = TextAnalysis.langId(docs)
      .groupBy("lang_guess").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val biggest = langCounts.maxBy(_._2)._1
    assert(rates(biggest) === 200)
    assert(rates.values.forall(r => r >= 200 && r <= 1000))
    // flattening is monotone: smaller stratum -> keep-rate at least as high
    val bySize = langCounts.toSeq.sortBy(_._2).map(_._1)
    val ordered = bySize.map(rates)
    assert(ordered.zip(ordered.tail).forall { case (small, big) => small >= big })
    // deterministic: rerun yields the identical sample
    val a = out.select("doc_id").as[Long].collect().sorted.toSeq
    val b = TextAnalysis.sampleTemperature(docs).select("doc_id")
      .as[Long].collect().sorted.toSeq
    assert(a === b)
  }
}
