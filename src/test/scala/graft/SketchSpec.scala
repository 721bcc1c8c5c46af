package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

/** Sanity bounds for the sketch-based 100 TB paths (driver-side these are
  * rows-only checks — sketch output is engine-specific — so the accuracy
  * contract is asserted here against the exact twins at sf0.01). */
class SketchSpec extends GraftSuite {

  private val sf001 = "/root/testdata/sf0.01"

  test("approx_count_distinct is within its rsd bound of exact (5 sigma)") {
    val events = Tables.events(spark, sf001)
    val exact = events.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("exact_users"))
    val approx = events.groupBy("event_type")
      .agg(approx_count_distinct(col("user_id"), 0.01).as("approx_users"))
    val rows = exact.join(approx, "event_type").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val e = r.getAs[Long]("exact_users").toDouble
      val a = r.getAs[Long]("approx_users").toDouble
      val relErr = math.abs(a - e) / e
      // rsd 0.01 → 5 standard deviations of slack
      assert(relErr <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e (relErr $relErr)")
    }
  }

  test("percentile_approx median satisfies the rank-space median property") {
    // percentile_approx returns an actual bucket ELEMENT at (approximately)
    // the median rank — for tiny buckets that element can sit far from the
    // interpolated exact median in VALUE space, so the correct contract is
    // in RANK space: at most n/2 (+1 slack for the sketch's <1-rank error
    // at accuracy 10000) elements strictly below it, same above it.
    val events = Tables.events(spark, sf001)
    val approx = Relational.medianOverTimeApprox(events, "1 hour")
    val ranked = events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(collect_list(col("value")).as("vals"))
      .select(col("window.start").as("bucket_start"), col("event_type"),
        col("vals"))
      .join(approx, Seq("bucket_start", "event_type"))
      .select(col("bucket_start"), col("event_type"),
        size(col("vals")).as("n"),
        size(filter(col("vals"), v => v < col("median_value"))).as("below"),
        size(filter(col("vals"), v => v > col("median_value"))).as("above"))
      .collect()
    assert(ranked.nonEmpty)
    ranked.foreach { r =>
      val n = r.getAs[Int]("n").toDouble
      val below = r.getAs[Int]("below"); val above = r.getAs[Int]("above")
      assert(below <= n / 2 + 1 && above <= n / 2 + 1,
        s"approx median splits bucket $below/$above of $n for " +
          s"${r.getAs[Any]("bucket_start")}/${r.getString(1)}")
    }
  }
}
