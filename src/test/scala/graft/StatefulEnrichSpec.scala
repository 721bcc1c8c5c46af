package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StatefulEnrich
import graft.streaming.StatefulEnrich.{CustomerState, customerInput, ratingInput}
import graft.streaming.Streams

/** The readme.md:432-455 demonstration: a customer update is visible to
  * ratings that arrive after it, never to ones before it. */
class StatefulEnrichSpec extends GraftSuite {
  import spark.implicits._

  test("customer updates affect only future ratings (ksqlDB join timing)") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulEnrich.JoinInput]
    val q = Streams.toMemoryTable(
      StatefulEnrich.enrich(in.toDS()).toDF(), "stateful_enrich_test")

    // batch 1: rating before any customer info, then the customer arrives,
    // then another rating — all for key "42"
    in.addData(
      ratingInput("42", 1, 100, 4.0, "web", "first"),
      customerInput("42", 2, CustomerState("42", "Rica Blaisdell", "bronze")),
      ratingInput("42", 3, 101, 2.0, "web", "second"))
    q.processAllAvailable()
    // batch 2: status upgrade, then a rating
    in.addData(
      customerInput("42", 4, CustomerState("42", "Rica Blaisdell", "platinum")),
      ratingInput("42", 5, 102, 1.0, "web", "third"))
    q.processAllAvailable(); q.stop()

    val rows = spark.table("stateful_enrich_test")
      .orderBy("ratingId")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(5)), Option(r.getString(6))))
    assert(rows.toSeq === Seq(
      (100L, None, None),                               // before table row existed
      (101L, Some("Rica Blaisdell"), Some("bronze")),   // sees initial row
      (102L, Some("Rica Blaisdell"), Some("platinum")))) // sees the update
  }

  test("state is per-key: other keys never see the update") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StatefulEnrich.JoinInput]
    val q = Streams.toMemoryTable(
      StatefulEnrich.enrich(in.toDS()).toDF(), "stateful_enrich_keys_test")
    in.addData(
      customerInput("1", 1, CustomerState("1", "Alice", "gold")),
      ratingInput("2", 2, 200, 3.0, "app", "other-key"))
    q.processAllAvailable(); q.stop()
    val row = spark.table("stateful_enrich_keys_test").collect().head
    assert(row.getLong(0) === 200L && row.isNullAt(5))
  }
}
