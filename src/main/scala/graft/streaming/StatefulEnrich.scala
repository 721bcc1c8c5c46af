package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful stream-table enrichment — SURVEY §2.4 J1 option (b), the
  * variant whose timing matches ksqlDB exactly.
  *
  * The stream-static join ([[Streams.enrichedStream]]) re-reads the
  * dimension snapshot once per microbatch; ksqlDB instead keeps the table
  * in state and joins each event against the state *as of that event's
  * arrival* (`readme.md:432-455`: an updated customer row affects only
  * future ratings). Here both inputs union into one keyed stream and
  * `flatMapGroupsWithState` holds the latest customer per key: a customer
  * update mutates state and emits nothing; a rating emits immediately,
  * enriched with the state at that moment — within-batch ordering by
  * `seq` reproduces the event-by-event timing.
  *
  * Scale notes: state = one customer row per key (same bound as ksqlDB's
  * RocksDB table); the union shuffles both streams once on the join key —
  * exactly ksqlDB's internal repartition topics (SURVEY §3 EP2 step 3).
  */
object StatefulEnrich {

  /** Latest-known customer attributes (the table side). */
  case class CustomerState(customerId: String, fullName: String,
                           clubStatus: String)

  /** Union row: exactly one of `rating`/`customer` is set; `seq` totals
    * orders events within a microbatch (offset analog). */
  case class JoinInput(key: String, seq: Long,
                       ratingId: Option[Long], stars: Option[Double],
                       channel: Option[String], message: Option[String],
                       customer: Option[CustomerState])

  case class EnrichedRating(ratingId: Long, stars: Double, channel: String,
                            message: String, customerId: String,
                            fullName: Option[String], clubStatus: Option[String])

  def ratingInput(key: String, seq: Long, ratingId: Long, stars: Double,
                  channel: String, message: String): JoinInput =
    JoinInput(key, seq, Some(ratingId), Some(stars), Some(channel),
      Some(message), None)

  def customerInput(key: String, seq: Long, c: CustomerState): JoinInput =
    JoinInput(key, seq, None, None, None, None, Some(c))

  /** LEFT join semantics: ratings with no known customer emit null
    * attributes (filter on `fullName.isDefined` for the reference's
    * `IS NOT NULL` inner-join form, J2). Use `outputMode("append")`. */
  def enrich(input: Dataset[JoinInput]): Dataset[EnrichedRating] = {
    import input.sparkSession.implicits._
    input
      .groupByKey(_.key)
      .flatMapGroupsWithState[CustomerState, EnrichedRating](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[JoinInput], state: GroupState[CustomerState]) =>
          val out = Vector.newBuilder[EnrichedRating]
          // event-at-a-time in arrival order: updates seen by later
          // ratings only — the ksqlDB visibility contract
          batch.toSeq.sortBy(_.seq).foreach { in =>
            in.customer.foreach(state.update)
            in.ratingId.foreach { rid =>
              val c = state.getOption
              out += EnrichedRating(rid, in.stars.get, in.channel.get,
                in.message.get, key, c.map(_.fullName), c.map(_.clubStatus))
            }
          }
          out.result().iterator
      }
  }
}
