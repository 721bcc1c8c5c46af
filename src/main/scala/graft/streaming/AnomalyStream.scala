package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly alerts — the continuous twin of
  * [[graft.operators.Relational.valueZScores]]: per-type running moments
  * (Welford's online algorithm — numerically stable, one pass) held in
  * `flatMapGroupsWithState`, each event flagged against the moments AS OF
  * THE START OF ITS MICROBATCH. That boundary makes the output
  * deterministic per batch sequence (a batch's own rows cannot shift each
  * other's scores mid-batch) and matches how a production monitor
  * evaluates: against the model it had when the data arrived. The first
  * events of a type (fewer than `minCount` priors) emit unflagged with
  * null z — no model yet, no alert.
  *
  * Scale shape: state is THREE doubles per event type (count, mean, M2) —
  * bounded by the type cardinality, not the stream; the only shuffle is
  * the groupByKey hash partition on event_type (salt the key by
  * `user_id % k` and merge moments downstream if one type dominates). */
object AnomalyStream {

  case class Moments(n: Long, mean: Double, m2: Double) {
    def add(x: Double): Moments = {
      val n1 = n + 1
      val d = x - mean
      val mean1 = mean + d / n1
      Moments(n1, mean1, m2 + d * (x - mean1))
    }
    def std: Double = math.sqrt(m2 / (n - 1))
  }

  case class ValueEvent(eventId: Long, eventType: String, value: Double)

  case class Scored(eventId: Long, eventType: String, value: Double,
                    z: Option[Double], isOutlier: Boolean)

  /** Input: any frame with (event_id, event_type, value). Output: one row
    * per event with its z against pre-batch moments. `outputMode` must be
    * Append. */
  def zScoreStream(events: DataFrame, threshold: Double = 3.0,
                   minCount: Long = 2L): Dataset[Scored] = {
    import events.sparkSession.implicits._
    events
      .select(col("event_id").as("eventId"),
        col("event_type").as("eventType"), col("value"))
      .as[ValueEvent]
      .groupByKey(_.eventType)
      .flatMapGroupsWithState[Moments, Scored](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, batch: Iterator[ValueEvent], state: GroupState[Moments]) =>
          val prior = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val rows = batch.toVector
          val out = rows.map { e =>
            if (prior.n >= minCount && prior.std > 0.0) {
              val z = (e.value - prior.mean) / prior.std
              Scored(e.eventId, key, e.value, Some(z),
                math.abs(z) > threshold)
            } else Scored(e.eventId, key, e.value, None, isOutlier = false)
          }
          state.update(rows.foldLeft(prior)((m, e) => m.add(e.value)))
          out.iterator
      }
  }
}
