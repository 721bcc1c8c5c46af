package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming conversion funnel — the continuous counterpart of
  * [[graft.operators.Relational.funnel]], with the SEQUENCE-MATCH
  * semantics a live funnel dashboard uses: a user advances to stage i+1
  * when an event of that stage type arrives at-or-after their stage-i
  * advance (events are folded in offset order, so an out-of-order
  * purchase before any signup does not advance anything — but a LATER
  * purchase does, unlike the batch operator's strict first-occurrence
  * rule; both definitions are standard, and the scaladoc difference is
  * the contract).
  *
  * Emits one append row per (user, stage) ADVANCE — the dashboard counts
  * `stage_idx` to draw the live funnel. State per user is a single Int
  * (stages completed), the smallest possible funnel state; the only
  * shuffle is the user_id hash partition. Advances survive microbatch
  * boundaries: stage 0 in batch 1 and stage 1 in batch 2 emit in their
  * own batches. */
object FunnelStream {

  case class FunnelEvent(userId: Long, seq: Long, eventType: String)
  case class StageAdvance(userId: Long, stageIdx: Int, stage: String)

  /** Input: any frame with (user_id, event_id, event_type); `event_id` is
    * the within-stream order (offset analog). Use `outputMode("append")`. */
  def funnelStream(events: DataFrame,
                   stages: Seq[String]): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    events
      .select(col("user_id").as("userId"), col("event_id").as("seq"),
        col("event_type").as("eventType"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Int, StageAdvance](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[Int]) =>
          var reached = state.getOption.getOrElse(0)
          val out = Vector.newBuilder[StageAdvance]
          batch.toSeq.sortBy(_.seq).foreach { e =>
            if (reached < stages.length && e.eventType == stages(reached)) {
              out += StageAdvance(uid, reached, stages(reached))
              reached += 1
            }
          }
          state.update(reached)
          out.result().iterator
      }
  }
}
