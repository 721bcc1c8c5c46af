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
  * own batches.
  *
  * State retention: without a bound, one Int per ALL-TIME distinct user
  * accumulates forever — tiny per user but unbounded at crawl scale.
  * `inactivityTimeout` (e.g. `"30 days"`) arms a processing-time timeout
  * per user, re-armed on every event; a user idle past the horizon has
  * their state EVICTED, so the store is O(users-active-in-horizon). The
  * semantic consequence is the standard session-funnel contract: a user
  * returning after the horizon starts the funnel from stage 0 (their
  * earlier advances remain in the sink — funnels are append-only — but
  * re-qualification re-emits stages). `None` keeps all-time semantics.
  *
  * Operational note: once ProcessingTimeTimeout is configured, Spark's
  * microbatch engine constructs batches continuously (timeouts can change
  * state without data — `FlatMapGroupsWithStateExec.shouldRunAnotherBatch`
  * is unconditionally true), so run the query with a real processing-time
  * trigger (idle batches then cost one no-data pass per interval) and
  * synchronize tests by polling the sink — `processAllAvailable` never
  * returns under this timeout mode because `noNewData` is never set. */
object FunnelStream {

  case class FunnelEvent(userId: Long, seq: Long, eventType: String)
  case class StageAdvance(userId: Long, stageIdx: Int, stage: String)

  /** Input: any frame with (user_id, event_id, event_type); `event_id` is
    * the within-stream order (offset analog). Use `outputMode("append")`. */
  def funnelStream(events: DataFrame, stages: Seq[String],
                   inactivityTimeout: Option[String] = None): Dataset[StageAdvance] = {
    import events.sparkSession.implicits._
    val timeoutConf =
      if (inactivityTimeout.isDefined) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .select(col("user_id").as("userId"), col("event_id").as("seq"),
        col("event_type").as("eventType"))
      .as[FunnelEvent]
      .groupByKey(_.userId)
      .flatMapGroupsWithState[Int, StageAdvance](
        OutputMode.Append(), timeoutConf) {
        (uid: Long, batch: Iterator[FunnelEvent], state: GroupState[Int]) =>
          if (state.hasTimedOut) {
            // horizon passed with no events: evict — the user's next event
            // (in a later batch) restarts the funnel from stage 0
            state.remove()
            Iterator.empty
          } else {
            var reached = state.getOption.getOrElse(0)
            val out = Vector.newBuilder[StageAdvance]
            batch.toSeq.sortBy(_.seq).foreach { e =>
              if (reached < stages.length && e.eventType == stages(reached)) {
                out += StageAdvance(uid, reached, stages(reached))
                reached += 1
              }
            }
            state.update(reached)
            inactivityTimeout.foreach(state.setTimeoutDuration)
            out.result().iterator
          }
      }
  }
}
