package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming TABLE semantics over a CDC changelog — the stateful twin of
  * [[graft.operators.Cdc.latestByKeyTable]] (A4, SURVEY §1.4).
  *
  * ksqlDB materializes `CREATE TABLE CUSTOMERS` by keeping the latest value
  * per key in RocksDB and emitting a changelog (`EMIT CHANGES` on a table =
  * update stream, readme.md:316-342). Here the state is Spark's streaming
  * state store, keyed by the CDC key: `flatMapGroupsWithState` in Update
  * mode emits one row per key per microbatch in which that key changed —
  * exactly the table-changelog contract, including DELETE tombstones
  * (`deleted=true`, SURVEY §7.4 hard-part 5).
  *
  * Scale notes: state is hash-partitioned by key across
  * `spark.sql.shuffle.partitions` state-store partitions (RocksDB provider
  * at production scale); each group holds ONE envelope — O(#live keys)
  * state, the same bound as a compacted Kafka topic. No timeout: a
  * dimension table's keys live forever, like ksqlDB's table state.
  */
object CdcStream {

  /** After-image of the synthetic CDC envelope ([[graft.operators.Cdc.envelope]]). */
  case class CdcImage(id: Long, user_id: Long, event_type: String,
                      value: Double, props: String)

  /** Debezium-shaped CDC record: `op` ∈ c/u/d, null `after` on delete. */
  case class CdcEvent(key: String, after: Option[CdcImage], op: String,
                      ts_ms: Long, offset: Long)

  /** One changelog emission: the new latest row for `key`, or a tombstone. */
  case class TableChange(key: String, deleted: Boolean, id: Option[Long],
                         user_id: Option[Long], event_type: Option[String],
                         value: Option[Double], props: Option[String],
                         ts_ms: Long)

  private def toChange(e: CdcEvent): TableChange =
    if (e.op == "d" || e.after.isEmpty)
      TableChange(e.key, deleted = true, None, None, None, None, None, e.ts_ms)
    else {
      val a = e.after.get
      TableChange(e.key, deleted = false, Some(a.id), Some(a.user_id),
        Some(a.event_type), Some(a.value), Some(a.props), e.ts_ms)
    }

  /** Latest-envelope-per-key with (ts_ms, offset) ordering; emits a
    * [[TableChange]] whenever a key's latest row changes. Use with
    * `outputMode("update")`. */
  def latestByKey(envelope: Dataset[CdcEvent]): Dataset[TableChange] = {
    import envelope.sparkSession.implicits._
    envelope
      .groupByKey(_.key)
      .flatMapGroupsWithState[CdcEvent, TableChange](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (_: String, batch: Iterator[CdcEvent], state: GroupState[CdcEvent]) =>
          val incoming = batch.maxByOption(e => (e.ts_ms, e.offset))
          val winner = (state.getOption ++ incoming)
            .maxByOption(e => (e.ts_ms, e.offset))
          winner match {
            case Some(w) if !state.getOption.contains(w) =>
              state.update(w)
              Iterator.single(toChange(w))
            case _ => Iterator.empty
          }
      }
  }

  /** Typed view of the synthetic CDC envelope DataFrame
    * ([[graft.operators.Cdc.envelope]] output schema). */
  def asCdcEvents(envelope: DataFrame): Dataset[CdcEvent] = {
    import envelope.sparkSession.implicits._
    envelope.as[CdcEvent]
  }
}
