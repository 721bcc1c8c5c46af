package graft.streaming

import org.apache.spark.sql.{Dataset, Encoder}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING as-of enrichment — the continuous twin of
  * [[graft.operators.Temporal.asOfJoin]]: facts are enriched with the
  * dimension version in effect AT THE FACT'S OWN EVENT TIME, as both
  * streams arrive. The reference's stream-table join enriches with the
  * dimension's CURRENT state (`/root/reference/ksqldb-statements.sql:50-60`
  * — whatever version the table holds when the event is processed); the
  * as-of variant pins enrichment to event time, so replaying the stream
  * reproduces identical results regardless of processing timing — the
  * leakage-safe semantics a training pipeline needs.
  *
  * Shape: both streams are tagged and unioned, then grouped by the join
  * key into `flatMapGroupsWithState`. The state per key is the version
  * history — a ts-sorted buffer of dimension versions, bounded by
  * `retainMs` (see below). Each microbatch, a group's rows are processed
  * in (ts, dim-before-fact) order: versions insert into the history, facts
  * look up the latest version at-or-before their timestamp. Tie semantics
  * match the batch operator and SQL `ASOF JOIN ... ON f.ts >= d.ts`: a
  * version effective exactly at the fact's ts IS visible.
  *
  * Ordering contract: WITHIN a microbatch, arrival order never matters (rows
  * are sorted by event time before processing). ACROSS microbatches, a fact
  * is enriched with the versions that have arrived by its batch — a version
  * arriving in a later batch cannot retro-enrich an already-emitted fact
  * (same emit-once contract as any append-mode stateful operator; a
  * pipeline needing cross-batch reordering tolerance buffers facts behind a
  * watermark upstream).
  *
  * Scale shape: state is partitioned by key across
  * `spark.sql.shuffle.partitions` state-store partitions — ONE shuffle of
  * each stream on the key, the same exchange the batch union+window form
  * pays. Per-key state is O(versions within the retention horizon), not
  * O(facts): facts pass through and are never buffered. `retainMs` bounds
  * the history: versions older than `newest-version-ts − retainMs` are
  * dropped EXCEPT the latest one at-or-before the horizon — still needed
  * by facts with timestamps inside the horizon (facts older than that are
  * late beyond retention and see the oldest retained version — the
  * standard watermark-lateness trade).
  *
  * SQL null-key semantics (matching the batch operator and the DuckDB ASOF
  * oracle): null-key dimension versions are dropped; null-key facts emit
  * unenriched (LEFT-join nulls).
  */
object AsOfStream {

  /** Union element: one row of either stream, tagged. `isDim` sorts
    * versions before facts at equal ts. */
  final case class Tagged[K, F, D](key: K, ts: Long, isDim: Boolean,
                                   fact: Option[F], dim: Option[D])

  /** Per-key state: version history sorted by ts ascending. */
  final case class VersionState[D](versions: Seq[(Long, D)])

  /** Drop versions older than `maxVersionTs - retainMs`, keeping the
    * single latest at-or-before the horizon (facts inside the horizon
    * still resolve to it). `versions` must be ts-sorted ascending. */
  private[graft] def trim[D](versions: Vector[(Long, D)],
                                 retainMs: Long): Vector[(Long, D)] =
    if (versions.isEmpty || retainMs == Long.MaxValue) versions
    else {
      val horizon = versions.last._1 - retainMs
      val idx = versions.lastIndexWhere(_._1 <= horizon)
      if (idx <= 0) versions else versions.drop(idx)
    }

  /** Start-to-end as-of enrichment of two typed streams. Returns
    * `(fact, Some(version))` for facts with a version at-or-before their
    * ts, `(fact, None)` otherwise — LEFT semantics, one output row per
    * fact. Timestamps are epoch millis (or any monotone long axis, same
    * units both sides). */
  def asOfJoinStream[K, F, D](
      facts: Dataset[F], dims: Dataset[D],
      factKey: F => K, dimKey: D => K,
      factTs: F => Long, dimTs: D => Long,
      retainMs: Long = Long.MaxValue)(
      implicit kEnc: Encoder[K],
      taggedEnc: Encoder[Tagged[K, F, D]],
      stateEnc: Encoder[VersionState[D]],
      outEnc: Encoder[(F, Option[D])]): Dataset[(F, Option[D])] = {
    val tagged =
      facts.map(f => Tagged[K, F, D](factKey(f), factTs(f), isDim = false,
          Some(f), None))
        .union(dims
          // SQL join semantics: a null key never matches — null-key
          // versions must not enrich the null-key facts they'd share a
          // group with
          .filter((d: D) => dimKey(d) != null)
          .map(d => Tagged[K, F, D](dimKey(d), dimTs(d), isDim = true,
            None, Some(d))))
    tagged
      .groupByKey(_.key)
      .flatMapGroupsWithState[VersionState[D], (F, Option[D])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (key: K, rows: Iterator[Tagged[K, F, D]],
         state: GroupState[VersionState[D]]) =>
          // event-time order, versions before facts at equal ts — arrival
          // order within the batch is irrelevant by construction
          val batch = rows.toVector.sortBy(t => (t.ts, if (t.isDim) 0 else 1))
          var versions =
            state.getOption.map(_.versions.toVector).getOrElse(Vector.empty)
          val out = Vector.newBuilder[(F, Option[D])]
          batch.foreach { t =>
            if (t.isDim) {
              // insert keeping ts order (versions usually arrive in order:
              // append is the common path)
              val v = (t.ts, t.dim.get)
              val at = versions.lastIndexWhere(_._1 <= t.ts) + 1
              versions =
                if (at == versions.length) versions :+ v
                else (versions.take(at) :+ v) ++ versions.drop(at)
            } else if (key == null) {
              out += ((t.fact.get, None)) // LEFT nulls for null-key facts
            } else {
              val at = versions.lastIndexWhere(_._1 <= t.ts)
              out += ((t.fact.get, if (at < 0) None else Some(versions(at)._2)))
            }
          }
          versions = trim(versions, retainMs)
          if (versions.nonEmpty) state.update(VersionState(versions))
          out.result().iterator
      }
  }
}
