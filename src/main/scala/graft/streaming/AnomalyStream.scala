package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery}

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
  * bounded by the type cardinality, not the stream. The only shuffle is
  * the groupByKey hash partition on event_type, which is ALSO the
  * parallelism ceiling of [[zScoreStream]]: with a handful of types,
  * ≤ n_types tasks do all the work. [[zScoreStreamSalted]] removes that
  * ceiling — state is keyed by (event_type, salt), the per-salt partial
  * moments are merged with Chan's parallel combine each batch, and events
  * are scored against the MERGED (global) prior, so its flags match the
  * unsalted operator while the fold runs k-wide per type. */
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
          // Sort by eventId before folding: the iterator's raw order is
          // partition-association order, so an unsorted fold would make
          // the post-batch moments (and every LATER batch's z-scores)
          // depend on the source's partitioning — the same determinism
          // contract FunnelStream's seq-sort provides.
          val rows = batch.toVector.sortBy(_.eventId)
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

  /** SALTED z-score stream — the 100×-scale form of [[zScoreStream]],
    * implementing the parallelism fix the unsalted scaladoc prescribes.
    *
    * Per microbatch (inside `foreachBatch`, so the steps are serialized by
    * the streaming engine):
    *   1. the prior state — (event_type, salt, n, mean, m2), ≤ k rows per
    *      type — is read from `stateDir` and the per-salt partials are
    *      merged per type with the parallel (Chan) moment combine:
    *      `N = Σnᵢ`, `mean = Σnᵢmeanᵢ/N`, `M2 = Σm2ᵢ + Σnᵢmeanᵢ² − N·mean²`;
    *   2. every batch event is scored against the MERGED pre-batch moments
    *      of its type (broadcast join on the tiny per-type moment table —
    *      identical semantics to the unsalted operator, so flags agree),
    *      and appended to `scoredDir`;
    *   3. the batch's delta moments are computed per (event_type, salt)
    *      with `salt = hash(event_id) % k` — a DISTRIBUTED aggregate, k
    *      tasks per type instead of one — and folded into the state with
    *      the pairwise Chan combine via a crash-safe store rewrite
    *      ([[Streams.rewriteStore]] swap).
    *
    * State stays tiny (k × n_types rows of three doubles) while the
    * per-event work — scoring and the batch fold — runs at full cluster
    * parallelism: nothing is ever serialized through one task per type.
    * Scoring differs from the sequential Welford fold only in float
    * association order (< 1 ulp at fixture scale); StreamingSpec locks
    * flag-for-flag agreement with [[zScoreStream]]. */
  def zScoreStreamSalted(events: DataFrame, stateDir: String,
                         scoredDir: String, checkpoint: String, k: Int = 8,
                         threshold: Double = 3.0,
                         minCount: Long = 2L): StreamingQuery = {
    require(k >= 1, "salt fan-out k must be >= 1")
    events.writeStream
      .outputMode(OutputMode.Append())
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        val b = batch.select(col("event_id"), col("event_type"), col("value"))
          .localCheckpoint(false) // scored once, folded once — cut recompute
        val fs = new org.apache.hadoop.fs.Path(stateDir)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        Streams.recoverCompaction(fs, stateDir)
        val hasState = fs.exists(new org.apache.hadoop.fs.Path(stateDir))
        // (1) merged pre-batch moments per type — ≤ k×n_types input rows
        val merged =
          if (hasState)
            spark.read.parquet(stateDir)
              .groupBy(col("event_type"))
              .agg(sum(col("n")).as("pn"),
                (sum(col("n") * col("mean")) / sum(col("n"))).as("pmean"),
                (sum(col("m2")) + sum(col("n") * col("mean") * col("mean")))
                  .as("psq"))
              .withColumn("pm2",
                col("psq") - col("pn") * col("pmean") * col("pmean"))
              .drop("psq")
          else spark.range(0).select(lit("").as("event_type"),
            lit(0L).as("pn"), lit(0.0).as("pmean"), lit(0.0).as("pm2"))
        // (2) score against the merged prior — moment table is bounded by
        // type cardinality, so the broadcast is safe at any data scale
        val std = sqrt(col("pm2") / (col("pn") - 1))
        b.join(broadcast(merged), Seq("event_type"), "left")
          .withColumn("z",
            when(col("pn") >= minCount && std > 0.0,
              (col("value") - col("pmean")) / std))
          .withColumn("is_outlier",
            coalesce(abs(col("z")) > threshold, lit(false)))
          .select(col("event_id"), col("event_type"), col("value"),
            col("z"), col("is_outlier"))
          .write.mode("append").parquet(scoredDir)
        // (3) batch delta per (type, salt), then Chan-fold into the state
        val delta = b
          .withColumn("salt", pmod(xxhash64(col("event_id")), lit(k.toLong)))
          .groupBy(col("event_type"), col("salt"))
          .agg(count(lit(1)).as("dn"), avg(col("value")).as("dmean"),
            (var_pop(col("value")) * count(lit(1))).as("dm2"))
        def chanCombine(prior: DataFrame): DataFrame = {
          val nA = coalesce(col("n"), lit(0L))
          val mA = coalesce(col("mean"), lit(0.0))
          val m2A = coalesce(col("m2"), lit(0.0))
          val nB = coalesce(col("dn"), lit(0L))
          val mB = coalesce(col("dmean"), lit(0.0))
          val m2B = coalesce(col("dm2"), lit(0.0))
          val nAB = nA + nB
          val d = mB - mA
          prior.join(delta, Seq("event_type", "salt"), "full_outer")
            .select(col("event_type"), col("salt"),
              nAB.as("n"),
              (mA + d * nB / nAB).as("mean"),
              (m2A + m2B + d * d * nA * nB / nAB).as("m2"))
        }
        if (hasState) Streams.rewriteStore(spark, stateDir)(chanCombine)
        else delta.select(col("event_type"), col("salt"),
          col("dn").as("n"), col("dmean").as("mean"), col("dm2").as("m2"))
          .write.parquet(stateDir)
      }
      .start()
  }
}
