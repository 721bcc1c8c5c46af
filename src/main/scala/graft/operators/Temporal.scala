package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal (AS-OF / point-in-time) join — an operator the reference's
  * stack cannot express and Spark has no built-in for (SURVEY §2.4: the
  * reference's only join is stream-table-latest; ksqlDB enriches with the
  * dimension's CURRENT state, `/root/reference/ksqldb-statements.sql:50-60`,
  * `readme.md:432-455`).
  *
  * For training-data pipelines the as-of variant is the leakage-safe one:
  * each fact row is enriched with the dimension version that was in effect
  * AT THE FACT'S OWN TIMESTAMP, so features computed from the result never
  * see dimension states from the future — re-running the pipeline months
  * later reproduces the historical feature values bit-for-bit, where a
  * current-state join silently drifts.
  *
  * Implementation is the union + keyed-window form, not a range join:
  * facts and dimension versions are unioned on (key, ts, side-tag) and a
  * per-key window running `last(version, ignoreNulls)` ordered by
  * (ts, tag) carries each version forward to every later fact row.
  *
  * Scale shape: ONE hash shuffle on the key plus the window's sort —
  * identical cost to any keyed windowed aggregation, regardless of how
  * many versions precede each fact. The alternatives fail at 100 TB: a
  * `fact.ts >= dim.ts` range join explodes to (facts × versions-per-key)
  * intermediate rows before picking the max, and a broadcast of the
  * version history assumes the dimension changelog fits in memory. Skewed
  * keys concentrate in single window partitions like any keyed window —
  * the standard salting/AQE levers apply.
  *
  * Tie semantics: a version effective exactly at the fact's timestamp IS
  * visible (dim rows sort before fact rows at equal ts) — matching SQL
  * `ASOF JOIN ... ON f.ts >= d.ts` (the DuckDB oracle form). Facts with no
  * version at-or-before their ts get nulls (LEFT semantics). `dims` must
  * carry at most one version per (keys, dimTs) — dedupe upstream (e.g.
  * latest offset wins) or the winner among equal-ts versions is undefined.
  */
object Temporal {

  /** As-of LEFT join: every `facts` row plus the latest `dims` version
    * with `dimTs <= factTs` for the same `keys`. Dimension payload columns
    * (everything but keys + `dimTs`) are emitted prefixed with `prefix`;
    * the matched version's own timestamp is emitted as `prefix + dimTs`. */
  def asOfJoin(facts: DataFrame, dims: DataFrame, keys: Seq[String],
               factTs: String, dimTs: String,
               prefix: String = "asof_"): DataFrame = {
    val dimPayload = dims.columns.filterNot(c => keys.contains(c) || c == dimTs)
    val factPayload = facts.columns.filterNot(c => keys.contains(c) || c == factTs)
    val clash = factPayload.toSet
      .intersect(dimPayload.map(prefix + _).toSet + (prefix + dimTs))
    require(clash.isEmpty, s"fact columns collide with prefixed dim columns: $clash")

    // One struct per version row (non-null: dimTs is always present), so a
    // single ignore-nulls `last` carries the WHOLE version — including
    // tombstones whose payload fields are all null — never a stale mix of
    // fields from different versions.
    val dimStruct = struct((col(dimTs) +: dimPayload.toIndexedSeq.map(col)): _*)
    val dimStructType = org.apache.spark.sql.types.StructType(
      dims.schema(dimTs) +: dimPayload.toIndexedSeq.map(dims.schema(_)))

    // SQL join semantics for NULL keys: `f.key = d.key` never matches a
    // null — but a window PARTITION BY groups nulls together, which would
    // enrich null-key facts with null-key versions. Dropping null-key
    // version rows restores the contract: null-key facts share a partition
    // containing no versions and fall out as LEFT nulls (verified against
    // the DuckDB ASOF JOIN oracle's behavior).
    val dimSide = dims
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .select(
        keys.map(col) ++ Seq(col(dimTs).as("__t"), lit(0).as("__k"),
          dimStruct.as("__dim")) ++
          factPayload.toIndexedSeq.map(c =>
            lit(null).cast(facts.schema(c).dataType).as(c)): _*)
    val factSide = facts.select(
      keys.map(col) ++ Seq(col(factTs).as("__t"), lit(1).as("__k"),
        lit(null).cast(dimStructType).as("__dim")) ++
        factPayload.toIndexedSeq.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__k").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    factSide.unionByName(dimSide)
      .withColumn("__asof", last(col("__dim"), ignoreNulls = true).over(w))
      .filter(col("__k") === 1)
      .select(
        keys.map(col) ++ Seq(col("__t").as(factTs)) ++
          factPayload.toIndexedSeq.map(col) ++
          (col("__asof")(dimTs).as(prefix + dimTs) +:
            dimPayload.toIndexedSeq.map(c => col("__asof")(c).as(prefix + c))): _*)
  }

  /** Bucketized RANGE JOIN: every (fact, interval) pair with
    * `startCol <= factTs <= endCol` (inclusive both ends — SQL BETWEEN).
    *
    * Spark plans a raw `f.ts BETWEEN i.s AND i.e` join as a broadcast
    * nested loop — O(facts × intervals) comparisons, a non-starter when
    * both sides are large. Here the time axis is cut into `binWidth`-sized
    * bins: each fact lands in exactly ONE bin, each interval is exploded
    * to the bins it covers, and the join becomes a hash EQUI-join on the
    * bin id followed by the exact range filter. A fact belongs to one bin,
    * so each qualifying pair is produced exactly once — no dedup pass.
    *
    * Cost model: interval-side fanout is `ceil(span / binWidth) + 1` rows
    * per interval — pick `binWidth` near the median interval span so the
    * fanout is ~2 and the shuffle stays proportional to the inputs. Skewed
    * bins (a hot hour) are ordinary equi-join skew: AQE skew-split and the
    * salting levers apply. Axis values must be non-negative (epoch
    * millis). */
  def rangeJoin(facts: DataFrame, intervals: DataFrame, factTs: String,
                startCol: String, endCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val f = facts.withColumn("__bin",
      floor(col(factTs) / binWidth).cast("long"))
    val iv = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binWidth).cast("long"),
        floor(col(endCol) / binWidth).cast("long"))))
    f.join(iv, Seq("__bin"))
      .filter(col(factTs) >= col(startCol) && col(factTs) <= col(endCol))
      .drop("__bin")
  }
}
