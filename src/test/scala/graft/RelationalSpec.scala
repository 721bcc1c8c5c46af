package graft

import org.apache.spark.sql.functions._

import graft.operators.Relational
import graft.sources.Tables

class RelationalSpec extends GraftSuite {

  test("entry (flagship enrichment) returns rows with expected schema") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.toSet === Set("rating_id", "message", "stars", "channel",
      "customer_id", "full_name", "club_status"))
    assert(df.count() > 0)
  }

  test("hopping windows: every event lands in exactly size/slide windows") {
    val ev = Tables.events(spark, sf)
    val hop = Relational.hoppingCountsByType(ev, sizeSec = 900, slideSec = 300)
    // counts across overlapping windows triple-count each event
    val total = hop.agg(sum(col("events_count"))).collect()(0).getLong(0)
    assert(total === ev.count() * 3)
    // window starts are epoch-aligned to the slide, not the size
    val misaligned = hop
      .filter(expr("unix_timestamp(window_start) % 300 != 0"))
      .count()
    assert(misaligned === 0)
    // strictly more windows than the tumbling form of the same size
    val tumbling = ev.groupBy(window(col("ts"), "900 seconds")).count().count()
    assert(hop.select("window_start").distinct().count() > tumbling)
  }

  test("event pivot is a dense per-user matrix whose cells sum to the corpus") {
    val ev = Tables.events(spark, sf)
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivot = Relational.eventTypePivot(ev, types)
    assert(pivot.count() === ev.select("user_id").distinct().count())
    val cellSum = pivot.select(types.map(t => sum(col(t))): _*)
      .collect()(0).toSeq.map(_.asInstanceOf[Long]).sum
    assert(cellSum === ev.count())
    // dense: no null cells anywhere
    assert(types.forall(t => pivot.filter(col(t).isNull).count() === 0))
  }

  test("user growth curve is monotone and ends at the distinct-user total") {
    val ev = Tables.events(spark, sf)
    val growth = Relational.userGrowth(ev).orderBy("day").collect()
    val cums = growth.map(_.getLong(2))
    assert(cums.zip(cums.tail).forall(p => p._1 <= p._2))
    assert(cums.last === ev.select("user_id").distinct().count())
    assert(growth.map(_.getLong(1)).sum === cums.last)
  }

  test("z-scores per type have ~zero mean and flag exactly the >3-sigma tail") {
    val ev = Tables.events(spark, sf)
    val z = Relational.valueZScores(ev)
    assert(z.count() === ev.count())
    // standardized: per-type z mean ~ 0, and flags match |z| > 3 exactly
    val means = z.groupBy("event_type").agg(avg("z")).collect()
    assert(means.forall(r => math.abs(r.getDouble(1)) < 1e-6))
    assert(z.filter((abs(col("z")) > 3.0) =!= (col("is_outlier") === 1))
      .count() === 0)
  }

  test("inter-arrival stats: every user has exactly (events - 1) gaps") {
    val ev = Tables.events(spark, sf)
    val stats = Relational.interArrivalStats(ev).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val perUser = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // single-event users produce no row; all others n_gaps = n - 1
    assert(stats.forall { case (u, n, _, _) => n === perUser(u) - 1 })
    assert(stats.length === perUser.count(_._2 > 1))
    assert(stats.forall { case (_, _, avg, mx) => avg >= 0 && mx >= avg })
  }

  test("funnel is monotone and enforces stage order") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val stages = Seq("signup", "click", "purchase")
    val counts = Relational.funnel(ev, stages).orderBy("idx").collect()
      .map(_.getLong(2))
    assert(counts.length === 3)
    assert(counts.zip(counts.tail).forall(p => p._1 >= p._2))
    // order rule: a purchase BEFORE signup does not convert
    def t(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val fixture = Seq(
      (1L, t("00:01:00"), 10L, "signup", 1.0, "{}"),
      (2L, t("00:02:00"), 10L, "purchase", 1.0, "{}"), // in order → converts
      (3L, t("00:01:00"), 20L, "purchase", 1.0, "{}"),
      (4L, t("00:02:00"), 20L, "signup", 1.0, "{}") // out of order → no
    ).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val f2 = Relational.funnel(fixture, Seq("signup", "purchase"))
      .orderBy("idx").collect().map(_.getLong(2))
    assert(f2.toSeq === Seq(2L, 1L))
  }

  test("growth accounting: ledger identities hold on a hand-built history") {
    import spark.implicits._
    def e(id: Long, day: String, uid: Long) =
      (id, java.sql.Timestamp.valueOf(s"2024-01-$day 12:00:00"), uid)
    // weeks (Mondays): w1=2024-01-01, w2=01-08, w3=01-15
    // u1: active w1, w2, w3  → new@w1, retained@w2, retained@w3
    // u2: active w1, w3      → new@w1, resurrected@w3, churned@w2
    // u3: active w2          → new@w2, churned@w3
    val ev = Seq(
      e(1, "02", 1), e(2, "09", 1), e(3, "16", 1),
      e(4, "03", 2), e(5, "17", 2),
      e(6, "10", 3)
    ).toDF("event_id", "ts", "user_id")
    val got = Relational.growthAccounting(ev).collect()
      .map(r => r.getTimestamp(0).toString.take(10) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got("2024-01-01") === ((2L, 0L, 0L, 0L)))
    assert(got("2024-01-08") === ((1L, 1L, 0L, 1L)))
    assert(got("2024-01-15") === ((0L, 1L, 1L, 1L)))
    // identity on the real corpus: new + retained + resurrected = WAU
    val real = Tables.events(spark, sf)
    val ledger = Relational.growthAccounting(real)
      .select(col("week"),
        (col("new_users") + col("retained_users") + col("resurrected_users"))
          .as("sum"))
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    val wau = real
      .select(date_trunc("week", col("ts")).as("week"), col("user_id"))
      .distinct().groupBy("week").count()
      .collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    assert(ledger === wau, "new+retained+resurrected must equal WAU")
  }

  test("retention cohorts: offset 0 counts every cohort member exactly once") {
    val ev = Tables.events(spark, sf)
    val ret = Relational.retentionCohorts(ev).collect()
      .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
    assert(ret.forall(_._2 >= 0))
    // day-0 row per cohort == cohort size; cohorts partition all users
    val day0 = ret.filter(_._2 == 0).map(_._3).sum
    assert(day0 === ev.select("user_id").distinct().count())
    // no offset row can exceed its cohort's day-0 count
    val day0ByCohort = ret.filter(_._2 == 0).map(r => r._1 -> r._3).toMap
    assert(ret.forall(r => r._3 <= day0ByCohort(r._1)))
  }

  test("topKPerGroup: k rows per group, ranked by count desc") {
    val ev = Tables.events(spark, sf)
    val top = Relational.topKPerGroup(ev, "event_type", "user_id", 3)
    val perGroup = top.groupBy("event_type").count().collect()
    assert(perGroup.forall(_.getLong(1) <= 3))
    // rank 1 really is the group's max count
    val counts = ev.groupBy("event_type", "user_id").count()
    val maxN = counts.groupBy("event_type").agg(max("count").as("mx"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    top.filter(col("rk") === 1).collect().foreach { r =>
      assert(r.getLong(2) === maxN(r.getString(0)))
    }
  }

  test("movingAgg: running sum ends at the user's exact total") {
    import spark.implicits._
    val ev = Tables.events(spark, sf)
    val ma = Relational.movingAgg(ev)
    // last running_sum per user == decimal-exact total per user
    val last = Relational.latestByKey(ma, "user_id", col("ts"), col("event_id"))
      .select(col("user_id"), col("running_sum"))
      .as[(Long, Double)].collect().toMap
    val totals = ev.groupBy("user_id")
      .agg(sum(col("value").cast("decimal(18,6)")).cast("double").as("t"))
      .as[(Long, Double)].collect().toMap
    assert(last === totals)
    // moving window of 3 preceding: first row per user has avg == value
    val first = ma.join(
      ev.groupBy("user_id").agg(min("event_id").as("event_id")),
      Seq("user_id", "event_id"))
    assert(first.filter(
      abs(col("moving_avg") - round(col("moving_sum"), 6)) > 1e-9).count() === 0)
  }

  test("live/error filters partition the events stream") {
    val ev = Tables.events(spark, sf)
    val live = Relational.eventsLive(ev).count()
    val err = Relational.eventsError(ev).count()
    assert(live + err === ev.count())
    assert(live > 0 && err > 0)
  }

  test("enrichment join drops events with no matching customer") {
    val ev = Relational.eventsLive(Tables.events(spark, sf))
    val cust = Tables.customer(spark, sf)
    val out = Relational.enriched(ev, cust)
    assert(out.filter(col("full_name").isNull).count() === 0)
    // every output row corresponds to a live event with a known customer
    val expected = ev.join(cust,
      ev("user_id") === cust("c_custkey"), "inner").count()
    assert(out.count() === expected)
  }

  test("unhappy platinum is a subset of enriched with the filter applied") {
    val ev = Relational.eventsLive(Tables.events(spark, sf))
    val out = Relational.unhappyPlatinum(
      Relational.enriched(ev, Tables.customer(spark, sf)))
    assert(out.filter(col("stars") >= 3 || col("club_status") =!= "BUILDING")
      .count() === 0)
  }

  test("q1_agg groups are complete and counts add up") {
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    val totalCnt = rows.map(_.getAs[Long]("cnt")).sum
    assert(totalCnt === Tables.lineitem(spark, sf).count())
  }

  test("sessionWindows agrees with the islands sessionize (end shifted by gap)") {
    val ev = Tables.events(spark, sf)
    // key both results by (user, session_start): the two definitions must
    // produce identical session boundaries, counts, and value sums; the
    // only contract difference is session_window's end = last event + gap
    val a = Relational.sessionize(ev, 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(2)) ->
        ((r.getTimestamp(3), r.getLong(4), r.getDouble(5)))).toMap
    val b = Relational.sessionWindows(ev, 30).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1)) ->
        ((r.getTimestamp(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(a.keySet === b.keySet, "session starts diverge between the forms")
    a.foreach { case (k, (endA, nA, vA)) =>
      val (endB, nB, vB) = b(k)
      assert(nA === nB && vA === vB, s"session $k stats diverge")
      assert(endB.getTime - endA.getTime === 30L * 60 * 1000,
        s"session_window end must be islands end + gap at $k")
    }
  }

  test("latestByKey keeps exactly one row per key, the max-ordering one") {
    val ev = Tables.events(spark, sf)
    val latest = Relational.latestByKey(ev, "user_id",
      col("ts"), col("event_id"))
    val keys = ev.select("user_id").distinct().count()
    assert(latest.count() === keys)
    // the kept ts per key is the max ts per key
    val maxTs = ev.groupBy("user_id").agg(max("ts").as("mts"))
    val joined = latest.join(maxTs, "user_id")
      .filter(col("ts") =!= col("mts")).count()
    assert(joined === 0)
  }
}
