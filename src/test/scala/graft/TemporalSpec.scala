package graft

import org.apache.spark.sql.Row

import graft.operators.Temporal

/** As-of join semantics on a handcrafted version history, plus the plan
  * shape that makes it scale (one keyed shuffle, no range explosion). */
class TemporalSpec extends GraftSuite {
  import spark.implicits._

  // versions: key 1 becomes 'a' at t=5, 'b' at t=20; key 2 has none
  private lazy val dims = Seq((1L, 5L, "a"), (1L, 20L, "b"))
    .toDF("k", "vt", "state")

  test("as-of join picks the latest version at or before each fact") {
    val facts = Seq((1L, 3L, 100L), (1L, 5L, 101L), (1L, 10L, 102L),
      (1L, 25L, 103L), (2L, 10L, 104L)).toDF("k", "ft", "fact_id")
    val out = Temporal.asOfJoin(facts, dims, Seq("k"), "ft", "vt")
      .select("fact_id", "asof_vt", "asof_state").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) null else r.getLong(1),
        r.getString(2))).toSet
    assert(out === Set(
      (100L, null, null),   // before any version -> LEFT nulls
      (101L, 5L, "a"),      // tie: version AT the fact ts is visible
      (102L, 5L, "a"),
      (103L, 20L, "b"),     // later version wins
      (104L, null, null)))  // key with no history -> LEFT nulls
  }

  test("a tombstone version is picked as-is, not skipped for older state") {
    // key 1: 'a' at t=5, DELETED at t=10 (null payload)
    val withDelete = Seq((1L, 5L, Some("a")), (1L, 10L, None))
      .toDF("k", "vt", "state")
    val facts = Seq((1L, 7L, 1L), (1L, 12L, 2L)).toDF("k", "ft", "fact_id")
    val out = Temporal.asOfJoin(facts, withDelete, Seq("k"), "ft", "vt")
      .select("fact_id", "asof_vt", "asof_state").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // fact at 12 sees the DELETE (vt=10, null state) — an ignore-nulls
    // carry of individual fields would wrongly resurrect 'a'
    assert(out === Set((1L, 5L, "a"), (2L, 10L, null)))
  }

  test("fact columns pass through; colliding names are rejected") {
    val facts = Seq((1L, 6L, "payload")).toDF("k", "ft", "note")
    val row = Temporal.asOfJoin(facts, dims, Seq("k"), "ft", "vt").collect().head
    assert(row === Row(1L, 6L, "payload", 5L, "a"))
    val clash = Seq((1L, 6L, "x")).toDF("k", "ft", "asof_state")
    val err = intercept[IllegalArgumentException] {
      Temporal.asOfJoin(clash, dims, Seq("k"), "ft", "vt")
    }
    assert(err.getMessage.contains("asof_state"))
  }

  test("range join: inclusive bounds, multi-bin intervals, exactly-once pairs") {
    // bins of width 10; interval B spans 3 bins, A sits inside one
    val intervals = Seq((1L, 12L, 14L), (2L, 5L, 25L)).toDF("iid", "s", "e")
    val facts = Seq((100L, 12L), (101L, 14L), (102L, 15L), (103L, 26L),
      (104L, 4L)).toDF("fid", "t")
    val out = graft.operators.Temporal
      .rangeJoin(facts, intervals, "t", "s", "e", binWidth = 10L)
      .select("iid", "fid").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // exactly-once: no duplicate pairs even for the 3-bin interval
    assert(out.length === out.distinct.length)
    assert(out.toSet === Set(
      (1L, 100L), (1L, 101L),            // boundary hits: t == s and t == e
      (2L, 100L), (2L, 101L), (2L, 102L) // inside the wide interval
      // 103 (past both ends) and 104 (before both) match nothing
    ))
  }

  test("range join plans an equi-join on the bin, never a nested loop") {
    val intervals = Seq((1L, 12L, 14L)).toDF("iid", "s", "e")
    val facts = Seq((100L, 12L)).toDF("fid", "t")
    val plan = graft.operators.Temporal
      .rangeJoin(facts, intervals, "t", "s", "e", 10L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"),
      s"range join degenerated into a nested loop:\n$plan")
  }

  test("plan: one hash shuffle on the key, no join node, no range explosion") {
    val facts = Seq((1L, 3L, 100L)).toDF("k", "ft", "fact_id")
    val plan = Temporal.asOfJoin(facts, dims, Seq("k"), "ft", "vt")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one keyed exchange:\n$plan")
    assert(!plan.contains("Join"),
      s"as-of must be the union+window form, not a join:\n$plan")
  }

  // ------------------------------------------------------------------- //
  // Streaming as-of enrichment (AsOfStream) — the batch operator's twin
  // ------------------------------------------------------------------- //

  import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
  import graft.streaming.AsOfStream

  private def runAsOfStream(
      feed: (MemoryStream[AsofFact], MemoryStream[AsofDim],
             () => Unit) => Unit,
      retainMs: Long = Long.MaxValue): Set[(Long, Long, Long, Option[(Long, String)])] = {
    implicit val sqlCtx = spark.sqlContext
    val facts = MemoryStream[AsofFact]
    val dims = MemoryStream[AsofDim]
    val out = AsOfStream.asOfJoinStream[Long, AsofFact, AsofDim](
      facts.toDS(), dims.toDS(),
      f => f.k, d => d.k, f => f.ft, d => d.vt, retainMs)
    val name = s"asof_stream_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(name)
      .outputMode("append").start()
    try {
      feed(facts, dims, () => q.processAllAvailable())
      spark.table(name).collect().map { r =>
        val f = r.getStruct(0)
        val d = if (r.isNullAt(1)) None
          else Some((r.getStruct(1).getLong(1), r.getStruct(1).getString(2)))
        (f.getLong(0), f.getLong(1), f.getLong(2), d)
      }.toSet
    } finally { q.stop(); spark.catalog.dropTempView(name); () }
  }

  test("streaming as-of agrees with the batch asOfJoin on the same fixture") {
    val factRows = Seq(AsofFact(1L, 3L, 100L), AsofFact(1L, 5L, 101L),
      AsofFact(1L, 10L, 102L), AsofFact(1L, 25L, 103L), AsofFact(2L, 10L, 104L))
    val dimRows = Seq(AsofDim(1L, 5L, "a"), AsofDim(1L, 20L, "b"))
    // batch truth
    val batch = Temporal.asOfJoin(
        factRows.toDF(), dimRows.toDF(), Seq("k"), "ft", "vt")
      .collect().map { r =>
        (r.getLong(0), r.getLong(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some((r.getLong(3), r.getString(4))))
      }.toSet
    // stream: everything in ONE batch, arrival order scrambled — the
    // within-batch event-time sort must reconstruct the same history
    val streamed = runAsOfStream { (facts, dims, process) =>
      dims.addData(dimRows.reverse)
      facts.addData(factRows.reverse)
      process()
    }
    assert(streamed === batch)
    assert(streamed.exists(_._4.isEmpty)) // LEFT nulls present in both
  }

  test("streaming as-of enriches cross-batch: versions persist in state") {
    val streamed = runAsOfStream { (facts, dims, process) =>
      dims.addData(AsofDim(1L, 5L, "a")); process()   // batch: version only
      facts.addData(AsofFact(1L, 10L, 1L)); process() // later batch: fact
      dims.addData(AsofDim(1L, 20L, "b")); process()  // newer version
      facts.addData(AsofFact(1L, 30L, 2L), AsofFact(1L, 7L, 3L)); process()
    }
    assert(streamed === Set(
      (1L, 10L, 1L, Some((5L, "a"))),  // enriched from state, batches later
      (1L, 30L, 2L, Some((20L, "b"))),
      // late fact: at-or-before ITS ts, not the newest version
      (1L, 7L, 3L, Some((5L, "a")))))
  }

  test("as-of state retention keeps the latest at-or-before the horizon") {
    val vs = Vector((0L, "a"), (100L, "b"), (900L, "c"), (1000L, "d"))
    // horizon = 1000 - 50 = 950: drop a, b; keep c (latest <= horizon), d
    assert(AsOfStream.trim(vs, 50L) === Vector((900L, "c"), (1000L, "d")))
    // horizon = 1000 - 500 = 500: b is the latest <= horizon
    assert(AsOfStream.trim(vs, 500L) ===
      Vector((100L, "b"), (900L, "c"), (1000L, "d")))
    // unbounded: untouched
    assert(AsOfStream.trim(vs, Long.MaxValue) === vs)
    assert(AsOfStream.trim(Vector.empty[(Long, String)], 50L) === Vector.empty)
  }
}

/** Top-level fixture types for the streaming as-of spec (Spark encoders
  * need stable case classes). */
case class AsofFact(k: Long, ft: Long, fact_id: Long)
case class AsofDim(k: Long, vt: Long, state: String)
