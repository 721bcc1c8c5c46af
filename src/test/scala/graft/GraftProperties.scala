package graft

import org.scalacheck.{Gen, Properties, Test => ScTest}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Dedup, Relational}

/** Property-based invariants (SURVEY §5 item 4) over randomly generated
  * inputs — table/stream duality, filter partitioning, CDC folds, dedup
  * guarantees. Kept at 20 cases per property: each evaluation runs real
  * Spark jobs. */
object GraftProperties extends Properties("graft") {

  override def overrideParameters(p: ScTest.Parameters): ScTest.Parameters =
    p.withMinSuccessfulTests(20)

  private lazy val spark = SparkTestBase.spark

  // (key, ts, offset, value) event histories with heavy key collision
  private val genHistory: Gen[List[(String, Long, Long, Long)]] = for {
    n <- Gen.choose(1, 30)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("a", "b", "c", "d")
      ts <- Gen.choose(0L, 20L)
      v <- Gen.choose(0L, 1000L)
    } yield (k, ts, v))
  } yield rows.zipWithIndex.map { case ((k, ts, v), i) => (k, ts, i.toLong, v) }

  property("latestByKey == max-(ts,offset) element of each key's history") =
    forAll(genHistory) { rows =>
      val s = spark; import s.implicits._
      val df = rows.toDF("key", "ts", "offset", "value")
      val got = Relational.latestByKey(df, "key", col("ts"), col("offset"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
      val expected = rows.groupBy(_._1).values
        .map(_.maxBy(r => (r._2, r._3))).toSet
      got == expected
    }

  property("live ⊎ error partitions the stream exactly") =
    forAll(Gen.listOf(Gen.oneOf("click", "view", "ERROR_x", "error", "purchase"))) {
      types =>
        val s = spark; import s.implicits._
        val df = types.zipWithIndex.map { case (t, i) => (i.toLong, t) }
          .toDF("event_id", "event_type")
        val live = Relational.eventsLive(df).count()
        val err = Relational.eventsError(df).count()
        live + err == types.length &&
          err == types.count(_.toLowerCase.contains("error"))
    }

  // CDC histories: op ∈ c/u/d per (key, ts, offset)
  private val genCdc: Gen[List[(String, String, Long, Long)]] = for {
    n <- Gen.choose(1, 25)
    rows <- Gen.listOfN(n, for {
      k <- Gen.oneOf("1", "2", "3")
      op <- Gen.frequency(4 -> "c", 3 -> "u", 2 -> "d")
      ts <- Gen.choose(0L, 15L)
    } yield (k, op, ts))
  } yield rows.zipWithIndex.map { case ((k, op, ts), i) => (k, op, ts, i.toLong) }

  property("CDC table view == per-key fold with delete-wins-if-latest") =
    forAll(genCdc) { rows =>
      val s = spark; import s.implicits._
      val env = rows.toDF("key", "op", "ts_ms", "offset")
        .withColumn("after",
          when(col("op") =!= "d",
            struct(col("offset").as("id"))).otherwise(lit(null)))
      val got = Cdc.latestByKeyTable(env)
        .select("id").collect().map(_.getLong(0)).toSet
      val expected = rows.groupBy(_._1).values.flatMap { h =>
        val latest = h.maxBy(r => (r._3, r._4))
        if (latest._2 == "d") None else Some(latest._4)
      }.toSet
      got == expected
    }

  private val genDocs: Gen[List[String]] = for {
    n <- Gen.choose(1, 12)
    base <- Gen.listOfN(n, Gen.choose(1, 6).flatMap(len =>
      Gen.listOfN(len, Gen.oneOf("alpha", "beta", "gamma", "delta"))
        .map(_.mkString(" "))))
    dups <- Gen.someOf(base)
  } yield base ++ dups // guaranteed duplicate groups

  property("ES bulk with delete behavior: applying microbatches in order " +
    "== last-write-wins minus deleted keys, idempotent under replay") =
    forAll(genCdc) { rows =>
      val s = spark; import s.implicits._
      // one row per envelope: tombstone (null value) iff op == 'd'; apply
      // each microbatch's bulk entries in arrival order to an _id-keyed
      // map (the ES model): index upserts, delete removes
      val batches = rows.grouped(5).toSeq
      val index = scala.collection.mutable.Map[String, String]()
      batches.foreach { b =>
        val df = b.toDF("key", "op", "ts_ms", "offset")
          .withColumn("after",
            when(col("op") =!= "d", concat(lit("v"), col("offset"))))
        // within a microbatch ES applies the request body in order; the
        // engine's bulkLines preserves row order per partition — order
        // the collected entries by the offset embedded in the doc/action
        val entries = graft.sinks.EsSink.bulkLines(df, "t", Some("key"),
          Some("after"), "delete").collect().toSeq
        val ordered = b.map { case (k, op, _, off) =>
          if (op == "d") {
            val del = s"""{"delete":{"_index":"t","_id":"$k"}}"""
            assert(entries.contains(del),
              s"bulkLines must emit the delete action for key $k")
            del
          } else entries.find(e => e.contains(s""""offset":$off""") &&
            !e.startsWith("""{"delete"""")).get
        }
        ordered.foreach { e =>
          val id = e.split(""""_id":"""")(1).takeWhile(_ != '"')
          if (e.startsWith("""{"delete"""")) index.remove(id)
          else index(id) = e.split("\n", 2)(1)
        }
        // at-least-once replay of the same microbatch converges
        val snapshot = index.toMap
        ordered.foreach { e =>
          val id = e.split(""""_id":"""")(1).takeWhile(_ != '"')
          if (e.startsWith("""{"delete"""")) index.remove(id)
          else index(id) = e.split("\n", 2)(1)
        }
        assert(index.toMap == snapshot, "replay must be a no-op")
      }
      // reference fold: last op per key in arrival order; 'd' removes
      val expected = rows.foldLeft(Map.empty[String, Long]) {
        case (m, (k, "d", _, _)) => m - k
        case (m, (k, _, _, off)) => m + (k -> off)
      }
      val got = index.map { case (k, doc) =>
        k -> doc.split(""""offset":""")(1).takeWhile(_.isDigit).toLong
      }.toMap
      got == expected
    }

  property("exactDedup: n_dups sums to corpus size, canonical is min doc_id") =
    forAll(genDocs) { texts =>
      val s = spark; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = Dedup.exactDedup(docs).collect()
      val norm = texts.map(_.trim.toLowerCase.replaceAll("\\s+", " "))
      val expectedGroups = norm.zipWithIndex.groupBy(_._1)
      out.map(_.getLong(2)).sum == texts.length &&
        out.length == expectedGroups.size &&
        out.forall { r =>
          val ids = expectedGroups.values.find(_.map(_._2.toLong).contains(r.getLong(1)))
          ids.exists(g => g.map(_._2).min.toLong == r.getLong(1) &&
            g.size.toLong == r.getLong(2))
        }
    }

  property("canonicalFromPairs: canonical <= doc_id, and exact dups share a canonical") =
    forAll(genDocs) { texts =>
      val s = spark; import s.implicits._
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val canon = Dedup.canonicalFromPairs(docs, Dedup.minhashCandidatePairs(docs))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val dupGroups = texts.zipWithIndex
        .filter(_._1.split("\\s+").length >= 4) // >= 2 shingles -> stable sig
        .groupBy(_._1).values.filter(_.size > 1)
      canon.forall { case (id, c) => c <= id } &&
        canon.keySet == texts.indices.map(_.toLong).toSet &&
        dupGroups.forall(g => g.map(x => canon(x._2.toLong)).toSet.size == 1)
    }

  // randomly nullable mixed-type rows, including empty strings and
  // negative/extreme numerics
  private val genAvroRows: Gen[List[(Long, Option[String], Option[Double], Option[Long])]] =
    for {
      n <- Gen.choose(1, 15)
      rows <- Gen.listOfN(n, for {
        s <- Gen.option(Gen.oneOf("", "plain", "uniçodé", "with \"quotes\" and \n newlines"))
        d <- Gen.option(Gen.oneOf(0.0, -1.5, 1e300, Double.MinPositiveValue))
        l <- Gen.option(Gen.choose(Long.MinValue, Long.MaxValue))
      } yield (s, d, l))
    } yield rows.zipWithIndex.map { case ((s, d, l), i) => (i.toLong, s, d, l) }

  property("Avro serde round-trips arbitrary nullable rows bit-for-bit") =
    forAll(genAvroRows) { rows =>
      val s = spark; import s.implicits._
      val df = rows.toDF("id", "s", "d", "l")
      val back = graft.streaming.AvroSerde
        .decode(graft.streaming.AvroSerde.encode(df), df.schema)
        .collect()
        .map(r => (r.getLong(0),
          Option(r.get(1)).map(_.asInstanceOf[String]),
          Option(r.get(2)).map(_.asInstanceOf[Double]),
          Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
      back == rows.toSet
    }

  property("identical docs with >=3 tokens always become minhash candidates") =
    forAll(Gen.listOfN(4, Gen.oneOf("alpha", "beta", "gamma"))) { words =>
      val s = spark; import s.implicits._
      val text = words.mkString(" ") // 4 tokens -> 2 shingles
      val docs = Seq((0L, text), (1L, text), (2L, "completely different words here"))
        .toDF("doc_id", "text")
      val pairs = Dedup.minhashCandidatePairs(docs)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      pairs.contains((0L, 1L))
    }

  // version histories (key, vt, state) with collisions on key but unique
  // (key, vt) — the as-of contract requires one version per (key, ts)
  private val genAsOf: Gen[(List[(Long, Long, Long)], List[(Long, Long, Long)])] =
    for {
      nv <- Gen.choose(0, 12)
      versions <- Gen.listOfN(nv, for {
        k <- Gen.choose(1L, 3L)
        vt <- Gen.choose(0L, 20L)
        st <- Gen.choose(0L, 999L)
      } yield (k, vt, st))
      nf <- Gen.choose(1, 15)
      facts <- Gen.listOfN(nf, for {
        k <- Gen.choose(1L, 4L) // key 4 never has versions
        ft <- Gen.choose(0L, 25L)
      } yield (k, ft))
    } yield (
      versions.groupBy(v => (v._1, v._2)).values.map(_.head).toList,
      facts.zipWithIndex.map { case ((k, ft), i) => (k, ft, i.toLong) })

  // facts (id, t) and intervals (iid, s, e) on a small non-negative axis,
  // plus an arbitrary bin width — bin boundaries must never change results
  private val genRangeJoin: Gen[(List[(Long, Long)], List[(Long, Long, Long)], Long)] =
    for {
      nf <- Gen.choose(1, 12)
      facts <- Gen.listOfN(nf, Gen.choose(0L, 40L))
      ni <- Gen.choose(0, 8)
      ivs <- Gen.listOfN(ni, for {
        s <- Gen.choose(0L, 40L)
        span <- Gen.choose(0L, 15L)
      } yield (s, s + span))
      w <- Gen.choose(1L, 15L)
    } yield (facts.zipWithIndex.map { case (t, i) => (i.toLong, t) },
      ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }, w)

  property("rangeJoin == naive BETWEEN join for any bin width") =
    forAll(genRangeJoin) { case (facts, ivs, w) =>
      val s = spark; import s.implicits._
      val got = graft.operators.Temporal
        .rangeJoin(facts.toDF("fid", "t"), ivs.toDF("iid", "lo", "hi"),
          "t", "lo", "hi", w)
        .select("iid", "fid").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toList
      val expected = (for {
        (fid, t) <- facts
        (iid, lo, hi) <- ivs
        if t >= lo && t <= hi
      } yield (iid, fid))
      got.length == expected.length && got.toSet == expected.toSet
    }

  property("a doc sharing all its text with the eval set is always contaminated") =
    forAll(Gen.listOfN(5, Gen.oneOf("alpha", "beta", "gamma", "delta"))) { ws =>
      val s = spark; import s.implicits._
      val text = ws.mkString(" ") // 5 tokens -> 3 shingles
      val corpus = Seq((1L, text), (2L, "unrelated corpus entry number two"))
        .toDF("doc_id", "text")
      val eval_ = Seq((9L, text)).toDF("doc_id", "text")
      val out = Dedup.decontaminate(corpus, eval_)
        .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
      out(1L) == 1
    }

  private val genIdDocs: Gen[List[(Long, String)]] = for {
    n <- Gen.choose(1, 15)
    rows <- Gen.listOfN(n, for {
      words <- Gen.choose(1, 12)
      toks <- Gen.listOfN(words, Gen.oneOf("alpha", "beta", "gamma", "delta"))
    } yield toks.mkString(" "))
  } yield rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }

  property("splitByHash partitions every doc into exactly one split, deterministically") =
    forAll(genIdDocs) { docs =>
      val s = spark; import s.implicits._
      val df = docs.toDF("doc_id", "text")
      val a = graft.operators.TextAnalysis.splitByHash(df)
        .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
      val b = graft.operators.TextAnalysis.splitByHash(df)
        .collect().map(r => r.getLong(0) -> r.getString(1)).sortBy(_._1).toSeq
      a == b && a.length == docs.length &&
        a.forall(p => Set("train", "val", "test")(p._2)) &&
        // identical text => identical split (content hash, not position)
        a.zip(docs.sortBy(_._1)).groupBy(_._2._2).values
          .forall(g => g.map(_._1._2).distinct.length == 1)
    }

  property("dedupPassages removes only repeated passages and keeps order") =
    forAll(genIdDocs) { docs =>
      val s = spark; import s.implicits._
      val df = docs.toDF("doc_id", "text")
      val cleaned = graft.operators.TextAnalysis
        .dedupPassages(df, passageWords = 2, minDocs = 2)
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      docs.forall { case (id, text) =>
        val orig = text.split(" ").grouped(2).map(_.mkString(" ")).toSeq
        val kept = cleaned(id)
        // every output doc is a subsequence of its original passage grid
        val keptP = if (kept.isEmpty) Seq.empty
                    else kept.split(" ").grouped(2).map(_.mkString(" ")).toSeq
        var oi = 0
        keptP.forall { p =>
          val found = orig.indexWhere(_ == p, oi)
          if (found >= 0) { oi = found + 1; true } else false
        }
      }
    }

  property("duplicateSpans/trim == naive sliding-window reference (k=3)") =
    forAll(genIdDocs) { docs =>
      val s = spark; import s.implicits._
      val k = 3
      // naive reference: positional k-grams, occurrence >= 2 (globally
      // first occurrence by (doc_id, i) exempt), interval merge
      val grams = for {
        (id, text) <- docs
        toks = text.toLowerCase.split("\\s+").toSeq
        if toks.size >= k
        i <- 0 to (toks.size - k)
      } yield (id, i, toks.slice(i, i + k).mkString(" "))
      val byGram = grams.groupBy(_._3)
      val dupPos = grams.filter { case (id, i, g) =>
        val occ = byGram(g)
        occ.size >= 2 && (id, i) != occ.map(o => (o._1, o._2)).min
      }.map(g => (g._1, g._2))
      val wantSpans = dupPos.groupBy(_._1).toSeq.flatMap { case (id, ps) =>
        var spans = List.empty[(Int, Int)]
        for (i <- ps.map(_._2).sorted) spans = spans match {
          case (st, e) :: rest if i <= e => (st, math.max(e, i + k)) :: rest
          case _ => (i, i + k) :: spans
        }
        spans.map { case (st, e) => (id, st, e - st) }
      }.toSet
      val df = docs.toDF("doc_id", "text")
      val gotSpans = Dedup.duplicateSpans(df, k)
        .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
      // trim: kept text == tokens not covered by any reference span
      val covered = wantSpans.groupBy(_._1).map { case (id, ss) =>
        id -> ss.flatMap { case (_, st, n) => st until (st + n) }
      }
      val gotTrim = Dedup.trimDuplicateSpans(df, k)
        .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
      gotSpans == wantSpans && docs.forall { case (id, text) =>
        val toks = text.toLowerCase.split("\\s+").toSeq
        val want = toks.zipWithIndex.collect {
          case (t, i) if !covered.getOrElse(id, Set.empty).contains(i) => t
        }.mkString(" ")
        gotTrim(id) == want
      }
    }

  private val genBpeWords: Gen[List[String]] = for {
    n <- Gen.choose(1, 12)
    ws <- Gen.listOfN(n, for {
      l <- Gen.choose(1, 6)
      cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString)
  } yield ws

  property("heavy hitters: membership == naive top-k, estimates one-sided") =
    forAll(Gen.nonEmptyListOf(Gen.oneOf("a", "b", "c", "dd", "ee", "f"))) {
      keys =>
        val s = spark; import s.implicits._
        val k = 3
        val got = graft.functions.CmsSketch
          .heavyHitters(keys.toDF("key"), "key", k)
          .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        val naive = keys.groupBy(identity).view.mapValues(_.size.toLong)
          .toSeq.sortBy { case (key, n) => (-n, key) }.take(k)
        got.map(t => (t._1, t._2)).toSeq == naive &&
          got.forall { case (_, exact, est) => est >= exact }
    }

  property("BPE greedy encode == replaying merges in rank order; round-trips") =
    forAll(genBpeWords) { words =>
      import graft.operators.Bpe
      import graft.functions.{BpeCodec, BpeRanks}
      val hist = words.groupBy(identity)
        .map { case (w, ws) => (w, ws.size.toLong) }.toSeq.sortBy(_._1)
      val merges = Bpe.trainOnHistogram(hist, 8)
      val ranks = BpeRanks(merges)
      words.forall { w =>
        val greedy = BpeCodec.encodeWord(w, ranks).toSeq
        // naive reference: apply the merge list in rank order
        var naive = w.toCharArray.map(_.toString)
        merges.foreach(m => naive = Bpe.mergePair(naive, m.left, m.right))
        greedy == naive.toSeq && greedy.mkString == w
      }
    }

  property("funnel counts are monotone non-increasing for any event history") =
    forAll(genHistory) { rows =>
      val s = spark; import s.implicits._
      val df = rows.map { case (k, ts, off, v) =>
        (off, new java.sql.Timestamp(ts * 1000), k.hashCode.toLong,
          Seq("signup", "click", "purchase")((v % 3).toInt), v.toDouble, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val counts = Relational
        .funnel(df, Seq("signup", "click", "purchase"))
        .orderBy("idx").collect().map(_.getLong(2))
      counts.zip(counts.tail).forall(p => p._1 >= p._2)
    }

  property("retention cohorts: day-0 counts partition the users, offsets bounded") =
    forAll(genHistory) { rows =>
      val s = spark; import s.implicits._
      val df = rows.map { case (k, ts, off, v) =>
        (off, new java.sql.Timestamp(ts * 86400000L), k.hashCode.toLong,
          "click", v.toDouble, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val ret = Relational.retentionCohorts(df).collect()
        .map(r => (r.getTimestamp(0), r.getInt(1), r.getLong(2)))
      val day0 = ret.filter(_._2 == 0)
      val day0ByCohort = day0.map(r => r._1 -> r._3).toMap
      day0.map(_._3).sum == rows.map(_._1).distinct.length &&
        ret.forall(_._2 >= 0) &&
        ret.forall(r => r._3 <= day0ByCohort(r._1))
    }

  property("bm25: every hit contains a query term; scores positive; k bounds") =
    forAll(for {
      n <- Gen.choose(4, 12)
      docs <- Gen.listOfN(n, Gen.nonEmptyListOf(
        Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon")))
    } yield docs) { docs =>
      val s = spark; import s.implicits._
      val df = docs.zipWithIndex
        .map { case (ws, i) => (i.toLong, ws.mkString(" ")) }
        .toDF("doc_id", "text")
      val hits = graft.operators.Retrieval
        .bm25TopK(df, Seq("alpha", "gamma"), k = 5)
        .collect().map(r => r.getLong(0) -> r.getDouble(1))
      val matching = docs.zipWithIndex.collect {
        case (ws, i) if ws.contains("alpha") || ws.contains("gamma") => i.toLong
      }.toSet
      hits.length <= 5 &&
        hits.forall { case (id, _) => matching(id) } &&
        hits.forall(_._2 > 0.0) &&
        (matching.isEmpty || hits.nonEmpty)
    }

  property("growth ledger: new+retained+resurrected == WAU; churn == lost actives") =
    forAll(genHistory) { rows =>
      val s = spark; import s.implicits._
      val df = rows.map { case (k, ts, off, v) =>
        (off, new java.sql.Timestamp(ts * 86400000L * 7), k.hashCode.toLong,
          "click", v.toDouble, "{}")
      }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      val got = Relational.growthAccounting(df).collect()
        .map(r => r.getTimestamp(0) ->
          ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
      val weekly = rows
        .map { case (k, ts, _, _) =>
          (k.hashCode.toLong,
            new java.sql.Timestamp(ts * 86400000L * 7).toInstant
              .atZone(java.time.ZoneOffset.UTC).toLocalDate
              .`with`(java.time.DayOfWeek.MONDAY)) }
        .distinct
      val byWeek = weekly.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
      got.forall { case (w, (nw, rt, rs, ch)) =>
        val day = w.toInstant.atZone(java.time.ZoneOffset.UTC).toLocalDate
        val act = byWeek(day)
        val prev = byWeek.getOrElse(day.minusDays(7), Set.empty[Long])
        nw + rt + rs == act.size &&
          rt == act.count(prev) &&
          ch == prev.count(u => !act(u))
      }
    }

  // random lineitem/order histories with heavy key collision: up to 8
  // orders × 4 suppliers, random return flags, random order status
  private val genWaiting: Gen[(List[(Long, Long, String)], Map[Long, String])] =
    for {
      n <- Gen.choose(1, 40)
      lines <- Gen.listOfN(n, for {
        ok <- Gen.choose(1L, 8L)
        sk <- Gen.choose(1L, 4L)
        rf <- Gen.oneOf("R", "N", "A")
      } yield (ok, sk, rf))
      status <- Gen.mapOfN(8, Gen.zip(Gen.choose(1L, 8L), Gen.oneOf("F", "O", "P")))
    } yield (lines, status.withDefaultValue("F"))

  property("waiting-suppliers one-agg form == the literal EXISTS/NOT EXISTS read") =
    forAll(genWaiting) { case (lines, status) =>
      val s = spark; import s.implicits._
      val li = lines.toDF("l_orderkey", "l_suppkey", "l_returnflag")
      val ord = (1L to 8L).map(k => (k, status(k)))
        .toDF("o_orderkey", "o_orderstatus")
      val supp = (1L to 4L).map(k => (k, s"S$k")).toDF("s_suppkey", "s_name")
      val got = graft.operators.Analytics
        .waitingSuppliersFrom(li, ord, supp, k = 100)
        .collect().map(r => (r.getString(0), r.getLong(1))).toSet
      // literal three-join reading of Q21: count l1 rows with flag R in a
      // finalized order where another supplier EXISTS in the order and NO
      // other supplier has an R row
      val expected = lines
        .filter { case (ok, sk, rf) =>
          status(ok) == "F" && rf == "R" &&
            lines.exists(l2 => l2._1 == ok && l2._2 != sk) &&
            !lines.exists(l3 => l3._1 == ok && l3._2 != sk && l3._3 == "R")
        }
        .groupBy { case (_, sk, _) => s"S$sk" }
        .map { case (name, rs) => (name, rs.size.toLong) }.toSet
      got == expected
    }

  property("asOfJoin == per-fact max version with vt <= ft (naive reference)") =
    forAll(genAsOf) { case (versions, facts) =>
      val s = spark; import s.implicits._
      val dims = versions.toDF("k", "vt", "state")
      val factsDf = facts.toDF("k", "ft", "fact_id")
      val got = graft.operators.Temporal
        .asOfJoin(factsDf, dims, Seq("k"), "ft", "vt")
        .collect().map(r => (r.getLong(r.fieldIndex("fact_id")),
          Option(r.get(r.fieldIndex("asof_vt"))).map(_.asInstanceOf[Long]),
          Option(r.get(r.fieldIndex("asof_state"))).map(_.asInstanceOf[Long])))
        .toSet
      val expected = facts.map { case (k, ft, id) =>
        versions.filter(v => v._1 == k && v._2 <= ft)
          .sortBy(_._2).lastOption match {
          case Some((_, vt, st)) => (id, Some(vt), Some(st))
          case None => (id, None, None)
        }
      }.toSet
      got == expected
    }
}
