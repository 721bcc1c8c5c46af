package graft

/** Locks the bench sweep's outlier-guard machinery — the round-6 verdict
  * flagged that the cross-sweep retry path had only ever run dormant
  * (n_retried: 0 on a clean sweep), so a regression in the decision or the
  * medians persistence would go unnoticed until a noisy driver run needed
  * it. These tests plant the exact conditions (an inflated prior median, a
  * subset sweep over a fuller medians file) and pin the behavior.
  */
class BenchSpec extends GraftSuite {

  test("retry decision: intra-query spread fires only above the 1s floor") {
    // median 4x+ its min AND over 1s -> environment hiccup, retry
    assert(Bench.shouldRetry(median = 2.0, minT = 0.4, prev = None))
    // same spread under the absolute floor -> cheap query, never thrash
    assert(!Bench.shouldRetry(median = 0.8, minT = 0.1, prev = None))
    // tight trials, no prior -> clean
    assert(!Bench.shouldRetry(median = 2.0, minT = 1.8, prev = None))
  }

  test("retry decision: cross-sweep pressure fires on 3x the prior median") {
    // planted inflated condition: prior sweep said 0.4s, now 1.5s (tight
    // trials, so intra-query spread alone would NOT fire) -> retry
    assert(Bench.shouldRetry(median = 1.5, minT = 1.4, prev = Some(0.4)))
    // 3x a prior that still lands under the 1s floor -> no retry
    assert(!Bench.shouldRetry(median = 0.9, minT = 0.85, prev = Some(0.2)))
    // within 3x of the prior -> no retry
    assert(!Bench.shouldRetry(median = 1.5, minT = 1.4, prev = Some(0.6)))
  }

  test("medians round-trip and tolerate malformed lines") {
    val path = java.nio.file.Files.createTempFile("graft-medians", ".txt")
    java.nio.file.Files.writeString(path,
      "q_a 1.25\nnot a valid line\nq_b abc\nq_c 0.5\n")
    assert(Bench.readMedians(path) === Map("q_a" -> 1.25, "q_c" -> 0.5))
    assert(Bench.readMedians(
      java.nio.file.Paths.get("/tmp/graft-no-such-medians")) === Map.empty)
  }

  test("subset sweep merges into prior medians instead of clobbering them") {
    val path = java.nio.file.Files.createTempFile("graft-medians", ".txt")
    val prior = Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0)
    Bench.writeMedians(path, Map.empty, prior)
    // a SPARK_GRAFT_ONLY=q_b sweep runs one query; q_a/q_c baselines must
    // survive for the next full sweep's guard. q_b's slower 2.5 does NOT
    // replace the 2.0 floor (min-merge); a faster 1.5 does.
    Bench.writeMedians(path, Bench.readMedians(path), Map("q_b" -> 2.5))
    assert(Bench.readMedians(path) ===
      Map("q_a" -> 1.0, "q_b" -> 2.0, "q_c" -> 3.0))
    Bench.writeMedians(path, Bench.readMedians(path), Map("q_b" -> 1.5))
    assert(Bench.readMedians(path) ===
      Map("q_a" -> 1.0, "q_b" -> 1.5, "q_c" -> 3.0))
  }

  test("a pressured sweep cannot absorb its phantoms into the baseline") {
    // The r10 incident: the driver's machine-pressured sweep (3 retries,
    // q_minhash_pairs 1.45s vs its clean 0.62s) overwrote the committed
    // clean medians last-write-wins, arming the NEXT round's cross-sweep
    // guard with inflated floors. min-merge must keep the clean baseline.
    val path = java.nio.file.Files.createTempFile("graft-medians", ".txt")
    val clean = Map("q_minhash_pairs" -> 0.62, "q_clean_corpus" -> 0.6)
    Bench.writeMedians(path, Map.empty, clean)
    val pressured = Map("q_minhash_pairs" -> 1.45, "q_clean_corpus" -> 5.1)
    Bench.writeMedians(path, Bench.readMedians(path), pressured)
    assert(Bench.readMedians(path) === clean,
      "inflated sweep values must not replace the clean floor")
  }

  test("baseline reset restores last-write-wins for the named queries only") {
    // The floor's escape hatch (round-11 advice): an ACCEPTED regression
    // can never raise its baseline through min-merge, so the guard would
    // retry it on every future sweep forever. A reset names the queries
    // whose floor should be replaced by this sweep's value; everything
    // else keeps the min-merge contract, and a reset query the sweep
    // didn't run is deleted rather than kept stale.
    val path = java.nio.file.Files.createTempFile("graft-medians", ".txt")
    Bench.writeMedians(path, Map.empty,
      Map("q_a" -> 0.5, "q_b" -> 0.7, "q_c" -> 0.9))
    // q_a regressed for real to 2.0 and the regression was accepted
    Bench.writeMedians(path, Bench.readMedians(path),
      Map("q_a" -> 2.0, "q_b" -> 5.0), reset = Set("q_a"))
    assert(Bench.readMedians(path) ===
      Map("q_a" -> 2.0, "q_b" -> 0.7, "q_c" -> 0.9),
      "reset replaces q_a's floor; q_b stays min-merged; q_c untouched")
    // reset of a query the sweep didn't run deletes its entry
    Bench.writeMedians(path, Bench.readMedians(path),
      Map("q_b" -> 0.6), reset = Set("q_c"))
    assert(Bench.readMedians(path) === Map("q_a" -> 2.0, "q_b" -> 0.6))
    // `all` replaces the whole baseline with this sweep
    Bench.writeMedians(path, Bench.readMedians(path),
      Map("q_b" -> 3.0), reset = Set("all"))
    assert(Bench.readMedians(path) === Map("q_b" -> 3.0))
  }

  test("a reset query that ran but FAILED keeps its floor instead of vanishing") {
    // round-12 advice: writeMedians dropped a reset query's floor
    // unconditionally, so a reset query whose sweep failed (absent from
    // the sweep map) lost BOTH values — silently disarming the
    // cross-sweep guard for it until some later sweep succeeded, the
    // same disarm class the round-7 fix targets. Failed queries are now
    // spared from the reset.
    val path = java.nio.file.Files.createTempFile("graft-medians", ".txt")
    Bench.writeMedians(path, Map.empty,
      Map("q_a" -> 0.5, "q_b" -> 0.7, "q_c" -> 0.9))
    // reset q_a and q_b; q_a fails this sweep, q_b succeeds at 2.0,
    // q_c (unreset) min-merges as usual
    Bench.writeMedians(path, Bench.readMedians(path),
      Map("q_b" -> 2.0, "q_c" -> 1.5),
      reset = Set("q_a", "q_b"), failed = Set("q_a"))
    assert(Bench.readMedians(path) ===
      Map("q_a" -> 0.5, "q_b" -> 2.0, "q_c" -> 0.9),
      "failed reset keeps its floor; successful reset last-write-wins; " +
        "unreset stays min-merged")
    // the literal-`all` direct-caller branch: failures keep their floors
    Bench.writeMedians(path, Bench.readMedians(path),
      Map("q_b" -> 3.0), reset = Set("all"), failed = Set("q_a"))
    assert(Bench.readMedians(path) === Map("q_a" -> 0.5, "q_b" -> 3.0),
      "reset=all must not delete a FAILED query's floor")
  }

  test("planted inflated prior median routes through the real retry path") {
    // Drives Bench.guardedMedian — the production warmup/trials/retry
    // branch the sweep loop calls — with planted trial results: the prior
    // sweep recorded 0.3s, this one measures 1.2s with TIGHT trials (so
    // the intra-query spread guard stays cold and only the cross-sweep
    // branch can fire). The discarded median must be recorded and the
    // clean re-run's median reported.
    var trialCalls = 0
    var recorded = List.empty[Double]
    val result = Bench.guardedMedian(
      warmup = () => Right(1.3),
      trials = () => {
        trialCalls += 1
        // under pressure first, clean on the retry
        if (trialCalls == 1) Right((1.2, 1.15)) else Right((0.31, 0.30))
      },
      prev = Some(0.3),
      record = m => recorded ::= m)
    assert(trialCalls === 2, "the cross-sweep guard must trigger a re-run")
    assert(recorded === List(1.2),
      "the discarded pressure median must be recorded for the audit trail")
    assert(result === Right(0.31), "the clean retry median must be reported")
  }

  test("a clean sweep with a sane prior median never retries") {
    var trialCalls = 0
    val result = Bench.guardedMedian(
      warmup = () => Right(1.3),
      trials = () => { trialCalls += 1; Right((1.2, 1.15)) },
      prev = Some(1.1), // same ballpark as the prior sweep
      record = _ => fail("guard must not fire on a clean measurement"))
    assert(trialCalls === 1)
    assert(result === Right(1.2))
  }

  test("a failed warmup fails fast without timed reruns") {
    val result = Bench.guardedMedian(
      warmup = () => Left("boom"),
      trials = () => fail("trials must not run after a failed warmup"),
      prev = None,
      record = _ => fail("no retry on failure"))
    assert(result === Left("boom"))
  }
}
