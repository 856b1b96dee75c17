package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the targeted-retry selection the bench runs when a record would
  * otherwise be degraded (r18 — the r17 verdict's self-correcting-bench
  * item). BENCH_r17 recorded 61.3 s under ~45 min of sustained ambient
  * load against a 46.6 s idle truth: the two-pass min defends against a
  * burst shorter than one sweep, but load spanning BOTH passes leaves
  * whole queries with zero quiet reps — exactly the set
  * [[Bench.retryCandidates]] must select for the decay-wait-then-retry
  * pass (and nothing else: a query with even one quiet successful rep
  * keeps its min, so re-running it buys nothing).
  */
class BenchRetrySpec extends AnyFunSuite {
  // Rep = (totalSecs, quiet, worstExternalCores, buildSecs, succeeded)
  private def rep(t: Double, quiet: Boolean, ok: Boolean): Bench.Rep =
    (t, quiet, if (quiet) 0.3 else 3.2, 0.0, ok)

  test("selects exactly the queries with zero quiet successful reps") {
    val results = Seq(
      "clean" -> Seq(rep(1.0, quiet = true, ok = true),
        rep(2.0, quiet = false, ok = true)),
      "all_loud" -> Seq(rep(1.0, quiet = false, ok = true),
        rep(2.0, quiet = false, ok = true)),
      // quiet reps exist but all FAILED: their times are failure
      // latencies, so the headline would fall back to loud reps —
      // contaminated, must retry
      "quiet_but_failed" -> Seq(rep(1.0, quiet = true, ok = false),
        rep(2.0, quiet = false, ok = true)),
      "loud_and_failed" -> Seq(rep(1.0, quiet = false, ok = false)),
      "empty" -> Seq.empty[Bench.Rep])
    assert(Bench.retryCandidates(results) ==
      Seq("all_loud", "quiet_but_failed", "loud_and_failed"),
      "contaminated queries only; a query with no reps at all has " +
        "nothing to correct (it never ran) and the empty record says so")
  }

  test("one quiet successful rep exempts a query however loud the rest") {
    val ts = rep(0.9, quiet = true, ok = true) +:
      (1 to 6).map(i => rep(i + 1.0, quiet = false, ok = true))
    assert(Bench.retryCandidates(Seq("q" -> ts)).isEmpty,
      "min-of-k already filtered the noise: the quiet rep carries the min")
  }

  test("matches the per-query predicate behind the degraded bit") {
    // the record is contamination-degraded iff the retry set is
    // non-empty — the retry pass targets exactly what degrades it
    val contaminated = Seq("a" -> Seq(rep(1.0, quiet = false, ok = true)))
    val clean = Seq("a" -> Seq(rep(1.0, quiet = true, ok = true)))
    assert(Bench.retryCandidates(contaminated).nonEmpty)
    assert(Bench.retryCandidates(clean).isEmpty)
  }
}
