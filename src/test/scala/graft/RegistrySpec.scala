package graft

/** Smoke: every registry query runs at sf0.001 and the declared contract
  * invariants hold (oracle keys ⊆ query keys; entry returns rows).
  */
class RegistrySpec extends SparkSpec {

  test("oracleSql keys are a subset of queries keys") {
    val extra = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(extra.isEmpty, s"oracle entries without a query: $extra")
  }

  test("every query has an oracle (the r9 full-coverage invariant)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle twin: $missing")
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("SURVEY.md §2.4's stated registry counts match the code (no hand-typed drift)") {
    // Two successive rounds shipped stale hand-maintained counts (r11:
    // 272 vs 274; r12: 274 vs 278) — so the number is now asserted, not
    // typed: parse the "<N> registered queries, <M> oracled" line out of
    // SURVEY.md and compare BOTH to the live registry.
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val ms = """(\d+) registered queries, (\d+) oracled""".r
      .findAllMatchIn(survey).toSeq
    assert(ms.nonEmpty, "SURVEY.md must state '<N> registered queries, <M> oracled'")
    // EVERY occurrence (§2.4 and any state paragraph repeating it) must
    // match — the first-match-only check let a second stale line drift
    ms.foreach { m =>
      val (stated, statedOracled) = (m.group(1).toInt, m.group(2).toInt)
      assert(stated == SparkEntry.queries.size,
        s"SURVEY.md says $stated registered queries; code has ${SparkEntry.queries.size}")
      assert(statedOracled == SparkEntry.oracleSql.size,
        s"SURVEY.md says $statedOracled oracled; code has ${SparkEntry.oracleSql.size}")
    }
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n >= 0)
    }
  }
}
