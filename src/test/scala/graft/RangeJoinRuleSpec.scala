package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [[graft.plans.RangeJoinRule]]: the naive inequality-join syntax must
  * get the bucketed equi-join plan — with a bit-identical result — when
  * the bin-size conf is set, and must be left alone when it isn't.
  */
class RangeJoinRuleSpec extends SparkSpec {
  import graft.plans.RangeJoinRule.BIN_CONF

  private def probes: DataFrame = Tables.events(spark, sf)
    .select(col("event_id"), col("user_id"),
      unix_micros(col("ts")).as("ts_us"))

  private def intervals: DataFrame = {
    // per-user session-ish intervals with varied widths, half-open gaps
    val iv = Tables.events(spark, sf)
      .groupBy(col("user_id"), window(col("ts"), "6 hours"))
      .agg(min(unix_micros(col("ts"))).as("lo"),
        max(unix_micros(col("ts"))).as("hi"),
        count(lit(1)).as("iv_n"))
      .drop("window")
    iv.withColumn("iv_id", monotonically_increasing_id())
  }

  private def naiveJoin(p: DataFrame, iv: DataFrame): DataFrame =
    p.join(iv, p("user_id") === iv("user_id") &&
      p("ts_us") >= iv("lo") && p("ts_us") <= iv("hi"))
      .select(p("event_id"), iv("iv_id"), iv("iv_n"))

  private def canon(df: DataFrame): Set[(Long, Long, Long)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("rewrite preserves the result multiset exactly") {
    val p = probes.cache(); val iv = intervals.cache()
    try {
      spark.conf.unset(BIN_CONF)
      val expected = canon(naiveJoin(p, iv))
      assert(expected.nonEmpty, "fixture must produce matches")
      spark.conf.set(BIN_CONF, (6L * 3600 * 1000000).toString)
      val got = canon(naiveJoin(p, iv))
      assert(got == expected)
    } finally { spark.conf.unset(BIN_CONF); p.unpersist(); iv.unpersist() }
  }

  test("with the conf set, the plan is an equi-join, not nested-loop") {
    spark.conf.set(BIN_CONF, (6L * 3600 * 1000000).toString)
    try {
      val plan = naiveJoin(probes, intervals)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"),
        "range join must bucket to an equi-join:\n" + plan.take(800))
      assert(plan.contains("_graft_rb"),
        "bucket column expected in the plan:\n" + plan.take(800))
    } finally spark.conf.unset(BIN_CONF)
  }

  test("without the conf, the plan is untouched") {
    spark.conf.unset(BIN_CONF)
    val plan = naiveJoin(probes, intervals)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("_graft_rb"), plan.take(400))
  }

  test("strict bounds and flipped operand order still rewrite correctly") {
    val p = probes.cache(); val iv = intervals.cache()
    try {
      spark.conf.unset(BIN_CONF)
      val naive = p.join(iv, p("user_id") === iv("user_id") &&
          iv("lo") < p("ts_us") && iv("hi") > p("ts_us"))
        .select(p("event_id"), iv("iv_id"), iv("iv_n"))
      val expected = canon(naive)
      spark.conf.set(BIN_CONF, (3L * 3600 * 1000000).toString)
      val rewritten = p.join(iv, p("user_id") === iv("user_id") &&
          iv("lo") < p("ts_us") && iv("hi") > p("ts_us"))
        .select(p("event_id"), iv("iv_id"), iv("iv_n"))
      assert(rewritten.queryExecution.executedPlan.toString
        .contains("_graft_rb"), "flipped form must still match")
      assert(canon(rewritten) == expected)
    } finally { spark.conf.unset(BIN_CONF); p.unpersist(); iv.unpersist() }
  }

  test("inverted intervals (lo > hi) match nothing instead of crashing") {
    import spark.implicits._
    spark.conf.set(BIN_CONF, "10")
    try {
      val p = Seq((1L, 5L), (2L, 50L)).toDF("pid", "ts_us")
      // second interval is inverted and spans a bucket boundary — an
      // unguarded ascending Sequence(5, 0) would throw at runtime
      val iv = Seq((10L, 0L, 9L), (11L, 55L, 3L)).toDF("iv_id", "lo", "hi")
      val joined = p.join(iv, p("ts_us") >= iv("lo") && p("ts_us") <= iv("hi"))
        .select(p("pid"), iv("iv_id"))
      assert(joined.queryExecution.executedPlan.toString.contains("_graft_rb"))
      val got = joined.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == Set((1L, 10L)), s"got $got")
    } finally spark.conf.unset(BIN_CONF)
  }

  test("a bound on a different probe column earlier in the condition does not mask the pair") {
    import spark.implicits._
    spark.conf.set(BIN_CONF, "10")
    try {
      val p = Seq((1L, 5L, 100L)).toDF("pid", "other", "ts_us")
      val iv = Seq((10L, 1L, 95L, 105L)).toDF("iv_id", "x", "lo", "hi")
      // first conjunct bounds `other` (no matching upper) — the rule
      // must still find the (ts_us, lo, hi) pair after it
      val joined = p.join(iv, p("other") >= iv("x") &&
          p("ts_us") >= iv("lo") && p("ts_us") <= iv("hi"))
        .select(p("pid"), iv("iv_id"))
      assert(joined.queryExecution.executedPlan.toString.contains("_graft_rb"),
        "pair on ts_us must be found despite the leading unrelated bound")
      assert(joined.count() == 1)
    } finally spark.conf.unset(BIN_CONF)
  }

  test("open-ended (single-bound) joins are not rewritten") {
    spark.conf.set(BIN_CONF, (6L * 3600 * 1000000).toString)
    try {
      val p = probes; val iv = intervals
      val plan = p.join(iv, p("user_id") === iv("user_id") &&
          p("ts_us") >= iv("lo"))
        .select(p("event_id"), iv("iv_id"))
        .queryExecution.executedPlan.toString
      assert(!plan.contains("_graft_rb"),
        "no upper bound ⇒ no bucketing:\n" + plan.take(400))
    } finally spark.conf.unset(BIN_CONF)
  }
}
