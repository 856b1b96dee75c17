package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

/** The custom as-of physical operator ([[graft.plans.AsofMergeJoinExec]])
  * against the window-formulation semantics oracle and on hand-built
  * edge cases; plus the plan contract (one Exchange+Sort per side into
  * the merge node, streaming O(1) state).
  */
class AsofMergeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built: inclusive match, latest-prior wins, no-match nulls, key isolation") {
    val trades = Seq((1L, 10L, "t1"), (1L, 20L, "t2"), (1L, 5L, "t0"),
      (2L, 10L, "u1"), (3L, 10L, "v1")).toDF("k", "ts", "tid")
    val quotes = Seq((1L, 5L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
      (2L, 11L, 9.0)).toDF("k", "qts", "px")
    val out = TemporalJoins.asofJoinMerged(trades, quotes,
        "k", "ts", "qts", Seq("px"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSet
    assert(out == Set(
      (1L, 5L, "t0", Some(1.0)),   // equal ts ⇒ inclusive
      (1L, 10L, "t1", Some(2.0)),  // latest prior, not the first
      (1L, 20L, "t2", Some(3.0)),
      (2L, 10L, "u1", None),       // quote is later ⇒ no match
      (3L, 10L, "v1", None)),      // keyless group ⇒ null payload
      s"got $out")
  }

  test("matches the window-formulation asofJoin on real events (both payload orders)") {
    val ev = Tables.events(spark, sf)
    val probes = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val anchors = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("at"))
      .agg(max("value").as("v"), max("event_id").as("aid"))
    val merged = TemporalJoins.asofJoinMerged(probes, anchors,
      "user_id", "t", "at", Seq("v", "aid"))
    val window = TemporalJoins.asofJoin(probes, anchors,
      "user_id", "t", "at", Seq("v", "aid"))
    assert(merged.exceptAll(window).isEmpty && window.exceptAll(merged).isEmpty,
      "custom operator must equal the window formulation row-for-row")
    assert(merged.count() == probes.count(), "left-outer: one row per probe")
  }

  test("plan: custom exec node fed by one Exchange+Sort per side") {
    val ev = Tables.events(spark, sf)
    val probes = ev.select(col("user_id"), unix_micros(col("ts")).as("t"))
    val anchors = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("at"))
      .agg(max("value").as("v"))
    val df = TemporalJoins.asofJoinMerged(probes, anchors,
      "user_id", "t", "at", Seq("v"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==")(0)
    assert(p.contains("AsofMergeJoin"), p.take(800))
    assert(!p.contains("Window"), "no window state in the custom plan:\n" + p.take(800))
    // each side reaches the merge node through its (key, time) sort —
    // EnsureRequirements planned the distribution+ordering contract
    assert("Sort \\[user_id#\\d+L ASC NULLS FIRST, t#\\d+L ASC".r.findAllIn(p).nonEmpty
      && "Sort \\[user_id#\\d+L ASC NULLS FIRST, at#\\d+L ASC".r.findAllIn(p).nonEmpty,
      "both children must sort by (key, time):\n" + p.take(900))
  }

  test("result invariant under shuffle partition count (1 vs 7)") {
    val ev = Tables.events(spark, sf)
    val probes = ev.select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"))
    val anchors = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"), unix_micros(col("ts")).as("at"))
      .agg(max("value").as("v"))
    def run(parts: String): Set[String] = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try TemporalJoins.asofJoinMerged(probes, anchors, "user_id", "t", "at", Seq("v"))
        .collect().map(_.toString).toSet
      finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
    assert(run("1") == run("7"),
      "the merge must be partition-layout-independent")
  }

  test("payload name guard and empty-right behavior") {
    val l = Seq((1L, 10L, 5.0)).toDF("k", "ts", "v")
    val r = Seq((1L, 5L, 1.0)).toDF("k", "qts", "v")
    intercept[IllegalArgumentException] {
      TemporalJoins.asofJoinMerged(l, r, "k", "ts", "qts", Seq("v"))
    }
    val rEmpty = Seq.empty[(Long, Long, Double)].toDF("k", "qts", "px")
    val out = TemporalJoins.asofJoinMerged(l, rEmpty, "k", "ts", "qts", Seq("px"))
      .collect()
    assert(out.length == 1 && out(0).isNullAt(3),
      "empty right side ⇒ all-null payloads, rows preserved")
  }

  test("multi-key: composite (k1,k2) groups are isolated, hand-built") {
    // same k1, different k2 must NOT match — the composite is the group
    val l = Seq((1L, "a", 10L, "l1"), (1L, "b", 10L, "l2"),
      (2L, "a", 10L, "l3"), (1L, "a", 3L, "l4"))
      .toDF("k1", "k2", "ts", "lid")
    val r = Seq((1L, "a", 5L, 1.0), (1L, "b", 9L, 2.0), (2L, "b", 1L, 9.0))
      .toDF("k1", "k2", "qts", "px")
    val out = TemporalJoins.asofJoinMergedKeys(l, r, Seq("k1", "k2"),
        "ts", "qts", Seq("px"))
      .collect().map(row => (row.getString(3),
        if (row.isNullAt(4)) None else Some(row.getDouble(4)))).toSet
    assert(out == Set(
      ("l1", Some(1.0)),  // (1,a): latest prior in the composite group
      ("l2", Some(2.0)),  // (1,b): its own group's quote, not (1,a)'s
      ("l3", None),       // (2,a): (2,b)'s quote must not bleed over
      ("l4", None)),      // (1,a) before any quote
      s"got $out")
  }

  test("multi-key: equals the window form run per composite group on real events") {
    val ev = Tables.events(spark, sf)
    val probes = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("t"))
    val anchors = ev
      .groupBy(col("user_id"), col("event_type"), unix_micros(col("ts")).as("at"))
      .agg(max("value").as("v"))
    val multi = TemporalJoins.asofJoinMergedKeys(probes, anchors,
      Seq("user_id", "event_type"), "t", "at", Seq("v"))
    // semantics oracle: fuse the composite key into ONE column and run
    // the single-key window formulation — identical grouping by construction
    def fused(df: org.apache.spark.sql.DataFrame) = df.withColumn("_ck",
      concat_ws("|", col("user_id"), col("event_type")))
    val single = TemporalJoins.asofJoin(
      fused(probes).drop("user_id", "event_type"),
      fused(anchors).drop("user_id", "event_type"),
      "_ck", "t", "at", Seq("v"))
      .withColumn("user_id", split(col("_ck"), "\\|")(0).cast("long"))
      .withColumn("event_type", split(col("_ck"), "\\|")(1))
      .select("user_id", "event_type", "event_id", "t", "v")
    assert(multi.exceptAll(single).isEmpty && single.exceptAll(multi).isEmpty,
      "multi-key exec must equal the fused-key window formulation")
    assert(multi.count() == probes.count(), "left-outer: one row per probe")
  }

  test("null keys and null timestamps never match (SQL equi-join semantics)") {
    def L(v: Long): java.lang.Long = java.lang.Long.valueOf(v)
    val nl: java.lang.Long = null
    val l = Seq((nl, L(10L), "null-key"), (L(1L), nl, "null-ts"),
      (L(1L), L(10L), "real")).toDF("k", "ts", "lid")
    val r = Seq((nl, L(5L), 1.0), (L(1L), nl, 2.0), (L(1L), L(5L), 3.0))
      .toDF("k", "qts", "px")
    val out = TemporalJoins.asofJoinMerged(l, r, "k", "ts", "qts", Seq("px"))
      .collect().map(row => (row.getString(2),
        if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toSet
    assert(out == Set(
      ("null-key", None),      // NULL key matches nothing — not even NULL
      ("null-ts", None),       // NULL probe ts compares with nothing
      ("real", Some(3.0))),    // and the null-ts right row is never "earliest"
      s"got $out")
    // window formulation must agree (shared oracle contract)
    val win = TemporalJoins.asofJoin(l, r, "k", "ts", "qts", Seq("px"))
      .collect().map(row => (row.getString(2),
        if (row.isNullAt(3)) None else Some(row.getDouble(3)))).toSet
    assert(win == out, s"window form diverged: $win")
  }
}
