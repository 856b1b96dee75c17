package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator surface (SURVEY.md §2.3, rows Scan..Streaming-dedup).
  *
  * Every entry here is paired with DuckDB oracle SQL in [[RelationalQueries.oracle]];
  * the driver hash-compares both result sets (rows sorted, doubles rounded).
  * Conventions to keep the hash stable across engines:
  *   - every aggregate/computed column is explicitly aliased, same name in
  *     both the Spark plan and the SQL;
  *   - double aggregates are wrapped in round(x, 2) (float addition order
  *     differs between engines);
  *   - orderings that feed row_number/rank carry a unique tie-break key;
  *   - `events.ts` is ns in parquet: Spark side reads it via
  *     [[graft.Tables.events]] (µs truncation), DuckDB side casts
  *     `ts::TIMESTAMP` (same truncation).
  */
object RelationalQueries {
  private type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // ---- scan / project / filter -------------------------------------
    "q_scan_count" -> ((s, d) =>
      Tables.lineitem(s, d).agg(count(lit(1)).as("n"))),

    "q_project_compute" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_orderkey") < 1000)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (floor((col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100 + 0.5) / 100).as("rev"))),

    "q_filter_pred" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") < lit("1995-01-01").cast("timestamp")
          && col("l_discount").between(0.02, 0.04)
          && col("l_returnflag").isin("A", "R")
          && col("l_linestatus").startsWith("F"))
        .agg(count(lit(1)).as("n"), round(sum("l_extendedprice"), 2).as("sum_price"))),

    // ---- joins -------------------------------------------------------
    "q_join_inner_groupby" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))
    }),

    "q_join_left_null" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 5000)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .agg(count(lit(1)).as("n"), count(c("c_custkey")).as("n_matched"))
    }),

    "q_join_semi" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    }),

    "q_join_anti" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
    }),

    "q_join_right" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).filter(col("c_acctbal") < 0)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "right")
        .agg(count(lit(1)).as("n"), count(o("o_orderkey")).as("n_matched"))
    }),

    "q_join_full" -> ((s, d) => {
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 9000)
      val o = Tables.orders(s, d).filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "full")
        .agg(count(lit(1)).as("n"),
          sum(when(c("c_custkey").isNull, 1L).otherwise(0L)).as("n_right_only"),
          sum(when(o("o_custkey").isNull, 1L).otherwise(0L)).as("n_left_only"))
    }),

    "q_join_cross" -> ((s, d) =>
      Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .agg(count(lit(1)).as("n"))),

    // null-safe join equality (<=> / IS NOT DISTINCT FROM): nulls match
    // nulls — the semantics exact dedup and SCD lookups need; planned as
    // a hash join (null-safe keys hash like values), not a nested loop
    "q_join_nullsafe" -> ((s, d) => {
      val o = Tables.orders(s, d)
        .select(when(col("o_orderkey") % 7 === 0, null)
          .otherwise(col("o_custkey")).as("k"), col("o_totalprice"))
      val c = Tables.customer(s, d)
        .select(when(col("c_custkey") % 5 === 0, null)
          .otherwise(col("c_custkey")).as("k"), col("c_mktsegment"))
      o.join(c, o("k") <=> c("k"))
        .agg(count(lit(1)).as("n"),
          sum(when(o("k").isNull, 1L).otherwise(0L)).as("n_null_matches"))
    }),

    // shuffle-hash join hint: for a mid-size build side (too big to
    // broadcast, small enough to hash per partition) SHJ skips both
    // sort passes of the default sort-merge join — at 100 TB that is
    // the difference between 2 sorts of the fact table and none;
    // strategy pinned in PlanShapeSpec, result == the plain equi-join
    "q_join_shuffle_hash" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).hint("shuffle_hash")
      o.join(c, o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))
    }),

    // salted skew join: result multiset identical to the plain equi-join
    // (the oracle is the plain join) — salt only routes rows; plan shape
    // (both shuffles keyed on (key, salt)) pinned in SkewJoinSpec
    "q_join_salted" -> ((s, d) =>
      graft.ops.SkewJoins.saltedEquiJoin(
          Tables.orders(s, d), Tables.customer(s, d),
          "o_custkey", "c_custkey", salts = 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("rev"))),

    // Bloom-filter join pruning — the runtime-filter pattern Spark's own
    // InjectRuntimeFilter applies, done explicitly: build a Bloom filter
    // over the SMALL side's join keys (distributed partial sketches,
    // merged driver-side into KBs), broadcast it, and pre-filter the BIG
    // side's scan before the exact semi-join. False positives pass the
    // Bloom probe but die in the exact join, so the result is
    // bit-identical to the plain semi-join — which is the oracle. At
    // 100 TB the payoff is the shuffle that never happens: non-matching
    // lineitem rows are dropped at the scan, not after the exchange.
    "q_bloom_prune" -> ((s, d) => {
      val ok = Tables.orders(s, d)
        .filter(col("o_totalprice") > 300000).select("o_orderkey")
      val nKeys = math.max(1000L, ok.count())
      val bf = ok.stat.bloomFilter("o_orderkey", nKeys, 0.01)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((k: Long) => bfB.value.mightContain(k))
      Tables.lineitem(s, d)
        .filter(mightContain(col("l_orderkey")))
        .join(ok, col("l_orderkey") === col("o_orderkey"), "left_semi")
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          round(sum("l_extendedprice"), 2).as("rev"))
        .orderBy("l_returnflag")
    }),

    "q_join_multiway" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          count(lit(1)).as("n"))
    }),

    // TPC-H Q5 shape: 6-way join with a region filter that prunes through
    // two join levels. The fact table STREAMS through broadcast probes —
    // it is never a build side and never shuffles for a join — and the
    // first probe is the ASIA-pruned supplier (supplier ⋈ nation ⋈
    // region, ~0.04% of the dataset at any TPC-H SF), so lineitem
    // shrinks 5× before the orders/customer probes. The asiaSu broadcast
    // is an explicit hint for two reasons: it is the scale-correct
    // choice (a dimension pruned by a 1-of-5 region filter), and the
    // static planner otherwise misestimates column-pruned lineitem
    // (4 of 16 cols of a 10 MB file) under the broadcast threshold and
    // builds a hash table from the 600k-row FACT side (observed r9: a
    // 0.95 s → 1.5 s regression from that one flipped build side).
    "q_join_tpch_q5" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp")
          && col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
      val asiaSu = Tables.supplier(s, d)
        .join(broadcast(n.join(broadcast(r),
            n("n_regionkey") === r("r_regionkey")).select("n_nationkey", "n_name")),
          col("s_nationkey") === col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
      li.join(broadcast(asiaSu), li("l_suppkey") === asiaSu("s_suppkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(c, o("o_custkey") === c("c_custkey")
          && asiaSu("s_nationkey") === c("c_nationkey"))
        .groupBy("n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
    }),

    // as-of join: each purchase matched to the user's latest prior click
    // (graft.ops.TemporalJoins.asofJoin — union + one sort, merge-join
    // shape; right side pre-aggregated unique per (user, ts) for
    // determinism). DuckDB twin: native ASOF LEFT JOIN.
    "q_join_asof" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("rus"), col("event_id"))
        .groupBy("user_id", "rus").agg(max("event_id").as("click_id"))
      graft.ops.TemporalJoins.asofJoin(purchases, clicks,
          key = "user_id", leftTs = "us", rightTs = "rus",
          payload = Seq("click_id", "rus"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("us") - col("rus")).as("gap_us"))
    }),

    // the same as-of join on the CUSTOM physical operator
    // (plans/AsofMergeJoinExec: own LogicalPlan node + Strategy +
    // streaming merge-scan SparkPlan, O(1) state per partition) —
    // identical result multiset by contract, so it shares q_join_asof's
    // DuckDB ASOF JOIN oracle
    "q_join_asof_exec" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("rus"), col("event_id"))
        .groupBy("user_id", "rus").agg(max("event_id").as("click_id"))
      graft.ops.TemporalJoins.asofJoinMerged(purchases, clicks,
          key = "user_id", leftTs = "us", rightTs = "rus",
          payload = Seq("click_id", "rus"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("us") - col("rus")).as("gap_us"))
    }),

    // MULTI-key as-of through the custom operator: the as-of group is the
    // COMPOSITE (user_id, event_type) — same user, different type must
    // NOT match. Probes are odd event_ids, anchors even, so the match is
    // non-degenerate (a probe is never its own anchor). AsofMergeJoinExec
    // is Seq-keyed end to end (clustered distribution + (k1,k2,ts) sort +
    // composite-row merge compare); DuckDB twin: native multi-key
    // ASOF LEFT JOIN.
    "q_join_asof_multi" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probes = ev.filter(col("event_id") % 2 === 1)
        .select(col("event_id"), col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("us"))
      val anchors = ev.filter(col("event_id") % 2 === 0)
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("rus"), col("event_id"))
        .groupBy("user_id", "event_type", "rus")
        .agg(max("event_id").as("anchor_id"))
      graft.ops.TemporalJoins.asofJoinMergedKeys(probes, anchors,
          keys = Seq("user_id", "event_type"), leftTs = "us", rightTs = "rus",
          payload = Seq("anchor_id", "rus"))
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("anchor_id"), (col("us") - col("rus")).as("gap_us"))
    }),

    // interval-range join: events falling inside [purchase, purchase+30m]
    // windows of the same user (graft.ops.TemporalJoins.rangeJoin —
    // bucketed equi-join, each pair produced exactly once, never the
    // O(n·m) inequality join). DuckDB twin: plain inequality join.
    "q_join_range" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val probe = ev.select(col("event_id"), col("event_type"),
        col("user_id"), unix_micros(col("ts")).as("us"))
      val intervals = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(1800L * 1000000L)).as("w_end"),
          col("event_id").as("purchase_id"))
      graft.ops.TemporalJoins.rangeJoin(probe, "us", intervals,
          "w_start", "w_end", key = "user_id",
          bucketWidth = 1800L * 1000000L, payload = Seq("purchase_id"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("event_id")).as("n_events"),
          count_distinct(col("purchase_id")).as("n_windows"))
    }),

    // SQL PIVOT clause (the parser surface, distinct from the
    // DataFrame .pivot() API q_pivot covers): event counts per day
    // rotated into one column per type. DuckDB twin: CASE sums
    "q_sql_pivot" -> ((s, d) => {
      Tables.events(s, d).createOrReplaceTempView("graft_ev_pivot")
      s.sql("""
        |SELECT day, coalesce(n_click, 0L) AS n_click,
        |  coalesce(n_view, 0L) AS n_view, coalesce(n_buy, 0L) AS n_buy
        |FROM (
        |  SELECT to_date(ts) AS day, event_type FROM graft_ev_pivot)
        |PIVOT (count(*) FOR event_type IN
        |  ('click' AS n_click, 'view' AS n_view, 'purchase' AS n_buy))
        |ORDER BY day""".stripMargin)
    }),

    // SQL LATERAL correlated subquery (the top-1-per-group idiom SQL
    // users write; Spark plans the correlation as a join, not a
    // per-row re-execution): each region's single highest-balance
    // customer via a LATERAL ORDER BY ... LIMIT 1
    "q_sql_lateral" -> ((s, d) => {
      Tables.nation(s, d).createOrReplaceTempView("graft_nat_lat")
      Tables.customer(s, d).createOrReplaceTempView("graft_cust_lat")
      s.sql("""
        |SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS bal
        |FROM graft_nat_lat n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM graft_cust_lat c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
        |ORDER BY n.n_name""".stripMargin)
    }),

    // share-of-total (ratio_to_report): each nation's revenue share
    // within its region — windowed sum-over-partition division, the
    // report idiom behind every "% of segment" column. One join + one
    // region-keyed window over the |nations|-row aggregate
    "q_share_of_total" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "n_name")
        .agg(sum("o_totalprice").as("rev"))
      rev.withColumn("share",
          round(col("rev") / sum("rev").over(
            Window.partitionBy("n_regionkey")), 4))
        .select(col("n_regionkey"), col("n_name"),
          round(col("rev"), 2).as("rev"), col("share"))
        .orderBy("n_regionkey", "n_name")
    }),

    // forward as-of join: for each purchase, the EARLIEST click at or
    // after it — [[graft.ops.TemporalJoins.asofJoin]] on NEGATED
    // timestamps (latest −t_r ≤ −t_l ⟺ earliest t_r ≥ t_l), so the
    // merge-shaped union+sort+running-last plan is reused unchanged.
    // Twin: plain correlated min in DuckDB.
    "q_join_asof_fwd" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"),
          (-unix_micros(col("ts"))).as("nus"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), (-unix_micros(col("ts"))).as("nrus"),
          col("event_id"))
        .groupBy("user_id", "nrus").agg(max("event_id").as("click_id"))
      graft.ops.TemporalJoins.asofJoin(purchases, clicks,
          key = "user_id", leftTs = "nus", rightTs = "nrus",
          payload = Seq("click_id", "nrus"))
        .select(col("event_id"), col("user_id"), col("click_id"),
          (col("nus") - col("nrus")).as("gap_us"))
    }),

    // winsorization: clip the fact measure at per-group exact p05/p95
    // — the robust-stats step before any mean-based model feature. Two
    // passes: a |groups|-row percentile table broadcast back over the
    // fact stream (same shape as q_outlier_zscore); the fact side is
    // never shuffled
    "q_winsorize" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cuts = li.groupBy("l_returnflag")
        .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))")
          .as("p"))
        .select(col("l_returnflag"), col("p")(0).as("lo"),
          col("p")(1).as("hi"))
      li.join(broadcast(cuts), Seq("l_returnflag"))
        .withColumn("clipped",
          greatest(least(col("l_extendedprice"), col("hi")), col("lo")))
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"),
          sum(when(col("l_extendedprice") < col("lo"), 1L)
            .when(col("l_extendedprice") > col("hi"), 1L)
            .otherwise(0L)).as("n_clipped"),
          round(sum("clipped"), 2).as("sum_clip"),
          round(avg("clipped"), 4).as("avg_clip"))
        .orderBy("l_returnflag")
    }),

    // Benford first-digit audit (the classic fabricated-numbers test):
    // leading digit extracted from the EXACT cent integer's decimal
    // string — engine-stable, no log10 boundary risk — then observed
    // vs log10(1+1/d) expected frequencies with per-digit chi-square
    // contributions. One map-side-combined pass
    "q_benford" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val cents = floor(col("l_extendedprice") * 100 + 0.5).cast("long")
      val digit = substring(cents.cast("string"), 1, 1).cast("int")
      val byDigit = li.filter(col("l_extendedprice") > 0)
        .withColumn("digit", digit)
        .groupBy("digit").agg(count(lit(1)).as("n"))
      val total = byDigit.agg(sum("n").cast("double").as("tot"))
      byDigit.crossJoin(broadcast(total))
        .select(col("digit"), col("n"),
          round(col("n") / col("tot"), 4).as("obs_freq"),
          round(log(10.0, lit(1.0) + lit(1.0) / col("digit")), 4)
            .as("benford_freq"),
          round(pow(col("n") / col("tot") -
              log(10.0, lit(1.0) + lit(1.0) / col("digit")), 2) /
            log(10.0, lit(1.0) + lit(1.0) / col("digit")) *
            col("tot"), 2).as("chi2_part"))
        .orderBy("digit")
    }),

    // interval×interval overlap join: per-user activity SESSIONS
    // (6-hour-gap islands over view/click/purchase) against per-user
    // error impact WINDOWS (each error event padded ±2 h) — "which
    // sessions ran while things were failing for that user". Executed
    // by [[graft.ops.TemporalJoins.intervalOverlapJoin]]: both interval
    // sets explode to 6-hour buckets and meet on a (user, bucket)
    // equi-join; each pair fires exactly once (overlap-left-edge
    // bucket rule) — never the per-key O(n·m) inequality join the
    // DuckDB twin runs.
    "q_join_interval_overlap" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val shop = ev
        .filter(col("event_type").isin("view", "click", "purchase"))
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("us", 1).over(w))
        .withColumn("new_s", when(col("prev").isNull ||
          col("us") - col("prev") > 21600L * 1000000L, 1L).otherwise(0L))
        .withColumn("sid", sum("new_s").over(wc))
        .groupBy("user_id", "sid")
        .agg(min("us").as("ls"), max("us").as("le"))
        .drop("sid")
      val impact = ev.filter(col("event_type") === "error")
        .select(col("user_id"),
          (unix_micros(col("ts")) - 7200L * 1000000L).as("rs"),
          (unix_micros(col("ts")) + 7200L * 1000000L).as("re"))
      graft.ops.TemporalJoins.intervalOverlapJoin(
          shop, "ls", "le", impact, "rs", "re",
          key = "user_id", bucketWidth = 21600L * 1000000L,
          payload = Seq.empty)
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_overlaps"),
          round(sum(least(col("le"), col("re")) -
            greatest(col("ls"), col("rs"))) / 1e6, 2).as("overlap_s"))
        .orderBy("user_id")
    }),

    // same semantics as q_join_range, but written as the NAIVE
    // inequality join — [[graft.plans.RangeJoinRule]] (injected via
    // SparkSessionExtensions) rewrites it to the bucketed equi-join
    // inside the optimizer, so the user-facing syntax is the simple
    // BETWEEN while the plan is the scale-correct one (asserted in
    // RangeJoinRuleSpec; result oracled against DuckDB's own
    // inequality join). The conf is the bin width in the probe
    // column's unit and stays set session-wide; that is safe here
    // because the rewrite is semantics-preserving AND no other registry
    // query carries two LongType bounds in a JOIN condition (the
    // explicit q_join_range keeps its BETWEEN in a post-join Filter),
    // so no other plan even matches the rule's pattern.
    "q_join_range_auto" -> ((s, d) => {
      s.conf.set(graft.plans.RangeJoinRule.BIN_CONF,
        (1800L * 1000000L).toString)
      val ev = Tables.events(s, d)
      val probe = ev.select(col("event_id"), col("event_type"),
        col("user_id"), unix_micros(col("ts")).as("us"))
      val iv = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("iv_uid"),
          unix_micros(col("ts")).as("w_start"),
          (unix_micros(col("ts")) + lit(1800L * 1000000L)).as("w_end"),
          col("event_id").as("purchase_id"))
      probe.join(iv, probe("user_id") === iv("iv_uid") &&
          probe("us") >= iv("w_start") && probe("us") <= iv("w_end"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"),
          count_distinct(col("event_id")).as("n_events"),
          count_distinct(col("purchase_id")).as("n_windows"))
    }),

    // ---- aggregation -------------------------------------------------
    "q_agg_tpch_q1" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          round(sum("l_quantity"), 2).as("sum_qty"),
          round(sum("l_extendedprice"), 2).as("sum_base"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          count(lit(1)).as("n"))),

    "q_agg_distinct" -> ((s, d) =>
      Tables.events(s, d).agg(
        count_distinct(col("user_id")).as("u"),
        count_distinct(col("event_type")).as("et"),
        count(lit(1)).as("n"))),

    "q_agg_rollup" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), round(sum("l_quantity"), 2).as("qty"))),

    "q_agg_cube" -> ((s, d) =>
      Tables.customer(s, d)
        .cube("c_mktsegment", "c_nationkey")
        .agg(count(lit(1)).as("n"), round(sum("c_acctbal"), 2).as("bal"))),

    "q_agg_grouping_sets" -> ((s, d) =>
      Tables.orders(s, d)
        .groupingSets(
          Seq(Seq(col("o_orderpriority")), Seq(col("o_orderstatus"))),
          col("o_orderpriority"), col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("total"))),

    "q_agg_collect" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(
          // Arrays are serialized to strings so the driver harness can
          // sort/hash the output (pandas can't canonicalize ndarray cells).
          array_join(sort_array(collect_list(col("n_name"))), "|").as("names"),
          array_join(sort_array(collect_set(col("n_nationkey"))).cast("array<string>"), "|").as("keys"))),

    "q_agg_stats" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          // interpolated quantiles land on exact .xx5 midpoints ((a+b)/2
          // of 2-decimal prices) where Spark's and DuckDB's round()
          // disagree — sf0.001 flipped med_price by a cent (r11); the
          // floor-based half-up round is engine-identical (values > 0)
          (floor(median(col("l_extendedprice")) * 100 + 0.5) / 100).as("med_price"),
          (floor(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)") * 100 + 0.5) / 100).as("p90_qty"),
          round(stddev_samp(col("l_extendedprice")), 2).as("sd_price"),
          round(var_samp(col("l_discount")), 6).as("var_disc"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("cov_qp"))),

    "q_agg_argminmax" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderstatus")
        .agg(
          max_by(col("o_orderpriority"), col("o_orderkey")).as("last_prio"),
          min_by(col("o_orderpriority"), col("o_orderkey")).as("first_prio"),
          max("o_orderkey").as("max_key"))),

    // conditional aggregation (SQL FILTER clause): one pass over the fact
    // table computing disjoint sliced aggregates — the idiomatic
    // replacement for N self-joins
    "q_agg_filter" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          count(when(col("l_discount") > 0.05, 1)).as("n_highdisc"),
          count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
          round(sum(when(col("l_quantity") < 10, col("l_extendedprice"))
            .otherwise(lit(0.0))), 2).as("small_rev"),
          count(lit(1)).as("n"))),

    // ordered string aggregation (listagg / string_agg with ORDER BY) —
    // deterministic via the unique order key; portable
    // array_sort(collect_list(struct)) form, one shuffle
    "q_agg_listagg" -> ((s, d) =>
      Tables.nation(s, d)
        .groupBy("n_regionkey")
        .agg(concat_ws(",",
          transform(array_sort(collect_list(struct(col("n_nationkey"),
            col("n_name")))), p => p("n_name"))).as("names"))),

    // Equi-width histogram via portable floor arithmetic (DuckDB has no
    // width_bucket); bucket boundaries integer-exact, so engine-stable.
    // One map-side-combined shuffle of ≤ |buckets| keys at any scale.
    "q_agg_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(floor(col("l_extendedprice") / 5000).cast("long").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"))),

    // Quantile sketch with its exact twin (the q_approx_hll pattern): the
    // GK sketch (percentile_approx) is not bit-comparable across engines,
    // so the oracled columns are the exact quartiles plus `approx_ok` —
    // Spark evaluates the real sketch at accuracy 10000 (rank error
    // ≤ n/10000, well under one quantity step) and asserts its median
    // lands within one unit of exact; the oracle's twin column is literal
    // TRUE. Quartiles are %.4f-formatted strings: l_quantity is
    // integer-valued, so interpolated quarters are exactly representable
    // and the formatting is engine-stable.
    "q_approx_quantile" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, array(0.25D, 0.5D, 0.75D))").as("_qs"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(10000)).as("_approx"),
          expr("percentile(l_quantity, 0.5D)").as("_med"),
          count(lit(1)).as("n"))
        .select(col("l_returnflag"),
          array_join(transform(col("_qs"),
            x => format_string("%.4f", x)), "|").as("quartiles"),
          (abs(col("_approx") - col("_med")) <= lit(1.0)).as("approx_ok"),
          col("n"))),

    // ---- window functions --------------------------------------------
    "q_window_rownum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), row_number().over(w).as("rn"))
    }),

    "q_window_lag_lead" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      Tables.events(s, d).select(
        col("event_id"),
        round(col("value") - lag("value", 1).over(w), 2).as("delta_prev"),
        round(lead("value", 1).over(w) - col("value"), 2).as("delta_next"))
    }),

    "q_window_moving_sum" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(-2, Window.currentRow)
      Tables.events(s, d).select(
        col("event_id"), round(sum("value").over(w), 2).as("mv3"))
    }),

    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .filter(col("rnk") <= 20)
    }),

    "q_window_range_frame" -> ((s, d) => {
      // RANGE frame over event-time micros: all events in the trailing
      // 5 minutes — deterministic under ts ties (frame is value-based).
      val w = Window.partitionBy("user_id").orderBy(col("us"))
        .rangeBetween(-300L * 1000000L, Window.currentRow)
      Tables.events(s, d)
        .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
          col("value"))
        .select(col("event_id"),
          count(lit(1)).over(w).as("n_5m"),
          round(sum("value").over(w), 2).as("sum_5m"))
    }),

    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 4).as("pr"),
          round(cume_dist().over(w), 4).as("cd"))
        .filter(col("o_orderkey") < 2000)
    }),

    // navigation window fns: first/last/nth over an explicit running
    // frame (last_value needs the full ordering + frame to be
    // deterministic — both engines default RANGE UNBOUNDED PRECEDING..
    // CURRENT ROW, pinned explicitly here)
    "q_window_first_last" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      Tables.orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          first(col("o_totalprice")).over(w).as("first_price"),
          last(col("o_totalprice")).over(w).as("running_last"),
          nth_value(col("o_totalprice"), 3).over(w).as("third_price"))
        .filter(col("o_orderkey") < 1000)
    }),

    // ---- sort / limit / top-k ----------------------------------------
    "q_sort_limit" -> ((s, d) =>
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")),

    "q_topk_pergroup" -> ((s, d) => {
      val w = Window.partitionBy("c_nationkey")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      Tables.customer(s, d)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          row_number().over(w).as("rn"))
        .filter(col("rn") <= 3)
    }),

    // ---- pivot / conditional / null handling / subquery --------------
    "q_pivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .pivot("l_returnflag", Seq("A", "N", "R"))
        .agg(round(sum("l_quantity"), 2))),

    // unpivot — the inverse reshaping of q_pivot (wide metric columns →
    // long (metric, value) rows), aggregated so the oracle is stable
    "q_unpivot" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select("l_quantity", "l_extendedprice", "l_discount")
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
          "metric", "val")
        .groupBy("metric")
        .agg(round(sum("val"), 2).as("s"), count(lit(1)).as("n"))),

    "q_case_expr" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(
          when(col("o_totalprice") < 50000, "small")
            .when(col("o_totalprice") < 150000, "medium")
            .when(col("o_totalprice") < 300000, "large")
            .otherwise("jumbo").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg("o_totalprice"), 2).as("avg_price"))),

    "q_null_fns" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val c = Tables.customer(s, d).filter(col("c_acctbal") > 7500)
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left")
        .agg(
          count(lit(1)).as("n"),
          sum(when(c("c_name").isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(coalesce(c("c_mktsegment"), lit("UNMATCHED"))).as("n_seg"),
          round(sum(coalesce(c("c_acctbal"), lit(0.0))), 2).as("bal"),
          sum(when(nullif(c("c_nationkey"), lit(0)).isNull, 1L).otherwise(0L)).as("n_zero_or_null"))
    }),

    "q_scalar_subquery" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val avgPrice = o.agg(avg("o_totalprice").as("ap"))
      o.join(broadcast(avgPrice))
        .filter(col("o_totalprice") > col("ap"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), round(min("o_totalprice"), 2).as("min_above"))
    }),

    // post-aggregation predicate (HAVING; TPC-H Q18 inner shape) —
    // l_quantity is integer-valued so the 150 threshold is exact on
    // both engines
    "q_having" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(round(sum("l_quantity"), 2).as("sum_qty"))
        .filter(col("sum_qty") > 150)
        .agg(count(lit(1)).as("n_big"), round(max("sum_qty"), 2).as("max_qty"))),

    // TPC-H Q3 (shipping-priority) through the SQL entry point: parser →
    // Catalyst decides join order/strategy; ORDER BY the ROUNDED revenue
    // with a key tie-break so the LIMIT cut is engine-stable
    "q_sql_tpch_q3" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""SELECT l_orderkey,
              | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              | o_orderdate
              |FROM g_customer, g_orders, g_lineitem
              |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
              |  AND l_orderkey = o_orderkey
              |  AND o_orderdate < TIMESTAMP '1995-03-15'
              |  AND l_shipdate > TIMESTAMP '1995-03-15'
              |GROUP BY l_orderkey, o_orderdate
              |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin)
    }),

    // correlated EXISTS / NOT EXISTS through the SQL entry point —
    // Catalyst decorrelates both into a semi + anti join
    // (RewritePredicateSubquery), so the correlated probe never
    // re-executes per outer row; the oracle runs the identical SQL
    "q_subquery_exists" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_mktsegment, count(*) AS n
              |FROM g_customer c
              |WHERE EXISTS (SELECT 1 FROM g_orders o
              |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
              |  AND NOT EXISTS (SELECT 1 FROM g_orders o2
              |   WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
              |GROUP BY c_mktsegment""".stripMargin)
    }),

    // IN / NOT IN subqueries (semi join; null-aware anti join) — keys are
    // non-null so NOT IN's three-valued-logic trap doesn't bite
    "q_subquery_in" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""SELECT o_orderpriority, count(*) AS n
              |FROM g_orders
              |WHERE o_custkey IN (SELECT c_custkey FROM g_customer
              |                    WHERE c_acctbal > 8000)
              |  AND o_orderkey NOT IN (SELECT l_orderkey FROM g_lineitem
              |                         WHERE l_quantity > 49)
              |GROUP BY o_orderpriority""".stripMargin)
    }),

    // lateral view / table-generating function: one row per split token
    // (generator stays inside whole-stage codegen — no UDTF overhead)
    "q_lateral_view" -> ((s, d) =>
      Tables.part(s, d)
        .select(col("p_retailprice"),
          explode(split(col("p_name"), " ")).as("word"))
        .groupBy("word")
        .agg(count(lit(1)).as("n"),
          round(avg("p_retailprice"), 2).as("avg_price"))),

    // ---- set operations ----------------------------------------------
    "q_set_distinct" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("k")).distinct()),

    "q_set_intersect" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .intersect(Tables.orders(s, d).select(col("o_custkey").as("k")))),

    "q_set_except" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .except(Tables.orders(s, d).select(col("o_custkey").as("k")))),

    "q_set_intersect_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))),

    "q_set_except_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_nationkey").as("k"))
        .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("k")))
        .groupBy("k").agg(count(lit(1)).as("n"))),

    "q_set_union_all" -> ((s, d) =>
      Tables.customer(s, d).select(col("c_custkey").as("k"))
        .union(Tables.orders(s, d).select(col("o_custkey").as("k")))
        .agg(count(lit(1)).as("n"), count_distinct(col("k")).as("nd"))),

    // ---- scalar function families ------------------------------------
    "q_string_fns" -> ((s, d) =>
      Tables.part(s, d)
        .filter(col("p_type").like("%O%"))
        .groupBy(
          upper(substring(col("p_name"), 1, 4)).as("pfx"),
          regexp_extract(col("p_type"), "(\\w+)$", 1).as("lastw"))
        .agg(count(lit(1)).as("n"),
          round(sum("p_retailprice"), 2).as("price"),
          sum(length(col("p_name"))).as("chars"))),

    // bitwise function family: AND/OR/XOR masks, shifts, popcount —
    // the flag-column algebra of every bitmap/permission/feature-flag
    // schema. All pure codegen'd integer ops; one groupBy shuffle.
    "q_bitwise_fns" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .agg(
          sum(bit_count(col("o_orderkey").bitwiseXOR(col("o_custkey"))))
            .as("xor_bits"),
          sum((col("o_orderkey").bitwiseAND(lit(255))) +
            (col("o_custkey").bitwiseOR(lit(16)))).as("mask_sum"),
          sum(shiftright(shiftleft(col("o_orderkey"), 2), 1))
            .as("shift_sum"))
        .orderBy("o_orderpriority")),

    // binary/encoding function family: sha256 digests, hex, base64 —
    // content-addressing primitives (dedup keys, cache keys, payload
    // transport). hex case differs across engines → lower() on both.
    "q_binary_fns" -> ((s, d) =>
      Tables.documents(s, d)
        .groupBy("lang")
        .agg(
          count_distinct(sha2(col("text"), 256)).as("n_sha"),
          min(lower(hex(substring(col("text"), 1, 4)))).as("first_hex"),
          min(base64(substring(col("text"), 1, 6).cast("binary")))
            .as("first_b64"))
        .orderBy("lang")),

    // regex function family: extract-all, first-group extract, global
    // replace, and match-test in one pass (patterns restricted to the
    // RE2/Java-common subset so the DuckDB twin is exact; replaced text
    // compared by md5 to keep the result compact)
    "q_regexp_fns" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 25)
        .select(col("doc_id"),
          size(regexp_extract_all(col("text"), lit("ta[a-z]+"), lit(0))).as("n_ta"),
          regexp_extract(col("text"), "(sc[a-z]+)", 1).as("first_sc"),
          md5(regexp_replace(col("text"), "table", "TBL")).as("replaced_md5"),
          col("text").rlike("slow [a-z]+ fast").as("has_pat"))),

    "q_date_fns" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy(
          trunc(col("o_orderdate").cast("date"), "month").as("m"),
          year(col("o_orderdate")).as("y"))
        .agg(count(lit(1)).as("n"),
          max(datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))).as("max_dd"))),

    "q_math_fns" -> ((s, d) =>
      Tables.lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1994-01-01").cast("timestamp")
          && col("l_shipdate") < lit("1995-01-01").cast("timestamp")
          && col("l_discount").between(0.02, 0.06)
          && col("l_quantity") < 24)
        .agg(
          round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue"),
          round(sum(log(col("l_quantity") + 1)), 2).as("sum_ln"),
          round(sum(pow(col("l_discount"), 2)), 4).as("sum_pow"),
          round(sum(ceil(col("l_quantity"))), 2).as("sum_ceil"),
          round(sum(floor(col("l_quantity"))), 2).as("sum_floor"),
          round(sum(abs(col("l_tax") - 0.04)), 2).as("sum_abs"))),

    "q_array_fns" -> ((s, d) =>
      Tables.embeddings(s, d)
        .groupBy("label")
        .agg(
          count(lit(1)).as("n"),
          min(size(col("embedding"))).as("dim"),
          round(sum(element_at(col("embedding"), 1).cast("double")), 2).as("sum_e1"),
          sum(when(element_at(col("embedding"), 1) > 0f, 1L).otherwise(0L)).as("n_pos"))),

    "q_map_fns" -> ((s, d) => {
      val c = Tables.events(s, d).filter(col("user_id") < 50)
        .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      c.groupBy("user_id")
        .agg(map_from_entries(sort_array(collect_list(
          struct(col("event_type"), col("n"))))).as("m"))
        .select(col("user_id"),
          size(col("m")).as("n_keys"),
          // stringified for driver-harness hashability (see q_agg_collect)
          array_join(sort_array(map_keys(col("m"))), "|").as("keys"),
          array_join(sort_array(map_values(col("m"))).cast("array<string>"), "|").as("counts"))
    }),

    "q_json_fns" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("k").as("sum_k"),
          sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_gt50"))),

    // malformed-JSON tolerance: a tenth of the payloads truncated to
    // invalid JSON on both engines; the parse must degrade to null (and
    // be counted), never fail the pipeline — the ingest-reality twin of
    // q_json_fns
    "q_json_malformed" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("_raw", when(col("event_id") % 10 === 0,
          expr("substr(props, 1, length(props) - 2)")).otherwise(col("props")))
        .select(col("event_type"),
          get_json_object(col("_raw"), "$.k").cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(col("k").isNull, 1L).otherwise(0L)).as("n_bad"),
          sum(coalesce(col("k"), lit(0L))).as("sum_k"))),

    // semi-structured VARIANT path (Spark 4): parse once into the binary
    // variant encoding, then typed variant_get extraction — the
    // schema-on-read answer for ragged JSON at scale (one parse per row,
    // no per-field re-parse like chained get_json_object; the oracle twin
    // is DuckDB's JSON extraction, same values)
    "q_json_variant" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_type"),
          variant_get(parse_json(col("props")), "$.k", "int").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n_k"), sum("k").as("sum_k"),
          min("k").as("min_k"), max("k").as("max_k"))),

    // multi-CTE query through the SQL entry point (WITH-chain of filter →
    // grouped agg → final rollup; CTEs inline into one Catalyst plan)
    "q_sql_cte" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""WITH big AS (
              |  SELECT o_custkey, o_totalprice FROM g_orders
              |  WHERE o_totalprice > 200000),
              | agg AS (
              |  SELECT o_custkey, count(*) AS n,
              |    round(sum(o_totalprice), 2) AS rev
              |  FROM big GROUP BY o_custkey)
              |SELECT count(*) AS n_cust, round(sum(rev), 2) AS total_rev,
              |  max(n) AS max_orders
              |FROM agg""".stripMargin)
    }),

    // ---- event-time buckets (batch equivalents of streaming windows) --
    "q_time_bucket" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").getField("start").as("h"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))),

    // sliding event-time window, batch twin (width 1 h, slide 30 min:
    // every event lands in exactly 2 windows — the DuckDB twin unnests
    // the two 30-min-aligned starts; epoch alignment matches Spark's)
    "q_window_sliding" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes")
          .getField("start").as("win_start"))
        .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("sum_v"))),

    "q_sessionize" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
      val wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val sess = Tables.events(s, d)
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .withColumn("prev", lag("us", 1).over(w))
        .withColumn("new_sess",
          when(col("prev").isNull || col("us") - col("prev") > 1800L * 1000000L, 1L).otherwise(0L))
        .withColumn("sess_id", sum("new_sess").over(wcum))
      sess.groupBy("user_id", "sess_id").agg(count(lit(1)).as("sess_n"))
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_sessions"), max("sess_n").as("max_sess_events"))
    }),

    "q_dedup_exact" -> ((s, d) =>
      Tables.events(s, d).agg(
        count_distinct(col("event_id")).as("n_ids"),
        count_distinct(col("user_id"), col("event_type")).as("n_user_type"))),

    // boolean + bitwise aggregate family (every/any, bit_and/or/xor) —
    // all partial-aggregable, so map-side combine keeps the shuffle at
    // |groups| rows at any scale
    "q_agg_bool_bit" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_linestatus")
        .agg(
          bool_and(col("l_quantity") < 50).as("all_small"),
          bool_or(col("l_discount") > 0.09).as("any_highdisc"),
          bit_and(col("l_linenumber")).as("band"),
          bit_or(col("l_linenumber")).as("bor"),
          bit_xor(col("l_linenumber")).as("bxor"),
          count(lit(1)).as("n"))),

    // time-series gap fill: zero-fill missing hours on a generated
    // event-time grid, forward-fill the last observed hourly average
    // (hour(ts)=3 dropped on both engines so the gap path is exercised).
    // The grid is hours-between-min-and-max — tiny at any corpus size —
    // so the single-partition window over it is safe at 100 TB; the only
    // full-data pass is the map-side-combined hourly aggregate.
    "q_gap_fill" -> ((s, d) => {
      val hourly = Tables.events(s, d)
        .filter(hour(col("ts")) =!= 3)
        .groupBy(date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("n_obs"))
      val grid = hourly
        .agg(min("hour").as("lo"), max("hour").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 hour"))).as("hour"))
      val w = Window.orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      // forward fill carries the last OBSERVED hour's count (integer —
      // exactly engine-stable; a carried avg can land on a .xx5 rounding
      // boundary and flip the 2dp hash between engines)
      grid.join(hourly, Seq("hour"), "left")
        .select(col("hour"),
          coalesce(col("n_obs"), lit(0L)).as("n"),
          last(col("n_obs"), ignoreNulls = true).over(w).as("ff_n"))
    }),

    // linear interpolation over the densified per-type hourly grid
    // ([[graft.ops.TimeSeries.interpolateLinear]]): hour 3 is dropped to
    // manufacture gaps, then each hole takes the time-weighted value
    // between its nearest observed neighbors. Windows keyed by
    // event_type — the fill parallelizes across keys; the raw events
    // shuffle once into |types|·|hours| buckets
    "q_interpolate" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .filter(hour(col("ts")) =!= 3)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("v"))
      graft.ops.TimeSeries.interpolateLinear(hb, "event_type", "hour",
          "v", "interval 1 hour")
        .select(col("event_type"), col("hour"),
          round(col("filled"), 4).as("v_fill"), col("was_gap"))
    }),

    // per-group z-score outlier detection: two-pass (tiny stats agg,
    // broadcast back over the fact table — the fact side is never
    // shuffled); same shape as the LM-quality two-pass scorer
    "q_outlier_zscore" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val stats = li.groupBy("l_returnflag")
        .agg(avg("l_extendedprice").as("mu"),
          stddev_pop("l_extendedprice").as("sigma"))
      val z = (col("l_extendedprice") - col("mu")) / col("sigma")
      li.join(broadcast(stats), "l_returnflag")
        .filter(z > 1.5)
        .groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_outliers"),
          round(max(z), 2).as("max_z"))
    }),

    // co-located bucketed join: both sides written bucketBy(key) once,
    // then joined with ZERO Exchange (pinned in PlanShapeSpec) — the
    // layout amortization that replaces a per-query fact-table shuffle
    // at 100 TB; result multiset == the plain equi-join (the oracle)
    "q_join_bucketed" -> ((s, d) => {
      val o = Tables.orders(s, d).select("o_custkey", "o_totalprice")
      val c = Tables.customer(s, d)
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment"))
      graft.ops.Bucketing.bucketedJoin(s, o, c, "o_custkey", 8)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), round(sum("o_totalprice"), 2).as("rev"))
    }),

    // Z-order (Morton) multi-dim layout key: the oracled column is the
    // interleaved-bits Z-value itself (pure integer shift/mask arithmetic,
    // engine-stable); the repartitionByRange clustering it drives is
    // pinned in LayoutSpec
    "q_zorder_layout" -> ((s, d) =>
      Tables.part(s, d).filter(col("p_partkey") < 500)
        .select(col("p_partkey"), col("p_size"),
          graft.ops.Layout.zvalue(col("p_size"),
            pmod(col("p_partkey"), lit(65536))).as("zval"))),

    // linear-regression aggregate family (regr_slope/intercept/r2/count):
    // all algebraic over (n, Σx, Σy, Σxy, Σx², Σy²) partials, so
    // map-side combine keeps the shuffle at |groups| rows at any scale
    "q_regr_fns" -> ((s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4)
            .as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 2)
            .as("icept"),
          round(regr_r2(col("l_extendedprice"), col("l_quantity")), 6)
            .as("r2"),
          regr_count(col("l_extendedprice"), col("l_quantity"))
            .cast("long").as("n"))),

    // higher-order array functions (transform/filter/aggregate/exists/
    // forall) — all narrow per-row lambdas inside whole-stage codegen;
    // the double-cast BEFORE the fold pins both engines to the same
    // left-to-right double accumulation order
    "q_array_hof" -> ((s, d) =>
      Tables.embeddings(s, d).filter(col("vec_id") < 200)
        .select(
          col("vec_id"),
          round(aggregate(
            transform(col("embedding"), x => x.cast("double") * 2),
            lit(0.0), (a, x) => a + x), 4).as("sum2x"),
          size(filter(col("embedding"), x => x > lit(0f))).as("n_pos"),
          exists(col("embedding"), x => x > lit(0.2f)).as("has_big"),
          forall(col("embedding"), x => abs(x) <= lit(1f)).as("all_unit"))),

    // URL decomposition (parse_url HOST/PATH/QUERY-param): the URLs are
    // synthesized deterministically from document columns, so the oracle
    // recomputes the expected parts directly — the check is that Spark's
    // parser agrees with ground truth. Narrow projection, no shuffle.
    "q_url_fns" -> ((s, d) =>
      Tables.documents(s, d).filter(col("doc_id") < 500)
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.com/"), col("lang"), lit("/doc-"), col("doc_id"),
          lit("?k="), pmod(col("doc_id"), lit(7))))
        .select(col("doc_id"),
          expr("parse_url(url, 'HOST')").as("host"),
          expr("parse_url(url, 'PATH')").as("path"),
          expr("parse_url(url, 'QUERY', 'k')").as("k"))),

    // CIDR containment over synthesized IPv4s — the security-telemetry
    // staple (the reference's domain is exactly this kind of event
    // filtering). String → octets → u32 via split+cast, containment via
    // shiftright: pure codegen'd integer arithmetic, fully pushdown- and
    // combine-friendly; group to /24 counts
    "q_ip_cidr" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .withColumn("ip", concat_ws(".", lit(10),
          pmod(col("event_id"), lit(64)),
          pmod(expr("event_id div 64"), lit(200)),
          pmod(col("event_id") * 7 + 3, lit(256))))
      val oct = (i: Int) =>
        element_at(split(col("ip"), "\\."), i).cast("long")
      val ipInt = ((oct(1) * 256 + oct(2)) * 256 + oct(3)) * 256 + oct(4)
      ev.withColumn("ip_int", ipInt)
        .filter(shiftright(col("ip_int"), 16) === lit(10 * 256 + 42))
        .groupBy(concat(lit("10.42."), shiftright(col("ip_int"), 8)
          .bitwiseAND(lit(255L)), lit(".0/24")).as("prefix24"))
        .agg(count(lit(1)).as("n_events"),
          count_distinct(col("user_id")).as("n_users"))
    }),

    // null-on-error arithmetic (try_divide / try_cast / try_add): the
    // ANSI-mode-safe projection idiom — at 100 TB one poison row must
    // not kill the job, and TRY ops keep that guarantee inside codegen
    // instead of via a UDF try/catch
    "q_try_arith" -> ((s, d) =>
      Tables.orders(s, d).filter(col("o_orderkey") < 2000)
        .select(col("o_orderkey"),
          // divisor domain {0→null, 1, 3}: an even divisor of a 2-decimal
          // price yields exact .xx5 midpoints where Spark's and DuckDB's
          // round(x,2) legitimately disagree; odd divisors cannot
          round(try_divide(col("o_totalprice"),
            when(pmod(col("o_custkey"), lit(3)) === 2, lit(3.0))
              .otherwise(pmod(col("o_custkey"), lit(3)).cast("double"))), 2)
            .as("safe_div"),
          expr("try_cast(o_orderpriority AS INT)").as("prio_int"),
          expr("try_add(9223372036854775807L, o_orderkey)").as("ovf"))),

    // grouping() provenance bits under ROLLUP — distinguishes "NULL
    // because subtotal row" from "NULL because data", which a consumer
    // of the rollup output needs; composed gid is engine-portable
    "q_grouping_id" -> ((s, d) =>
      Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"),
          (grouping(col("l_returnflag")).cast("int") * 2 +
            grouping(col("l_linestatus")).cast("int")).as("gid"))),

    // TPC-H Q10 (returned-item reporting): fact-fact join on orderkey,
    // dimension broadcast, top-20 customers by lost revenue — rounded
    // BEFORE the order-by with a key tie-break so the LIMIT frontier is
    // engine-stable
    "q_sql_tpch_q10" -> ((s, d) => {
      val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      val o = Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      val c = Tables.customer(s, d)
      val n = Tables.nation(s, d)
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    }),

    // TPC-H Q6 (forecast revenue change): the canonical pushdown probe —
    // a single-table agg whose three predicates must ALL reach the
    // parquet scan (date range + discount band + quantity cap prune row
    // groups via footer stats); at 100 TB this query is IO-bound and the
    // difference between pushed and unpushed filters is the whole job
    "q_sql_tpch_q6" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      s.sql("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
              |FROM g_lineitem
              |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |  AND l_shipdate < TIMESTAMP '1997-01-01'
              |  AND l_discount BETWEEN 0.05 AND 0.07
              |  AND l_quantity < 24""".stripMargin)
    }),

    // TPC-H Q14 (promotion effect): fact-dim join + conditional
    // aggregate ratio — part is the broadcast side, so the 100 TB
    // lineitem never shuffles; the CASE folds into one pass
    "q_sql_tpch_q14" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      Tables.part(s, d).createOrReplaceTempView("g_part")
      s.sql("""SELECT round(100.0 *
              |   sum(CASE WHEN p_type = 'PROMO'
              |       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
              |   / sum(l_extendedprice * (1 - l_discount)), 2)
              |  AS promo_revenue
              |FROM g_lineitem, g_part
              |WHERE l_partkey = p_partkey
              |  AND l_shipdate >= TIMESTAMP '1997-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin)
    }),

    // TPC-H Q15 (top supplier): CTE revenue view + scalar max subquery
    // equality — Catalyst evaluates the max once (broadcast scalar), so
    // the revenue CTE is computed twice at worst and never per-row;
    // revenue is rounded INSIDE the CTE so the max-equality frontier
    // compares engine-stable 2dp values
    "q_sql_tpch_q15" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      Tables.supplier(s, d).createOrReplaceTempView("g_supplier")
      s.sql("""WITH revenue AS (
              |  SELECT l_suppkey AS supplier_no,
              |   round(sum(l_extendedprice * (1 - l_discount)), 2)
              |     AS total_revenue
              |  FROM g_lineitem
              |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              |    AND l_shipdate < TIMESTAMP '1996-07-01'
              |  GROUP BY l_suppkey)
              |SELECT s_suppkey, s_name, total_revenue
              |FROM g_supplier, revenue
              |WHERE s_suppkey = supplier_no
              |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
              |ORDER BY s_suppkey""".stripMargin)
    }),

    // TPC-H Q19 shape (discounted revenue, disjunctive predicates):
    // OR-of-ANDs spanning both join sides — Catalyst's constraint
    // extraction derives the per-table residues (brand IN (...) on part,
    // quantity bounds on lineitem) so each scan still prunes, while the
    // full disjunction evaluates post-join; the adapted predicate drops
    // the reference benchmark's shipmode (absent in this schema)
    "q_sql_tpch_q19" -> ((s, d) => {
      Tables.lineitem(s, d).createOrReplaceTempView("g_lineitem")
      Tables.part(s, d).createOrReplaceTempView("g_part")
      s.sql("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
              |  AS revenue
              |FROM g_lineitem, g_part
              |WHERE p_partkey = l_partkey
              |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              |        AND l_quantity BETWEEN 1 AND 11)
              |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
              |        AND l_quantity BETWEEN 10 AND 20)
              |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
              |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin)
    }),

    // TPC-H Q7 (volume shipping): 6-table join where BOTH nation dims
    // broadcast twice (supplier's and customer's) and the symmetric
    // nation-pair disjunction prunes before the year rollup — the
    // bilateral-trade report shape
    "q_sql_tpch_q7" -> ((s, d) => {
      Seq("supplier", "lineitem", "orders", "customer", "nation")
        .foreach(t => Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT supp_nation, cust_nation, l_year,
              | round(sum(volume), 2) AS revenue
              |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              |   year(l_shipdate) AS l_year,
              |   l_extendedprice * (1 - l_discount) AS volume
              |  FROM g_supplier, g_lineitem, g_orders, g_customer,
              |   g_nation n1, g_nation n2
              |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
              |   AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
              |   AND c_nationkey = n2.n_nationkey
              |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
              |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              |   AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
              |     AND TIMESTAMP '1997-12-31') shipping
              |GROUP BY supp_nation, cust_nation, l_year
              |ORDER BY supp_nation, cust_nation, l_year""".stripMargin)
    }),

    // TPC-H Q8 (national market share): 8-table join, conditional-agg
    // ratio per year — region prunes the customer side two dimension
    // levels deep while the p_type filter prunes the part side
    "q_sql_tpch_q8" -> ((s, d) => {
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation",
        "region").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT o_year,
              | round(sum(CASE WHEN nation = 'NATION_1' THEN volume
              |     ELSE 0 END) / sum(volume), 4) AS mkt_share
              |FROM (SELECT year(o_orderdate) AS o_year,
              |   l_extendedprice * (1 - l_discount) AS volume,
              |   n2.n_name AS nation
              |  FROM g_part, g_supplier, g_lineitem, g_orders, g_customer,
              |   g_nation n1, g_nation n2, g_region
              |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
              |   AND l_orderkey = o_orderkey AND o_custkey = c_custkey
              |   AND c_nationkey = n1.n_nationkey
              |   AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
              |   AND s_nationkey = n2.n_nationkey
              |   AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
              |     AND TIMESTAMP '1997-12-31'
              |   AND p_type = 'PROMO') all_nations
              |GROUP BY o_year ORDER BY o_year""".stripMargin)
    }),

    // TPC-H Q13 (customer order-count distribution): the left-outer
    // twist — zero-order customers must survive into the c_count=0
    // bucket; two aggregations, the second over |customers| rows
    // (original's o_comment NOT LIKE filter dropped: no comment column
    // in this schema)
    "q_sql_tpch_q13" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_count, count(*) AS custdist
              |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
              |  FROM g_customer LEFT OUTER JOIN g_orders
              |    ON c_custkey = o_custkey
              |  GROUP BY c_custkey) c_orders
              |GROUP BY c_count
              |ORDER BY custdist DESC, c_count DESC""".stripMargin)
    }),

    // TPC-H Q18 (large-volume customers): the IN-subquery over a grouped
    // HAVING — Catalyst plans the >300-quantity orderkey set as a
    // semi-join build side; the outer 3-table join then re-aggregates
    // only qualifying orders
    "q_sql_tpch_q18" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT c_custkey, o_orderkey, o_orderdate,
              | round(o_totalprice, 2) AS o_totalprice,
              | sum(l_quantity) AS sum_qty
              |FROM g_customer, g_orders, g_lineitem
              |WHERE o_orderkey IN (SELECT l_orderkey FROM g_lineitem
              |   GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
              |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
              |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
              |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
              |LIMIT 100""".stripMargin)
    }),

    // TPC-H Q22 shape (global-acctbal scalar subquery + NOT EXISTS
    // anti-join): high-balance customers with no large order, grouped by
    // nation (adapted: no c_phone column, so nationkey stands in for the
    // phone-prefix country code; the big-order threshold keeps the
    // anti-join selective instead of the original's no-orders-at-all,
    // which this dataset never satisfies)
    "q_sql_tpch_q22" -> ((s, d) => {
      Tables.customer(s, d).createOrReplaceTempView("g_customer")
      Tables.orders(s, d).createOrReplaceTempView("g_orders")
      s.sql("""SELECT c_nationkey AS cntrycode, count(*) AS numcust,
              | round(sum(c_acctbal), 2) AS totacctbal
              |FROM g_customer c
              |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM g_customer
              |    WHERE c_acctbal > 0)
              |  AND NOT EXISTS (SELECT 1 FROM g_orders o
              |    WHERE o.o_custkey = c.c_custkey
              |      AND o.o_totalprice > 300000)
              |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin)
    }),

    // TPC-H Q2 shape (minimum-cost supplier): partsupp doesn't exist in
    // this schema, so the part↔supplier relation is DERIVED as
    // `SELECT DISTINCT l_partkey, l_suppkey FROM lineitem` (the exact
    // trick the original uses partsupp for), and ps_supplycost's role is
    // played by s_acctbal. The load-bearing shape survives: a correlated
    // scalar MIN subquery over the same 4-way join, which Catalyst
    // decorrelates into a per-part min aggregate joined back — one
    // shuffle on partkey, not a per-row re-execution
    "q_sql_tpch_q2" -> ((s, d) => {
      Seq("part", "supplier", "lineitem", "nation", "region").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
              | p_partkey, p_type
              |FROM g_part, g_supplier,
              |  (SELECT DISTINCT l_partkey, l_suppkey FROM g_lineitem) ps,
              |  g_nation, g_region
              |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
              |  AND p_size <= 15 AND p_type = 'LARGE'
              |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
              |  AND r_name = 'EUROPE'
              |  AND s_acctbal = (SELECT min(s2.s_acctbal)
              |     FROM g_supplier s2,
              |       (SELECT DISTINCT l_partkey, l_suppkey FROM g_lineitem) ps2,
              |       g_nation n2, g_region r2
              |     WHERE ps2.l_partkey = p_partkey
              |       AND s2.s_suppkey = ps2.l_suppkey
              |       AND s2.s_nationkey = n2.n_nationkey
              |       AND n2.n_regionkey = r2.r_regionkey
              |       AND r2.r_name = 'EUROPE')
              |ORDER BY s_acctbal, n_name, s_name, p_partkey
              |LIMIT 100""".stripMargin)
    }),

    // TPC-H Q4 shape (order-priority checking): the original's late-line
    // EXISTS needs l_commitdate/l_receiptdate which this schema lacks;
    // l_returnflag='R' stands in as the per-order lineitem predicate.
    // The EXISTS decorrelates to a left-semi join on orderkey — the
    // quarter filter prunes orders BEFORE the semi-join probe
    "q_sql_tpch_q4" -> ((s, d) => {
      Seq("orders", "lineitem").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT o_orderpriority, count(*) AS order_count
              |FROM g_orders
              |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              |  AND o_orderdate < TIMESTAMP '1996-04-01'
              |  AND EXISTS (SELECT 1 FROM g_lineitem
              |     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
              |GROUP BY o_orderpriority
              |ORDER BY o_orderpriority""".stripMargin)
    }),

    // TPC-H Q9 (product-type profit by nation/year): ps_supplycost is
    // approximated as 0.5*p_retailprice (no partsupp). The 5-way join's
    // scale property: part/supplier/nation broadcast, lineitem⋈orders is
    // the one big shuffle, and the %red% LIKE prunes parts at the scan
    "q_sql_tpch_q9" -> ((s, d) => {
      Seq("part", "supplier", "lineitem", "orders", "nation").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
              |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
              |        l_extendedprice * (1 - l_discount)
              |          - 0.5 * p_retailprice * l_quantity AS amount
              |      FROM g_part, g_supplier, g_lineitem, g_orders, g_nation
              |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
              |        AND o_orderkey = l_orderkey
              |        AND s_nationkey = n_nationkey
              |        AND p_name LIKE '%red%') profit
              |GROUP BY nation, o_year
              |ORDER BY nation, o_year DESC""".stripMargin)
    }),

    // TPC-H Q11 shape (important stock): partsupp's value =
    // ps_supplycost*ps_availqty becomes lineitem's extendedprice*quantity
    // aggregated per part. The global-fraction HAVING is a scalar
    // subquery — Catalyst computes the total once (same nation-filtered
    // join, reused plan subtree) and broadcasts the threshold
    "q_sql_tpch_q11" -> ((s, d) => {
      Seq("lineitem", "supplier", "nation").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      // threshold = 1.5× the mean per-part share (TPC-H scales its
      // fraction by 1/SF for exactly this reason — a fixed fraction
      // empties out as the part count grows; this form is SF-invariant)
      s.sql("""SELECT l_partkey AS ps_partkey,
              | round(sum(l_extendedprice * l_quantity), 2) AS value
              |FROM g_lineitem, g_supplier, g_nation
              |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              |  AND n_nationkey < 8
              |GROUP BY l_partkey
              |HAVING sum(l_extendedprice * l_quantity) >
              |  (SELECT 1.5 * sum(l_extendedprice * l_quantity)
              |     / count(DISTINCT l_partkey)
              |   FROM g_lineitem, g_supplier, g_nation
              |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
              |     AND n_nationkey < 8)
              |ORDER BY value DESC, ps_partkey LIMIT 100""".stripMargin)
    }),

    // TPC-H Q12 shape (shipping-mode priority split): no l_shipmode /
    // l_receiptdate, so the "late" predicate is shipdate > orderdate+60d
    // and the split key is l_linestatus. The CASE-sum pivot and the
    // orders⋈lineitem shuffle — Q12's actual measured shape — survive
    "q_sql_tpch_q12" -> ((s, d) => {
      Seq("orders", "lineitem").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT l_linestatus,
              | sum(CASE WHEN o_orderpriority = '1-URGENT'
              |       OR o_orderpriority = '2-HIGH'
              |      THEN 1 ELSE 0 END) AS high_line_count,
              | sum(CASE WHEN o_orderpriority <> '1-URGENT'
              |       AND o_orderpriority <> '2-HIGH'
              |      THEN 1 ELSE 0 END) AS low_line_count
              |FROM g_orders, g_lineitem
              |WHERE o_orderkey = l_orderkey
              |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
              |  AND l_shipdate >= TIMESTAMP '1997-01-01'
              |  AND l_shipdate < TIMESTAMP '1998-01-01'
              |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin)
    }),

    // TPC-H Q16 (part/supplier relationship count): partsupp derived
    // from lineitem as in Q2; NOT IN over a complaint-supplier set
    // (negative acctbal stands in for the comment LIKE). The NOT IN is
    // null-free so Catalyst plans a plain (not null-aware) anti join
    "q_sql_tpch_q16" -> ((s, d) => {
      Seq("part", "supplier", "lineitem").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT p_brand, p_type, p_size,
              | count(DISTINCT ps.l_suppkey) AS supplier_cnt
              |FROM (SELECT DISTINCT l_partkey, l_suppkey
              |      FROM g_lineitem) ps, g_part
              |WHERE p_partkey = ps.l_partkey
              |  AND p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
              |  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 36, 45, 49)
              |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM g_supplier
              |      WHERE s_acctbal < 0)
              |GROUP BY p_brand, p_type, p_size
              |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
              |LIMIT 100""".stripMargin)
    }),

    // TPC-H Q17 (small-quantity-order revenue): correlated scalar AVG
    // subquery per part — the decorrelation poster child: Catalyst
    // rewrites to an aggregate of lineitem grouped by partkey joined
    // back, so the per-part average is computed once in one shuffle
    "q_sql_tpch_q17" -> ((s, d) => {
      Seq("lineitem", "part").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
              |FROM g_lineitem, g_part
              |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
              |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
              |     FROM g_lineitem l2 WHERE l2.l_partkey = p_partkey)
              |""".stripMargin)
    }),

    // TPC-H Q20 shape (excess-stock suppliers): the partsupp availqty
    // check becomes a grouped-HAVING over shipped quantity; the nested
    // IN chain (supplier ← qualifying lineitem ← red parts) is the
    // original's structure and plans as two stacked semi-joins
    "q_sql_tpch_q20" -> ((s, d) => {
      Seq("supplier", "lineitem", "part", "nation").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT s_name, round(s_acctbal, 2) AS s_acctbal
              |FROM g_supplier, g_nation
              |WHERE s_suppkey IN (
              |    SELECT l_suppkey FROM g_lineitem
              |    WHERE l_partkey IN (SELECT p_partkey FROM g_part
              |        WHERE p_name LIKE 'red%')
              |      AND l_shipdate >= TIMESTAMP '1997-01-01'
              |      AND l_shipdate < TIMESTAMP '1998-01-01'
              |    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
              |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
              |ORDER BY s_name""".stripMargin)
    }),

    // TPC-H Q21 shape (suppliers who kept orders waiting): the original's
    // "only this supplier was late" becomes "only this supplier's line
    // was returned" (no receipt/commit dates). The signature EXISTS +
    // NOT-EXISTS pair on the SAME order with a different-supplier
    // predicate survives verbatim — Catalyst plans semi + anti joins on
    // orderkey with the suppkey disequality as a join-side filter
    "q_sql_tpch_q21" -> ((s, d) => {
      Seq("supplier", "lineitem", "orders", "nation").foreach(t =>
        Tables.table(s, d, t).createOrReplaceTempView(s"g_$t"))
      s.sql("""SELECT s_name, count(*) AS numwait
              |FROM g_supplier, g_lineitem l1, g_orders, g_nation
              |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
              |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
              |  AND EXISTS (SELECT 1 FROM g_lineitem l2
              |     WHERE l2.l_orderkey = l1.l_orderkey
              |       AND l2.l_suppkey <> l1.l_suppkey)
              |  AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
              |     WHERE l3.l_orderkey = l1.l_orderkey
              |       AND l3.l_suppkey <> l1.l_suppkey
              |       AND l3.l_returnflag = 'R')
              |  AND s_nationkey = n_nationkey AND n_nationkey < 13
              |GROUP BY s_name
              |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin)
    }),

    // edit-distance near-match pairs (levenshtein): the fuzzy-string
    // primitive behind entity resolution / short-field dedup — blocked
    // by brand so the pair space is |brand-group|², never corpus²
    "q_edit_distance" -> ((s, d) => {
      val p = Tables.part(s, d).filter(col("p_partkey") < 300)
        .select(col("p_partkey"), col("p_brand"), col("p_name"))
      val a = p.select(col("p_brand"), col("p_partkey").as("id_a"),
        col("p_name").as("name_a"))
      val b = p.select(col("p_brand"), col("p_partkey").as("id_b"),
        col("p_name").as("name_b"))
      a.join(b, "p_brand")
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
        .filter(col("dist") <= 12)
        .select("id_a", "id_b", "dist")
    }),

    // CDC merge/upsert (MERGE INTO semantics, last-writer-wins): base ∪
    // change-set, then one row_number window per key keeps the highest
    // version — the declarative twin of a Delta/Iceberg MERGE. At scale
    // this is ONE shuffle on the merge key (the same cost MERGE pays for
    // its join); the change-set is derived here (every 7th order doubled,
    // status 'U') so the query is self-contained and oracleable. The *2
    // price update is exact in binary (exponent bump), so no mid-pipeline
    // rounding is needed.
    "q_merge_upsert" -> ((s, d) => {
      val base = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .withColumn("_v", lit(1))
      val changes = Tables.orders(s, d)
        .filter(col("o_orderkey") % 7 === 0)
        .select(col("o_orderkey"), lit("U").as("o_orderstatus"),
          (col("o_totalprice") * 2).as("o_totalprice"))
        .withColumn("_v", lit(2))
      val w = Window.partitionBy("o_orderkey").orderBy(desc("_v"))
      base.unionByName(changes)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy("o_orderstatus")
    }),

    // data-quality audit (Deequ-style constraint checking): the nightly
    // gate every warehouse runs — range/null/positivity violations in ONE
    // map-side-combined pass over the fact table, primary-key uniqueness
    // as a keyed count, referential integrity as a left-anti join against
    // the parent. Each check is a scalar, so the combine is three
    // broadcast-joined single-row tables; nothing here re-scans
    "q_dq_audit" -> ((s, d) => {
      val li = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val rowChecks = li.agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("l_quantity").between(1, 50), 0L).otherwise(1L))
          .as("bad_quantity"),
        sum(when(col("l_discount").between(0, 0.1), 0L).otherwise(1L))
          .as("bad_discount"),
        sum(when(col("l_extendedprice") > 0, 0L).otherwise(1L))
          .as("bad_price"),
        sum(when(col("l_shipdate").isNull, 1L).otherwise(0L))
          .as("null_shipdate"))
      val pk = li.groupBy("l_orderkey", "l_linenumber")
        .agg(count(lit(1)).as("c")).filter(col("c") > 1)
        .agg(count(lit(1)).as("dup_pk"))
      val orphans = li
        .join(o, col("l_orderkey") === col("o_orderkey"), "left_anti")
        .agg(count(lit(1)).as("orphan_lineitems"))
      rowChecks.crossJoin(broadcast(pk)).crossJoin(broadcast(orphans))
    }),

    // global row numbering WITHOUT the single-partition window: Spark
    // plans row_number() over an empty PARTITION BY as one task sorting
    // everything — [[graft.ops.Layout.globalRowNumber]] replaces it
    // with a parallel range sort + per-partition counts + broadcast
    // offsets (the zipWithIndex idiom). Same answer as the oracle's
    // plain OVER (ORDER BY …), scale-correct plan.
    "q_global_rownum" -> ((s, d) =>
      graft.ops.Layout.globalRowNumber(
          Tables.events(s, d).select(col("event_id"), col("value")),
          Seq("value", "event_id"))
        .select(col("event_id"), col("rn"))),

    // column profiling (the first query run against ANY new dataset):
    // per-column null rate, distinct count, min/max/mean over the fact
    // table's numeric measures. One unpivot (narrow, 4× row blow-up
    // bounded by the column count) + one map-side-combined aggregate —
    // a single pass no matter how many columns are profiled, vs the
    // naive one-scan-per-column loop that reads the table |cols| times.
    "q_profile_table" -> ((s, d) =>
      Tables.lineitem(s, d)
        .select(col("l_quantity").cast("double"),
          col("l_extendedprice").cast("double"),
          col("l_discount").cast("double"), col("l_tax").cast("double"))
        .unpivot(Array.empty[org.apache.spark.sql.Column],
          Array(col("l_quantity"), col("l_extendedprice"),
            col("l_discount"), col("l_tax")),
          "col_name", "v")
        .groupBy("col_name")
        .agg(count(lit(1)).as("n"),
          sum(when(col("v").isNull, 1L).otherwise(0L)).as("n_null"),
          count_distinct(col("v")).as("n_distinct"),
          round(min("v"), 2).as("min_v"),
          round(max("v"), 2).as("max_v"),
          round(avg("v"), 4).as("mean_v"))
        .orderBy("col_name")),

    // schema-evolution union: two snapshots of the same feed whose
    // schemas drifted (a column added, another dropped) merged with
    // unionByName(allowMissingColumns) — missing columns null-fill, and
    // the match is BY NAME, not position. Purely narrow: no shuffle
    // until the final audit aggregate.
    "q_union_by_name" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val v1 = o.filter(col("o_orderkey") % 2 === 0)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderstatus"))
      val v2 = o.filter(col("o_orderkey") % 2 === 1)
        .select(col("o_orderkey"), col("o_totalprice"),
          col("o_orderdate"))
      v1.unionByName(v2, allowMissingColumns = true)
        .groupBy(col("o_orderstatus").isNull.as("from_v2"))
        .agg(count(lit(1)).as("n"),
          round(sum("o_totalprice"), 2).as("total"),
          count(col("o_orderstatus")).as("n_status"),
          count(col("o_orderdate")).as("n_date"))
        .orderBy("from_v2")
    }),

    // ---- UDF / UDAF surface ------------------------------------------
    "q_udf_clamp" -> ((s, d) => {
      val clamp = udf((v: Double) => math.min(math.max(v, 0.0), 10.0))
      Tables.events(s, d)
        .groupBy("event_type")
        .agg(round(sum(clamp(col("value"))), 2).as("sum_clamped"))
    }),

    "q_udaf_weighted_avg" -> ((s, d) => {
      val wavg = udaf(graft.functions.WeightedAvg)
      Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .agg(round(wavg(col("l_extendedprice"), col("l_quantity")), 2).as("wavg_price"))
    })
  )

  private lazy val asofOracleSql: String =
    """WITH r AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS rus,
      |  max(event_id) AS click_id
      | FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |l AS (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us
      | FROM events WHERE event_type = 'purchase')
      |SELECT l.event_id, l.user_id, r.click_id, l.us - r.rus AS gap_us
      |FROM l ASOF LEFT JOIN r
      |  ON l.user_id = r.user_id AND l.us >= r.rus""".stripMargin

  val oracle: Map[String, String] = Map(
    "q_scan_count" -> "SELECT count(*) AS n FROM lineitem",

    "q_project_compute" ->
      """SELECT l_orderkey, l_linenumber,
        | floor(l_extendedprice*(1-l_discount)*100 + 0.5)/100 AS rev
        |FROM lineitem WHERE l_orderkey < 1000""".stripMargin,

    "q_filter_pred" ->
      """SELECT count(*) AS n, round(sum(l_extendedprice), 2) AS sum_price
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.04
        |  AND l_returnflag IN ('A','R') AND l_linestatus LIKE 'F%'""".stripMargin,

    "q_join_inner_groupby" ->
      """SELECT n_name, count(*) AS n, round(sum(c_acctbal), 2) AS bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_join_left_null" ->
      """SELECT count(*) AS n, count(c_custkey) AS n_matched
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 5000) c
        |  ON o_custkey = c_custkey""".stripMargin,

    "q_join_semi" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_anti" ->
      """SELECT c_mktsegment, count(*) AS n FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_cross" -> "SELECT count(*) AS n FROM region CROSS JOIN nation",

    "q_join_salted" ->
      """SELECT c_mktsegment, count(*) AS n,
        | round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_asof" -> asofOracleSql,

    // custom physical operator, same contract — shared oracle
    "q_join_asof_exec" -> asofOracleSql,

    // composite-key as-of on the custom operator — DuckDB's native
    // multi-condition ASOF LEFT JOIN is the twin
    "q_join_asof_multi" ->
      """WITH r AS (SELECT user_id, event_type, epoch_us(ts::TIMESTAMP) AS rus,
        |  max(event_id) AS anchor_id
        | FROM events WHERE event_id % 2 = 0 GROUP BY 1, 2, 3),
        |l AS (SELECT event_id, user_id, event_type,
        |  epoch_us(ts::TIMESTAMP) AS us
        | FROM events WHERE event_id % 2 = 1)
        |SELECT l.event_id, l.user_id, l.event_type, r.anchor_id,
        |  l.us - r.rus AS gap_us
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.event_type = r.event_type
        |  AND l.us >= r.rus""".stripMargin,

    "q_join_range" ->
      """WITH p AS (SELECT event_id, event_type, user_id,
        |  epoch_us(ts::TIMESTAMP) AS us FROM events),
        |i AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS w_start,
        |  epoch_us(ts::TIMESTAMP) + 1800000000 AS w_end,
        |  event_id AS purchase_id
        | FROM events WHERE event_type = 'purchase')
        |SELECT event_type, count(*) AS n_pairs,
        | count(DISTINCT event_id) AS n_events,
        | count(DISTINCT purchase_id) AS n_windows
        |FROM p JOIN i
        |  ON p.user_id = i.user_id AND p.us BETWEEN i.w_start AND i.w_end
        |GROUP BY event_type""".stripMargin,

    "q_sql_pivot" ->
      """SELECT ts::DATE AS day,
        | sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_click,
        | sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_view,
        | sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT
        |   AS n_buy
        |FROM events GROUP BY day ORDER BY day""".stripMargin,

    "q_sql_lateral" ->
      """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS bal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_custkey LIMIT 1) t
        |ORDER BY n.n_name""".stripMargin,

    "q_share_of_total" ->
      """WITH rev AS (SELECT n_regionkey, n_name,
        |   sum(o_totalprice) AS rev
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2)
        |SELECT n_regionkey, n_name, round(rev, 2) AS rev,
        | round(rev / sum(rev) OVER (PARTITION BY n_regionkey), 4)
        |   AS share
        |FROM rev ORDER BY n_regionkey, n_name""".stripMargin,

    "q_join_asof_fwd" ->
      """WITH p AS (SELECT event_id, user_id, -epoch_us(ts) AS nus
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, -epoch_us(ts) AS nrus,
        |   max(event_id) AS click_id
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |m AS (SELECT p.event_id, p.user_id, p.nus,
        |   max(c.nrus) AS nrus
        |  FROM p LEFT JOIN c
        |    ON p.user_id = c.user_id AND c.nrus <= p.nus
        |  GROUP BY 1, 2, 3)
        |SELECT m.event_id, m.user_id, c.click_id, m.nus - m.nrus AS gap_us
        |FROM m LEFT JOIN c
        |  ON m.user_id = c.user_id AND m.nrus = c.nrus""".stripMargin,

    "q_winsorize" ->
      """WITH cuts AS (SELECT l_returnflag,
        |   quantile_cont(l_extendedprice, 0.05) AS lo,
        |   quantile_cont(l_extendedprice, 0.95) AS hi
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n,
        | sum(CASE WHEN l.l_extendedprice < lo OR l.l_extendedprice > hi
        |     THEN 1 ELSE 0 END)::BIGINT AS n_clipped,
        | round(sum(greatest(least(l.l_extendedprice, hi), lo)), 2)
        |   AS sum_clip,
        | round(avg(greatest(least(l.l_extendedprice, hi), lo)), 4)
        |   AS avg_clip
        |FROM lineitem l JOIN cuts ON l.l_returnflag = cuts.l_returnflag
        |GROUP BY l.l_returnflag ORDER BY l.l_returnflag""".stripMargin,

    "q_benford" ->
      """WITH d AS (SELECT CAST(substr(CAST(
        |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
        |    AS VARCHAR), 1, 1) AS INT) AS digit
        |  FROM lineitem WHERE l_extendedprice > 0),
        |bd AS (SELECT digit, count(*) AS n FROM d GROUP BY digit),
        |t AS (SELECT sum(n)::DOUBLE AS tot FROM bd)
        |SELECT digit, n, round(n / tot, 4) AS obs_freq,
        | round(log10(1.0 + 1.0 / digit), 4) AS benford_freq,
        | round(pow(n / tot - log10(1.0 + 1.0 / digit), 2)
        |   / log10(1.0 + 1.0 / digit) * tot, 2) AS chi2_part
        |FROM bd, t ORDER BY digit""".stripMargin,

    // the twin runs the plain per-user inequality join over the same
    // gaps-and-islands session/burst construction
    "q_join_interval_overlap" ->
      """WITH sg AS (SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |   lag(epoch_us(ts::TIMESTAMP)) OVER (PARTITION BY user_id
        |     ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev
        |  FROM events WHERE event_type IN ('view', 'click', 'purchase')),
        |ss AS (SELECT user_id, us,
        |   sum(CASE WHEN prev IS NULL OR us - prev > 21600000000
        |       THEN 1 ELSE 0 END)
        |    OVER (PARTITION BY user_id ORDER BY us, event_id
        |          ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM sg),
        |shop AS (SELECT user_id, sid, min(us) AS ls, max(us) AS le
        |  FROM ss GROUP BY 1, 2),
        |bursts AS (SELECT user_id,
        |   epoch_us(ts::TIMESTAMP) - 7200000000 AS rs,
        |   epoch_us(ts::TIMESTAMP) + 7200000000 AS re
        |  FROM events WHERE event_type = 'error')
        |SELECT s.user_id, count(*) AS n_overlaps,
        | round(sum(least(s.le, b.re) - greatest(s.ls, b.rs)) / 1e6, 2)
        |   AS overlap_s
        |FROM shop s JOIN bursts b
        |  ON s.user_id = b.user_id AND s.ls <= b.re AND b.rs <= s.le
        |GROUP BY s.user_id ORDER BY s.user_id""".stripMargin,

    "q_join_range_auto" ->
      """WITH p AS (SELECT event_id, event_type, user_id,
        |  epoch_us(ts::TIMESTAMP) AS us FROM events),
        |i AS (SELECT user_id, epoch_us(ts::TIMESTAMP) AS w_start,
        |  epoch_us(ts::TIMESTAMP) + 1800000000 AS w_end,
        |  event_id AS purchase_id
        | FROM events WHERE event_type = 'purchase')
        |SELECT event_type, count(*) AS n_pairs,
        | count(DISTINCT event_id) AS n_events,
        | count(DISTINCT purchase_id) AS n_windows
        |FROM p JOIN i
        |  ON p.user_id = i.user_id AND p.us BETWEEN i.w_start AND i.w_end
        |GROUP BY event_type""".stripMargin,

    "q_join_right" ->
      """SELECT count(*) AS n, count(o_orderkey) AS n_matched
        |FROM orders RIGHT JOIN (SELECT * FROM customer WHERE c_acctbal < 0) c
        |  ON o_custkey = c_custkey""".stripMargin,

    "q_join_full" ->
      """SELECT count(*) AS n,
        | sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_right_only,
        | sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_left_only
        |FROM (SELECT * FROM customer WHERE c_acctbal > 9000) c
        |FULL JOIN (SELECT * FROM orders WHERE o_totalprice > 300000) o
        |  ON c_custkey = o_custkey""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT o_orderpriority, o_orderstatus, count(*) AS n,
        | round(sum(o_totalprice), 2) AS total
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin,

    "q_window_range_frame" ->
      """SELECT event_id,
        | count(*) OVER w AS n_5m,
        | round(sum(value) OVER w, 2) AS sum_5m
        |FROM (SELECT event_id, user_id, epoch_us(ts::TIMESTAMP) AS us, value
        |      FROM events)
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |  RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_join_multiway" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue,
        | count(*) AS n
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin,

    "q_join_tpch_q5" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1995-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-01-01'
        |GROUP BY n_name""".stripMargin,

    "q_agg_tpch_q1" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base,
        | round(sum(l_extendedprice*(1-l_discount)), 2) AS sum_disc,
        | round(sum(l_extendedprice*(1-l_discount)*(1+l_tax)), 2) AS sum_charge,
        | count(*) AS n
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_agg_distinct" ->
      """SELECT count(DISTINCT user_id) AS u, count(DISTINCT event_type) AS et,
        | count(*) AS n FROM events""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | round(sum(l_quantity), 2) AS qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""".stripMargin,

    "q_agg_cube" ->
      """SELECT c_mktsegment, c_nationkey, count(*) AS n,
        | round(sum(c_acctbal), 2) AS bal
        |FROM customer GROUP BY CUBE(c_mktsegment, c_nationkey)""".stripMargin,

    "q_agg_collect" ->
      """SELECT n_regionkey,
        | array_to_string(list_sort(list(n_name)), '|') AS names,
        | array_to_string(list_sort(list(DISTINCT n_nationkey)), '|') AS keys
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag,
        | floor(median(l_extendedprice) * 100 + 0.5) / 100 AS med_price,
        | floor(quantile_cont(l_quantity, 0.9) * 100 + 0.5) / 100 AS p90_qty,
        | round(stddev_samp(l_extendedprice), 2) AS sd_price,
        | round(var_samp(l_discount), 6) AS var_disc,
        | round(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        | round(covar_samp(l_quantity, l_extendedprice), 2) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_agg_argminmax" ->
      """SELECT o_orderstatus,
        | arg_max(o_orderpriority, o_orderkey) AS last_prio,
        | arg_min(o_orderpriority, o_orderkey) AS first_prio,
        | max(o_orderkey) AS max_key
        |FROM orders GROUP BY o_orderstatus""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(floor(l_extendedprice / 5000) AS BIGINT) AS bucket,
        | count(*) AS n
        |FROM lineitem GROUP BY bucket""".stripMargin,

    "q_agg_filter" ->
      """SELECT l_returnflag,
        | count(*) FILTER (WHERE l_discount > 0.05) AS n_highdisc,
        | count(*) FILTER (WHERE l_returnflag = 'R') AS n_returned,
        | round(sum(CASE WHEN l_quantity < 10 THEN l_extendedprice
        |   ELSE 0 END), 2) AS small_rev,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_agg_listagg" ->
      """SELECT n_regionkey,
        | string_agg(n_name, ',' ORDER BY n_nationkey) AS names
        |FROM nation GROUP BY n_regionkey""".stripMargin,

    "q_window_first_last" ->
      """SELECT * FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  first_value(o_totalprice) OVER w AS first_price,
        |  last_value(o_totalprice) OVER w AS running_last,
        |  nth_value(o_totalprice, 3) OVER w AS third_price
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
        |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |WHERE o_orderkey < 1000""".stripMargin,

    "q_approx_quantile" ->
      """SELECT l_returnflag,
        | array_to_string(list_transform(
        |   quantile_cont(l_quantity, [0.25, 0.5, 0.75]),
        |   x -> printf('%.4f', x)), '|') AS quartiles,
        | TRUE AS approx_ok,
        | count(*) AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_window_rownum" ->
      """SELECT event_id, user_id,
        | row_number() OVER (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id) AS rn
        |FROM events""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT event_id,
        | round(value - lag(value, 1) OVER w, 2) AS delta_prev,
        | round(lead(value, 1) OVER w - value, 2) AS delta_next
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)""".stripMargin,

    "q_window_moving_sum" ->
      """SELECT event_id, round(sum(value) OVER (
        |  PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
        |  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS mv3
        |FROM events""".stripMargin,

    "q_window_rank" ->
      """SELECT * FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  rank() OVER w AS rnk, dense_rank() OVER w AS drnk
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)
        |) WHERE rnk <= 20""".stripMargin,

    "q_window_dist" ->
      """SELECT * FROM (
        | SELECT o_orderpriority, o_orderkey,
        |  ntile(4) OVER w AS quartile,
        |  round(percent_rank() OVER w, 4) AS pr,
        |  round(cume_dist() OVER w, 4) AS cd
        | FROM orders
        | WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
        |) WHERE o_orderkey < 2000""".stripMargin,

    "q_set_intersect_all" ->
      """SELECT k, count(*) AS n FROM (
        | SELECT c_nationkey AS k FROM customer
        | INTERSECT ALL SELECT s_nationkey AS k FROM supplier)
        |GROUP BY k""".stripMargin,

    "q_set_except_all" ->
      """SELECT k, count(*) AS n FROM (
        | SELECT c_nationkey AS k FROM customer
        | EXCEPT ALL SELECT s_nationkey AS k FROM supplier)
        |GROUP BY k""".stripMargin,

    "q_sort_limit" ->
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_topk_pergroup" ->
      """SELECT * FROM (
        | SELECT c_nationkey, c_custkey, c_acctbal,
        |  row_number() OVER (PARTITION BY c_nationkey
        |    ORDER BY c_acctbal DESC, c_custkey) AS rn
        | FROM customer) WHERE rn <= 3""".stripMargin,

    "q_pivot" ->
      """SELECT l_linestatus,
        | round(sum(CASE WHEN l_returnflag='A' THEN l_quantity END), 2) AS A,
        | round(sum(CASE WHEN l_returnflag='N' THEN l_quantity END), 2) AS N,
        | round(sum(CASE WHEN l_returnflag='R' THEN l_quantity END), 2) AS R
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q_unpivot" ->
      """SELECT metric, round(sum(val), 2) AS s, count(*) AS n
        |FROM (
        | SELECT 'l_quantity' AS metric, l_quantity AS val FROM lineitem
        | UNION ALL
        | SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        | UNION ALL
        | SELECT 'l_discount', l_discount FROM lineitem)
        |GROUP BY metric""".stripMargin,

    "q_case_expr" ->
      """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
        |  WHEN o_totalprice < 150000 THEN 'medium'
        |  WHEN o_totalprice < 300000 THEN 'large'
        |  ELSE 'jumbo' END AS bucket,
        | count(*) AS n, round(avg(o_totalprice), 2) AS avg_price
        |FROM orders GROUP BY 1""".stripMargin,

    "q_null_fns" ->
      """SELECT count(*) AS n,
        | sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        | count(DISTINCT coalesce(c_mktsegment, 'UNMATCHED')) AS n_seg,
        | round(sum(coalesce(c_acctbal, 0)), 2) AS bal,
        | sum(CASE WHEN nullif(c_nationkey, 0) IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_zero_or_null
        |FROM orders LEFT JOIN (SELECT * FROM customer WHERE c_acctbal > 7500) c
        |  ON o_custkey = c_custkey""".stripMargin,

    "q_scalar_subquery" ->
      """SELECT o_orderpriority, count(*) AS n,
        | round(min(o_totalprice), 2) AS min_above
        |FROM orders
        |WHERE o_totalprice > (SELECT avg(o_totalprice) FROM orders)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_set_distinct" -> "SELECT DISTINCT c_nationkey AS k FROM customer",

    "q_set_intersect" ->
      "SELECT c_custkey AS k FROM customer INTERSECT SELECT o_custkey AS k FROM orders",

    "q_set_except" ->
      "SELECT c_custkey AS k FROM customer EXCEPT SELECT o_custkey AS k FROM orders",

    "q_set_union_all" ->
      """SELECT count(*) AS n, count(DISTINCT k) AS nd FROM (
        | SELECT c_custkey AS k FROM customer
        | UNION ALL SELECT o_custkey AS k FROM orders)""".stripMargin,

    "q_string_fns" ->
      """SELECT upper(substr(p_name, 1, 4)) AS pfx,
        | regexp_extract(p_type, '(\w+)$', 1) AS lastw,
        | count(*) AS n, round(sum(p_retailprice), 2) AS price,
        | sum(length(p_name))::BIGINT AS chars
        |FROM part WHERE p_type LIKE '%O%'
        |GROUP BY 1, 2""".stripMargin,

    "q_bitwise_fns" ->
      """SELECT o_orderpriority,
        | sum(bit_count(xor(o_orderkey, o_custkey)))::BIGINT AS xor_bits,
        | sum((o_orderkey & 255) + (o_custkey | 16))::BIGINT AS mask_sum,
        | sum((o_orderkey << 2) >> 1)::BIGINT AS shift_sum
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_binary_fns" ->
      """SELECT lang, count(DISTINCT sha256(text)) AS n_sha,
        | min(lower(hex(substr(text, 1, 4)))) AS first_hex,
        | min(to_base64(substr(text, 1, 6)::BLOB)) AS first_b64
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,

    "q_regexp_fns" ->
      """SELECT doc_id,
        | CAST(len(regexp_extract_all(text, 'ta[a-z]+')) AS INT) AS n_ta,
        | regexp_extract(text, '(sc[a-z]+)', 1) AS first_sc,
        | md5(regexp_replace(text, 'table', 'TBL', 'g')) AS replaced_md5,
        | regexp_matches(text, 'slow [a-z]+ fast') AS has_pat
        |FROM documents WHERE doc_id < 25""".stripMargin,

    "q_date_fns" ->
      """SELECT date_trunc('month', o_orderdate)::DATE AS m,
        | year(o_orderdate) AS y, count(*) AS n,
        | max(datediff('day', DATE '1995-01-01', o_orderdate)) AS max_dd
        |FROM orders GROUP BY 1, 2""".stripMargin,

    "q_math_fns" ->
      """SELECT round(sum(l_extendedprice*l_discount), 2) AS revenue,
        | round(sum(ln(l_quantity+1)), 2) AS sum_ln,
        | round(sum(pow(l_discount, 2)), 4) AS sum_pow,
        | round(sum(ceil(l_quantity)), 2) AS sum_ceil,
        | round(sum(floor(l_quantity)), 2) AS sum_floor,
        | round(sum(abs(l_tax - 0.04)), 2) AS sum_abs
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1994-01-01'
        |  AND l_shipdate < TIMESTAMP '1995-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,

    "q_array_fns" ->
      """SELECT label, count(*) AS n, min(len(embedding)) AS dim,
        | round(sum(CAST(embedding[1] AS DOUBLE)), 2) AS sum_e1,
        | sum(CASE WHEN embedding[1] > 0 THEN 1 ELSE 0 END)::BIGINT AS n_pos
        |FROM embeddings GROUP BY label""".stripMargin,

    "q_map_fns" ->
      """WITH c AS (SELECT user_id, event_type, count(*) n FROM events
        |  WHERE user_id < 50 GROUP BY 1, 2),
        |m AS (SELECT user_id,
        |  map_from_entries(list_sort(list({'key': event_type, 'value': n}))) AS mm
        | FROM c GROUP BY user_id)
        |SELECT user_id, cardinality(mm)::INT AS n_keys,
        | array_to_string(list_sort(map_keys(mm)), '|') AS keys,
        | array_to_string(list_sort(map_values(mm)), '|') AS counts
        |FROM m""".stripMargin,

    "q_json_fns" ->
      """SELECT event_type, count(*) AS n,
        | sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
        | sum(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
        |     THEN 1 ELSE 0 END)::BIGINT AS n_gt50
        |FROM events GROUP BY event_type""".stripMargin,

    "q_json_variant" ->
      """SELECT event_type, count(k) AS n_k, sum(k)::BIGINT AS sum_k,
        | min(k) AS min_k, max(k) AS max_k
        |FROM (SELECT event_type,
        |  CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
        | FROM events)
        |GROUP BY event_type""".stripMargin,

    // json_extract_string must NEVER see an invalid document, even
    // behind a guarding OR/CASE: DuckDB's adaptive expression reordering
    // can evaluate the extract operand first (observed at sf0.1 only —
    // the reorder is selectivity-measured, i.e. data-dependent) and it
    // ERRORS on malformed input. NULL-ing the document before the
    // extract is the one ordering-proof guard.
    "q_json_malformed" ->
      """WITH r AS (SELECT event_type,
        |  CASE WHEN event_id % 10 = 0
        |    THEN substr(props, 1, length(props) - 2) ELSE props END AS raw
        |  FROM events),
        |p AS (SELECT event_type,
        |  json_extract_string(CASE WHEN json_valid(raw) THEN raw END, '$.k')
        |    AS ks
        |  FROM r)
        |SELECT event_type, count(*) AS n,
        | sum(CASE WHEN ks IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_bad,
        | sum(coalesce(ks::BIGINT, 0))::BIGINT AS sum_k
        |FROM p GROUP BY event_type""".stripMargin,

    "q_sql_cte" ->
      """WITH big AS (
        |  SELECT o_custkey, o_totalprice FROM orders
        |  WHERE o_totalprice > 200000),
        | agg AS (
        |  SELECT o_custkey, count(*) AS n,
        |    round(sum(o_totalprice), 2) AS rev
        |  FROM big GROUP BY o_custkey)
        |SELECT count(*) AS n_cust, round(sum(rev), 2) AS total_rev,
        |  max(n) AS max_orders
        |FROM agg""".stripMargin,

    "q_window_sliding" ->
      """SELECT win_start, count(*) AS n, round(sum(value), 2) AS sum_v
        |FROM (
        |  SELECT unnest([
        |      time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP),
        |      time_bucket(INTERVAL '30 minutes', ts::TIMESTAMP)
        |        - INTERVAL '30 minutes']) AS win_start,
        |    value
        |  FROM events)
        |GROUP BY win_start""".stripMargin,

    "q_time_bucket" ->
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS h, count(*) AS n,
        | round(sum(value), 2) AS sum_v
        |FROM events GROUP BY 1""".stripMargin,

    "q_sessionize" ->
      """WITH g AS (
        | SELECT user_id, event_id, epoch_us(ts::TIMESTAMP) AS us,
        |  lag(epoch_us(ts::TIMESTAMP)) OVER
        |    (PARTITION BY user_id ORDER BY epoch_us(ts::TIMESTAMP), event_id) AS prev
        | FROM events),
        |s AS (
        | SELECT user_id,
        |  sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
        |   OVER (PARTITION BY user_id ORDER BY us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS sess_id
        | FROM g),
        |c AS (SELECT user_id, sess_id, count(*) AS sess_n FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions, max(sess_n) AS max_sess_events
        |FROM c GROUP BY user_id""".stripMargin,

    "q_dedup_exact" ->
      """SELECT count(DISTINCT event_id) AS n_ids,
        | count(DISTINCT (user_id, event_type)) AS n_user_type
        |FROM events""".stripMargin,

    "q_udf_clamp" ->
      """SELECT event_type,
        | round(sum(least(greatest(value, 0), 10)), 2) AS sum_clamped
        |FROM events GROUP BY event_type""".stripMargin,

    "q_having" ->
      """SELECT count(*) AS n_big, round(max(sum_qty), 2) AS max_qty
        |FROM (SELECT l_orderkey, round(sum(l_quantity), 2) AS sum_qty
        |      FROM lineitem GROUP BY l_orderkey
        |      HAVING round(sum(l_quantity), 2) > 150)""".stripMargin,

    "q_sql_tpch_q3" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | o_orderdate
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING' AND c_custkey = o_custkey
        |  AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1995-03-15'
        |  AND l_shipdate > TIMESTAMP '1995-03-15'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,

    "q_subquery_exists" ->
      """SELECT c_mktsegment, count(*) AS n
        |FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |   WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)
        |  AND NOT EXISTS (SELECT 1 FROM orders o2
        |   WHERE o2.o_custkey = c.c_custkey AND o2.o_orderstatus = 'F')
        |GROUP BY c_mktsegment""".stripMargin,

    "q_subquery_in" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer
        |                    WHERE c_acctbal > 8000)
        |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem
        |                         WHERE l_quantity > 49)
        |GROUP BY o_orderpriority""".stripMargin,

    "q_lateral_view" ->
      """SELECT word, count(*) AS n, round(avg(p_retailprice), 2) AS avg_price
        |FROM (SELECT unnest(string_split(p_name, ' ')) AS word,
        |             p_retailprice
        |      FROM part)
        |GROUP BY word""".stripMargin,

    "q_agg_bool_bit" ->
      """SELECT l_linestatus,
        | bool_and(l_quantity < 50) AS all_small,
        | bool_or(l_discount > 0.09) AS any_highdisc,
        | bit_and(l_linenumber) AS band,
        | bit_or(l_linenumber) AS bor,
        | bit_xor(l_linenumber) AS bxor,
        | count(*) AS n
        |FROM lineitem GROUP BY l_linestatus""".stripMargin,

    "q_gap_fill" ->
      """WITH h AS (
        |  SELECT date_trunc('hour', ts::TIMESTAMP) AS hour,
        |         count(*) AS n_obs
        |  FROM events
        |  WHERE extract('hour' FROM ts::TIMESTAMP) <> 3
        |  GROUP BY 1),
        | g AS (
        |  SELECT unnest(generate_series((SELECT min(hour) FROM h),
        |    (SELECT max(hour) FROM h), INTERVAL 1 HOUR)) AS hour)
        |SELECT g.hour, coalesce(h.n_obs, 0) AS n,
        |  last_value(h.n_obs IGNORE NULLS)
        |    OVER (ORDER BY g.hour
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_n
        |FROM g LEFT JOIN h ON g.hour = h.hour""".stripMargin,

    "q_outlier_zscore" ->
      """WITH s AS (
        |  SELECT l_returnflag, avg(l_extendedprice) AS mu,
        |         stddev_pop(l_extendedprice) AS sigma
        |  FROM lineitem GROUP BY 1)
        |SELECT l.l_returnflag, count(*) AS n_outliers,
        |  round(max((l_extendedprice - mu) / sigma), 2) AS max_z
        |FROM lineitem l JOIN s ON l.l_returnflag = s.l_returnflag
        |WHERE (l_extendedprice - mu) / sigma > 1.5
        |GROUP BY l.l_returnflag""".stripMargin,

    "q_join_nullsafe" ->
      """WITH o AS (SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL
        |    ELSE o_custkey END AS k, o_totalprice FROM orders),
        | c AS (SELECT CASE WHEN c_custkey % 5 = 0 THEN NULL
        |    ELSE c_custkey END AS k, c_mktsegment FROM customer)
        |SELECT count(*) AS n,
        | sum(CASE WHEN o.k IS NULL THEN 1 ELSE 0 END)::BIGINT
        |   AS n_null_matches
        |FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k""".stripMargin,

    "q_join_shuffle_hash" ->
      """SELECT c_mktsegment, count(*) AS n,
        | round(avg(o_totalprice), 2) AS avg_price
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    "q_join_bucketed" ->
      """SELECT c_mktsegment, count(*) AS n,
        | round(sum(o_totalprice), 2) AS rev
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,

    // Bloom pre-filter is an optimization, not a semantics change: the
    // oracle is the plain semi-join the pruned plan must reproduce
    "q_bloom_prune" ->
      """SELECT l_returnflag, count(*) AS n,
        | round(sum(l_extendedprice), 2) AS rev
        |FROM lineitem
        |WHERE l_orderkey IN (SELECT o_orderkey FROM orders
        |    WHERE o_totalprice > 300000)
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_edit_distance" ->
      """WITH p AS (SELECT p_partkey, p_brand, p_name FROM part
        |           WHERE p_partkey < 300)
        |SELECT a.p_partkey AS id_a, b.p_partkey AS id_b,
        | levenshtein(a.p_name, b.p_name) AS dist
        |FROM p a JOIN p b ON a.p_brand = b.p_brand
        |WHERE a.p_partkey < b.p_partkey
        |  AND levenshtein(a.p_name, b.p_name) <= 12""".stripMargin,

    "q_zorder_layout" ->
      """SELECT p_partkey, p_size, (sx | (sy * 2)) AS zval
        |FROM (
        | SELECT p_partkey, p_size,
        |  ((dx | (dx << 1)) & 1431655765) AS sx,
        |  ((dy | (dy << 1)) & 1431655765) AS sy
        | FROM (
        |  SELECT p_partkey, p_size,
        |   ((cx | (cx << 2)) & 858993459) AS dx,
        |   ((cy | (cy << 2)) & 858993459) AS dy
        |  FROM (
        |   SELECT p_partkey, p_size,
        |    ((bx | (bx << 4)) & 252645135) AS cx,
        |    ((by | (by << 4)) & 252645135) AS cy
        |   FROM (
        |    SELECT p_partkey, p_size,
        |     ((x | (x << 8)) & 16711935) AS bx,
        |     ((y | (y << 8)) & 16711935) AS by
        |    FROM (SELECT p_partkey, p_size, p_size::BIGINT AS x,
        |                 (p_partkey % 65536)::BIGINT AS y
        |          FROM part WHERE p_partkey < 500)))))""".stripMargin,

    "q_udaf_weighted_avg" ->
      """SELECT l_returnflag,
        | round(sum(l_extendedprice*l_quantity)/sum(l_quantity), 2) AS wavg_price
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_regr_fns" ->
      """SELECT l_returnflag,
        | round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        | round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        | round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        | regr_count(l_extendedprice, l_quantity)::BIGINT AS n
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_array_hof" ->
      """SELECT vec_id,
        | round(list_reduce(list_transform(embedding,
        |   x -> CAST(x AS DOUBLE) * 2), (a, b) -> a + b), 4) AS sum2x,
        | len(list_filter(embedding, x -> x > 0))::INT AS n_pos,
        | len(list_filter(embedding, x -> x > 0.2)) > 0 AS has_big,
        | len(list_filter(embedding, x -> abs(x) <= 1)) = len(embedding)
        |   AS all_unit
        |FROM embeddings WHERE vec_id < 200""".stripMargin,

    "q_url_fns" ->
      """SELECT doc_id,
        | source || '.example.com' AS host,
        | '/' || lang || '/doc-' || doc_id::VARCHAR AS path,
        | (doc_id % 7)::VARCHAR AS k
        |FROM documents WHERE doc_id < 500""".stripMargin,

    "q_ip_cidr" ->
      """WITH ips AS (
        | SELECT user_id,
        |  '10.' || (event_id % 64)::VARCHAR || '.' ||
        |  ((event_id // 64) % 200)::VARCHAR || '.' ||
        |  ((event_id * 7 + 3) % 256)::VARCHAR AS ip
        | FROM events),
        |parsed AS (
        | SELECT user_id,
        |  ((string_split(ip, '.')[1]::BIGINT * 256 +
        |    string_split(ip, '.')[2]::BIGINT) * 256 +
        |    string_split(ip, '.')[3]::BIGINT) * 256 +
        |    string_split(ip, '.')[4]::BIGINT AS ip_int
        | FROM ips)
        |SELECT '10.42.' || ((ip_int >> 8) & 255)::VARCHAR || '.0/24'
        |   AS prefix24,
        | count(*) AS n_events, count(DISTINCT user_id) AS n_users
        |FROM parsed WHERE (ip_int >> 16) = 2602
        |GROUP BY 1""".stripMargin,

    "q_try_arith" ->
      """SELECT o_orderkey,
        | round(o_totalprice / NULLIF(CASE WHEN o_custkey % 3 = 2 THEN 3
        |                             ELSE o_custkey % 3 END, 0), 2)
        |   AS safe_div,
        | TRY_CAST(o_orderpriority AS INTEGER) AS prio_int,
        | CASE WHEN o_orderkey > 0 THEN NULL
        |      ELSE 9223372036854775807 + o_orderkey END AS ovf
        |FROM orders WHERE o_orderkey < 2000""".stripMargin,

    "q_grouping_id" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | (GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus))::INT AS gid
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_sql_tpch_q10" ->
      """SELECT c_custkey, c_name, n_name,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY c_custkey, c_name, n_name
        |ORDER BY revenue DESC, c_custkey
        |LIMIT 20""".stripMargin,

    "q_dq_audit" ->
      """SELECT count(*) AS n_rows,
        | sum(CASE WHEN l_quantity BETWEEN 1 AND 50 THEN 0 ELSE 1 END)
        |   ::BIGINT AS bad_quantity,
        | sum(CASE WHEN l_discount BETWEEN 0 AND 0.1 THEN 0 ELSE 1 END)
        |   ::BIGINT AS bad_discount,
        | sum(CASE WHEN l_extendedprice > 0 THEN 0 ELSE 1 END)
        |   ::BIGINT AS bad_price,
        | sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
        |   ::BIGINT AS null_shipdate,
        | (SELECT count(*) FROM (SELECT 1 FROM lineitem
        |    GROUP BY l_orderkey, l_linenumber HAVING count(*) > 1))
        |   AS dup_pk,
        | (SELECT count(*) FROM lineitem l WHERE NOT EXISTS
        |    (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
        |   AS orphan_lineitems
        |FROM lineitem""".stripMargin,

    "q_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice,
        |   1 AS _v FROM orders),
        |changes AS (SELECT o_orderkey, 'U' AS o_orderstatus,
        |   o_totalprice * 2 AS o_totalprice, 2 AS _v
        |  FROM orders WHERE o_orderkey % 7 = 0),
        |merged AS (SELECT *, row_number() OVER (PARTITION BY o_orderkey
        |    ORDER BY _v DESC) AS rn
        |  FROM (SELECT * FROM base UNION ALL SELECT * FROM changes))
        |SELECT o_orderstatus, count(*) AS n,
        | round(sum(o_totalprice), 2) AS total
        |FROM merged WHERE rn = 1 GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_sql_tpch_q6" ->
      """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07
        |  AND l_quantity < 24""".stripMargin,

    "q_sql_tpch_q14" ->
      """SELECT round(100.0 *
        |   sum(CASE WHEN p_type = 'PROMO'
        |       THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        |   / sum(l_extendedprice * (1 - l_discount)), 2)
        |  AS promo_revenue
        |FROM lineitem, part
        |WHERE l_partkey = p_partkey
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'""".stripMargin,

    "q_sql_tpch_q15" ->
      """WITH revenue AS (
        |  SELECT l_suppkey AS supplier_no,
        |   round(sum(l_extendedprice * (1 - l_discount)), 2)
        |     AS total_revenue
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-07-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_revenue
        |FROM supplier, revenue
        |WHERE s_suppkey = supplier_no
        |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
        |ORDER BY s_suppkey""".stripMargin,

    "q_sql_tpch_q19" ->
      """SELECT round(sum(l_extendedprice * (1 - l_discount)), 2)
        |  AS revenue
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey
        |  AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
        |        AND l_quantity BETWEEN 1 AND 11)
        |    OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
        |        AND l_quantity BETWEEN 10 AND 20)
        |    OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 35
        |        AND l_quantity BETWEEN 20 AND 30))""".stripMargin,

    "q_sql_tpch_q7" ->
      """SELECT supp_nation, cust_nation, l_year,
        | round(sum(volume), 2) AS revenue
        |FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |   year(l_shipdate) AS l_year,
        |   l_extendedprice * (1 - l_discount) AS volume
        |  FROM supplier, lineitem, orders, customer,
        |   nation n1, nation n2
        |  WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        |   AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        |   AND c_nationkey = n2.n_nationkey
        |   AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |   AND l_shipdate BETWEEN TIMESTAMP '1996-01-01'
        |     AND TIMESTAMP '1997-12-31') shipping
        |GROUP BY supp_nation, cust_nation, l_year
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

    "q_sql_tpch_q8" ->
      """SELECT o_year,
        | round(sum(CASE WHEN nation = 'NATION_1' THEN volume
        |     ELSE 0 END) / sum(volume), 4) AS mkt_share
        |FROM (SELECT year(o_orderdate) AS o_year,
        |   l_extendedprice * (1 - l_discount) AS volume,
        |   n2.n_name AS nation
        |  FROM part, supplier, lineitem, orders, customer,
        |   nation n1, nation n2, region
        |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        |   AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        |   AND c_nationkey = n1.n_nationkey
        |   AND n1.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |   AND s_nationkey = n2.n_nationkey
        |   AND o_orderdate BETWEEN TIMESTAMP '1996-01-01'
        |     AND TIMESTAMP '1997-12-31'
        |   AND p_type = 'PROMO') all_nations
        |GROUP BY o_year ORDER BY o_year""".stripMargin,

    "q_sql_tpch_q13" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT OUTER JOIN orders
        |    ON c_custkey = o_custkey
        |  GROUP BY c_custkey) c_orders
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

    "q_sql_tpch_q18" ->
      """SELECT c_custkey, o_orderkey, o_orderdate,
        | round(o_totalprice, 2) AS o_totalprice,
        | sum(l_quantity) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
        |   GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
        |LIMIT 100""".stripMargin,

    "q_sql_tpch_q22" ->
      """SELECT c_nationkey AS cntrycode, count(*) AS numcust,
        | round(sum(c_acctbal), 2) AS totacctbal
        |FROM customer c
        |WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
        |    WHERE c_acctbal > 0)
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey
        |      AND o.o_totalprice > 300000)
        |GROUP BY c_nationkey ORDER BY cntrycode""".stripMargin,

    "q_sql_tpch_q2" ->
      """SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
        | p_partkey, p_type
        |FROM part, supplier,
        |  (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps,
        |  nation, region
        |WHERE p_partkey = ps.l_partkey AND s_suppkey = ps.l_suppkey
        |  AND p_size <= 15 AND p_type = 'LARGE'
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'EUROPE'
        |  AND s_acctbal = (SELECT min(s2.s_acctbal)
        |     FROM supplier s2,
        |       (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps2,
        |       nation n2, region r2
        |     WHERE ps2.l_partkey = p_partkey
        |       AND s2.s_suppkey = ps2.l_suppkey
        |       AND s2.s_nationkey = n2.n_nationkey
        |       AND n2.n_regionkey = r2.r_regionkey
        |       AND r2.r_name = 'EUROPE')
        |ORDER BY s_acctbal, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,

    "q_sql_tpch_q4" ->
      """SELECT o_orderpriority, count(*) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |     WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "q_sql_tpch_q9" ->
      """SELECT nation, o_year, round(sum(amount), 2) AS sum_profit
        |FROM (SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |        l_extendedprice * (1 - l_discount)
        |          - 0.5 * p_retailprice * l_quantity AS amount
        |      FROM part, supplier, lineitem, orders, nation
        |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        |        AND o_orderkey = l_orderkey
        |        AND s_nationkey = n_nationkey
        |        AND p_name LIKE '%red%') profit
        |GROUP BY nation, o_year
        |ORDER BY nation, o_year DESC""".stripMargin,

    "q_sql_tpch_q11" ->
      """SELECT l_partkey AS ps_partkey,
        | round(sum(l_extendedprice * l_quantity), 2) AS value
        |FROM lineitem, supplier, nation
        |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |  AND n_nationkey < 8
        |GROUP BY l_partkey
        |HAVING sum(l_extendedprice * l_quantity) >
        |  (SELECT 1.5 * sum(l_extendedprice * l_quantity)
        |     / count(DISTINCT l_partkey)
        |   FROM lineitem, supplier, nation
        |   WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
        |     AND n_nationkey < 8)
        |ORDER BY value DESC, ps_partkey LIMIT 100""".stripMargin,

    "q_sql_tpch_q12" ->
      """SELECT l_linestatus,
        | sum(CASE WHEN o_orderpriority = '1-URGENT'
        |       OR o_orderpriority = '2-HIGH'
        |      THEN 1 ELSE 0 END)::BIGINT AS high_line_count,
        | sum(CASE WHEN o_orderpriority <> '1-URGENT'
        |       AND o_orderpriority <> '2-HIGH'
        |      THEN 1 ELSE 0 END)::BIGINT AS low_line_count
        |FROM orders, lineitem
        |WHERE o_orderkey = l_orderkey
        |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
        |  AND l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin,

    "q_sql_tpch_q16" ->
      """SELECT p_brand, p_type, p_size,
        | count(DISTINCT ps.l_suppkey) AS supplier_cnt
        |FROM (SELECT DISTINCT l_partkey, l_suppkey
        |      FROM lineitem) ps, part
        |WHERE p_partkey = ps.l_partkey
        |  AND p_brand <> 'Brand#45' AND p_type <> 'MEDIUM'
        |  AND p_size IN (1, 4, 7, 10, 14, 19, 25, 36, 45, 49)
        |  AND ps.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |      WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
        |LIMIT 100""".stripMargin,

    "q_sql_tpch_q17" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_brand = 'Brand#23'
        |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
        |     FROM lineitem l2 WHERE l2.l_partkey = p_partkey)
        |""".stripMargin,

    "q_sql_tpch_q20" ->
      """SELECT s_name, round(s_acctbal, 2) AS s_acctbal
        |FROM supplier, nation
        |WHERE s_suppkey IN (
        |    SELECT l_suppkey FROM lineitem
        |    WHERE l_partkey IN (SELECT p_partkey FROM part
        |        WHERE p_name LIKE 'red%')
        |      AND l_shipdate >= TIMESTAMP '1997-01-01'
        |      AND l_shipdate < TIMESTAMP '1998-01-01'
        |    GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
        |  AND s_nationkey = n_nationkey AND n_name = 'NATION_3'
        |ORDER BY s_name""".stripMargin,

    "q_sql_tpch_q21" ->
      """SELECT s_name, count(*) AS numwait
        |FROM supplier, lineitem l1, orders, nation
        |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |     WHERE l2.l_orderkey = l1.l_orderkey
        |       AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |     WHERE l3.l_orderkey = l1.l_orderkey
        |       AND l3.l_suppkey <> l1.l_suppkey
        |       AND l3.l_returnflag = 'R')
        |  AND s_nationkey = n_nationkey AND n_nationkey < 13
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name LIMIT 100""".stripMargin,

    "q_interpolate" ->
      """WITH hb AS (SELECT event_type,
        |   date_trunc('hour', ts::TIMESTAMP) AS hour, count(*)::DOUBLE AS v
        |  FROM events WHERE hour(ts::TIMESTAMP) <> 3 GROUP BY 1, 2),
        |span AS (SELECT event_type, min(hour) AS lo, max(hour) AS hi
        |  FROM hb GROUP BY 1),
        |grid AS (SELECT event_type,
        |   unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
        |  FROM span),
        |g AS (SELECT grid.event_type, grid.hour, hb.v
        |  FROM grid LEFT JOIN hb
        |    ON grid.event_type = hb.event_type AND grid.hour = hb.hour),
        |f AS (SELECT event_type, hour, v,
        |   last_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |     ORDER BY hour ROWS UNBOUNDED PRECEDING) AS pv,
        |   last_value(CASE WHEN v IS NOT NULL THEN epoch_us(hour) END
        |     IGNORE NULLS) OVER (PARTITION BY event_type
        |     ORDER BY hour ROWS UNBOUNDED PRECEDING) AS pt,
        |   first_value(v IGNORE NULLS) OVER (PARTITION BY event_type
        |     ORDER BY hour ROWS BETWEEN CURRENT ROW AND
        |     UNBOUNDED FOLLOWING) AS nv,
        |   first_value(CASE WHEN v IS NOT NULL THEN epoch_us(hour) END
        |     IGNORE NULLS) OVER (PARTITION BY event_type
        |     ORDER BY hour ROWS BETWEEN CURRENT ROW AND
        |     UNBOUNDED FOLLOWING) AS nt
        |  FROM g)
        |SELECT event_type, hour,
        | round(CASE WHEN v IS NOT NULL THEN v
        |  WHEN pv IS NOT NULL AND nv IS NOT NULL THEN
        |   pv + (nv - pv) * ((epoch_us(hour) - pt)::DOUBLE
        |     / (nt - pt)::DOUBLE)
        |  ELSE coalesce(pv, nv) END, 4) AS v_fill,
        | v IS NULL AS was_gap
        |FROM f""".stripMargin,

    "q_global_rownum" ->
      """SELECT event_id,
        | row_number() OVER (ORDER BY value, event_id) AS rn
        |FROM events""".stripMargin,

    "q_profile_table" ->
      """WITH u AS (
        |  SELECT 'l_quantity' AS col_name, l_quantity::DOUBLE AS v FROM lineitem
        |  UNION ALL
        |  SELECT 'l_extendedprice', l_extendedprice::DOUBLE FROM lineitem
        |  UNION ALL
        |  SELECT 'l_discount', l_discount::DOUBLE FROM lineitem
        |  UNION ALL
        |  SELECT 'l_tax', l_tax::DOUBLE FROM lineitem)
        |SELECT col_name, count(*) AS n,
        | sum(CASE WHEN v IS NULL THEN 1 ELSE 0 END)::BIGINT AS n_null,
        | count(DISTINCT v) AS n_distinct,
        | round(min(v), 2) AS min_v, round(max(v), 2) AS max_v,
        | round(avg(v), 4) AS mean_v
        |FROM u GROUP BY col_name ORDER BY col_name""".stripMargin,

    "q_union_by_name" ->
      """WITH v1 AS (SELECT o_orderkey, o_totalprice, o_orderstatus
        |  FROM orders WHERE o_orderkey % 2 = 0),
        |v2 AS (SELECT o_orderkey, o_totalprice, o_orderdate
        |  FROM orders WHERE o_orderkey % 2 = 1),
        |u AS (SELECT *, NULL AS o_orderdate FROM v1
        |  UNION ALL
        |  SELECT o_orderkey, o_totalprice, NULL AS o_orderstatus,
        |    o_orderdate
        |  FROM v2)
        |SELECT o_orderstatus IS NULL AS from_v2, count(*) AS n,
        | round(sum(o_totalprice), 2) AS total,
        | count(o_orderstatus) AS n_status, count(o_orderdate) AS n_date
        |FROM u GROUP BY from_v2 ORDER BY from_v2""".stripMargin
  )
}
