package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics operators over the `events` table — the query
  * family a log/event engine's users actually run on their ingested
  * streams (funnels, cohort retention, state transitions, Pareto
  * frontiers). The reference's domain is event pipelines
  * (`/root/reference/types.go:13-38` — keyed, timestamped messages);
  * these are the standard OLAP consumers of that data model, built
  * Spark-first.
  *
  * Scale shapes: every query here shuffles at most by `user_id` (150 at
  * sf0.01, millions in production — a fine shuffle key with no skew since
  * per-user event counts are bounded), or sorts once globally on an
  * analytic axis. Nothing is quadratic; nothing collects to the driver.
  */
object EventQueries {
  private type Q = (SparkSession, String) => DataFrame

  /** User co-occurrence graph shared by the triangle/community queries:
    * an edge joins two users seen in the same (hour, event_type) basket
    * at least `minSupport` times. Built on [[graft.ops.Graph.frequentPairs]],
    * so the pair blow-up is bounded per basket, never corpus². */
  private def userCooccurEdges(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
        struct(date_trunc("hour", col("ts")).as("h"), col("event_type"))
          .as("basket"))
    graft.ops.Graph.frequentPairs(ev, "basket", "user_id", minSupport = 3L)
  }

  // DuckDB twin of [[userCooccurEdges]] — keep in sync.
  private val sqlCooccurEdges =
    """ut AS (SELECT DISTINCT date_trunc('hour', ts) AS h, event_type,
      |   user_id FROM events),
      |e AS (SELECT a.user_id AS a, b.user_id AS b
      |  FROM ut a JOIN ut b ON a.h = b.h AND a.event_type = b.event_type
      |   AND a.user_id < b.user_id
      |  GROUP BY 1, 2 HAVING count(*) >= 3)""".stripMargin

  val queries: Map[String, Q] = Map(
    // ---- funnel conversion (view → click → purchase) -----------------
    // ordered-step funnel: t1 = first view, t2 = first click at/after
    // t1, t3 = first purchase at/after t2; counts = users reaching each
    // step. Three aggregations keyed by user_id — AQE plans them as one
    // shuffle lineage (same key), and each stage's join input is the
    // per-user step table (|users| rows, not |events|), so the event log
    // is scanned, never re-shuffled whole.
    "q_funnel_steps" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
        .filter(col("t1").isNotNull)
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t2"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") >= col("t2"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.join(s2, Seq("user_id"), "left").join(s3, Seq("user_id"), "left")
        .agg(count("t1").as("n_view"),
          count("t2").as("n_view_click"),
          count("t3").as("n_view_click_purchase"))
    }),

    // ---- windowed funnel ---------------------------------------------
    // the production funnel form: each step must land within a horizon
    // of the FIRST step (click ≤ 1 day after view, purchase ≤ 3 days
    // after view) — without the horizon, month-old views "convert" on
    // unrelated purchases. Same per-user step-table shape as
    // q_funnel_steps, horizon predicates pushed into each stage's join.
    "q_funnel_window" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
        .filter(col("t1").isNotNull)
      val s2 = ev.filter(col("event_type") === "click")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t1") &&
          col("ts") <= col("t1") + expr("interval 1 day"))
        .groupBy("user_id").agg(min("ts").as("t2"), first("t1").as("t1"))
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s2, Seq("user_id"))
        .filter(col("ts") >= col("t2") &&
          col("ts") <= col("t1") + expr("interval 3 days"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.join(s2.select("user_id", "t2"), Seq("user_id"), "left")
        .join(s3, Seq("user_id"), "left")
        .agg(count("t1").as("n_view"),
          count("t2").as("n_click_1d"),
          count("t3").as("n_purchase_3d"))
    }),

    // ---- conversion lag ----------------------------------------------
    // time-to-convert for funnel completers: seconds from first view to
    // first purchase at/after it. Same per-user step tables as
    // q_funnel_steps; second-resolution via unix_timestamp floor-each,
    // which matches DuckDB's boundary-crossing date_diff exactly.
    "q_conversion_lag" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val s1 = ev.groupBy("user_id")
        .agg(min(when(col("event_type") === "view", col("ts"))).as("t1"))
        .filter(col("t1").isNotNull)
      val s3 = ev.filter(col("event_type") === "purchase")
        .join(s1, Seq("user_id"))
        .filter(col("ts") >= col("t1"))
        .groupBy("user_id").agg(min("ts").as("t3"))
      s1.join(s3, Seq("user_id"))
        .select((unix_timestamp(col("t3")) - unix_timestamp(col("t1")))
          .as("lag_sec"))
        .agg(count(lit(1)).as("n_converted"),
          (floor(avg("lag_sec") * 100 + 0.5) / 100).as("avg_lag_sec"),
          max("lag_sec").as("max_lag_sec"))
    }),

    // ---- weight of evidence / information value ----------------------
    // the credit-scoring feature diagnostic, run on sessionized events:
    // does session length predict purchase? Sessions = 30-min-gap splits
    // per user (same convention as q_sessionize); bin = session length
    // capped at 8; WOE_i = ln(dist_good_i / dist_bad_i) with +0.5
    // Laplace smoothing per bin, IV term = (dg - db)·WOE. Scale shape:
    // one per-user window pass (bounded partitions), one groupBy
    // (user, sid), one groupBy bin (≤8 rows) — the totals row is a
    // broadcast scalar join on the TINY binned aggregate, and every
    // float derives deterministically from integer counts (no
    // partition-order sums).
    "q_woe_iv" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id").orderBy("ts")
      val prevUs = lag(unix_micros(col("ts")), 1).over(w)
      val sess = ev
        .withColumn("brk",
          when(prevUs.isNull ||
            unix_micros(col("ts")) - prevUs > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sid", sum("brk").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "sid")
        .agg(count(lit(1)).as("len"),
          max(when(col("event_type") === "purchase", 1).otherwise(0)).as("lab"))
      val binned = sess.groupBy(least(col("len"), lit(8)).as("bin"))
        .agg(sum(when(col("lab") === 1, 1L).otherwise(0L)).as("n_good"),
          sum(when(col("lab") === 0, 1L).otherwise(0L)).as("n_bad"))
      val tot = binned.agg(sum("n_good").as("gt"), sum("n_bad").as("bt"),
        count(lit(1)).cast("long").as("k"))
      val dg = (col("n_good") + lit(0.5)) / (col("gt") + lit(0.5) * col("k"))
      val db = (col("n_bad") + lit(0.5)) / (col("bt") + lit(0.5) * col("k"))
      binned.join(broadcast(tot))
        .select(col("bin"), col("n_good"), col("n_bad"),
          (floor(log(dg / db) * 10000 + 0.5) / 10000).as("woe"),
          (floor((dg - db) * log(dg / db) * 1000000 + 0.5) / 1000000).as("iv_term"))
        .orderBy("bin")
    }),

    // ---- cohort retention --------------------------------------------
    // users grouped by first-seen day; for each cohort, distinct active
    // users at day offsets 0..7. The cohort table is |users| rows and
    // joins back to events on user_id (broadcast at any realistic
    // users-to-events ratio is wrong — users is the BIG dim here, so
    // this stays a shuffle join on the same user_id key as the cohort
    // aggregation, which AQE co-locates).
    "q_retention_cohort" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val cohort = ev.groupBy("user_id")
        .agg(min(to_date(col("ts"))).as("d0"))
      ev.select(col("user_id"), to_date(col("ts")).as("day"))
        .join(cohort, Seq("user_id"))
        .withColumn("day_offset", datediff(col("day"), col("d0")))
        .filter(col("day_offset").between(0, 7))
        .groupBy("d0", "day_offset")
        .agg(count_distinct(col("user_id")).as("n_active"))
        .orderBy("d0", "day_offset")
    }),

    // ---- event-type transition matrix --------------------------------
    // per-user Markov transition counts: lag(event_type) over the
    // user's event-time order (event_id tie-break — synthetic ts can
    // collide), then count (prev, curr) pairs. One window shuffle by
    // user_id, one tiny |types|² aggregation.
    "q_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("prev_type", lag("event_type", 1).over(w))
        .filter(col("prev_type").isNotNull)
        .groupBy(col("prev_type"), col("event_type").as("curr_type"))
        .agg(count(lit(1)).as("n"))
        .orderBy("prev_type", "curr_type")
    }),

    // ---- nearest-event as-of join ------------------------------------
    // for each click, the temporally NEAREST purchase by the same user
    // (backward OR forward — attribution when the touchpoint can precede
    // or follow). One tagged union + one (user, ts)-sorted window pass
    // with two frames: running last purchase (backward) and running
    // first purchase (forward) — never the |clicks|×|purchases|
    // inequality join. Ties (equal gap both ways) resolve backward,
    // matching the oracle's ORDER BY abs(gap), ts.
    "q_join_asof_nearest" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          lit(null).cast("long").as("event_id"))
      // purchases sort before clicks at equal ts (tag 0 < 1), so a
      // same-instant purchase lands in the backward frame with gap 0
      val tagged = buys.withColumn("tag", lit(0))
        .withColumn("bts", col("ts"))
        .unionByName(clicks.withColumn("tag", lit(1))
          .withColumn("bts", lit(null).cast("timestamp")))
      val ord = Window.partitionBy("user_id").orderBy("ts", "tag")
      val back = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      tagged
        .withColumn("prev_buy", last("bts", ignoreNulls = true).over(back))
        .withColumn("next_buy", first("bts", ignoreNulls = true).over(fwd))
        .filter(col("tag") === 1)
        .withColumn("gap_back",
          unix_timestamp(col("ts")) - unix_timestamp(col("prev_buy")))
        .withColumn("gap_fwd",
          unix_timestamp(col("next_buy")) - unix_timestamp(col("ts")))
        .withColumn("nearest_gap_sec",
          when(col("gap_back").isNotNull &&
              (col("gap_fwd").isNull || col("gap_back") <= col("gap_fwd")),
            col("gap_back")).otherwise(col("gap_fwd")))
        .filter(col("user_id") < 30 && col("nearest_gap_sec").isNotNull)
        .select(col("user_id"), col("event_id"), col("nearest_gap_sec"))
        .orderBy("user_id", "event_id")
    }),

    // ---- RFM segmentation (recency / frequency / monetary) -----------
    // the classic customer-value cut: per-customer aggregate (one
    // custkey-keyed shuffle with map-side combine), recency against the
    // dataset's max date (broadcast scalar), threshold CASE into
    // segments, then a tiny per-segment rollup. Two aggregates total —
    // the segmentation itself costs nothing beyond the fact scan.
    "q_rfm_segments" -> ((s, d) => {
      val o = Tables.orders(s, d)
      val maxD = o.agg(max("o_orderdate").as("max_d"))
      o.groupBy("o_custkey")
        .agg(max("o_orderdate").as("last_d"),
          count(lit(1)).as("freq"), sum("o_totalprice").as("monetary"))
        .crossJoin(broadcast(maxD))
        .withColumn("recency_days", datediff(col("max_d"), col("last_d")))
        .withColumn("segment",
          when(col("recency_days") <= 60 && col("freq") >= 12, "champion")
            .when(col("recency_days") <= 180, "active")
            .otherwise("lapsed"))
        .groupBy("segment")
        .agg(count(lit(1)).as("n_customers"),
          (floor(avg("freq") * 100 + 0.5) / 100).as("avg_freq"),
          (floor(avg("monetary") * 100 + 0.5) / 100).as("avg_monetary"),
          max("recency_days").as("max_recency"))
        .orderBy("segment")
    }),

    // ---- A/B test statistic (Welch's t) ------------------------------
    // two-sample mean comparison between event cohorts: per-group
    // (n, mean, variance) is ONE map-side-combined aggregate over the
    // log; the t statistic assembles from the two single-row sides.
    // This is the whole experiment-analysis pattern at scale — the
    // scan cost is the aggregate, the statistics are free.
    "q_abtest_welch" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "view"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"), avg("value").as("m"),
          var_samp(col("value")).as("v"))
      val a = ev.filter(col("event_type") === "click")
        .select(col("n").as("n_a"), col("m").as("m_a"), col("v").as("v_a"))
      val b = ev.filter(col("event_type") === "view")
        .select(col("n").as("n_b"), col("m").as("m_b"), col("v").as("v_b"))
      a.crossJoin(b).select(
        col("n_a"), col("n_b"),
        (floor(col("m_a") * 1000 + 0.5) / 1000).as("mean_a"),
        (floor(col("m_b") * 1000 + 0.5) / 1000).as("mean_b"),
        (floor((col("m_a") - col("m_b")) /
          sqrt(col("v_a") / col("n_a") + col("v_b") / col("n_b")) * 1000
          + 0.5) / 1000).as("t_welch"))
    }),

    // chi-square test of independence (event_type × value-bucket
    // contingency table): X² = Σ (O−E)²/E with E = row·col/N. Cell,
    // row and column totals are three integer-exact aggregates over the
    // |types|·|buckets| table; the only float work is the final
    // bounded-size sum. N rides along as a fourth cells-sized aggregate
    // broadcast back in — NOT a driver-side ev.count(), which would be a
    // second full scan of the fact table at 100 TB
    "q_chi2" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type").as("t"),
          floor(col("value") / 250.0).cast("int").as("b"))
      val cells = ev.groupBy("t", "b").agg(count(lit(1)).as("o"))
      val rowT = cells.groupBy("t").agg(sum("o").as("rt"))
      val colT = cells.groupBy("b").agg(sum("o").as("ct"))
      val total = cells.agg(sum("o").cast("double").as("n_total"))
      cells.join(broadcast(rowT), "t").join(broadcast(colT), "b")
        .crossJoin(broadcast(total))
        .withColumn("e", col("rt").cast("double") * col("ct") / col("n_total"))
        .withColumn("x2", pow(col("o") - col("e"), 2) / col("e"))
        .agg(count(lit(1)).as("n_cells"),
          ((count_distinct(col("t")) - 1) *
            (count_distinct(col("b")) - 1)).as("dof"),
          round(sum("x2"), 4).as("chi2"))
    }),

    // OHLC candlesticks — the canonical downsampling of a value stream
    // to per-bucket open/high/low/close: open/close are argmin/argmax
    // over the total (ts, event_id) order (deterministic under same-ts
    // ties), one day-keyed map-side-combined aggregate
    "q_ohlc" -> ((s, d) => {
      // open/close tie-break over the total (ts, event_id) order via a
      // zero-padded composite string key — lexicographic == numeric for
      // the padded nonnegative fields, and DuckDB's arg_min/arg_max
      // accept VARCHAR keys where they reject structs
      val ord = format_string("%020d|%020d",
        unix_micros(col("ts")), col("event_id"))
      Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .groupBy(to_date(col("ts")).as("day"))
        .agg(
          round(min_by(col("value"), ord), 2).as("open"),
          round(max("value"), 2).as("high"),
          round(min("value"), 2).as("low"),
          round(max_by(col("value"), ord), 2).as("close"),
          count(lit(1)).as("n_trades"),
          round(sum("value"), 2).as("volume"))
        .orderBy("day")
    }),

    // CUPED variance reduction (the industry-standard A/B sensitivity
    // boost): per-user post-period metric Y adjusted by the pre-period
    // covariate X via θ = cov(X,Y)/var(X), Y' = Y − θ(X − E[X]).
    // Reported: θ and the population variance before/after adjustment —
    // the % reduction is the whole point of the method. One user-keyed
    // shuffle + a 1-row broadcast of (θ, E[X])
    "q_cuped" -> ((s, d) => {
      val cut = lit("2024-01-15").cast("timestamp")
      val ev = Tables.events(s, d)
      val per = ev.groupBy("user_id")
        .agg(sum(when(col("ts") < cut, col("value")).otherwise(0.0)).as("x"),
          sum(when(col("ts") >= cut, col("value")).otherwise(0.0)).as("y"))
      val stats = per.agg(
        (covar_pop(col("x"), col("y")) / var_pop(col("x"))).as("theta"),
        avg("x").as("mx"))
      per.crossJoin(broadcast(stats))
        .withColumn("y_adj",
          col("y") - col("theta") * (col("x") - col("mx")))
        .agg(count(lit(1)).as("n_users"),
          round(max("theta"), 4).as("theta"),
          round(var_pop(col("y")), 2).as("var_y"),
          round(var_pop(col("y_adj")), 2).as("var_y_adj"),
          round((lit(1.0) - var_pop(col("y_adj")) / var_pop(col("y"))) * 100, 2)
            .as("var_reduction_pct"))
    }),

    // SPRT (Wald's sequential probability ratio test) — the early-stop
    // A/B monitor: Bernoulli observations x_i = (value > 500) over
    // purchases in (ts, event_id) order, H1 p=0.55 vs H0 p=0.45,
    // α=β=0.05. Cumulative LLR crosses ln(19) → accept H1, −ln(19) →
    // accept H0; reported: first crossing index + decision + final LLR.
    // One ordered cumsum window — the sequential scan is a single pass
    "q_sprt" -> ((s, d) => {
      val lr1 = math.log(0.55 / 0.45)
      val lr0 = math.log(0.45 / 0.55)
      val bound = math.log(19.0)
      val obs = Tables.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("ts"),
          when(col("value") > 500.0, 1L).otherwise(0L).as("x"))
      // the LLR prefix is a function of EXACT prefix counts:
      // s_i = successes·ln(p1/p0) + failures·ln((1−p1)/(1−p0)) — so the
      // sequential scan distributes via the two-phase long cumsum (no
      // single-partition window over the unbounded observation stream)
      // and both engines compute s from the same two products
      val cum = graft.ops.Layout.globalCumSum(obs, Seq("ts", "event_id"), Seq("x"))
        .withColumn("s",
          col("x_cum") * lit(lr1) + (col("rn") - col("x_cum")) * lit(lr0))
      val cross = cum.filter(abs(col("s")) >= bound)
        .agg(min("rn").as("first_cross"))
      cum.agg(count(lit(1)).as("n_obs"),
          round(max_by(col("s"), col("rn")), 4).as("final_llr"))
        .crossJoin(cross)
        .join(cum.select(col("rn").as("first_cross"), col("s").as("_cs")),
          Seq("first_cross"), "left")
        .select(col("n_obs"), col("first_cross"),
          when(col("_cs") >= bound, "accept_h1")
            .when(col("_cs") <= -bound, "accept_h0")
            .otherwise("continue").as("decision"),
          round(col("_cs"), 4).as("llr_at_cross"),
          col("final_llr"))
    }),

    // ---- burst / spike detection -------------------------------------
    // security-telemetry staple: bucket events per (type, hour), then
    // flag buckets where the count exceeds mean + 2σ for that type. The
    // per-type stats table is |types| rows — broadcast back onto the
    // bucket counts, so the event log is aggregated once and never
    // re-shuffled for the flagging pass.
    "q_anomaly_burst" -> ((s, d) => {
      val buckets = Tables.events(s, d)
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("bucket"))
        .agg(count(lit(1)).as("n"))
      val stats = buckets.groupBy("event_type")
        .agg(avg("n").as("mu"), stddev_pop("n").as("sigma"))
      buckets.join(broadcast(stats), "event_type")
        .filter(col("n") > col("mu") + lit(2.0) * col("sigma"))
        .select(col("event_type"), col("bucket"), col("n"),
          floor((col("n") - col("mu")) / col("sigma") * 100 + 0.5)
            .cast("long").as("z_x100"))
        .orderBy("event_type", "bucket")
    }),

    // ---- sequential pattern mining (top 3-step paths) ----------------
    // per-user ordered event stream → overlapping 3-grams of event types
    // via two lead() windows (one user_id-keyed sort, no self-joins),
    // then a global count + top-10. The path alphabet is tiny, so the
    // final agg reduces to |types|³ keys regardless of corpus size.
    "q_event_paths" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("e2", lead("event_type", 1).over(w))
        .withColumn("e3", lead("event_type", 2).over(w))
        .filter(col("e3").isNotNull)
        .select(concat_ws(">", col("event_type"), col("e2"), col("e3")).as("path"))
        .groupBy("path").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("path")).limit(10)
    }),

    // ---- first-touch attribution -------------------------------------
    // each purchase attributed to the user's EARLIEST click in a 7-day
    // lookback window (marketing first-touch; the as-of join's mirror).
    // Per-user interval join — pair count bounded by per-user event
    // counts, shuffled on user_id — then a min() per purchase and a
    // day-grained rollup. Gap stays in integer microseconds until the
    // final avg so both engines divide exactly once.
    "q_attr_first" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
      val attributed = p.join(c, Seq("user_id"))
        .filter(col("c_us") <= col("p_us") &&
          col("c_us") > col("p_us") - lit(7L * 24 * 3600 * 1000000L))
        .groupBy("p_id").agg(min("c_us").as("first_us"))
      p.join(attributed, Seq("p_id"), "left_outer")
        .withColumn("day", to_date(timestamp_micros(col("p_us"))))
        .groupBy("day")
        .agg(count(lit(1)).as("n_purchases"),
          count(col("first_us")).as("n_attributed"),
          round(avg(col("p_us") - col("first_us")), 2).as("avg_gap_us"))
        .orderBy("day")
    }),

    // linear (equal-credit) multi-touch attribution — q_attr_first's
    // fractional sibling: every click in the purchase's 7-day lookback
    // gets 1/n_touch credit, summed by click day. One user_id join +
    // one per-purchase window count; the fact stream is never collected.
    // The credit sum is ORDER-PINNED: a raw float sum(1.0/n_touch) is
    // partition-order-dependent, and at one data generation this day's
    // total sat exactly on a round-half .xx5 boundary — the same query
    // flipped 46.87/46.88 between two runs on identical data. Grouping
    // to exact (day, n_touch) counts first and folding them in n_touch
    // order makes the float adds a fixed sequence on any topology (the
    // per-group count is integer-exact, so only the bounded fold floats).
    "q_attr_linear" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("p_id"), col("user_id"),
          unix_micros(col("ts")).as("p_us"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("user_id"), unix_micros(col("ts")).as("c_us"))
      val touches = p.join(c, Seq("user_id"))
        .filter(col("c_us") <= col("p_us") &&
          col("c_us") > col("p_us") - lit(7L * 24 * 3600 * 1000000L))
        .withColumn("n_touch",
          count(lit(1)).over(Window.partitionBy("p_id")))
        .withColumn("day", to_date(timestamp_micros(col("c_us"))))
      val credit = touches
        .groupBy("day", "n_touch").agg(count(lit(1)).as("g"))
        .groupBy("day")
        .agg(round(aggregate(
          array_sort(collect_list(struct(col("n_touch"), col("g")))),
          lit(0.0),
          (a, x) => a + x.getField("g").cast("double") / x.getField("n_touch")),
          2).as("credit"))
      val counts = touches.groupBy("day")
        .agg(count_distinct(col("p_id")).as("n_purchases"),
          count(lit(1)).as("n_touches"))
      credit.join(counts, Seq("day"))
        .select("day", "credit", "n_purchases", "n_touches")
        .orderBy("day")
    }),

    // moving median (robust rolling baseline): exact percentile as a
    // WINDOW aggregate over the trailing 10 events per user — the
    // shuffle is one user_id partition, each frame is 10 rows
    "q_window_median" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("user_id"), col("event_id"), col("value"),
          unix_micros(col("ts")).as("us"))
        .withColumn("med10", round(
          expr("percentile(value, 0.5D)").over(
            Window.partitionBy("user_id").orderBy(col("us"), col("event_id"))
              .rowsBetween(-9, 0)), 4))
        .select("user_id", "event_id", "med10")),

    // HLL set algebra: distinct-user intersection of two behaviors via
    // inclusion–exclusion over three mergeable sketches (|A|+|B|−|A∪B|)
    // — the sketch-only answer a 100 TB engine ships to dashboards; the
    // exact semi-join twin + an in-query error-bound flag keep it honest
    "q_hll_intersect" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val a = ev.filter(col("event_type") === "click")
        .select(col("user_id"))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"))
      val est = a.agg(approx_count_distinct("user_id", 0.02).as("ea"))
        .crossJoin(b.agg(approx_count_distinct("user_id", 0.02).as("eb")))
        .crossJoin(a.union(b)
          .agg(approx_count_distinct("user_id", 0.02).as("eu")))
      val exact = a.join(b.distinct(), Seq("user_id"), "left_semi")
        .agg(count_distinct(col("user_id")).as("exact_i"))
      est.crossJoin(broadcast(exact))
        .select(col("exact_i"),
          (abs(col("ea") + col("eb") - col("eu") - col("exact_i")) <=
            lit(0.05) * (col("ea") + col("eb"))).as("hll_ok"))
    }),

    // ---- trending via truncated EWMA ---------------------------------
    // exponentially-weighted hourly counts per event type, decay 0.8
    // over a trailing 24-bucket window, evaluated at the corpus's final
    // hour (the "what's trending now" primitive). EWMA is a recursive
    // fold, which neither engine can express identically — so it is
    // re-expressed as a SCATTER: each (type, bucket, n) contributes
    // n·0.8^k to buckets t..t+23 via a broadcast 24-row offsets join,
    // then one (type, target)-keyed partial-sum shuffle. Missing hours
    // contribute nothing — exactly zero-filled truncated EWMA — and the
    // work is |hourly buckets|·24 rows regardless of corpus size.
    "q_trending_ewma" -> ((s, d) => {
      val counts = Tables.events(s, d)
        .withColumn("bucket", date_trunc("hour", col("ts")))
        .groupBy("event_type", "bucket").agg(count(lit(1)).as("n"))
      val offsets = s.range(0, 24).select(col("id").cast("int").as("k"))
      val maxB = counts.agg(max("bucket").as("maxb"))
      counts.crossJoin(broadcast(offsets))
        .withColumn("tgt", col("bucket") + expr("make_interval(0, 0, 0, 0, k, 0, 0)"))
        .groupBy("event_type", "tgt")
        .agg(sum(col("n") * pow(lit(0.8), col("k"))).as("ewma"))
        .join(broadcast(maxB), col("tgt") === col("maxb"))
        .select(col("event_type"), round(col("ewma"), 4).as("ewma"))
        .orderBy(col("ewma").desc, col("event_type"))
    }),

    // ---- time-hierarchy rollup ---------------------------------------
    // day ⊃ (day, type) subtotals + grand total in ONE pass via rollup
    // (Expand feeds a single partial+final aggregate — one shuffle for
    // all three granularities, vs three separate scans+shuffles)
    "q_rollup_time" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("day", to_date(col("ts")))
        .rollup("day", "event_type")
        .agg(count(lit(1)).as("n"),
          round(sum("value"), 2).as("sum_value"))
        .orderBy(asc_nulls_first("day"), asc_nulls_first("event_type"))),

    // ---- Pareto skyline (price ↓ better, size ↑ better) --------------
    // two-phase distributed dominance frontier ([[graft.ops.Skyline]]):
    // local frontier per partition (distributed windows), then the same
    // filter over the tiny union of local frontiers — neither the |n|²
    // self-anti-join nor a single-partition global sort of all rows.
    "q_skyline" -> ((s, d) =>
      graft.ops.Skyline.skyline2D(
          Tables.part(s, d)
            .select(col("p_partkey"), col("p_retailprice"), col("p_size")),
          "p_retailprice", "p_size")
        .orderBy("p_retailprice", "p_partkey")),

    // ---- PageRank over the event-transition graph --------------------
    // which state is "central" in user journeys: nodes = event types,
    // edges = consecutive-event transitions (lead over the per-user
    // timeline), 6 synchronous iterations at damping 0.85 via
    // [[graft.ops.Graph.pageRank]] — one shuffle per iteration, rank
    // vector always |nodes| rows. The oracle unrolls the identical six
    // iterations as a CTE chain, so the hash compare pins the whole
    // fixpoint computation, not just the final shape.
    "q_pagerank" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val edges = ev
        .select(col("event_type").as("src"),
          lead("event_type", 1).over(w).as("dst"))
        .filter(col("dst").isNotNull)
        .groupBy("src", "dst").agg(count(lit(1)).cast("double").as("w"))
      val nodes = ev.select(col("event_type").as("node")).distinct()
      graft.ops.Graph.pageRank(nodes, edges, "src", "dst", "w",
          iters = 6, damping = 0.85)
        .select(col("node"), round(col("rank"), 4).as("pr"))
        .orderBy(desc("pr"), col("node"))
    }),

    // ---- frequent co-occurring event-type pairs ----------------------
    // market-basket support mining (basket = user): which behaviors
    // co-occur. distinct() bounds each basket at the type-domain size,
    // so the pair space is |types|²/2 per user — linear in users
    "q_freq_pairs" -> ((s, d) =>
      graft.ops.Graph.frequentPairs(
          Tables.events(s, d), "user_id", "event_type", minSupport = 10L)
        .orderBy(desc("support"), col("item_a"), col("item_b"))),

    // ---- seasonal-baseline anomaly detection -------------------------
    // robust outliers against the SAME-HOUR-OF-DAY baseline: per
    // (type, hour) exact median, then the median absolute deviation
    // around it, then flag |v − med| > 3·MAD. Robust to the heavy tails
    // that break q_anomaly_burst's z-scores and to diurnal cycles that
    // break a global threshold. The baseline table is |types|·24 rows —
    // always the broadcast side — so the event log streams through two
    // broadcast probes, and the only full-data shuffles are the two
    // grouped medians.
    "q_seasonal_anomaly" -> ((s, d) => {
      val h = Tables.events(s, d)
        .select(col("event_type"), hour(col("ts")).as("hod"), col("value"))
      val med = h.groupBy("event_type", "hod")
        .agg(median(col("value")).as("med"))
      val joined = h.join(broadcast(med), Seq("event_type", "hod"))
      val mad = joined.groupBy("event_type", "hod")
        .agg(median(abs(col("value") - col("med"))).as("mad"))
      joined.join(broadcast(mad), Seq("event_type", "hod"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(when(abs(col("value") - col("med")) > lit(3) * col("mad"), 1)
            .otherwise(0)).cast("long").as("n_anom"),
          round(avg(col("mad")), 4).as("avg_mad"))
        .orderBy("event_type")
    }),

    // ---- incremental aggregate maintenance ---------------------------
    // history state (ts < Jan 20) merged with the delta batch's state
    // (ts ≥ Jan 20) via [[graft.ops.Incremental]] — the report never
    // re-scans history, it folds O(|delta|) partial state into |keys|
    // state rows. The oracle is the full recompute over everything:
    // merge(state(old), state(delta)) must equal agg(old ∪ delta)
    // exactly, which is precisely the algebraic-aggregate contract.
    "q_incremental_agg" -> ((s, d) => {
      val ev = Tables.events(s, d).withColumn("day", to_date(col("ts")))
      val cutoff = lit("2024-01-20").cast("timestamp")
      val keys = Seq("day", "event_type")
      val hist = graft.ops.Incremental.aggState(
        ev.filter(col("ts") < cutoff), keys, "value")
      val delta = graft.ops.Incremental.aggState(
        ev.filter(col("ts") >= cutoff), keys, "value")
      graft.ops.Incremental.merge(hist, delta, keys)
        .select(col("day"), col("event_type"), col("n"),
          round(col("sum_v"), 2).as("sum_v"),
          round(col("min_v"), 2).as("min_v"),
          round(col("max_v"), 2).as("max_v"),
          round(col("sum_v") / col("n"), 4).as("avg_v"))
        .orderBy("day", "event_type")
    }),

    // ---- CDC apply (change-log → materialized snapshot) --------------
    // the merge pattern under every CDC-fed table: a keyed change log
    // (upserts carry the new value, deletes tombstone the key) collapses
    // to last-writer-wins state. One descending row_number window keyed
    // on user_id — tombstones filter AFTER picking the winner, so a
    // delete that is the last op removes the key entirely (120 of 150
    // users survive at sf0.01). Same single-shuffle shape at any log
    // size; in streaming this is exactly transformWithState's per-key
    // latest-value state (StreamingOps), batched.
    "q_cdc_apply" -> ((s, d) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, d)
        .withColumn("op",
          when(col("event_type") === "error", lit("D")).otherwise(lit("U")))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("op") === "U")
        .select(col("user_id"), round(col("value"), 2).as("final_value"))
        .orderBy("user_id")
    }),

    // ---- snapshot diff (CDC extract: what changed between versions) --
    // two deterministic snapshots derived from customer: the "before"
    // drops custkey%7==0, the "after" drops custkey%11==0 and bumps
    // acctbal on custkey%5==0 — so all three op classes appear. One
    // co-partitioned full-outer join; unchanged keys never leave it.
    "q_snapshot_diff" -> ((s, d) => {
      val c = Tables.customer(s, d)
      val before = c.filter(col("c_custkey") % 7 =!= 0)
      val after = c.filter(col("c_custkey") % 11 =!= 0)
        .withColumn("c_acctbal",
          when(col("c_custkey") % 5 === 0, col("c_acctbal") + 10.0)
            .otherwise(col("c_acctbal")))
      graft.ops.Incremental.snapshotDiff(before, after,
          keys = Seq("c_custkey"),
          compareCols = Seq("c_acctbal", "c_mktsegment"))
        .orderBy("c_custkey")
    }),

    // ---- SCD2 history build (type-2 dimension from an event log) -----
    // collapse each user's consecutive same-type runs into validity
    // intervals — the gaps-and-islands double window (change flag, then
    // running sum as island id) that every warehouse's dimension-history
    // builder uses. Both windows share the (user_id | ts, event_id)
    // sort, so Catalyst plans ONE shuffle + ONE sort for the whole
    // chain; the interval table is then a plain groupBy. Per-user state
    // is bounded by that user's run count — nothing global.
    "q_scd2" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val iv = Tables.events(s, d)
        .withColumn("chg",
          when(lag("event_type", 1).over(w).isNull ||
            lag("event_type", 1).over(w) =!= col("event_type"), 1)
            .otherwise(0))
        .withColumn("grp", sum("chg").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "event_type", "grp")
        .agg(min("ts").as("valid_from"), max("ts").as("last_seen"),
          count(lit(1)).as("n_rows"))
      iv.groupBy("user_id")
        .agg(count(lit(1)).as("n_versions"),
          max("n_rows").as("longest_run"),
          round(sum(col("last_seen").cast("double")
            - col("valid_from").cast("double")), 1).as("total_span_s"))
        .orderBy("user_id")
    }),

    // ---- time-weighted average ---------------------------------------
    // telemetry TWA: each reading weighted by its holding time (gap to
    // the next event); the final reading has no duration and drops out.
    // One window pass + one groupBy on the same user key — a single
    // shuffle. Timestamps go through cast(double) (µs-precision epoch)
    // on both engines; unix_timestamp would truncate to seconds and
    // hash-mismatch.
    "q_time_weighted_avg" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      Tables.events(s, d)
        .withColumn("dt", lead("ts", 1).over(w).cast("double")
          - col("ts").cast("double"))
        .filter(col("dt").isNotNull)
        .groupBy("user_id")
        .agg(round(sum(col("value") * col("dt")) / sum(col("dt")), 4)
            .as("twa"),
          count(lit(1)).as("n"),
          sum(col("dt")).as("_sum_dt"))
        .filter(col("_sum_dt") > 0) // HAVING: all-simultaneous users drop
        .drop("_sum_dt")
        .orderBy("user_id")
    }),

    // ---- event-sequence pattern matching (MATCH_RECOGNIZE shape) -----
    // per-user journeys as ordered event-type-initial strings, then a
    // regex over the journey counts conversion patterns (view → clicks*
    // → purchase). This is the flatten-to-string trick for sequence
    // regex: one groupBy shuffle keyed by user, journey length bounded
    // by per-user event counts, the regex engine runs codegen'd per row
    // — no self-join blow-up, no per-pattern state machine. The oracle
    // rebuilds journeys with ORDER BY inside string_agg; both regex
    // engines count non-overlapping leftmost matches of 'vc*p'.
    "q_sequence_match" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val j = ev
        .select(col("user_id"),
          struct(col("ts"), col("event_id"),
            substring(col("event_type"), 1, 1).as("i")).as("st"))
        .groupBy("user_id")
        .agg(array_join(
          transform(array_sort(collect_list(col("st"))),
            x => x.getField("i")), "").as("journey"))
      j.select(col("user_id"),
          length(col("journey")).cast("long").as("n_events"),
          regexp_count(col("journey"), lit("vc*p")).cast("long")
            .as("n_conversions"))
        .orderBy("user_id")
    }),

    // ---- count-min sketch heavy hitters ------------------------------
    // the frequency-sketch twin of q_approx_hll: a CMS over event_type
    // built distributed (map-side partial sketches merged associatively
    // by Spark's stat machinery), probed for each type in the bounded
    // domain. CMS guarantees est ≥ exact and, w.p. ≥ confidence,
    // est ≤ exact + eps·N — both bounds are asserted IN the query
    // (cms_ok), the oracle pins exact counts + literal TRUE. The
    // domain collect is 5 rows (the sketch is the point: at 100 TB the
    // sketch is KBs while exact per-key counts are a full shuffle).
    "q_count_min" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.events(s, d)
      val eps = 0.001
      val cms = ev.stat.countMinSketch("event_type", eps, 0.99, 42)
      val exact = ev.groupBy("event_type").agg(count(lit(1)).as("exact_n"))
      // N for the eps·N bound rides the |types|-row aggregate already
      // computed — not a driver-side ev.count() second full scan
      val total = exact.agg(sum("exact_n").as("n_total"))
      val types = exact.select("event_type").as[String].collect().toSeq
      val est = types.map(t => (t, cms.estimateCount(t))).toDF("event_type", "_est")
      exact.join(broadcast(est), Seq("event_type"))
        .crossJoin(broadcast(total))
        .select(col("event_type"), col("exact_n"),
          (col("_est") >= col("exact_n") &&
            col("_est") <= col("exact_n") +
              ceil(lit(eps) * col("n_total")).cast("long"))
            .as("cms_ok"))
        .orderBy("event_type")
    }),

    // ---- DDSketch quantiles ------------------------------------------
    // mergeable relative-error quantile sketch ([[graft.ops.Sketches]]):
    // one map-side-combined bucket-count pass is the only full-data
    // scan; p50/p95/p99 come off the |types|·|buckets| sketch. The
    // DDSketch α-guarantee (|est−exact|/exact ≤ α) is asserted IN the
    // query against Spark's exact percentile (3·α tolerance covers the
    // discrete-vs-interpolated rank gap); the oracle replays the exact
    // bucket/rank arithmetic and pins the ok flags at literal TRUE.
    "q_ddsketch" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val sk = graft.ops.Sketches.ddsketchBuild(ev, "value",
        Seq("event_type"))
      val est = graft.ops.Sketches.ddsketchQuantiles(sk, Seq("event_type"),
        Seq(0.5, 0.95, 0.99))
      // the in-query accuracy contract compares each sketch quantile to
      // the exact order statistic at the SKETCH'S OWN rank convention
      // (floor(q·(n−1))+1) with the sketch's real α = 1% bound — an
      // interpolated percentile() at 3% flaked at sf0.001 (n ≈ 200:
      // interpolation between the top order statistics legitimately
      // drifts >3% from the bucket value DDSketch actually bounds)
      val rank = (q: Double, vs: org.apache.spark.sql.Column) =>
        (floor(lit(q) * (size(vs) - 1)) + 1).cast("int")
      val exact = ev.filter(col("value") > 0)
        .groupBy("event_type")
        .agg(sort_array(collect_list(col("value").cast("double"))).as("vs"))
        .select(col("event_type"),
          element_at(col("vs"), rank(0.5, col("vs"))).as("x50"),
          element_at(col("vs"), rank(0.95, col("vs"))).as("x95"),
          element_at(col("vs"), rank(0.99, col("vs"))).as("x99"))
      est.join(broadcast(exact), Seq("event_type"))
        .select(col("event_type"), col("n"),
          col("p50"), col("p95"), col("p99"),
          (abs(col("p50") - col("x50")) / col("x50") <= 0.010001)
            .as("ok_p50"),
          (abs(col("p95") - col("x95")) / col("x95") <= 0.010001)
            .as("ok_p95"),
          (abs(col("p99") - col("x99")) / col("x99") <= 0.010001)
            .as("ok_p99"))
        .orderBy("event_type")
    }),

    // recursive CTE (Spark 4's WITH RECURSIVE): k-step path counting
    // from 'view' over the distinct event-transition graph — the
    // iterative-until-depth surface SQL users expect from a warehouse,
    // executed as Spark's native recursion (one join per unroll level,
    // all distributed). DuckDB twin runs the identical recursion
    "q_sql_recursive" -> ((s, d) => s.sql(
      s"""WITH RECURSIVE ord AS (
         |  SELECT event_type AS src,
         |    lead(event_type) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id) AS dst
         |  FROM parquet.`$d/events.parquet`),
         |e AS (SELECT DISTINCT src, dst FROM ord WHERE dst IS NOT NULL),
         |paths(node, depth) AS (
         |  SELECT 'view' AS node, 0 AS depth
         |  UNION ALL
         |  SELECT e.dst, p.depth + 1
         |  FROM paths p JOIN e ON e.src = p.node WHERE p.depth < 4)
         |SELECT node, depth, count(*) AS n_paths
         |FROM paths GROUP BY node, depth
         |ORDER BY node, depth""".stripMargin)),

    // Kaplan–Meier survival curve over time-to-conversion: per user the
    // days from first view to first purchase (right-censored at the
    // observation end for never-converters). S(t) = Π_{d≤t} (1 − e_d/n_d)
    // computed as exp of a cumulative log sum — one |days|-row window
    // after a per-user aggregate; the standard churn/TTE estimator
    "q_survival_km" -> ((s, d) => {
      val ev = Tables.events(s, d)
      val firstView = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("v_us"))
      val firstBuy = ev.filter(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("p_us"))
      val horizon = ev.agg(max(unix_micros(col("ts"))).as("h_us"))
      val subj = firstView.join(firstBuy, Seq("user_id"), "left")
        .crossJoin(broadcast(horizon))
        .filter(col("p_us").isNull || col("p_us") >= col("v_us"))
        .select(
          when(col("p_us").isNotNull,
            floor((col("p_us") - col("v_us")) / (86400L * 1000000L)))
            .otherwise(floor((col("h_us") - col("v_us"))
              / (86400L * 1000000L))).as("t_day"),
          col("p_us").isNotNull.as("converted"))
      val byDay = subj.groupBy("t_day")
        .agg(sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("leaving"))
      val w = Window.orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.orderBy("t_day")
        .rowsBetween(Window.unboundedPreceding, -1)
      val total = subj.agg(count(lit(1)).as("n0"))
      byDay.crossJoin(broadcast(total))
        .withColumn("at_risk",
          col("n0") - coalesce(sum("leaving").over(wPrev), lit(0L)))
        .withColumn("f",
          lit(1.0) - col("d").cast("double") / col("at_risk"))
        // a day where everyone at risk converts drives S(t) to an
        // absorbing 0 — ln(0) must not enter the cumulative sum
        .withColumn("z",
          sum(when(col("f") <= 0, 1L).otherwise(0L)).over(w))
        .withColumn("surv",
          when(col("z") > 0, lit(0.0)).otherwise(round(exp(
            sum(when(col("f") > 0, log(col("f")))).over(w)), 4)))
        .select(col("t_day"), col("d"), col("at_risk"), col("surv"))
        .orderBy("t_day")
    }),

    // Gini coefficient of revenue concentration per region (the
    // inequality metric behind every whale-dependency dashboard):
    // G = 2·Σ(i·x_i)/(n·Σx) − (n+1)/n over rank-ordered customer
    // revenue. One rank window + one aggregate per region
    "q_gini" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "c_custkey")
        .agg(sum("o_totalprice").as("x"))
      val w = Window.partitionBy("n_regionkey")
        .orderBy(col("x"), col("c_custkey"))
      rev.withColumn("i", row_number().over(w))
        .groupBy("n_regionkey")
        .agg(count(lit(1)).as("n_cust"),
          round((lit(2.0) * sum(col("i") * col("x")) /
            (count(lit(1)) * sum("x"))) -
            (count(lit(1)) + lit(1.0)) / count(lit(1)), 4).as("gini"))
        .orderBy("n_regionkey")
    }),

    // two-sample Kolmogorov–Smirnov statistic (the drift detector for
    // continuous features): D = max |ECDF_click − ECDF_purchase| over
    // the value axis. The ECDF difference is evaluated once per
    // DISTINCT value (per-value counts aggregated first — map-side
    // combined — then one cumulative window over the distinct values):
    // evaluating at every pooled row would overstate D when the same
    // value occurs in both groups (mid-tie-group rows are not ECDF
    // evaluation points). Exact and deterministic
    "q_ks_test" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"), col("value"))
      val byVal = ev.groupBy("value").agg(
        sum(when(col("g") === "click", 1L).otherwise(0L)).as("a"),
        sum(when(col("g") === "purchase", 1L).otherwise(0L)).as("b"))
      // the value domain is data-sized (continuous values ⇒ ~|rows|
      // distinct), so the ECDF prefix counts come from the distributed
      // two-phase cumsum, NOT a global Window (single-partition barrier);
      // long counts make the result bit-equal to the window form
      val g = graft.ops.Layout.globalCumSum(byVal, Seq("value"), Seq("a", "b"))
      // na/nb = the cumsums' final offsets (a_cum is nondecreasing, so
      // max == total) off the checkpointed per-value table — NOT two
      // driver-side filtered ev.count()s, each a full scan at 100 TB
      val tot = g.agg(max("a_cum").cast("double").as("na"),
        max("b_cum").cast("double").as("nb"))
      g.crossJoin(broadcast(tot))
        .agg(round(max(abs(col("a_cum") / col("na") - col("b_cum") / col("nb"))), 4)
          .as("ks_d"),
          sum(col("a") + col("b")).as("n_total"))
    }),

    // Mann–Whitney U (the nonparametric two-sample location test):
    // U_a = R_a − n_a(n_a+1)/2 from the rank sum over the pooled
    // values — average ranks for ties via a value-keyed window
    "q_mannwhitney" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type").as("g"), col("value"))
      // rank arithmetic from per-value counts + the distributed global
      // cumsum (no single-partition rank() window): rmin of a tie group
      // = (total rows before it) + 1 = cnt_cum − cnt + 1; every rank is
      // a multiple of 0.5, so the sums are float-exact in any order and
      // bit-match the row-wise window formulation the oracle keeps
      val byVal = ev.groupBy("value").agg(
        sum(when(col("g") === "click", 1L).otherwise(0L)).as("ac"),
        count(lit(1)).as("cnt"))
      val g = graft.ops.Layout.globalCumSum(byVal, Seq("value"), Seq("cnt"))
      // n_a from the per-value counts already aggregated (one narrow agg
      // over the checkpointed table) — not a driver-side filtered
      // ev.count() second scan; max(na) in the final agg reads the
      // broadcast constant back out
      val tot = g.agg(sum("ac").cast("double").as("na"))
      g.withColumn("r",
          (col("cnt_cum") - col("cnt") + 1) + (col("cnt") - 1) / 2.0)
        .crossJoin(broadcast(tot))
        .agg(round(sum(col("ac") * col("r")), 2).as("rank_sum_a"),
          round(sum(col("ac") * col("r")) -
            max(col("na") * (col("na") + 1) / 2), 2).as("u_a"),
          sum("ac").as("n_a"))
    }),

    // population stability index (THE score-drift metric in model
    // monitoring): decile bins fitted on the REFERENCE week, applied
    // to the current week, PSI = Σ (p−q)·ln(p/q). Bin edges are a
    // 9-value broadcast; both distributions come off one scan each
    "q_psi" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("ts"), col("value"))
      val cut = lit("2024-01-15").cast("timestamp")
      val ref = ev.filter(col("ts") < cut)
      val cur = ev.filter(col("ts") >= cut)
      val edges = ref.agg(expr(
        "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))")
        .as("e")).first().getSeq[Double](0)
      val bin = edges.foldLeft(lit(0)) { (acc, e) =>
        acc + when(col("value") > e, 1).otherwise(0) }
      // each side's N = sum of its own bin counts via a window over the
      // ≤10-bin aggregate (bounded domain, so the unpartitioned window
      // is a 10-row frame, not a barrier) — not a driver-side df.count()
      // that re-scans each side at 100 TB
      def dist(df: DataFrame, n: String) = df.withColumn("bin", bin)
        .groupBy("bin").agg(count(lit(1)).as("_c"))
        .select(col("bin"),
          (col("_c") / sum("_c").over(Window.partitionBy()).cast("double")).as(n))
      dist(ref, "p").join(dist(cur, "q"), Seq("bin"))
        .agg(round(sum((col("p") - col("q")) *
          log(col("p") / col("q"))), 4).as("psi"),
          count(lit(1)).as("n_bins"))
    }),

    // weighted sampling WITHOUT replacement (Efraimidis–Spirakis 2006,
    // the distributed one-pass algorithm): key = u^(1/w) with a
    // deterministic md5-derived u ∈ (0,1); global top-k by key IS the
    // weighted sample. One TakeOrdered, no per-row state
    "q_sample_weighted" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("value"))
        .filter(col("value") > 0)
      // u from the md5 4-hex prefix: (hex+1)/65537 ∈ (0,1) exactly
      val u = (conv(substring(md5(col("event_id").cast("string")), 1, 4),
        16, 10).cast("double") + 1) / 65537.0
      ev.withColumn("skey", pow(u, lit(1.0) / col("value")))
        .orderBy(desc("skey"), col("event_id")).limit(200)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_sampled"),
          round(sum("value"), 2).as("w_sampled"))
        .orderBy("event_type")
    }),

    // engagement snapshot (DAU/WAU/MAU + stickiness): distinct actives
    // in the trailing 1/7/30 days of the observation window, and the
    // DAU/MAU ratio every growth dashboard tracks. Three semi-bounded
    // distinct aggregates off one scan
    "q_active_users" -> ((s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"), col("ts"))
      val hi = ev.agg(max("ts").as("h"))
      val j = ev.crossJoin(broadcast(hi))
      def actives(days: Int) = count_distinct(when(
        col("ts") > col("h") - expr(s"interval $days days"),
        col("user_id")))
      j.agg(actives(1).as("dau"), actives(7).as("wau"),
          actives(30).as("mau"))
        .select(col("dau"), col("wau"), col("mau"),
          round(col("dau").cast("double") / col("mau"), 4)
            .as("stickiness"))
    }),

    // Pareto concentration (the 80/20 readout): the smallest share of
    // users that generates >= 80% of events. The per-user table is
    // user-domain-sized — unbounded — so the descending cumulative
    // share uses the distributed globalCumSum (sort key negated for
    // descending order; long counts ⇒ bit-equal to the window form),
    // never a single-partition rank window
    "q_power_users" -> ((s, d) => {
      val per = Tables.events(s, d)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .withColumn("_negn", -col("n"))
      val tot = per.agg(sum("n").cast("double").as("t"),
        count(lit(1)).as("u"))
      graft.ops.Layout.globalCumSum(per, Seq("_negn", "user_id"), Seq("n"))
        .crossJoin(broadcast(tot))
        .filter(col("n_cum") >= lit(0.8) * col("t"))
        .agg(min("rn").as("users_for_80pct"),
          max("u").as("n_users"),
          round(min("rn").cast("double") / max("u"), 4).as("share"))
    }),

    // Lorenz curve points behind q_gini: per region, each revenue
    // decile's cumulative share — the "bottom 50% of customers hold x%
    // of revenue" readout. ntile + two window sums over the per-
    // customer aggregate
    "q_lorenz" -> ((s, d) => {
      val rev = Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"))
        .join(broadcast(Tables.nation(s, d)),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_regionkey", "c_custkey")
        .agg(sum("o_totalprice").as("x"))
      val wRank = Window.partitionBy("n_regionkey")
        .orderBy(col("x"), col("c_custkey"))
      val byDecile = rev.withColumn("decile", ntile(10).over(wRank))
        .groupBy("n_regionkey", "decile")
        .agg(sum("x").as("dx"), count(lit(1)).as("n_cust"))
      val wCum = Window.partitionBy("n_regionkey").orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy("n_regionkey")
      byDecile
        .withColumn("cum_share",
          round(sum("dx").over(wCum) / sum("dx").over(wAll), 4))
        .select("n_regionkey", "decile", "n_cust", "cum_share")
        .orderBy("n_regionkey", "decile")
    }),

    // lag-24 autocorrelation of the hourly series per type — the
    // seasonality check that justifies (or indicts) q_forecast_snaive's
    // 24-bucket lag. One keyed lag window + one corr aggregate
    "q_autocorr" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
      hb.withColumn("n24", lag("n", 24).over(w))
        .filter(col("n24").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_points"),
          round(corr("n", "n24"), 4).as("acf24"))
        .orderBy("event_type")
    }),

    // temporal-precedence matrix (sequence mining's support table): for
    // every ordered type pair (a, b), how many users ever did a BEFORE
    // b — "exists a-event before some b-event" ⟺ min ts(a) < max ts(b),
    // so the whole matrix costs ONE per-(user, type) min/max aggregate
    // plus a |types|²-bounded self-join per user. No event-level pair
    // blow-up anywhere
    "q_precedence" -> ((s, d) => {
      val ut = Tables.events(s, d)
        .groupBy("user_id", "event_type")
        .agg(min(unix_micros(col("ts"))).as("mn"),
          max(unix_micros(col("ts"))).as("mx"))
      val a = ut.select(col("user_id"), col("event_type").as("t_a"),
        col("mn"))
      val b = ut.select(col("user_id"), col("event_type").as("t_b"),
        col("mx"))
      a.join(b, Seq("user_id"))
        .filter(col("t_a") =!= col("t_b") && col("mn") < col("mx"))
        .groupBy("t_a", "t_b").agg(count(lit(1)).as("n_users"))
        .orderBy("t_a", "t_b")
    }),

    // sample-ratio-mismatch guard (the A/B infra check run BEFORE
    // reading any metric): users assigned 50/50 by deterministic md5
    // parity; chi-square of observed vs expected arm sizes, flagged at
    // the 3.841 critical value (df=1, α=.05). One distinct + one
    // |arms|-row aggregate
    "q_ab_srm" -> ((s, d) => {
      val arms = Tables.events(s, d)
        .select(col("user_id")).distinct()
        .withColumn("arm",
          when(substring(md5(col("user_id").cast("string")), 1, 1)
            .isin("0", "1", "2", "3", "4", "5", "6", "7"), 0L)
            .otherwise(1L))
        .groupBy("arm").agg(count(lit(1)).as("n"))
      val tot = arms.agg(sum("n").cast("double").as("t"))
      arms.crossJoin(broadcast(tot))
        .agg(max("t").cast("long").as("n_users"),
          round(sum(pow(col("n") - col("t") / 2, 2) / (col("t") / 2)), 4)
            .as("chi2"),
          (sum(pow(col("n") - col("t") / 2, 2) / (col("t") / 2)) > 3.841)
            .as("srm_flag"))
    }),

    // cross-source duplicate overlap (provenance audit: which sources
    // re-publish the same content): 8-token-PREFIX fingerprint groups
    // spanning >1 source, counted per source pair — the prefix
    // fingerprint catches re-publications with divergent tails that an
    // exact-text hash misses. One fingerprint shuffle, pair space
    // bounded by sources-per-group
    "q_source_overlap" -> ((s, d) => {
      val fp = Tables.documents(s, d)
        .select(col("source"),
          md5(concat_ws(" ",
            slice(split(col("text"), " "), 1, 8))).as("fp"))
        .distinct()
      val a = fp.select(col("fp"), col("source").as("src_a"))
      val b = fp.select(col("fp"), col("source").as("src_b"))
      a.join(b, Seq("fp"))
        .filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(count(lit(1)).as("n_shared"))
        .orderBy("src_a", "src_b")
    }),

    // seasonal-naive forecast backtest: ŷ = value 24 OBSERVED buckets
    // back (== y(h−24h) on a dense series; densify with q_interpolate's
    // grid first if the series has holes), scored as MAE/bias per type
    // over the last week. One lag window keyed by type — the standard
    // rolling-origin backtest shape
    "q_forecast_snaive" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("n"))
      val w = Window.partitionBy("event_type").orderBy("hour")
      val horizon = lit("2024-01-25").cast("timestamp")
      hb.withColumn("yhat", lag("n", 24).over(w))
        .filter(col("hour") >= horizon && col("yhat").isNotNull)
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_points"),
          round(avg(abs(col("n") - col("yhat"))), 4).as("mae"),
          round(avg(col("n") - col("yhat")), 4).as("bias"),
          round(max(abs(col("n") - col("yhat"))), 2).as("worst"))
        .orderBy("event_type")
    }),

    // robust outlier detection via MAD (the median-based z-score that a
    // single wild day cannot poison, unlike q_outlier_zscore's mean/σ):
    // per-type daily counts, med = median(n), mad = median(|n − med|),
    // robust z = 0.6745·(n − med)/mad. Two tiny per-type aggregates
    // broadcast back over the daily table — the 100 TB shape is one
    // day-keyed shuffle plus |types|-row joins
    "q_outlier_mad" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      val med = daily.groupBy("event_type")
        .agg(expr("percentile(n, 0.5D)").as("med"))
      val dev = daily.join(med, "event_type")
        .withColumn("adev", abs(col("n") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(max("med").as("med"), expr("percentile(adev, 0.5D)").as("mad"))
      dev.drop("med").join(mad, "event_type")
        .withColumn("rz",
          when(col("mad") > 0, lit(0.6745) * (col("n") - col("med")) / col("mad")))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days"),
          round(max("med"), 4).as("med"),
          round(max("mad"), 4).as("mad"),
          sum(when(abs(col("rz")) > 3.5, 1L).otherwise(0L)).as("n_outliers"),
          round(max(abs(col("rz"))), 4).as("max_abs_rz"))
        .orderBy("event_type")
    }),

    // Theil–Sen robust trend: slope = median over all day-pairs of
    // (n_j − n_i)/(idx_j − idx_i), intercept = median(n − slope·idx).
    // The pair join is bounded per type by days² — calendar-bounded,
    // never corpus-bounded — and keyed on event_type so it co-partitions
    "q_theilsen" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
        .withColumn("idx", datediff(col("day"),
          min(col("day")).over(Window.partitionBy("event_type")))
          .cast("double"))
      val a = daily.select(col("event_type"), col("idx").as("i1"), col("n").as("n1"))
      val b = daily.select(col("event_type"), col("idx").as("i2"), col("n").as("n2"))
      val slopes = a.join(b, "event_type").filter(col("i1") < col("i2"))
        .withColumn("s", (col("n2") - col("n1")) / (col("i2") - col("i1")))
      val slope = slopes.groupBy("event_type")
        .agg(count(lit(1)).as("n_pairs"), expr("percentile(s, 0.5D)").as("slope"))
      daily.join(slope, "event_type")
        .withColumn("ic", col("n") - col("slope") * col("idx"))
        .groupBy("event_type")
        .agg(max("n_pairs").as("n_pairs"),
          round(max("slope"), 4).as("slope"),
          round(expr("percentile(ic, 0.5D)"), 4).as("intercept"))
        .orderBy("event_type")
    }),

    // Mann–Kendall trend test — Theil–Sen's hypothesis-test companion:
    // S = Σ_{i<j} sign(n_j − n_i) over the daily series, tie-corrected
    // variance, continuity-corrected z. Integer-exact up to the final
    // /18 and sqrt, so both engines agree bit-for-bit before rounding;
    // the pair join is calendar-bounded per type like q_theilsen
    "q_mann_kendall" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).as("n"))
      val a = daily.select(col("event_type"), col("day").as("d1"), col("n").as("n1"))
      val b = daily.select(col("event_type"), col("day").as("d2"), col("n").as("n2"))
      val sTab = a.join(b, "event_type").filter(col("d1") < col("d2"))
        .groupBy("event_type")
        .agg(sum(signum(col("n2") - col("n1")).cast("long")).as("s"))
      val ties = daily.groupBy("event_type", "n")
        .agg(count(lit(1)).as("c"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_days_distinct"),
          sum(col("c")).as("nd"),
          sum(col("c") * (col("c") - 1) * (col("c") * 2 + 5)).as("tsum"))
      sTab.join(ties, "event_type")
        .withColumn("vr",
          (col("nd") * (col("nd") - 1) * (col("nd") * 2 + 5) - col("tsum"))
            .cast("double") / 18.0)
        .withColumn("z",
          when(col("s") > 0, (col("s") - 1).cast("double") / sqrt(col("vr")))
            .when(col("s") < 0, (col("s") + 1).cast("double") / sqrt(col("vr")))
            .otherwise(0.0))
        .select(col("event_type"), col("nd").as("n_days"), col("s"),
          round(col("vr"), 4).as("var_s"), round(col("z"), 4).as("z"),
          when(col("z") > 1.96, "increasing")
            .when(col("z") < -1.96, "decreasing")
            .otherwise("no_trend").as("trend"))
        .orderBy("event_type")
    }),

    // Holt's double exponential smoothing (level+trend, α=0.5 β=0.3)
    // folded left-to-right over the per-type daily series with the
    // aggregate HOF — identical operation order to the DuckDB
    // list_reduce twin, so the doubles match bit-for-bit before the
    // final round. Init: l₁=y₁, b₁=y₁−y₀ (the standard two-point start)
    "q_holt_winters" -> ((s, d) => {
      val daily = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
        .agg(count(lit(1)).cast("double").as("n"))
      val series = daily.groupBy("event_type")
        .agg(transform(array_sort(collect_list(struct(col("day"), col("n")))),
          p => p("n")).as("ys"))
      val state0 = struct(lit(0.0).as("l"), lit(0.0).as("b"), lit(0.0).as("i"))
      val folded = aggregate(col("ys"), state0, (st, y) =>
        when(st.getField("i") === 0.0,
          struct(y.as("l"), lit(0.0).as("b"), lit(1.0).as("i")))
        .when(st.getField("i") === 1.0,
          struct(y.as("l"), (y - st.getField("l")).as("b"), lit(2.0).as("i")))
        .otherwise(struct(
          (lit(0.5) * y + lit(0.5) * (st.getField("l") + st.getField("b"))).as("l"),
          (lit(0.3) * ((lit(0.5) * y + lit(0.5) * (st.getField("l") + st.getField("b")))
            - st.getField("l")) + lit(0.7) * st.getField("b")).as("b"),
          (st.getField("i") + 1.0).as("i"))))
      series.select(col("event_type"), size(col("ys")).as("n_days"),
          folded.getField("l").as("_l"), folded.getField("b").as("_b"))
        .select(col("event_type"), col("n_days"),
          round(col("_l"), 4).as("level"),
          round(col("_b"), 4).as("trend"),
          round(col("_l") + lit(3.0) * col("_b"), 4).as("forecast3"))
        .orderBy("event_type")
    }),

    // offline CUSUM changepoint detection (Page 1954's statistic,
    // batch form): per-type hourly series, S_i = cumsum(x − x̄),
    // changepoint = argmax |S_i| (earliest-hour tie-break), with the
    // level shift (mean before vs after) reported. Windows keyed by
    // type; the cumulative sum is evaluated in hour order so both
    // engines produce bit-identical S_i
    "q_changepoint" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("n"))
      val wAll = Window.partitionBy("event_type")
      val wCum = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val cum = hb.withColumn("mu", avg("n").over(wAll))
        .withColumn("s", sum(col("n") - col("mu")).over(wCum))
      val best = cum.withColumn("rk", row_number().over(
          Window.partitionBy("event_type")
            .orderBy(abs(col("s")).desc, col("hour"))))
        .filter(col("rk") === 1)
        .select(col("event_type"), col("hour").as("cp_hour"),
          round(abs(col("s")), 2).as("max_s"))
      hb.join(broadcast(best), Seq("event_type"))
        .groupBy("event_type", "cp_hour", "max_s")
        .agg(round(avg(when(col("hour") <= col("cp_hour"), col("n"))), 4)
          .as("mean_before"),
          round(avg(when(col("hour") > col("cp_hour"), col("n"))), 4)
            .as("mean_after"))
        .orderBy("event_type")
    }),

    // mutual information between behavior and time-of-day (the
    // association diagnostic feature stores run on every categorical
    // pair): joint and marginal counts — |types|·24 cells — with the
    // marginals broadcast back; MI in bits
    "q_mutual_info" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_type").as("x"), hour(col("ts")).as("y"))
      val joint = ev.groupBy("x", "y").agg(count(lit(1)).as("nxy"))
      val px = ev.groupBy("x").agg(count(lit(1)).as("nx"))
      val py = ev.groupBy("y").agg(count(lit(1)).as("ny"))
      val tot = ev.agg(count(lit(1)).cast("double").as("n"))
      joint.join(broadcast(px), Seq("x")).join(broadcast(py), Seq("y"))
        .crossJoin(broadcast(tot))
        .agg(round(sum(col("nxy") / col("n") *
            log2(col("nxy") * col("n") / (col("nx") * col("ny")))), 4)
          .as("mi_bits"),
          count(lit(1)).as("n_cells"),
          max("n").cast("long").as("n_events"))
    }),

    // rolling 24-bucket correlation between event volume and value sum
    // per type (the drift diagnostic between two aligned series) —
    // windows keyed by type; degenerate frames (zero variance or < 2
    // rows) emit NULL on both engines by explicit guard. NOTE: the
    // guard must not wrap `corr().over(w)` — window aggregates evaluate
    // for EVERY frame before the projection's `when` runs, and Spark's
    // Corr throws DIVIDE_BY_ZERO under ANSI on a zero-variance frame
    // (every hour having exactly one event makes the count series
    // constant — found by the sf0.001 edge sweep, r11). The correlation
    // is built from windowed MOMENTS instead (sums never divide), with
    // the division living in the row projection where `when` really is
    // lazy; same sn/sv guard as the oracle's corr().
    "q_rolling_corr" -> ((s, d) => {
      val hb = Tables.events(s, d)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).cast("double").as("n"),
          sum("value").as("v"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(-23, 0)
      val m = count(lit(1)).over(w).cast("double")
      val sx = sum("n").over(w)
      val sy = sum("v").over(w)
      val sxx = sum(col("n") * col("n")).over(w)
      val syy = sum(col("v") * col("v")).over(w)
      val sxy = sum(col("n") * col("v")).over(w)
      hb.withColumn("sn", stddev_pop("n").over(w))
        .withColumn("sv", stddev_pop("v").over(w))
        .withColumn("_m", m).withColumn("_sx", sx).withColumn("_sy", sy)
        .withColumn("_sxx", sxx).withColumn("_syy", syy).withColumn("_sxy", sxy)
        // the guard checks the MOMENT discriminants too (not just the
        // stably-computed sn/sv): m·sxx − sx² can cancel slightly
        // negative in floating point on a tiny-but-nonzero-variance
        // frame while stddev_pop's central-moment recurrence stays
        // positive, and sqrt(−ε) would emit NaN (r11 ADVICE)
        .withColumn("corr24",
          when(col("sn") > 0 && col("sv") > 0 &&
              col("_m") * col("_sxx") - col("_sx") * col("_sx") > 0 &&
              col("_m") * col("_syy") - col("_sy") * col("_sy") > 0,
            round((col("_m") * col("_sxy") - col("_sx") * col("_sy")) /
              sqrt(col("_m") * col("_sxx") - col("_sx") * col("_sx")) /
              sqrt(col("_m") * col("_syy") - col("_sy") * col("_sy")), 4)))
        .select("event_type", "hour", "corr24")
    }),

    // ---- triangle counting / clustering coefficient ------------------
    // cohesion of the user co-occurrence graph via the degree-ordered
    // forward algorithm ([[graft.ops.Graph.triangleCount]]) — oriented
    // out-lists bound the wedge blow-up at O(m^1.5) however skewed the
    // degrees; the oracle closes triangles with a plain 3-way self-join
    "q_triangle_count" -> ((s, d) =>
      graft.ops.Graph.triangleCount(
        userCooccurEdges(s, d), "item_a", "item_b")),

    // ---- label-propagation communities -------------------------------
    // who hangs out with whom: 3 synchronous LPA rounds (deterministic
    // min-label tie-break) over the same co-occurrence graph; output is
    // the community histogram pinned by min/sum of members. The oracle
    // unrolls all 3 rounds as CTEs — the whole fixpoint is hash-checked
    "q_label_prop" -> ((s, d) =>
      graft.ops.Graph.labelPropagation(
          userCooccurEdges(s, d), "item_a", "item_b", iters = 3)
        .groupBy("lbl")
        .agg(count(lit(1)).as("n_members"), min("node").as("min_node"),
          sum("node").cast("long").as("sum_node"))
        .orderBy("lbl")),

    // ---- k-core decomposition ----------------------------------------
    // the dense social core: 3 peeling rounds of "drop degree < 4" over
    // the co-occurrence graph. The oracle unrolls the identical rounds
    "q_kcore" -> ((s, d) =>
      graft.ops.Graph.kCore(
          userCooccurEdges(s, d), "item_a", "item_b", k = 4, iters = 3)
        .orderBy("node")),

    // ---- single-source BFS hop distances -----------------------------
    // frontier BFS from the smallest vertex, 3 hops; per-hop histogram
    "q_bfs_hops" -> ((s, d) => {
      val e = userCooccurEdges(s, d)
      val srcRow = e.agg(min(col("item_a"))).first()
      val src = if (srcRow.isNullAt(0)) 0L else srcRow.getLong(0)
      graft.ops.Graph.bfsDistances(e, "item_a", "item_b", src, maxHops = 3)
        .groupBy("hop")
        .agg(count(lit(1)).as("n_nodes"), min("node").as("min_node"),
          sum("node").cast("long").as("sum_node"))
        .orderBy("hop")
    })
  )

  val oracle: Map[String, String] = Map(
    "q_funnel_steps" ->
      """WITH s1 AS (SELECT user_id,
        |   min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY user_id HAVING t1 IS NOT NULL),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |  GROUP BY e.user_id)
        |SELECT count(t1) AS n_view, count(t2) AS n_view_click,
        | count(t3) AS n_view_click_purchase
        |FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 USING (user_id)""".stripMargin,

    "q_retention_cohort" ->
      """WITH cohort AS (SELECT user_id, min(ts::DATE) AS d0
        |  FROM events GROUP BY user_id)
        |SELECT d0, date_diff('day', d0, ts::DATE) AS day_offset,
        | count(DISTINCT user_id) AS n_active
        |FROM events JOIN cohort USING (user_id)
        |WHERE date_diff('day', d0, ts::DATE) BETWEEN 0 AND 7
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_event_transitions" ->
      """WITH lagged AS (SELECT
        |  lag(event_type) OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS prev_type,
        |  event_type AS curr_type
        | FROM events)
        |SELECT prev_type, curr_type, count(*) AS n
        |FROM lagged WHERE prev_type IS NOT NULL
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_attr_first" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |a AS (SELECT p_id, p_us, min(c_us) AS first_us
        |  FROM p JOIN c USING (user_id)
        |  WHERE c_us <= p_us AND c_us > p_us - 604800000000::BIGINT
        |  GROUP BY p_id, p_us)
        |SELECT make_timestamp(p.p_us)::DATE AS day,
        | count(*) AS n_purchases, count(a.first_us) AS n_attributed,
        | round(avg(p.p_us - a.first_us), 2) AS avg_gap_us
        |FROM p LEFT JOIN a ON p.p_id = a.p_id
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_trending_ewma" ->
      """WITH c AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |o AS (SELECT unnest(range(0, 24)) AS k),
        |ct AS (SELECT event_type, bucket + to_hours(k) AS tgt,
        |  n * pow(0.8, k) AS contrib FROM c CROSS JOIN o),
        |e AS (SELECT event_type, tgt, sum(contrib) AS ewma FROM ct GROUP BY 1, 2),
        |m AS (SELECT max(bucket) AS maxb FROM c)
        |SELECT event_type, round(ewma, 4) AS ewma
        |FROM e CROSS JOIN m WHERE tgt = maxb
        |ORDER BY ewma DESC, event_type""".stripMargin,

    "q_event_paths" ->
      """WITH g AS (SELECT event_type,
        |  lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
        |  lead(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS e3
        | FROM events)
        |SELECT concat_ws('>', event_type, e2, e3) AS path, count(*) AS n
        |FROM g WHERE e3 IS NOT NULL
        |GROUP BY 1 ORDER BY n DESC, path LIMIT 10""".stripMargin,

    "q_funnel_window" ->
      """WITH s1 AS (SELECT user_id,
        |   min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY user_id HAVING t1 IS NOT NULL),
        |s2 AS (SELECT e.user_id, min(e.ts) AS t2, min(s1.t1) AS t1
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'click' AND e.ts >= s1.t1
        |    AND e.ts <= s1.t1 + INTERVAL 1 DAY
        |  GROUP BY e.user_id),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        |    AND e.ts <= s2.t1 + INTERVAL 3 DAY
        |  GROUP BY e.user_id)
        |SELECT count(t1) AS n_view, count(t2) AS n_click_1d,
        | count(t3) AS n_purchase_3d
        |FROM s1 LEFT JOIN (SELECT user_id, t2 FROM s2) USING (user_id)
        | LEFT JOIN s3 USING (user_id)""".stripMargin,

    "q_conversion_lag" ->
      """WITH s1 AS (SELECT user_id,
        |   min(CASE WHEN event_type = 'view' THEN ts END) AS t1
        |  FROM events GROUP BY user_id HAVING t1 IS NOT NULL),
        |s3 AS (SELECT e.user_id, min(e.ts) AS t3
        |  FROM events e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= s1.t1
        |  GROUP BY e.user_id)
        |SELECT count(*) AS n_converted,
        | floor(avg(date_diff('second', t1, t3)) * 100 + 0.5) / 100
        |   AS avg_lag_sec,
        | max(date_diff('second', t1, t3)) AS max_lag_sec
        |FROM s1 JOIN s3 USING (user_id)""".stripMargin,

    // same 30-min-gap sessionization, bin cap, and +0.5 smoothing; every
    // float is a deterministic function of integer counts
    "q_woe_iv" ->
      """WITH g AS (SELECT user_id, ts, event_type,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
        |       THEN 1 ELSE 0 END AS brk
        | FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
        |s AS (SELECT user_id, event_type,
        |  sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS sid FROM g),
        |sess AS (SELECT user_id, sid, count(*) AS len,
        |  max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS lab
        | FROM s GROUP BY user_id, sid),
        |b AS (SELECT least(len, 8) AS bin,
        |  sum(CASE WHEN lab = 1 THEN 1 ELSE 0 END)::BIGINT AS n_good,
        |  sum(CASE WHEN lab = 0 THEN 1 ELSE 0 END)::BIGINT AS n_bad
        | FROM sess GROUP BY 1),
        |t AS (SELECT sum(n_good)::BIGINT AS gt, sum(n_bad)::BIGINT AS bt,
        |  count(*)::BIGINT AS k FROM b)
        |SELECT bin, n_good, n_bad,
        | floor(ln(((n_good + 0.5) / (gt + 0.5 * k)) /
        |          ((n_bad + 0.5) / (bt + 0.5 * k))) * 10000 + 0.5) / 10000
        |   AS woe,
        | floor((((n_good + 0.5) / (gt + 0.5 * k)) -
        |        ((n_bad + 0.5) / (bt + 0.5 * k))) *
        |       ln(((n_good + 0.5) / (gt + 0.5 * k)) /
        |          ((n_bad + 0.5) / (bt + 0.5 * k))) * 1000000 + 0.5) / 1000000
        |   AS iv_term
        |FROM b CROSS JOIN t ORDER BY bin""".stripMargin,

    "q_join_asof_nearest" ->
      """SELECT c.user_id, c.event_id,
        | (SELECT abs(date_diff('second', p.ts, c.ts))
        |   FROM events p
        |   WHERE p.event_type = 'purchase' AND p.user_id = c.user_id
        |   ORDER BY abs(date_diff('second', p.ts, c.ts)), p.ts
        |   LIMIT 1) AS nearest_gap_sec
        |FROM events c
        |WHERE c.event_type = 'click' AND c.user_id < 30
        |  AND EXISTS (SELECT 1 FROM events p WHERE p.event_type = 'purchase'
        |    AND p.user_id = c.user_id)
        |ORDER BY c.user_id, c.event_id""".stripMargin,

    "q_rfm_segments" ->
      """WITH r AS (SELECT o_custkey, max(o_orderdate) AS last_d,
        |   count(*) AS freq, sum(o_totalprice) AS monetary
        |  FROM orders GROUP BY o_custkey),
        |m AS (SELECT max(o_orderdate) AS max_d FROM orders),
        |seg AS (SELECT
        |   date_diff('day', last_d, max_d) AS recency_days, freq, monetary,
        |   CASE WHEN date_diff('day', last_d, max_d) <= 60 AND freq >= 12
        |     THEN 'champion'
        |    WHEN date_diff('day', last_d, max_d) <= 180 THEN 'active'
        |    ELSE 'lapsed' END AS segment
        |  FROM r CROSS JOIN m)
        |SELECT segment, count(*) AS n_customers,
        | floor(avg(freq) * 100 + 0.5) / 100 AS avg_freq,
        | floor(avg(monetary) * 100 + 0.5) / 100 AS avg_monetary,
        | max(recency_days) AS max_recency
        |FROM seg GROUP BY segment ORDER BY segment""".stripMargin,

    "q_abtest_welch" ->
      """WITH g AS (SELECT event_type, count(*) AS n, avg(value) AS m,
        |   var_samp(value) AS v
        |  FROM events WHERE event_type IN ('click', 'view')
        |  GROUP BY event_type),
        |a AS (SELECT n AS n_a, m AS m_a, v AS v_a FROM g
        |  WHERE event_type = 'click'),
        |b AS (SELECT n AS n_b, m AS m_b, v AS v_b FROM g
        |  WHERE event_type = 'view')
        |SELECT n_a, n_b,
        | floor(m_a * 1000 + 0.5) / 1000 AS mean_a,
        | floor(m_b * 1000 + 0.5) / 1000 AS mean_b,
        | floor((m_a - m_b) / sqrt(v_a / n_a + v_b / n_b) * 1000 + 0.5)
        |   / 1000 AS t_welch
        |FROM a CROSS JOIN b""".stripMargin,

    "q_anomaly_burst" ->
      """WITH buckets AS (SELECT event_type, date_trunc('hour', ts) AS bucket,
        |   count(*) AS n
        |  FROM events GROUP BY 1, 2),
        |stats AS (SELECT event_type, avg(n) AS mu, stddev_pop(n) AS sigma
        |  FROM buckets GROUP BY 1)
        |SELECT event_type, bucket, n,
        | CAST(floor((n - mu) / sigma * 100 + 0.5) AS BIGINT) AS z_x100
        |FROM buckets JOIN stats USING (event_type)
        |WHERE n > mu + 2.0 * sigma
        |ORDER BY event_type, bucket""".stripMargin,

    "q_rollup_time" ->
      """SELECT ts::DATE AS day, event_type, count(*) AS n,
        | round(sum(value), 2) AS sum_value
        |FROM events GROUP BY ROLLUP (day, event_type)
        |ORDER BY day NULLS FIRST, event_type NULLS FIRST""".stripMargin,

    "q_skyline" ->
      """SELECT p_partkey, p_retailprice, p_size
        |FROM part a
        |WHERE NOT EXISTS (SELECT 1 FROM part b
        |  WHERE b.p_retailprice <= a.p_retailprice
        |    AND b.p_size >= a.p_size
        |    AND (b.p_retailprice < a.p_retailprice
        |      OR b.p_size > a.p_size))
        |ORDER BY p_retailprice, p_partkey""".stripMargin,

    // six unrolled PageRank iterations — the oracle replays the exact
    // fixpoint loop, so any drift in edge weights, normalization, or the
    // teleport term hash-mismatches
    "q_pagerank" -> {
      val iters = (1 to 6).map { k =>
        s""", r$k AS (SELECT n.node,
           |   0.15 / nn.n + 0.85 * coalesce(s.m, 0) AS rank
           | FROM nodes n CROSS JOIN nn
           | LEFT JOIN (SELECT e.dst, sum(e.p * r.rank) AS m
           |            FROM e JOIN r${k - 1} r ON e.src = r.node
           |            GROUP BY e.dst) s
           |   ON s.dst = n.node)""".stripMargin
      }.mkString("\n")
      s"""WITH ord AS (SELECT event_type AS src,
         |   lead(event_type) OVER (PARTITION BY user_id
         |     ORDER BY ts, event_id) AS dst
         | FROM events),
         |edges AS (SELECT src, dst, count(*)::DOUBLE AS w FROM ord
         | WHERE dst IS NOT NULL GROUP BY src, dst),
         |outw AS (SELECT src, sum(w) AS tot FROM edges GROUP BY src),
         |e AS (SELECT edges.src, edges.dst, w / tot AS p
         | FROM edges JOIN outw ON edges.src = outw.src),
         |nodes AS (SELECT DISTINCT event_type AS node FROM events),
         |nn AS (SELECT count(*)::DOUBLE AS n FROM nodes),
         |r0 AS (SELECT node, 1.0 / n AS rank FROM nodes CROSS JOIN nn)
         |$iters
         |SELECT node, round(rank, 4) AS pr FROM r6
         |ORDER BY pr DESC, node""".stripMargin
    },

    "q_freq_pairs" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
        |SELECT a.event_type AS item_a, b.event_type AS item_b,
        | count(*) AS support
        |FROM ut a JOIN ut b
        |  ON a.user_id = b.user_id AND a.event_type < b.event_type
        |GROUP BY 1, 2 HAVING count(*) >= 10
        |ORDER BY support DESC, item_a, item_b""".stripMargin,

    "q_count_min" ->
      """SELECT event_type, count(*) AS exact_n, TRUE AS cms_ok
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    // credit fold replayed in the same pinned order: exact (day,n_touch)
    // counts, then a left fold in n_touch order (list_reduce's init is
    // the prepended 0.0 — the extra 0.0+first is float-exact)
    "q_attr_linear" ->
      """WITH p AS (SELECT event_id AS p_id, user_id, epoch_us(ts) AS p_us
        |  FROM events WHERE event_type = 'purchase'),
        |c AS (SELECT user_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |t AS (SELECT p.p_id, c.c_us,
        |   count(*) OVER (PARTITION BY p.p_id) AS n_touch
        |  FROM p JOIN c ON p.user_id = c.user_id
        |  WHERE c.c_us <= p.p_us AND c.c_us > p.p_us - 604800000000),
        |td AS (SELECT make_timestamp(c_us)::DATE AS day, p_id, n_touch FROM t),
        |grp AS (SELECT day, n_touch, count(*) AS g FROM td GROUP BY 1, 2),
        |cr AS (SELECT day, round(list_reduce(
        |    list_prepend(0.0::DOUBLE,
        |      list(g::DOUBLE / n_touch ORDER BY n_touch)),
        |    (a, x) -> a + x), 2) AS credit
        |  FROM grp GROUP BY day),
        |ct AS (SELECT day, count(DISTINCT p_id) AS n_purchases,
        |    count(*) AS n_touches
        |  FROM td GROUP BY day)
        |SELECT cr.day, cr.credit, ct.n_purchases, ct.n_touches
        |FROM cr JOIN ct USING (day) ORDER BY day""".stripMargin,

    "q_window_median" ->
      """SELECT user_id, event_id,
        | round(quantile_cont(value, 0.5) OVER (PARTITION BY user_id
        |   ORDER BY epoch_us(ts), event_id
        |   ROWS BETWEEN 9 PRECEDING AND CURRENT ROW), 4) AS med10
        |FROM events""".stripMargin,

    // the oracle pins the exact intersection and the bound flag at
    // literal TRUE — the sketch math itself is engine-specific
    "q_hll_intersect" ->
      """WITH a AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'click'),
        |b AS (SELECT DISTINCT user_id FROM events
        |  WHERE event_type = 'purchase')
        |SELECT (SELECT count(*) FROM a WHERE user_id IN
        |  (SELECT user_id FROM b)) AS exact_i, TRUE AS hll_ok""".stripMargin,

    "q_ks_test" ->
      """WITH e AS (SELECT event_type AS g, value FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |n AS (SELECT
        |   sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::DOUBLE AS na,
        |   sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)::DOUBLE AS nb
        |  FROM e),
        |v AS (SELECT value,
        |   sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::BIGINT AS a,
        |   sum(CASE WHEN g = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS b
        |  FROM e GROUP BY value),
        |c AS (SELECT a, b,
        |   sum(a) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS ca,
        |   sum(b) OVER (ORDER BY value ROWS UNBOUNDED PRECEDING) AS cb
        |  FROM v)
        |SELECT round(max(abs(ca / na - cb / nb)), 4) AS ks_d,
        | sum(a + b)::BIGINT AS n_total
        |FROM c CROSS JOIN n""".stripMargin,

    "q_mannwhitney" ->
      """WITH e AS (SELECT event_type AS g, value FROM events
        |  WHERE event_type IN ('click', 'purchase')),
        |r AS (SELECT g, value,
        |   rank() OVER (ORDER BY value) AS rmin,
        |   count(*) OVER (PARTITION BY value) AS cnt
        |  FROM e),
        |n AS (SELECT sum(CASE WHEN g = 'click' THEN 1 ELSE 0 END)::DOUBLE
        |   AS na FROM e)
        |SELECT round(sum(rmin + (cnt - 1) / 2.0), 2) AS rank_sum_a,
        | round(sum(rmin + (cnt - 1) / 2.0) - max(na * (na + 1) / 2), 2)
        |   AS u_a,
        | count(*) AS n_a
        |FROM r CROSS JOIN n WHERE g = 'click'""".stripMargin,

    "q_psi" ->
      """WITH ref AS (SELECT value FROM events
        |  WHERE ts < TIMESTAMP '2024-01-15'),
        |cur AS (SELECT value FROM events
        |  WHERE ts >= TIMESTAMP '2024-01-15'),
        |ed AS (SELECT quantile_cont(value,
        |   [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS e
        |  FROM ref),
        |pr AS (SELECT len(list_filter(e, x -> value > x)) AS bin,
        |   count(*) OVER () AS t FROM ref CROSS JOIN ed),
        |qr AS (SELECT len(list_filter(e, x -> value > x)) AS bin,
        |   count(*) OVER () AS t FROM cur CROSS JOIN ed),
        |p AS (SELECT bin, count(*) / max(t)::DOUBLE AS p FROM pr
        |  GROUP BY bin),
        |q AS (SELECT bin, count(*) / max(t)::DOUBLE AS q FROM qr
        |  GROUP BY bin)
        |SELECT round(sum((p.p - q.q) * ln(p.p / q.q)), 4) AS psi,
        | count(*) AS n_bins
        |FROM p JOIN q USING (bin)""".stripMargin,

    // hex→int without conv(): positional strpos arithmetic over the
    // 4-char md5 prefix, then the identical Efraimidis–Spirakis key
    "q_sample_weighted" ->
      """WITH e AS (SELECT event_id, event_type, value,
        |   substr(md5(CAST(event_id AS VARCHAR)), 1, 4) AS hx
        |  FROM events WHERE value > 0),
        |k AS (SELECT event_id, event_type, value,
        |   pow((
        |     (strpos('0123456789abcdef', substr(hx, 1, 1)) - 1) * 4096 +
        |     (strpos('0123456789abcdef', substr(hx, 2, 1)) - 1) * 256 +
        |     (strpos('0123456789abcdef', substr(hx, 3, 1)) - 1) * 16 +
        |     (strpos('0123456789abcdef', substr(hx, 4, 1)) - 1)
        |     + 1)::DOUBLE / 65537.0, 1.0 / value) AS skey
        |  FROM e),
        |top AS (SELECT event_type, value FROM k
        |  ORDER BY skey DESC, event_id LIMIT 200)
        |SELECT event_type, count(*) AS n_sampled,
        | round(sum(value), 2) AS w_sampled
        |FROM top GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_active_users" ->
      """WITH h AS (SELECT max(ts) AS h FROM events)
        |SELECT
        | count(DISTINCT CASE WHEN ts > h - INTERVAL 1 DAY
        |   THEN user_id END) AS dau,
        | count(DISTINCT CASE WHEN ts > h - INTERVAL 7 DAY
        |   THEN user_id END) AS wau,
        | count(DISTINCT CASE WHEN ts > h - INTERVAL 30 DAY
        |   THEN user_id END) AS mau,
        | round(count(DISTINCT CASE WHEN ts > h - INTERVAL 1 DAY
        |     THEN user_id END)::DOUBLE
        |   / count(DISTINCT CASE WHEN ts > h - INTERVAL 30 DAY
        |     THEN user_id END), 4) AS stickiness
        |FROM events CROSS JOIN h""".stripMargin,

    "q_power_users" ->
      """WITH per AS (SELECT user_id, count(*) AS n
        |  FROM events GROUP BY 1),
        |tot AS (SELECT sum(n)::DOUBLE AS t, count(*) AS u FROM per),
        |r AS (SELECT n,
        |   row_number() OVER (ORDER BY n DESC, user_id) AS rk,
        |   sum(n) OVER (ORDER BY n DESC, user_id
        |     ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM per)
        |SELECT min(rk) AS users_for_80pct, max(u) AS n_users,
        | round(min(rk)::DOUBLE / max(u), 4) AS share
        |FROM r CROSS JOIN tot WHERE cum >= 0.8 * t""".stripMargin,

    "q_lorenz" ->
      """WITH rev AS (SELECT n_regionkey, c_custkey,
        |   sum(o_totalprice) AS x
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |dec AS (SELECT n_regionkey, x,
        |   ntile(10) OVER (PARTITION BY n_regionkey
        |     ORDER BY x, c_custkey) AS decile
        |  FROM rev),
        |bd AS (SELECT n_regionkey, decile, sum(x) AS dx,
        |   count(*) AS n_cust
        |  FROM dec GROUP BY 1, 2)
        |SELECT n_regionkey, decile, n_cust,
        | round(sum(dx) OVER (PARTITION BY n_regionkey ORDER BY decile
        |     ROWS UNBOUNDED PRECEDING)
        |   / sum(dx) OVER (PARTITION BY n_regionkey), 4) AS cum_share
        |FROM bd ORDER BY n_regionkey, decile""".stripMargin,

    "q_autocorr" ->
      """WITH hb AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |l AS (SELECT event_type, n,
        |   lag(n, 24) OVER (PARTITION BY event_type ORDER BY hour)
        |     AS n24
        |  FROM hb)
        |SELECT event_type, count(*) AS n_points,
        | round(corr(n, n24), 4) AS acf24
        |FROM l WHERE n24 IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_survival_km" ->
      """WITH fv AS (SELECT user_id, min(epoch_us(ts)) AS v_us
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |fb AS (SELECT user_id, min(epoch_us(ts)) AS p_us
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |h AS (SELECT max(epoch_us(ts)) AS h_us FROM events),
        |subj AS (SELECT
        |   (CASE WHEN p_us IS NOT NULL
        |    THEN floor((p_us - v_us) / 86400000000)
        |    ELSE floor((h_us - v_us) / 86400000000) END)::BIGINT AS t_day,
        |   p_us IS NOT NULL AS converted
        |  FROM fv LEFT JOIN fb USING (user_id) CROSS JOIN h
        |  WHERE p_us IS NULL OR p_us >= v_us),
        |bd AS (SELECT t_day,
        |   sum(CASE WHEN converted THEN 1 ELSE 0 END)::BIGINT AS d,
        |   count(*) AS leaving
        |  FROM subj GROUP BY 1),
        |tot AS (SELECT count(*) AS n0 FROM subj),
        |r AS (SELECT t_day, d, leaving,
        |   (n0 - coalesce(sum(leaving) OVER (ORDER BY t_day
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))::BIGINT
        |     AS at_risk
        |  FROM bd CROSS JOIN tot),
        |f AS (SELECT t_day, d, at_risk,
        |   1.0 - d::DOUBLE / at_risk AS f FROM r),
        |z AS (SELECT t_day, d, at_risk, f,
        |   sum(CASE WHEN f <= 0 THEN 1 ELSE 0 END)
        |     OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS z,
        |   sum(CASE WHEN f > 0 THEN ln(f) END)
        |     OVER (ORDER BY t_day ROWS UNBOUNDED PRECEDING) AS ls
        |  FROM f)
        |SELECT t_day, d, at_risk,
        | CASE WHEN z > 0 THEN 0.0 ELSE round(exp(ls), 4) END AS surv
        |FROM z ORDER BY t_day""".stripMargin,

    "q_gini" ->
      """WITH rev AS (SELECT n_regionkey, c_custkey,
        |   sum(o_totalprice) AS x
        |  FROM customer
        |  JOIN orders ON c_custkey = o_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY 1, 2),
        |rk AS (SELECT n_regionkey, x,
        |   row_number() OVER (PARTITION BY n_regionkey
        |     ORDER BY x, c_custkey) AS i
        |  FROM rev)
        |SELECT n_regionkey, count(*) AS n_cust,
        | round(2.0 * sum(i * x) / (count(*) * sum(x))
        |   - (count(*) + 1.0) / count(*), 4) AS gini
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,

    "q_precedence" ->
      """WITH ut AS (SELECT user_id, event_type,
        |   min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
        |  FROM events GROUP BY 1, 2)
        |SELECT a.event_type AS t_a, b.event_type AS t_b,
        | count(*) AS n_users
        |FROM ut a JOIN ut b ON a.user_id = b.user_id
        |  AND a.event_type <> b.event_type AND a.mn < b.mx
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_ab_srm" ->
      """WITH u AS (SELECT DISTINCT user_id FROM events),
        |arms AS (SELECT CASE WHEN substr(
        |    md5(CAST(user_id AS VARCHAR)), 1, 1)
        |    IN ('0','1','2','3','4','5','6','7') THEN 0 ELSE 1 END AS arm,
        |   count(*) AS n
        |  FROM u GROUP BY 1),
        |t AS (SELECT sum(n)::DOUBLE AS t FROM arms)
        |SELECT max(t)::BIGINT AS n_users,
        | round(sum(pow(n - t/2, 2) / (t/2)), 4) AS chi2,
        | sum(pow(n - t/2, 2) / (t/2)) > 3.841 AS srm_flag
        |FROM arms, t""".stripMargin,

    "q_source_overlap" ->
      """WITH fp AS (SELECT DISTINCT source,
        |   md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS fp
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b,
        | count(*) AS n_shared
        |FROM fp a JOIN fp b
        |  ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "q_forecast_snaive" ->
      """WITH hb AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, hour, n,
        |   lag(n, 24) OVER (PARTITION BY event_type ORDER BY hour)
        |     AS yhat
        |  FROM hb)
        |SELECT event_type, count(*) AS n_points,
        | round(avg(abs(n - yhat)), 4) AS mae,
        | round(avg(n - yhat), 4) AS bias,
        | round(max(abs(n - yhat)), 2) AS worst
        |FROM f
        |WHERE hour >= TIMESTAMP '2024-01-25' AND yhat IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_changepoint" ->
      """WITH hb AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |m AS (SELECT event_type, hour, n,
        |   avg(n) OVER (PARTITION BY event_type) AS mu FROM hb),
        |c AS (SELECT event_type, hour, n,
        |   sum(n - mu) OVER (PARTITION BY event_type ORDER BY hour
        |     ROWS UNBOUNDED PRECEDING) AS s
        |  FROM m),
        |best AS (SELECT event_type, hour AS cp_hour,
        |   round(abs(s), 2) AS max_s
        |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
        |     ORDER BY abs(s) DESC, hour) AS rk FROM c) WHERE rk = 1)
        |SELECT hb.event_type, cp_hour, max_s,
        | round(avg(CASE WHEN hour <= cp_hour THEN n END), 4)
        |   AS mean_before,
        | round(avg(CASE WHEN hour > cp_hour THEN n END), 4) AS mean_after
        |FROM hb JOIN best ON hb.event_type = best.event_type
        |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin,

    "q_sql_recursive" ->
      """WITH RECURSIVE ord AS (
        |  SELECT event_type AS src,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS dst
        |  FROM events),
        |e AS (SELECT DISTINCT src, dst FROM ord WHERE dst IS NOT NULL),
        |paths(node, depth) AS (
        |  SELECT 'view' AS node, 0 AS depth
        |  UNION ALL
        |  SELECT e.dst, p.depth + 1
        |  FROM paths p JOIN e ON e.src = p.node WHERE p.depth < 4)
        |SELECT node, depth, count(*) AS n_paths
        |FROM paths GROUP BY node, depth
        |ORDER BY node, depth""".stripMargin,

    "q_mutual_info" ->
      """WITH e AS (SELECT event_type AS x, hour(ts) AS y FROM events),
        |j AS (SELECT x, y, count(*) AS nxy FROM e GROUP BY 1, 2),
        |px AS (SELECT x, count(*) AS nx FROM e GROUP BY 1),
        |py AS (SELECT y, count(*) AS ny FROM e GROUP BY 1),
        |t AS (SELECT count(*)::DOUBLE AS n FROM e)
        |SELECT round(sum(nxy / n * log2(nxy * n / (nx * ny))), 4)
        |   AS mi_bits,
        | count(*) AS n_cells, max(n)::BIGINT AS n_events
        |FROM j JOIN px USING (x) JOIN py USING (y) CROSS JOIN t""".stripMargin,

    // the guard mirrors the Spark side's MOMENT-discriminant checks too
    // (r12): on a tiny-variance frame m·sxx − sx² can cancel ≤ 0 in the
    // raw-moment form while stddev_pop's recurrence stays positive —
    // both engines must take the NULL arm on exactly the same frames
    "q_rolling_corr" ->
      """WITH hb AS (SELECT event_type, date_trunc('hour', ts) AS hour,
        |   count(*)::DOUBLE AS n, sum(value) AS v
        |  FROM events GROUP BY 1, 2),
        |f AS (SELECT event_type, hour,
        |   stddev_pop(n) OVER w AS sn, stddev_pop(v) OVER w AS sv,
        |   corr(n, v) OVER w AS c,
        |   count(*) OVER w ::DOUBLE AS m,
        |   sum(n) OVER w AS sx, sum(v) OVER w AS sy,
        |   sum(n * n) OVER w AS sxx, sum(v * v) OVER w AS syy
        |  FROM hb WINDOW w AS (PARTITION BY event_type ORDER BY hour
        |    ROWS BETWEEN 23 PRECEDING AND CURRENT ROW))
        |SELECT event_type, hour,
        | CASE WHEN sn > 0 AND sv > 0
        |   AND m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0
        |  THEN round(c, 4) END AS corr24
        |FROM f""".stripMargin,

    "q_triangle_count" ->
      s"""WITH $sqlCooccurEdges,
         |deg AS (SELECT v, count(*) AS d FROM
         |  (SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e)
         | GROUP BY v),
         |tri AS (SELECT count(*) AS n_triangles FROM e e1
         |  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
         |  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b)
         |SELECT (SELECT count(*) FROM e) AS n_edges,
         | (SELECT sum(d*(d-1)/2)::BIGINT FROM deg) AS n_wedges,
         | n_triangles,
         | round(3.0 * n_triangles /
         |   (SELECT sum(d*(d-1)/2) FROM deg), 4) AS gcc
         |FROM tri""".stripMargin,

    // three unrolled LPA rounds — most-frequent neighbor label,
    // min-label tie-break, exactly the Spark side's window election
    "q_label_prop" -> {
      val rounds = (1 to 3).map { k =>
        s""",l$k AS (SELECT v AS node, lbl FROM (
           |   SELECT u.v, l.lbl,
           |    row_number() OVER (PARTITION BY u.v
           |      ORDER BY count(*) DESC, l.lbl) AS rn
           |   FROM und u JOIN l${k - 1} l ON u.n = l.node
           |   GROUP BY u.v, l.lbl) WHERE rn = 1)""".stripMargin
      }.mkString("\n")
      s"""WITH $sqlCooccurEdges,
         |und AS (SELECT a AS v, b AS n FROM e
         |  UNION ALL SELECT b AS v, a AS n FROM e),
         |l0 AS (SELECT DISTINCT v AS node, v AS lbl FROM und)
         |$rounds
         |SELECT lbl, count(*) AS n_members, min(node) AS min_node,
         | sum(node)::BIGINT AS sum_node
         |FROM l3 GROUP BY lbl ORDER BY lbl""".stripMargin
    },

    "q_kcore" -> {
      val rounds = (1 to 3).map { r =>
        s""",k$r AS (SELECT a FROM u${r - 1} GROUP BY a HAVING count(*) >= 4),
           |u$r AS (SELECT u.a, u.b FROM u${r - 1} u
           |  JOIN k$r x ON u.a = x.a JOIN k$r y ON u.b = y.a)""".stripMargin
      }.mkString("\n")
      s"""WITH $sqlCooccurEdges,
         |u0 AS (SELECT a, b FROM e WHERE a <> b
         |  UNION SELECT b, a FROM e WHERE a <> b)
         |$rounds
         |SELECT a AS node, count(*) AS degree
         |FROM u3 GROUP BY a ORDER BY node""".stripMargin
    },

    "q_bfs_hops" -> {
      val hops = (1 to 3).map { h =>
        s""",f$h AS (SELECT DISTINCT u.b AS node
           |  FROM u0 u JOIN f${h - 1} p ON u.a = p.node
           |  WHERE u.b NOT IN (SELECT node FROM d${h - 1})),
           |d$h AS (SELECT node, hop FROM d${h - 1}
           |  UNION ALL SELECT node, $h AS hop FROM f$h)""".stripMargin
      }.mkString("\n")
      s"""WITH $sqlCooccurEdges,
         |u0 AS (SELECT a, b FROM e WHERE a <> b
         |  UNION SELECT b, a FROM e WHERE a <> b),
         |d0 AS (SELECT min(a) AS node, 0 AS hop FROM e),
         |f0 AS (SELECT node FROM d0)
         |$hops
         |SELECT hop, count(*) AS n_nodes, min(node) AS min_node,
         | sum(node)::BIGINT AS sum_node
         |FROM d3 GROUP BY hop ORDER BY hop""".stripMargin
    },

    "q_chi2" ->
      """WITH ev AS (SELECT event_type AS t,
        |   CAST(floor(value / 250.0) AS INT) AS b FROM events),
        |n AS (SELECT count(*)::DOUBLE AS n FROM ev),
        |cells AS (SELECT t, b, count(*) AS o FROM ev GROUP BY 1, 2),
        |rt AS (SELECT t, sum(o)::BIGINT AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT b, sum(o)::BIGINT AS ct FROM cells GROUP BY 1),
        |x AS (SELECT cells.o, rt.rt::DOUBLE * ct.ct / n.n AS e
        |  FROM cells JOIN rt USING (t) JOIN ct USING (b) CROSS JOIN n)
        |SELECT count(*) AS n_cells,
        | (SELECT (count(DISTINCT t) - 1) * (count(DISTINCT b) - 1)
        |    FROM ev)::BIGINT AS dof,
        | round(sum(pow(o - e, 2) / e), 4) AS chi2
        |FROM x""".stripMargin,

    "q_ohlc" ->
      """SELECT CAST(ts AS DATE) AS day,
        | round(arg_min(value,
        |   printf('%020d|%020d', epoch_us(ts), event_id)), 2) AS open,
        | round(max(value), 2) AS high, round(min(value), 2) AS low,
        | round(arg_max(value,
        |   printf('%020d|%020d', epoch_us(ts), event_id)), 2) AS close,
        | count(*) AS n_trades, round(sum(value), 2) AS volume
        |FROM events WHERE event_type = 'purchase'
        |GROUP BY 1 ORDER BY day""".stripMargin,

    "q_cuped" ->
      """WITH per AS (SELECT user_id,
        |   sum(CASE WHEN ts < TIMESTAMP '2024-01-15' THEN value
        |     ELSE 0 END) AS x,
        |   sum(CASE WHEN ts >= TIMESTAMP '2024-01-15' THEN value
        |     ELSE 0 END) AS y
        |  FROM events GROUP BY 1),
        |st AS (SELECT covar_pop(x, y) / var_pop(x) AS theta,
        |   avg(x) AS mx FROM per)
        |SELECT count(*) AS n_users, round(max(theta), 4) AS theta,
        | round(var_pop(y), 2) AS var_y,
        | round(var_pop(y - theta * (x - mx)), 2) AS var_y_adj,
        | round((1.0 - var_pop(y - theta * (x - mx)) / var_pop(y)) * 100,
        |   2) AS var_reduction_pct
        |FROM per CROSS JOIN st""".stripMargin,

    // SPRT boundaries/log-ratios are the Scala doubles interpolated
    // verbatim so libm differences cannot skew the cumsum
    "q_sprt" -> {
      val lr1 = math.log(0.55 / 0.45)
      val lr0 = math.log(0.45 / 0.55)
      val bound = math.log(19.0)
      s"""WITH obs AS (SELECT event_id, ts,
         |   CASE WHEN value > 500 THEN 1 ELSE 0 END AS x
         |  FROM events WHERE event_type = 'purchase'),
         |p AS (SELECT row_number() OVER (ORDER BY ts, event_id) AS i,
         |   sum(x) OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
         |     AS cx
         |  FROM obs),
         |c AS (SELECT i,
         |   cx::DOUBLE * $lr1::DOUBLE + (i - cx)::DOUBLE * $lr0::DOUBLE AS s
         |  FROM p),
         |cr AS (SELECT min(i) AS first_cross FROM c WHERE abs(s) >= $bound),
         |fin AS (SELECT count(*) AS n_obs,
         |   round(max_by(s, i), 4) AS final_llr FROM c)
         |SELECT fin.n_obs, cr.first_cross,
         | CASE WHEN cs.s >= $bound THEN 'accept_h1'
         |      WHEN cs.s <= -$bound THEN 'accept_h0'
         |      ELSE 'continue' END AS decision,
         | round(cs.s, 4) AS llr_at_cross, fin.final_llr
         |FROM fin CROSS JOIN cr
         |LEFT JOIN c cs ON cs.i = cr.first_cross""".stripMargin
    },

    "q_outlier_mad" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        |  FROM daily GROUP BY 1),
        |dev AS (SELECT d.event_type, d.n, abs(d.n - m.med) AS adev
        |  FROM daily d JOIN med m USING (event_type)),
        |mad AS (SELECT dv.event_type, max(m.med) AS med,
        |   quantile_cont(dv.adev, 0.5) AS mad
        |  FROM dev dv JOIN med m USING (event_type) GROUP BY 1),
        |z AS (SELECT d.event_type, m.med, m.mad,
        |   CASE WHEN m.mad > 0 THEN 0.6745 * (d.n - m.med) / m.mad END AS rz
        |  FROM dev d JOIN mad m USING (event_type))
        |SELECT event_type, count(*) AS n_days,
        | round(max(med), 4) AS med, round(max(mad), 4) AS mad,
        | sum(CASE WHEN abs(rz) > 3.5 THEN 1 ELSE 0 END)::BIGINT AS n_outliers,
        | round(max(abs(rz)), 4) AS max_abs_rz
        |FROM z GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_theilsen" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |di AS (SELECT event_type, n,
        |   date_diff('day', min(day) OVER (PARTITION BY event_type),
        |     day)::DOUBLE AS idx
        |  FROM daily),
        |p AS (SELECT a.event_type, (b.n - a.n) / (b.idx - a.idx) AS s
        |  FROM di a JOIN di b
        |   ON a.event_type = b.event_type AND a.idx < b.idx),
        |sl AS (SELECT event_type, count(*) AS n_pairs,
        |   quantile_cont(s, 0.5) AS slope FROM p GROUP BY 1),
        |ic AS (SELECT d.event_type, sl.n_pairs, sl.slope,
        |   d.n - sl.slope * d.idx AS ic
        |  FROM di d JOIN sl USING (event_type))
        |SELECT event_type, max(n_pairs)::BIGINT AS n_pairs,
        | round(max(slope), 4) AS slope,
        | round(quantile_cont(ic, 0.5), 4) AS intercept
        |FROM ic GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_mann_kendall" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |   count(*)::BIGINT AS n FROM events GROUP BY 1, 2),
        |st AS (SELECT a.event_type,
        |   sum(CASE WHEN b.n > a.n THEN 1 WHEN b.n < a.n THEN -1
        |     ELSE 0 END)::BIGINT AS s
        |  FROM daily a JOIN daily b
        |   ON a.event_type = b.event_type AND a.day < b.day
        |  GROUP BY 1),
        |tg AS (SELECT event_type, n, count(*)::BIGINT AS c
        |  FROM daily GROUP BY 1, 2),
        |ties AS (SELECT event_type, sum(c)::BIGINT AS nd,
        |   sum(c * (c - 1) * (2*c + 5))::BIGINT AS tsum
        |  FROM tg GROUP BY 1),
        |v AS (SELECT st.event_type, st.s, ties.nd,
        |   (ties.nd * (ties.nd - 1) * (2*ties.nd + 5) - ties.tsum)::DOUBLE
        |     / 18.0 AS vr
        |  FROM st JOIN ties USING (event_type)),
        |z AS (SELECT event_type, nd, s, vr,
        |   CASE WHEN s > 0 THEN (s - 1)::DOUBLE / sqrt(vr)
        |        WHEN s < 0 THEN (s + 1)::DOUBLE / sqrt(vr)
        |        ELSE 0.0 END AS z
        |  FROM v)
        |SELECT event_type, nd AS n_days, s, round(vr, 4) AS var_s,
        | round(z, 4) AS z,
        | CASE WHEN z > 1.96 THEN 'increasing'
        |      WHEN z < -1.96 THEN 'decreasing'
        |      ELSE 'no_trend' END AS trend
        |FROM z ORDER BY event_type""".stripMargin,

    // the fold replays Spark's aggregate HOF exactly: same init, same
    // left-to-right operation order, lNew recomputed textually in the
    // trend update on BOTH engines — bit-identical doubles before round
    "q_holt_winters" ->
      """WITH daily AS (SELECT event_type, date_trunc('day', ts) AS day,
        |   count(*)::DOUBLE AS n FROM events GROUP BY 1, 2),
        |ser AS (SELECT event_type, list(n ORDER BY day) AS ys
        |  FROM daily GROUP BY 1),
        |st AS (SELECT event_type, len(ys)::INT AS n_days,
        |  list_reduce(
        |    list_prepend([0.0, 0.0, 0.0]::DOUBLE[],
        |      list_transform(ys, y -> [y]::DOUBLE[])),
        |    (acc, x) -> CASE
        |      WHEN acc[3] = 0.0 THEN [x[1], 0.0, 1.0]
        |      WHEN acc[3] = 1.0 THEN [x[1], x[1] - acc[1], 2.0]
        |      ELSE [0.5*x[1] + 0.5*(acc[1] + acc[2]),
        |            0.3*((0.5*x[1] + 0.5*(acc[1] + acc[2])) - acc[1])
        |              + 0.7*acc[2],
        |            acc[3] + 1.0] END) AS f
        |  FROM ser)
        |SELECT event_type, n_days, round(f[1], 4) AS level,
        | round(f[2], 4) AS trend,
        | round(f[1] + 3.0 * f[2], 4) AS forecast3
        |FROM st ORDER BY event_type""".stripMargin,

    // the oracle replays the full DDSketch pipeline — γ is the
    // shortest-round-trip repr of the Scala double, so ln/pow see
    // bit-identical inputs on both engines — and pins the in-query
    // α-guarantee flags at literal TRUE
    "q_ddsketch" -> {
      val g = graft.ops.Sketches.ddGamma(0.01).toString
      s"""WITH b AS (SELECT event_type,
         |   ceil(ln(value)/ln($g))::BIGINT AS bucket, count(*) AS cnt
         |  FROM events WHERE value > 0 GROUP BY 1, 2),
         |c AS (SELECT *,
         |   sum(cnt) OVER (PARTITION BY event_type ORDER BY bucket)
         |     AS cum,
         |   sum(cnt) OVER (PARTITION BY event_type) AS n FROM b),
         |s AS (SELECT event_type, max(n) AS n,
         |   min(CASE WHEN cum >= floor(0.50*(n-1))+1 THEN bucket END)
         |     AS b50,
         |   min(CASE WHEN cum >= floor(0.95*(n-1))+1 THEN bucket END)
         |     AS b95,
         |   min(CASE WHEN cum >= floor(0.99*(n-1))+1 THEN bucket END)
         |     AS b99
         |  FROM c GROUP BY event_type)
         |SELECT event_type, n::BIGINT AS n,
         | round(2*pow($g, b50)/($g+1), 4) AS p50,
         | round(2*pow($g, b95)/($g+1), 4) AS p95,
         | round(2*pow($g, b99)/($g+1), 4) AS p99,
         | TRUE AS ok_p50, TRUE AS ok_p95, TRUE AS ok_p99
         |FROM s ORDER BY event_type""".stripMargin
    },

    "q_seasonal_anomaly" ->
      """WITH h AS (SELECT event_type, hour(ts) AS hod, value FROM events),
        |med AS (SELECT event_type, hod, median(value) AS med
        |  FROM h GROUP BY event_type, hod),
        |j AS (SELECT h.event_type, h.hod, h.value, med.med FROM h
        |  JOIN med ON h.event_type = med.event_type AND h.hod = med.hod),
        |mad AS (SELECT event_type, hod, median(abs(value - med)) AS mad
        |  FROM j GROUP BY event_type, hod)
        |SELECT j.event_type, count(*) AS n,
        | sum(CASE WHEN abs(j.value - j.med) > 3 * mad.mad
        |     THEN 1 ELSE 0 END)::BIGINT AS n_anom,
        | round(avg(mad.mad), 4) AS avg_mad
        |FROM j JOIN mad
        |  ON j.event_type = mad.event_type AND j.hod = mad.hod
        |GROUP BY j.event_type ORDER BY j.event_type""".stripMargin,

    // the oracle recomputes from scratch over the whole table — the
    // incremental merge must be indistinguishable from a full rescan
    "q_incremental_agg" ->
      """SELECT ts::DATE AS day, event_type, count(*) AS n,
        | round(sum(value), 2) AS sum_v,
        | round(min(value), 2) AS min_v,
        | round(max(value), 2) AS max_v,
        | round(sum(value) / count(*), 4) AS avg_v
        |FROM events GROUP BY day, event_type
        |ORDER BY day, event_type""".stripMargin,

    // full outer on the key; IS DISTINCT FROM = Spark's null-safe <=>
    "q_snapshot_diff" ->
      """WITH b AS (SELECT c_custkey, c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 7 <> 0),
        |a AS (SELECT c_custkey,
        |  CASE WHEN c_custkey % 5 = 0 THEN c_acctbal + 10.0
        |       ELSE c_acctbal END AS c_acctbal, c_mktsegment
        |  FROM customer WHERE c_custkey % 11 <> 0),
        |j AS (SELECT coalesce(b.c_custkey, a.c_custkey) AS c_custkey,
        |  CASE WHEN b.c_custkey IS NULL THEN 'I'
        |       WHEN a.c_custkey IS NULL THEN 'D'
        |       WHEN b.c_acctbal IS DISTINCT FROM a.c_acctbal
        |         OR b.c_mktsegment IS DISTINCT FROM a.c_mktsegment THEN 'U'
        |  END AS op
        | FROM b FULL OUTER JOIN a ON b.c_custkey = a.c_custkey)
        |SELECT c_custkey, op FROM j WHERE op IS NOT NULL""".stripMargin,

    "q_cdc_apply" ->
      """WITH log AS (SELECT user_id, ts, event_id,
        |   CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |   value,
        |   row_number() OVER (PARTITION BY user_id
        |     ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |SELECT user_id, round(value, 2) AS final_value
        |FROM log WHERE rn = 1 AND op = 'U' ORDER BY user_id""".stripMargin,

    "q_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |   CASE WHEN lag(event_type) OVER (PARTITION BY user_id
        |       ORDER BY ts, event_id)
        |      IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
        | FROM events),
        |g AS (SELECT user_id, event_type, ts,
        |   sum(chg) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id) AS grp FROM o),
        |iv AS (SELECT user_id, event_type, grp, min(ts) AS valid_from,
        |   max(ts) AS last_seen, count(*) AS n_rows
        | FROM g GROUP BY user_id, event_type, grp)
        |SELECT user_id, count(*) AS n_versions, max(n_rows) AS longest_run,
        | round(sum(epoch(last_seen) - epoch(valid_from)), 1)
        |   AS total_span_s
        |FROM iv GROUP BY user_id ORDER BY user_id""".stripMargin,

    "q_time_weighted_avg" ->
      """WITH o AS (SELECT user_id, value,
        |   epoch(lead(ts) OVER (PARTITION BY user_id
        |     ORDER BY ts, event_id)) - epoch(ts) AS dt
        | FROM events)
        |SELECT user_id, round(sum(value * dt) / sum(dt), 4) AS twa,
        | count(*) AS n
        |FROM o WHERE dt IS NOT NULL GROUP BY user_id HAVING sum(dt) > 0
        |ORDER BY user_id""".stripMargin,

    "q_sequence_match" ->
      """WITH j AS (SELECT user_id,
        |  string_agg(substr(event_type, 1, 1), ''
        |    ORDER BY ts, event_id) AS journey
        | FROM events GROUP BY user_id)
        |SELECT user_id, length(journey) AS n_events,
        | len(regexp_extract_all(journey, 'vc*p')) AS n_conversions
        |FROM j ORDER BY user_id""".stripMargin
  )
}
