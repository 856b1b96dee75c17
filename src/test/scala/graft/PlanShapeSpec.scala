package graft

/** Pins the physical-plan properties the engine's scale story depends on
  * (SURVEY §4): predicate pushdown + column pruning at the scan, broadcast
  * joins for small dims, heap-based per-group top-k (WindowGroupLimit),
  * TakeOrderedAndProject for global top-k, partial aggregation, native
  * codegen kernels in the similarity path. A regression here usually
  * means an operator silently fell off the optimized path, which small-SF
  * correctness tests would never notice.
  */
class PlanShapeSpec extends SparkSpec {

  private def plan(q: String): String =
    SparkEntry.queries(q)(spark, sf).queryExecution.executedPlan.toString

  test("q_filter_pred: predicates reach the parquet scan, columns pruned") {
    val p = plan("q_filter_pred")
    assert(p.contains("PushedFilters: [IsNotNull"), p)
    assert(!p.contains("l_comment"), "unused columns must be pruned")
  }

  test("q_join_inner_groupby: small dimension broadcasts") {
    assert(plan("q_join_inner_groupby").contains("BroadcastHashJoin"))
  }

  test("q_topk_pergroup: heap-based WindowGroupLimit prunes before sort") {
    assert(plan("q_topk_pergroup").contains("WindowGroupLimit"))
  }

  test("q_sort_limit: global top-k is TakeOrderedAndProject, not full sort") {
    assert(plan("q_sort_limit").contains("TakeOrderedAndProject"))
  }

  test("q_agg_tpch_q1: partial+final aggregation inside codegen") {
    val df = SparkEntry.queries("q_agg_tpch_q1")(spark, sf)
    assert(plan("q_agg_tpch_q1").contains("partial_sum"), "map-side combine expected")
    df.collect() // AQE: codegen stage markers appear in the final plan
    val finalPlan = df.queryExecution.executedPlan.toString
    assert(finalPlan.contains("isFinalPlan=true"))
    assert(finalPlan.contains("*("), "agg must stay in whole-stage codegen")
  }

  test("similarity path uses the native kernels, not HOF fallback") {
    val p = plan("q_sim_cosine_topk")
    assert(p.contains("graft_cosine"), p.linesIterator.take(8).mkString("\n"))
    val p2 = plan("q_sim_lsh")
    assert(p2.contains("graft_hyperplane_sig"))
  }

  test("q_dedup_minhash: staged sketch kernel, no minhash aggregation shuffle") {
    // the sketch (shh + sig) must come from the one-pass kernel on the
    // checkpointed staged table — if the explode/64-min-aggregate shape
    // reappears, partial_min markers and its Exchange reappear with it
    val p = plan("q_dedup_minhash")
    assert(p.contains("graft_shingle_sketch") || p.contains("Scan ExistingRDD"),
      "staged kernel table expected in the plan")
    assert(!p.contains("partial_min"), "minhash mins must not be an aggregate")
    // hot-bucket cap stays a broadcast anti-join, not a window count
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(500))
  }

  test("q_decontaminate: benchmark side broadcasts, corpus never shuffles by shingle") {
    val df = SparkEntry.queries("q_decontaminate")(spark, sf)
    df.collect() // AQE finalizes join strategies
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "benchmark shingle set must broadcast:\n" + p.take(500))
  }

  test("q_join_asof: merge-join shape — one sort per key partition, no inequality join") {
    val p = plan("q_join_asof")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "as-of join must not plan an inequality/cross join:\n" + p.take(500))
    assert(p.contains("RunningWindowFunction") || p.contains("Window"),
      "running last-value carry expected")
  }

  test("q_join_range: bucketed equi-join, never a cartesian/inequality join") {
    val p = plan("q_join_range")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "range join must stay an equi-join on (key, bucket):\n" + p.take(500))
  }

  test("q_fingerprint_winnow: single winnow kernel call, no Generate barrier") {
    val p = plan("q_fingerprint_winnow")
    assert(p.contains("graft_winnow"), "native winnow kernel expected")
  }

  test("decontaminateStream: pure per-row filter — zero Exchange on the corpus") {
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(org.apache.spark.sql.functions.col("doc_id") % 97 === 0)
    val p = graft.ops.Curation.decontaminateStream(docs, "text", bench, "text")
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"),
      "streaming decontamination must stay narrow:\n" + p.take(500))
  }

  test("quantizeInt8 + dequantize: narrow projections, no shuffle, no Generate") {
    val p = graft.ops.Similarity.dequantizeInt8(
        graft.ops.Similarity.quantizeInt8(Tables.embeddings(spark, sf), "embedding"))
      .queryExecution.executedPlan.toString
    assert(!p.contains("Exchange") && !p.contains("Generate"),
      "quantization must stay a per-row projection:\n" + p.take(500))
  }

  test("kmeans assignment: broadcast-literal argmax, zero Exchange on the corpus side") {
    val out = graft.ops.Similarity.kmeans(
      Tables.embeddings(spark, sf), "vec_id", "embedding", k = 4, iters = 1)
    val p = out.queryExecution.executedPlan.toString
    // the returned assignment plan is a pure projection over the scan —
    // no join against a centroid table, no shuffle of the corpus
    assert(!p.contains("Exchange") && !p.contains("Join"),
      "kmeans assignment must stay narrow:\n" + p.take(600))
  }

  test("q_join_shuffle_hash: hint plans a ShuffledHashJoin (no sort passes)") {
    val df = SparkEntry.queries("q_join_shuffle_hash")(spark, sf)
    df.collect() // AQE finalizes join strategy
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"),
      "shuffle_hash hint must be honored:\n" + p.take(600))
  }

  test("diversitySample: per-cluster quota runs as heap-based WindowGroupLimit") {
    val p = graft.ops.Similarity.diversitySample(
        Tables.embeddings(spark, sf), "vec_id", "embedding",
        k = 4, perCluster = 5, iters = 1)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"),
      "quota filter must prune before the sort:\n" + p.take(600))
  }

  test("q_join_nullsafe: <=> plans as a hash join, never a nested loop") {
    val df = SparkEntry.queries("q_join_nullsafe")(spark, sf)
    df.collect() // AQE finalizes join strategy
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "null-safe equality must hash-join (coalesced keys):\n" + p.take(600))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p.take(600))
  }

  test("q_subquery_exists: decorrelated to semi+anti joins, no nested loop") {
    val p = plan("q_subquery_exists")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      "correlated EXISTS must decorrelate, not re-execute per row:\n" + p.take(500))
    assert(p.contains("LeftSemi"), p.take(500))
    assert(p.contains("LeftAnti"), p.take(500))
  }

  test("q_outlier_zscore: tiny stats side broadcasts; fact table is not sort-merge joined") {
    val df = SparkEntry.queries("q_outlier_zscore")(spark, sf)
    df.collect() // AQE finalizes join strategy
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "per-group stats must broadcast back over the fact table:\n" + p.take(500))
    assert(!p.contains("SortMergeJoin"), p.take(500))
  }

  test("q_zorder_layout: Z-value is a pure projection — zero shuffle, stays in codegen") {
    val p = plan("q_zorder_layout")
    assert(!p.contains("Exchange") && !p.contains("Generate"),
      "Morton key must be a narrow per-row computation:\n" + p.take(500))
    assert(p.contains("*("), "bit arithmetic must stay in whole-stage codegen")
  }

  test("q_gap_fill: the only full-data pass is a map-side-combined aggregate") {
    val p = plan("q_gap_fill")
    assert(p.contains("partial_count"),
      "hourly histogram must partial-aggregate before the shuffle:\n" + p.take(600))
  }

  test("q_sql_tpch_q6: all three predicates pushed to the parquet scan") {
    val p = plan("q_sql_tpch_q6")
    // shipdate range, discount band, quantity cap must ALL appear as
    // pushed filters — Q6 is IO-bound at scale and unpushed predicates
    // turn row-group pruning off
    assert(p.contains("PushedFilters:"), p.take(600))
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    for (c <- Seq("l_shipdate", "l_discount", "l_quantity"))
      assert(pushed.contains(c), s"$c must be pushed:\n$pushed")
  }

  test("q_skyline: two-phase frontier — distributed local pass, no quadratic join") {
    val p = plan("q_skyline")
    assert(p.contains("Window"), p.take(400))
    // phase 1 must be partitioned by spark_partition_id (distributed),
    // so the only unpartitioned window runs on frontier-sized input
    assert(p.contains("SPARK_PARTITION_ID") || p.contains("_pid"),
      "local-frontier phase must partition by spark_partition_id:\n" + p.take(800))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "skyline must not fall back to the |n|² self-join:\n" + p.take(600))
  }

  test("q_merge_upsert: last-writer-wins is one merge-key shuffle") {
    val p = plan("q_merge_upsert")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    // one Exchange for the per-key window; the groupBy on o_orderstatus
    // rides AQE (tiny), anything beyond 2 means the union re-shuffled
    assert(exchanges <= 2,
      s"merge must shuffle on the key once (+1 tiny agg), saw $exchanges:\n" + p.take(800))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "final agg must map-side combine:\n" + p.take(600))
  }

  test("centroids: exactly the (label,pos)-keyed + label-keyed shuffles, partial avg") {
    val df = graft.ops.Similarity.centroids(
      Tables.embeddings(spark, sf), "embedding", "label")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("partial_avg") || p.contains("partial_average"),
      "map-side partial averages expected:\n" + p.take(800))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 2,
      s"centroids must shuffle at most twice ((label,pos) then label), saw $exchanges:\n" + p.take(800))
  }

  test("q_hard_negatives: query side broadcasts, corpus never shuffles for the join; heap top-k") {
    val p = plan("q_hard_negatives")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "query set must broadcast:\n" + p.take(500))
    assert(p.contains("WindowGroupLimit"),
      "per-query top-k must be a heap, not a full sort:\n" + p.take(500))
    assert(p.contains("graft_cosine"), "scoring must use the codegen kernel")
  }

  test("balanceClasses: quota filter is a map-side-pruned WindowGroupLimit, one label shuffle") {
    val df = graft.ops.Curation.balanceClasses(
      Tables.embeddings(spark, sf), "label", "vec_id")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"), p.take(600))
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(exchanges <= 1,
      s"one label-keyed shuffle expected, saw $exchanges:\n" + p.take(600))
  }

  test("curriculumStages: the assignment pass is narrow (no shuffle after the cuts agg)") {
    val scored = Tables.embeddings(spark, sf)
      .withColumn("score", org.apache.spark.sql.functions.col("vec_id").cast("double"))
    val df = graft.ops.Curation.curriculumStages(scored, "score", nStages = 4)
    val p = df.queryExecution.executedPlan.toString
    // stage assignment = scan + project(threshold comparisons); any
    // Exchange here means the quantile cut leaked into the per-row pass
    assert(!p.contains("Exchange"),
      "assignment must be a narrow projection:\n" + p.take(600))
  }

  test("window→groupBy chains on the same key plan exactly one shuffle") {
    // q_scd2 (double window + 2 groupBys), q_time_weighted_avg
    // (window + groupBy), q_sequence_match (collect_list groupBy): all
    // keyed on user_id throughout — a second hashpartitioning Exchange
    // means Catalyst stopped reusing the partitioning across stages
    for (q <- Seq("q_scd2", "q_time_weighted_avg", "q_sequence_match")) {
      val p = plan(q)
      val n = "Exchange hashpartitioning".r.findAllIn(p).length
      assert(n == 1, s"$q: expected 1 user_id shuffle, saw $n:\n" + p.take(600))
    }
  }

  test("q_sql_tpch_q17: correlated AVG decorrelates to broadcast joins") {
    val p = plan("q_sql_tpch_q17")
    assert(!p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("BroadcastHashJoin"),
      "per-part avg must join back, not re-execute per row:\n" + p.take(600))
  }

  test("q_bloom_prune: Bloom probe filters the scan side before the semi-join") {
    val p = plan("q_bloom_prune")
    assert(p.contains("LeftSemi"), p.take(600))
    // the UDF probe must sit under the join (scan-side Filter), so the
    // pruned rows never reach the join operator
    val joinIdx = p.indexOf("BroadcastHashJoin")
    val udfIdx = p.indexOf("UDF(knownnotnull(l_orderkey")
    assert(joinIdx >= 0 && udfIdx > joinIdx,
      "Bloom probe expected below the semi-join:\n" + p.take(800))
  }

  test("q_join_interval_overlap: bucket decomposition stays an equi-join") {
    val p = plan("q_join_interval_overlap")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      "interval overlap must never fall back to a product join:\n" +
        p.take(800))
  }

  test("labelPropagation iteration: per-vertex top-1 is a WindowGroupLimit") {
    // the registry query's plan is cut by the per-iteration checkpoint,
    // so pin the iteration's own shape: neighbor-label count + top-1
    // election must plan as a heap (WindowGroupLimit), not a full sort
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val und = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L)).toDF("v", "n")
    val labels = und.select(col("v").as("node")).distinct()
      .withColumn("lbl", col("node"))
    val freq = und.join(labels.withColumnRenamed("node", "n"), Seq("n"))
      .groupBy("v", "lbl").agg(count(lit(1)).as("c"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("v").orderBy(desc("c"), asc("lbl"))
    val iter = freq.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    assert(iter.queryExecution.executedPlan.toString
      .contains("WindowGroupLimit"))
  }

  test("q_triangle_count: wedge generation and closure are equi-joins") {
    val p = plan("q_triangle_count")
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(800))
  }

  test("sequential statistics avoid the single-partition window (ks/mwu/sprt)") {
    // these scan UNBOUNDED inputs (value domain / observation stream) —
    // a global Window.orderBy here would serialize the whole dataset
    // onto one task at 100 TB. After the globalCumSum rework the plans
    // must carry NO Window node at all (the only SinglePartition
    // exchange left is the constant-size final aggregate after a
    // map-side partial, which is fine)
    for (q <- Seq("q_ks_test", "q_mannwhitney", "q_sprt")) {
      val p = plan(q)
      assert(!p.contains("Window"),
        s"$q must not use an unpartitioned window:\n" + p.take(800))
      assert(p.contains("partial_"),
        s"$q final agg must map-side combine:\n" + p.take(800))
    }
  }

  test("q_power_users: descending Pareto cumsum has no Window; q_zipf ranks after the heap") {
    val p = plan("q_power_users")
    assert(!p.contains("Window"),
      "per-user cumulative share must use the distributed cumsum:\n" + p.take(800))
    val z = plan("q_zipf")
    assert(z.contains("TakeOrderedAndProject"),
      "top-1000 must be a distributed heap before ranking:\n" + z.take(800))
  }

  test("q_global_rownum: no single-partition exchange anywhere") {
    val p = plan("q_global_rownum")
    assert(!p.contains("Exchange SinglePartition"),
      "global numbering must not serialize onto one partition:\n" +
        p.take(800))
    assert(p.contains("Scan ExistingRDD") || p.contains("ExistingRDD"),
      "expected the checkpointed range-sorted input")
  }

  test("events: ts range filter reaches PushedFilters through the NTZ normalization") {
    import org.apache.spark.sql.functions._
    val df = Tables.events(spark, sf)
      .filter(col("ts") >= lit("1997-06-01 00:00:00").cast("timestamp"))
      .select("event_id", "ts")
    val p = df.queryExecution.executedPlan.toString
    val pushed = p.linesIterator.filter(_.contains("PushedFilters:")).mkString
    assert(pushed.contains("GreaterThanOrEqual(ts"),
      "ts range predicate must prune parquet row groups at the scan:\n" +
        p.take(800))
    // and the normalized values must equal the cast-based reading
    val viaCast = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_id", "cast(ts as timestamp) AS ts")
    assert(Tables.events(spark, sf).select("event_id", "ts")
      .exceptAll(viaCast).isEmpty)
  }

  test("pageRank: per-iteration checkpoint keeps the final plan constant-size") {
    val p = plan("q_pagerank")
    // without localCheckpoint the 6th iteration's plan contains all
    // previous iterations (≈50 exchanges); with it, only the last
    // iteration's join + final ordering remain
    val n = "Exchange hashpartitioning".r.findAllIn(p).length
    assert(n <= 6, s"lineage blowup: $n exchanges:\n" + p.take(600))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      "checkpointed rank vector expected as the iteration input")
  }
}
