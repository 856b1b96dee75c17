package graft

import java.nio.file.{Files, Paths}

/** Writes PLANS.md: the formatted physical plan of each headline query,
  * with the scale-relevant property it demonstrates. Run after plan-shape
  * changes: `sbt "runMain graft.PlanDump /root/testdata/sf0.001 PLANS.md"`.
  * The plans are the evidence for the 100 TB stance (README): pushdown +
  * pruning at the scan, partial aggregation, broadcast vs shuffle-hash vs
  * bucketed joins, zero-Exchange narrow passes on corpus-scale operators.
  */
object PlanDump {
  private val headline: Seq[(String, String)] = Seq(
    "q_filter_pred" ->
      "predicates + column pruning reach the parquet scan (PushedFilters, ReadSchema)",
    "q_agg_tpch_q1" ->
      "partial+final aggregation inside whole-stage codegen",
    "q_join_inner_groupby" ->
      "small dimension broadcasts; fact side never shuffles for the join",
    "q_join_shuffle_hash" ->
      "shuffle-hash join: no sort passes for a mid-size build side",
    "q_join_bucketed" ->
      "bucketed co-located join: ZERO Exchange on either side",
    "q_topk_pergroup" ->
      "per-group top-k is a heap (WindowGroupLimit), not a full sort",
    "q_join_asof" ->
      "as-of join as union+sort+running-last (merge shape), no inequality join",
    "q_decontaminate" ->
      "benchmark shingle set broadcasts; corpus never shuffled by shingle",
    "q_dedup_minhash" ->
      "one-pass native sketch kernel; banded LSH buckets, no all-pairs work",
    "q_zorder_layout" ->
      "Morton layout key: pure codegen projection, zero shuffle",
    "q_join_tpch_q5" ->
      "fact streams through broadcast probes, ASIA-pruned supplier FIRST (5× early cut); fact is never a build side",
    "q_sql_tpch_q6" ->
      "all three Q6 predicates pushed to the scan (row-group pruning on at 100 TB)",
    "q_skyline" ->
      "Pareto frontier = one sort + two windows, never the |n|² self-anti-join",
    "q_merge_upsert" ->
      "CDC merge: one merge-key shuffle for last-writer-wins, map-side-combined agg",
    "q_scd2" ->
      "SCD2 gaps-and-islands: double window + two groupBys share ONE user_id shuffle",
    "q_bloom_prune" ->
      "Bloom runtime filter: probe sits below the semi-join, pruned rows never reach it",
    "q_pagerank" ->
      "iterative PageRank: per-iteration localCheckpoint keeps the plan constant-size",
    "q_sql_tpch_q17" ->
      "correlated scalar AVG decorrelated: per-part aggregate joined back via broadcast",
    "q_join_interval_overlap" ->
      "interval×interval overlap: two-sided bucket explode meets on an equi-join; no product join, exactly-once pair emission",
    "q_triangle_count" ->
      "degree-oriented triangle closure: every join equi on vertex keys, wedge lists bounded O(√m)",
    "q_ddsketch" ->
      "DDSketch build is ONE map-side-combined pass; quantile extraction runs on the |groups|·|buckets| sketch",
    "q_global_rownum" ->
      "global row_number with NO single-partition exchange: range sort + checkpoint + offset-indexed narrow pass",
    "q_semdedup" ->
      "SemDeDup: kmeans-cluster blocking keys bound the pair join; corpus never all-pairs",
    "q_sim_lsh_persisted" ->
      "persisted LSH index: corpus signatures read Bucketed:true, ONLY the query batch exchanges on the join key",
    "q_kmeans" ->
      "k-means assignment: native CentroidArgmax codegen kernel, constant plan size in k·dim, zero corpus shuffle",
    "q_wav_decode" ->
      "real WAV codec pipeline: one narrow UDF decode pass, the only shuffle is the per-rate aggregate",
    "q_sprt" ->
      "sequential statistic WITHOUT the single-partition window: exact prefix counts via the two-phase globalCumSum, LLR recomputed per row",
    "q_power_users" ->
      "descending Pareto cumsum over the unbounded per-user table: distributed globalCumSum, zero Window nodes",
    "q_join_asof_exec" ->
      "custom physical operator: AsofMergeJoin exec fed by one Exchange+Sort per side, streaming merge with O(1) state",
    "q_dedup_substring" ->
      "sliding-window substring dedup: window text never shuffles (8-byte hash keys), map-side-combined first-occurrence election, span merge windows partitioned per document",
    "q_dedup_incremental" ->
      "persisted fingerprint index probed Bucketed:true: only the new batch exchanges on the fingerprint, index-side Exchange count is zero",
    "q_bm25_persisted" ->
      "persisted inverted index probe: posting scan bucket-pruned to the query terms (SelectedBucketsCount), corpus text never read",
    "q_fuzzy_link2" ->
      "full τ+1-segment PassJoin with ENTROPY-ADAPTIVE boundaries (r14): candidates from ONE equi-join on measured-selectivity segment keys, banded threshold-levenshtein verify INSIDE the join stage (codegen, before any pair exchange), distinct only on verified survivors — the candidate blow-up never shuffles and the naive cross join never appears (the short-string leg's BroadcastNestedLoopJoin sees an empty filtered side)",
    "q_hybrid_rrf" ->
      "sparse leg candidates come from the shingle inverted index (BroadcastHashJoin on the 8-byte shingle hash); its only cross join is the 10×21 broadcast j=0 filler — the document corpus is never cross-joined or array-shuffled (the dense leg keeps its contract-bounded broadcast-query brute-force pass)",
    "q_image_phash" ->
      "image near-dup: one narrow per-row decode+dHash pass (no corpus shuffle), banded equi-join on 16-bit signature chunks with the hot-bucket broadcast anti-join cap, hamming verify only on candidate pairs — never all-pairs",
    "q_audio_fp" ->
      "audio near-dup: same banded-hamming plan as q_image_phash over the PCM energy fingerprint — the fingerprint modalities (text SimHash, image dHash, audio energy, video keyframe) share one join engine",
    "q_video_phash" ->
      "video near-dup: keyframe dHash from the real AVI container walk, then the shared banded-hamming join — one narrow decode pass, candidates only, never all-pairs",
    "q_sim_ivfpq_refine" ->
      "end-to-end ANN serving: cell-bucketed inverted-file probe (corpus side Exchange-free), candidates carry ids only into the broadcast exact-refine join — one narrow corpus pass re-ranks k'=50 candidates per query to the final 5",
    "q_sim_ivfpq_serve" ->
      "steady-state ANN serving (r14): the SAME probe+refine plan as q_sim_ivfpq_refine but against the build-once persisted index — no training jobs in the query; the probe reads the code table Bucketed:true and only the 5-query batch exchanges",
    "q_fuzzy_link_serve" ->
      "persisted entity-resolution serving (r14): the dirty batch's exploded segment keys BROADCAST to the bucketed catalog scan (the catalog streams, zero catalog-side Exchange), verify inside the join, survivors distinct — no per-query sampling/analysis jobs",
    "q_crossmodal_dup" ->
      "cross-modal near-dup (r14): two independent narrow decode+fingerprint passes (BMP dHash, AVI keyframe dHash), banded cross-table equi-join with the combined-population bucket cap, hamming verify on candidates only — modalities meet in ONE join, never all-pairs",
    "q_crossmodal_frames" ->
      "multi-frame cross-modal near-dup (r15): ONE container walk per video yields a dHash per frame (narrow posexplode — the corpus never shuffles to be fingerprinted), then the same banded cross-table join as q_crossmodal_dup over (media, frame) struct ids — reuse at any frame offset, still candidates-only",
    "q_dedup_tombstone" ->
      "persisted-index retraction (r15; generation-stamped r16): the probe filters through a BROADCAST (key → latest delete seq) join between the bucketed index scan and the batch anti-join — the index keeps its zero-Exchange probe shape (Bucketed:true, only the batch shuffles) and is never rewritten per delete OR per re-insert",
    "q_fuzzy_link_tombstone" ->
      "catalog retraction (r16): q_fuzzy_link_serve's probe plan with the live-view generation filter spliced in as a broadcast join on c_id — the bucketed catalog segment scan still streams with zero catalog-side Exchange; withdrawing a record costs one appended tombstone row, never a catalog rewrite",
    "q_bm25_tombstone" ->
      "posting-index retraction (r16): the probe keeps its bucket-pruned posting scan (SelectedBucketsCount on the query terms) with the tombstone generation filter as a broadcast join on doc_id; the retracted docs' stats leave as ONE negative additive row, so N/avgdl re-derive exactly without touching the posting table")

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val spark = Sessions.builder("local[4]", 4).appName("graft-plans")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sb.append("# PLANS — headline physical plans (generated by graft.PlanDump)\n\n")
    sb.append(s"Input: `$sfDir`. Each section states the scale property the\n")
    sb.append("plan demonstrates, then the `explain(\"formatted\")` output.\n")
    headline.foreach { case (name, why) =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.collect() // AQE: finalize join strategies before printing
      // plan_ids are per-session counters — mask them so regeneration
      // diffs only on real plan-shape changes
      val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        .replaceAll("""plan_id=\d+""", "plan_id=*")
      sb.append(s"\n## $name\n\n$why\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(outPath), sb.toString)
    spark.stop()
    println(s"[plandump] wrote $outPath")
  }
}
