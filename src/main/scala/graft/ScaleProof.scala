package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec

/** Scale-sensitivity proof harness (r11): runs the heavy operator family
  * at every scale dir given on the command line (default the three
  * driver SFs + /tmp/sf1 from tools/gen_sf1.py), reporting min-of-2
  * seconds per (query, sf) and the FINAL (post-AQE) physical plan
  * signature — the sequence of operator node names with exprIds, stats,
  * and codegen stage ids stripped. A signature that changes between SFs
  * is exactly the regression the 100 TB claims need to rule out (e.g. a
  * broadcast join silently flipping to sort-merge once a side outgrows
  * the threshold); the harness prints PLAN_OK/PLAN_DIFF per query
  * against the smallest SF's signature and exits nonzero on any diff
  * among the pinned set.
  *
  * Usage: sbt "runMain graft.ScaleProof [dir ...]"
  */
object ScaleProof {
  // timed at every SF; the first five are the plan-pinned heavy set
  val pinned: Seq[String] = Seq(
    "q_dedup_minhash", "q_sim_lsh_persisted", "q_join_asof_exec",
    "q_triangle_count", "q_label_prop", "q_dedup_substring",
    "q_bm25_persisted",
    // r12-reworked plans: inverted-index sparse leg / native CDC kernel
    "q_hybrid_rrf", "q_dedup_cdc",
    // r14: entropy-adaptive PassJoin (the r13 `weak` grade) — the
    // catalog-growth axis needs gen_sf1.py's replicated customer table
    "q_fuzzy_link2",
    // r14: multimodal near-dup at corpora that scale with documents
    // (5k payloads at sf0.1 → 50k at sf1) — the banded-Hamming engine's
    // scale evidence on the image and audio paths, not just text
    "q_image_phash", "q_audio_fp",
    // r14 late additions: cross-modal near-dup and the persisted
    // entity-resolution catalog probe
    "q_crossmodal_dup", "q_fuzzy_link_serve",
    // r15: multi-frame cross-modal (~6 signatures per video — the
    // heaviest multimodal axis) and the tombstone-aware index probe
    "q_crossmodal_frames", "q_dedup_tombstone",
    // r16: the tombstone lifecycle on the edit-distance catalog and the
    // BM25 posting index (build+append+delete+probe composites; the
    // live-view generation filter must not cost the probes their
    // bucket-pruned / zero-catalog-Exchange shapes at any SF)
    "q_fuzzy_link_tombstone", "q_bm25_tombstone")
  val timedOnly: Seq[String] = Seq("q_bpe_train")

  /** Queries whose equi-join STRATEGY is intentionally scale-adaptive:
    * q_dedup_substring's first-occurrence election table (`firsts`)
    * grows with the corpus's duplication mass, so AQE correctly
    * broadcasts it at small SFs and flips to sort-merge once it
    * outgrows the threshold (observed at the r13 sf10 point) — at
    * 100 TB the broadcast would OOM, so the flip IS the desired plan.
    * For these queries the signature normalizes join-strategy nodes
    * (BroadcastHashJoin/SortMergeJoin/ShuffledHashJoin → EquiJoin) and
    * drops their Exchange/Sort/BroadcastExchange artifacts, pinning the
    * logical shape while leaving the strategy to the optimizer.
    * q_dedup_minhash's verify stage rejoins the (id, sig) table onto the
    * candidate pairs — both grow with the corpus, so the same broadcast
    * → sort-merge adaptation fires at sf10 (three joins flip).
    * q_fuzzy_link2's final report join (dirty ⋈ per-record link counts)
    * flips the same way: `per` is dirty-sized, so broadcasting it is
    * only correct while the dirty side is small (r14 — the candidate
    * join itself is repartition-pinned SMJ at every scale);
    * q_fuzzy_link_serve shares that report tail AND its probe join's
    * build side (the dirty batch's exploded keys) grows with the batch,
    * so both its joins adapt identically. The Hamming near-dup family
    * (q_image_phash / q_audio_fp / q_crossmodal_dup) adapts exactly like
    * q_dedup_minhash: the banded candidate join and both sig-verify
    * rejoins are corpus-sized, so their broadcasts correctly flip to
    * sort-merge at the sf10 corpus (500k signatures). */
  val strategyAdaptive: Set[String] =
    Set("q_dedup_substring", "q_dedup_minhash", "q_fuzzy_link2",
      "q_fuzzy_link_serve", "q_image_phash", "q_audio_fp",
      "q_crossmodal_dup", "q_crossmodal_frames",
      // the probe's within-batch winner election semi-join: `winners` is
      // novel-delta-sized (grows with the corpus), so its broadcast
      // correctly flips to SMJ at the sf10 batch — the q_dedup_minhash
      // adaptation; the index side's zero-Exchange pin is unaffected
      "q_dedup_tombstone",
      // shares q_fuzzy_link_serve's report tail and probe joins (both
      // scale with the dirty batch), so it adapts identically
      "q_fuzzy_link_tombstone")

  /** Final physical plan as a normalized operator-sequence signature.
    * With `joinStrategyFree`, equi-join strategy nodes collapse to
    * "EquiJoin" and their OWN Sort/Exchange/BroadcastExchange artifacts
    * (the contiguous artifact chain hanging off a join, through runtime
    * wrappers) are dropped — but a Sort/Exchange elsewhere in the plan
    * (a window sort, an aggregate shuffle) still diffs, so the pin keeps
    * catching unrelated shuffle regressions. */
  def signature(df: DataFrame, joinStrategyFree: Boolean = false): String = {
    def finalPlan(p: SparkPlan): SparkPlan = p match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case other => other
    }
    val joinNodes = Set("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin")
    val strategyArtifacts = Set("Sort", "Exchange", "BroadcastExchange")
    val runtimeArtifacts = Set("ReusedExchange", "InputAdapter", "AQEShuffleRead")
    // (name, wasUnderJoinArtifactChain) per node, preorder
    def walk(p: SparkPlan, underJoin: Boolean): Seq[(String, Boolean)] = {
      val here = finalPlan(p)
      val name = here.nodeName
        .replaceAll("\\(\\d+\\)", "") // WholeStageCodegen (3) → stable
        // scans of per-(session, dir) persisted index tables carry the
        // table identifier in the node name — the PLAN SHAPE is what the
        // pin protects, not the table identity (r14: q_fuzzy_link_serve's
        // per-dir index names diffed otherwise)
        .replaceAll("Scan parquet \\S+", "Scan parquet")
      val transparent = runtimeArtifacts.contains(name) ||
        name.startsWith("WholeStageCodegen") || name.endsWith("QueryStage")
      val childUnder =
        if (joinNodes.contains(name)) true
        else if (transparent) underJoin
        else underJoin && strategyArtifacts.contains(name)
      (name, underJoin) +: here.children.flatMap(c => walk(c, childUnder))
    }
    val nodes = walk(df.queryExecution.executedPlan, underJoin = false)
      .filterNot { case (n, _) => runtimeArtifacts.contains(n) }
    val normalized = if (joinStrategyFree)
      nodes.flatMap { case (n, under) =>
        if (joinNodes.contains(n)) Some("EquiJoin")
        else if (under && strategyArtifacts.contains(n)) None
        else Some(n)
      }
    else nodes.map(_._1)
    normalized.mkString(">")
  }

  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1", "/tmp/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = Sessions.builder(s"local[$cpus]", cpus.toInt)
      .appName("graft-scaleproof").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val sigs = collection.mutable.Map[String, String]() // query → first-SF sig
    var planDiffs = 0
    // SPARK_GRAFT_SCALE_ONLY=q_a,q_b restricts the set (the r13 sf10
    // points time only the four steepest curves); SPARK_GRAFT_SCALE_REPS
    // and SPARK_GRAFT_SCALE_NOWARM=1 bound wall-clock at the big SFs
    // (the query is already JIT-warm from the smaller dirs in the run).
    val only = sys.env.get("SPARK_GRAFT_SCALE_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val nReps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "2").toInt
    val noWarm = sys.env.get("SPARK_GRAFT_SCALE_NOWARM").contains("1")
    for (name <- (pinned ++ timedOnly).filter(n => only.forall(_.contains(n)))) {
      val fn = SparkEntry.queries(name)
      val times = dirs.map { d =>
        def rep(): Double = {
          val t0 = System.nanoTime()
          fn(spark, d).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        if (!noWarm) rep() // warmup (JIT + page cache at this SF)
        val t = (1 to nReps).map(_ => rep()).min
        if (pinned.contains(name)) {
          // execute the SAME QueryExecution so AQE finalizes in place,
          // then read the final plan's signature off it
          val dfSig = fn(spark, d)
          dfSig.foreach(_ => ())
          val sig = signature(dfSig,
            joinStrategyFree = strategyAdaptive.contains(name))
          sigs.get(name) match {
            case None => sigs(name) = sig
            case Some(base) if base == sig =>
              System.err.println(s"[scaleproof] PLAN_OK $name at $d")
            case Some(base) =>
              planDiffs += 1
              System.err.println(s"[scaleproof] PLAN_DIFF $name at $d\n  base: $base\n  here: $sig")
          }
        }
        f"$t%.2f"
      }
      println(s"""SCALE $name ${dirs.zip(times).map { case (d, t) => s"${d.split('/').last}=$t" }.mkString(" ")}""")
    }
    println(s"SCALE plan_diffs=$planDiffs")
    spark.stop()
    if (planDiffs > 0) sys.exit(1)
  }
}
