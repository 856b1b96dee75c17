package graft

import org.apache.spark.sql.functions._
import graft.ops.Graph

/** Semantics pins for [[graft.ops.Graph]] that the single-dataset oracle
  * hash can't express: conservation of rank mass, convergence toward the
  * known stationary distribution, and basket-support ground truth.
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: mass conserved and uniform on a symmetric cycle") {
    // a → b → c → a: stationary distribution is exactly uniform
    val edges = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "a", 1.0))
      .toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val r = Graph.pageRank(nodes, edges, "src", "dst", "w", 10, 0.85)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    r.values.foreach(v => assert(math.abs(v - 1.0 / 3) < 1e-9))
  }

  test("pageRank: sink-heavy star ranks the hub highest") {
    // spokes all point at hub; hub returns to one spoke. Hub must
    // dominate; total mass stays 1 (no dangling nodes here).
    val edges = Seq(("s1", "hub", 1.0), ("s2", "hub", 1.0),
      ("s3", "hub", 1.0), ("hub", "s1", 1.0)).toDF("src", "dst", "w")
    val nodes = Seq("hub", "s1", "s2", "s3").toDF("node")
    val r = Graph.pageRank(nodes, edges, "src", "dst", "w", 20, 0.85)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(math.abs(r.values.sum - 1.0) < 1e-9)
    assert(r("hub") > r("s1") && r("s1") > r("s2"))
    assert(math.abs(r("s2") - r("s3")) < 1e-12) // symmetric spokes tie
  }

  test("pageRank: weighted edges shift mass proportionally") {
    // a splits 3:1 between b and c; b,c return to a. b gets more.
    val edges = Seq(("a", "b", 3.0), ("a", "c", 1.0),
      ("b", "a", 1.0), ("c", "a", 1.0)).toDF("src", "dst", "w")
    val nodes = Seq("a", "b", "c").toDF("node")
    val r = Graph.pageRank(nodes, edges, "src", "dst", "w", 30, 0.85)
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r("b") > r("c"))
    // at the fixpoint b ≈ teleport + 0.85·(3/4)·a, c ≈ teleport + 0.85·(1/4)·a
    val ratio = (r("b") - 0.05) / (r("c") - 0.05)
    assert(math.abs(ratio - 3.0) < 1e-6)
  }

  test("frequentPairs: exact supports on a known basket set") {
    val df = Seq(
      (1, "x"), (1, "y"), (1, "z"), (1, "x"), // dup x collapses
      (2, "x"), (2, "y"),
      (3, "x"), (3, "z")).toDF("basket", "item")
    val got = Graph.frequentPairs(df, "basket", "item", 1L)
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got == Map(("x", "y") -> 2L, ("x", "z") -> 2L, ("y", "z") -> 1L))
    // minSupport filters
    val hi = Graph.frequentPairs(df, "basket", "item", 2L)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(hi == Set(("x", "y"), ("x", "z")))
  }

  test("bloom pre-filter never loses a true match (q_bloom_prune invariant)") {
    val ok = Tables.orders(spark, sf)
      .filter(col("o_totalprice") > 300000).select("o_orderkey")
    val bf = ok.stat.bloomFilter("o_orderkey", math.max(1000L, ok.count()), 0.01)
    val bfB = spark.sparkContext.broadcast(bf)
    val mc = udf((k: Long) => bfB.value.mightContain(k))
    val li = Tables.lineitem(spark, sf)
    val pruned = li.filter(mc(col("l_orderkey")))
    val exact = li.join(ok, col("l_orderkey") === col("o_orderkey"),
      "left_semi")
    // no false negatives: every exact-match row survives the Bloom probe
    assert(exact.count() ==
      exact.filter(mc(col("l_orderkey"))).count())
    // and the probe actually prunes (selective predicate, fpp 1%)
    assert(pruned.count() < li.count())
  }

  test("triangleCount: K4 plus a pendant edge, any input orientation") {
    // K4 has C(4,3)=4 triangles, 6 edges; pendant adds an edge, no
    // triangle. Mixed/duplicate/reversed input edges must canonicalize.
    val edges = Seq((1, 2), (2, 1), (1, 3), (1, 4), (2, 3), (4, 2),
      (3, 4), (4, 5), (4, 5)).toDF("s", "t")
    val r = Graph.triangleCount(edges, "s", "t").first()
    assert(r.getLong(0) == 7L, s"edges: $r")     // 6 + pendant
    assert(r.getLong(2) == 4L, s"triangles: $r")
    // wedges: degs are 3,3,3,4,1 → 3+3+3+6+0 = 15
    assert(r.getLong(1) == 15L, s"wedges: $r")
    assert(math.abs(r.getDouble(3) - 3.0 * 4 / 15) < 1e-4)
  }

  test("labelPropagation: two cliques with one bridge separate") {
    // cliques {1,2,3} and {10,11,12} bridged by 3-10: each clique's
    // majority vote keeps its own min label; the bridge can't flip it
    val clique = Seq((1, 2), (1, 3), (2, 3), (10, 11), (10, 12),
      (11, 12), (3, 10)).toDF("s", "t")
    val lbls = Graph.labelPropagation(clique, "s", "t", iters = 4)
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    // the label VALUES depend on how ties drag ids across the bridge;
    // the invariant is the partition: each clique uniform, cliques apart
    assert(Set(1, 2, 3).map(lbls).size == 1,
      s"left clique must be one community: $lbls")
    assert(Set(10, 11, 12).map(lbls).size == 1,
      s"right clique must be one community: $lbls")
    assert(lbls(1) != lbls(10), s"cliques must separate: $lbls")
  }

  test("kCore: K4 with pendant chain — 3-core is exactly the K4, cascading removal") {
    import spark.implicits._
    // K4 on {1,2,3,4}; chain 4-5-6: removing 6 (deg 1) drops 5 to deg 1,
    // so round 2 must remove 5 too — the cascade a single pass misses
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("s", "t")
    val core = Graph.kCore(edges, "s", "t", k = 3, iters = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(core.keySet == Set(1L, 2L, 3L, 4L), s"3-core must be the K4: $core")
    assert(core.values.forall(_ == 3L), s"within-core degrees: $core")
    // k larger than any degree → empty core
    assert(Graph.kCore(edges, "s", "t", k = 5, iters = 3).isEmpty)
    // one round is NOT enough for the cascade (5 survives round 1)
    val oneRound = Graph.kCore(edges, "s", "t", k = 2, iters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound.contains(5L) && !oneRound.contains(6L),
      s"round 1 removes only degree<2 leaves: $oneRound")
  }

  test("bfsDistances: minimal hops on a graph with a shortcut; unreachable absent") {
    import spark.implicits._
    // 1-2-3-4 path plus shortcut 1-4: node 4 must be hop 1, not 3;
    // island {9,10} unreachable from 1
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (9L, 10L))
      .toDF("s", "t")
    val d = Graph.bfsDistances(edges, "s", "t", source = 1L, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d == Map(1L -> 0, 2L -> 1, 4L -> 1, 3L -> 2),
      s"shortest hops with shortcut: $d")
    // hop cap truncates: from 1 with maxHops=1 only direct neighbors
    val d1 = Graph.bfsDistances(edges, "s", "t", source = 1L, maxHops = 1)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(d1 == Map(1L -> 0, 2L -> 1, 4L -> 1), s"capped: $d1")
  }
}
