package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph analytics over edge DataFrames.
  *
  * The reference's data model is keyed event streams
  * (/root/reference/types.go:10-26); the natural graph its users build
  * from them is the event-transition graph (who moves from state A to
  * state B). PageRank over that graph is the standard "which state is
  * central" measure.
  *
  * Scale shape: classic synchronous PageRank — each iteration is ONE
  * shuffle (contributions grouped by dst) joined back to the node list.
  * Edges and nodes are cached once and reused across iterations; the
  * rank vector is |nodes| rows, always the small side, so the
  * per-iteration join broadcasts it against the edge partition layout
  * rather than re-shuffling edges. The rank vector is
  * `localCheckpoint`ed each iteration: without it, iteration k's plan
  * contains every previous iteration's joins and the optimizer replans
  * (and a non-cached input would re-execute) the whole chain — the
  * classic iterative-DataFrame lineage blowup. Checkpointing makes each
  * iteration exactly one materialized job with a constant-size plan.
  */
object Graph {

  /** Synchronous weighted PageRank with damping `d`:
    * rank'(v) = (1-d)/N + d * Σ_{u→v} w(u,v)/out(u) * rank(u).
    *
    * `nodes` must contain every vertex (a dst-only or isolated vertex
    * still receives the teleport term). Dangling mass (nodes with no
    * out-edges) is dropped, matching the unrolled SQL oracle.
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               srcCol: String, dstCol: String, wCol: String,
               iters: Int, damping: Double): DataFrame = {
    val outw = edges.groupBy(srcCol).agg(sum(wCol).as("_tot"))
    val e = edges.join(outw, srcCol)
      .select(col(srcCol).as("src"), col(dstCol).as("dst"),
        (col(wCol) / col("_tot")).as("p"))
      .cache()
    val nodeList = nodes.select(col(nodes.columns.head).as("node")).cache()
    val n = nodeList.count().toDouble

    var ranks = nodeList.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contrib = e.join(ranks, e("src") === ranks("node"))
        .groupBy(col("dst")).agg(sum(col("p") * col("rank")).as("_m"))
      ranks = nodeList.join(contrib, nodeList("node") === contrib("dst"),
          "left")
        .select(col("node"),
          (lit((1.0 - damping) / n) +
            lit(damping) * coalesce(col("_m"), lit(0.0))).as("rank"))
        .localCheckpoint()
    }
    // the final ranks are materialized by the eager localCheckpoint, so
    // the iteration inputs can be released — without this, every call
    // in a long-lived session leaks two cached tables
    e.unpersist(blocking = false)
    nodeList.unpersist(blocking = false)
    ranks
  }

  /** Exact triangle counting via degree-ordered edge orientation (the
    * "forward" algorithm, Schank & Wagner 2005): canonicalize to
    * undirected distinct edges, orient every edge from its
    * lower-(degree, id) endpoint to the higher, generate wedges only
    * from each vertex's ORIENTED out-list, and close them against the
    * oriented edge set. Orientation bounds every out-list at O(√m)
    * regardless of how skewed the degree distribution is — the hub that
    * makes naive neighbor-pairing quadratic has tiny oriented
    * out-degree, so the wedge blow-up is Σ outdeg² = O(m^1.5), the best
    * exact bound known. Both joins are equi-joins on vertex keys —
    * plain co-partitioned shuffles, no cross product anywhere.
    *
    * Output: one row — n_edges, n_wedges (open+closed, from the degree
    * table), n_triangles, and the global clustering coefficient
    * 3·T/wedges.
    */
  def triangleCount(edges: DataFrame, srcCol: String,
      dstCol: String): DataFrame = {
    val und = edges
      .select(least(col(srcCol), col(dstCol)).as("a"),
        greatest(col(srcCol), col(dstCol)).as("b"))
      .filter(col("a") =!= col("b")).distinct().cache()
    val deg = und.select(col("a").as("v"))
      .unionAll(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
      .select(when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("w"), col("db").as("dw")))
        .otherwise(
          struct(col("b").as("u"), col("a").as("w"), col("da").as("dw")))
        .as("e"))
      .select(col("e.u").as("u"), col("e.w").as("w"), col("e.dw").as("dw"))
      .cache()
    val w1 = oriented.select(col("u"), col("w").as("x"), col("dw").as("dx"))
    val w2 = oriented.select(col("u"), col("w").as("y"), col("dw").as("dy"))
    // rank(x) < rank(y) matches the closing edge's orientation x→y;
    // spelled as flat comparisons — the struct(..) < struct(..) form
    // allocates a row per compare across the Σ d⁺² candidate stream
    val wedges = w1.join(w2, Seq("u"))
      .filter(col("dx") < col("dy") ||
        (col("dx") === col("dy") && col("x") < col("y")))
    val tri = wedges
      .join(oriented.select(col("u").as("x"), col("w").as("y")),
        Seq("x", "y"))
      .agg(count(lit(1)).as("n_triangles"))
    val nEdges = und.agg(count(lit(1)).as("n_edges"))
    val nWedges = deg.agg(
      sum(col("deg") * (col("deg") - 1) / 2).cast("long").as("n_wedges"))
    val out = nEdges.crossJoin(broadcast(nWedges)).crossJoin(broadcast(tri))
      .select(col("n_edges"), col("n_wedges"), col("n_triangles"),
        round(lit(3.0) * col("n_triangles") / col("n_wedges"), 4).as("gcc"))
      .localCheckpoint()
    und.unpersist(blocking = false)
    oriented.unpersist(blocking = false)
    out
  }

  /** Synchronous label propagation (Raghavan et al. 2007, made
    * deterministic): every vertex starts as its own label; each
    * iteration it adopts its neighbors' most frequent label, ties
    * broken by smallest label. A fixed iteration count (not
    * convergence) keeps the result reproducible — the classic
    * async/random-order LPA is not.
    *
    * Scale shape: one neighbor-label equi-join + one (vertex, label)
    * count + one per-vertex top-1 window per iteration, all keyed by
    * vertex — Spark executes the top-1 as a map-side-pruned
    * WindowGroupLimit, so nothing materializes the full frequency
    * table. `localCheckpoint` caps the iterative lineage exactly like
    * [[pageRank]].
    */
  def labelPropagation(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int): DataFrame = {
    val und = edges.select(col(srcCol).as("v"), col(dstCol).as("n"))
      .unionAll(edges.select(col(dstCol).as("v"), col(srcCol).as("n")))
      .distinct().cache()
    var labels = und.select(col("v").as("node")).distinct()
      .withColumn("lbl", col("node"))
    for (_ <- 1 to iters) {
      val freq = und
        .join(labels.withColumnRenamed("node", "n"), Seq("n"))
        .groupBy("v", "lbl").agg(count(lit(1)).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("v").orderBy(desc("c"), asc("lbl"))
      labels = freq.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("v").as("node"), col("lbl"))
        .localCheckpoint()
    }
    und.unpersist(blocking = false)
    labels
  }

  /** Frequent co-occurring item pairs (market-basket support counts):
    * for each basket (`keyCol`), the DISTINCT items it contains; pairs
    * (a < b) are counted across baskets and filtered to `minSupport`.
    *
    * Scale shape: the distinct() bounds each basket at the item-domain
    * size, so the self-join blow-up is |items|²/2 PER BASKET — linear in
    * baskets, never corpus². The join key is the basket id, the same
    * shuffle key both sides, so co-partitioning makes it a local
    * per-basket cross.
    */
  def frequentPairs(df: DataFrame, keyCol: String, itemCol: String,
                    minSupport: Long): DataFrame = {
    val ut = df.select(keyCol, itemCol).distinct()
    val a = ut.select(col(keyCol), col(itemCol).as("item_a"))
    val b = ut.select(col(keyCol), col(itemCol).as("item_b"))
    a.join(b, Seq(keyCol))
      .filter(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("support"))
      .filter(col("support") >= minSupport)
  }

  /** k-core peeling: `iters` synchronous rounds of "drop every vertex
    * whose (undirected, deduped) degree is < k", returning the surviving
    * vertices with their within-core degree. A fixed round count (not
    * convergence) keeps the operator deterministic and lets the DuckDB
    * oracle unroll the exact rounds as CTEs — enough rounds IS the
    * fixpoint (each round only removes; the vertex set is finite).
    *
    * Scale shape per round: one degree count + two vertex-keyed
    * semi-joins, all shuffled on the vertex key; `localCheckpoint` caps
    * the lineage like [[pageRank]]. Output: (node, degree). */
  def kCore(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int, iters: Int): DataFrame = {
    val base = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    var und = base.unionAll(base.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    for (_ <- 1 to iters) {
      val keep = und.groupBy("a").agg(count(lit(1)).as("_d"))
        .filter(col("_d") >= k).select("a")
      und = und
        .join(keep, Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("a", "b"), Seq("b"), "left_semi")
        .localCheckpoint()
    }
    und.groupBy(col("a").as("node"))
      .agg(count(lit(1)).as("degree"))
  }

  /** Single-source BFS hop distances, frontier-synchronous: round h
    * joins the previous frontier against the edge list and anti-joins
    * the already-visited set, so each vertex is emitted once with its
    * FIRST (minimal) hop. Fixed `maxHops` rounds — deterministic,
    * oracle-unrollable, and the per-round work is one vertex-keyed
    * equi-join + one anti-join on the visited set (never the
    * exponential path expansion a naive recursive formulation does).
    * Output: (node, hop), hop 0 = the source itself. */
  def bfsDistances(edges: DataFrame, srcCol: String, dstCol: String,
      source: Long, maxHops: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val base = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .filter(col("a") =!= col("b"))
    val und = base.unionAll(base.select(col("b").as("a"), col("a").as("b")))
      .distinct().localCheckpoint()
    var dist = Seq((source, 0)).toDF("node", "hop").localCheckpoint()
    var frontier = dist.select("node")
    var h = 1
    var exhausted = false
    while (h <= maxHops && !exhausted) {
      // only the frontier is checkpointed: `dist` is a union of already-
      // materialized pieces, so its lineage stays maxHops-bounded without
      // paying a re-materialization of the whole distance table per hop
      val next = frontier
        .join(und, frontier("node") === und("a"))
        .select(col("b").as("node")).distinct()
        .join(dist, Seq("node"), "left_anti")
        .withColumn("hop", lit(h))
        .localCheckpoint()
      dist = dist.unionAll(next)
      frontier = next.select("node")
      exhausted = next.isEmpty // materialized — a cheap scan, ends the walk
      h += 1
    }
    dist
  }
}
