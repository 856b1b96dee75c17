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
}
