package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact 2-D Pareto skyline (dominance frontier): keep every row for
  * which no other row is at-least-as-good on both axes and strictly
  * better on one (here: minimize `xCol`, maximize `yCol`).
  *
  * Scale shape — two-phase distributed skyline (the standard trick,
  * e.g. Börzsönyi et al., ICDE'01 §partitioned variants): a point
  * dominated within any subset is dominated globally, so
  *   1. each partition computes its LOCAL frontier with windows
  *      partitioned by `spark_partition_id()` — fully distributed, one
  *      hash shuffle, no single-partition sort of the full data;
  *   2. the union of local frontiers (tiny: O(frontier) per partition,
  *      not O(rows)) goes through the same window filter globally —
  *      this last pass IS single-partition, but over frontier-sized
  *      input only, which is exactly when a global window is fine.
  * The naive alternative — a NOT EXISTS self-anti-join — is |n|² and
  * the global-window-only version funnels 100 TB into one task; both
  * are wrong at scale.
  *
  * The dominance filter per phase: sort by x; a row survives iff no
  * strictly-cheaper row has y >= its y (running max over the
  * dense_rank-ordered RANGE so tied x never leaks into "cheaper"), and
  * no same-x row has a strictly larger y.
  */
object Skyline {

  private def frontier(df: DataFrame, part: Seq[Column],
      xCol: String, yCol: String): DataFrame = {
    val byX = Window.partitionBy(part: _*).orderBy(col(xCol))
    val cheaper = Window.partitionBy(part: _*).orderBy(col("_pr"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val sameX = Window.partitionBy(part :+ col(xCol): _*)
    df.withColumn("_pr", dense_rank().over(byX))
      .withColumn("_maxc", max(yCol).over(cheaper))
      .withColumn("_maxs", max(yCol).over(sameX))
      .filter((col("_maxc").isNull || col("_maxc") < col(yCol)) &&
        col("_maxs") === col(yCol))
      .drop("_pr", "_maxc", "_maxs")
  }

  /** Skyline of `df` minimizing `xCol`, maximizing `yCol`; all input
    * columns pass through. */
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val local = frontier(
      df.withColumn("_pid", spark_partition_id()),
      Seq(col("_pid")), xCol, yCol).drop("_pid")
    frontier(local, Seq.empty, xCol, yCol)
  }
}
