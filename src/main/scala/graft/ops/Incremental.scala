package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental (algebraic) aggregate maintenance — the don't-rescan-
  * history pattern: keep a compact per-key state table of ALGEBRAIC
  * aggregates (count/sum/min/max — each mergeable by a binary combine),
  * and fold each new micro-batch's partial state into it. A date-range
  * report then reads |keys| state rows instead of re-scanning the event
  * history; at 100 TB this is the difference between a nightly full
  * scan and an O(|delta|) update. The same algebra is why Spark's own
  * partial aggregation works; here it is lifted to cross-job state
  * (the batch twin of a streaming agg's state store).
  *
  * avg is deliberately NOT stored — it is not algebraic; it derives as
  * sum/count at read time. Mergeable distinct counts are the HLL-sketch
  * path (q_hll_merge); exact distinct is not mergeable and is excluded.
  */
object Incremental {

  /** Per-key algebraic state of `valueCol`: (n, sum_v, min_v, max_v). */
  def aggState(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("n"), sum(valueCol).as("sum_v"),
        min(valueCol).as("min_v"), max(valueCol).as("max_v"))

  /** Snapshot reconciliation: classify every key across two versions of
    * a table as `I` (only in `after`), `D` (only in `before`), or `U`
    * (present in both with any compared column differing, null-safely);
    * unchanged keys are dropped. The change-data-capture EXTRACT side —
    * the inverse of the CDC-apply op — and the audit primitive behind
    * "what did this pipeline run change".
    *
    * Scale shape: ONE co-partitioned full-outer join on the key columns;
    * the column comparison is a codegen'd null-safe equality chain — no
    * driver work, no per-column jobs, output bounded by the changed-key
    * count. Output: the key columns + `op`. */
  def snapshotDiff(before: DataFrame, after: DataFrame, keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "compareCols must be non-empty")
    val bb = compareCols.foldLeft(
        before.select((keys ++ compareCols).map(col): _*)
          .withColumn("_in_b", lit(1))) {
      (d, c) => d.withColumnRenamed(c, "_b_" + c)
    }
    val aa = compareCols.foldLeft(
        after.select((keys ++ compareCols).map(col): _*)
          .withColumn("_in_a", lit(1))) {
      (d, c) => d.withColumnRenamed(c, "_a_" + c)
    }
    val changed = compareCols
      .map(c => !(col("_b_" + c) <=> col("_a_" + c)))
      .reduce(_ || _)
    bb.join(aa, keys, "full_outer")
      .withColumn("op",
        when(col("_in_b").isNull, lit("I"))
          .when(col("_in_a").isNull, lit("D"))
          .when(changed, lit("U")))
      .filter(col("op").isNotNull)
      .select(keys.map(col) :+ col("op"): _*)
  }

  /** Merge two state tables: full-outer on keys, combine each aggregate
    * with its algebra (+, +, least, greatest). least/greatest skip the
    * nulls a one-sided key produces. sum is combined null-aware: SQL
    * sum over only-NULL inputs is NULL (not 0), so two NULL partials
    * must merge to NULL or the merge diverges from the full recompute
    * the moment the value column contains an all-NULL key. */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String]): DataFrame = {
    val bb = b.select(keys.map(col) ++ Seq(col("n").as("_nb"),
      col("sum_v").as("_sb"), col("min_v").as("_minb"),
      col("max_v").as("_maxb")): _*)
    a.join(bb, keys, "full_outer")
      .select(keys.map(col) ++ Seq(
        (coalesce(col("n"), lit(0L)) + coalesce(col("_nb"), lit(0L))).as("n"),
        when(col("sum_v").isNull && col("_sb").isNull, lit(null))
          .otherwise(coalesce(col("sum_v"), lit(0.0)) +
            coalesce(col("_sb"), lit(0.0))).as("sum_v"),
        least(col("min_v"), col("_minb")).as("min_v"),
        greatest(col("max_v"), col("_maxb")).as("max_v")): _*)
  }
}
