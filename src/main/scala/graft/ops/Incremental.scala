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
