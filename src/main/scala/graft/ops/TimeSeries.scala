package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular-grid time-series repair: densify a per-key series to a fixed
  * step and fill the holes — the pre-processing every telemetry/metrics
  * consumer (anomaly baselines, EWMA trends, model features) needs
  * before math that assumes an unbroken axis.
  *
  * Scale shape: the grid explode is `span/step` rows per key (bounded by
  * the retention window, not the corpus); all four carry windows are
  * PARTITIONED BY the key, so the fill parallelizes across keys and the
  * per-task working set is one key's series — the standard telemetry
  * bound. Nothing here shuffles the raw events: callers pre-aggregate to
  * (key, bucket, value) first, so the input is already |keys|·|buckets|.
  */
object TimeSeries {

  /** Linear interpolation over a dense per-key grid.
    *
    * `series`: (keyCol, tsCol: timestamp, valCol: double) — one row per
    * OBSERVED bucket. The key's grid spans its own min..max observed
    * bucket at `step` (e.g. "interval 1 hour"), anchored at the min.
    * Missing grid points get the linear interpolation between the
    * nearest observed neighbors (time-weighted, not index-weighted —
    * irregular holes interpolate correctly); a missing edge (possible
    * only if a caller passes an incomplete span) holds the nearest
    * observed value. Observations that do NOT land on the min-anchored
    * grid are KEPT as extra output rows and anchor the interpolation
    * around them (full-outer union of grid and observed timestamps) —
    * never silently dropped.
    *
    * Output: (keyCol, tsCol, `filled`, `was_gap`).
    */
  def interpolateLinear(series: DataFrame, keyCol: String, tsCol: String,
      valCol: String, step: String): DataFrame = {
    val span = series.groupBy(keyCol)
      .agg(min(tsCol).as("_lo"), max(tsCol).as("_hi"))
    val grid = span.select(col(keyCol),
      explode(sequence(col("_lo"), col("_hi"), expr(step))).as(tsCol))
    val g = grid.join(series, Seq(keyCol, tsCol), "full_outer")
    val wb = Window.partitionBy(keyCol).orderBy(tsCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy(keyCol).orderBy(tsCol)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val t = unix_micros(col(tsCol))
    g.withColumn("_pv", last(col(valCol), ignoreNulls = true).over(wb))
      .withColumn("_pt",
        last(when(col(valCol).isNotNull, t), ignoreNulls = true).over(wb))
      .withColumn("_nv", first(col(valCol), ignoreNulls = true).over(wf))
      .withColumn("_nt",
        first(when(col(valCol).isNotNull, t), ignoreNulls = true).over(wf))
      .withColumn("filled",
        when(col(valCol).isNotNull, col(valCol))
          .when(col("_pv").isNotNull && col("_nv").isNotNull,
            col("_pv") + (col("_nv") - col("_pv")) *
              ((t - col("_pt")).cast("double") /
                (col("_nt") - col("_pt")).cast("double")))
          .otherwise(coalesce(col("_pv"), col("_nv"))))
      .withColumn("was_gap", col(valCol).isNull)
      .drop(valCol, "_pv", "_pt", "_nv", "_nt")
  }
}
