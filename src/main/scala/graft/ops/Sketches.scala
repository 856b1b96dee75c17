package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches with relative-error guarantees
  * (DDSketch, Masson et al., VLDB 2019).
  *
  * The sketch is just a histogram over logarithmic buckets
  * `bucket(v) = ceil(ln v / ln γ)` with `γ = (1+α)/(1-α)`: any value in
  * bucket b lies in (γ^(b-1), γ^b], so the bucket midpoint estimate
  * `2·γ^b/(γ+1)` is within relative error α of the true value — and
  * therefore within α of ANY quantile whose rank falls in the bucket.
  *
  * Scale shape: the build is one map-side-combined groupBy over the
  * data — the ONLY full-data pass. The sketch itself is
  * |groups| · O(log(range)/α) rows (a few hundred buckets for α=1% over
  * 6 decades), so merge (sum counts by bucket) and quantile extraction
  * (one cumulative window over the sketch) cost nothing at any corpus
  * size. This is the idiomatic distributed-quantile design: ship bucket
  * counts, not values — counts are algebraic, so partial aggregation,
  * cross-day merges, and incremental maintenance all compose.
  */
object Sketches {

  def ddGamma(alpha: Double): Double = (1 + alpha) / (1 - alpha)

  /** Log-bucket index of a positive value. */
  def ddBucket(v: Column, alpha: Double): Column =
    ceil(log(v) / lit(math.log(ddGamma(alpha)))).cast("long")

  /** Build the sketch: per-group bucket counts. Non-positive values are
    * dropped (DDSketch's zero/negative stores are out of scope — the
    * telemetry this targets is positive-valued). */
  def ddsketchBuild(df: DataFrame, valueCol: String,
      groupCols: Seq[String], alpha: Double = 0.01): DataFrame =
    df.filter(col(valueCol) > 0)
      .groupBy(groupCols.map(col) :+
        ddBucket(col(valueCol), alpha).as("bucket"): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Merge two sketches built with the same α: counts are additive. */
  def ddsketchMerge(a: DataFrame, b: DataFrame,
      groupCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((groupCols :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Extract quantile estimates from a sketch: for quantile q the
    * answer is the midpoint estimate of the first bucket whose
    * cumulative count reaches rank `floor(q·(n-1)) + 1` (discrete,
    * type-1). Output: group cols, `n`, and one `p<q·100>` column per
    * requested quantile, rounded to 4dp. */
  def ddsketchQuantiles(sketch: DataFrame, groupCols: Seq[String],
      qs: Seq[Double], alpha: Double = 0.01): DataFrame = {
    val gamma = ddGamma(alpha)
    val wCum = Window.partitionBy(groupCols.map(col): _*)
      .orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCols.map(col): _*)
    val c = sketch
      .withColumn("cum", sum("cnt").over(wCum))
      .withColumn("n", sum("cnt").over(wAll))
    def pct(q: Double) = s"p${math.round(q * 100)}"
    // p-labels round to whole percents — 0.99 and 0.994 would both
    // label "p99" and the agg would emit ambiguous columns
    require(qs.map(pct).distinct.size == qs.size,
      s"quantile labels collide after rounding: $qs")
    val picks = qs.map { q =>
      min(when(col("cum") >= floor(lit(q) * (col("n") - 1)) + 1,
        col("bucket"))).as("b_" + pct(q))
    }
    val heads = max("n").as("n") +: picks
    val est = c.groupBy(groupCols.map(col): _*)
      .agg(heads.head, heads.tail: _*)
    qs.foldLeft(est) { (d, q) =>
      d.withColumn(pct(q),
          round(lit(2) * pow(lit(gamma), col("b_" + pct(q))) /
            lit(gamma + 1), 4))
        .drop("b_" + pct(q))
    }
  }
}
