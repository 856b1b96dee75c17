package graft

import graft.ops.Sketches
import org.apache.spark.sql.functions._

/** DDSketch semantics the single-dataset oracle hash can't pin: the
  * merge law (sketch(A) ⊎ sketch(B) answers exactly like sketch(A∪B)),
  * the α relative-error guarantee against exact order statistics, and
  * the non-positive-value drop.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("merge of disjoint halves equals the whole-data sketch") {
    val ev = Tables.events(spark, sf)
    val cut = lit("2024-01-15").cast("timestamp")
    val whole = Sketches.ddsketchBuild(ev, "value", Seq("event_type"))
    val merged = Sketches.ddsketchMerge(
      Sketches.ddsketchBuild(ev.filter(col("ts") < cut), "value",
        Seq("event_type")),
      Sketches.ddsketchBuild(ev.filter(col("ts") >= cut), "value",
        Seq("event_type")),
      Seq("event_type"))
    // bucket-count tables identical → any downstream quantile identical
    assert(whole.except(merged).isEmpty && merged.except(whole).isEmpty)
  }

  test("quantile estimates honor the alpha relative-error bound") {
    // deterministic heavy-tailed values: exact quantiles computable
    val vals = (1 to 5000).map(i => ("g", math.pow(1.002, i)))
    val df = vals.toDF("g", "v")
    val alpha = 0.01
    val sk = Sketches.ddsketchBuild(df, "v", Seq("g"), alpha)
    val est = Sketches.ddsketchQuantiles(sk, Seq("g"),
      Seq(0.5, 0.9, 0.99), alpha).first()
    val sorted = vals.map(_._2).sorted
    def exact(q: Double) = sorted(math.floor(q * (sorted.size - 1)).toInt)
    for ((q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val e = est.getDouble(2 + i) // g, n, p50, p90, p99
      val x = exact(q)
      assert(math.abs(e - x) / x <= alpha + 1e-6,
        s"q=$q est=$e exact=$x rel=${math.abs(e - x) / x}")
    }
  }

  test("sketch table persists to parquet and merges with a later day") {
    // the operational loop: build today's sketch, store THE SKETCH
    // (|groups|·|buckets| rows, not the data), read it back tomorrow,
    // merge the new day in, read quantiles — no raw-data re-scan
    val ev = Tables.events(spark, sf)
    val cut = lit("2024-01-15").cast("timestamp")
    val dir = tmpDir("dd-store")
    Sketches.ddsketchBuild(ev.filter(col("ts") < cut), "value",
        Seq("event_type"))
      .write.mode("overwrite").parquet(s"$dir/sketch")
    val restored = spark.read.parquet(s"$dir/sketch")
    val merged = Sketches.ddsketchMerge(restored,
      Sketches.ddsketchBuild(ev.filter(col("ts") >= cut), "value",
        Seq("event_type")),
      Seq("event_type"))
    val whole = Sketches.ddsketchBuild(ev, "value", Seq("event_type"))
    assert(merged.except(whole).isEmpty && whole.except(merged).isEmpty)
    val q = Sketches.ddsketchQuantiles(merged, Seq("event_type"), Seq(0.95))
    assert(q.count() > 0 && q.filter(col("p95").isNull).count() == 0)
  }

  test("non-positive values are dropped, not bucketed") {
    val df = Seq(("g", -1.0), ("g", 0.0), ("g", 2.0)).toDF("g", "v")
    val sk = Sketches.ddsketchBuild(df, "v", Seq("g"))
    assert(sk.agg(sum("cnt")).first().getLong(0) == 1L)
  }
}
