package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.functions._

/** Hand-computable pins for [[graft.ops.TimeSeries.interpolateLinear]]:
  * time-weighted (not index-weighted) interior fill, observed rows pass
  * through, keys stay isolated.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def ts(h: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:00:00")

  test("interior gaps fill with the time-weighted line; keys isolated") {
    val series = Seq(
      ("a", ts(0), 10.0), ("a", ts(3), 40.0), ("a", ts(4), 0.0),
      ("b", ts(1), 5.0), ("b", ts(2), 7.0))
      .toDF("k", "hour", "v")
    val out = TimeSeries.interpolateLinear(series, "k", "hour", "v",
        "interval 1 hour")
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(1).toString.take(13),
        r.getDouble(2), r.getBoolean(3))).toSet
    // a: hours 1,2 interpolate 10→40 over 3 h → 20, 30; b: no gap
    assert(out == Set(
      ("a", "2024-01-01 00", 10.0, false),
      ("a", "2024-01-01 01", 20.0, true),
      ("a", "2024-01-01 02", 30.0, true),
      ("a", "2024-01-01 03", 40.0, false),
      ("a", "2024-01-01 04", 0.0, false),
      ("b", "2024-01-01 01", 5.0, false),
      ("b", "2024-01-01 02", 7.0, false)), s"got $out")
  }

  test("off-grid observations are kept and anchor the fill, not dropped") {
    // key observed at 00:00 (v=0) and 01:30 (v=90): the grid anchors at
    // 00:00 (00:00, 01:00), so 01:30 is OFF-grid — it must survive as
    // its own row and pull 01:00's interpolation to 60 (2/3 of the way)
    val series = Seq(
      ("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), 0.0),
      ("k", java.sql.Timestamp.valueOf("2024-01-01 01:30:00"), 90.0))
      .toDF("k", "hour", "v")
    val out = TimeSeries.interpolateLinear(series, "k", "hour", "v",
        "interval 1 hour")
      .collect().map(r => r.getTimestamp(1).toString.take(16) ->
        (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out.size == 3, s"grid(2) + off-grid obs: $out")
    assert(out("2024-01-01 01:30") == ((90.0, false)), s"kept: $out")
    assert(out("2024-01-01 01:00") == ((60.0, true)),
      s"off-grid neighbor anchors the line: $out")
  }

  test("irregular hole widths stay time-weighted") {
    // observed at h0=0 and h5=50: hole at h2 must be 20 (2/5 of the
    // way), not the index midpoint
    val series = Seq(("k", ts(0), 0.0), ("k", ts(5), 50.0))
      .toDF("k", "hour", "v")
    val out = TimeSeries.interpolateLinear(series, "k", "hour", "v",
        "interval 1 hour")
      .filter(hour(col("hour")) === 2).first()
    assert(out.getDouble(2) == 20.0 && out.getBoolean(3))
  }
}
