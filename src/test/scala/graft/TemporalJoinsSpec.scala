package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

/** Edge semantics of the temporal joins that the DuckDB-oracled registry
  * queries exercise only in aggregate: inclusive equal-timestamp as-of
  * matches, null payload when no prior row exists, inclusive range
  * boundaries, and exactly-once pair production for intervals spanning
  * multiple buckets.
  */
class TemporalJoinsSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest prior match, inclusive at equal ts, null when none") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 50L, "c"))
      .toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, 7L), (1L, 150L, 8L), (1L, 300L, 9L), (3L, 10L, 99L))
      .toDF("k", "rts", "rv")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "rts", Seq("rv"))
      .collect().map(r => (r.getString(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(out("a") == Some(7L), "equal-ts right row must match (inclusive)")
    assert(out("b") == Some(8L), "latest prior, not any prior, must win")
    assert(out("c") == None, "no prior right row → null payload")
  }

  test("asofJoin: later right rows never leak backwards") {
    val left = Seq((1L, 10L, "early")).toDF("k", "ts", "tag")
    val right = Seq((1L, 20L, 5L)).toDF("k", "rts", "rv")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "rts", Seq("rv")).collect()
    assert(out.length == 1 && out.head.isNullAt(3))
  }

  test("asofJoin: matched row's NULL payload stays NULL (atomic row carry)") {
    // The matched (latest prior) right row has rv = NULL; the older row
    // at ts=10 has rv = 7. Per-column carry would back-fill 7 — the
    // struct carry must surface the matched row's genuine NULL, while
    // the other payload column proves the match itself happened.
    val left = Seq((1L, 100L, "a")).toDF("k", "ts", "tag")
    val right = Seq(
        (1L, 10L, Some(7L), "old"),
        (1L, 50L, None: Option[Long], "new"))
      .toDF("k", "rts", "rv", "rname")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "rts",
      Seq("rv", "rname")).collect()
    assert(out.length == 1)
    assert(out.head.getString(4) == "new", "latest prior row must match")
    assert(out.head.isNullAt(3),
      "NULL payload of the matched row must not be back-filled from an older row")
  }

  test("rangeJoin: inclusive bounds, one row per pair even across buckets") {
    val probe = Seq((1L, 5L, "p5"), (1L, 10L, "p10"), (1L, 25L, "p25"),
        (1L, 26L, "p26"), (2L, 10L, "q10"))
      .toDF("k", "ts", "pid")
    // one interval [5, 25] spanning 3 buckets at width 10
    val intervals = Seq((1L, 5L, 25L, 100L)).toDF("k", "w_start", "w_end", "iv")
    val out = TemporalJoins.rangeJoin(probe, "ts", intervals,
        "w_start", "w_end", key = "k", bucketWidth = 10L, payload = Seq("iv"))
      .collect().map(_.getString(2))
    assert(out.sorted.toSeq == Seq("p10", "p25", "p5"),
      s"expected inclusive-bound matches exactly once each, got ${out.toSeq}")
  }

  test("rangeJoin: overlapping intervals each pair with the probe") {
    val probe = Seq((1L, 10L, "p")).toDF("k", "ts", "pid")
    val intervals = Seq((1L, 0L, 15L, 1L), (1L, 5L, 30L, 2L), (1L, 11L, 12L, 3L))
      .toDF("k", "w_start", "w_end", "iv")
    val out = TemporalJoins.rangeJoin(probe, "ts", intervals,
        "w_start", "w_end", key = "k", bucketWidth = 7L, payload = Seq("iv"))
      .collect().map(_.getLong(3)).sorted
    assert(out.toSeq == Seq(1L, 2L), s"probe must pair with both covering intervals: ${out.toSeq}")
  }

  test("intervalOverlapJoin: exactly-once across shared buckets; closed bounds") {
    // left [0, 95] spans 10 buckets at width 10; right [42, 88] shares
    // 5 of them — the pair must still surface exactly once
    val left = Seq((1L, 0L, 95L, "L1"), (1L, 200L, 210L, "L2"),
      (2L, 0L, 50L, "Lx")).toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 42L, 88L, "R1"), (1L, 96L, 199L, "Rgap"),
      (1L, 210L, 300L, "Rtouch"), (3L, 0L, 500L, "Rk")) // wrong key
      .toDF("k", "rs", "re", "rid")
    val out = TemporalJoins.intervalOverlapJoin(left, "ls", "le",
        right, "rs", "re", key = "k", bucketWidth = 10L,
        payload = Seq("rid"))
      .select("lid", "rid").collect().map(r => (r.getString(0), r.getString(1)))
    assert(out.sorted.toSeq == Seq(("L1", "R1"), ("L2", "Rtouch")),
      s"exactly-once + touching-endpoint overlap + key isolation: ${out.toSeq}")
  }

  test("intervalOverlapJoin: rejects input columns named like working columns") {
    // a caller column named _lb/_rb/_rk would be silently clobbered by
    // the internal withColumn/select — must be an error, not wrong rows
    val left = Seq((1L, 0L, 9L, 7L)).toDF("k", "ls", "le", "_lb")
    val right = Seq((1L, 0L, 9L, "R")).toDF("k", "rs", "re", "rid")
    val e = intercept[IllegalArgumentException] {
      TemporalJoins.intervalOverlapJoin(left, "ls", "le",
        right, "rs", "re", key = "k", bucketWidth = 10L,
        payload = Seq("rid"))
    }
    assert(e.getMessage.contains("_lb"))
    val right2 = Seq((1L, 0L, 9L, "R")).toDF("k", "rs", "re", "_rk")
    val e2 = intercept[IllegalArgumentException] {
      TemporalJoins.intervalOverlapJoin(
        left.withColumnRenamed("_lb", "pay"), "ls", "le",
        right2, "rs", "re", key = "k", bucketWidth = 10L,
        payload = Seq("_rk"))
    }
    assert(e2.getMessage.contains("_rk"))
  }

  test("intervalOverlapJoin: inverted intervals drop instead of exploding") {
    val left = Seq((1L, 10L, 5L, "bad")).toDF("k", "ls", "le", "lid")
    val right = Seq((1L, 0L, 100L, "R")).toDF("k", "rs", "re", "rid")
    assert(TemporalJoins.intervalOverlapJoin(left, "ls", "le",
      right, "rs", "re", key = "k", bucketWidth = 10L,
      payload = Seq("rid")).isEmpty)
  }
}
