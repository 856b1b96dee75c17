package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.Incremental

/** Algebraic-state laws for [[graft.ops.Incremental]] — the properties
  * that make incremental maintenance CORRECT, not just convenient: any
  * partitioning of the input into batches, merged in any order, must
  * equal the full recompute.
  */
class IncrementalSpec extends SparkSpec {

  private def canon(df: DataFrame): Set[String] =
    df.select(col("k"), col("n"), round(col("sum_v"), 6).as("s"),
        col("min_v"), col("max_v"))
      .collect().map(_.toString).toSet

  private def mk(rows: Seq[(String, Double)]): DataFrame = {
    import spark.implicits._
    rows.toDF("k", "v")
  }

  private val all = Seq("a" -> 1.0, "a" -> -2.5, "b" -> 3.0, "a" -> 7.25,
    "c" -> 0.0, "b" -> -1.0, "c" -> 4.5)

  test("merge(state(p1), state(p2)) == state(p1 ++ p2) for any split") {
    val full = Incremental.aggState(mk(all), Seq("k"), "v")
    for (cut <- 0 to all.size) {
      val (p1, p2) = all.splitAt(cut)
      val merged = Incremental.merge(
        Incremental.aggState(mk(p1), Seq("k"), "v"),
        Incremental.aggState(mk(p2), Seq("k"), "v"), Seq("k"))
      assert(canon(merged) == canon(full), s"split at $cut diverged")
    }
  }

  test("merge is commutative") {
    val (p1, p2) = all.splitAt(3)
    val a = Incremental.aggState(mk(p1), Seq("k"), "v")
    val b = Incremental.aggState(mk(p2), Seq("k"), "v")
    assert(canon(Incremental.merge(a, b, Seq("k"))) ==
      canon(Incremental.merge(b, a, Seq("k"))))
  }

  test("merge is associative across three batches") {
    val batches = Seq(all.take(2), all.slice(2, 5), all.drop(5))
      .map(p => Incremental.aggState(mk(p), Seq("k"), "v"))
    val leftFold = Incremental.merge(
      Incremental.merge(batches(0), batches(1), Seq("k")), batches(2), Seq("k"))
    val rightFold = Incremental.merge(
      batches(0), Incremental.merge(batches(1), batches(2), Seq("k")), Seq("k"))
    assert(canon(leftFold) == canon(rightFold))
  }

  test("all-NULL keys merge to NULL sums, matching the full recompute") {
    import spark.implicits._
    // SQL sum over only-NULL inputs is NULL, not 0 — the merge must
    // preserve that or it diverges from a rescan on NULL-bearing data
    val rows = Seq(("k", Option.empty[Double]), ("k", None),
      ("m", Some(2.0)), ("m", None))
    val (p1, p2) = rows.splitAt(2)
    val merged = Incremental.merge(
      Incremental.aggState(p1.toDF("k", "v"), Seq("k"), "v"),
      Incremental.aggState(p2.toDF("k", "v"), Seq("k"), "v"), Seq("k"))
    val full = Incremental.aggState(rows.toDF("k", "v"), Seq("k"), "v")
    def snap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getString(0) ->
        (r.getLong(1), Option(r.get(2)), Option(r.get(3)))).toMap
    assert(snap(merged) == snap(full))
    assert(snap(merged)("k")._2.isEmpty, "all-NULL key must keep NULL sum")
  }

  test("keys present in only one side survive a merge intact") {
    val a = Incremental.aggState(mk(Seq("only_a" -> 2.0)), Seq("k"), "v")
    val b = Incremental.aggState(mk(Seq("only_b" -> -3.0)), Seq("k"), "v")
    val m = Incremental.merge(a, b, Seq("k")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(m == Map("only_a" -> (1L, 2.0), "only_b" -> (1L, -3.0)))
  }

  test("snapshotDiff: I/D/U classes, unchanged dropped, NULL compare is null-safe") {
    import spark.implicits._
    val before = Seq(
      (1L, Some(10.0), "x"),  // unchanged → dropped
      (2L, Some(20.0), "x"),  // value changes → U
      (3L, None, "x"),        // NULL == NULL → unchanged, dropped
      (4L, None, "x"),        // NULL → value → U
      (5L, Some(50.0), "x")   // only in before → D
    ).toDF("k", "v", "seg")
    val after = Seq(
      (1L, Some(10.0), "x"),
      (2L, Some(21.0), "x"),
      (3L, None, "x"),
      (4L, Some(4.0), "x"),
      (6L, Some(60.0), "x")   // only in after → I
    ).toDF("k", "v", "seg")
    val got = Incremental.snapshotDiff(before, after, Seq("k"), Seq("v", "seg"))
      .as[(Long, String)].collect().toMap
    assert(got == Map(2L -> "U", 4L -> "U", 5L -> "D", 6L -> "I"))
  }
}
