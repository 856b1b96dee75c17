package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark has no built-in for — as-of (nearest
  * prior event) and interval-range joins — in their scale-correct
  * formulations: one bounded equi-shuffle each, never a per-row probe,
  * inequality cross join, or range explosion.
  */
object TemporalJoins {

  /** As-of join: for every left row, the single LATEST right row with
    * `rightTs <= leftTs` in the same `key` group (inclusive at equal
    * timestamps — DuckDB `ASOF JOIN`'s `>=` convention); left rows with
    * no prior right row keep null payloads (left-outer semantics).
    *
    * Scale shape — the merge-join formulation: tag and union the two
    * inputs, ONE shuffle+sort by (key, ts, tag), and a running
    * `last(_, ignoreNulls)` carries each right payload forward to the
    * left rows that follow it. Work is O((|L|+|R|) log) in the sort with
    * no dependence on time-gap width; the naive inequality join is
    * O(|L|·|R|) per key and a range-bucketed variant needs a gap bound.
    * Right rows sort before left rows at an equal timestamp, which is
    * what makes the match inclusive.
    *
    * Determinism: callers must make the right side unique per (key, ts)
    * (pre-aggregate — e.g. max of the payload); with ties the carried
    * row would depend on sort placement.
    *
    * Output: all left columns plus `payload` columns from the right
    * (same names), null when no prior right row exists. The payload
    * columns always come from the SAME matched right row (carried as one
    * struct), so a matched row's genuinely-NULL payload value surfaces
    * as NULL rather than a stale value from an older row.
    *
    * Null semantics: SQL equi-join — a NULL key never matches (the right
    * side is filtered to non-null key + timestamp, so a null-key left
    * row keeps a null payload instead of matching null-key right rows),
    * and a NULL right timestamp is never "earliest"; a null-ts left row
    * likewise matches nothing. Matches DuckDB ASOF JOIN.
    */
  def asofJoin(left: DataFrame, right0: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "asofJoin needs at least one right payload column")
    val right = right0.filter(col(key).isNotNull && col(rightTs).isNotNull)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload names collide with left columns: ${payload.intersect(leftCols)}")
    val lOther = leftCols.filterNot(_ == key)
    // The whole right payload travels as ONE struct so the carried value
    // is atomically the matched (latest prior) right row: a genuinely
    // NULL payload value inside it stays NULL instead of being
    // back-filled per-column from an older right row.
    val rNullStruct = org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c).copy(name = c)))
    val l2 = left.select(
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_tag")) ++
        lOther.map(col) ++
        Seq(lit(null).cast(rNullStruct).as("_r")): _*)
    val r2 = right.select(
      Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_tag")) ++
        lOther.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        Seq(struct(payload.map(col): _*).as("_r")): _*)
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l2.unionByName(r2)
      .withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_tag") === 1)
      .select(leftCols.map(col) ++
        payload.map(c => col("_r").getField(c).as(c)): _*)
  }

  /** [[asofJoin]] on the custom merge-scan physical operator
    * ([[graft.plans.AsofMergeJoinExec]] via its own LogicalPlan node +
    * planner Strategy): identical semantics and output shape, but the
    * plan is two Exchange+Sorts feeding a single streaming merge pass —
    * no union materialization and no window state. Result equality with
    * the window formulation is spec-pinned (AsofMergeJoinSpec) and the
    * registry query shares [[asofJoin]]'s DuckDB ASOF JOIN oracle. */
  def asofJoinMerged(left: DataFrame, right: DataFrame, key: String,
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asofJoinMergedKeys(left, right, Seq(key), leftTs, rightTs, payload)

  /** Multi-key [[asofJoinMerged]]: the as-of group is the COMPOSITE of
    * `keys` (e.g. (user_id, event_type)), exactly DuckDB's
    * `ASOF LEFT JOIN ... ON l.k1 = r.k1 AND l.k2 = r.k2 AND l.ts >= r.ts`.
    * [[graft.plans.AsofMergeJoinExec]] is Seq-keyed end to end (clustered
    * distribution, (k1…kn, ts) sort, interpreted composite-row ordering),
    * so this is the same single merge pass with a wider key projection.
    *
    * Null semantics: SQL equi-join — right rows with any NULL key or a
    * NULL timestamp are filtered out (a NULL key never equals anything,
    * and under the exec's natural NULLS-FIRST ordering an unfiltered
    * null ts would otherwise count as the earliest match); left rows
    * with NULL keys/ts keep null payloads. Matches the DuckDB oracle. */
  def asofJoinMergedKeys(left: DataFrame, right0: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    require(keys.nonEmpty, "asofJoinMergedKeys needs at least one key column")
    require(payload.nonEmpty, "asofJoinMergedKeys needs at least one payload column")
    val right = right0.filter(
      keys.map(col(_).isNotNull).reduce(_ && _) && col(rightTs).isNotNull)
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload names collide with left columns: ${payload.intersect(leftCols)}")
    val lPlan = left.queryExecution.analyzed
    // fresh exprIds on the right so self-as-of over one source never
    // carries duplicate attribute ids into the binary node
    val rAnalyzed = right.queryExecution.analyzed
    val rPlan = Project(
      rAnalyzed.output.map(a => Alias(a, a.name)()), rAnalyzed)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${out.map(_.name)}"))
    val node = graft.plans.AsofMergeJoinNode(lPlan, rPlan,
      keys.map(attr(lPlan.output, _)), keys.map(attr(rPlan.output, _)),
      attr(lPlan.output, leftTs), attr(rPlan.output, rightTs),
      payload.map(attr(rPlan.output, _)))
    org.apache.spark.sql.GraftShims.ofRows(left.sparkSession, node)
  }

  /** Interval-range join: every (probe, interval) pair with
    * `startCol <= probeTs <= endCol` in the same `key` group. All three
    * columns must share one unit (e.g. epoch micros).
    *
    * Scale shape — time bucketing: a probe row lands in exactly one
    * bucket of width `bucketWidth`; each interval is exploded to the
    * buckets it covers. A qualifying pair meets in exactly the probe's
    * bucket, so the equi-join on (key, bucket) + the exact BETWEEN
    * filter produces each pair once — no dedup step, and never the
    * O(|P|·|I|)-per-key inequality join. Interval replication is
    * len/bucketWidth + 1 rows, so pick bucketWidth near the typical
    * interval length (replication ≈ 2×).
    *
    * Output: all probe columns plus `payload` columns from the interval
    * side (inner-join semantics — unmatched probes drop).
    */
  def rangeJoin(probe: DataFrame, probeTs: String,
      intervals: DataFrame, startCol: String, endCol: String,
      key: String, bucketWidth: Long, payload: Seq[String]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val p = probe.withColumn("_b", expr(s"$probeTs div $bucketWidth"))
    val i = intervals
      .filter(col(startCol) <= col(endCol))
      .select(Seq(col(key).as("_ik"), col(startCol).as("_start"),
        col(endCol).as("_end")) ++ payload.map(col): _*)
      .withColumn("_b", explode(sequence(
        expr(s"_start div $bucketWidth"), expr(s"_end div $bucketWidth"))))
    p.join(i, p(key) === i("_ik") && p("_b") === i("_b"))
      .filter(col(probeTs).between(col("_start"), col("_end")))
      .select(probe.columns.map(col).toSeq ++ payload.map(col): _*)
  }

  /** Interval×interval overlap join: every (left, right) pair of CLOSED
    * intervals in the same `key` group with
    * `lStart <= rEnd && rStart <= lEnd` (touching endpoints overlap).
    *
    * Scale shape — the same time-bucket decomposition as [[rangeJoin]],
    * two-sided: both interval sets explode to the buckets they cover and
    * meet on an equi-join of (key, bucket). An overlapping pair shares
    * every bucket the overlap region covers, so to emit each pair
    * EXACTLY ONCE without a distinct shuffle, a pair only fires in the
    * bucket holding the overlap's left edge `max(lStart, rStart)` — a
    * bucket both sides necessarily cover. Replication per row is
    * `len/bucketWidth + 1`, so pick bucketWidth near the typical
    * interval length; the inequality join this replaces is O(|L|·|R|)
    * per key.
    *
    * Column names on the two sides must be disjoint; output is all left
    * columns + right's `rStart`/`rEnd` + `payload`.
    */
  def intervalOverlapJoin(left: DataFrame, lStart: String, lEnd: String,
      right: DataFrame, rStart: String, rEnd: String,
      key: String, bucketWidth: Long, payload: Seq[String]): DataFrame = {
    require(bucketWidth > 0, s"bucketWidth must be positive, got $bucketWidth")
    val clash = right.columns.toSet
      .intersect(left.columns.toSet) - key
    require(clash.isEmpty, s"overlapping column names: $clash")
    // the working columns below would silently clobber same-named
    // caller columns (withColumn replaces), producing wrong joins
    val reserved = Set("_lb", "_rb", "_rk")
      .intersect(left.columns.toSet ++ right.columns.toSet)
    require(reserved.isEmpty,
      s"input columns collide with internal working columns: $reserved")
    val l = left.filter(col(lStart) <= col(lEnd))
      .withColumn("_lb", explode(sequence(
        expr(s"$lStart div $bucketWidth"), expr(s"$lEnd div $bucketWidth"))))
    val r = right.filter(col(rStart) <= col(rEnd))
      .select(Seq(col(key).as("_rk"), col(rStart), col(rEnd)) ++
        payload.map(col): _*)
      .withColumn("_rb", explode(sequence(
        expr(s"$rStart div $bucketWidth"), expr(s"$rEnd div $bucketWidth"))))
    l.join(r, l(key) === r("_rk") && l("_lb") === r("_rb"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("_lb") ===
        expr(s"greatest($lStart, $rStart) div $bucketWidth"))
      .select(left.columns.map(col).toSeq ++
        Seq(col(rStart), col(rEnd)) ++ payload.map(col): _*)
  }
}
