package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Alias, And, AttributeReference, EqualTo, Explode, Expression, GreaterThan, GreaterThanOrEqual, IntegralDivide, LessThan, LessThanOrEqual, Literal, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.LongType

/** Optimizer rule: interval-containment inner joins become bucketed
  * equi-joins automatically.
  *
  * Spark plans `L JOIN R ON l.ts >= r.lo AND l.ts <= r.hi` as a
  * broadcast-nested-loop (or cartesian) join — O(|L|·|R|) work that is
  * the classic 100 TB cliff for point-in-interval enrichment (IP→range,
  * time→validity-window, price→band). Engines that special-case it
  * (DuckDB's IEJoin, Databricks' hinted range join) win by orders of
  * magnitude; OSS Spark users hand-write the bucket trick instead
  * ([[graft.ops.TemporalJoins.rangeJoin]] is our explicit form). This
  * rule applies the same rewrite inside Catalyst, so the naive
  * inequality-join *syntax* gets the scale-correct *plan*:
  *
  *   probe side gains one bucket column  `_graft_rb  = ts div W`
  *   build side explodes to its buckets  `_graft_rb2 = sequence(lo div W, hi div W)`
  *   join becomes Inner on `_graft_rb = _graft_rb2` AND the ORIGINAL
  *   condition (buckets only narrow candidates — every qualifying pair
  *   meets in exactly the probe's one bucket, so no dedup is needed and
  *   the result multiset is untouched)
  *
  * Scope guards (bail out ⇒ plan unchanged):
  *   - Inner join whose condition contains BOTH a lower and an upper
  *     bound on the same LongType probe expression (epoch micros etc.),
  *     one side's references entirely from L, the other's from R —
  *     either orientation;
  *   - enabled only when `spark.graft.rangeJoin.binSize` > 0 (the bin
  *     width, in the probe column's own unit; pick ≈ the typical
  *     interval length so replication stays ≈ 2 rows per interval).
  *
  * Strict bounds (`>`, `<`) are accepted for bucketing (a qualifying
  * pair still shares the probe's bucket; the original strict predicate
  * is re-applied exactly). Open-ended ranges (only one bound) are NOT
  * rewritten — an unbounded interval explodes into unbounded buckets.
  */
object RangeJoinRule extends Rule[LogicalPlan] {

  val BIN_CONF = "spark.graft.rangeJoin.binSize"

  def inject(e: SparkSessionExtensions): Unit =
    e.injectOptimizerRule(_ => RangeJoinRule)

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val bin =
      try conf.getConfString(BIN_CONF, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (bin <= 0) plan
    else plan.transformUp {
      // idempotence guard: the rewritten join keeps the original
      // containment conjuncts (they are the exactness filter), so
      // without the marker check the optimizer's fixpoint loop would
      // re-bucket its own output every iteration until OOM
      case j @ Join(l, r, Inner, Some(_), _)
          if !(l.output ++ r.output).exists(_.name.startsWith("_graft_rb")) =>
        rewrite(j, bin).getOrElse(j)
    }
  }

  /** Split a conjunction into its conjuncts. */
  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  private def rewrite(j: Join, bin: Long): Option[LogicalPlan] = {
    val cs = conjuncts(j.condition.get)

    // For each orientation (probe in left / probe in right) collect
    // lower/upper bounds of the same probe expression.
    def boundsFor(probeFromLeft: Boolean):
        Option[(Expression, Expression, Expression)] = {
      val (probeSet, buildSet) =
        if (probeFromLeft) (j.left.outputSet, j.right.outputSet)
        else (j.right.outputSet, j.left.outputSet)
      def isProbe(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(probeSet) &&
          e.dataType == LongType
      def isBuild(e: Expression) =
        e.references.nonEmpty && e.references.subsetOf(buildSet) &&
          e.dataType == LongType
      // collect ALL candidate bounds — pairing only the first of each
      // would miss a valid (lower, upper) pair on one probe column
      // whenever a bound on a DIFFERENT probe column appears earlier
      // in the conjunction
      val lowers = cs.collect { // (probe, lo)
        case GreaterThanOrEqual(p, lo) if isProbe(p) && isBuild(lo) => (p, lo)
        case GreaterThan(p, lo) if isProbe(p) && isBuild(lo) => (p, lo)
        case LessThanOrEqual(lo, p) if isProbe(p) && isBuild(lo) => (p, lo)
        case LessThan(lo, p) if isProbe(p) && isBuild(lo) => (p, lo)
      }
      val uppers = cs.collect { // (probe, hi)
        case LessThanOrEqual(p, hi) if isProbe(p) && isBuild(hi) => (p, hi)
        case LessThan(p, hi) if isProbe(p) && isBuild(hi) => (p, hi)
        case GreaterThanOrEqual(hi, p) if isProbe(p) && isBuild(hi) => (p, hi)
        case GreaterThan(hi, p) if isProbe(p) && isBuild(hi) => (p, hi)
      }
      (for {
        (pl, lo) <- lowers
        (pu, hi) <- uppers
        if pl.semanticEquals(pu)
      } yield (pl, lo, hi)).headOption
    }

    val leftBounds = boundsFor(true)
    val probeFromLeft = leftBounds.isDefined
    val found = leftBounds.orElse(boundsFor(false))
    found.map { case (probeTs, lo, hi) =>
      val (probePlan, buildPlan) =
        if (probeFromLeft) (j.left, j.right) else (j.right, j.left)

      val binLit = Literal(bin, LongType)
      val probeBucket =
        Alias(new IntegralDivide(probeTs, binLit), "_graft_rb")()
      val newProbe = Project(probePlan.output :+ probeBucket, probePlan)

      val buildBucketAttr =
        AttributeReference("_graft_rb2", LongType, nullable = false)()
      // inverted intervals (lo > hi) match nothing under the original
      // condition, but an ascending Sequence THROWS on them — filter
      // them out before the explode (the explicit TemporalJoins twin
      // has the same guard). Truly enormous bounded intervals fail fast
      // in Sequence's array-length check rather than OOM; the bin conf
      // doc tells callers to size the bin near the interval width.
      val guarded = Filter(LessThanOrEqual(lo, hi), buildPlan)
      // Sequence is TimeZoneAwareExpression: the analyzer's
      // ResolveTimeZone has already run, so supply the zone explicitly
      // or the node stays unresolved and plan validation rejects it
      val seq = Sequence(
        new IntegralDivide(lo, binLit), new IntegralDivide(hi, binLit),
        Some(Literal(1L, LongType)), Some(conf.sessionLocalTimeZone))
      val newBuild = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None,
        generatorOutput = Seq(buildBucketAttr), child = guarded)

      val bucketEq = EqualTo(probeBucket.toAttribute, buildBucketAttr)
      val newCond = And(bucketEq, j.condition.get)
      val (nl, nr) =
        if (probeFromLeft) (newProbe, newBuild) else (newBuild, newProbe)
      val newJoin = Join(nl, nr, Inner, Some(newCond), j.hint)
      Project(j.output, newJoin)
    }
  }
}
