package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType}

/** Catalyst optimizer rule: rewrites a raw point-in-interval range join —
  * `left JOIN right ON p >= s AND p <= e`, which Spark can only plan as a
  * broadcast-nested-loop (quadratic work, full build-side broadcast) —
  * into the binned equi-join of [[graft.ops.RangeJoin.pointInInterval]],
  * transparently: the interval side explodes to the fixed-width bins it
  * covers, the point side computes its single bin, and the original
  * predicate survives as a residual filter on a hash-joinable condition.
  *
  * This is the (c)-level extension path — a `Rule[LogicalPlan]` injected
  * via [[graft.functions.GraftExtensions]] (`spark.sql.extensions`) or
  * `spark.experimental.extraOptimizations` — used exactly where built-in
  * planning genuinely cannot express the efficient shape: Catalyst has no
  * range-join strategy, so user queries written naively against the SQL
  * surface hit nested-loop. With this rule they get the same plan the
  * explicit operator builds, without changing their query.
  *
  * Scope (deliberately narrow, semantics-preserving):
  *  - INNER join whose condition is exactly the conjunction of one lower
  *    and one upper bound on the same bigint point expression, bounds from
  *    the opposite side (either side may be the point side);
  *  - enabled only when `spark.graft.rangeJoin.binWidth` is set (bin
  *    width is a data-dependent tuning choice — no silent guessing);
  *  - intervals with e < s explode to zero bins (empty sequence guard),
  *    matching the no-match semantics of the original predicate.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  val BinWidthKey = "spark.graft.rangeJoin.binWidth"
  private val BinCol = "__graft_bin"

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val widthStr = conf.getConfString(BinWidthKey, "")
    if (widthStr.isEmpty) return plan
    val width = widthStr.toLong
    require(width > 0, s"$BinWidthKey must be positive, got $width")
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        extractPointRange(cond, left, right) match {
          case Some((pointOnLeft, p, s, e)) =>
            rewrite(j, pointOnLeft, p, s, e, width)
          case None => j
        }
    }
  }

  /** Matches `p >= s AND p <= e` (any operand orientation, either
    * conjunct order) with the point on one side of the join and both
    * bounds on the other; all three bigint. Returns (point-side-is-left,
    * p, s, e). */
  private def extractPointRange(cond: Expression, left: LogicalPlan,
      right: LogicalPlan): Option[(Boolean, Expression, Expression,
      Expression)] = {
    def from(side: LogicalPlan)(x: Expression): Boolean =
      x.references.nonEmpty && x.references.subsetOf(side.outputSet)
    def lower(c: Expression): Seq[(Expression, Expression)] = c match {
      case GreaterThanOrEqual(p, s) => Seq((p, s))
      case LessThanOrEqual(s, p) => Seq((p, s))
      case _ => Nil
    }
    def upper(c: Expression): Seq[(Expression, Expression)] = c match {
      case LessThanOrEqual(p, e) => Seq((p, e))
      case GreaterThanOrEqual(e, p) => Seq((p, e))
      case _ => Nil
    }
    cond match {
      case And(c1, c2) =>
        (for {
          (lo, hi) <- Seq((c1, c2), (c2, c1))
          (p1, s) <- lower(lo)
          (p2, e) <- upper(hi)
          if p1.semanticEquals(p2)
          if Seq(p1, s, e).forall(_.dataType == LongType)
          pointOnLeft <- (from(left)(p1), from(right)(s) && from(right)(e),
            from(right)(p1), from(left)(s) && from(left)(e)) match {
            case (true, true, _, _) => Seq(true)
            case (_, _, true, true) => Seq(false)
            case _ => Nil
          }
        } yield (pointOnLeft, p1, s, e)).headOption
      case _ => None
    }
  }

  private def binOf(x: Expression, width: Long): Expression =
    Floor(Divide(Cast(x, DoubleType), Literal(width.toDouble, DoubleType)))

  private def rewrite(j: Join, pointOnLeft: Boolean, p: Expression,
      s: Expression, e: Expression, width: Long): LogicalPlan = {
    val (pointSide, intervalSide) =
      if (pointOnLeft) (j.left, j.right) else (j.right, j.left)
    val pointBin = Alias(binOf(p, width), BinCol)()
    val pointProj = Project(pointSide.output :+ pointBin, pointSide)
    // e < s → empty bin array → Explode drops the row (it can match
    // nothing), and Sequence never sees a descending range under ANSI
    val startBin = binOf(s, width)
    val endBin = binOf(e, width)
    val bins = If(LessThanOrEqual(startBin, endBin),
      Sequence(startBin, endBin, Some(Literal(1L, LongType)),
        Some(conf.sessionLocalTimeZone)),
      Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
    val intervalBin =
      AttributeReference(BinCol, LongType, nullable = false)()
    val intervalGen = Generate(Explode(bins), unrequiredChildIndex = Nil,
      outer = false, qualifier = None,
      generatorOutput = Seq(intervalBin), child = intervalSide)
    val newCond = And(EqualTo(pointProj.output.last.toAttribute,
      intervalBin), j.condition.get)
    val newJoin = Join(pointProj, intervalGen, Inner, Some(newCond), j.hint)
    // restore the original output order and drop the helper bin columns
    Project(j.output, newJoin)
  }
}
