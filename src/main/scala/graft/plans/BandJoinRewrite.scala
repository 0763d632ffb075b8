package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Logical band-join rewrite (SURVEY §7.5, §7.2): an inner join whose
  * condition is purely a range predicate
  *
  *   left.x >= right.lo AND left.x <= right.hi        (any </<= mix)
  *
  * would plan as BroadcastNestedLoopJoin — O(|L|·|R|) with no shuffle
  * parallelism on the build side. This rule rewrites it to
  *
  *   Project(originalOutput,
  *     Join(left + band(x), Generate(explode(sequence(band(lo), band(hi))),
  *          right), band(x) == band(r) AND originalCond))
  *
  * i.e. an equi-join on `floor(value / W)` with the right side exploded over
  * its interval's bands — Catalyst then plans a hash join that shuffles on
  * the band key. Each left row has exactly one band, so no dedup is needed
  * and the residual range condition keeps exact semantics. This is the same
  * search-space pruning the reference implements with binary search
  * (reference: janitor/functions/conditional_join.py:1004-1148), expressed
  * as a plan rewrite instead of a kernel.
  *
  * Intervals spanning more than `spark.graft.bandJoin.maxBands` bands would
  * turn the explode into a row blow-up (or a Sequence length error), so they
  * are split into a second nested-loop join branch and unioned back — the
  * rewrite stays lossless for arbitrarily wide intervals.
  *
  * Off by default; enable per session:
  *   spark.graft.bandJoin.enabled=true
  *   spark.graft.bandJoin.width=<W>      (band width in value units, default 10)
  *   spark.graft.bandJoin.maxBands=<N>   (per-row explode cap, default 4096)
  */
case class BandJoinRewrite() extends Rule[LogicalPlan] {
  import BandJoinRewrite.REWRITTEN

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x => Seq(x)
  }

  /** (x, bound, boundIsLower): x from one side, bound from the other. */
  private def asRange(e: Expression, leftOut: AttributeSet, rightOut: AttributeSet)
      : Option[(Expression, Expression, Boolean)] = {
    def sidesOk(x: Expression, b: Expression): Boolean =
      x.references.nonEmpty && b.references.nonEmpty &&
        x.references.subsetOf(leftOut) && b.references.subsetOf(rightOut) &&
        x.dataType.isInstanceOf[NumericType] && b.dataType.isInstanceOf[NumericType]
    e match {
      case GreaterThanOrEqual(x, b) if sidesOk(x, b) => Some((x, b, true))
      case GreaterThan(x, b) if sidesOk(x, b) => Some((x, b, true))
      case LessThanOrEqual(x, b) if sidesOk(x, b) => Some((x, b, false))
      case LessThan(x, b) if sidesOk(x, b) => Some((x, b, false))
      case LessThanOrEqual(b, x) if sidesOk(x, b) => Some((x, b, true))
      case LessThan(b, x) if sidesOk(x, b) => Some((x, b, true))
      case GreaterThanOrEqual(b, x) if sidesOk(x, b) => Some((x, b, false))
      case GreaterThan(b, x) if sidesOk(x, b) => Some((x, b, false))
      case _ => None
    }
  }

  private def band(e: Expression, w: Double): Expression =
    Floor(Divide(Cast(e, DoubleType), Literal(w)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (conf.getConfString("spark.graft.bandJoin.enabled", "false") != "true") return plan
    val w = conf.getConfString("spark.graft.bandJoin.width", "10.0").toDouble
    val maxBands = conf.getConfString("spark.graft.bandJoin.maxBands", "4096").toLong
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint)
          if left.resolved && right.resolved && j.getTagValue(REWRITTEN).isEmpty =>
        val parts = conjuncts(cond)
        val ranges = parts.flatMap(p => asRange(p, left.outputSet, right.outputSet).map(p -> _))
        val hasEqui = parts.exists {
          case EqualTo(a, b) =>
            (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
              (b.references.subsetOf(left.outputSet) && a.references.subsetOf(right.outputSet))
          case _ => false
        }
        // need a lower AND an upper bound on the SAME left expression,
        // and no existing equi key (Catalyst already hash-joins those)
        val pair = for {
          (_, (x1, lo, true)) <- ranges.view
          (_, (x2, hi, false)) <- ranges
          if x1.semanticEquals(x2)
        } yield (x1, lo, hi)
        if (hasEqui || ranges.size != parts.size || pair.isEmpty) j
        else {
          val (x, lo, hi) = pair.head
          val span = Subtract(band(hi, w), band(lo, w))
          // wide intervals (> maxBands bands per row) must not be exploded:
          // route them through a plain nested-loop branch instead. Null-bound
          // rows ride the narrow branch — their band array is empty, and an
          // inner join can't match them anyway.
          val narrowPred = Or(IsNull(span), LessThanOrEqual(span, Literal(maxBands)))
          val widePred = GreaterThan(span, Literal(maxBands))
          val bandL = Alias(band(x, w), "__graft_band_l")()
          val leftP = Project(left.output :+ bandL, left)
          val bandR = AttributeReference("__graft_band_r", LongType)()
          // hi < lo (empty interval) must yield no bands, not a Sequence error
          val bandsExpr = If(LessThanOrEqual(band(lo, w), band(hi, w)),
            Sequence(band(lo, w), band(hi, w), Some(Literal(1L)),
              Some(conf.sessionLocalTimeZone)),
            Literal.create(Array.empty[Long],
              org.apache.spark.sql.types.ArrayType(LongType)))
          val gen = Generate(
            Explode(bandsExpr),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bandR), child = Filter(narrowPred, right))
          val newCond = And(EqualTo(bandL.toAttribute, bandR), cond)
          val bandedBranch = Project(j.output, Join(leftP, gen, Inner, Some(newCond), hint))
          val wideJoin = Join(left, Filter(widePred, right), Inner, Some(cond), hint)
          // the wide branch is itself a pure range join — tag it so the
          // fixpoint pass doesn't rewrite it again forever
          wideJoin.setTagValue(REWRITTEN, ())
          Union(Seq(bandedBranch, Project(j.output, wideJoin)))
        }
    }
  }
}

object BandJoinRewrite {
  private[plans] val REWRITTEN =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.bandJoin.rewritten")
}

/** Session extension registration:
  * `SparkSession.builder().withExtensions(new GraftExtensions)` or
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => BandJoinRewrite())
    SqlFunctions.inject(e)
  }
}
