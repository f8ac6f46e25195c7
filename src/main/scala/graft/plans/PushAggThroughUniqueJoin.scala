package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: push partial aggregation through an equi-join whose
  * build side is PROVABLY unique on the join key — the automatic twin of
  * the hand-written rewrite in `queries/ScaleOps.preaggJoin` (and the
  * rewrite Catalyst itself does not perform). Given
  *
  * {{{ Aggregate(G, [sum/count/min/max over fact cols],
  *       fact ⋈_{fk = k} dim) }}}
  *
  * where `dim` is an `Aggregate` grouped exactly on `k` (so each key
  * matches AT MOST ONE dim row — the n:1 proof the rule needs; arbitrary
  * subtrees are rejected because uniqueness can't be seen statically),
  * rewrite to
  *
  * {{{ Aggregate(G, [merge partials],
  *       Aggregate(fk ∪ (G ∩ fact cols), partials, fact) ⋈ dim) }}}
  *
  * so the JOIN INPUT collapses to one row per key before the shuffle. At
  * 100 TB this is the difference between shuffling the fact table into
  * the join and shuffling one row per key — the same argument
  * `preagg_join` makes manually, now applied wherever the pattern
  * occurs.
  *
  * Soundness notes:
  *  - inner equi-join on a single key pair only; `isDistinct` aggregates
  *    and filtered aggregates are rejected;
  *  - SUM is restricted to int/long/double children (decimal SUM widens
  *    its result type per level, so a two-level sum would change the
  *    output type); COUNT re-merges as SUM (counts add); MIN/MAX merge
  *    as themselves and preserve types exactly;
  *  - output attribute ids are preserved (the outer aliases keep their
  *    `exprId`s), so operators above the aggregate are untouched;
  *  - a fact side that is already an aggregate on the required keys is
  *    left alone — the fixpoint guard that keeps the rule from
  *    re-firing on its own output.
  *
  * Registered via [[graft.functions.GraftExtensions]]; harness sessions
  * opt in per-session with [[PushAggThroughUniqueJoin.ensure]]. */
object PushAggThroughUniqueJoin extends Rule[LogicalPlan] {

  /** Idempotently append this rule to a session's extra optimizations
    * (the ad-hoc path for sessions not built with GraftExtensions). */
  def ensure(s: SparkSession): Unit =
    if (!s.experimental.extraOptimizations.contains(this))
      s.experimental.extraOptimizations =
        s.experimental.extraOptimizations :+ this

  private def uniqueOn(p: LogicalPlan, k: Attribute): Boolean = p match {
    case a: Aggregate => a.groupingExpressions match {
      case Seq(g: Attribute) => g.exprId == k.exprId
      case _ => false
    }
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate =>
      agg.child match {
        case j: Join if j.joinType == Inner && j.condition.isDefined =>
          attempt(agg, j).getOrElse(agg)
        // look through a PRUNING project (attributes only — column pruning
        // inserts one between the aggregate and the join); it is safe to
        // drop because the rewrite re-derives exactly the columns it
        // needs and pruning re-runs on the new shape
        case p: org.apache.spark.sql.catalyst.plans.logical.Project
            if p.projectList.forall(_.isInstanceOf[Attribute]) =>
          p.child match {
            case j: Join if j.joinType == Inner && j.condition.isDefined =>
              attempt(agg, j).getOrElse(agg)
            case _ => agg
          }
        case _ => agg
      }
  }

  private case class Pushed(alias: Alias, fn: AggregateFunction)

  private def attempt(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    val (lk, rk) = j.condition.get match {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a)
      case _ => return None
    }
    if (!uniqueOn(right, rk)) return None

    val gAttrs: Seq[Attribute] = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }
    val leftG = gAttrs.filter(left.outputSet.contains)

    val items: Seq[scala.util.Either[NamedExpression, Pushed]] = agg.aggregateExpressions.map {
      case a: Attribute if gAttrs.exists(_.exprId == a.exprId) => scala.util.Left(a)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val ok = ae.aggregateFunction match {
          case f: Sum =>
            f.child.references.subsetOf(left.outputSet) &&
              Seq(IntegerType, LongType, DoubleType).contains(f.child.dataType)
          case f: Min => f.child.references.subsetOf(left.outputSet)
          case f: Max => f.child.references.subsetOf(left.outputSet)
          case f: Count =>
            f.children.forall(c => c.foldable || c.references.subsetOf(left.outputSet))
          case _ => false
        }
        if (!ok) return None
        scala.util.Right(Pushed(al, ae.aggregateFunction))
      case _ => return None
    }
    val pushed = items.collect { case scala.util.Right(p) => p }
    if (pushed.isEmpty) return None

    val preKeys: Seq[Attribute] = (lk +: leftG).distinctBy(_.exprId)
    left match {
      // fixpoint: the fact side is already aggregated on the needed keys
      case a: Aggregate if preKeys.forall(k => a.groupingExpressions.exists {
            case attr: Attribute => attr.exprId == k.exprId
            case _ => false
          }) => return None
      case _ => ()
    }

    val partials: Seq[(Pushed, Alias)] = pushed.zipWithIndex.map { case (p, i) =>
      p -> Alias(
        AggregateExpression(p.fn, Complete, isDistinct = false), s"_graft_p$i")()
    }
    val preAgg = Aggregate(preKeys,
      (preKeys: Seq[NamedExpression]) ++ partials.map(_._2), left)
    val pmap: Map[ExprId, Attribute] =
      partials.map { case (p, al) => p.alias.exprId -> al.toAttribute }.toMap

    val newAggExprs: Seq[NamedExpression] = items.map {
      case scala.util.Left(a) => a
      case scala.util.Right(p) =>
        val pa = pmap(p.alias.exprId)
        val merged: Expression = p.fn match {
          case _: Sum => AggregateExpression(Sum(pa), Complete, isDistinct = false)
          case _: Min => AggregateExpression(Min(pa), Complete, isDistinct = false)
          case _: Max => AggregateExpression(Max(pa), Complete, isDistinct = false)
          case _: Count =>
            // per-key counts add; COALESCE(Σ, 0) restores COUNT's two
            // invariants that a bare SUM merge breaks: a GLOBAL count over
            // an empty join must return 0 (SUM would return NULL), and the
            // original output attribute is non-nullable (SUM's isn't)
            Coalesce(Seq(
              AggregateExpression(Sum(pa), Complete, isDistinct = false),
              Literal(0L)))
        }
        Alias(merged, p.alias.name)(exprId = p.alias.exprId,
          qualifier = p.alias.qualifier,
          explicitMetadata = p.alias.explicitMetadata)
    }
    Some(agg.copy(aggregateExpressions = newAggExprs,
      child = j.copy(left = preAgg)))
  }
}
