package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType}

/** Optimizer rule: push partial aggregation through an equi-join whose
  * build side is PROVABLY unique on the join key — the automatic twin of
  * the hand-written rewrite in `queries/ScaleOps.preaggJoin` (and the
  * rewrite Catalyst itself does not perform). Given
  *
  * {{{ Aggregate(G, [sum/count/min/max/avg over fact exprs],
  *       fact ⋈_{fk1 = k1 ∧ … ∧ fkn = kn} dim) }}}
  *
  * where `dim` is an `Aggregate` whose grouping keys are a subset of
  * {k1..kn} (so each join-key tuple matches AT MOST ONE dim row — the
  * n:1 proof the rule needs; uniqueness on a grouping set implies
  * uniqueness on any join-key superset of it; arbitrary subtrees are
  * rejected because uniqueness can't be seen statically), rewrite to
  *
  * {{{ Aggregate(G, [merge partials],
  *       Aggregate({fk1..fkn} ∪ (G ∩ fact cols), partials, fact) ⋈ dim) }}}
  *
  * so the JOIN INPUT collapses to one row per key before the shuffle. At
  * 100 TB this is the difference between shuffling the fact table into
  * the join and shuffling one row per key — the same argument
  * `preagg_join` makes manually, now applied wherever the pattern
  * occurs.
  *
  * Soundness notes:
  *  - inner join whose condition is a pure conjunction of attribute
  *    equalities, every pair spanning the two sides; `isDistinct`
  *    aggregates and filtered aggregates are rejected;
  *  - SUM/AVG are restricted to int/long/double children (decimal
  *    widens its result type per level, so a two-level sum would change
  *    the output type); COUNT re-merges as COALESCE(SUM, 0) (counts
  *    add; the coalesce restores the empty-input 0 and the
  *    non-nullable output attribute); MIN/MAX merge as themselves and
  *    preserve types exactly; AVG pushes sum+count partials and merges
  *    as Σsum / Σcount — the same double accumulator Average itself
  *    uses for non-decimal input;
  *  - a Project between the aggregate and the join is INLINED first
  *    (deterministic expressions only — the substitution both column
  *    pruning's attribute-only projects and computed/renaming aliases
  *    go through), with the aggregate's output attribute ids preserved;
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

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case x         => Seq(x)
  }

  /** dim is provably unique on the join-key set: it aggregates on plain
    * attributes forming a SUBSET of the join keys (unique on the subset
    * ⇒ unique on the whole key tuple). */
  private def uniqueOn(p: LogicalPlan, rks: Seq[Attribute]): Boolean = p match {
    case a: Aggregate =>
      val rkIds = rks.map(_.exprId).toSet
      a.groupingExpressions.nonEmpty && a.groupingExpressions.forall {
        case g: Attribute => rkIds.contains(g.exprId)
        case _            => false
      }
    case _ => false
  }

  private def innerEqui(j: Join): Boolean =
    j.joinType == Inner && j.condition.isDefined

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case agg: Aggregate =>
      agg.child match {
        case j: Join if innerEqui(j) =>
          attempt(agg, j).getOrElse(agg)
        // a Project between the aggregate and the join — column pruning's
        // attribute-only projection OR a computed/renaming projection —
        // is inlined into the aggregate (CollapseProject-style
        // substitution, deterministic exprs only), then the direct shape
        // is attempted; the rewrite re-derives exactly the columns it
        // needs and pruning re-runs on the new shape
        case p: Project if p.projectList.forall(_.deterministic) =>
          p.child match {
            case j: Join if innerEqui(j) =>
              inline(agg, p, j).flatMap(attempt(_, j)).getOrElse(agg)
            case _ => agg
          }
        case _ => agg
      }
  }

  /** Substitute `p`'s aliases into `agg`, re-parenting it directly onto
    * the join. Output attribute ids are preserved: a top-level attribute
    * that resolved to a project alias keeps its exprId via a fresh Alias
    * around the inlined expression. */
  private def inline(agg: Aggregate, p: Project, j: Join): Option[Aggregate] = {
    val m: Map[ExprId, Expression] =
      p.projectList.collect { case al: Alias => al.exprId -> al.child }.toMap
    def subst(e: Expression): Expression = e.transformUp {
      case a: Attribute if m.contains(a.exprId) => m(a.exprId)
    }
    val aggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: Attribute if m.contains(a.exprId) =>
        Alias(m(a.exprId), a.name)(exprId = a.exprId)
      case al: Alias =>
        Alias(subst(al.child), al.name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = al.explicitMetadata)
      case other => subst(other) match {
        case ne: NamedExpression => ne
        case _                   => return None
      }
    }
    Some(agg.copy(
      groupingExpressions = agg.groupingExpressions.map(subst),
      aggregateExpressions = aggExprs,
      child = j))
  }

  private case class Pushed(alias: Alias, fn: AggregateFunction)

  private val PushableNumeric = Seq(IntegerType, LongType, DoubleType)

  private def attempt(agg: Aggregate, j: Join): Option[LogicalPlan] = {
    val (left, right) = (j.left, j.right)
    val pairs: Seq[(Attribute, Attribute)] = conjuncts(j.condition.get).map {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(a) && right.outputSet.contains(b) => (a, b)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if left.outputSet.contains(b) && right.outputSet.contains(a) => (b, a)
      case _ => return None
    }
    if (!uniqueOn(right, pairs.map(_._2))) return None

    val gAttrs: Seq[Attribute] = agg.groupingExpressions.map {
      case a: Attribute => a
      case _ => return None
    }
    val leftG = gAttrs.filter(left.outputSet.contains)
    val gIds = gAttrs.map(_.exprId).toSet

    val items: Seq[scala.util.Either[NamedExpression, Pushed]] = agg.aggregateExpressions.map {
      case a: Attribute if gIds.contains(a.exprId) => scala.util.Left(a)
      // a rename of a grouping attribute (surfaced by project inlining)
      case al @ Alias(a: Attribute, _) if gIds.contains(a.exprId) =>
        scala.util.Left(al)
      case al @ Alias(ae: AggregateExpression, _)
          if !ae.isDistinct && ae.filter.isEmpty =>
        val ok = ae.aggregateFunction match {
          // TRY eval mode is rejected: `case f: Sum` also matches try_sum
          // (Sum carries an eval context in Spark 4), and splitting a TRY
          // sum is unsound — a partial that overflows to NULL would be
          // SKIPPED by the merge Sum instead of nulling the group, a
          // silently-wrong non-null answer. LEGACY wrap-around addition
          // is fully associative (exact under any split); ANSI overflow
          // already depends on Spark's own partition-order partial
          // aggregation, and the merge preserves the original's eval
          // context, so an overflow still surfaces as the ANSI error.
          case f: Sum =>
            f.evalContext.evalMode != EvalMode.TRY &&
              f.child.deterministic && f.child.references.subsetOf(left.outputSet) &&
              PushableNumeric.contains(f.child.dataType)
          case f: Average =>
            f.evalMode != EvalMode.TRY &&
              f.child.deterministic && f.child.references.subsetOf(left.outputSet) &&
              PushableNumeric.contains(f.child.dataType)
          case f: Min => f.child.deterministic && f.child.references.subsetOf(left.outputSet)
          case f: Max => f.child.deterministic && f.child.references.subsetOf(left.outputSet)
          case f: Count =>
            f.children.forall(c => c.deterministic &&
              (c.foldable || c.references.subsetOf(left.outputSet)))
          case _ => false
        }
        if (!ok) return None
        scala.util.Right(Pushed(al, ae.aggregateFunction))
      case _ => return None
    }
    val pushed = items.collect { case scala.util.Right(p) => p }
    if (pushed.isEmpty) return None

    val preKeys: Seq[Attribute] = (pairs.map(_._1) ++ leftG).distinctBy(_.exprId)
    left match {
      // fixpoint: the fact side is already aggregated on the needed keys
      case a: Aggregate if preKeys.forall(k => a.groupingExpressions.exists {
            case attr: Attribute => attr.exprId == k.exprId
            case _ => false
          }) => return None
      case _ => ()
    }

    def complete(fn: AggregateFunction): AggregateExpression =
      AggregateExpression(fn, Complete, isDistinct = false)

    val partialDefs = Seq.newBuilder[NamedExpression]
    val mergedOf = pushed.zipWithIndex.map { case (p, i) =>
      def partial(fn: AggregateFunction, suffix: String): Attribute = {
        val al = Alias(complete(fn), s"_graft_p$i$suffix")()
        partialDefs += al
        al.toAttribute
      }
      // rebuilt merge expressions pin their eval contexts EXPLICITLY —
      // the companion apply reads the SESSION conf at rewrite time, which
      // need not match the context the original was analyzed under. The
      // merge Sum of a pushed Sum inherits the ORIGINAL's context (an
      // ANSI overflow must still surface as the ANSI error); count/avg
      // plumbing sums are LEGACY by construction — count partials cannot
      // overflow a Long, and double sums never throw — and the avg merge
      // Divide is LEGACY because its divisor is either NULL (empty input
      // ⇒ null result, matching Average) or a positive count, never 0.
      val legacy = NumericEvalContext(EvalMode.LEGACY)
      val merged: Expression = p.fn match {
        case f: Sum => complete(Sum(partial(f, ""), f.evalContext))
        case f: Min => complete(Min(partial(f, "")))
        case f: Max => complete(Max(partial(f, "")))
        case f: Count =>
          // per-key counts add; COALESCE(Σ, 0) restores COUNT's two
          // invariants that a bare SUM merge breaks: a GLOBAL count over
          // an empty join must return 0 (SUM would return NULL), and the
          // original output attribute is non-nullable (SUM's isn't)
          Coalesce(Seq(complete(Sum(partial(f, ""), legacy)), Literal(0L)))
        case f: Average =>
          // push sum+count partials; merge as Σsum / Σcount — the same
          // DoubleType accumulator Average itself uses for non-decimal
          // input, so the output type (Double) and null-on-no-input
          // semantics are preserved (empty ⇒ Sum is NULL ⇒ Divide is
          // NULL, exactly Average's empty result)
          val s = partial(Sum(Cast(f.child, DoubleType), legacy), "s")
          val c = partial(Count(Seq(f.child)), "c")
          Divide(complete(Sum(s, legacy)),
            Cast(complete(Sum(c, legacy)), DoubleType), legacy)
      }
      p.alias.exprId -> merged
    }.toMap

    val preAgg = Aggregate(preKeys,
      (preKeys: Seq[NamedExpression]) ++ partialDefs.result(), left)

    val newAggExprs: Seq[NamedExpression] = items.map {
      case scala.util.Left(ne) => ne
      case scala.util.Right(p) =>
        Alias(mergedOf(p.alias.exprId), p.alias.name)(exprId = p.alias.exprId,
          qualifier = p.alias.qualifier,
          explicitMetadata = p.alias.explicitMetadata)
    }
    Some(agg.copy(aggregateExpressions = newAggExprs,
      child = j.copy(left = preAgg)))
  }
}
