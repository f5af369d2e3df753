package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, EqualTo,
  ExprId, Expression, GreaterThan, GreaterThanOrEqual, LessThan,
  LessThanOrEqual, Literal, PredicateHelper, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.RowNumber
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: rewrite the built-in top-k-per-group idiom
  *
  * {{{ Filter(row_number <= k, Window(row_number() over (partition by K order by O), child)) }}}
  *
  * into the same plan with [[PartialTopKPerKey]] inserted UNDER the
  * window, so the bounded per-partition heap prune (q113's operator)
  * applies AUTOMATICALLY to every `row_number() <= k` window filter a
  * user writes — they get the k·|keys|·|partitions| exchange cap
  * without calling [[TopKPerKey.prune]] themselves. This is the
  * optimizer-rule rung of the extension ladder, composing with the
  * strategy rung: the rule plants the logical node, [[TopKStrategy]]
  * plans it.
  *
  * DISABLED BY DEFAULT (`spark.graft.topk.autoprune=true` opts in):
  * Spark 4's own `InsertWindowGroupLimit` optimizer rule already plants
  * a partial+final `WindowGroupLimit` for exactly this idiom (and for
  * rank/dense_rank), so on a stock session the automatic rewrite would
  * only stack a second, redundant prune under the built-in one. The
  * rule exists as (a) the fallback for sessions that disable the
  * built-in, and (b) the demonstration that the custom node composes
  * with the optimizer-rule injection point; the EXPLICIT
  * [[TopKPerKey.prune]] API stays the production path for bounding a
  * per-key tail WITHOUT a downstream window — materializing "latest k
  * events per stream group" ahead of a join or a sink, where no
  * row_number filter exists for either rule to match.
  *
  * Soundness gates (each skip keeps the plan untouched):
  *  - every window expression in the node must be `row_number()` —
  *    a sibling aggregate (count/sum over the partition) reads rows the
  *    prune would drop. Rank-only siblings are equal on the surviving
  *    top-k under a total order, but only row_number is accepted to
  *    keep the contract obvious;
  *  - the filter bound must be a foldable integer (`rn <= k`,
  *    `rn < k+1`, `rn = 1`, or the reversed literal-first forms);
  *  - the window must actually order (orderSpec nonempty);
  *  - idempotence: never rewrite a window whose child is already a
  *    [[PartialTopKPerKey]] (the optimizer runs extension batches to
  *    fixed point).
  *
  * Determinism caveat (same as the manual API): if the order is not
  * total, `row_number` is already tie-arbitrary pre-rewrite, and the
  * prune picks an equally arbitrary tie subset — the rewrite never
  * introduces nondeterminism that was not already there.
  */
object TopKAutoPrune extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.topk.autoprune", "false").toBoolean

  /** The filter bound: Some(k) if `e` limits attribute `rnAttr` to the
    * first k ranks. */
  private def boundFor(e: Expression, rnIds: Set[ExprId]): Option[Int] = {
    def isRn(a: Expression): Boolean = a match {
      case attr: Attribute => rnIds.contains(attr.exprId)
      case _ => false
    }
    def intOf(l: Literal): Option[Int] = l.value match {
      case i: Int => Some(i)
      case l0: Long if l0 <= Int.MaxValue => Some(l0.toInt)
      case _ => None
    }
    e match {
      case LessThanOrEqual(a, l: Literal) if isRn(a) => intOf(l)
      case LessThan(a, l: Literal) if isRn(a) => intOf(l).map(_ - 1)
      case EqualTo(a, l: Literal) if isRn(a) => intOf(l).filter(_ == 1)
      case EqualTo(l: Literal, a) if isRn(a) => intOf(l).filter(_ == 1)
      case GreaterThanOrEqual(l: Literal, a) if isRn(a) => intOf(l)
      case GreaterThan(l: Literal, a) if isRn(a) => intOf(l).map(_ - 1)
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case f @ Filter(cond, w: Window)
          if w.orderSpec.nonEmpty &&
            !w.child.isInstanceOf[PartialTopKPerKey] &&
            w.windowExpressions.nonEmpty &&
            w.windowExpressions.forall {
              case Alias(WindowExpression(_: RowNumber, _), _) => true
              case _ => false
            } =>
        val rnIds: Set[ExprId] = w.windowExpressions.collect {
          case a @ Alias(WindowExpression(_: RowNumber, _), _) => a.exprId
        }.toSet
        val k = splitConjunctivePredicates(cond)
          .flatMap(c => boundFor(c, rnIds))
          .reduceOption(math.min)
        k match {
          case Some(bound) if bound > 0 =>
            val pruned = PartialTopKPerKey(w.partitionSpec, w.orderSpec, bound, w.child)
            f.copy(child = w.copy(child = pruned))
          case _ => f
        }
    }
  }
}
