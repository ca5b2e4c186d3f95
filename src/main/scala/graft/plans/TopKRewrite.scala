package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: rewrite the ubiquitous hand-written top-k-per-group
  * window pattern
  *
  *   Filter(rk <= k, Window(row_number() OVER (PARTITION BY p ORDER BY o)))
  *
  * into the bounded-heap [[TopKPerKeyPlan]] operator. The window form
  * SORTS every group to rank it and then throws away all but k rows —
  * at 100 TB that is a full per-partition external sort for a k-row
  * answer; the heap form keeps O(keys·k) state and never sorts the
  * data (the measured gap behind `q_topk_native` vs
  * `q_topk_per_group`). Users keep writing the idiomatic DataFrame
  * window form; the optimizer swaps the physical shape — the same
  * contract Catalyst itself applies (e.g. Limit+Sort → TakeOrdered).
  *
  * Deliberately conservative — it fires only when the rewrite is
  * provably identical:
  *  - exactly ONE window expression, and it is `row_number()` (rank/
  *    dense_rank admit ties; row_number's output under the given
  *    order is exactly the heap operator's rank column);
  *  - the partition spec is non-empty (the heap operator distributes
  *    by key; a global top-k belongs to TakeOrdered);
  *  - the filter is a conjunction containing `rk <= lit` / `rk < lit`
  *    / `rk = 1` on the rank attribute; remaining conjuncts stay in a
  *    Filter ABOVE the rewritten node (they may reference the rank,
  *    so pushing them below would change semantics).
  *
  * The rank attribute keeps its original exprId and IntegerType (via
  * an aliasing Project over the operator's long rank), so references
  * above the rewritten block resolve unchanged.
  *
  * Registered per-session through `spark.experimental
  * .extraOptimizations` (public API, runs as the user-provided batch
  * after the main optimizer, where the Window node is still intact)
  * — see [[TopKRewrite.enable]].
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def isIntegral(t: org.apache.spark.sql.types.DataType): Boolean = t match {
    case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
         org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType => true
    case _ => false
  }

  private def rankLimit(e: Expression, rank: Attribute): Option[Long] = e match {
    case LessThanOrEqual(a: Attribute, Literal(v, t))
      if a.semanticEquals(rank) && isIntegral(t) =>
      Some(v.toString.toLong)
    case LessThan(a: Attribute, Literal(v, t))
      if a.semanticEquals(rank) && isIntegral(t) =>
      Some(v.toString.toLong - 1L)
    case EqualTo(a: Attribute, Literal(v, t))
      if a.semanticEquals(rank) && v.toString == "1" && isIntegral(t) =>
      Some(1L)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)),
          partitionSpec, orderSpec, child, _)) if partitionSpec.nonEmpty =>
      val rank = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val (limits, rest) = conjuncts.partition(c => rankLimit(c, rank).isDefined)
      val k = limits.flatMap(c => rankLimit(c, rank)).reduceOption(_ min _)
      k match {
        case Some(kk) if kk >= 1 && kk <= Int.MaxValue =>
          // the main optimizer may already have inserted its own
          // rank-limit pushdown (InferWindowGroupLimit) below the
          // Window; the heap operator subsumes it, so strip it —
          // otherwise the plan pays WindowGroupLimit's full
          // per-partition SORTS underneath a heap that never needed
          // sorted input
          val base = child match {
            case wgl: org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit
              if wgl.partitionSpec == partitionSpec && wgl.orderSpec == orderSpec &&
                wgl.limit >= kk => wgl.child
            case other => other
          }
          val topk = TopKPerKeyPlan(partitionSpec, orderSpec, kk.toInt, base)
          val rankCol = Alias(Cast(topk.rankAttr, IntegerType), alias.name)(
            exprId = alias.exprId)
          val proj = Project(child.output :+ rankCol, topk)
          if (rest.isEmpty) proj
          else Filter(rest.reduce(And), proj)
        case _ =>
          // k <= 0 (always-false filter) or no usable bound: leave the
          // plan alone and let the normal path handle it
          f
      }
  }

  private def splitConjunctivePredicates(condition: Expression): Seq[Expression] =
    condition match {
      case And(l, r) => splitConjunctivePredicates(l) ++ splitConjunctivePredicates(r)
      case other => other :: Nil
    }
}

object TopKRewrite {
  /** Arm the rewrite on a session: the rule (logical) and the strategy
    * (physical) together. Idempotent. */
  def enable(spark: SparkSession): Unit = {
    if (!spark.experimental.extraOptimizations.contains(TopKRewriteRule))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ TopKRewriteRule
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
  }
}
