package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, Expression, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the extension ladder: recognizes the
  * ubiquitous per-key top-k idiom
  *
  * {{{ Filter(rank <= k, Window(row_number() over (partition ps order os))) }}}
  *
  * and inserts [[TopKPerKey]] UNDER the window, so the full sort the
  * Window requires runs over at most k rows per key instead of the whole
  * partition. The Window is kept (ranks recomputed over the surviving
  * rows are identical — top-k preserves relative order), which makes the
  * rewrite semantics-preserving including the rank column, for any
  * downstream use. Only `row_number` qualifies: `rank()` can emit more
  * than k rows for ties.
  *
  * Registered via `SparkSessionExtensions.injectOptimizerRule` (config
  * path) or [[TopKRewrite.register]] on a live session.
  */
object TopKRewriteRule extends Rule[LogicalPlan] {

  private def rowNumberAlias(w: Window): Option[Alias] =
    w.windowExpressions match {
      case Seq(a @ Alias(WindowExpression(_: RowNumber, _), _)) => Some(a)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // partitionSpec must be non-empty: ClusteredDistribution(Nil) is
    // rejected by Spark, and a global top-k has no per-key win anyway
    case f @ Filter(cond, w: Window)
        if w.orderSpec.nonEmpty && w.partitionSpec.nonEmpty =>
      rowNumberAlias(w) match {
        case Some(alias) =>
          val k = cond match {
            case LessThanOrEqual(a: AttributeReference, IntegerLiteral(n))
                if a.exprId == alias.exprId => Some(n)
            case LessThan(a: AttributeReference, IntegerLiteral(n))
                if a.exprId == alias.exprId => Some(n - 1)
            case _ => None
          }
          k match {
            case Some(n) if n > 0 && !isAlreadyRewritten(w.child) =>
              f.copy(child = w.copy(child =
                TopKPerKey(n, w.partitionSpec, w.orderSpec, w.child)))
            case _ => f
          }
        case None => f
      }
  }

  private def isAlreadyRewritten(p: LogicalPlan): Boolean =
    p.isInstanceOf[TopKPerKey]
}

object TopKRewrite {
  /** Idempotently attach the rule + strategy to a live session. */
  def register(spark: SparkSession): Unit = {
    TopK.registerStrategy(spark)
    val es = spark.experimental
    if (!es.extraOptimizations.contains(TopKRewriteRule))
      es.extraOptimizations = es.extraOptimizations :+ TopKRewriteRule
  }
}
