package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** The one place the engine crosses Spark's `private[sql]` line: Spark 4
  * made [[Column]] ColumnNode-backed, and the catalyst [[Expression]]
  * behind a classic Column is reachable only through
  * `org.apache.spark.sql.classic.ExpressionUtils`. [[graft.io.StatsPrune]]
  * needs that expression tree (read-only) to translate a user predicate
  * into a manifest-stats pruning predicate. Everything else in the
  * engine stays on public API.
  */
object ColumnBridge {
  /** The catalyst expression behind a classic Column — converted
    * EAGERLY ([[ExpressionUtils.expression]] alone returns a lazy
    * ColumnNodeExpression wrapper that only unwraps at analysis).
    * Comparisons built by Column operators arrive as catalyst
    * `UnresolvedFunction("=", …)` nodes, exactly as the analyzer would
    * first see them. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ColumnNodeToExpressionConverter(c.node)
}
