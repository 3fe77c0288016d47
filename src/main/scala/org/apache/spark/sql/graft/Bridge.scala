package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Expression bridge. Spark 4 made `ExpressionUtils`
  * private[sql]; custom Catalyst expressions still need both directions
  * to surface as `Column` API (the extension point the Spark source
  * itself uses — see org.apache.spark.sql.classic.columnNodeSupport).
  * Living in a sql subpackage grants the package-private access.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Catalyst's `CollectTopK` bounded-heap aggregate is private[sql];
    * this package qualifies. See GraftFunctions.collect_top_k for the
    * public Column form + semantics. */
  def collectTopK(child: Expression, num: Int, reverse: Boolean): Expression =
    new org.apache.spark.sql.catalyst.expressions.aggregate
      .CollectTopK(child, num, reverse, 0, 0).toAggregateExpression()
}
