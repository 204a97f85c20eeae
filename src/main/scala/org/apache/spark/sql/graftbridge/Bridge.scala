package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 moved the constructors behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * custom native expressions need this one-file shim inside the sql
  * package — the standard pattern for Catalyst extension libraries. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
