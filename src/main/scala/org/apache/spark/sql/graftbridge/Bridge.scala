package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Expression↔Column bridge. Spark 4 made the Column API backend-agnostic
  * and scoped the classic converters `private[sql]`; this shim lives under
  * `org.apache.spark.sql` solely to re-export them for graft's custom
  * Catalyst expressions. No Spark internals are modified.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
