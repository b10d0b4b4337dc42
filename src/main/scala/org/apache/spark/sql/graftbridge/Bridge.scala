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

  /** Drain the async listener bus (`SparkContext.listenerBus` is
    * `private[spark]`): task-end events are delivered on AsyncEventQueue
    * threads, so a metrics snapshot taken right after the last action
    * can miss the final tasks' counts unless the bus is empty. Best
    * effort — on timeout the snapshot proceeds with what has arrived. */
  def waitListenerBusEmpty(sc: org.apache.spark.SparkContext,
                           timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => }
}
