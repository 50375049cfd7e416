package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for the `private[sql]` Column ↔ Expression bridge —
  * the supported way for libraries to expose custom Catalyst expressions
  * as Columns in Spark 4's classic API.
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Block until queued listener events are delivered (`listenerBus` is
    * `private[spark]`) — needed when metrics collected by a listener are
    * read right after the jobs that produced them.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
