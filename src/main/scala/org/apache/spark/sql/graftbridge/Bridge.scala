package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 split Column off the Catalyst
  * Expression tree (connect/classic unification); the classic-side
  * converters live in `private[sql]` scope, so this one-file subpackage
  * re-exports them for graft's custom expressions. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Whether this session has had an artifact added (the flag that
    * makes Spark 4 attach the session-isolated artifact classloader —
    * and with it the spark:// ExecutorClassLoader whose per-class-miss
    * RPC fetch is what the bench diagnosis in OPTIMIZATION_r14.md
    * measures). Diagnostic-only accessor; the member is private[sql]. */
  def sessionArtifactAdded(s: org.apache.spark.sql.SparkSession): Boolean = {
    val am = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession].artifactManager
    am.getClass.getMethod("sessionArtifactAdded").invoke(am)
      .asInstanceOf[java.util.concurrent.atomic.AtomicBoolean].get()
  }
}
