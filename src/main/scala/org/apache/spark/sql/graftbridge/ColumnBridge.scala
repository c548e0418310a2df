package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionUtils}

/** Bridge into Spark's `private[sql]` Column ⇄ Expression converters —
  * needed to register FunctionRegistry builders (SQL names) that reuse the
  * public Column-based graft functions. Standard extension-library
  * technique; no Spark internals are modified.
  *
  * `expression` must EAGERLY convert the ColumnNode tree (the lazy
  * `ExpressionUtils.expression` wrapper would reach codegen unresolved when
  * embedded in a FunctionRegistry builder result). */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)

  /** Unpersist the checkpointed RDD behind a `localCheckpoint`ed frame
    * (its plan is a LogicalRDD leaf). Iterative algorithms that re-
    * checkpoint per round use this to release the superseded round's
    * executor storage immediately instead of waiting for driver GC. */
  def unpersistCheckpoint(df: org.apache.spark.sql.classic.Dataset[_]): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
        ()
      case _ => ()
    }
}
