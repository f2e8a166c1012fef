package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Library-internal bridge to `Dataset.ofRows` (private[sql]) so graft
  * can hand custom logical plans to the session — the standard pattern
  * for Spark extension libraries that add whole operators.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The engine's standard ANSI divide-by-zero error (QueryExecutionErrors
    * is private[sql]), so custom expressions fail identically to `Divide`.
    */
  def divideByZeroError(context: org.apache.spark.QueryContext): ArithmeticException =
    org.apache.spark.sql.errors.QueryExecutionErrors.divideByZeroError(context)
}
