package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` plan constructors — the standard
  * technique for third-party Catalyst extensions that introduce their own
  * logical operators (a custom [[LogicalPlan]] node has no public DataFrame
  * wrapper; `Dataset.ofRows` is the only way to lift one). Everything graft
  * actually implements lives under `graft.plans`; this object adds no
  * behavior.
  */
object GraftPlanBridge {

  /** Wrap an (already resolved) logical plan as a DataFrame. */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan backing a DataFrame. */
  def analyzed(df: DataFrame): LogicalPlan =
    df.asInstanceOf[classic.Dataset[Row]].queryExecution.analyzed
}
