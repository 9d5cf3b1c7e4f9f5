package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` Dataset constructor so the
  * engine can materialize a DataFrame from its own custom LogicalPlan
  * (`graft.plans.AsOfJoinNode`). This is the standard pattern for
  * third-party Spark extensions that add whole logical operators; no
  * other Spark internals are touched from this package.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
