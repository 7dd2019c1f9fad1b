package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one bridge into Spark's `private[sql]` Dataset constructor, so
  * graft's custom logical plan nodes (e.g. `graft.plans.AsOfJoinNode`)
  * can be wrapped back into a user-facing DataFrame. This is the
  * standard pattern for libraries contributing whole plan nodes (the
  * same door `Dataset.ofRows` callers inside Spark use); everything
  * else in graft stays in its own package. */
object GraftPlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
