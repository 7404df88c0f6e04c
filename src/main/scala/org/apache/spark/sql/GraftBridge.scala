package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into the private[sql] Dataset factory so graft can wrap its
  * custom logical plans (AsOfJoin) as DataFrames. Lives in the
  * org.apache.spark.sql package solely for access; no Spark internals
  * are modified. */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(
      spark.asInstanceOf[classic.SparkSession], plan)
}
