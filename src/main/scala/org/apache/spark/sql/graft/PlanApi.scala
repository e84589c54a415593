package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge into `Dataset.ofRows` (private[sql]): wrapping a hand-built
  * LogicalPlan in a DataFrame has no public API, so custom-operator
  * libraries conventionally host a one-liner inside an
  * `org.apache.spark.sql` subpackage. Nothing else lives here. */
object PlanApi {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
