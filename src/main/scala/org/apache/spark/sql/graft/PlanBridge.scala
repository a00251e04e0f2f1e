package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Minimal bridge into `private[sql]` plan construction.
  *
  * Third-party Catalyst extensions need exactly one door the public API
  * does not expose: turning a hand-built `LogicalPlan` into a
  * `DataFrame`. This object lives under `org.apache.spark.sql` solely
  * to reach `classic.Dataset.ofRows`; nothing else in the engine
  * depends on package-private Spark internals.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
