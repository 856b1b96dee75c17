package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge into `private[sql]` surface the public API does not expose:
  * constructing a DataFrame from a hand-built LogicalPlan (the entry
  * point every custom logical operator needs — Spark's own DSL does the
  * same via `Dataset.ofRows`). Kept to this single call; everything
  * else in the engine goes through the public API. */
object GraftShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
