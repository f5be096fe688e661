package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset, SparkSession => ClassicSession}

/** Bridge into Spark's `private[sql]` LogicalPlan -> DataFrame wrapper —
  * an optimizer rule that wants to run a tiny planning-time statistics
  * query over one of its input subtrees (the CBO analog) needs exactly
  * `Dataset.ofRows`, which Spark 4 hides in the classic package.
  */
object PlanBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[ClassicSession], plan)
}
