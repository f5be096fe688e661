package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `Dataset.ofRows` (private[sql]) — needed to surface a custom
  * LogicalPlan node as a DataFrame the same way spark-internal APIs do,
  * and to let an optimizer rule run a tiny planning-time statistics query
  * over one of its input subtrees (the CBO analog in RangeJoinRule).
  * Spark 4 hides `ofRows` in the classic package, hence the shim.
  */
object DatasetBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
