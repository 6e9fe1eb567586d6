package org.apache.spark.sql.graftshim

import org.apache.spark.sql.{DataFrame, SparkSession, classic}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to `classic.Dataset.ofRows`, which is `private[sql]`: building a
  * DataFrame from a custom [[LogicalPlan]] node (graft.plans.AsOfJoinPlan)
  * has no public constructor in Spark 4.x, so this one-method shim lives in
  * an `org.apache.spark.sql` subpackage — the standard device used by Spark
  * extension libraries that ship whole-operator plans.
  */
object GraftShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
