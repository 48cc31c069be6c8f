package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway a third-party plan-level extension
  * needs: wrapping a custom [[LogicalPlan]] node back into a public
  * DataFrame. Same technique every open-source Spark extension with
  * custom operators uses (a shim object under `org.apache.spark.sql`);
  * everything else in graft sticks to public API.
  */
object Shims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
