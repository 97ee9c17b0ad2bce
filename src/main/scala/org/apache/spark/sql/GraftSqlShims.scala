package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway this library uses: lifting a custom
  * [[LogicalPlan]] node (graft.plans.AsOfJoin) into a DataFrame so it
  * flows through the ordinary analyze → optimize → plan pipeline,
  * where the injected `AsOfJoinStrategy` turns it physical. This is
  * the standard extension-library technique (Delta, Sedona, et al.
  * ship the same shim); everything else in the repo stays on public
  * API. Kept to a single forwarding method so the private-API surface
  * is auditable at a glance.
  */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
