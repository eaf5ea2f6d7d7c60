package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into `private[sql]` surface, for graft.MeasuredCkpt.
  *
  * `classic.Dataset.ofRows` (wrap a hand-built logical plan back into
  * a DataFrame) is private[sql]; extension libraries conventionally
  * reach it through a one-liner in the org.apache.spark.sql package.
  * Nothing else crosses this boundary — keep it that way: every
  * additional internal touched here is an upgrade hazard.
  */
object GraftSqlBridge {
  def ofRows(session: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(session.asInstanceOf[classic.SparkSession], plan)
}
