package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.SparkStrategy

/** Bridge into two `private[sql]` seams a planner extension needs:
  * the classic `Dataset.ofRows` factory (wrap a custom LogicalPlan as
  * a DataFrame) and per-session strategy registration. Lives under
  * `org.apache.spark.sql` for access scope only — contains no Spark
  * code, just forwarding. Cluster deployments can instead register the
  * strategy via `spark.sql.extensions=graft.functions.GraftExtensions`
  * and never touch this object. */
object GraftSqlBridge {

  /** Ensure `strategy` is registered on the session, then wrap `plan`
    * as a DataFrame (full analyzer/optimizer/planner pipeline). */
  def ofRows(spark: SparkSession, plan: LogicalPlan,
      strategy: SparkStrategy): DataFrame = {
    val cs = spark.asInstanceOf[classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(strategy)) {
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ strategy
    }
    // custom plans are opaque to PushDownPredicate — restore filter
    // pushdown through them (runs in the user-provided optimizer batch)
    for (rule <- Seq(graft.plans.AsOfFilterPushdown,
        graft.plans.AsOfColumnPruning))
      if (!cs.experimental.extraOptimizations.contains(rule))
        cs.experimental.extraOptimizations =
          cs.experimental.extraOptimizations :+ rule
    classic.Dataset.ofRows(cs, plan)
  }
}
