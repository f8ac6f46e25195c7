package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.{DataFrame, SparkSession}

/** The single, deliberate bridge into spark-sql's package-private surface,
  * isolated in an `org.apache.spark.sql` subpackage so everything under
  * `graft.*` stays on public API. Needed because building a DataFrame from
  * a CUSTOM LogicalPlan (`Dataset.ofRows`) has no public entry point — the
  * supported extension route (`SparkSessionExtensions`) covers planning a
  * custom node but not constructing one from user code. */
object PlanBridge {

  /** DataFrame over an arbitrary (already-resolved) logical plan. */
  def ofRows(s: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      s.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Idempotently register an extra planner strategy on a live session —
    * the runtime-session equivalent of
    * `SparkSessionExtensions.injectPlannerStrategy`, so the operator works
    * in sessions that were not built `.withExtensions(...)` (the driver
    * harness builds its own sessions). */
  /** The strategies an extensions object would inject — lets tests assert
    * the `withExtensions` deployment route wires the custom operator
    * without building a second SparkContext-bearing session. */
  def plannerStrategies(e: org.apache.spark.sql.SparkSessionExtensions,
    s: SparkSession): Seq[SparkStrategy] = e.buildPlannerStrategies(s)

  def addStrategy(s: SparkSession, st: SparkStrategy): Unit = {
    val cs = s.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(st))
      cs.experimental.extraStrategies = cs.experimental.extraStrategies :+ st
  }
}
