package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (one per suite, lazy). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // the shared session is reused across suites — register the graft
    // native functions up front (idempotent) so no spec depends on some
    // OTHER suite having touched the table loader first
    graft.plans.GraftExtensions.register(s)
    s
  }

  /** Flatten an executed plan THROUGH adaptive stage boundaries — AQE wraps
    * materialized stages in leaf QueryStageExec nodes, so a plain collect
    * stops at stage edges (the PlanAudit walk, shared by plan-shape specs).
    */
  def flattenExecuted(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      flattenExecuted(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      flattenExecuted(q.plan)
    case other => other +: other.children.flatMap(flattenExecuted)
  }
}
