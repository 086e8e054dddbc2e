package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThanOrEqual,
  LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: put a cheap bounding-box guard in front of every
  * point-in-polygon predicate — the Catalyst form of the reference's
  * `tileOverlapsNZ` prune (`terrain-proxy/server.js:74-78`, SURVEY §4
  * "optional Rule").
  *
  * `Filter(pip(lon, lat, ring) && rest)` becomes
  * `Filter(lon >= minx && lon <= maxx && lat >= miny && lat <= maxy &&
  * pip(...) && rest)`. The range conjuncts are orders of magnitude cheaper
  * than the ray-cast AND, when lon/lat are physical columns, they push
  * down to the scan (parquet min/max row-group skipping) — which the
  * ray-cast never can.
  *
  * Idempotent: the guard is only added when its conjuncts aren't already
  * present (checked with semanticEquals, so repeated optimizer passes and
  * fixed-point iteration are safe).
  */
object PipBboxPruneRule extends Rule[LogicalPlan] with PredicateHelper {

  private def guardsFor(pip: PointInPolygonExpression): Seq[Expression] = {
    val (minx, maxx, miny, maxy) = pip.bbox
    Seq(
      GreaterThanOrEqual(pip.lon, Literal(minx)),
      LessThanOrEqual(pip.lon, Literal(maxx)),
      GreaterThanOrEqual(pip.lat, Literal(miny)),
      LessThanOrEqual(pip.lat, Literal(maxy)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(condition, child) =>
      val conjuncts = splitConjunctivePredicates(condition)
      val pips = conjuncts.collect { case p: PointInPolygonExpression => p }
      val missing = pips.flatMap(guardsFor).filterNot(g =>
        conjuncts.exists(_.semanticEquals(g)))
      if (missing.isEmpty) f
      else Filter((missing ++ conjuncts).reduceLeft(And), child)
  }
}
