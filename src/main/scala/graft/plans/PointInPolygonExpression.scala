package graft.plans

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType}

/** J1 as a native predicate: ray-cast point-in-polygon over a PLAN-TIME
  * ring (`power-outages/region-mapper.js:18-59`).
  *
  * Complements the unrolled Column tree in `geo.GeoFunctions`: the ring
  * lives in reference objects and the generated code runs a tight loop, so
  * big rings don't inflate the expression tree (the unrolled form grows
  * ~5 comparisons per vertex). [[PipBboxPruneRule]] recognizes this node
  * and injects the bounding-box guard in front of it.
  */
case class PointInPolygonExpression(lon: Expression, lat: Expression,
    xs: Array[Double], ys: Array[Double]) extends Expression {

  override def children: Seq[Expression] = Seq(lon, lat)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (lon.dataType == DoubleType && lat.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"graft_point_in_polygon needs DOUBLE lon/lat, got ${lon.dataType}/${lat.dataType}")
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = lon.nullable || lat.nullable

  lazy val bbox: (Double, Double, Double, Double) =
    (xs.min, xs.max, ys.min, ys.max)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val lo = lon.eval(input)
    val la = lat.eval(input)
    if (lo == null || la == null) null
    else PointInPolygonExpression.contains(
      lo.asInstanceOf[Double], la.asInstanceOf[Double], xs, ys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val xsRef = ctx.addReferenceObj("xs", xs, "double[]")
    val ysRef = ctx.addReferenceObj("ys", ys, "double[]")
    val lonCode = lon.genCode(ctx)
    val latCode = lat.genCode(ctx)
    ev.copy(code =
      code"""
        ${lonCode.code}
        ${latCode.code}
        boolean ${ev.isNull} = ${lonCode.isNull} || ${latCode.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = graft.plans.PointInPolygonExpression.contains(
            ${lonCode.value}, ${latCode.value}, $xsRef, $ysRef);
        }
      """)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): PointInPolygonExpression =
    copy(lon = newChildren(0), lat = newChildren(1))

  override def prettyName: String = "graft_point_in_polygon"

  // Array-typed fields break case-class equality; compare contents so the
  // optimizer's semanticEquals (and rule idempotence) behave.
  override def equals(other: Any): Boolean = other match {
    case p: PointInPolygonExpression =>
      lon == p.lon && lat == p.lat &&
        java.util.Arrays.equals(xs, p.xs) && java.util.Arrays.equals(ys, p.ys)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(lon, lat,
      Integer.valueOf(java.util.Arrays.hashCode(xs)),
      Integer.valueOf(java.util.Arrays.hashCode(ys)))
}

object PointInPolygonExpression {
  /** Static ray-cast the generated code calls (even-odd rule, identical to
    * GeoFunctions.pointInPolygon).
    */
  def contains(lon: Double, lat: Double, xs: Array[Double], ys: Array[Double]): Boolean = {
    var inside = false
    var j = xs.length - 1
    var i = 0
    while (i < xs.length) {
      if ((ys(i) > lat) != (ys(j) > lat) &&
          lon < (xs(j) - xs(i)) * (lat - ys(i)) / (ys(j) - ys(i)) + xs(i)) {
        inside = !inside
      }
      j = i
      i += 1
    }
    inside
  }
}
