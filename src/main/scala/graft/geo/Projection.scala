package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** NZTM2000 (EPSG:2193) → WGS84 inverse transverse-Mercator projection.
  *
  * Re-implements the conversion the reference performs with proj4
  * (`power-outages/scrapers/powerco.js:56-63`, proj string
  * `+proj=tmerc +lat_0=0 +lon_0=173 +k=0.9996 +x_0=1600000 +y_0=10000000
  * +ellps=GRS80`) using the published closed-form TM inverse series
  * (Redfearn / Snyder, "Map Projections — A Working Manual", USGS PP 1395,
  * eq. 8-17..8-25) on the GRS80 ellipsoid.
  *
  * Three synchronized forms, all derived from the same constants:
  *  - [[inverse]]: pure Scala (unit-testable, usable in typed pipelines)
  *  - [[latColumn]]/[[lonColumn]]: Catalyst Column trees — pure built-in
  *    math functions, stays inside WholeStageCodegen (no UDF)
  *  - [[latSql]]/[[lonSql]]: the same formula emitted as ANSI SQL text for
  *    external oracles (DuckDB)
  *
  * Keep the operation ORDER identical across the three forms: outputs are
  * compared after rounding to 7 dp (~1 cm), far above double ULP noise.
  */
object Projection {
  // GRS80 ellipsoid + NZTM2000 parameters (LINZ standard, public)
  val A: Double = 6378137.0
  val F: Double = 1.0 / 298.257222101
  val K0: Double = 0.9996
  val LON0: Double = 173.0
  val FE: Double = 1600000.0
  val FN: Double = 10000000.0

  val E2: Double = 2 * F - F * F // first eccentricity squared
  val EP2: Double = E2 / (1 - E2) // second eccentricity squared
  val E1: Double = (1 - math.sqrt(1 - E2)) / (1 + math.sqrt(1 - E2))
  // meridian arc normalizer: a * (1 - e2/4 - 3e4/64 - 5e6/256)
  val MU_DEN: Double = A * (1 - E2 / 4 - 3 * E2 * E2 / 64 - 5 * E2 * E2 * E2 / 256)
  // footpoint-latitude series coefficients
  val J1: Double = 3 * E1 / 2 - 27 * E1 * E1 * E1 / 32
  val J2: Double = 21 * E1 * E1 / 16 - 55 * E1 * E1 * E1 * E1 / 32
  val J3: Double = 151 * E1 * E1 * E1 / 96
  val J4: Double = 1097 * E1 * E1 * E1 * E1 / 512

  /** Pure-Scala inverse: (easting, northing) → (latDeg, lonDeg). */
  def inverse(e: Double, n: Double): (Double, Double) = {
    val mu = ((n - FN) / K0) / MU_DEN
    val phi1 = mu + J1 * math.sin(2 * mu) + J2 * math.sin(4 * mu) +
      J3 * math.sin(6 * mu) + J4 * math.sin(8 * mu)
    val sinP = math.sin(phi1); val cosP = math.cos(phi1); val tanP = math.tan(phi1)
    val c1 = EP2 * cosP * cosP
    val t1 = tanP * tanP
    val s = 1 - E2 * sinP * sinP
    val n1 = A / math.sqrt(s)
    val r1 = A * (1 - E2) / (s * math.sqrt(s))
    val d = (e - FE) / (n1 * K0)
    val lat = phi1 - (n1 * tanP / r1) * (d * d / 2 -
      (5 + 3 * t1 + 10 * c1 - 4 * c1 * c1 - 9 * EP2) * d * d * d * d / 24 +
      (61 + 90 * t1 + 298 * c1 + 45 * t1 * t1 - 252 * EP2 - 3 * c1 * c1) *
        d * d * d * d * d * d / 720)
    val lon = math.toRadians(LON0) + (d - (1 + 2 * t1 + c1) * d * d * d / 6 +
      (5 - 2 * c1 + 28 * t1 - 3 * c1 * c1 + 8 * EP2 + 24 * t1 * t1) *
        d * d * d * d * d / 120) / cosP
    (math.toDegrees(lat), math.toDegrees(lon))
  }

  /** Shared intermediate Columns (mirrors [[inverse]] step by step). */
  private def parts(e: Column, n: Column): (Column, Column, Column, Column, Column, Column, Column) = {
    val mu = ((n - lit(FN)) / lit(K0)) / lit(MU_DEN)
    val phi1 = mu + lit(J1) * sin(mu * 2) + lit(J2) * sin(mu * 4) +
      lit(J3) * sin(mu * 6) + lit(J4) * sin(mu * 8)
    val sinP = sin(phi1); val cosP = cos(phi1); val tanP = tan(phi1)
    val c1 = lit(EP2) * cosP * cosP
    val t1 = tanP * tanP
    val s = lit(1.0) - lit(E2) * sinP * sinP
    val n1 = lit(A) / sqrt(s)
    val r1 = lit(A * (1 - E2)) / (s * sqrt(s))
    val d = (e - lit(FE)) / (n1 * lit(K0))
    (phi1, tanP, cosP, c1, t1, n1 * tanP / r1, d)
  }

  /** Latitude (degrees) as a Catalyst Column over easting/northing Columns. */
  def latColumn(e: Column, n: Column): Column = {
    val (phi1, _, _, c1, t1, nTanOverR, d) = parts(e, n)
    // factor association mirrors [[inverse]] exactly (4*c1*c1, not c1*c1*4):
    // float multiplication is non-associative, and the three synchronized
    // forms must agree to the ULP.
    degrees(phi1 - nTanOverR * (d * d / 2 -
      (lit(5.0) + lit(3.0) * t1 + lit(10.0) * c1 - lit(4.0) * c1 * c1 - lit(9 * EP2)) * d * d * d * d / 24 +
      (lit(61.0) + lit(90.0) * t1 + lit(298.0) * c1 + lit(45.0) * t1 * t1 - lit(252 * EP2) - lit(3.0) * c1 * c1) *
        d * d * d * d * d * d / 720))
  }

  /** Longitude (degrees) as a Catalyst Column over easting/northing Columns. */
  def lonColumn(e: Column, n: Column): Column = {
    val (_, _, cosP, c1, t1, _, d) = parts(e, n)
    degrees(lit(math.toRadians(LON0)) + (d - (lit(1.0) + lit(2.0) * t1 + c1) * d * d * d / 6 +
      (lit(5.0) - lit(2.0) * c1 + lit(28.0) * t1 - lit(3.0) * c1 * c1 + lit(8 * EP2) + lit(24.0) * t1 * t1) *
        d * d * d * d * d / 120) / cosP)
  }

  /** The same formula as portable SQL text (valid in Spark SQL and DuckDB). */
  private def partsSql(e: String, n: String): Map[String, String] = {
    val mu = s"((($n) - $FN) / $K0 / $MU_DEN)"
    val phi1 = s"($mu + $J1*sin(2*$mu) + $J2*sin(4*$mu) + $J3*sin(6*$mu) + $J4*sin(8*$mu))"
    val c1 = s"($EP2 * cos($phi1) * cos($phi1))"
    val t1 = s"(tan($phi1) * tan($phi1))"
    val sTerm = s"(1 - $E2 * sin($phi1) * sin($phi1))"
    val n1 = s"($A / sqrt($sTerm))"
    val r1 = s"(${A * (1 - E2)} / ($sTerm * sqrt($sTerm)))"
    val d = s"((($e) - $FE) / ($n1 * $K0))"
    Map("phi1" -> phi1, "c1" -> c1, "t1" -> t1, "n1" -> n1, "r1" -> r1, "d" -> d)
  }

  def latSql(e: String, n: String): String = {
    val p = partsSql(e, n)
    val (phi1, c1, t1, n1, r1, d) = (p("phi1"), p("c1"), p("t1"), p("n1"), p("r1"), p("d"))
    s"degrees($phi1 - ($n1 * tan($phi1) / $r1) * ($d*$d/2" +
      s" - (5 + 3*$t1 + 10*$c1 - 4*$c1*$c1 - ${9 * EP2}) * $d*$d*$d*$d/24" +
      s" + (61 + 90*$t1 + 298*$c1 + 45*$t1*$t1 - ${252 * EP2} - 3*$c1*$c1) * $d*$d*$d*$d*$d*$d/720))"
  }

  def lonSql(e: String, n: String): String = {
    val p = partsSql(e, n)
    val (phi1, c1, t1, d) = (p("phi1"), p("c1"), p("t1"), p("d"))
    s"degrees(${math.toRadians(LON0)} + ($d - (1 + 2*$t1 + $c1) * $d*$d*$d/6" +
      s" + (5 - 2*$c1 + 28*$t1 - 3*$c1*$c1 + ${8 * EP2} + 24*$t1*$t1) * $d*$d*$d*$d*$d/120) / cos($phi1))"
  }
}
