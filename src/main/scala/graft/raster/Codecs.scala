package graft.raster

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pixel-value codecs: Terrain-RGB elevation and RainViewer dBZ recoloring.
  *
  * Semantics from the reference:
  *  - Terrain-RGB decode `-10000 + (R*65536 + G*256 + B) * 0.1` and encode
  *    with rounding + clamp to 24 bits (`terrain-proxy/server.js:125-138`)
  *  - RainViewer pixel → dBZ `(pixel & 127) - 32` (snow bit 7 masked) and the
  *    13-bucket MetService palette (`weather-proxy/server.js:203-259`)
  *
  * All integer/branch math — implemented as both pure Scala (for the typed
  * raster pipeline over `Dataset[Tile]`) and Column trees / portable SQL
  * (codegen'd, oracle-checkable).
  */
object Codecs {

  // --- Terrain-RGB (C16) ---

  def terrainRgbToElevation(r: Int, g: Int, b: Int): Double =
    -10000 + (r * 256 * 256 + g * 256 + b) * 0.1

  /** Encode meters → (r, g, b); round-half-up then clamp to [0, 2^24-1]. */
  def elevationToRgb(elevation: Double): (Int, Int, Int) = {
    val encoded = math.round((elevation + 10000) / 0.1)
    val clamped = math.max(0L, math.min(16777215L, encoded))
    (((clamped >> 16) & 0xff).toInt, ((clamped >> 8) & 0xff).toInt, (clamped & 0xff).toInt)
  }

  def elevationCol(r: Column, g: Column, b: Column): Column =
    lit(-10000.0) + (r * 65536 + g * 256 + b) * 0.1

  /** Encoded 24-bit value as a Column (use shiftright/& to split channels).
    * NOTE: `round` here is floor(x+0.5) to match JS `Math.round` exactly on
    * both engines (SQL ROUND ties differ between half-up and half-even).
    */
  def elevationEncodedCol(elevation: Column): Column = {
    val encoded = floor((elevation + 10000) / 0.1 + 0.5).cast("long")
    greatest(lit(0L), least(lit(16777215L), encoded))
  }

  /** `0.1e0` keeps the literal a DOUBLE in DuckDB (bare `0.1` parses as
    * DECIMAL and would compute exact-decimal results that can't hash-match
    * Spark's float64).
    */
  def elevationEncodedSql(elevation: String): String =
    s"greatest(0, least(16777215, CAST(floor((($elevation) + 10000) / 0.1e0 + 0.5e0) AS BIGINT)))"

  def elevationDecodeSql(r: String, g: String, b: String): String =
    s"(-10000.0e0 + (($r) * 65536 + ($g) * 256 + ($b)) * 0.1e0)"

  // --- RainViewer dBZ (C17) ---

  def rainviewerToDbz(pixel: Int): Int = (pixel & 127) - 32

  def dbzCol(pixel: Column): Column = pixel.bitwiseAND(127) - 32

  def dbzSql(pixel: String): String = s"((($pixel) & 127) - 32)"

  /** MetService palette: (upper-exclusive dBZ bound, rgb hex string).
    * Transparent below 0 dBZ; last bucket unbounded.
    */
  val DbzPalette: Seq[(Double, String)] = Seq(
    7.0 -> "fbff00", 13.0 -> "fdf400", 20.0 -> "fee000",
    30.0 -> "4f78ff", 40.0 -> "00bfff",
    42.5 -> "ff4800", 45.0 -> "e53800",
    47.5 -> "c237e3", 50.0 -> "6f079e",
    55.0 -> "ffffff",
    57.5 -> "69fd00", 60.0 -> "39b200")
  val DbzTop = "ff3fff"
  val DbzTransparent = "transparent"

  def dbzColor(dbz: Double): String =
    if (dbz < 0) DbzTransparent
    else DbzPalette.collectFirst { case (bound, c) if dbz < bound => c }.getOrElse(DbzTop)

  /** Ordered when-ladder (first-match-wins, exactly the reference's chain). */
  def dbzColorCol(dbz: Column): Column = {
    val base = when(dbz < 0, lit(DbzTransparent))
    DbzPalette.foldLeft(base) { case (acc, (bound, c)) =>
      acc.when(dbz < bound, lit(c))
    }.otherwise(lit(DbzTop))
  }

  def dbzColorSql(dbz: String): String = {
    val whens = DbzPalette.map { case (bound, c) => s"WHEN ($dbz) < $bound THEN '$c'" }
    s"(CASE WHEN ($dbz) < 0 THEN '$DbzTransparent' ${whens.mkString(" ")} ELSE '$DbzTop' END)"
  }
}
