package graft.geo

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-Mercator and EPSG:4326 tile/pixel math.
  *
  * Semantics from the reference (`terrain-proxy/server.js:52-93`,
  * `weather-proxy/server.js:335-354`,
  * `scripts/download_nationalmap/create_nationalmap_mbtiles.py:15-41`):
  *  - Mercator forward: lon→x, lat→y in pixels at a zoom (256 px tiles)
  *  - EPSG:4326 quadtree: 2 tiles wide × 1 tall at z=0
  *  - NZ-bounds overlap prune (partition pruning before raster compute)
  *  - TMS y-flip for MBTiles
  *
  * Pure-Scala + Column forms, kept in step; all Column forms are built-in
  * math (codegen-friendly).
  */
object TileMath {
  val TileSize = 256
  // NZ coverage box (BASELINE.md): lat -48..-34, lon 166..179
  val NzMinLat = -48.0; val NzMaxLat = -34.0
  val NzMinLon = 166.0; val NzMaxLon = 179.0

  // --- pure Scala ---

  def lonToMercatorX(lon: Double, zoom: Int): Double =
    (lon + 180) / 360 * (TileSize * math.pow(2, zoom))

  def latToMercatorY(lat: Double, zoom: Int): Double = {
    val latRad = lat * math.Pi / 180
    val mercN = math.log(math.tan(math.Pi / 4 + latRad / 2))
    (1 - mercN / math.Pi) / 2 * (TileSize * math.pow(2, zoom))
  }

  /** Mercator tile coordinates containing a lon/lat at a zoom. */
  def mercatorTile(lon: Double, lat: Double, zoom: Int): (Int, Int) =
    (math.floor(lonToMercatorX(lon, zoom) / TileSize).toInt,
     math.floor(latToMercatorY(lat, zoom) / TileSize).toInt)

  /** EPSG:4326 tile → lat/lon bounds (2×1 root grid). */
  def tileToLatLonBounds(z: Int, x: Int, y: Int): (Double, Double, Double, Double) = {
    val numX = 2 * math.pow(2, z); val numY = math.pow(2, z)
    (90 - (y + 1) / numY * 180, // latMin
     90 - y / numY * 180, // latMax
     x / numX * 360 - 180, // lonMin
     (x + 1) / numX * 360 - 180) // lonMax
  }

  /** Partition-prune predicate: does a 4326 tile overlap the NZ box? */
  def tileOverlapsNZ(z: Int, x: Int, y: Int): Boolean = {
    val (latMin, latMax, lonMin, lonMax) = tileToLatLonBounds(z, x, y)
    lonMax > NzMinLon && lonMin < NzMaxLon && latMax > NzMinLat && latMin < NzMaxLat
  }

  /** TMS y-flip used by the MBTiles sink (`create_nationalmap_mbtiles.py:103`). */
  def tmsY(z: Int, y: Int): Int = (1 << z) - 1 - y

  // --- Column forms ---

  def lonToMercatorXCol(lon: Column, zoom: Int): Column =
    (lon + 180) / 360 * lit(TileSize * math.pow(2, zoom))

  def latToMercatorYCol(lat: Column, zoom: Int): Column = {
    val latRad = lat * lit(math.Pi) / 180
    val mercN = log(tan(lit(math.Pi / 4) + latRad / 2))
    (lit(1.0) - mercN / lit(math.Pi)) / 2 * lit(TileSize * math.pow(2, zoom))
  }

  def mercatorTileXCol(lon: Column, zoom: Int): Column =
    floor(lonToMercatorXCol(lon, zoom) / TileSize).cast("int")

  def mercatorTileYCol(lat: Column, zoom: Int): Column =
    floor(latToMercatorYCol(lat, zoom) / TileSize).cast("int")

  /** Same formulas as portable SQL text (Spark SQL + DuckDB). */
  def mercatorXSql(lon: String, zoom: Int): String =
    s"(($lon + 180) / 360 * ${TileSize * math.pow(2, zoom)})"
  def mercatorYSql(lat: String, zoom: Int): String =
    s"((1 - ln(tan(${math.Pi / 4} + ($lat * ${math.Pi} / 180) / 2)) / ${math.Pi}) / 2 * ${TileSize * math.pow(2, zoom)})"
}
