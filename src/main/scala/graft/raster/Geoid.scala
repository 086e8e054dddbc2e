package graft.raster

import java.nio.{ByteBuffer, ByteOrder}

/** NZGeoid-style GTX grid: S11 binary scan + C18 bilinear sampling
  * (`terrain-proxy/server.js:145-177`).
  *
  * GTX layout (big-endian): `latMin f64, lonMin f64, dlat f64, dlon f64,
  * nrows i32, ncols i32, row-major f32 grid` — header at bytes 0..43, grid
  * from byte 44.
  *
  * At scale the grid is a driver-side read (S15-style) broadcast to
  * executors; sampling is pure math per row.
  */
final case class GeoidGrid(latMin: Double, lonMin: Double, dlat: Double,
    dlon: Double, nrows: Int, ncols: Int, values: Array[Float]) {

  /** C18: bilinear separation; outside the grid (or on its last row/col,
    * like the reference's `r0 >= nrows - 1` guard) → 0. Longitudes are
    * normalized to [0, 360).
    */
  def separation(lat: Double, lon: Double): Double = {
    val adjLon = if (lon < 0) lon + 360 else lon
    val row = (lat - latMin) / dlat
    val col = (adjLon - lonMin) / dlon
    val r0 = math.floor(row).toInt
    val c0 = math.floor(col).toInt
    if (r0 < 0 || r0 >= nrows - 1 || c0 < 0 || c0 >= ncols - 1) 0.0
    else {
      val fr = row - r0
      val fc = col - c0
      val v00 = values(r0 * ncols + c0)
      val v01 = values(r0 * ncols + c0 + 1)
      val v10 = values((r0 + 1) * ncols + c0)
      val v11 = values((r0 + 1) * ncols + c0 + 1)
      v00 * (1 - fr) * (1 - fc) + v01 * (1 - fr) * fc +
        v10 * fr * (1 - fc) + v11 * fr * fc
    }
  }
}

object Geoid {

  /** S11: decode a GTX byte buffer (e.g. from `spark.read.format
    * ("binaryFile")` or a driver-side read).
    */
  def parseGtx(bytes: Array[Byte]): GeoidGrid = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val latMin = buf.getDouble(0)
    val lonMin = buf.getDouble(8)
    val dlat = buf.getDouble(16)
    val dlon = buf.getDouble(24)
    val nrows = buf.getInt(32)
    val ncols = buf.getInt(36)
    val values = new Array[Float](nrows * ncols)
    var i = 0
    while (i < values.length) {
      values(i) = buf.getFloat(44 + i * 4)
      i += 1
    }
    GeoidGrid(latMin, lonMin, dlat, dlon, nrows, ncols, values)
  }

  /** Inverse of [[parseGtx]] — used by specs to build synthetic grids. */
  def toGtxBytes(g: GeoidGrid): Array[Byte] = {
    val buf = ByteBuffer.allocate(44 + g.values.length * 4).order(ByteOrder.BIG_ENDIAN)
    buf.putDouble(0, g.latMin).putDouble(8, g.lonMin)
      .putDouble(16, g.dlat).putDouble(24, g.dlon)
      .putInt(32, g.nrows).putInt(36, g.ncols)
    var i = 0
    while (i < g.values.length) {
      buf.putFloat(44 + i * 4, g.values(i))
      i += 1
    }
    buf.array()
  }
}
