package graft.raster

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.broadcast.Broadcast
import graft.geo.TileMath

/** R4: the 4326-output reprojection gather (`terrain-proxy/server.js:
  * 200-278`): for each output pixel, compute lon/lat from the 4326 tile
  * bounds, project to Mercator at `mercZoom = min(z+1, 18)`, sample the
  * covering source tile, Terrain-RGB-decode, add the geoid separation
  * (C18), re-encode.
  *
  * Spark shape (SURVEY §3.3): requests flatMap to covering source-tile
  * keys → join the source-tile dataset → groupByKey(output tile) gathers
  * the 4-6 source tiles of one output into a single row → a pure typed
  * map runs the pixel loop. The only shuffle is the gather, keyed by the
  * output tile; the geoid grid rides a broadcast.
  */
object Reproject {

  final case class TileKey(z: Int, x: Int, y: Int)

  val MaxMercZoom = 18

  def mercZoomFor(z: Int): Int = math.min(z + 1, MaxMercZoom)

  /** Mercator tiles covering a 4326 tile's bounds at `mercZoom` —
    * `getMercatorTilesForBounds` (`terrain-proxy/server.js:80-93`).
    */
  def coveringMercTiles(z: Int, x: Int, y: Int): Seq[TileKey] = {
    val (latMin, latMax, lonMin, lonMax) = TileMath.tileToLatLonBounds(z, x, y)
    val mz = mercZoomFor(z)
    val (x0, y0) = TileMath.mercatorTile(lonMin, latMax, mz)
    val (x1, y1) = TileMath.mercatorTile(lonMax, latMin, mz)
    for (tx <- x0 to x1; ty <- y0 to y1) yield TileKey(mz, tx, ty)
  }

  /** Pure single-tile reprojection given the gathered sources. Missing
    * source tiles leave elevation 0 WITHOUT geoid correction (the
    * reference only adds the geoid inside the `if (src)` branch).
    */
  def reprojectTile(z: Int, x: Int, y: Int, sources: Map[(Int, Int), Tile],
      geoid: GeoidGrid, size: Int = Tiles.TileSize): Tile = {
    val (latMin, latMax, lonMin, lonMax) = TileMath.tileToLatLonBounds(z, x, y)
    val mz = mercZoomFor(z)
    val out = new Array[Byte](size * size * 4)
    var py = 0
    while (py < size) {
      var px = 0
      while (px < size) {
        val lon = lonMin + ((px + 0.5) / size) * (lonMax - lonMin)
        val lat = latMax - ((py + 0.5) / size) * (latMax - latMin)
        val mercPx = TileMath.lonToMercatorX(lon, mz)
        val mercPy = TileMath.latToMercatorY(lat, mz)
        val srcTX = math.floor(mercPx / Tiles.TileSize).toInt
        val srcTY = math.floor(mercPy / Tiles.TileSize).toInt
        var elevation = 0.0
        sources.get((srcTX, srcTY)).foreach { src =>
          val lx = math.max(0, math.min(src.width - 1,
            math.floor(mercPx - srcTX.toDouble * Tiles.TileSize).toInt))
          val ly = math.max(0, math.min(src.height - 1,
            math.floor(mercPy - srcTY.toDouble * Tiles.TileSize).toInt))
          val idx = (ly * src.width + lx) * 4
          elevation = Codecs.terrainRgbToElevation(
            src.pixels(idx) & 0xff, src.pixels(idx + 1) & 0xff, src.pixels(idx + 2) & 0xff)
          elevation += geoid.separation(lat, lon)
        }
        val (r, g, b) = Codecs.elevationToRgb(elevation)
        val oi = (py * size + px) * 4
        out(oi) = r.toByte; out(oi + 1) = g.toByte; out(oi + 2) = b.toByte
        out(oi + 3) = 255.toByte
        px += 1
      }
      py += 1
    }
    Tile(z, x, y, size, size, out)
  }

  /** Distributed form: NZ-overlap prune (partition pruning, `:205-211`),
    * fan out to source keys, join, gather per output tile, pure map.
    * Non-NZ tiles become constant sea-level tiles without any join.
    */
  def reprojectDataset(requests: Dataset[TileKey], sources: Dataset[Tile],
      geoid: Broadcast[GeoidGrid]): Dataset[Tile] = {
    val spark = requests.sparkSession
    import spark.implicits._
    implicit val tileEnc = Encoders.product[Tile]

    val (nz, sea) = (
      requests.filter((k: TileKey) => TileMath.tileOverlapsNZ(k.z, k.x, k.y)),
      requests.filter((k: TileKey) => !TileMath.tileOverlapsNZ(k.z, k.x, k.y)))
    val seaTiles = sea.map(k => Tiles.seaLevelTile(k.z, k.x, k.y))

    val wanted = nz.flatMap(k =>
      coveringMercTiles(k.z, k.x, k.y).map(s => (k, s.z, s.x, s.y)))
      .toDF("req", "sz", "sx", "sy")
    val joined = wanted.join(sources.toDF(),
        $"sz" === $"z" && $"sx" === $"x" && $"sy" === $"y")
      .select($"req", $"x", $"y", $"width", $"height", $"pixels")
      .as[(TileKey, Int, Int, Int, Int, Array[Byte])]
    val gathered = joined.groupByKey(_._1).mapGroups { (req, rows) =>
      val srcMap = rows.map { case (_, sx, sy, w, h, px) =>
        (sx, sy) -> Tile(mercZoomFor(req.z), sx, sy, w, h, px)
      }.toMap
      reprojectTile(req.z, req.x, req.y, srcMap, geoid.value)
    }
    gathered.union(seaTiles)
  }
}
