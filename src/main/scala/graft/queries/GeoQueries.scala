package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.geo.{GeoFunctions, Projection, TileMath}
import graft.functions.Mmsi
import graft.raster.Codecs
import OracleParity._

/** Geospatial / raster-math operator queries (SURVEY §2.3 F1-F3/F16,
  * §2.4 J1, §2.8 C14-C17/C26).
  *
  * Every Spark pipeline here uses the library's Column-tree implementations
  * (graft.geo / graft.functions / graft.raster) — all built-in expressions,
  * whole-stage codegen, no UDFs. Oracles verify them against independent
  * formulations (e.g. ray-cast vs convex half-plane PIP).
  */
object GeoQueries {

  /** F1/F3: bounding-box + coordinate-sanity filter (the /ws.php bbox query,
    * `ais-proxy/server.js:672-680`). Pushed-down range predicates.
    */
  val q17 = GraftQuery(
    "q17_bbox_filter", "F1 F3 F16",
    (s, d) =>
      Synthetic.withGeo(Tables.events(s, d))
        .filter(GeoFunctions.validCoords(col("lat"), col("lon")))
        .filter(GeoFunctions.inBoundingBox(col("lat"), col("lon"), -45.0, -38.0, 170.0, 175.0))
        .select(col("event_id"), round(col("lat"), 6).as("lat"), round(col("lon"), 6).as("lon"))
        .orderBy(col("event_id")),
    Some(s"""SELECT event_id, round(${Synthetic.latSql}, 6) AS lat, round(${Synthetic.lonSql}, 6) AS lon
      FROM events
      WHERE abs(${Synthetic.latSql}) <= 90 AND abs(${Synthetic.lonSql}) <= 180
        AND ${Synthetic.latSql} BETWEEN -45.0 AND -38.0
        AND ${Synthetic.lonSql} BETWEEN 170.0 AND 175.0
      ORDER BY event_id"""))

  /** J1/F14: point-in-polygon spatial join. Spark evaluates the library's
    * unrolled ray-cast Column; the oracle uses an independent convex
    * half-plane formulation — agreement validates the ray-cast.
    */
  /** Convex, CCW in (lon, lat). Deliberately no horizontal/vertical edges
    * and off-grid 4-decimal vertices: the synthetic coordinates land on a
    * 0.01° grid, and a point exactly ON an edge is classified differently by
    * ray-cast (division) vs half-plane (cross product) float rounding.
    */
  private val pentagon = Seq(
    (168.0137, -46.0171), (176.0213, -45.9893), (178.0071, -40.0133),
    (172.5191, -35.5117), (167.0031, -39.9899))

  val q18 = GraftQuery(
    "q18_pip_spatial_join", "J1",
    (s, d) =>
      Synthetic.withGeo(Tables.events(s, d))
        .withColumn("inside", GeoFunctions.pointInPolygonColumn(col("lon"), col("lat"), pentagon))
        .groupBy(col("event_type"), col("inside"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("inside")),
    Some {
      val edges = pentagon.indices.map { i =>
        val (x0, y0) = pentagon(i)
        val (x1, y1) = pentagon((i + 1) % pentagon.length)
        // cross((p1-p0), (pt-p0)) > 0 for all CCW edges = inside convex ring
        s"((${x1 - x0}) * (${Synthetic.latSql} - ($y0)) - (${y1 - y0}) * (${Synthetic.lonSql} - ($x0)) > 0)"
      }
      s"""SELECT event_type, ${edges.mkString(" AND ")} AS inside, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY event_type, inside"""
    })

  /** C14: NZTM2000 → WGS84 inverse projection (the PowerCo scraper's proj4
    * call) as a codegen'd Column tree, oracle = the same published series.
    */
  val q19 = GraftQuery(
    "q19_nztm_to_wgs84", "C14 C15",
    (s, d) =>
      // sort-first: the range exchange samples its child, so sorting the
      // narrow scan keeps the trig-heavy projection out of the sampling
      // pass — it runs once, above the Sort (see q26)
      Tables.events(s, d)
        .select(col("event_id"), col("value"), col("props"))
        .orderBy(col("event_id"))
        .withColumn("k", Synthetic.k)
        .withColumn("e", Synthetic.easting)
        .withColumn("n", Synthetic.northing)
        .select(
          col("event_id"),
          round(Projection.latColumn(col("e"), col("n")), 7).as("lat"),
          round(Projection.lonColumn(col("e"), col("n")), 7).as("lon")),
    Some(s"""SELECT event_id,
        round(${Projection.latSql(Synthetic.eastingSql, Synthetic.northingSql)}, 7) AS lat,
        round(${Projection.lonSql(Synthetic.eastingSql, Synthetic.northingSql)}, 7) AS lon
      FROM events ORDER BY event_id"""))

  /** C15/C24/F16: Web-Mercator tile assignment at z=8 + tile validity. */
  val q20 = GraftQuery(
    "q20_mercator_tiles", "C15 F16",
    (s, d) =>
      Synthetic.withGeo(Tables.events(s, d))
        .select(
          col("event_id"),
          TileMath.mercatorTileXCol(col("lon"), 8).as("tile_x"),
          TileMath.mercatorTileYCol(col("lat"), 8).as("tile_y"))
        .withColumn("valid_tile",
          col("tile_x").between(0, 255) && col("tile_y").between(0, 255))
        .groupBy(col("tile_x"), col("tile_y"), col("valid_tile"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("tile_x"), col("tile_y")),
    Some(s"""WITH t AS (SELECT
        CAST(floor(${TileMath.mercatorXSql(Synthetic.lonSql, 8)} / 256) AS INT) AS tile_x,
        CAST(floor(${TileMath.mercatorYSql(Synthetic.latSql, 8)} / 256) AS INT) AS tile_y
      FROM events)
      SELECT tile_x, tile_y,
        (tile_x BETWEEN 0 AND 255) AND (tile_y BETWEEN 0 AND 255) AS valid_tile,
        COUNT(*) AS n
      FROM t GROUP BY 1, 2, 3 ORDER BY tile_x, tile_y"""))

  /** C16: Terrain-RGB encode/decode round trip (clamped at both ends). */
  val q21 = GraftQuery(
    "q21_terrain_rgb", "C16",
    (s, d) => {
      val elev = col("value") * 10.0 - 1000.0
      Tables.events(s, d)
        .withColumn("encoded", Codecs.elevationEncodedCol(elev))
        .select(
          col("event_id"),
          col("encoded"),
          shiftright(col("encoded"), 16).bitwiseAND(255).as("r"),
          shiftright(col("encoded"), 8).bitwiseAND(255).as("g"),
          col("encoded").bitwiseAND(255).as("b"))
        .withColumn("decoded", Codecs.elevationCol(col("r"), col("g"), col("b")))
        .orderBy(col("event_id"))
    },
    Some {
      val enc = Codecs.elevationEncodedSql("value * 10.0e0 - 1000.0e0")
      val dec = Codecs.elevationDecodeSql("(encoded >> 16) & 255", "(encoded >> 8) & 255", "encoded & 255")
      s"""WITH t AS (SELECT event_id, $enc AS encoded FROM events)
        SELECT event_id, encoded,
          (encoded >> 16) & 255 AS r, (encoded >> 8) & 255 AS g, encoded & 255 AS b,
          $dec AS decoded
        FROM t ORDER BY event_id"""
    })

  /** C17/R1: dBZ decode (snow-bit masked) + 13-bucket MetService palette as
    * a first-match-wins when-ladder.
    */
  val q22 = GraftQuery(
    "q22_dbz_recolor", "C17 R1",
    (s, d) => {
      val pixel = Synthetic.k + (col("event_id") % 2).cast("int") * 128
      Tables.events(s, d)
        .withColumn("pixel", pixel)
        .withColumn("dbz", Codecs.dbzCol(col("pixel")).cast("long"))
        .withColumn("color", Codecs.dbzColorCol(col("dbz")))
        .groupBy(col("dbz"), col("color"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("dbz"))
    },
    Some {
      val dbz = Codecs.dbzSql(s"${Synthetic.kSql} + (event_id % 2) * 128")
      s"""SELECT $dbz AS dbz, ${Codecs.dbzColorSql(dbz)} AS color, COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY dbz"""
    })

  /** C19/A2: centroid of coordinate groups (exact decimal mean). */
  val q23 = GraftQuery(
    "q23_centroid", "C19 A2",
    (s, d) =>
      Synthetic.withGeo(Tables.events(s, d))
        .groupBy(col("event_type"))
        .agg(
          (sum(col("lat").cast("decimal(24,12)")).cast("double") / count(lit(1)))
            .as("centroid_lat"),
          (sum(col("lon").cast("decimal(24,12)")).cast("double") / count(lit(1)))
            .as("centroid_lon"),
          count(lit(1)).as("n"))
        .orderBy(col("event_type")),
    Some(s"""SELECT event_type,
        CAST(SUM(CAST(${Synthetic.latSql} AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*) AS centroid_lat,
        CAST(SUM(CAST(${Synthetic.lonSql} AS DECIMAL(24,12))) AS DOUBLE) / COUNT(*) AS centroid_lon,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** F2/C26: MMSI prefix-class decode + ITU MID validity (when-ladder +
    * literal in-list).
    */
  val q24 = GraftQuery(
    "q24_mmsi_classify", "F2 C26 F10 A5",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("mmsi", Synthetic.mmsi)
        .withColumn("category", Mmsi.classColumn(col("mmsi")))
        .groupBy(col("category"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("category")),
    Some(s"""SELECT ${Mmsi.classSql(Synthetic.mmsiSql)} AS category, COUNT(*) AS n
      FROM events GROUP BY 1 ORDER BY category"""))

  val all: Seq[GraftQuery] = Seq(q17, q18, q19, q20, q21, q22, q23, q24)
}
