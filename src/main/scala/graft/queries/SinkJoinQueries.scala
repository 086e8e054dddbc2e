package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import OracleParity._

/** GeoJSON sink rendering, geometry array ops, and the remaining join
  * completions (SURVEY §2.2 K1/K2, §2.8 C19-C21, §2.4 J6/J10).
  */
object SinkJoinQueries {

  /** K2/K1: GeoJSON Feature rendering with MultiPolygon→Polygon explode
    * (`power-outages/server.js:343-416`, `tak-cot-proxy/index.mjs:405-430`).
    * Every 5th event is a 2-part multipolygon; each part becomes its own
    * Feature row. The oracle builds the identical JSON by string concat —
    * an independent rendering of `to_json`'s output contract.
    */
  val q48 = GraftQuery(
    "q48_geojson_sink", "K2 K1 U1 C19",
    (s, d) =>
      Synthetic.withGeo(Tables.events(s, d))
        .filter(col("event_id") % 20 === 0)
        .withColumn("part", explode(
          when(col("k") % 5 === 0, array(lit(0), lit(1))).otherwise(array(lit(0)))))
        .withColumn("lon0", round(col("lon") + col("part") * 0.1, 6))
        .withColumn("lat0", round(col("lat"), 6))
        .withColumn("lon1", round(col("lon0") + 0.01, 6))
        .withColumn("lat1", round(col("lat0") + 0.01, 6))
        .withColumn("feature", to_json(struct(
          lit("Feature").as("type"),
          col("event_id").as("id"),
          struct(
            lit("Polygon").as("type"),
            array(array(
              array(col("lon0"), col("lat0")),
              array(col("lon1"), col("lat0")),
              array(col("lon0"), col("lat1")),
              array(col("lon0"), col("lat0")))).as("coordinates")).as("geometry"),
          struct(col("value").as("v")).as("properties"))))
        .select(col("event_id"), col("part"), col("feature"))
        .orderBy(col("event_id"), col("part")),
    Some(s"""WITH g AS (
        SELECT event_id, value, ${Synthetic.kSql} AS k,
          ${Synthetic.latSql} AS lat, ${Synthetic.lonSql} AS lon
        FROM events WHERE event_id % 20 = 0),
      p AS (
        SELECT g.*, part FROM g, UNNEST(CASE WHEN k % 5 = 0 THEN [0, 1] ELSE [0] END) AS t(part)),
      c AS (
        SELECT event_id, part, value,
          round(lon + part * 0.1, 6) AS lon0, round(lat, 6) AS lat0,
          round(round(lon + part * 0.1, 6) + 0.01, 6) AS lon1,
          round(round(lat, 6) + 0.01, 6) AS lat1
        FROM p)
      SELECT event_id, part,
        '{"type":"Feature","id":' || event_id || ',"geometry":{"type":"Polygon","coordinates":[[['
          || lon0 || ',' || lat0 || '],[' || lon1 || ',' || lat0 || '],['
          || lon0 || ',' || lat1 || '],[' || lon0 || ',' || lat0
          || ']]]},"properties":{"v":' || value || '}}' AS feature
      FROM c ORDER BY event_id, part"""))

  /** C20/C21: line endpoints (incl. MultiLineString first-of-first /
    * last-of-last, `lambda/sitrep-generator/index.py:309-327`), midpoint,
    * and bbox via array HOFs (`display-proxy/index.html:1151-1188`).
    */
  val q49 = GraftQuery(
    "q49_geometry_array_ops", "C20 C21",
    (s, d) => {
      // Higher-order-function lambdas (transform / array_min) run
      // INTERPRETED per row. Vertex geometry is arithmetic on the vertex
      // index, so explode the index instead: per-vertex columns stay inside
      // whole-stage codegen and the per-feature reductions (endpoints, mid
      // vertex, bbox) become hash aggregates with map-side combine — one
      // shuffle on the feature key, no interpreted expression anywhere.
      val g = Synthetic.withGeo(Tables.events(s, d))
        .select(col("event_id"), col("lat"), col("lon"),
          (col("k") % 4 + 2).cast("int").as("n")) // 2..5 vertices
      val pts = g
        .select(col("event_id"), col("n"), col("lat"), col("lon"),
          explode(sequence(lit(0), col("n") - 1)).as("i"))
        .withColumn("px", round(col("lon") + col("i") * 0.01, 6))
        .withColumn("py", round(col("lat") + col("i") * 0.02, 6))
      // 1-based mid vertex: Spark double division + int truncation matches
      // the oracle's integer `n // 2 + 1` for the n ≥ 2 domain here
      val midIdx = (col("n") / 2 + 1).cast("int") - 1
      // No persist before the trailing orderBy: under AQE the aggregate's
      // exchange materializes as its own query stage, so the range
      // exchange's sampling pass re-executes only the narrow final-agg
      // stage over shuffled partials — measured 0.82 s vs 1.28 s WITH the
      // old lazy persist at sf0.1 (the columnar-cache serde cost more
      // than the recompute it saved; round 6's 6× double-execution that
      // motivated the persist predates AQE-on). Nothing here is
      // corpus-proportional driver or executor-memory state.
      val agg = (
        pts.groupBy(col("event_id"))
          .agg(
            max(when(col("i") === 0, col("px"))).as("start_lon"),
            max(when(col("i") === 0, col("py"))).as("start_lat"),
            max(when(col("i") === col("n") - 1, col("px"))).as("end_lon"),
            max(when(col("i") === col("n") - 1, col("py"))).as("end_lat"),
            max(when(col("i") === midIdx, col("px"))).as("mid_lon"),
            min(col("px")).as("bbox_min_lon"),
            max(col("px")).as("bbox_max_lon"),
            min(col("py")).as("bbox_min_lat"),
            max(col("py")).as("bbox_max_lat"))
          .select(col("event_id"),
            col("start_lon"), col("start_lat"), col("end_lon"), col("end_lat"),
            col("mid_lon"),
            col("bbox_min_lon"), col("bbox_max_lon"),
            col("bbox_min_lat"), col("bbox_max_lat"),
            // MultiLineString first-of-first == the line's own start; the
            // second line is the first shifted by +1.0 then re-rounded, so
            // its last-of-last lat derives from end_lat directly
            col("start_lon").as("mls_start_lon"),
            round(col("end_lat") + 1.0, 6).as("mls_end_lat")))
      agg.orderBy(col("event_id"))
    },
    Some(s"""WITH g AS (
        SELECT event_id, ${Synthetic.latSql} AS lat, ${Synthetic.lonSql} AS lon,
          (${Synthetic.kSql} % 4 + 2) AS n
        FROM events),
      c AS (
        SELECT event_id, n,
          list_transform(range(0, n), i ->
            [round(lon + i * 0.01, 6), round(lat + i * 0.02, 6)]) AS coords
        FROM g),
      m AS (
        SELECT *, list_transform(coords, p ->
            [round(p[1] + 1.0, 6), round(p[2] + 1.0, 6)]) AS line2
        FROM c)
      SELECT event_id,
        coords[1][1] AS start_lon, coords[1][2] AS start_lat,
        coords[-1][1] AS end_lon, coords[-1][2] AS end_lat,
        coords[n // 2 + 1][1] AS mid_lon,
        list_min(list_transform(coords, p -> p[1])) AS bbox_min_lon,
        list_max(list_transform(coords, p -> p[1])) AS bbox_max_lon,
        list_min(list_transform(coords, p -> p[2])) AS bbox_min_lat,
        list_max(list_transform(coords, p -> p[2])) AS bbox_max_lat,
        coords[1][1] AS mls_start_lon,
        line2[-1][2] AS mls_end_lat
      FROM m ORDER BY event_id"""))

  /** J6: boundary features ⟕ per-region stats with unmatched-row
    * classification (`power-outages/server.js:343-372`): matched → active
    * stats row; unmatched → `not-feasible` placeholder IF the region is in
    * the known set, else dropped.
    */
  private val NotFeasible = Seq("KENYA", "PERU", "JORDAN", "OMAN", "JAPAN")

  val q50 = GraftQuery(
    "q50_left_join_status", "J6 U4 A1",
    (s, d) => {
      val stats = Tables.customer(s, d)
        .filter(col("c_acctbal") > 9900)
        .groupBy(col("c_nationkey").as("nationkey"))
        .agg(count(lit(1)).as("cust_n"), dsum(col("c_acctbal")).as("total_bal"))
      Tables.nation(s, d)
        .join(stats, col("n_nationkey") === col("nationkey"), "left")
        .withColumn("status",
          when(col("cust_n").isNotNull, lit("active"))
            .when(col("n_name").isin(NotFeasible: _*), lit("not-feasible")))
        .filter(col("status").isNotNull)
        .select(col("n_name"), col("status"),
          coalesce(col("cust_n"), lit(0L)).as("cust_n"),
          coalesce(col("total_bal"), lit(0.0)).as("total_bal"))
        .orderBy(col("n_name"))
    },
    Some(s"""WITH stats AS (
        SELECT c_nationkey, COUNT(*) AS cust_n,
          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_bal
        FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey)
      SELECT n_name,
        CASE WHEN cust_n IS NOT NULL THEN 'active'
             WHEN n_name IN (${NotFeasible.map(n => s"'$n'").mkString(", ")}) THEN 'not-feasible'
        END AS status,
        COALESCE(cust_n, 0) AS cust_n, COALESCE(total_bal, 0.0) AS total_bal
      FROM nation LEFT JOIN stats ON n_nationkey = c_nationkey
      WHERE cust_n IS NOT NULL OR n_name IN (${NotFeasible.map(n => s"'$n'").mkString(", ")})
      ORDER BY n_name"""))

  /** J10/J2: associated-feature self-join — each point (click) finds the
    * FIRST polygon (view) in the same layer with a matching key
    * (`display-proxy/index.html:1190-1205`), with a J2-style default when
    * none matches.
    */
  val q51 = GraftQuery(
    "q51_self_join_association", "J10 J2",
    (s, d) => {
      val e = Tables.events(s, d).withColumn("k", Synthetic.k)
      val points = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("k"))
      val polys = e.filter(col("event_type") === "view")
        .groupBy(col("user_id").as("p_user"), col("k").as("p_k"))
        .agg(min(col("event_id")).as("poly_id")) // first match wins
      points
        .join(polys, col("user_id") === col("p_user") && col("k") === col("p_k"), "left")
        .select(col("event_id"), col("user_id"), col("k"),
          coalesce(col("poly_id"), lit(-1L)).as("assoc_poly"))
        .orderBy(col("event_id"))
    },
    Some(s"""WITH e AS (SELECT event_id, user_id, event_type, ${Synthetic.kSql} AS k FROM events),
      polys AS (SELECT user_id, k, MIN(event_id) AS poly_id
        FROM e WHERE event_type = 'view' GROUP BY user_id, k)
      SELECT p.event_id, p.user_id, p.k, COALESCE(polys.poly_id, -1) AS assoc_poly
      FROM (SELECT * FROM e WHERE event_type = 'click') p
      LEFT JOIN polys ON p.user_id = polys.user_id AND p.k = polys.k
      ORDER BY p.event_id"""))

  /** J3/J7: static-map lookups — town → region with a DEFAULT for unmapped
    * towns (`scrapers/powerco.js:7-53`: `?? 'Manawatu (Powerco)'`) and a
    * type-text → code map that yields NULL when unmapped
    * (`ais-proxy/server.js:1420-1428`: `?? null`). Both are broadcast
    * literal tables; the two differ precisely in their miss policy.
    */
  val q63 = GraftQuery(
    "q63_static_map_lookup", "J3 J7 J2",
    (s, d) => {
      import s.implicits._
      val townRegion = Seq(
        "town0" -> "Taranaki", "town1" -> "Whanganui", "town2" -> "Manawatu",
        "town3" -> "Wairarapa", "town4" -> "Horowhenua")
        .toDF("town", "region")
      val typeCode = Seq(
        "click" -> 60, "view" -> 70, "purchase" -> 80)
        .toDF("tt", "code")
      Tables.events(s, d)
        .withColumn("town", concat(lit("town"), col("user_id") % 8)) // 5..7 unmapped
        .join(broadcast(townRegion), Seq("town"), "left")
        .join(broadcast(typeCode), col("event_type") === col("tt"), "left")
        .select(col("event_id"), col("town"),
          coalesce(col("region"), lit("Manawatu (Powerco)")).as("region"), // J3 default
          col("code")) // J7: unmapped → null
        .orderBy(col("event_id"))
    },
    Some("""WITH tr AS (SELECT * FROM (VALUES
        ('town0','Taranaki'), ('town1','Whanganui'), ('town2','Manawatu'),
        ('town3','Wairarapa'), ('town4','Horowhenua')) AS t(town, region)),
      tc AS (SELECT * FROM (VALUES
        ('click', 60), ('view', 70), ('purchase', 80)) AS t(tt, code))
      SELECT event_id, 'town' || (user_id % 8) AS town,
        COALESCE(region, 'Manawatu (Powerco)') AS region, code
      FROM events
      LEFT JOIN tr ON tr.town = 'town' || (user_id % 8)
      LEFT JOIN tc ON tc.tt = event_type
      ORDER BY event_id"""))

  /** Distinct-count rollup: exact `count(DISTINCT)` per group plus the
    * global distinct-user count — the expand+shuffle pattern behind the
    * reference's per-client/per-vessel uniqueness metrics. (The
    * `approx_count_distinct` scale-out variant can't hash-match a foreign
    * engine; `SketchesSpec`-style coverage lives in the spec suite.)
    */
  val q65 = GraftQuery(
    "q65_distinct_rollup", "A7 A3",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("users"),
          count(lit(1)).as("events"))
        .orderBy(col("event_type")),
    Some("""SELECT event_type, COUNT(DISTINCT user_id) AS users, COUNT(*) AS events
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A5/A9 in their native pivot shape: per user-bucket counts with one
    * column per event type (explicit pivot values keep the schema
    * deterministic); the oracle writes the same thing as conditional-count
    * CASE sums — the two classic formulations of one histogram.
    */
  val q66 = GraftQuery(
    "q66_pivot_histogram", "A5 A9 A10",
    (s, d) => {
      val types = Seq("click", "view", "purchase", "signup", "error")
      Tables.events(s, d)
        .withColumn("bucket", col("user_id") % 10)
        .groupBy(col("bucket"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .na.fill(0L, types)
        .orderBy(col("bucket"))
    },
    Some("""SELECT user_id % 10 AS bucket,
        CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
      FROM events GROUP BY 1 ORDER BY bucket"""))

  val all: Seq[GraftQuery] = Seq(q48, q49, q50, q51, q63, q65, q66)
}
