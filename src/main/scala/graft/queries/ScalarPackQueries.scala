package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.geo.GeoFunctions

/** The remaining scalar/predicate operators: null-safe active filter (F5),
  * NZ-locale time (C7), control-char sanitization (C13), buffered
  * point-near-polygon (F14), and dynamic-property cleaning (P4).
  */
object ScalarPackQueries {

  /** F5/C7/C13: the active-outage null-safe predicate (`power-outages/
    * server.js:83-87`: keep when start is NULL or ≤ now), the
    * Pacific/Auckland local-time view (`display-proxy/index.html:
    * 1083-1093`), and control-character log sanitization
    * (`ais-proxy/server.js:97-100`).
    */
  val q60 = GraftQuery(
    "q60_nullsafe_locale_sanitize", "F5 C7 C13",
    (s, d) => {
      // parse-once: k drives the null-start branch referenced by the filter,
      // the aggregate, and the projection — produced once behind the
      // codegen-resident barrier (no row-encoder island)
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("ts_us"),
          expr("ts div 1000000000").as("sec"),
          Synthetic.barrier(Synthetic.k).as("k"))
        // TBA-style null starts (C3's output shape feeding F5)
        .withColumn("start_sec",
          when(col("k") % 10 === 0, lit(null).cast("long")).otherwise(col("sec")))
        .withColumn("dirty",
          concat(col("event_type"), lit("line1\nline2\rx\ttab")))
      val horizon = e.agg(max(col("start_sec")).as("h"))
      e.crossJoin(broadcast(horizon))
        // F5: NULL start is ACTIVE (unparseable dates pass), future drops
        .filter(col("start_sec").isNull || col("start_sec") <= col("h") - 3600)
        .select(col("event_id"), col("start_sec"),
          // C7: event hour in NZ local time (IANA zone, covers NZDT/NZST)
          hour(from_utc_timestamp(col("ts_us"), "Pacific/Auckland"))
            .cast("long").as("nz_hour"),
          // C13: strip CR/LF/control chars before logging
          regexp_replace(col("dirty"), "[\\x00-\\x1f\\x7f]", "_").as("sanitized"))
        .orderBy(col("event_id"))
    },
    Some(s"""WITH e AS (
        SELECT event_id, ts, epoch_us(ts) // 1000000 AS sec, ${Synthetic.kSql} AS k,
          event_type || 'line1' || chr(10) || 'line2' || chr(13) || 'x' || chr(9) || 'tab' AS dirty
        FROM events),
      t AS (SELECT *, CASE WHEN k % 10 = 0 THEN NULL ELSE sec END AS start_sec FROM e)
      SELECT event_id, start_sec,
        EXTRACT(hour FROM (ts AT TIME ZONE 'UTC' AT TIME ZONE 'Pacific/Auckland')) AS nz_hour,
        regexp_replace(dirty, '[\\x00-\\x1f\\x7f]', '_', 'g') AS sanitized
      FROM t
      WHERE start_sec IS NULL OR start_sec <= (SELECT MAX(CASE WHEN k % 10 = 0 THEN NULL ELSE sec END) FROM t) - 3600
      ORDER BY event_id"""))

  /** F14: buffered point-near-polygon — inside OR within 0.05° (Euclidean)
    * of any vertex (`tools/generate-tlc-localities.js:26-37`). The oracle
    * computes the ray-cast via the independent half-plane form (convex
    * ring) and the buffer via explicit hypot.
    */
  private val ring = Seq( // convex, CCW, off-grid vertices (like q18)
    (170.0137, -44.0171), (174.0213, -43.9893), (175.0071, -40.0133),
    (172.5191, -37.5117), (169.0031, -40.9899))

  val q61 = GraftQuery(
    "q61_near_polygon", "F14 J1",
    (s, d) => {
      val buffered = Synthetic.withGeo(Tables.events(s, d))
        .withColumn("inside",
          GeoFunctions.pointInPolygonColumn(col("lon"), col("lat"), ring))
        .withColumn("near_vertex",
          ring.map { case (vx, vy) =>
            sqrt((lit(vx) - col("lon")) * (lit(vx) - col("lon")) +
              (lit(vy) - col("lat")) * (lit(vy) - col("lat"))) <= 0.5
          }.reduce(_ || _))
      buffered
        .groupBy(col("event_type"), (col("inside") || col("near_vertex")).as("near"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("event_type"), col("near"))
    },
    Some {
      val edges = ring.indices.map { i =>
        val (x0, y0) = ring(i)
        val (x1, y1) = ring((i + 1) % ring.length)
        s"((${x1 - x0}) * (${Synthetic.latSql} - ($y0)) - (${y1 - y0}) * (${Synthetic.lonSql} - ($x0)) > 0)"
      }
      val nearV = ring.map { case (vx, vy) =>
        s"sqrt((($vx) - ${Synthetic.lonSql}) * (($vx) - ${Synthetic.lonSql}) + " +
          s"(($vy) - ${Synthetic.latSql}) * (($vy) - ${Synthetic.latSql})) <= 0.5"
      }
      s"""SELECT event_type,
          ((${edges.mkString(" AND ")}) OR (${nearV.mkString(" OR ")})) AS near,
          COUNT(*) AS n
        FROM events GROUP BY 1, 2 ORDER BY event_type, near"""
    })

  /** P4: dynamic-property cleaning (`display-proxy/index.html:929-974`):
    * keep only scalar-valued properties from an open JSON object, and the
    * `UNKNOWN → metadata.flight → metadata.r` callsign fallback chain.
    */
  val q62 = GraftQuery(
    "q62_property_cleaning", "P4 F9",
    (s, d) => {
      // sort-first: the trailing orderBy's range exchange samples its
      // child, so sorting the narrow scan up front keeps the JSON build +
      // parse out of the sampling pass (they run once, above the Sort);
      // fence/filter/project all preserve the sorted order (see q26)
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
        // an open properties object: two scalars, one nested (must drop),
        // a callsign that is sometimes UNKNOWN, metadata fallbacks
        .withColumn("props_json", concat(
          lit("{\"speed\":"), col("k"),
          lit(",\"label\":\""), col("event_type"),
          lit("\",\"nested\":{\"x\":1},\"callsign\":\""),
          when(col("k") % 4 === 0, lit("UNKNOWN")).otherwise(concat(lit("CS"), col("k"))),
          lit("\",\"metadata\":{"),
          when(col("k") % 8 === 0, concat(lit("\"flight\":\"FL"), col("k"), lit("\","))).otherwise(lit("")),
          when(col("k") % 6 === 0, lit("\"quality\":\"deleted\",")).otherwise(lit("")),
          lit("\"r\":\"R"), col("k"), lit("\"}}")))
      // parse-once: ONE from_json to map<string,string> for the open
      // object. The metadata sub-object needs only three scalar paths, and
      // two of them sit inside the UNKNOWN-callsign branch — lazy
      // `get_json_object` over the (tiny) metadata text beats a second
      // full from_json struct parse of text the map already holds
      // (measured: the struct re-parse was the query's biggest cost).
      // The optimizer barrier here is a lazy persist, not the row-serde
      // fence: without A barrier the F9 filter (below the projection)
      // would have the whole parse chain pushed into it and re-parsed by
      // the final projection (measured 4.9-5.8 s); an InMemoryRelation
      // stops the collapse exactly like the fence but skips the per-row
      // map encode/decode — 0.9 s vs 1.8 s for the same pipeline. The
      // cached frame is (id, parsed map): narrow, and at 100 TB this is
      // the same "cache the parsed projection" shape as the LSH sig table
      // (for corpora too big to cache, swap back to Synthetic.fence —
      // streaming, no materialization).
      val meta = graft.core.CacheScope.tracked(
          e.select(col("event_id"),
            from_json(col("props_json"), org.apache.spark.sql.types.MapType(
              org.apache.spark.sql.types.StringType,
              org.apache.spark.sql.types.StringType)).as("m")))
        .withColumn("mtxt", col("m")("metadata"))
      meta
        // F9: drop deleted-quality features (index.py:252-263) — a filter
        // on a nested dynamic path, applied before any projection
        .filter(coalesce(
          get_json_object(col("mtxt"), "$.quality") =!= "deleted", lit(true)))
        .select(col("event_id"),
          // scalar-only cleaning: nested values re-serialize starting with
          // '{'; one map traversal total, as the native graft_scalar_keys
          // loop (the map_filter HOF form was CodegenFallback and
          // de-optimized this whole projection — see ScalarKeysExpression).
          // Keys are emitted SORTED — map iteration order is not a stable
          // contract
          call_function("graft_scalar_keys", col("m")).as("kept_keys"),
          when(col("m")("callsign") === "UNKNOWN",
            coalesce(get_json_object(col("mtxt"), "$.flight"),
              get_json_object(col("mtxt"), "$.r")))
            .otherwise(col("m")("callsign")).as("callsign"))
    },
    Some(s"""SELECT event_id,
        'callsign,label,speed' AS kept_keys,
        CASE WHEN k % 4 = 0 THEN
          (CASE WHEN k % 8 = 0 THEN 'FL' || k ELSE 'R' || k END)
        ELSE 'CS' || k END AS callsign
      FROM (SELECT event_id, ${Synthetic.kSql} AS k FROM events)
      WHERE k % 6 <> 0
      ORDER BY event_id"""))

  /** C22/J2: the icon-id rewrite (`display-proxy/index.html:958-971`:
    * `uuid/path/icon.png` → `uuid:path/icon`, plus `-colored-RRGGBB` when a
    * marker color rides along) and the FULL two-stage locality lookup
    * (`tlc-localities.js:275-315`): exact key match, else NFD-normalized
    * match (via the native graft_normalize_key expression on both sides),
    * else the default coordinates/region.
    */
  val q64 = GraftQuery(
    "q64_icon_locality_lookup", "C22 J2 C10",
    (s, d) => {
      import s.implicits._
      val norm = graft.plans.NormalizeKeyExpression.normalizeKey _
      // register the native functions before any frame that analyzes a
      // call_function eagerly (lutNorm below) — a standalone run of this
      // query must not depend on an earlier query's Tables call
      graft.plans.GraftExtensions.register(s)
      val lut = Seq(("Taupō", -38.7, "Waikato"), ("Ōtaki", -40.75, "Wellington"))
        .toDF("name", "lat", "region")
      val lutNorm = lut.select(norm(col("name")).as("nname"),
        col("lat").as("nlat"), col("region").as("nregion"))
      // sort-first (see q26/q62): the trailing orderBy's range exchange
      // samples its child, so sorting the narrow scan up front keeps the
      // k-parse + icon strings + both broadcast joins out of the
      // sampling pass; project/broadcast-join stream sides preserve
      // the sorted order
      // parse-once: k fans out into locality/icon/marker branches (~8
      // refs) — produced once behind the codegen-resident barrier
      val e = Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), Synthetic.barrier(Synthetic.k).as("k"))
        .withColumn("locality", element_at(
          array(lit("Taupō"), lit("Ōtaki"), lit("taupo"), lit("OTAKI"), lit("Nowhere")),
          (col("k") % 5 + 1).cast("int")))
        .withColumn("icon0",
          when(col("k") % 3 === 0, lit("simpleicon"))
            .otherwise(concat(lit("uuid"), col("k"), lit("/cot/icon"), col("k"), lit(".png"))))
        .withColumn("marker_color", when(col("k") % 4 === 0, lit("#ff00aa")))
      val rewritten = when(col("icon0").contains("/"),
          concat(substring_index(col("icon0"), "/", 1), lit(":"),
            regexp_replace(expr("substring(icon0, instr(icon0, '/') + 1)"), "\\.png$", "")))
        .otherwise(col("icon0"))
      e.withColumn("icon1", rewritten)
        .withColumn("icon",
          when(col("marker_color").isNotNull,
            concat(col("icon1"), lit("-colored-"),
              regexp_replace(col("marker_color"), "#", "")))
            .otherwise(col("icon1")))
        .join(broadcast(lut), col("locality") === col("name"), "left")
        .join(broadcast(lutNorm), norm(col("locality")) === col("nname"), "left")
        .select(col("event_id"), col("locality"), col("icon"),
          coalesce(col("lat"), col("nlat"), lit(-39.0)).as("loc_lat"), // DEFAULT_COORDS
          coalesce(col("region"), col("nregion"), lit("Central North Island"))
            .as("loc_region")) // DEFAULT_REGION
    },
    // construction-inverse: the oracle derives expectations from k alone
    Some(s"""WITH t AS (SELECT event_id, ${Synthetic.kSql} AS k FROM events),
      b AS (SELECT *,
          CASE WHEN k % 3 = 0 THEN 'simpleicon'
               ELSE 'uuid' || k || ':cot/icon' || k END AS base FROM t)
      SELECT event_id,
        (['Taupō','Ōtaki','taupo','OTAKI','Nowhere'])[(k % 5 + 1)] AS locality,
        CASE WHEN k % 4 = 0 THEN base || '-colored-ff00aa' ELSE base END AS icon,
        CASE k % 5 WHEN 0 THEN -38.7 WHEN 1 THEN -40.75 WHEN 2 THEN -38.7
                   WHEN 3 THEN -40.75 ELSE -39.0 END AS loc_lat,
        CASE k % 5 WHEN 0 THEN 'Waikato' WHEN 1 THEN 'Wellington' WHEN 2 THEN 'Waikato'
                   WHEN 3 THEN 'Wellington' ELSE 'Central North Island' END AS loc_region
      FROM b ORDER BY event_id"""))

  val all: Seq[GraftQuery] = Seq(q60, q61, q62, q64)
}
