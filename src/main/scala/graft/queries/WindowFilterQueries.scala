package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables

/** Sliding-window rate counting, tile ancestor math, and the remaining
  * predicate operators (SURVEY §2.10 T6, §2.8 C24, §2.3 F4/F6/F11).
  */
object WindowFilterQueries {

  /** T6: SLIDING 60-second rate window (the reference's limiter counts a
    * 60 s window per request, `ais-proxy/server.js:193-208` — q12's
    * tumbling hour is the coarse analog; this is the faithful grid).
    * Spark's `window(ts, 60s, 30s)` assigns each event to two epoch-aligned
    * slides; the oracle derives the same two window starts per event with
    * integer math.
    */
  val q57 = GraftQuery(
    "q57_sliding_rate_window", "T6 A7",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(col("user_id"),
          window(col("ts_us"), "60 seconds", "30 seconds").as("w"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= 2)
        .select(col("user_id"), unix_millis(col("w.start")).as("win_ms"), col("n"))
        .orderBy(col("user_id"), col("win_ms")),
    Some("""WITH t AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      w AS (SELECT user_id,
          UNNEST([ (us // 30000000) * 30000000 - 30000000,
                   (us // 30000000) * 30000000 ]) AS start_us
        FROM t)
      SELECT user_id, start_us // 1000 AS win_ms, COUNT(*) AS n
      FROM w GROUP BY user_id, start_us HAVING COUNT(*) >= 2
      ORDER BY user_id, win_ms"""))

  /** C24/F16: tile ancestor/offset math for the crop-upscale path
    * (`weather-proxy/server.js:335-354`): `scale = 2^(z - maxZoom)`,
    * `ancestor = tile / scale`, `cropSize = 256 / scale`,
    * `offset = (tile % scale) * cropSize`, plus coordinate validation.
    */
  val q58 = GraftQuery(
    "q58_tile_ancestor_math", "C24 F16",
    (s, d) => {
      val maxZoom = 7
      // parse-once: k is produced behind the codegen-resident barrier
      // (Synthetic.barrier), so the ~10 downstream references cost integer
      // math, not repeated JSON parses — and the whole pipeline stays in
      // one whole-stage-codegen span (the old row-encoder fence left a
      // DeserializeToObject interpreted island here);
      // 2^z is an exact long shift (z ≤ 13), not double pow per reference
      // sort-first: the narrow scan is sorted before the k parse, so the
      // sampling pass never runs the JSON path (see q26)
      val e = Tables.events(s, d).select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), Synthetic.barrier(Synthetic.k).as("k"))
        .withColumn("z", (col("k") % 6 + 8).cast("int")) // 8..13
        .withColumn("p2z", expr("shiftleft(CAST(1 AS BIGINT), z)"))
        .withColumn("x", ((col("event_id") * 131) % col("p2z")).cast("long"))
        .withColumn("y", ((col("event_id") * 197) % col("p2z")).cast("long"))
        .withColumn("scale", expr(s"shiftleft(CAST(1 AS BIGINT), z - $maxZoom)"))
      e.select(col("event_id"), col("z"), col("x"), col("y"),
          (col("x") / col("scale")).cast("long").as("ancestor_x"),
          (col("y") / col("scale")).cast("long").as("ancestor_y"),
          (lit(256) / col("scale")).cast("long").as("crop_size"),
          ((col("x") % col("scale")) * (lit(256) / col("scale")).cast("long")).as("offset_x"),
          ((col("y") % col("scale")) * (lit(256) / col("scale")).cast("long")).as("offset_y"),
          (col("x") >= 0 && col("x") < col("p2z") &&
            col("y") >= 0 && col("y") < col("p2z")).as("valid"))
    },
    Some(s"""WITH t AS (
        SELECT event_id, (${Synthetic.kSql} % 6 + 8) AS z,
          (event_id * 131) % CAST(pow(2, (${Synthetic.kSql} % 6 + 8)) AS BIGINT) AS x,
          (event_id * 197) % CAST(pow(2, (${Synthetic.kSql} % 6 + 8)) AS BIGINT) AS y,
          CAST(pow(2, (${Synthetic.kSql} % 6 + 8) - 7) AS BIGINT) AS scale
        FROM events)
      SELECT event_id, z, x, y,
        x // scale AS ancestor_x, y // scale AS ancestor_y,
        256 // scale AS crop_size,
        (x % scale) * (256 // scale) AS offset_x,
        (y % scale) * (256 // scale) AS offset_y,
        (x >= 0 AND x < CAST(pow(2, z) AS BIGINT) AND
         y >= 0 AND y < CAST(pow(2, z) AS BIGINT)) AS valid
      FROM t ORDER BY event_id"""))

  /** F4/F6/F11: the remaining predicate pack — Valid-flag rejection
    * (null-or-true passes, `ais-proxy/server.js:433-436`), query-param
    * filters incl. case-insensitive substring over ANY area
    * (`power-outages/server.js:517-536`, the `exists(areas, …)` form) and
    * minCustomers, and the id-prefix filter (`tak-cot-proxy:412-417`).
    */
  val q59 = GraftQuery(
    "q59_filter_pack", "F4 F6 F11 F15",
    (s, d) => {
      // parse-once: k is referenced by three predicate branches + the
      // output — produced once behind the codegen-resident barrier.
      // sort-first: the narrow scan is sorted before the parse, so the
      // sampling pass never runs the JSON path or the filters (see q26)
      val e = Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), col("event_type"),
          Synthetic.barrier(Synthetic.k).as("k"))
        .withColumn("valid",
          when(col("k") % 7 === 0, lit(false))
            .when(col("k") % 5 === 0, lit(null).cast("boolean"))
            .otherwise(lit(true)))
        .withColumn("areas", array(col("event_type"),
          concat(upper(col("event_type")), lit(" DISTRICT"))))
      e.filter(col("valid").isNull || col("valid")) // F4: drop only explicit false
        // F6 substring-any-area as the native codegen'd loop — the
        // exists() lambda form is CodegenFallback and dropped the whole
        // corpus-wide Filter out of whole-stage codegen
        .filter(call_function("graft_any_contains", col("areas"), lit("ic")))
        .filter(col("k") >= 10) // F6 minCustomers
        .filter(col("event_type").startsWith("cl") || col("event_type").startsWith("v")) // F11
        .select(col("event_id"), col("event_type"), col("k"), col("valid"))
    },
    Some(s"""WITH t AS (
        SELECT event_id, event_type, ${Synthetic.kSql} AS k,
          CASE WHEN ${Synthetic.kSql} % 7 = 0 THEN FALSE
               WHEN ${Synthetic.kSql} % 5 = 0 THEN NULL ELSE TRUE END AS valid,
          [event_type, upper(event_type) || ' DISTRICT'] AS areas
        FROM events)
      SELECT event_id, event_type, k, valid FROM t
      WHERE (valid IS NULL OR valid)
        AND len(list_filter(areas, a -> contains(lower(a), 'ic'))) > 0
        AND k >= 10
        AND (starts_with(event_type, 'cl') OR starts_with(event_type, 'v'))
      ORDER BY event_id"""))

  val all: Seq[GraftQuery] = Seq(q57, q58, q59)
}
