package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ingest.{Jsonais, Normalizers}

/** Ingestion-layer queries (SURVEY §2.1 S2, §2.3 P1-P3, §2.8 C2/C3/C6/C12).
  *
  * The driver tables carry no raw scraper payloads, so each query SYNTHESIZES
  * the source wire format from `events` columns (deterministically, in Spark),
  * runs the real parser/normalizer over the synthesized payload, and is
  * checked against a DuckDB oracle that computes the expected output DIRECTLY
  * from the event columns — the generator's inverse. The parser must recover
  * exactly what was encoded; the oracle never sees the string, so parser and
  * oracle cannot share a bug.
  */
object IngestQueries {

  /** Valid-range MMSI (and an invalid variant for drop-path coverage). */
  private val mmsi = lit(100000000L) + (col("event_id") * 7919) % 900000000L
  private val mmsiSql = "(100000000 + ((event_id * 7919) % 900000000))"

  /** Six-dialect wire payloads rendered per event (`event_id % 6` picks the
    * dialect) and staged once per sf — the synthesized feed is the fixture,
    * the canonicalizer is the operator.
    */
  private def stageJsonais(s: org.apache.spark.sql.SparkSession, d: String): String =
    Staging.once(d, "jsonais_payloads_v3") { path =>
      val e = Synthetic.withGeo(Tables.events(s, d))
        .withColumn("tss", timestamp_seconds(expr("ts div 1000000000")))
        .withColumn("m", when(Synthetic.k < 5 && col("event_id") % 6 === 1, lit("7"))
          .otherwise(mmsi.cast("string")))
      val rx = date_format(col("tss"), "yyyyMMddHHmmss")
      val iso = date_format(col("tss"), "yyyy-MM-dd'T'HH:mm:ss'Z'")
      def q(c: Column): Column = concat(lit("\""), c, lit("\""))
      val innerMsg = concat(
        lit("{\"mmsi\":"), q(col("m")), lit(",\"lat\":"), q(col("lat").cast("string")),
        lit(",\"lon\":"), q(col("lon").cast("string")), lit(",\"rxtime\":"), q(rx),
        lit(",\"course\":"), q(col("value").cast("string")),
        lit(",\"speed\":"), q(col("k").cast("string")), lit("}"))
      val badMsg = concat(
        lit("{\"mmsi\":\"7\",\"lat\":"), q(col("lat").cast("string")),
        lit(",\"lon\":"), q(col("lon").cast("string")), lit("}"))
      val payload = when(col("event_id") % 6 === 0,
          concat(lit("{\"msgs\":["), badMsg, lit(","), innerMsg, lit("]}")))
        .when(col("event_id") % 6 === 1,
          concat(lit("{\"mmsi\":"), q(col("m")), lit(",\"lat\":"), q(col("lat").cast("string")),
            lit(",\"lon\":"), q(col("lon").cast("string")), lit(",\"rxtime\":"), q(rx),
            lit(",\"course\":"), q(col("value").cast("string")),
            lit(",\"speed\":"), q(col("k").cast("string")), lit("}")))
        .when(col("event_id") % 6 === 2,
          concat(lit("{\"groups\":[{\"msgs\":["), innerMsg, lit("]}]}")))
        .when(col("event_id") % 6 === 3,
          concat(lit("{\"call\":"), q(col("m")), lit(",\"lat\":"), q(col("lat").cast("string")),
            lit(",\"lng\":"), q(col("lon").cast("string")), lit(",\"time\":"), q(iso),
            lit(",\"course\":"), q(col("value").cast("string")),
            lit(",\"speed\":"), q(col("k").cast("string")), lit("}")))
        .when(col("event_id") % 6 === 4,
          concat(lit("{\"MMSI\":"), q(col("m")), lit(",\"latitude\":"), q(col("lat").cast("string")),
            lit(",\"longitude\":"), q(col("lon").cast("string")), lit(",\"rxtime\":"), q(rx),
            lit(",\"course\":"), q(col("value").cast("string")),
            lit(",\"speed\":"), q(col("k").cast("string")), lit("}")))
        .otherwise( // dialect 5: truncated document — NOT valid JSON
          concat(lit("{\"protocol\":\"jsonaiscatcher\",\"msgs\":["), innerMsg,
            lit("],\"setting\":\"N/A")))
      e.select(col("event_id"), payload.as("payload"))
        .write.mode("overwrite").parquet(path)
    }

  /** S2: six-dialect jsonais canonicalization over the staged feed:
    *   0 AIS-catcher msgs[] (first element has an INVALID mmsi — the
    *     canonicalizer must take the second),
    *   1 minimal (rendered with an invalid mmsi when k < 5 — dropped),
    *   2 full JSONAIS groups[].msgs[],
    *   3 APRS (call/lat/lng + ISO time),
    *   4 direct (MMSI/latitude/longitude),
    *   5 TRUNCATED AIS-catcher document (invalid JSON → regex salvage, C25).
    */
  val q43 = GraftQuery(
    "q43_jsonais_canonicalize", "S2 C1 C4 C25 F3 U2",
    (s, d) => {
      val path = stageJsonais(s, d)
      // typed fast path (JsonaisSpec proves it row-equal to the Column
      // dispatch); only the key + payload enter the encoder boundary.
      // sort-first: sorting the raw feed keeps the double-schema parse out
      // of the range-sampling pass; the typed canonicalizer is a
      // per-partition map (row-dropping, order-preserving), so the output
      // stays sorted by event_id (see q26)
      Jsonais.canonicalizeTyped(
          s.read.parquet(path).orderBy(col("event_id")),
          col("payload"), "event_id")
    },
    // the generator's inverse: expected values straight from the columns
    Some(s"""SELECT event_id, $mmsiSql AS mmsi,
        ${Synthetic.latSql} AS lat, ${Synthetic.lonSql} AS lon,
        epoch_us(ts) // 1000000 AS ts_sec,
        value AS cog, CAST(${Synthetic.kSql} AS DOUBLE) AS sog
      FROM events
      WHERE NOT (event_id % 6 = 1 AND ${Synthetic.kSql} < 5)
      ORDER BY event_id"""))

  /** P3/C2/C3/F7: four scraper wire formats normalized to the common outage
    * schema — TLC named-month dates, MainPower dd/MM/yyyy with TBA, Orion
    * ISO + State filter, Powerco epoch millis.
    */
  val q44 = GraftQuery(
    "q44_scraper_normalize", "P3 C2 C3 C12 F7 U1",
    (s, d) => {
      val base = Tables.events(s, d)
        .withColumn("k", Synthetic.k)
        .withColumn("tss", timestamp_seconds(expr("ts div 1000000000")))
        .withColumn("shape", col("event_id") % 4)
      val tlc = base.filter(col("shape") === 0)
        .withColumn("dateStr", date_format(col("tss"), "EEEE, MMMM d, yyyy 'at' HH:mm"))
        .withColumn("desc", concat(col("k"), lit(" customers affected")))
        .select(col("event_id"), lit("TLC").as("utility"),
          Normalizers.extractCustomerCount(col("desc")).as("customers"),
          unix_timestamp(Normalizers.parseTlcDate(col("dateStr"))).as("start_sec"))
      val mainpower = base.filter(col("shape") === 1)
        .withColumn("dateStr", when(col("k") % 10 === 0, lit("TBA"))
          .otherwise(date_format(col("tss"), "dd/MM/yyyy HH:mm")))
        .select(col("event_id"), lit("MainPower NZ").as("utility"),
          col("k").as("customers"),
          unix_timestamp(Normalizers.parseMainpowerDate(col("dateStr"))).as("start_sec"))
      val orion = base.filter(col("shape") === 2)
        .withColumn("state", when(col("k") % 3 === 0, lit("CLOSED")).otherwise(lit("OPEN")))
        .filter(col("state") === "OPEN") // F7 (scrapers/orion.js:22)
        .select(col("event_id"), lit("Orion").as("utility"), col("k").as("customers"),
          unix_timestamp(to_timestamp(
            date_format(col("tss"), "yyyy-MM-dd'T'HH:mm:ss'Z'"))).as("start_sec"))
      val powerco = base.filter(col("shape") === 3)
        .withColumn("millis", expr("ts div 1000000"))
        .select(col("event_id"), lit("Powerco").as("utility"), col("k").as("customers"),
          unix_timestamp(timestamp_millis(col("millis"))).as("start_sec"))
      tlc.unionByName(mainpower).unionByName(orion).unionByName(powerco)
        .orderBy(col("event_id"))
    },
    Some(s"""WITH e AS (SELECT event_id, ${Synthetic.kSql} AS k, ts,
          epoch_us(ts) // 1000000 AS sec, event_id % 4 AS shape FROM events)
      SELECT event_id,
        CASE shape WHEN 0 THEN 'TLC' WHEN 1 THEN 'MainPower NZ'
                   WHEN 2 THEN 'Orion' ELSE 'Powerco' END AS utility,
        k AS customers,
        CASE shape
          WHEN 0 THEN sec // 60 * 60
          WHEN 1 THEN CASE WHEN k % 10 = 0 THEN NULL ELSE sec // 60 * 60 END
          ELSE sec END AS start_sec
      FROM e
      WHERE NOT (shape = 2 AND k % 3 = 0)
      ORDER BY event_id"""))

  /** C6/P1/P2: ETA zero-pad formatting plus the v1/v2 projection surfaces —
    * ''-coalesced name/callsign/destination, nested dimensions struct, and
    * the category tag.
    */
  val q45 = GraftQuery(
    "q45_eta_projections", "C6 P1 P2 F10",
    (s, d) => {
      // sort-first: narrow scan sorted before the wide string projection,
      // which then runs once above the Sort instead of twice (see q26)
      val e = Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .withColumn("k", Synthetic.k)
        .withColumn("mmsi", mmsi)
      val month = when(col("k") % 5 === 0, lit(null)).otherwise(col("k") % 12 + 1)
      val name = when(col("k") % 3 === 0, lit(null))
        .otherwise(concat(lit("V"), col("mmsi")))
      e.select(col("event_id"), col("mmsi"),
          Normalizers.etaFormat(month, col("k") % 28 + 1, col("k") % 24, col("k") % 60)
            .as("eta"),
          coalesce(name, lit("")).as("name"), // P1 `NAME || ''`
          to_json(struct((col("k") % 10).as("a"), (col("k") % 7).as("b"),
            (col("k") % 5).as("c"), (col("k") % 3).as("d"))).as("dims"),
          when(col("event_id") % 10 === 0, lit("navigation-aid"))
            .otherwise(lit("vessel")).as("category")) // P2 category (:800)
    },
    Some(s"""WITH e AS (SELECT event_id, ${Synthetic.kSql} AS k, $mmsiSql AS mmsi FROM events)
      SELECT event_id, mmsi,
        (CASE WHEN k % 5 = 0 THEN '00' ELSE lpad(CAST(k % 12 + 1 AS VARCHAR), 2, '0') END
          || '/' || lpad(CAST(k % 28 + 1 AS VARCHAR), 2, '0')
          || ' ' || lpad(CAST(k % 24 AS VARCHAR), 2, '0')
          || ':' || lpad(CAST(k % 60 AS VARCHAR), 2, '0')) AS eta,
        CASE WHEN k % 3 = 0 THEN '' ELSE 'V' || CAST(mmsi AS VARCHAR) END AS name,
        ('{"a":' || CAST(k % 10 AS VARCHAR) || ',"b":' || CAST(k % 7 AS VARCHAR)
          || ',"c":' || CAST(k % 5 AS VARCHAR) || ',"d":' || CAST(k % 3 AS VARCHAR) || '}') AS dims,
        CASE WHEN event_id % 10 = 0 THEN 'navigation-aid' ELSE 'vessel' END AS category
      FROM e ORDER BY event_id"""))

  /** Untimed pre-stage hook for Bench's warmup. */
  def stageAll(s: org.apache.spark.sql.SparkSession, d: String): Unit =
    stageJsonais(s, d)

  val all: Seq[GraftQuery] = Seq(q43, q44, q45)
}
