package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core.Tables

/** File-based source scans under the correctness gate (SURVEY §2.1
  * S4/S5/S6/S7/S9/S10/S13).
  *
  * Each query reads a deterministic wire-format fixture derived from the
  * events table (CSV, JSON lines, a GeoJSON FeatureCollection document,
  * HTML-ish scrape text, paginated REST envelopes) through the real
  * `spark.read` path and processes it. The DuckDB oracle computes the
  * expected output directly from the event columns — the generator's
  * inverse — so the scan + parse + normalize path is hash-checked end to
  * end without the oracle ever seeing the files. Fixtures are staged once
  * per sf via [[Staging.once]] (generation is setup, not the operator).
  *
  * Scale notes: every read is a distributed file scan (the staged dir has
  * normal Spark partitioning); schema is pinned where a real pipeline would
  * pin it (CSV, the self-describing page envelope) and inferred where the
  * reference consumes unknown feeds (JSON REST).
  */
object SourceQueries {

  private def stageCsv(s: SparkSession, d: String): String =
    Staging.once(d, "icp_csv_v3") { path =>
      Tables.events(s, d)
        .select(col("event_type").as("region"),
          concat(lit("net"), col("user_id") % 4).as("network"),
          Synthetic.k.as("icp_total"))
        .write.mode("overwrite").option("header", "true").csv(path)
    }

  /** S9/A4: CSV scan — ICP-style `region,network,icp_total` rollup
    * (`power-outages/icp-data.js:25-41`): scan with an explicit schema,
    * aggregate region totals.
    */
  val q52 = GraftQuery(
    "q52_csv_scan_rollup", "S9 A4 A1",
    (s, d) => {
      val path = stageCsv(s, d)
      val schema = StructType(Seq(
        StructField("region", StringType), StructField("network", StringType),
        StructField("icp_total", IntegerType)))
      s.read.option("header", "true").schema(schema).csv(path)
        .groupBy(col("region"))
        .agg(sum(col("icp_total")).as("total_icp"), count(lit(1)).as("n"))
        .orderBy(col("region"))
    },
    Some(s"""SELECT event_type AS region, CAST(SUM(${Synthetic.kSql}) AS BIGINT) AS total_icp,
        COUNT(*) AS n
      FROM events GROUP BY event_type ORDER BY region"""))

  private def stageArcgisJson(s: SparkSession, d: String): String =
    Staging.once(d, "arcgis_json_v3") { path =>
      Synthetic.withGeo(Tables.events(s, d))
        .select(to_json(struct(
          struct(col("event_id").as("id"), col("event_type").as("region"),
            col("k").as("customers")).as("attributes"),
          struct(round(col("lon"), 6).as("x"), round(col("lat"), 6).as("y"))
            .as("geometry"))).as("value"))
        .write.mode("overwrite").text(path)
    }

  /** S6/S7: plain-JSON REST scan (ArcGIS-ish `attributes`/`geometry`
    * envelope, `scrapers/powerco.js:65-75`): scan with schema INFERENCE
    * (the reference consumes feeds it doesn't control), flatten, filter.
    */
  val q53 = GraftQuery(
    "q53_json_rest_scan", "S6 S7 P3",
    (s, d) => {
      val path = stageArcgisJson(s, d)
      s.read.json(path)
        .select(col("attributes.id").as("event_id"),
          col("attributes.region").as("region"),
          col("attributes.customers").as("customers"),
          col("geometry.x").as("lon"), col("geometry.y").as("lat"))
        .filter(col("customers") >= 50)
        .orderBy(col("event_id"))
    },
    Some(s"""SELECT event_id, event_type AS region,
        CAST(${Synthetic.kSql} AS BIGINT) AS customers,
        round(${Synthetic.lonSql}, 6) AS lon, round(${Synthetic.latSql}, 6) AS lat
      FROM events WHERE ${Synthetic.kSql} >= 50 ORDER BY event_id"""))

  private def stageGeojson(s: SparkSession, d: String): String =
    Staging.once(d, "boundaries_geojson_v3") { path =>
      Synthetic.withGeo(Tables.events(s, d))
        .filter(col("event_id") % 50 === 0)
        .orderBy(col("event_id"))
        .select(to_json(struct(
          lit("Feature").as("type"),
          struct(col("event_id").as("id"), col("event_type").as("kind")).as("properties"),
          struct(lit("Point").as("type"),
            array(round(col("lon"), 6), round(col("lat"), 6)).as("coordinates"))
            .as("geometry"))).as("f"))
        .agg(concat_ws(",", collect_list(col("f"))).as("joined"))
        .select(concat(lit("{\"type\":\"FeatureCollection\",\"features\":["),
          col("joined"), lit("]}")).as("value"))
        .coalesce(1).write.mode("overwrite").text(path)
    }

  /** S10: GeoJSON FeatureCollection scan — ONE multi-line JSON document
    * (`power-outages/region-mapper.js:10-16`), read with `multiLine`,
    * features exploded.
    */
  val q54 = GraftQuery(
    "q54_geojson_scan", "S10 K2",
    (s, d) => {
      val path = stageGeojson(s, d)
      s.read.option("multiLine", "true").json(path)
        .select(explode(col("features")).as("f"))
        .select(col("f.properties.id").as("id"), col("f.properties.kind").as("kind"),
          element_at(col("f.geometry.coordinates"), 1).as("lon"),
          element_at(col("f.geometry.coordinates"), 2).as("lat"))
        .orderBy(col("id"))
    },
    Some(s"""SELECT event_id AS id, event_type AS kind,
        round(${Synthetic.lonSql}, 6) AS lon, round(${Synthetic.latSql}, 6) AS lat
      FROM events WHERE event_id % 50 = 0 ORDER BY id"""))

  private def stageHtml(s: SparkSession, d: String): String =
    Staging.once(d, "outage_html_v3") { path =>
      Tables.events(s, d).withColumn("k", Synthetic.k)
        .withColumn("status",
          when(col("k") % 3 === 0, lit("status-planned")).otherwise(lit("status-unplanned")))
        .withColumn("custText",
          when(col("k") < 5, lit("&lt; 5")).otherwise(concat(col("k"), lit(" customers"))))
        // every 9th event appears twice in the page (the seen-set dedup case)
        .withColumn("copies",
          when(col("k") % 9 === 0, array(lit(0), lit(1))).otherwise(array(lit(0))))
        .withColumn("copy", explode(col("copies")))
        .select(concat(
          lit("<div class=\"outage-item\" data-event-number=\"E"), col("event_id"),
          lit("\"><span class=\""), col("status"), lit("\">st</span><p class=\"cust\">"),
          col("custText"),
          lit("</p><script>window.allOutages = {\"n\": "), col("k"),
          lit("};</script></div>")).as("value"))
        .write.mode("overwrite").text(path)
    }

  /** S4/S5/F7/C11/C12/J9: HTML scrape — attribute extraction (the cheerio
    * `.attr(...)` path as regex), status-class filter, `"< 5"` coercion,
    * customer-count regex, seen-set dedup, plus the embedded
    * `window.allOutages = {...}` script blob (orion.js:6-18) recovered via
    * regex + from_json.
    */
  val q55 = GraftQuery(
    "q55_html_scrape", "S4 S5 F7 C11 C12 J9 C1",
    (s, d) => {
      val path = stageHtml(s, d)
      val html = s.read.text(path)
        .withColumn("outage_id", regexp_extract(col("value"), "data-event-number=\"(E[0-9]+)\"", 1))
        .withColumn("status", regexp_extract(col("value"), "<span class=\"(status-[a-z]+)\"", 1))
        .withColumn("custRaw", regexp_extract(col("value"), "<p class=\"cust\">(.*?)</p>", 1))
        .withColumn("blob", regexp_extract(col("value"), "window\\.allOutages = (\\{.*?\\});", 1))
        .filter(col("status") === "status-unplanned") // F7 (aurora.js:39-41)
        .dropDuplicates("outage_id") // J9 seen set (aurora.js:18-26)
        .withColumn("customers",
          when(col("custRaw") === "&lt; 5", 5) // C11 "< 5" → 5
            .otherwise(regexp_extract(col("custRaw"), "([0-9]+)\\s+customers", 1).cast("int")))
        .withColumn("script_n",
          get_json_object(col("blob"), "$.n").cast("int")) // S4 embedded JSON
      html.select(col("outage_id"), col("customers"), col("script_n"))
        .orderBy(col("outage_id"))
    },
    Some(s"""SELECT 'E' || event_id AS outage_id,
        CASE WHEN ${Synthetic.kSql} < 5 THEN 5 ELSE ${Synthetic.kSql} END AS customers,
        ${Synthetic.kSql} AS script_n
      FROM events WHERE ${Synthetic.kSql} % 3 <> 0
      ORDER BY outage_id"""))

  private def stagePaged(s: SparkSession, d: String): String =
    Staging.once(d, "paged_json_v3") { path =>
      val pageSize = 500
      Tables.events(s, d)
        .withColumn("page", expr(s"event_id div $pageSize"))
        .groupBy(col("page"))
        .agg(collect_list(struct(col("event_id").as("id"),
          col("event_type").as("type"), Synthetic.k.as("k"))).as("raw"),
          count(lit(1)).as("n"))
        // deterministic item order inside each page envelope
        .withColumn("items", array_sort(col("raw")))
        .select(to_json(struct(col("page"), col("items"), col("n").as("total"))).as("value"))
        .write.mode("overwrite").text(path)
    }

  /** The page envelope is self-describing (`{items, total, page}` is the
    * reference's own contract, `tak-cot-proxy/index.mjs:359-403`), so the
    * reader PINS it — no inference double-pass over the data.
    */
  private val pagedSchema = StructType(Seq(
    StructField("page", LongType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("id", LongType),
      StructField("type", StringType),
      StructField("k", LongType))))),
    StructField("total", LongType)))

  /** S13: paginated REST scan — numbered page envelopes
    * (`tak-cot-proxy/index.mjs:359-403`: `{items: [...], total, page}`),
    * scanned partition-per-page, empty pages dropped (the early-exit
    * condition expressed as data, `:400-402`).
    */
  val q56 = GraftQuery(
    "q56_paginated_scan", "S13 F8",
    (s, d) => {
      val path = stagePaged(s, d)
      s.read.schema(pagedSchema).json(path)
        .filter(size(col("items")) > 0) // early-exit-on-empty as a predicate
        .select(col("page"), explode(col("items")).as("it"))
        .select(col("it.id").as("event_id"), col("page"), col("it.type").as("event_type"),
          col("it.k").as("k"))
        .filter(col("k") % 4 =!= 0)
        .orderBy(col("event_id"))
    },
    Some(s"""SELECT event_id, event_id // 500 AS page, event_type,
        CAST(${Synthetic.kSql} AS BIGINT) AS k
      FROM events WHERE ${Synthetic.kSql} % 4 <> 0 ORDER BY event_id"""))

  /** One-envelope-per-file staging for the DSv2 reader: `page-<n>.json`,
    * written executor-side (local mode; fixture staging only — a cluster
    * fixture would land on shared storage).
    */
  private def stagePagedFiles(s: SparkSession, d: String): String =
    Staging.once(d, "paged_dsv2_v3") { path =>
      new java.io.File(path).mkdirs()
      val pageSize = 500
      Tables.events(s, d)
        .withColumn("page", expr(s"event_id div $pageSize"))
        .groupBy(col("page"))
        .agg(collect_list(struct(col("event_id").as("id"),
          col("event_type").as("type"), Synthetic.k.as("k"))).as("raw"),
          count(lit(1)).as("n"))
        .withColumn("items", array_sort(col("raw")))
        .select(col("page"), to_json(struct(col("page"), col("items"),
          col("n").as("total"))).as("value"))
        .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
          it.foreach { r =>
            val f = new java.io.File(path, s"page-${r.getLong(0)}.json")
            val w = new java.io.PrintWriter(f, "UTF-8")
            try w.write(r.getString(1)) finally w.close()
          }
        }
      new java.io.File(path, "_SUCCESS").createNewFile()
    }

  /** S13/S1 via a REAL Data Source V2 reader: `spark.read.format
    * ("graft-rest")` plans one input partition per page (parallel page
    * fetches), early-exits at the first missing page, and PUSHES the
    * type/k predicates into the source's subscription — the filter runs
    * "server-side" in the fetcher, not in the Spark plan (see
    * `sources/rest/RestDataSource.scala`; Dsv2RestSpec asserts the
    * pushdown and the partition-per-page plan shape).
    */
  val q68 = GraftQuery(
    "q68_paginated_dsv2", "S13 S1 F6",
    (s, d) => {
      val path = stagePagedFiles(s, d)
      s.read.format("graft-rest")
        .option("endpoint", s"file://$path/page-{page}.json")
        .load()
        .filter(col("type") === "click" && col("k") >= 10)
        .select(col("id").as("event_id"), col("page"), col("type").as("event_type"),
          col("k"))
        .orderBy(col("event_id"))
    },
    Some(s"""SELECT event_id, event_id // 500 AS page, event_type,
        CAST(${Synthetic.kSql} AS BIGINT) AS k
      FROM events WHERE event_type = 'click' AND ${Synthetic.kSql} >= 10
      ORDER BY event_id"""))

  /** J8 promoted from spec-only to oracle-gated (VERDICT r18 #6): the
    * rate-limited lookup's LEDGER ACCOUNTING as a relational query over
    * a fixture request log — the relational shadow of the imperative
    * loop RestPatternsSpec proves (`RestPatterns.rateLimitedLookup`;
    * reference behavior `scripts/find-missing-types.js:36-92`,
    * `docs/NAME_LOOKUP.md:17-37`). The log derives from events: vessel =
    * event_id % 311, lookup-eligible iff vessel % 3 == 0 (the missing-
    * type trigger), day = the event's epoch day. Per day the accounting
    * reproduces the reference contract exactly:
    *  - ≤ 1 lookup / vessel / day (the 24 h cache): the day's FIRST
    *    request per vessel is the lookup, the rest are cache skips;
    *  - 1 req / 2 s queue spacing: lookups schedule in (first-request
    *    time, vessel) order at 2 s offsets — span_sec is the day's queue
    *    drain time, (n_lookups − 1) · 2;
    *  - suggested-mapping aggregation: each lookup's type text maps to
    *    an AIS code (the C26 CASE ladder shape, vessel % 5 → code) and
    *    the day's suggestions aggregate to n_codes + the top code
    *    ((count desc, code asc) total order — the post-limit rank
    *    stance).
    * RestLedgerSpec replays the same log through the IMPERATIVE
    * rateLimitedLookup and asserts the relational accounting matches
    * call for call. At 100 TB: the aggregate is keyed by (day, vessel)
    * — bounded by fleet size × days, not event volume; the schedule
    * window partitions by day over ≤ |fleet| rows.
    */
  val q237 = GraftQuery(
    "q237_lookup_rate_ledger", "J8",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val req = Tables.events(s, d)
        .select((col("event_id") % 311).as("vessel"),
          expr("ts div 1000").as("tsu"))
        .filter(col("vessel") % 3 === 0)
        .withColumn("day", expr("tsu div 86400000000"))
      val firsts = req.groupBy(col("day"), col("vessel"))
        .agg(min(col("tsu")).as("first_tsu"), count(lit(1)).as("n_req"))
      val sched = firsts
        .withColumn("rk", row_number().over(Window.partitionBy(col("day"))
          .orderBy(col("first_tsu"), col("vessel"))))
        .withColumn("code", expr("CAST(CASE vessel % 5 " +
          "WHEN 0 THEN 30 WHEN 1 THEN 37 WHEN 2 THEN 52 " +
          "WHEN 3 THEN 60 ELSE 70 END AS BIGINT)"))
      val perDay = sched.groupBy(col("day"))
        .agg(sum(col("n_req")).as("n_requests"),
          count(lit(1)).as("n_lookups"),
          (sum(col("n_req")) - count(lit(1))).as("n_cache_skips"),
          max((col("rk") - 1) * 2).cast("long").as("span_sec"))
      val codes = sched.groupBy(col("day"), col("code"))
        .agg(count(lit(1)).as("n_suggest"))
      val top = codes
        .withColumn("rn", row_number().over(Window.partitionBy(col("day"))
          .orderBy(col("n_suggest").desc, col("code"))))
        .filter(col("rn") === 1)
        .select(col("day"), col("code").as("top_code"),
          col("n_suggest").as("top_code_n"))
      val nCodes = codes.groupBy(col("day"))
        .agg(count(lit(1)).as("n_codes"))
      perDay.join(nCodes, Seq("day")).join(top, Seq("day"))
        .select(col("day"), col("n_requests"), col("n_lookups"),
          col("n_cache_skips"), col("span_sec"), col("n_codes"),
          col("top_code"), col("top_code_n"))
        .orderBy(col("day"))
    },
    Some {
      s"""WITH req AS (SELECT event_id % 311 AS vessel, epoch_us(ts) AS tsu,
            epoch_us(ts) // 86400000000 AS day
          FROM events WHERE (event_id % 311) % 3 = 0),
        f AS (SELECT day, vessel, MIN(tsu) AS first_tsu,
            CAST(COUNT(*) AS BIGINT) AS n_req
          FROM req GROUP BY 1, 2),
        sch AS (SELECT *,
            row_number() OVER (PARTITION BY day
              ORDER BY first_tsu, vessel) AS rk,
            CAST(CASE vessel % 5 WHEN 0 THEN 30 WHEN 1 THEN 37
              WHEN 2 THEN 52 WHEN 3 THEN 60 ELSE 70 END AS BIGINT) AS code
          FROM f),
        pd AS (SELECT day, CAST(SUM(n_req) AS BIGINT) AS n_requests,
            CAST(COUNT(*) AS BIGINT) AS n_lookups,
            CAST(SUM(n_req) - COUNT(*) AS BIGINT) AS n_cache_skips,
            CAST(MAX((rk - 1) * 2) AS BIGINT) AS span_sec
          FROM sch GROUP BY 1),
        cd AS (SELECT day, code, CAST(COUNT(*) AS BIGINT) AS n_suggest
          FROM sch GROUP BY 1, 2),
        tp AS (SELECT day, code AS top_code, n_suggest AS top_code_n,
            row_number() OVER (PARTITION BY day
              ORDER BY n_suggest DESC, code) AS rn
          FROM cd),
        nc AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS n_codes
          FROM cd GROUP BY 1)
        SELECT pd.day, pd.n_requests, pd.n_lookups, pd.n_cache_skips,
          pd.span_sec, nc.n_codes, tp.top_code, tp.top_code_n
        FROM pd JOIN nc USING (day) JOIN tp USING (day)
        WHERE tp.rn = 1 ORDER BY pd.day"""
    })

  /** Untimed pre-stage hook for Bench's warmup. */
  def stageAll(s: SparkSession, d: String): Unit = {
    stageCsv(s, d); stageArcgisJson(s, d); stageGeojson(s, d)
    stageHtml(s, d); stagePaged(s, d); stagePagedFiles(s, d)
  }

  val all: Seq[GraftQuery] = Seq(q52, q53, q54, q55, q56, q68, q237)
}
