package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions

/** String / date / JSON scalar-function queries (SURVEY §2.8).
  *
  * Covers the per-source parsing and formatting surface: regex extraction
  * (C1/C12), multi-format timestamp parsing (C2-C5), relative-time bucketing
  * (C7), string cleanup (C9/C11/C13), NFD diacritic normalization (C10),
  * and JSON dot-path extraction (the dynamic-properties data model, §1.1.3).
  */
object Scalar {

  /** C1/C12/C25: regex extraction — first token, digit runs, embedded count
    * pattern (the `(\d+)\s+customers?` extractor).
    */
  val q25 = GraftQuery(
    "q25_regex_extract", "C1 C8 C12 C25 S4",
    (s, d) =>
      Tables.documents(s, d)
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "^([a-z]+)", 1).as("first_word"),
          regexp_extract(col("source"), "([0-9]+)", 1).cast("int").as("src_num"),
          (size(split(col("text"), " dup", -1)) - 1).cast("long").as("dup_count"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id,
        regexp_extract(text, '^([a-z]+)', 1) AS first_word,
        CAST(regexp_extract(source, '([0-9]+)', 1) AS INT) AS src_num,
        len(string_split(text, ' dup')) - 1 AS dup_count
      FROM documents ORDER BY doc_id"""))

  /** C9/C11/C13: trim/upper/lower/replace + the `"< 5" → 5` coercion and
    * control-char log sanitization.
    */
  val q26 = GraftQuery(
    "q26_string_cleanup", "C9 C11 C13 C22",
    (s, d) => {
      // no fence: the few duplicated k references sit outside conditional
      // branches, so codegen subexpression elimination already parses once —
      // a row-serde fence costs more than it saves here (measured).
      // SORT FIRST, PROJECT AFTER: a trailing orderBy's range exchange
      // samples its child, so a projection UNDER the sort executes twice
      // (sampling pass + real pass — measured 1.2s vs 0.5s on this query).
      // Sorting the narrow scan and projecting above the Sort runs the
      // string work once; Catalyst has no rule that re-collapses a Project
      // below a Sort, and project/filter preserve the sorted order.
      Tables.events(s, d)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
        .withColumn("raw", when(col("k") < 5, lit("< 5")).otherwise(col("k").cast("string")))
        .select(
          col("event_id"),
          upper(col("event_type")).as("upper_type"),
          trim(concat(lit("  "), col("event_type"), lit(" "))).as("trimmed"),
          regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"),
          when(col("raw") === "< 5", 5).otherwise(col("raw").cast("int")).as("parsed_count"))
    },
    Some(s"""SELECT event_id,
        upper(event_type) AS upper_type,
        trim('  ' || event_type || ' ') AS trimmed,
        regexp_replace(event_type, '[aeiou]', '_', 'g') AS devoweled,
        CASE WHEN (CASE WHEN ${Synthetic.kSql} < 5 THEN '< 5' ELSE CAST(${Synthetic.kSql} AS VARCHAR) END) = '< 5'
             THEN 5 ELSE TRY_CAST(CAST(${Synthetic.kSql} AS VARCHAR) AS INT) END AS parsed_count
      FROM events ORDER BY event_id"""))

  /** C10: NFD diacritic strip + lowercase (locality key normalization,
    * `tlc-localities.js:281-284`). Spark side = the engine's NATIVE
    * Catalyst expression (graft.plans.NormalizeKeyExpression — codegen'd,
    * no UDF boundary), oracle = DuckDB strip_accents — independent
    * implementations agreeing on macron/umlaut forms.
    */
  val q27 = GraftQuery(
    "q27_normalize_key", "C10 J2",
    (s, d) =>
      Tables.documents(s, d)
        .withColumn("word",
          element_at(
            array(lit("Āwhitu"), lit("Ōtaki"), lit("Taupō"), lit("Whangārei"), lit("Pāpāmoa")),
            (col("doc_id") % 5 + 1).cast("int")))
        .select(col("doc_id"), col("word"),
          graft.plans.NormalizeKeyExpression.normalizeKey(col("word")).as("norm"))
        .orderBy(col("doc_id")),
    Some("""SELECT doc_id, word, lower(strip_accents(word)) AS norm FROM (
        SELECT doc_id, (['Āwhitu','Ōtaki','Taupō','Whangārei','Pāpāmoa'])[(doc_id % 5 + 1)] AS word
        FROM documents) ORDER BY doc_id"""))

  /** C4/C5: timestamp formatting + re-parsing round trip in the reference's
    * wire formats (`yyyyMMddHHmmss` and `yyyy-MM-dd HH:mm:ss 'UTC'`).
    */
  val q28 = GraftQuery(
    "q28_timestamp_formats", "C4 C5",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("ts_sec", timestamp_seconds(expr("ts div 1000000000")))
        .select(
          col("event_id"),
          date_format(col("ts_sec"), "yyyyMMddHHmmss").as("compact"),
          concat(date_format(col("ts_sec"), "yyyy-MM-dd HH:mm:ss"), lit(" UTC")).as("ais_format"),
          unix_timestamp(to_timestamp(date_format(col("ts_sec"), "yyyyMMddHHmmss"), "yyyyMMddHHmmss"))
            .as("reparsed_epoch"))
        .orderBy(col("event_id")),
    Some("""SELECT event_id,
        strftime(ts_sec, '%Y%m%d%H%M%S') AS compact,
        strftime(ts_sec, '%Y-%m-%d %H:%M:%S') || ' UTC' AS ais_format,
        CAST(epoch(strptime(strftime(ts_sec, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S')) AS BIGINT) AS reparsed_epoch
      FROM (SELECT event_id, to_timestamp(epoch_us(ts) // 1000000) AS ts_sec FROM events)
      ORDER BY event_id"""))

  /** C7: relative-time bucketing ladder (`just now`/`Nmin ago`/`Nh ago`/
    * `Nd ago`) against the corpus max event time.
    */
  val q29 = GraftQuery(
    "q29_relative_time", "C7 A6",
    (s, d) => {
      val e = Tables.events(s, d).withColumn("tsu", expr("ts div 1000"))
      val now = e.agg(max(col("tsu")).as("now"))
      e.crossJoin(broadcast(now))
        .withColumn("age_min", expr("(now - tsu) div 60000000"))
        .withColumn("bucket",
          when(col("age_min") < 1, lit("just now"))
            .when(col("age_min") < 60, concat(col("age_min"), lit("min ago")))
            .when(col("age_min") < 1440, concat(expr("age_min div 60"), lit("h ago")))
            .otherwise(concat(expr("age_min div 1440"), lit("d ago"))))
        .groupBy(col("bucket")).agg(count(lit(1)).as("n"))
        .orderBy(col("bucket"))
    },
    Some("""WITH t AS (
        SELECT (SELECT MAX(epoch_us(ts)) FROM events) - epoch_us(ts) AS age_us FROM events),
      b AS (SELECT age_us // 60000000 AS age_min FROM t)
      SELECT CASE WHEN age_min < 1 THEN 'just now'
                  WHEN age_min < 60 THEN CAST(age_min AS VARCHAR) || 'min ago'
                  WHEN age_min < 1440 THEN CAST(age_min // 60 AS VARCHAR) || 'h ago'
                  ELSE CAST(age_min // 1440 AS VARCHAR) || 'd ago' END AS bucket,
        COUNT(*) AS n
      FROM b GROUP BY 1 ORDER BY bucket"""))

  /** Dynamic-properties JSON dot-path extraction (data model §1.1.3): typed
    * get on present and MISSING paths (missing → null, never error).
    */
  val q30 = GraftQuery(
    "q30_json_path", "S2",
    (s, d) =>
      // sort-first: keep both JSON-path probes out of the sampling pass
      Tables.events(s, d)
        .select(col("event_id"), col("props"))
        .orderBy(col("event_id"))
        .select(
          col("event_id"),
          Synthetic.k.as("k"),
          get_json_object(col("props"), "$.missing.path").as("missing"))
        .withColumn("k_even", col("k") % 2 === 0),
    Some(s"""SELECT event_id, ${Synthetic.kSql} AS k,
        json_extract_string(props, '$$.missing.path') AS missing,
        (${Synthetic.kSql} % 2 = 0) AS k_even
      FROM events ORDER BY event_id"""))

  val all: Seq[GraftQuery] = Seq(q25, q26, q27, q28, q29, q30)
}
