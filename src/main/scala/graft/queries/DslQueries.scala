package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.dsl.{FilterDsl, TemplateDsl}

/** Filter-DSL and template-DSL queries (SURVEY F12, C23) — the two plan-time
  * compilers. The oracle SQL is hand-derived from the reference's semantics
  * (an independent encoding of the same truth table), so agreement checks
  * the compiler, not the formula.
  */
object DslQueries {

  /** Dot-path resolver over events: `props.*` → the PRE-PARSED `props_map`
    * column (parse-once, [[FilterDsl.mapResolver]] — each predicate branch
    * referencing a dynamic path probes the materialized map instead of
    * re-parsing the JSON document), bare names → real columns.
    */
  private def eventsResolver: String => Column = {
    val dynamic = FilterDsl.mapResolver(col("props_map"))
    path =>
      if (path.startsWith("props.")) dynamic(path.stripPrefix("props."))
      else if (path == "types") array(col("event_type"), lit("misc")) // synthetic array field
      else col(path)
  }

  /** events + `props_map` (the parse-once dynamic-metadata projection),
    * materialized behind the encoder fence so CollapseProject can't clone
    * the `from_json` into every path reference.
    */
  private def fencedEvents(s: org.apache.spark.sql.SparkSession, d: String,
      extra: Column*) =
    // sort-first: both consumers (q31/q32) emit rows ordered by event_id,
    // so the narrow scan is sorted BEFORE the from_json projection — the
    // range exchange samples only the raw scan, the parse runs once above
    // the Sort behind the codegen-resident barrier (Catalyst cannot inline
    // a non-deterministic expression into the DSL's many map lookups), and
    // the projection preserves the order (see q26)
    Tables.events(s, d)
      .select(col("event_id"), col("event_type"), col("value"), col("ts"),
        col("props"))
      .orderBy(col("event_id"))
      .select(Seq(col("event_id"), col("event_type"), col("value"), col("ts"),
        Synthetic.barrier(from_json(col("props"), org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType,
          org.apache.spark.sql.types.StringType))).as("props_map")) ++ extra: _*)

  /** Plan-time types: `value` is a real numeric column (strict equality),
    * `types` an array column (membership `$contains`).
    */
  private val eventsTypes = FilterDsl.PathTypes(Map(
    "value" -> FilterDsl.TNumeric, "types" -> FilterDsl.TArray))

  private val filterList = Seq(
    """props.k % 2 == 0 and value > 400""", // modulo + numeric AND
    """event_type in ["error", "signup"] and value < 50""", // in-list
    """$contains(event_type, "ck")""", // substring
    """props.missing != 5""", // MISSING FIELD: must match NOTHING (non-SQL 3VL)
    """props.absent == null""", // missing == null: matches everything
    """$contains(types, "click")""", // ARRAY membership, not substring
    """value == "100"""", // strict: number !== string → never
    """value != "100"""") // strict != on present numeric field → always

  /** F12: the full filter grammar compiled to one Column, OR across the
    * config list. Note `props.absent == null` makes every row match via the
    * last branch — so the interesting signal is `matched_by`, the per-branch
    * hit pattern.
    */
  val q31 = GraftQuery(
    "q31_filter_dsl", "F12 P4",
    (s, d) => {
      val branchCols = filterList.map(f =>
        FilterDsl.compile(Seq(f), eventsResolver, eventsTypes).cast("int"))
      fencedEvents(s, d)
        .withColumn("matched", FilterDsl.compile(filterList, eventsResolver, eventsTypes))
        .withColumn("matched_by", concat(branchCols: _*))
        .select(col("event_id"), col("matched"), col("matched_by"))
    },
    Some(s"""WITH t AS (SELECT event_id,
        CAST(json_extract_string(props, '$$.k') AS DOUBLE) AS k,
        (CAST(json_extract_string(props, '$$.k') AS DOUBLE) IS NOT NULL
          AND fmod(CAST(json_extract_string(props, '$$.k') AS DOUBLE), 2) = 0
          AND value > 400) AS b1,
        (event_type IN ('error', 'signup') AND value < 50) AS b2,
        contains(event_type, 'ck') AS b3,
        FALSE AS b4,
        TRUE AS b5,
        (event_type = 'click' OR 'misc' = 'click') AS b6,
        FALSE AS b7,
        (value IS NOT NULL) AS b8
      FROM events)
      SELECT event_id, (b1 OR b2 OR b3 OR b4 OR b5 OR b6 OR b7 OR b8) AS matched,
        CAST(b1 AS INT)::VARCHAR || CAST(b2 AS INT)::VARCHAR || CAST(b3 AS INT)::VARCHAR ||
        CAST(b4 AS INT)::VARCHAR || CAST(b5 AS INT)::VARCHAR || CAST(b6 AS INT)::VARCHAR ||
        CAST(b7 AS INT)::VARCHAR || CAST(b8 AS INT)::VARCHAR AS matched_by
      FROM t ORDER BY event_id"""))

  /** C23: template compiled to a concat tree exercising the FULL modifier
    * set — `upper`, `fixed:n`, `round`, `date` (NZ-local), `ago` (relative
    * to the corpus max), and a missing-path placeholder (renders '').
    */
  val q32 = GraftQuery(
    "q32_template_render", "C23 K1 C7",
    (s, d) => {
      // tstr crosses the fence too: the `ago` modifier's when-chain
      // references its parsed form ~6×, which would otherwise re-render
      // date_format per reference
      val e = fencedEvents(s, d, date_format(
        timestamp_seconds(expr("ts div 1000000000")), "yyyy-MM-dd'T'HH:mm:ss'Z'").as("tstr"))
      // the corpus max needs no parse/sort — aggregate the raw scan, not
      // the fenced frame
      val nowDf = Tables.events(s, d)
        .agg(max(expr("(ts div 1000000000) * 1000000")).as("now"))
      val resolve: String => Column = p =>
        if (p == "tstr") col("tstr") else eventsResolver(p)
      e.crossJoin(broadcast(nowDf))
        .withColumn("rendered", TemplateDsl.compile(
          "{{event_type|upper}} k={{props.k}} v={{value|fixed:1}} " +
            "r={{value|round}} d={{tstr|date}} a={{tstr|ago}} m=[{{props.missing}}]",
          resolve, col("now")))
        .select(col("event_id"), col("rendered"))
    },
    Some("""WITH t AS (SELECT event_id, event_type, value, props, ts,
          to_timestamp(epoch_us(ts) // 1000000) AS tsec,
          (SELECT MAX(epoch_us(ts) // 1000000) FROM events) - epoch_us(ts) // 1000000 AS age_sec
        FROM events),
      b AS (SELECT *, age_sec // 60 AS age_min FROM t)
      SELECT event_id,
        upper(event_type) || ' k=' || json_extract_string(props, '$.k') ||
        ' v=' || CAST(CAST(value AS DECIMAL(38,1)) AS VARCHAR) ||
        ' r=' || CAST(CAST(round(value, 0) AS BIGINT) AS VARCHAR) ||
        ' d=' || strftime(tsec AT TIME ZONE 'Pacific/Auckland', '%-d %b %Y, %H:%M') ||
        ' a=' || (CASE WHEN age_min < 1 THEN 'just now'
                       WHEN age_min < 60 THEN CAST(age_min AS VARCHAR) || 'min ago'
                       WHEN age_min < 1440 THEN CAST(age_min // 60 AS VARCHAR) || 'h ago'
                       ELSE CAST(age_min // 1440 AS VARCHAR) || 'd ago' END) ||
        ' m=[]' AS rendered
      FROM b ORDER BY event_id"""))

  val all: Seq[GraftQuery] = Seq(q31, q32)
}
