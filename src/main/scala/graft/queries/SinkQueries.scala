package graft.queries

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.TextFunctions
import graft.sinks.{BucketedLayout, ShardWriter}

/** Oracle-gated READ-BACK queries for the flagship corpus sinks (K7
  * training-shard writer, K8 bucketed store) — the sink analog of the
  * source-scan queries (q43, q52-q56): the written layout is a
  * deterministic function of the test tables, so a DuckDB oracle can
  * recompute the expected inventory relationally and the driver's hash
  * gate proves the writer lost, duplicated, and misplaced NOTHING.
  * Reference analog: the MBTiles resume set is likewise gated by
  * re-deriving the expected keyed state from the inputs
  * (`scripts/download_nationalmap/create_nationalmap_mbtiles.py:92-106`,
  * gated via q06); these give the engine's own shipping sinks the same
  * treatment, upgrading K7/K8 from spec-only to CORRECTNESS-gated.
  */
object SinkQueries {

  private val NShards = 16
  private val RecordCap = 64L
  private val NBuckets = 8

  /** K7 layout staged once per sf dir (the Staging.once convention: the
    * write is setup for the timed/hashed READ path, and Bench pre-stages
    * it untimed via [[stageAll]]). Base write + incremental append so the
    * inventory gates BOTH ShardWriter entry points: rows with
    * doc_id % 5 != 0 land in the initial write, the % 5 == 0 slice is
    * appended as the nightly increment — membership must agree because
    * shard id is the same pure salted key hash on both paths.
    */
  private def stageShardLayout(s: SparkSession, d: String): String =
    Staging.once(d, "shard_layout_v1") { path =>
      val docs = Tables.documents(s, d).select(col("doc_id"), col("source"))
      ShardWriter.write(docs.filter(col("doc_id") % 5 =!= 0),
        "doc_id", NShards, path, maxRecordsPerFile = RecordCap)
      ShardWriter.append(docs.filter(col("doc_id") % 5 === 0),
        "doc_id", NShards, path, maxRecordsPerFile = RecordCap)
    }

  /** K7: shard-layout inventory read-back. Per shard directory: row
    * count, part-file count, and the key range — all recomputed by the
    * oracle from `documents` alone (shard membership is the salted
    * md5-prefix hash mod NShards; the file count is ceil(rows/cap) per
    * write because one task owns each shard value and the writer rolls
    * files at exactly `maxRecordsPerFile` rows). A lost row, a duplicated
    * append, a misplaced key, or a broken file-split contract each shows
    * up as a hash mismatch. At 100 TB: the read-back is one partition-
    * pruned scan + a map-side-combined aggregate keyed by the directory
    * key; `input_file_name` is evaluated per-row map-side (no extra
    * shuffle beyond the |shards|-row aggregate).
    */
  val q129 = GraftQuery(
    "q129_shard_inventory", "K7",
    (s, d) => {
      val path = stageShardLayout(s, d)
      s.read.parquet(path)
        // project the file name BEFORE the aggregate: Spark (correctly)
        // rejects non-deterministic expressions inside aggregate
        // arguments, but a projected column is just a value
        .withColumn("fname", input_file_name())
        .groupBy(col("shard").cast("long").as("shard"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("fname")).as("n_files"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"))
        .orderBy(col("shard"))
    },
    Some {
      val shard = s"${TextFunctions.md5FingerprintSql(
        "'shard:' || CAST(doc_id AS VARCHAR)")} % $NShards"
      s"""WITH s AS (SELECT doc_id, $shard AS shard,
            (doc_id % 5 <> 0) AS is_base
          FROM documents)
        SELECT shard, COUNT(*) AS n_rows,
          (COUNT(*) FILTER (WHERE is_base) + ${RecordCap - 1}) // $RecordCap
            + (COUNT(*) FILTER (WHERE NOT is_base) + ${RecordCap - 1})
              // $RecordCap AS n_files,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id
        FROM s GROUP BY 1 ORDER BY shard"""
    })

  /** Catalog-safe table suffix for the sf dir (bucket specs live in the
    * session catalog, so names must not collide across sf dirs within
    * one JVM).
    */
  private def sfTag(d: String): String =
    new java.io.File(d).getName.replaceAll("[^a-zA-Z0-9]", "_")

  /** K8: bucketed corpus-store round-trip. Writes the document store and
    * its fingerprint store bucketed by `doc_id` (the repeated join key),
    * reads both back THROUGH the catalog (a bare parquet read would drop
    * the bucket spec), joins them on the bucket key — zero-shuffle by
    * layout, proven on executed plans in BucketedLayoutSpec — and emits a
    * per-source profile the oracle recomputes straight from `documents`:
    * any row the store round-trip lost, duplicated, or mangled diverges
    * the counts / key ranges / fingerprint checksum. The write runs every
    * call (mode=overwrite, the store IS the operator under test); unlike
    * q129 the staged artifact is catalog state, which a fresh JVM cannot
    * reuse from disk alone. At 100 TB: the one-time write pays the single
    * hash exchange, every later probe (this query's join stands in for
    * the nightly ones) reads pre-partitioned, pre-sorted buckets.
    */
  val q130 = GraftQuery(
    "q130_bucketed_store", "K8",
    (s, d) => {
      val base = Staging.dir(d, "bucketed_store_v1")
      val docs = Tables.documents(s, d)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val fps = Tables.documents(s, d)
        .select(col("doc_id"),
          TextFunctions.md5Fingerprint(col("text")).as("fp"))
      val tag = sfTag(d)
      BucketedLayout.write(docs, s"graft_bl_docs_$tag", "doc_id", NBuckets,
        s"$base/docs")
      BucketedLayout.write(fps, s"graft_bl_fps_$tag", "doc_id", NBuckets,
        s"$base/fps")
      BucketedLayout.table(s, s"graft_bl_docs_$tag")
        .join(BucketedLayout.table(s, s"graft_bl_fps_$tag"), Seq("doc_id"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("fp") % lit(1000003L)).as("fp_mod_sum"))
        .orderBy(col("source"))
    },
    Some {
      val fp = TextFunctions.md5FingerprintSql("text")
      s"""SELECT source, COUNT(*) AS n_docs,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM($fp % 1000003) AS BIGINT) AS fp_mod_sum
        FROM documents GROUP BY 1 ORDER BY source"""
    })

  /** L77: columnar-interchange round-trip (ORC). A 100 TB training
    * pipeline rarely lives alone — corpus snapshots are exchanged with
    * engines whose native format is ORC, and "the export is faithful"
    * deserves the same read-back gate as the parquet sinks (q129/q130):
    * the export is staged once (Staging.once — the write is setup, the
    * gated operator is the round-trip), read back through Spark's ORC
    * scan, and reduced to a per-(source, lang) profile with counts,
    * char sums, and the established fingerprint checksum
    * (`sum(md5-prefix % 1000003)`); the oracle recomputes the profile
    * straight from the parquet `documents`, so any row the ORC
    * round-trip lost, duplicated, or mangled — or any value the
    * encoder/decoder perturbed — diverges the hash gate. At 100 TB:
    * one write + one columnar scan with pushdown, a map-side-combined
    * |sources×langs|-row aggregate; no shuffle beyond it.
    */
  val q145 = GraftQuery(
    "q145_orc_interchange", "L77 K7",
    (s, d) => {
      val path = Staging.once(d, "orc_interchange_v1") { p =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("lang"),
            col("n_chars"),
            TextFunctions.md5Fingerprint(col("text")).as("fp"))
          .write.mode("overwrite").orc(p)
      }
      s.read.orc(path)
        .groupBy(col("source"), col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("fp") % lit(1000003L)).as("fp_mod_sum"))
        .orderBy(col("source"), col("lang"))
    },
    Some {
      val fp = TextFunctions.md5FingerprintSql("text")
      s"""SELECT source, lang, COUNT(*) AS n_docs,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM($fp % 1000003) AS BIGINT) AS fp_mod_sum
        FROM documents GROUP BY 1, 2 ORDER BY source, lang"""
    })

  /** L80: JSONL interchange round-trip — the same read-back gate as the
    * ORC export (q145) for the format training-data pipelines actually
    * exchange most: newline-delimited JSON. The text column makes this a
    * REAL escaping test — every quote, backslash, control char and
    * non-ASCII byte must survive write-escape → parse-unescape exactly,
    * which the gate proves with a full-text portable-hash checksum (any
    * mangled byte moves `sum(h64(text) % 1000003)`), not just counts.
    * The read back uses the explicit schema (inference is a scan of its
    * own and can widen types). At 100 TB: one write + one line-splittable
    * scan, a map-side-combined |sources|-row aggregate.
    */
  val q148 = GraftQuery(
    "q148_jsonl_interchange", "L80 K7",
    (s, d) => {
      val path = Staging.once(d, "jsonl_interchange_v1") { p =>
        Tables.documents(s, d)
          .select(col("doc_id"), col("text"), col("lang"), col("source"),
            col("n_chars"))
          .write.mode("overwrite").json(p)
      }
      s.read.schema("doc_id LONG, text STRING, lang STRING, " +
        "source STRING, n_chars LONG").json(path)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          min(col("doc_id")).as("min_id"),
          max(col("doc_id")).as("max_id"),
          sum(col("n_chars")).as("sum_chars"),
          sum(graft.functions.Sketches.h64(col("text")) % lit(1000003L))
            .as("text_hash_sum"))
        .orderBy(col("source"))
    },
    Some {
      val h = graft.functions.Sketches.h64Sql("text")
      s"""SELECT source, COUNT(*) AS n_docs,
          MIN(doc_id) AS min_id, MAX(doc_id) AS max_id,
          CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
          CAST(SUM($h % 1000003) AS BIGINT) AS text_hash_sum
        FROM documents GROUP BY 1 ORDER BY source"""
    })

  /** K5 promoted from spec-only to oracle-gated (VERDICT r18 #6): the
    * full SitRep lifecycle — stale filter (F8) → deleted-quality drop
    * (F9) → context projection (P5) → per-report LLM summarization (the
    * deterministic stub, SitRepSpec's contract) → brace-balanced JSON
    * extraction (C25) → the K5 JSON SINK — with the sink's artifact READ
    * BACK and its inventory oracled relationally (the q129/q130
    * read-back stance). The oracle recomputes, from `events` alone, each
    * report key's surviving feature count AND the md5 of the exact
    * summary-JSON string the stub must have produced — a row the write
    * or read-back lost, duplicated, or mangled (one byte of the JSON)
    * diverges the hash. The write runs every call (mode=overwrite — the
    * store IS the operator under test, the q130/q234 stance). Features
    * derive deterministically from events: report key = event_id % 64,
    * stale horizon and quality flags are pure event_id arithmetic, so
    * the same semantics hold at every SF. At 100 TB: one filtered scan →
    * a per-report-key aggregate (map-side combined) → one summarizer
    * call per report (|reports| ≪ corpus — the LLM stage is per-GROUP,
    * not per-row) → a |reports|-row JSON write; the read-back inventory
    * is a |reports|-row scan.
    */
  val q236 = GraftQuery(
    "q236_sitrep_json_store", "K5 P5 C25 F8 F9",
    (s, d) => {
      val features = Tables.events(s, d).select(
        concat(lit("EV"), lpad((col("event_id") % 64).cast("string"),
          2, "0")).as("callsign"),
        expr("ts div 1000000000").as("time_sec"),
        to_json(struct(col("event_type").as("type"),
          when(col("event_id") % 17 === 0, lit("deleted"))
            .otherwise(lit("ok")).as("quality"))).as("metadata"),
        when(col("event_id") % 7 === 0, lit(null).cast("long"))
          .otherwise(lit(1000L) + col("event_id") % 2000).as("stale_sec"))
      val context = graft.sitrep.SitRep.buildContext(features, nowSec = 2000L)
      val reports = graft.sitrep.SitRep.summarizeReports(
        context, "callsign", graft.sitrep.SitRep.StubSummarizer)
        .toDF("report_key", "summary")
      val path = Staging.dir(d, "sitrep_json_v1")
      reports.write.mode("overwrite").json(path)
      s.read.schema("report_key STRING, summary STRING").json(path)
        .select(col("report_key"),
          get_json_object(col("summary"), "$.n_features").cast("long")
            .as("n_features"),
          md5(col("summary")).as("summary_md5"))
        .orderBy(col("report_key"))
    },
    Some {
      // the reconstructed summary string must match the stub's output
      // byte for byte — the C25 extraction hands exactly the brace-
      // balanced object to the sink
      s"""WITH f AS (SELECT
            'EV' || lpad(CAST(event_id % 64 AS VARCHAR), 2, '0')
              AS report_key
          FROM events
          WHERE (event_id % 7 = 0 OR 1000 + event_id % 2000 > 2000)
            AND event_id % 17 <> 0),
        g AS (SELECT report_key, CAST(COUNT(*) AS BIGINT) AS n_features
          FROM f GROUP BY 1)
        SELECT report_key, n_features,
          md5('{"summary": "auto", "n_features": '
            || CAST(n_features AS VARCHAR) || ', "confidence": 0.9}')
            AS summary_md5
        FROM g ORDER BY report_key"""
    })

  /** Untimed pre-stage hook for Bench's warmup (q129's layout and the
    * q145/q148 interchange exports; q130 rebuilds its store every call
    * by design, as does q236's sitrep sink). Constructing the
    * interchange frames runs their Staging.once writes if absent.
    */
  def stageAll(s: SparkSession, d: String): Unit = {
    stageShardLayout(s, d)
    q145.run(s, d)
    q148.run(s, d)
    ()
  }

  val all: Seq[GraftQuery] = Seq(q129, q130, q145, q148, q236)
}
