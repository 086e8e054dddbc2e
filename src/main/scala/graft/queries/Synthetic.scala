package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic synthetic columns derived from `events` for the geo /
  * scalar operator queries.
  *
  * The driver tables carry no coordinates, so geo operators are exercised on
  * coordinates DERIVED from event fields with exact IEEE arithmetic (double
  * `%` is the exact fmod operation), computed identically in Spark and in
  * the DuckDB oracle — the derivation is part of each query's contract.
  * `value` ∈ [0.01, 490.02], `props.k` ∈ [0, 99], both non-negative, so
  * remainder signs never diverge.
  */
object Synthetic {
  /** lat ∈ [-48, -34): the NZ box. Spark `%` on doubles == DuckDB fmod. */
  val lat: Column = lit(-48.0) + (col("value") % 14.0)
  val latSql = "(-48.0 + fmod(value, 14.0))"

  /** lon ∈ [166, 179). */
  val lon: Column = lit(166.0) + ((col("value") * 1.7) % 13.0)
  val lonSql = "(166.0 + fmod(value * 1.7, 13.0))"

  /** props.k as int (JSON path extraction, S2/F12 plumbing). */
  val k: Column = get_json_object(col("props"), "$.k").cast("int")
  val kSql = "CAST(json_extract_string(props, '$.k') AS INT)"

  /** Pseudo-random 1-9 digit MMSI-like id. */
  val mmsi: Column = (col("event_id") * 7919) % 1000000000L
  val mmsiSql = "((event_id * 7919) % 1000000000)"

  /** NZTM2000-range easting/northing. */
  val easting: Column = lit(1200000.0) + col("value") * 800.0
  val eastingSql = "(1200000.0 + value * 800.0)"
  val northing: Column = lit(4700000.0) + col("value") * 2500.0 + k * 100.0
  val northingSql = s"(4700000.0 + value * 2500.0 + $kSql * 100.0)"

  def withGeo(e: DataFrame): DataFrame =
    e.withColumn("lat", lat).withColumn("lon", lon).withColumn("k", k)

  /** Optimizer fence: per-partition identity map over the row encoder.
    *
    * CollapseProject textually inlines any non-trivial expression into every
    * downstream reference — a `get_json_object` referenced by N output
    * columns parses the document N times per row, and an Exchange does NOT
    * stop the collapse (measured in round 2: 251 `from_json` copies in one
    * optimized plan). The encoder boundary is one row serialize/deserialize
    * the optimizer cannot cross: project the expensive columns ONCE, fence,
    * then branch freely. Keep the fenced projection narrow — every column
    * crossing the fence pays the encode.
    */
  def fence(df: DataFrame): DataFrame =
    df.mapPartitions(it => it)(org.apache.spark.sql.Encoders.row(df.schema))

  /** Codegen-resident fence ([[graft.plans.BarrierExpression]]): wrap the
    * expensive expression at its ONE production site; Catalyst never
    * duplicates a non-deterministic expression, so CollapseProject cannot
    * inline it into downstream references and filters cannot push below
    * the projection that produces it. Unlike [[fence]] this keeps the
    * whole pipeline inside whole-stage codegen (no row-encoder round
    * trip, no DeserializeToObject island) — prefer it for parse-once /
    * branch-freely plans; keep [[fence]] where a true execution-graph
    * barrier is required.
    */
  def barrier(c: Column): Column = call_function("graft_barrier", c)
}
