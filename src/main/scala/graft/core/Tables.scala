package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated synthetic tables (TESTDATA.md).
  *
  * The tables are a TPC-H-ish star schema plus an `events` stream table and
  * the LLM-pipeline tables `documents` / `embeddings`. All readers go through
  * here so scan-level concerns (nanosecond timestamps, column pruning) are
  * handled once.
  *
  * Scale note: these are plain parquet scans — predicate pushdown and column
  * pruning are preserved as long as callers `select`/`filter` on the returned
  * DataFrame before any wide transform.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** `events.ts` is parquet TIMESTAMP(NANOS) which Spark's TimestampType
    * (µs) cannot represent; `nanosAsLong` reads it as epoch-nanos Long.
    * We expose both the exact nanos (`ts`, Long) and a µs-truncated
    * TimestampType view (`ts_us`) for time arithmetic.
    */
  private def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // native engine expressions (idempotent; sessions built with
    // spark.sql.extensions=graft.plans.GraftExtensions get them for free)
    graft.plans.GraftExtensions.register(spark)
  }

  def apply(spark: SparkSession, dir: String, name: String): DataFrame = {
    configure(spark)
    spark.read.parquet(s"$dir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame     = apply(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame     = apply(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame   = apply(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame   = apply(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame       = apply(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame     = apply(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame   = apply(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame  = apply(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = apply(s, d, "embeddings")

  /** events with `ts` = epoch nanos (Long) and `ts_us` = TimestampType.
    *
    * The driver has generated `events.ts` as both parquet TIMESTAMP(NANOS)
    * (read as epoch-nanos Long under `nanosAsLong`) and TIMESTAMP(MICROS)
    * (read as TimestampNTZ). Normalize both to the engine contract —
    * `ts`: epoch-nanos Long, `ts_us`: TimestampType — so every downstream
    * query and the DuckDB oracle (`epoch_us(ts)`, type-generic) agree
    * regardless of the writer's physical precision.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = apply(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts_us", timestamp_micros(expr("ts div 1000")))
      case _ => // TIMESTAMP_NTZ (µs): the engine contract reads NTZ
        // wall-clock as a UTC instant (DuckDB's epoch_us makes the same
        // naive-is-UTC reading on its side). The NTZ→TimestampType cast
        // interprets the wall-clock in the SESSION timezone, so a non-UTC
        // session would silently shift every instant — fail loudly instead
        // (this is a library loader; in-repo entry points all set UTC).
        val tz = s.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"Tables.events reads TIMESTAMP_NTZ `ts` as UTC instants and " +
            s"requires spark.sql.session.timeZone=UTC (session has '$tz'); " +
            "set the session timezone to UTC before loading events")
        raw.withColumn("ts_us", col("ts").cast("timestamp"))
          .withColumn("ts", unix_micros(col("ts").cast("timestamp")) * lit(1000L))
    }
  }
}
