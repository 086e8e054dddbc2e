package graft.core

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** The events-loader contract: whatever physical type the driver writes
  * `events.ts` as — TIMESTAMP(NANOS) (read as epoch-nanos Long under
  * `nanosAsLong`) or TIMESTAMP(MICROS) (read as TimestampNTZ; the round-10
  * test-data regeneration) — `Tables.events` must normalize to `ts` =
  * epoch-nanos Long and `ts_us` = TimestampType with identical values.
  * The round-9 gate lost 51 of 91 queries to exactly this contract break.
  */
class TablesSpec extends SparkSpec {

  private def write(df: org.apache.spark.sql.DataFrame): String = {
    val dir = Files.createTempDirectory("tables-spec").toString
    df.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private val microsValues = Seq(
    (1L, 1700000000000000L, 7L, "a", 1.5, """{"k":"v"}"""),
    (2L, 1700000000123456L, 8L, "b", 2.5, "{}"))

  test("microsecond-timestamp events normalize to the epoch-nanos contract") {
    import spark.implicits._
    val dir = write(microsValues
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")).cast("timestamp_ntz")))
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === LongType)
    assert(out.schema("ts_us").dataType === TimestampType)
    val rows = out.select(col("event_id"), col("ts"),
        unix_micros(col("ts_us")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows === microsValues.map(v => (v._1, v._2 * 1000L, v._2)).sorted)
    // column order is part of the contract (downstream positional selects)
    assert(out.columns.toSeq === Seq(
      "event_id", "ts", "user_id", "event_type", "value", "props", "ts_us"))
  }

  test("long-nanos events keep the same contract") {
    import spark.implicits._
    val dir = write(microsValues
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts") * lit(1000L))) // epoch nanos as Long
    val out = Tables.events(spark, dir)
    assert(out.schema("ts").dataType === LongType)
    assert(out.schema("ts_us").dataType === TimestampType)
    val rows = out.select(col("event_id"), col("ts"),
        unix_micros(col("ts_us")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
    assert(rows === microsValues.map(v => (v._1, v._2 * 1000L, v._2)).sorted)
  }
}
