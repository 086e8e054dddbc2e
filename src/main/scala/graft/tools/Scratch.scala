package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.queries.Synthetic
import graft.core.Tables

/** Throwaway perf probe (not part of the library surface). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    def time(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val base = Tables.events(spark, d)
      .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
      .withColumn("raw", when(col("k") < 5, lit("< 5")).otherwise(col("k").cast("string")))
    val proj = base.select(
      col("event_id"),
      upper(col("event_type")).as("upper_type"),
      trim(concat(lit("  "), col("event_type"), lit(" "))).as("trimmed"),
      regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"),
      when(col("raw") === "< 5", 5).otherwise(col("raw").cast("int")).as("parsed_count"))
    time("warm")(base.count())
    time("proj no order")(proj.write.format("noop").mode("overwrite").save())
    time("proj + order")(proj.orderBy(col("event_id"))
      .write.format("noop").mode("overwrite").save())
    time("proj + order 2nd")(proj.orderBy(col("event_id"))
      .write.format("noop").mode("overwrite").save())
    time("order only")(base.select("event_id", "event_type")
      .orderBy(col("event_id"))
      .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
