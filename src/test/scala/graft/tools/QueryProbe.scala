package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc perf probe (test scope, not part of the library): times one
  * registered query and hand-built ablations of it, steady-state, to
  * localize where a regression lives. Run with
  * `sbt "Test/runMain graft.tools.QueryProbe q26_string_cleanup"`.
  */
object QueryProbe {
  def time(label: String, n: Int)(f: => DataFrame): Unit = {
    (1 to n).foreach { i =>
      val t0 = System.nanoTime()
      f.write.format("noop").mode("overwrite").save()
      println(f"[probe] $label%-40s run$i ${(System.nanoTime() - t0) / 1e9}%6.2fs")
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val name = args.headOption.getOrElse("q26_string_cleanup")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.core.Tables
    import graft.queries.Synthetic

    time("full " + name, 3)(graft.SparkEntry.queries(name)(spark, sfDir))

    if (name == "q26_string_cleanup") {
      val base = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
        .withColumn("raw", when(col("k") < 5, lit("< 5")).otherwise(col("k").cast("string")))
        .select(
          col("event_id"),
          upper(col("event_type")).as("upper_type"),
          trim(concat(lit("  "), col("event_type"), lit(" "))).as("trimmed"),
          regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"),
          when(col("raw") === "< 5", 5).otherwise(col("raw").cast("int")).as("parsed_count"))
      time("no orderBy", 3)(base)
      time("orderBy, no regexp", 3) {
        Tables.events(spark, sfDir)
          .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
          .withColumn("raw", when(col("k") < 5, lit("< 5")).otherwise(col("k").cast("string")))
          .select(col("event_id"),
            upper(col("event_type")).as("upper_type"),
            when(col("raw") === "< 5", 5).otherwise(col("raw").cast("int")).as("parsed_count"))
          .orderBy(col("event_id"))
      }
      time("orderBy, no k/raw", 3) {
        Tables.events(spark, sfDir)
          .select(col("event_id"),
            upper(col("event_type")).as("upper_type"),
            trim(concat(lit("  "), col("event_type"), lit(" "))).as("trimmed"),
            regexp_replace(col("event_type"), "[aeiou]", "_").as("devoweled"))
          .orderBy(col("event_id"))
      }
      time("scan+sort only", 3) {
        Tables.events(spark, sfDir).select(col("event_id")).orderBy(col("event_id"))
      }
      val sortFirst = Tables.events(spark, sfDir)
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
      sortFirst.explain("formatted")
      time("sort-first, project-after", 3)(sortFirst)
    }
    spark.stop()
  }
}
