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
    // a solo run must not depend on an earlier query having registered the
    // native functions via Tables (q64 analyzes a call_function eagerly)
    graft.plans.GraftExtensions.register(spark)
    import graft.core.Tables
    import graft.queries.Synthetic

    time("full " + name, 3)(graft.SparkEntry.queries(name)(spark, sfDir))

    if (name == "q62_property_cleaning") {
      import org.apache.spark.sql.types.{MapType, StringType}
      val e = Tables.events(spark, sfDir)
        .select(col("event_id"), col("event_type"), col("props"))
        .orderBy(col("event_id"))
        .select(col("event_id"), col("event_type"), Synthetic.k.as("k"))
        .withColumn("props_json", concat(
          lit("{\"speed\":"), col("k"),
          lit(",\"label\":\""), col("event_type"),
          lit("\",\"nested\":{\"x\":1},\"callsign\":\""),
          when(col("k") % 4 === 0, lit("UNKNOWN")).otherwise(concat(lit("CS"), col("k"))),
          lit("\",\"metadata\":{"),
          when(col("k") % 8 === 0, concat(lit("\"flight\":\"FL"), col("k"), lit("\","))).otherwise(lit("")),
          when(col("k") % 6 === 0, lit("\"quality\":\"deleted\",")).otherwise(lit("")),
          lit("\"r\":\"R"), col("k"), lit("\"}}")))
      val fenced = Synthetic.fence(e.select(col("event_id"),
          from_json(col("props_json"), MapType(StringType, StringType)).as("m")))
        .withColumn("mtxt", col("m")("metadata"))
      time("no kept_keys (no map_filter)", 3) {
        fenced.filter(coalesce(get_json_object(col("mtxt"), "$.quality") =!= "deleted", lit(true)))
          .select(col("event_id"),
            when(col("m")("callsign") === "UNKNOWN",
              coalesce(get_json_object(col("mtxt"), "$.flight"),
                get_json_object(col("mtxt"), "$.r")))
              .otherwise(col("m")("callsign")).as("callsign"))
      }
      time("no fence (inline parse)", 3) {
        e.select(col("event_id"),
            from_json(col("props_json"), MapType(StringType, StringType)).as("m"))
          .withColumn("mtxt", col("m")("metadata"))
          .filter(coalesce(get_json_object(col("mtxt"), "$.quality") =!= "deleted", lit(true)))
          .select(col("event_id"),
            concat_ws(",", array_sort(map_keys(map_filter(col("m"),
              (_, v) => !v.startsWith("{"))))).as("kept_keys"),
            when(col("m")("callsign") === "UNKNOWN",
              coalesce(get_json_object(col("mtxt"), "$.flight"),
                get_json_object(col("mtxt"), "$.r")))
              .otherwise(col("m")("callsign")).as("callsign"))
      }
      time("persist barrier instead of fence", 3) {
        val cached = e.select(col("event_id"),
            from_json(col("props_json"), MapType(StringType, StringType)).as("m"))
          .persist()
        cached
          .withColumn("mtxt", col("m")("metadata"))
          .filter(coalesce(get_json_object(col("mtxt"), "$.quality") =!= "deleted", lit(true)))
          .select(col("event_id"),
            concat_ws(",", array_sort(map_keys(map_filter(col("m"),
              (_, v) => !v.startsWith("{"))))).as("kept_keys"),
            when(col("m")("callsign") === "UNKNOWN",
              coalesce(get_json_object(col("mtxt"), "$.flight"),
                get_json_object(col("mtxt"), "$.r")))
              .otherwise(col("m")("callsign")).as("callsign"))
      }
      time("explode+agg kept_keys", 3) {
        val kept = fenced.select(col("event_id"), explode(col("m")).as(Seq("mk", "mv")))
          .filter(!col("mv").startsWith("{"))
          .groupBy(col("event_id"))
          .agg(concat_ws(",", sort_array(collect_list(col("mk")))).as("kept_keys"))
        fenced.filter(coalesce(get_json_object(col("mtxt"), "$.quality") =!= "deleted", lit(true)))
          .select(col("event_id"),
            when(col("m")("callsign") === "UNKNOWN",
              coalesce(get_json_object(col("mtxt"), "$.flight"),
                get_json_object(col("mtxt"), "$.r")))
              .otherwise(col("m")("callsign")).as("callsign"))
          .join(kept, Seq("event_id"))
          .select(col("event_id"), col("kept_keys"), col("callsign"))
      }
    }
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
