package graft.sitrep

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The SitRep lifecycle: paged fetch → filters → P5 projection → stub LLM →
  * C25 JSON extraction → JSON sink.
  */
class SitRepSpec extends SparkSpec {

  test("C25: balanced-brace extraction survives nesting, strings, and prose") {
    import SitRep.extractFirstJson
    assert(extractFirstJson("""noise {"a": {"b": 1}, "c": "}"} trailing""")
      === Some("""{"a": {"b": 1}, "c": "}"}"""))
    assert(extractFirstJson("""{"esc": "a\"}b", "x": 2} {"second": true}""")
      === Some("""{"esc": "a\"}b", "x": 2}"""))
    assert(extractFirstJson("no json here") === None)
    assert(extractFirstJson("{unterminated") === None)
  }

  test("end-to-end: filters, P5 projection, per-group summarize, JSON out") {
    import spark.implicits._
    val now = 1000L
    val features = Seq(
      // callsign, time, stale, metadata, layer
      ("A1", 10L, Some(2000L), """{"quality": "good"}""", "quakes"),
      ("A2", 20L, Some(500L), """{"quality": "good"}""", "quakes"), // stale → dropped
      ("A3", 30L, None, """{"quality": "deleted"}""", "quakes"), // deleted → dropped
      ("B1", 40L, None, """{"quality": "best"}""", "wx"),
      ("B2", 50L, Some(3000L), """{}""", "wx"))
      .toDF("callsign", "time_sec", "stale_sec", "metadata", "layer")

    val ctx = SitRep.buildContext(features, now)
    assert(ctx.columns.toSeq === Seq("callsign", "time", "metadata"), "P5 projection")
    // layer rides along for grouping in the full pipeline; re-attach it
    val withLayer = SitRep.buildContext(
      features.withColumnRenamed("layer", "report_layer")
        .withColumn("metadata", col("metadata")), now)
      .join(features.select(col("callsign"), col("layer")), "callsign")

    val out = SitRep.summarizeReports(withLayer, "layer", SitRep.StubSummarizer)
      .collect().toMap
    assert(out.keySet === Set("quakes", "wx"))
    // the stub's JSON must have been extracted from the prose
    assert(out("quakes").startsWith("{") && out("quakes").endsWith("}"))
    val nFeatures = Seq(out("wx")).toDF("j")
      .select(get_json_object(col("j"), "$.n_features")).as[String].head()
    assert(nFeatures != null && nFeatures.toInt >= 1)

    // K5: the sink shape — write the summaries as JSON objects
    val dir = java.nio.file.Files.createTempDirectory("sitrep").toString + "/out"
    SitRep.summarizeReports(withLayer, "layer", SitRep.StubSummarizer)
      .toDF("report", "summary").write.mode("overwrite").json(dir)
    assert(spark.read.json(dir).count() === 2)
  }

  test("q236 (K5 oracle promotion): sink round-trip replays in plain Scala") {
    val dir = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("q236_sitrep_json_store")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // independent replay: the surviving-feature count per report key and
    // the md5 of the EXACT summary string the stub emits, from raw
    // event ids alone (F8: null stale OR horizon > 2000; F9: not the
    // %17 deleted-quality slice)
    val ids = graft.core.Tables.events(spark, dir)
      .select("event_id").collect().map(_.getLong(0))
    val expect = ids
      .filter(id => (id % 7 == 0 || 1000 + id % 2000 > 2000) && id % 17 != 0)
      .groupBy(id => f"EV${id % 64}%02d")
      .map { case (k, xs) =>
        val json = s"""{"summary": "auto", "n_features": ${xs.length}, """ +
          s""""confidence": 0.9}"""
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(json.getBytes("UTF-8"))
          .map(b => f"$b%02x").mkString
        (k, xs.length.toLong, md5)
      }.toSeq.sortBy(_._1)
    assert(got.toSeq === expect)
  }
}
