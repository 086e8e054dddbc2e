package graft.sources

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** S15 config scan: parse, TTL re-read, and the config→Column path. */
class ConfigSourceSpec extends SparkSpec {

  private val configJson =
    """{"layers": [
      {"name": "quakes", "id_prefix": "q-", "filters": ["metadata.magnitude >= 3"]},
      {"name": "all", "filters": []}
    ], "access_keys": ["k1", "k2"]}"""

  test("parses layers, filters and access keys") {
    val cfg = ConfigSource.parse(spark, configJson)
    assert(cfg.layers.map(_.name) === Seq("quakes", "all"))
    assert(cfg.layers.head.filters === Seq("metadata.magnitude >= 3"))
    assert(cfg.layers(1).id_prefix === "")
    assert(cfg.access_keys === Seq("k1", "k2"))
  }

  test("TTL cache re-reads only after expiry and sees updated config") {
    val f = Files.createTempFile("graft_cfg", ".json")
    Files.writeString(f, configJson)
    var now = 1000L
    val cached = new ConfigSource.Cached(spark, f.toString, ttlMs = 60000, clock = () => now)
    assert(cached.get().access_keys === Seq("k1", "k2"))
    Files.writeString(f, """{"layers": [], "access_keys": ["k3"]}""")
    now += 30000
    assert(cached.get().access_keys === Seq("k1", "k2"), "inside TTL: cached")
    assert(cached.readCount === 1)
    now += 40000
    assert(cached.get().access_keys === Seq("k3"), "TTL lapsed: re-read")
    assert(cached.readCount === 2)
  }

  test("config-driven layer filter compiles to a working Column (F11 + F12)") {
    import spark.implicits._
    val features = Seq(
      ("q-1", """{"magnitude": 5.0}"""),
      ("q-2", """{"magnitude": 1.0}"""),
      ("x-3", """{"magnitude": 9.0}""")).toDF("id", "metadata")
    val resolve: String => org.apache.spark.sql.Column = p =>
      if (p.startsWith("metadata.")) get_json_object(col("metadata"), "$." + p.stripPrefix("metadata."))
      else col(p)
    val layer = ConfigSource.parse(spark, configJson).layers.head
    val got = features.filter(ConfigSource.layerFilter(layer, resolve))
      .select("id").as[String].collect().toSeq
    assert(got === Seq("q-1"), "magnitude >= 3 AND id prefix q-")
  }
}
