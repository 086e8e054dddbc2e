package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** S15: TTL-cached JSON config scan (`ais-proxy/server.js:103-132`,
  * `tak-cot-proxy/index.mjs:37-59`, `weather-proxy/server.js:89-118`) —
  * a DRIVER-side read re-checked after a TTL, broadcast to executors.
  *
  * The reference's config carries `layers` with `filters` (the string DSL)
  * and `access_keys`; [[DisplayConfig]] models that surface and
  * [[layerFilter]] compiles a layer's filter list straight into a Column —
  * the config→plan path of the display pipeline.
  */
object ConfigSource {

  final case class Layer(name: String, id_prefix: String, filters: Seq[String])
  final case class DisplayConfig(layers: Seq[Layer], access_keys: Seq[String])

  /** Minimal JSON shape reader (driver-side; config files are small). Uses
    * Spark's own JSON parsing on a 1-row dataset so there is no extra
    * dependency and the schema stays declarative.
    */
  def parse(spark: SparkSession, json: String): DisplayConfig = {
    import spark.implicits._
    val row = Seq(json).toDS()
    val df = spark.read.json(row)
    // an empty or absent layers array infers as array<string>/missing —
    // only descend when the element type is an actual struct
    val layersIsStructArray = df.columns.contains("layers") &&
      (df.schema("layers").dataType match {
        case org.apache.spark.sql.types.ArrayType(_: org.apache.spark.sql.types.StructType, _) => true
        case _ => false
      })
    val layers =
      if (!layersIsStructArray) Seq.empty
      else df.select(explode(col("layers")).as("l"))
        .select(
          coalesce(col("l.name"), lit("")).as("name"),
          coalesce(col("l.id_prefix"), lit("")).as("id_prefix"),
          coalesce(col("l.filters"), array()).as("filters"))
        .as[(String, String, Seq[String])].collect().toSeq
        .map { case (n, p, f) => Layer(n, p, f) }
    val keys =
      if (!df.columns.contains("access_keys")) Seq.empty
      else df.select(explode(col("access_keys")).as("k")).as[String].collect().toSeq
    DisplayConfig(layers, keys)
  }

  /** TTL-cached loader: re-reads the backing file only when the TTL lapses
    * (`cachedApiKeys` + `lastFetch` pattern). `clock` is injectable for
    * tests.
    */
  final class Cached(spark: SparkSession, path: String, ttlMs: Long,
      clock: () => Long = System.currentTimeMillis) {
    private var last: Long = Long.MinValue
    private var value: DisplayConfig = DisplayConfig(Seq.empty, Seq.empty)
    private var reads: Int = 0

    def get(): DisplayConfig = synchronized {
      val now = clock()
      // reads == 0 guard: `now - Long.MinValue` would overflow
      if (reads == 0 || now - last >= ttlMs) {
        val json = new String(
          java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8")
        value = parse(spark, json)
        last = now
        reads += 1
      }
      value
    }

    def readCount: Int = synchronized(reads)
  }

  /** Compile one layer's config into executable plan pieces: the filter
    * DSL list (OR semantics) AND the id-prefix guard (F11) — the
    * reference applies both per layer (`tak-cot-proxy:405-417`).
    */
  def layerFilter(layer: Layer,
      resolve: String => org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val dsl = graft.dsl.FilterDsl.compile(layer.filters, resolve)
    if (layer.id_prefix.isEmpty) dsl
    else dsl && resolve("id").startsWith(layer.id_prefix)
  }
}
