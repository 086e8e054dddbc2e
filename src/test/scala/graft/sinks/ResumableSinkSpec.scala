package graft.sinks

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The MBTiles-style resume contract: re-running a batch writes zero
  * duplicates; overlapping batches write only the new keys.
  */
class ResumableSinkSpec extends SparkSpec {

  test("re-run writes zero rows; overlap writes only new keys") {
    import spark.implicits._
    val dir = Files.createTempDirectory("resumable_sink").toString + "/tiles"
    val batch1 = (1 to 100).map(i => (i.toLong, s"tile_$i")).toDF("key", "payload")
    val batch2 = (51 to 150).map(i => (i.toLong, s"tile_$i")).toDF("key", "payload")

    assert(ResumableSink.appendNew(batch1, Seq("key"), dir) === 100L)
    assert(ResumableSink.appendNew(batch1, Seq("key"), dir) === 0L, "pure re-run must be a no-op")
    assert(ResumableSink.appendNew(batch2, Seq("key"), dir) === 50L, "only keys 101-150 are new")

    val sunk = spark.read.parquet(dir)
    assert(sunk.count() === 150L)
    assert(sunk.select(countDistinct(col("key"))).as[Long].head() === 150L,
      "no duplicate keys after interleaved re-runs")
  }

  test("K5: JSON object write round-trips (the S3 put-object sink shape)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("json_sink").toString + "/out"
    val df = Seq((1L, "a", 2.5), (2L, "b", 3.5)).toDF("id", "tag", "v")
    df.write.mode("overwrite").json(dir)
    val back = spark.read.json(dir).select("id", "tag", "v").orderBy("id")
    assert(back.as[(Long, String, Double)].collect().toSeq ===
      Seq((1L, "a", 2.5), (2L, "b", 3.5)))
  }
}
