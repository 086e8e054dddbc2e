package graft.sinks

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Shard-writer layout contract: shard directories hold exactly their
  * hash-assigned keys, rows are key-sorted within every part file, the
  * per-file record cap is respected, nothing is lost or duplicated, and a
  * re-write reproduces identical shard membership (determinism).
  */
class ShardWriterSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val NShards = 4

  test("shards are complete, hash-consistent, sorted, and size-capped") {
    import spark.implicits._
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val out = Files.createTempDirectory("shards").toString
    ShardWriter.write(docs, "doc_id", NShards, out, maxRecordsPerFile = 50L)

    // completeness + hash consistency: every row lands in the shard its
    // key hashes to, and nothing is lost or duplicated
    val back = spark.read.parquet(out)
    assert(back.count() === docs.count())
    val misplaced = back.filter(
      col("shard") =!= ShardWriter.shardId(col("doc_id"), NShards)).count()
    assert(misplaced === 0L, "every row must sit in its hash-assigned shard")
    assert(back.select(col("doc_id")).distinct().count() === docs.count())

    // within-file key order + record cap, checked file by file
    val parts = Files.walk(Paths.get(out)).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && p.toFile.isFile).toSeq
    assert(parts.nonEmpty)
    parts.foreach { p =>
      val ids = spark.read.parquet(p.toString).select(col("doc_id"))
        .as[Long].collect()
      assert(ids.length <= 50, s"record cap exceeded in $p: ${ids.length}")
      assert(ids.sameElements(ids.sorted), s"rows not key-sorted in $p")
    }

    // determinism: a second write produces identical shard membership
    val out2 = Files.createTempDirectory("shards2").toString
    ShardWriter.write(docs, "doc_id", NShards, out2, maxRecordsPerFile = 50L)
    val m1 = back.select(col("doc_id"), col("shard")).as[(Long, Long)]
      .collect().sorted.toSeq
    val m2 = spark.read.parquet(out2).select(col("doc_id"), col("shard"))
      .as[(Long, Long)].collect().sorted.toSeq
    assert(m1 === m2, "shard membership must be reproducible")
  }
}
