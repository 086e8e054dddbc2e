package graft.queries

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The flagship composition (VERDICT r7 #6): corpus in → funnel (dedup →
  * quality → decontaminate → split) → deterministic training shards on
  * disk, as ONE pipeline — `LlmPipeline.writeTrainingShards`. Proves:
  *
  *  - the written corpus IS q80's survivor set: per-(lang, split) shard
  *    row counts equal the funnel's oracle-verified `n_clean` column;
  *  - re-run stability: a second end-to-end run reproduces identical
  *    shard membership AND identical within-shard row order (the
  *    (shard, offset) contract a training loader resumes by);
  *  - shard membership is the pure doc_id hash — independent of
  *    partitioning, join order, or which run produced it.
  */
class TrainingShardsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val NShards = 4

  /** Per-shard ordered doc_id sequences, reading part files in name order
    * — the exact order a loader iterating (shard, offset) observes.
    */
  private def shardSequences(out: String): Map[Long, Seq[Long]] = {
    import spark.implicits._
    val shardDirs = Files.list(Paths.get(out)).iterator().asScala
      .filter(p => p.getFileName.toString.startsWith("shard=")).toSeq
    shardDirs.map { dir =>
      val shard = dir.getFileName.toString.stripPrefix("shard=").toLong
      val parts = Files.list(dir).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.sortBy(_.toString)
      shard -> parts.flatMap(p =>
        spark.read.parquet(p.toString).select(col("doc_id")).as[Long].collect().toSeq)
    }.toMap
  }

  test("funnel survivors ship as shards matching q80's n_clean, byte-stable across re-runs") {
    import spark.implicits._
    val out1 = Files.createTempDirectory("train-shards-1").toString
    val out2 = Files.createTempDirectory("train-shards-2").toString
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, sf, out1, NShards, maxRecordsPerFile = 64L)
    }
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, sf, out2, NShards, maxRecordsPerFile = 64L)
    }

    // the shards hold exactly the funnel's survivor set: per-(lang, split)
    // counts match q80's cumulative n_clean (the oracle-gated number)
    val back = spark.read.parquet(out1)
    val fromShards = back.groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n"))
      .as[(String, String, Long)].collect().toSet
    val fromFunnel = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q80_corpus_funnel")(spark, sf)
        .select(col("lang"), col("split"), col("n_clean"))
        .as[(String, String, Long)].collect().toSet
    }
    assert(fromFunnel.exists(_._3 > 0), "funnel must keep a nonempty corpus")
    assert(fromShards === fromFunnel,
      "shard contents must be exactly the funnel's n_clean survivors")

    // membership is the pure doc_id hash
    val misplaced = back.filter(col("shard") =!=
      graft.sinks.ShardWriter.shardId(col("doc_id"), NShards)).count()
    assert(misplaced === 0L)

    // re-run stability: identical membership AND within-shard row order
    val seq1 = shardSequences(out1)
    val seq2 = shardSequences(out2)
    assert(seq1.keySet === seq2.keySet, "same shard directories")
    seq1.keys.foreach { s =>
      assert(seq1(s) === seq2(s), s"shard $s row sequence must be re-run stable")
      assert(seq1(s) === seq1(s).sorted, s"shard $s must be key-sorted")
    }
  }

  test("shards ship PII-scrubbed by default, without changing membership or order") {
    import spark.implicits._
    // fixture corpus with planted PII: 12 distinct words per doc passes the
    // quality gate, no doc_id % 97 == 0 → empty eval set, nothing dirty
    val fixture = Files.createTempDirectory("pii-corpus").toString
    val docs = (1L to 20L).map { i =>
      val words = (0 until 12).map(w => s"w${i}x$w").mkString(" ")
      (i, s"$words contact user$i@mail${i % 3}.com and host 10.0.${i % 256}.7",
        if (i % 2 == 0) "en" else "de", s"src${i % 4}", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$fixture/documents.parquet")

    val outScrub = Files.createTempDirectory("train-shards-pii").toString
    val outRaw = Files.createTempDirectory("train-shards-raw").toString
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, fixture, outScrub, NShards)
    }
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, fixture, outRaw, NShards, redactPii = false)
    }

    val scrubbed = spark.read.parquet(outScrub)
    assert(scrubbed.count() === 20L, "all fixture docs survive the funnel")
    val leaking = scrubbed.filter(
      col("text").rlike(graft.functions.TextFunctions.PiiEmailPattern) ||
      col("text").rlike(graft.functions.TextFunctions.PiiIpPattern)).count()
    assert(leaking === 0L, "no email/IP survives the default scrub")
    assert(scrubbed.filter(col("text").contains("<EMAIL>"))
      .filter(col("text").contains("<IP>")).count() === 20L,
      "redaction tokens present where PII was planted")

    // the scrub is a pure projection: shard membership and within-shard
    // order are identical to the unscrubbed run
    assert(shardSequences(outScrub) === shardSequences(outRaw))
  }
}
