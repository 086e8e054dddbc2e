package graft.queries

import java.nio.file.{Files, Path, Paths}
import java.security.MessageDigest
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The nightly incremental funnel (VERDICT r10 #5): q96 classification →
  * funnel survivor merge → append-mode shard update with K4-style resume,
  * as ONE pipeline. Proves the two contracts that make incremental upkeep
  * trustworthy:
  *
  *  (a) already-shipped shard files are BYTE-stable across an increment —
  *      a training loader's (shard, file, offset) positions never move;
  *  (b) the incremental layout holds exactly the rows a from-scratch
  *      rebuild on the merged corpus (same frozen eval model) produces.
  *
  * Plus: per-file key order (the loader's within-file offset contract),
  * idempotent re-runs (resume anti-join appends nothing twice), and the
  * monotone-ingest-id guard failing loudly.
  */
class IncrementalFunnelSpec extends SparkSpec {

  import spark.implicits._

  private val NShards = 4

  /** 12 distinct filler words per doc → passes the L16 quality gate. */
  private def cleanText(seed: Long): String =
    (0 until 12).map(w => s"w${seed}x$w").mkString(" ")

  /** Corpus fixture: ids 1..120 (97 is an eval doc by the % 97 rule), all
    * quality-passing, one internal dup cluster (7 and 8 share content).
    */
  private lazy val corpusDir: String = {
    val d = Files.createTempDirectory("inc-corpus").toString
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    val docs = (1L to 120L).map { i =>
      val text =
        if (i == 97L) evalText // the eval doc whose 3-grams are the frozen model
        else if (i == 8L) cleanText(7L) // exact dup of doc 7 → 8 is non-canon
        else cleanText(i)
      (i, text, if (i % 2 == 0) "en" else "de", s"src${i % 3}", 0L)
    }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.parquet(s"$d/documents.parquet")
    d
  }

  /** Batch fixture: ids 201..210 + 291 — every classification and funnel
    * branch planted.
    */
  private def batch: DataFrame = Seq(
    (201L, cleanText(201L), "en", "srcA", 0L), // plain new → appended
    (202L, cleanText(5L), "en", "srcA", 0L), // exact dup of corpus doc 5 → dropped
    // near dup of corpus doc 6: same word set reversed — ck matches, fp
    // differs; the funnel's dedup stage is exact-canonical, so BOTH paths keep it
    (203L, (0 until 12).map(w => s"w6x$w").reverse.mkString(" "), "de", "srcB", 0L),
    (204L, cleanText(204L), "de", "srcB", 0L), // plain new → appended
    (205L, Seq.fill(12)("spam").mkString(" "), "en", "srcA", 0L), // repetition → quality drop
    // contaminated vs the FROZEN eval model: shares 3-gram "alpha beta gamma"
    (206L, "alpha beta gamma " + (0 until 9).map(w => s"c$w").mkString(" "), "en", "srcC", 0L),
    (207L, cleanText(777L), "de", "srcC", 0L), // batch-internal dup pair:
    (208L, cleanText(777L), "de", "srcC", 0L), //   min id 207 kept, 208 dropped
    (209L, cleanText(209L), "en", "srcA", 0L), // plain new → appended
    (210L, cleanText(210L), "de", "srcB", 0L), // plain new → appended
    (291L, cleanText(291L), "en", "srcA", 0L) // 291 = 3·97: eval doc → excluded
  ).toDF("doc_id", "text", "lang", "source", "n_chars")

  private def md5Of(p: Path): String =
    MessageDigest.getInstance("MD5").digest(Files.readAllBytes(p))
      .map("%02x".format(_)).mkString

  private def allFiles(dir: String): Map[String, String] =
    Files.walk(Paths.get(dir)).iterator().asScala
      .filter(p => Files.isRegularFile(p) && !p.getFileName.toString.startsWith("."))
      .filterNot(_.getFileName.toString == "_SUCCESS")
      .map(p => Paths.get(dir).relativize(p).toString -> md5Of(p)).toMap

  private def rowsOf(dir: String): Set[(Long, Long, String, String, String)] =
    spark.read.parquet(dir)
      .select(col("shard").cast("long"), col("doc_id"), col("lang"),
        col("split"), col("text"))
      .as[(Long, Long, String, String, String)].collect().toSet

  test("increment is byte-stable for old files, row-equal to a merged rebuild, idempotent") {
    val out = Files.createTempDirectory("inc-shards").toString
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, corpusDir, out, NShards,
        maxRecordsPerFile = 16L)
    }
    val before = allFiles(out)
    assert(before.nonEmpty, "corpus build must produce shard files")

    // one nightly increment
    val appended = graft.core.CacheScope.scoped {
      IncrementalFunnel.updateTrainingShards(spark, corpusDir, batch, out,
        NShards, maxRecordsPerFile = 16L)
    }
    // survivors: 201, 203 (near dup kept), 204, 207 (batch-internal min),
    // 209, 210 — NOT 202/205/206/208/291
    assert(appended === 6L, s"expected 6 appended rows, got $appended")

    // (a) every pre-existing file is byte-identical after the increment
    val after = allFiles(out)
    before.foreach { case (rel, hash) =>
      assert(after.contains(rel), s"old file $rel disappeared")
      assert(after(rel) === hash, s"old file $rel was rewritten")
    }
    assert(after.size > before.size, "increment must add new part files")

    // appended ids are exactly the planted survivors
    val ids = spark.read.parquet(out).select(col("doc_id")).as[Long]
      .collect().toSet
    Seq(201L, 203L, 204L, 207L, 209L, 210L).foreach(i =>
      assert(ids.contains(i), s"survivor $i missing"))
    Seq(202L, 205L, 206L, 208L, 291L).foreach(i =>
      assert(!ids.contains(i), s"dropped doc $i leaked into the shards"))

    // (b) row-equality with the from-scratch rebuild on the merged corpus
    // under the same frozen eval model
    val rebuildDir = Files.createTempDirectory("inc-rebuild").toString
    graft.core.CacheScope.scoped {
      val corpus = graft.core.Tables.documents(spark, corpusDir)
        .select(col("doc_id"), col("text"), col("lang"), col("source"))
      val merged = corpus.unionByName(
        batch.select(col("doc_id"), col("text"), col("lang"), col("source")))
      LlmPipeline.writeTrainingShardsOver(merged,
        LlmPipeline.evalGramFingerprints(corpus), rebuildDir, NShards,
        maxRecordsPerFile = 16L)
    }
    assert(rowsOf(out) === rowsOf(rebuildDir),
      "incremental layout must hold exactly the merged-rebuild rows")

    // loader contract: every part file is internally key-sorted
    Files.walk(Paths.get(out)).iterator().asScala
      .filter(_.toString.endsWith(".parquet")).foreach { p =>
        val seq = spark.read.parquet(p.toString)
          .select(col("doc_id")).as[Long].collect().toSeq
        assert(seq === seq.sorted, s"part file $p not key-sorted")
      }

    // idempotence: re-running the same increment appends nothing and
    // leaves the file inventory untouched (K4-style resume)
    val again = graft.core.CacheScope.scoped {
      IncrementalFunnel.updateTrainingShards(spark, corpusDir, batch, out,
        NShards, maxRecordsPerFile = 16L)
    }
    assert(again === 0L, "re-run must append zero rows")
    val afterAgain = allFiles(out)
    after.foreach { case (rel, hash) =>
      assert(afterAgain.get(rel) === Some(hash), s"re-run disturbed $rel")
    }
  }

  test("monotone-ingest-id guard fails loudly on a stale batch id") {
    val out = Files.createTempDirectory("inc-guard").toString
    graft.core.CacheScope.scoped {
      LlmPipeline.writeTrainingShards(spark, corpusDir, out, NShards)
    }
    val stale = Seq((50L, cleanText(9999L), "en", "srcA", 0L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val e = intercept[IllegalArgumentException] {
      IncrementalFunnel.updateTrainingShards(spark, corpusDir, stale, out, NShards)
    }
    assert(e.getMessage.contains("monotone"),
      s"guard message must explain the invariant, got: ${e.getMessage}")
  }
}
