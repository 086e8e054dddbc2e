package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.{Sketches, TextFunctions}

/** L98–L100 semantics beyond the oracles: the Feistel permutation
  * replayed bit-for-bit in plain Scala (bijectivity + checksums +
  * epoch decorrelation), curriculum stage structure, and the
  * preference-pairing logic replayed against independently computed
  * quality scores.
  */
class CurriculumSpec extends SparkSpec {

  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("curr-docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(q: String, dir: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  /** Plain-Scala twin of CurriculumOps.feistelPos. */
  private def feistelScala(epoch: Int, docId: Long): Long = {
    var l = docId / 1024; var r = docId % 1024
    for (round <- 1 to 3) {
      val f = Sketches.h64Scala(s"fe:$epoch:$round:$r") & 1023L
      val t = r; r = l ^ f; l = t
    }
    l * 1024 + r
  }

  test("q166: positions replay in Scala — bijective, checksummed, decorrelated") {
    val n = 300L
    val rows = (0L until n).map(i => (i, s"d$i", "en", "s", 10L))
    val out = run("q166_feistel_epoch_shuffle", docsDir(rows))
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getLong(6), r.getLong(7))).toMap
    // Scala replay of the full report
    val pos = Map(0 -> (0L until n).map(i => i -> feistelScala(0, i)).toMap,
      1 -> (0L until n).map(i => i -> feistelScala(1, i)).toMap)
    for (e <- 0 to 1) {
      val byShard = pos(e).groupBy { case (_, p) => p & 15L }
      assert(out.keys.count(_._1 == e) === byShard.size)
      byShard.foreach { case (shard, docs) =>
        val (nd, npd, mn, mx, ck, moved) = out((e.toLong, shard))
        assert(nd === docs.size.toLong, s"epoch $e shard $shard count")
        assert(npd === docs.values.toSet.size.toLong,
          s"epoch $e shard $shard: positions must be distinct (bijection)")
        assert(npd === nd, "injectivity: distinct positions == docs")
        assert(mn === docs.values.min && mx === docs.values.max)
        assert(ck === docs.map { case (id, p) =>
          Sketches.h64Scala(s"$id:$p") % 1000003L }.sum,
          s"epoch $e shard $shard checksum")
        assert(moved === docs.count { case (id, p) =>
          (p & 15L) != (pos(1 - e)(id) & 15L) }.toLong)
      }
    }
    // decorrelation: a healthy epoch salt moves most docs across shards
    val totalMoved = out.collect { case ((0L, _), v) => v._6 }.sum
    assert(totalMoved > n / 2,
      s"epoch salt must reshuffle shards (moved $totalMoved of $n)")
  }

  test("q167: stages are equal-population, monotone, and complete") {
    val dir = "/root/testdata/sf0.001"
    val out = run("q167_curriculum_stages", dir)
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L, 4L))
    val pops = out.map(_._2)
    assert(pops.sum === 500L, "every doc lands in exactly one stage")
    assert(pops.max - pops.min <= 1L, "ntile populations balance")
    out.sliding(2).foreach { case Array(a, b) =>
      assert(a._4 <= b._3,
        s"stage ${a._1} q_max must not exceed stage ${b._1} q_min")
    }
    out.foreach(r => assert(r._5 > 0L, s"stage ${r._1} token budget"))
  }

  test("q168: pairing replays from independently computed quality scores") {
    val dir = "/root/testdata/sf0.001"
    // independent quality computation (same registered scalar, but the
    // STRATIFY/ARGMAX/GAP logic under test is replayed in plain Scala)
    val docs = graft.core.Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"),
        least(expr("n_chars div 128"), lit(7L)).as("bkt"),
        floor(TextFunctions.qualityScoreColumn(col("text")) * lit(1e6))
          .as("q_u"))
      .as[(Long, String, Long, Long)].collect()
    val expected = docs.groupBy(r => (r._2, r._3)).flatMap {
      case ((src, bkt), rs) if rs.length >= 2 =>
        val chosen = rs.minBy(r => (-r._4, r._1))
        val rejected = rs.minBy(r => (r._4, r._1))
        val gap = chosen._4 - rejected._4
        if (gap >= 50000L)
          Some((src, bkt) -> (rs.length.toLong, chosen._1, rejected._1,
            chosen._4, rejected._4, gap))
        else None
      case _ => None
    }
    val out = run("q168_preference_pairs", dir).map { r =>
      (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7))
    }.toMap
    assert(out === expected)
    assert(out.nonEmpty, "the fixture must yield some pairs")
  }
}
