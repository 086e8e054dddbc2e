package graft.queries

import java.nio.file.Files

import graft.SparkSpec
import graft.functions.Sketches

/** L101–L103 semantics beyond the oracles: KS on planted identical /
  * maximally-shifted halves, PSI's zero-at-identity and sign
  * structure, and the MAD fence on a corpus with one planted
  * pathological document.
  */
class DriftSpec extends SparkSpec {

  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("drift-docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(q: String, dir: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  test("q169: identical halves give KS 0; a full shift gives KS 1e6") {
    // source "same": both parities draw the same lengths (pairs
    // (2i, 2i+1) share n_chars) → ECDFs identical → ks 0.
    // source "shift": even docs tiny (bin 0), odd docs huge (bin 31)
    // → the gap at bin 0 is the whole mass → ks 1e6 at bin 0.
    val same = (0L until 100L).map(i =>
      (i, s"t$i", "en", "same", 32L * (i / 2)))
    val shift = (100L until 200L).map(i =>
      (i, s"t$i", "en", "shift", if (i % 2 == 0) 5L else 5000L))
    val out = run("q169_ks_drift", docsDir(same ++ shift))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("same") === ((50L, 50L, 0L, 0L)))
    assert(out("shift") === ((50L, 50L, 1000000L, 0L)))
  }

  test("q170: PSI is 0 at identity and strictly positive under shift; terms never negative") {
    // identical halves: every (p_ppm, q_ppm) pair equal → psi 0
    val text = "spark join order window hash table merge scan"
    val same = (0L until 60L).map(i => (i, text, "en", "same", 8L))
    // shifted: even docs 2 words, odd docs 40 words → different bins
    val small = "spark join"
    val big = Seq.fill(40)("row").mkString(" ")
    val shift = (100L until 160L).map(i =>
      (i, if (i % 2 == 0) small else big, "en", "shift", 8L))
    val out = run("q170_psi_drift", docsDir(same ++ shift))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("same")._3 === 0L, "identity must score PSI 0")
    assert(out("shift")._3 > 0L, "a full bin shift must score positive")
    // sign structure on the real fixture: (p−q) and (ilog2 p − ilog2 q)
    // always share a sign, so every per-source sum is ≥ 0
    run("q170_psi_drift", "/root/testdata/sf0.001")
      .foreach(r => assert(r.getLong(3) >= 0L, s"psi_sum sign: $r"))
  }

  test("q186: EMD is 0 at identity and weights carried gaps by run length") {
    // identity → every cumulative pair equal → W1 0.
    // shift: even docs bin 0 (ref side), odd docs bin 31 (cur side) —
    // only bins 0 and 31 are OBSERVED, but the 10^6 gap at bin 0
    // persists through the 30 absent bins; the run weighting must
    // count it 31 times (bins 0..30), then 0 at bin 31:
    // emd = 31·10^6, w1 = 31·10^6 div 32
    val same = (0L until 100L).map(i =>
      (i, s"t$i", "en", "same", 32L * (i / 2)))
    val shift = (100L until 200L).map(i =>
      (i, s"t$i", "en", "shift", if (i % 2 == 0) 5L else 5000L))
    val out = run("q186_emd_drift", docsDir(same ++ shift))
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out("same") === ((50L, 50L, 0L, 0L)))
    assert(out("shift") === ((50L, 50L, 31000000L, 968750L)))
  }

  test("q186: replays in Scala on the fixture; mean gap never exceeds KS") {
    val docs = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, "/root/testdata/sf0.001")
        .select("doc_id", "source", "n_chars")
        .as[(Long, String, Long)].collect()
    }
    val expect = docs.groupBy(_._2).map { case (src, rows) =>
      val binned = rows.map(r =>
        (r._1 % 2, math.min(r._3 / 32L, 31L)))
      val bins = binned.map(_._2).distinct.sorted
      val nR = binned.count(_._1 == 0L).toLong
      val nC = binned.count(_._1 == 1L).toLong
      var (cumR, cumC) = (0L, 0L)
      val gaps = bins.map { b =>
        cumR += binned.count(x => x._1 == 0L && x._2 == b)
        cumC += binned.count(x => x._1 == 1L && x._2 == b)
        b -> math.abs(cumR * 1000000L / math.max(nR, 1L)
          - cumC * 1000000L / math.max(nC, 1L))
      }
      val runs = bins.zip(bins.drop(1) :+ 32L).map(p => p._2 - p._1)
      val emd = gaps.map(_._2).zip(runs).map(p => p._1 * p._2).sum
      src -> (nR, nC, emd, emd / 32L)
    }
    val out = run("q186_emd_drift", "/root/testdata/sf0.001")
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(out === expect)
    // structural cross-gate vs q169: w1 is the MEAN ECDF gap, KS the
    // MAX — mean ≤ max per source, on the same histogram
    val ks = run("q169_ks_drift", "/root/testdata/sf0.001")
      .map(r => r.getString(0) -> r.getLong(3)).toMap
    out.foreach { case (src, (_, _, _, w1)) =>
      assert(w1 <= ks(src), s"$src: w1 $w1 > ks ${ks(src)}")
    }
  }

  test("q171: the MAD fence drops exactly the planted pathological doc") {
    // nine docs at length 100 (median 100, MAD 0 → fence 1) plus one
    // at 100000: dev 99900 > 1 → dropped; a tenth at 101 (dev 1) kept
    val rows = (0L until 9L).map(i => (i, s"t$i", "en", "s", 100L)) ++
      Seq((9L, "t9", "en", "s", 101L), (10L, "big", "en", "s", 100000L))
    val out = run("q171_mad_outliers", docsDir(rows))
    assert(out.length === 1)
    val r = out.head
    assert(r.getLong(1) === 11L)                    // n_docs
    assert(r.getLong(2) === 100L)                   // med (rank 6 of 11)
    assert(r.getLong(3) === 0L)                     // mad
    assert(r.getLong(4) === 1L)                     // fence max(3*0, 1)
    assert(r.getLong(5) === 10L && r.getLong(6) === 1L)
    assert(r.getLong(7) === Sketches.h64Scala("10") % 1000003L,
      "dropped checksum identifies the planted outlier")
  }
}
