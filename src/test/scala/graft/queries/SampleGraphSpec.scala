package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** L72–L75 semantics the fixture-scale oracles can't isolate: the
  * priority-sampling estimator's exact sub-k degeneration, PageRank's
  * degree/ordering/conservation on a hand-built graph, the entropy
  * proxy's exact values on known char distributions, and the BPE loop's
  * merge INTERACTION (later steps selecting pairs that contain earlier
  * merged symbols).
  */
class SampleGraphSpec extends SparkSpec {

  import spark.implicits._

  private def corpusDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("sg-corpus").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("q140: sub-k corpus degrades to the exact total (tau = 0)") {
    val dir = corpusDir(Seq(
      (1L, "a", "en", "s", 10L), (2L, "b", "en", "s", 20L),
      (3L, "c", "en", "s", 30L), (4L, "d", "en", "s", 40L),
      (5L, "e", "en", "s", 50L)))
    val rows = graft.SparkEntry.queries("q140_priority_sample")(spark, dir)
      .select("rank", "doc_id", "w", "est_w", "est_total", "exact_total",
        "err_ppm")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect().toList
    assert(rows.size === 5)
    // fewer docs than PrioK + 1 -> tau = 0 -> est_w = w, estimator exact
    rows.foreach { case (_, _, w, estW, estT, exT, err) =>
      assert(estW === w)
      assert(estT === 150L && exT === 150L && err === 0L)
    }
    assert(rows.map(_._1) === (1L to 5L).toList, "rank contiguity")
  }

  test("q140: dominant weight is always sampled and estimator bounds hold") {
    val small = (2L to 30L).map(i => (i, s"t$i", "en", "s", 10L))
    val dir = corpusDir((1L, "big", "en", "s", 100000L) +: small)
    val rows = graft.SparkEntry.queries("q140_priority_sample")(spark, dir)
      .select("rank", "doc_id", "w", "est_w", "est_total")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(rows.size === SampleGraphOps.PrioK)
    // w >> total of the rest -> its priority dominates every u draw
    assert(rows.head._2 === 1L, "dominant-weight doc must rank first")
    rows.foreach { case (_, _, w, estW, _) => assert(estW >= w) }
    val estT = rows.head._5
    assert(estT === rows.map(_._4).sum, "subset-sum = sum of est_w")
    assert(estT >= 100000L, "estimate at least the sampled dominant mass")
  }

  test("q141: degrees, ordering and conservation on a hand-built graph") {
    // markers chosen so h64("mX mX mX") % 16 == 0 (sampled): bucket m7 =
    // docs {1,2,3,4} (clique), bucket m8 = {1,5}; fillers are unique per
    // doc, so their sampled shingles sit in size-1 buckets (dropped)
    val dir = corpusDir(Seq(
      (1L, "u1a m7 m7 m7 u1b m8 m8 m8 u1c", "en", "s", 1L),
      (2L, "u2a m7 m7 m7 u2b", "en", "s", 1L),
      (3L, "u3a m7 m7 m7 u3b", "en", "s", 1L),
      (4L, "u4a m7 m7 m7 u4b", "en", "s", 1L),
      (5L, "u5a m8 m8 m8 u5b", "en", "s", 1L)))
    val rows = graft.SparkEntry.queries("q141_graph_centrality")(spark, dir)
      .select("rank", "doc_id", "degree", "pr_ppm", "n_nodes", "sum_pr_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    assert(rows.size === 5)
    assert(rows.head._6 === rows.map(_._4).sum,
      "top-32 covers the whole graph here: sum_pr_ppm = sum of pr")
    val byDoc = rows.map(r => r._2 -> r).toMap
    assert(byDoc(1L)._3 === 4L, "hub degree")
    assert(byDoc(5L)._3 === 1L, "leaf degree")
    Seq(2L, 3L, 4L).foreach(i => assert(byDoc(i)._3 === 3L))
    assert(rows.head._2 === 1L, "hub ranks first")
    assert(rows.last._2 === 5L, "leaf ranks last")
    assert(rows.head._5 === 5L, "n_nodes")
    val sum = rows.head._6
    assert(sum <= 5000000L && sum >= 4200000L,
      s"integer PageRank conserves mass up to floor loss, got $sum")
  }

  test("q142: exact proxy values on known char distributions") {
    // doc 1: 2 symbols x4 -> 8 div 4 = 2 -> surprise 1 -> 1.0e6 ppm (low)
    // doc 2: 8 distinct    -> 8 div 1 = 8 -> surprise 3 -> 3.0e6 ppm
    // doc 41: planted block (stride hit) -> 1.0e6 ppm (low)
    val dir = corpusDir(Seq(
      (1L, "abababab", "en", "s1", 8L),
      (2L, "abcdefgh", "en", "s2", 8L),
      (41L, "organic text that the plant replaces", "en", "s3", 30L)))
    val rows = graft.SparkEntry.queries("q142_entropy_quality")(spark, dir)
      .select("source", "n_docs", "n_low", "min_h_ppm", "max_h_ppm",
        "avg_h_ppm")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    val bySrc = rows.map(r => r._1 -> r).toMap
    assert(bySrc("s1") === ("s1", 1L, 1L, 1000000L, 1000000L, 1000000L))
    assert(bySrc("s2") === ("s2", 1L, 0L, 3000000L, 3000000L, 3000000L))
    assert(bySrc("s3")._3 === 1L, "planted %41 slice is flagged")
    assert(bySrc("s3")._4 === 1000000L, "planted block proxy value")
  }

  test("q144: wider JL projection dominates on distortion; signs are ±1") {
    // the k dial's measured law on the real fixture: k=32 must beat k=8
    // in aggregate and in (almost) every bucket on the SAME pairs
    val rows = graft.SparkEntry.queries("q144_jl_projection")(
      spark, "/root/testdata/sf0.001")
      .select("jl_dims", "bucket", "n_pairs", "avg_dist_ppm", "max_dist_ppm")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    val k8 = rows.filter(_._1 == 8L).map(r => r._2 -> r._4).toMap
    val k32 = rows.filter(_._1 == 32L).map(r => r._2 -> r._4).toMap
    assert(k8.keySet === k32.keySet)
    val agg8 = k8.values.sum / k8.size
    val agg32 = k32.values.sum / k32.size
    assert(agg32 * 100 < agg8 * 75,
      s"k=32 avg distortion $agg32 not <0.75x of k=8's $agg8 " +
        "(1/sqrt(k) law broken)")
    // the sign matrix is deterministic ±1 with both signs present per row
    SampleGraphOps.jlSigns(8, 64).foreach { row =>
      assert(row.forall(s => s == 1.0 || s == -1.0))
      assert(row.contains(1.0) && row.contains(-1.0))
    }
    assert(SampleGraphOps.jlSigns(8, 64) === SampleGraphOps.jlSigns(8, 64))
  }

  test("q146: the PR curve traverses all three regimes on the fixture") {
    val rows = graft.SparkEntry.queries("q146_threshold_sweep")(
      spark, "/root/testdata/sf0.001")
      .select("t", "tp", "fp", "fn", "precision_ppm", "recall_ppm")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toList
    val byT = rows.map(r => r._1 -> r).toMap
    assert(byT(1000000L)._6 === 0L, "zero recall below the planted band")
    assert(byT(2000000L)._5 === 1000000L && byT(2000000L)._6 === 1000000L,
      "perfect plateau at the shipping threshold")
    assert(byT(4000000L)._5 < 1000000L && byT(4000000L)._6 === 1000000L,
      "precision decays once organic docs cross")
    // recall is monotone non-decreasing in the threshold
    val recalls = rows.sortBy(_._1).map(_._6)
    recalls.zip(recalls.tail).foreach { case (a, b) => assert(b >= a) }
  }

  test("q147: diff classification on hand-labelled ids") {
    // id 13 -> removed; id 11 -> modified (+9 chars); id 17 -> unchanged
    // AND forked (added); id 1 -> unchanged
    val dir = corpusDir(Seq(
      (13L, "gone", "en", "s13", 4L),
      (11L, "edit", "en", "s11", 4L),
      (17L, "fork", "en", "s17", 4L),
      (1L, "keep", "en", "s1", 4L)))
    val rows = graft.SparkEntry.queries("q147_snapshot_diff")(spark, dir)
      .select("source", "n_added", "n_removed", "n_modified", "n_unchanged",
        "char_delta")
      .as[(String, Long, Long, Long, Long, Long)].collect().toList
    val bySrc = rows.map(r => r._1 -> r).toMap
    assert(bySrc("s13") === ("s13", 0L, 1L, 0L, 0L, -4L))
    assert(bySrc("s11") === ("s11", 0L, 0L, 1L, 0L, 9L))
    assert(bySrc("s17") === ("s17", 1L, 0L, 0L, 1L, 4L))
    assert(bySrc("s1") === ("s1", 0L, 0L, 0L, 1L, 0L))
  }

  test("q148: JSONL round-trip survives hostile text byte-exactly") {
    // quotes, backslashes, newlines, tabs, unicode — the escaping paths
    val nasty = Seq(
      (1L, "plain words", "en", "sA", 11L),
      (2L, "he said \"hi\" \\ twice", "en", "sA", 20L),
      (3L, "line1\nline2\ttabbed", "en", "sB", 18L),
      (4L, "unicode ✓ emoji é中文", "en", "sB", 20L))
    val dir = corpusDir(nasty)
    val rows = graft.SparkEntry.queries("q148_jsonl_interchange")(spark, dir)
      .select("source", "n_docs", "text_hash_sum")
      .as[(String, Long, Long)].collect().toList.sortBy(_._1)
    import graft.functions.Sketches
    def expect(src: String) = nasty.filter(_._4 == src)
      .map(r => Sketches.h64Scala(r._2) % 1000003L).sum
    assert(rows === List(("sA", 2L, expect("sA")), ("sB", 2L, expect("sB"))))
  }

  test("q149: ring successors match a direct Scala computation") {
    val ids = Seq(29L, 58L, 87L, 3L, 7L, 19L, 44L, 100L)
    val dir = corpusDir(ids.map(i => (i, s"t$i", "en", "s", 5L)))
    import graft.functions.Sketches
    val ring = ids.map(i => Sketches.h64Scala(s"ring:$i") -> i).sortBy(_._1)
    def successor(p: Long): (Long, Boolean) =
      ring.find(_._1 >= p).map(r => (r._2, false))
        .getOrElse((ring.head._2, true))
    val expected = ids.filter(_ % 29 == 0).sorted.flatMap { a =>
      val ah = Sketches.h64Scala(s"ring:$a")
      (1 to SampleGraphOps.RingNegK).map { j =>
        val p = java.lang.Math.floorMod(
          ah + j * SampleGraphOps.RingStep, SampleGraphOps.RingMod)
        val (neg, wrapped) = successor(p)
        (a, j.toLong, neg, if (wrapped) 1L else 0L,
          if (neg == a) 1L else 0L)
      }
    }
    val rows = graft.SparkEntry.queries("q149_negative_sampling")(spark, dir)
      .select("anchor", "j", "neg_doc", "wrapped", "self_hit")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(rows === expected)
    assert(rows.exists(_._4 == 1L) || rows.forall(_._4 == 0L))
  }

  test("q143: later merge steps select pairs containing earlier merges") {
    // 'abc' x5: step 1 takes 'ab' (tie with 'bc' broken lexicographically),
    // step 2 MUST take chr(1)||'c' — the interaction one kernel step
    // cannot express; 'wxyz' x3 then feeds steps 3-4 the same way
    val docs = (1L to 5L).map(i => (i, "abc", "en", "s", 3L)) ++
      (6L to 8L).map(i => (i, "wxyz", "en", "s", 4L))
    val dir = corpusDir(docs)
    val rows = graft.SparkEntry.queries("q143_bpe_train_loop")(spark, dir)
      .select("step", "pa", "pb", "pair_count", "tokens_after")
      .as[(Long, Long, Long, Long, Long)].collect().toList
    assert(rows.map(r => (r._2, r._3)) ===
      List((97L, 98L), (1L, 99L), (119L, 120L), (3L, 121L)),
      "steps 2 and 4 merge pairs built on steps 1 and 3's symbols")
    assert(rows.map(_._4) === List(5L, 5L, 3L, 3L), "pair counts")
    assert(rows.map(_._5) === List(22L, 17L, 14L, 11L),
      "realized token counts shrink by each merge")
  }
}
