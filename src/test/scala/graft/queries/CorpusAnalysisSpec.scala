package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row

import graft.SparkSpec

/** L124–L128 semantics beyond the oracles: Heaps slope on planted
  * flat/linear growth corpora, kappa's chance correction on perfect
  * agreement and pure disagreement plants, the PMI ladder replayed in
  * plain Scala, the conformal order statistic + flag counts replayed
  * from the registered NB scores, and the Elias-gamma planner replayed
  * bit-for-bit on a controlled postings set.
  */
class CorpusAnalysisSpec extends SparkSpec {

  import spark.implicits._

  private def docsDir(rows: Seq[(Long, String, String, String, Long)])
      : String = {
    val d = Files.createTempDirectory("corpusanalysis-docs").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  private def run(q: String, dir: String): Array[Row] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def ilog2(x: Long): Long =
    63 - java.lang.Long.numberOfLeadingZeros(math.max(x, 1L))

  test("q192: linear type growth fits slope 1e6; a flat vocabulary fits 0") {
    // "grow": each doc contributes exactly 2 never-seen words, so
    // cum_types == cum_tokens at every checkpoint → x == y → the
    // integer fit is exactly slope 1e6, intercept 0.
    val grow = (0L until 32L).map(i =>
      (i, s"g${i}a g${i}b", "en", "grow", 8L))
    // "flat": one two-word vocabulary repeated — y is constant 1
    // (ilog2 2) at every checkpoint → slope exactly 0, intercept 1e6.
    val flat = (100L until 140L).map(i =>
      (i, "alpha beta", "en", "flat", 10L))
    val out = run("q192_heaps_vocab_growth", docsDir(grow ++ flat))
      .map(r => r.getString(0) -> r).toMap
    val g = out("grow")
    assert(g.getLong(2) === 64L && g.getLong(3) === 64L,
      "grow: 32 docs x 2 words, all distinct")
    assert(g.getLong(4) === 1000000L && g.getLong(5) === 0L,
      s"grow slope/intercept: $g")
    val f = out("flat")
    assert(f.getLong(2) === 80L && f.getLong(3) === 2L,
      "flat: 40 docs x 2 words, 2 types")
    assert(f.getLong(4) === 0L && f.getLong(5) === 1000000L,
      s"flat slope/intercept: $f")
  }

  test("q193: kappa reads 1e6 on balanced perfect agreement, 0 on pure disagreement") {
    // "mix": 20 planted block docs (NB-positive, diversity-low) + 20
    // unique-word docs (NB-negative, diversity-high) — raters agree on
    // all 40 with balanced marginals → po 1e6, pe 5e5, kappa exactly 1e6.
    val planted = (0L until 20L).map(k =>
      (k * 41L, "ignored", "en", "mix", 16L))
    val clean = (1L until 21L).map(i =>
      (i * 41L + 1L, s"c${i}w c${i}x c${i}y c${i}z", "en", "mix", 16L))
    // "dis": the one-word block text at non-stride ids — every word is
    // positive-class evidence (NB fires) but the distinct ratio is 1
    // (diversity rater stays silent) → pure disagreement, kappa 0.
    val dis = (0L until 10L).map(i =>
      (2010L + i, "ha", "en", "dis", 2L)) // 2009 = 41*49 stays excluded
    val out = run("q193_kappa_filter_agreement",
      docsDir(planted ++ clean ++ dis))
      .map(r => r.getString(0) -> r).toMap
    val m = out("mix")
    assert(m.getLong(1) === 40L && m.getLong(4) === 40L,
      s"mix must agree on all docs: $m")
    assert(m.getLong(5) === 1000000L && m.getLong(6) === 500000L &&
      m.getLong(7) === 1000000L, s"mix po/pe/kappa: $m")
    val x = out("dis")
    assert(x.getLong(4) === 0L, s"dis must agree on nothing: $x")
    assert(x.getLong(2) === 10L && x.getLong(3) === 0L,
      s"dis rater split (A fires, B silent): $x")
    assert(x.getLong(7) === 0L, s"dis kappa: $x")
    // mechanical consistency on every row: kappa recomputes from po/pe
    out.values.foreach { r =>
      val (po, pe, k) = (r.getLong(5), r.getLong(6), r.getLong(7))
      assert(k === ((po - pe) * 1000000L) / math.max(1000000L - pe, 1L),
        s"kappa arithmetic: $r")
    }
  }

  test("q194: the staged-Q10 PMI ladder ranks the exclusive pair above the frequent one") {
    // "qq zz" co-occur exclusively (10 docs); "aa bb" are 3x more
    // frequent but no more associated — the rarer exclusive pair must
    // score strictly higher on the ladder.
    val rare = (0L until 10L).map(i => (i, "qq zz", "en", "s", 5L))
    val freq = (100L until 130L).map(i => (i, "aa bb", "en", "s", 5L))
    val rows = run("q194_pmi_collocations", docsDir(rare ++ freq))
    val byGram = rows.map(r => r.getString(1) ->
      (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5))).toMap
    // Scala replay of the exact integer formula, N = 80 word tokens
    def pmi(cxy: Long, cx: Long, cy: Long, n: Long): Long =
      ilog2(((cxy * 1024L) / cx) * ((n * 1024L) / cy)) - 20L
    assert(byGram("qq zz") ===
      ((1L, 10L, 10L, 10L, pmi(10, 10, 10, 80))), byGram.toString)
    assert(byGram("aa bb") ===
      ((2L, 30L, 30L, 30L, pmi(30, 30, 30, 80))), byGram.toString)
    assert(pmi(10, 10, 10, 80) > pmi(30, 30, 30, 80),
      "exclusivity must outrank raw frequency")
  }

  test("q195: tau is the conformal order statistic and flag counts replay exactly") {
    // "big" carries plants on both parities (41k even and odd) plus 60
    // length-varied clean docs; "tiny" has too few calibration negatives
    // for the 90% order statistic to exist → tau -1, nothing flagged.
    val plants = (0L until 8L).map(k => (k * 41L, "ignored", "en", "big", 8L))
    val clean = (0L until 60L).map { i =>
      val id = 500L + i
      val adjId = if (id % 41L == 0L) id + 1000L else id
      val words = (0L to i % 7L).map(j => s"b${i}w$j").mkString(" ")
      (adjId, words, "en", "big", 8L)
    }
    val tiny = Seq((3001L, "t1 t2", "en", "tiny", 4L),
      (3003L, "t3 t4", "en", "tiny", 4L), (3004L, "t5 t6", "en", "tiny", 4L))
    val dir = docsDir(plants ++ clean ++ tiny)
    val out = run("q195_conformal_threshold", dir)
      .map(r => r.getString(0) -> r).toMap
    // replay from the registered score kernel
    val sc = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, dir).collect()
    }.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    def replay(src: String): (Long, Long, Long, Long, Long, Long, Long) = {
      val cal = sc.filter(t => t._2 == src && t._1 % 2 == 0 && t._3 == 0L)
        .sortBy(t => (t._4, t._1))
      val idx = (9L * (cal.length + 1) + 9L) / 10L
      val tau = if (idx >= 1 && idx <= cal.length)
        Some(cal(idx.toInt - 1)._4) else None
      val test = sc.filter(t => t._2 == src && t._1 % 2 == 1)
      val neg = test.filter(_._3 == 0L)
      val pos = test.filter(_._3 == 1L)
      (cal.length.toLong, if (tau.isDefined) 1L else 0L, tau.getOrElse(0L),
        neg.length.toLong, neg.count(t => tau.exists(t._4 > _)).toLong,
        pos.length.toLong, pos.count(t => tau.exists(t._4 > _)).toLong)
    }
    Seq("big", "tiny").foreach { src =>
      val r = out(src)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7)) === replay(src),
        s"$src conformal replay: $r vs ${replay(src)}")
    }
    assert(out("tiny").getLong(2) === 0L && out("tiny").getLong(5) === 0L,
      "tiny source must take the no-tau conservative branch")
    assert(out("big").getLong(2) === 1L, "big source must resolve a tau")
    assert(out("big").getLong(7) > 0L,
      "plants on the test half must flag (the power read)")
  }

  test("q196: Elias-gamma planner replays bit-for-bit on a controlled postings set") {
    // 4 docs over a tiny vocabulary: "p q" appears in docs 0,1,2,3
    // (df 4, gaps 1,1,1,1), "p r"/"r p" pepper sparse postings.
    val docs = Seq(
      (0L, "p q r p", "en", "s", 8L),
      (1L, "p q", "en", "s", 4L),
      (2L, "p q", "en", "s", 4L),
      (7L, "p q r", "en", "s", 6L))
    val out = run("q196_postings_size_planner", docsDir(docs))
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    // Scala replay: grams per doc, distinct postings, gaps, gamma bits
    def grams(t: String): Seq[String] =
      t.split(" ").toSeq.sliding(2).map(_.mkString(" ")).toSeq
    val postings = docs.flatMap(d => grams(d._2).distinct.map(g => (g, d._1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val perGram = postings.map { case (g, ids) =>
      val gaps = ids.zip(-1L +: ids.dropRight(1)).map(p => p._1 - p._2)
      (g, ids.length.toLong, gaps.map(x => 2L * ilog2(x) + 1L).sum)
    }
    val expected = perGram.groupBy(t => ilog2(t._2)).map { case (b, gs) =>
      val (nGrams, nPost, gBits) =
        (gs.size.toLong, gs.map(_._2).sum, gs.map(_._3).sum)
      b -> ((nGrams, nPost, gBits, nPost * 64L,
        gBits * 1000000L / (nPost * 64L)))
    }
    assert(out === expected, s"planner replay: $out vs $expected")
  }

  test("q197: OOV mass replays exactly against a Scala ranking of the planted vocabulary") {
    // "top": two words with count 150 each (global ranks 1-2);
    // "tail": 300 singleton words — the 256 budget keeps 254 of them
    // (after aa/bb), the larger budgets keep all.
    val top = (0L until 50L).map(i => (i, "aa bb aa bb aa bb", "en", "top", 8L))
    val tail = (100L until 130L).map { i =>
      val words = (0 until 10).map(j => s"t${i}w$j").mkString(" ")
      (i, words, "en", "tail", 8L)
    }
    val rows = run("q197_oov_budget_curve", docsDir(top ++ tail))
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // Scala replay of the global (count DESC, word ASC) ranking
    val counts = (top ++ tail).flatMap(_._2.split(" "))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val ranked = counts.toSeq.sortBy { case (w, c) => (-c, w) }
      .take(4096).zipWithIndex.map { case ((w, _), i) => w -> (i + 1L) }
      .toMap
    for (src <- Seq("top", "tail"); v <- Seq(256L, 1024L, 4096L)) {
      val toks = (if (src == "top") top else tail).flatMap(_._2.split(" "))
      val oov = toks.count(w => ranked.get(w).forall(_ > v)).toLong
      val n = toks.size.toLong
      assert(rows((src, v)) === ((n, oov, oov * 1000000L / n)),
        s"($src, $v): ${rows((src, v))} vs ($n, $oov)")
    }
    // the curve is monotone in the budget by construction
    assert(rows(("tail", 256L))._2 > 0L, "the 256 budget must shed tail mass")
    assert(rows(("tail", 4096L))._2 === 0L, "4096 covers the whole vocabulary")
  }

  test("q198: ring ownership replays exactly and the vnode dial tightens the spread") {
    val docs = (0L until 200L).map(i => (i, s"d$i", "en", "s", 4L))
    val rows = run("q198_ring_vnode_dial", docsDir(docs))
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(rows.size === 24, "3 dials x 8 shards, zero shards densified in")
    // Scala replay of the quantized ring
    import graft.functions.Sketches.h64Scala
    val vn = for (sh <- 0L until 8L; v <- 0L until 16L)
      yield (v, (h64Scala(s"ring:$sh:$v") / 8L) * 8L + sh)
    def owner(docId: Long, dial: Long): Long = {
      val pd = (h64Scala(s"pos:$docId") / 8L) * 8L
      val cand = vn.filter(_._1 < dial).map(_._2)
      val ge = cand.filter(_ >= pd)
      (if (ge.nonEmpty) ge.min else cand.min) % 8L
    }
    for (dial <- Seq(1L, 4L, 16L)) {
      val loads = docs.map(d => owner(d._1, dial))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val n = docs.size.toLong
      (0L until 8L).foreach { sh =>
        val expectN = loads.getOrElse(sh, 0L)
        assert(rows((dial, sh)) === ((expectN, expectN * 1000000L / n)),
          s"dial $dial shard $sh")
      }
    }
    // the dial's purpose, pinned on the real fixture: more vnodes ->
    // tighter spread between the heaviest and lightest shard
    val real = run("q198_ring_vnode_dial", "/root/testdata/sf0.001")
      .map(r => (r.getLong(0), r.getLong(2)))
    def spread(dial: Long): Long = {
      val ns = real.filter(_._1 == dial).map(_._2)
      ns.max - ns.min
    }
    assert(spread(16L) < spread(1L),
      s"vnodes must tighten the spread: ${spread(1L)} -> ${spread(16L)}")
  }

  test("q196: on the real fixture the densest bucket compresses harder than singletons") {
    val rows = run("q196_postings_size_planner", "/root/testdata/sf0.001")
      .map(r => r.getLong(0) -> r.getLong(5)).sortBy(_._1)
    assert(rows.length >= 2, "fixture must populate several df buckets")
    assert(rows.last._2 < rows.head._2,
      s"dense postings must price below singleton postings: $rows")
  }
}
