package graft.queries

import java.nio.file.Files

import graft.SparkSpec

/** L109/L110 semantics beyond the oracles: the AUC replayed by brute
  * O(n²) pair counting (including the tie midrank term, exercised on a
  * fixture where a negative doc shares the plant's exact text), and the
  * MRR replayed from the registered exact/IVF rankings.
  */
class EvalMetricsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String, d: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, d).collect()
    }

  test("q177: AUC replays by O(n^2) pair counting on the fixture") {
    val sc = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, dir)
        .select("source", "pos", "score")
        .as[(String, Long, Long)].collect()
    }
    val out = run("q177_classifier_auc", dir).map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(out.nonEmpty)
    sc.groupBy(_._1).foreach { case (src, rows) =>
      val pos = rows.filter(_._2 == 1L).map(_._3)
      val neg = rows.filter(_._2 == 0L).map(_._3)
      // U2 = over all (pos, neg) pairs: 2 per win, 1 per tie
      val u2 = pos.iterator.map { p =>
        neg.iterator.map { n =>
          if (p > n) 2L else if (p == n) 1L else 0L
        }.sum
      }.sum
      val (np, nn, ns, u2q, auc) = out(src)
      assert(np === pos.length.toLong && nn === neg.length.toLong)
      assert(ns === rows.map(_._3).distinct.length.toLong)
      assert(u2q === u2, s"$src: histogram U2 must equal pair-count U2")
      val expectAuc =
        if (np * nn > 0) (u2 * 1000000L) / (2 * np * nn) else -1L
      assert(auc === expectAuc, s"$src auc")
    }
  }

  test("q177: the tie midrank term counts half on a planted tie fixture") {
    // doc 0 is the %41 plant (scored on the low-entropy block); doc 7
    // carries the SAME text as a negative -> identical NB score ->
    // a genuine pos-vs-neg tie crosses the midrank path
    val d = Files.createTempDirectory("auc-docs").toString
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val rows = Seq(
      (0L, "ignored by the plant rewrite", "en", "s", 10L),
      (7L, block, "en", "s", 10L),
      (1L, "alpha beta gamma delta", "en", "s", 10L),
      (2L, "epsilon zeta eta theta", "en", "s", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = run("q177_classifier_auc", d)
    assert(out.length === 1)
    val r = out.head
    val (np, nn, u2, auc) =
      (r.getLong(1), r.getLong(2), r.getLong(4), r.getLong(5))
    assert(np === 1L && nn === 3L)
    // replay: collect the scores and pair-count
    val sc = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, d)
        .select("doc_id", "pos", "score").as[(Long, Long, Long)].collect()
    }
    val p = sc.filter(_._2 == 1L).map(_._3)
    val n = sc.filter(_._2 == 0L).map(_._3)
    val u2Replay = p.iterator.map(pp => n.iterator.map(nn0 =>
      if (pp > nn0) 2L else if (pp == nn0) 1L else 0L).sum).sum
    assert(u2 === u2Replay)
    // the tie doc shares the plant's text, so at least one exact tie
    // exists and U2 must be odd (an even U2 means no midrank credit)
    assert(n.contains(p.head), "fixture must produce a pos/neg score tie")
    assert(u2 % 2 === 1L, "tie must contribute exactly 1 (half a win)")
    assert(auc === (u2 * 1000000L) / (2 * np * nn))
  }

  test("q178: MRR replays from the registered exact and IVF rankings") {
    val out = run("q178_retrieval_mrr", dir).map(r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(out.nonEmpty)
    val exact = graft.core.CacheScope.scoped {
      LlmPipeline.bruteTopK(spark, dir)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect()
    }
    val ivf = graft.core.CacheScope.scoped {
      LlmPipeline.ivfTopK(spark, dir)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect()
    }
    val top1 = exact.filter(_._2 == 1L).map(r => r._1 -> r._3).toMap
    val ivfRank = ivf.map(r => (r._1, r._3) -> r._2).toMap
    assert(out.length === top1.size)
    var sumRr = 0L; var hit1 = 0L; var hitk = 0L
    out.foreach { case (qid, (t1, rk, rr, nq, srr, h1, hk)) =>
      assert(t1 === top1(qid), s"qid $qid exact top1")
      val expectRk = ivfRank.getOrElse((qid, t1), -1L)
      assert(rk === expectRk, s"qid $qid ivf rank of the exact top1")
      val expectRr = if (expectRk > 0) 1000000L / expectRk else 0L
      assert(rr === expectRr)
      sumRr += expectRr
      if (expectRk == 1L) hit1 += 1
      if (expectRk > 0L) hitk += 1
      assert(nq === top1.size.toLong)
    }
    val (_, _, _, nq, srr, h1, hk) = out.head._2
    assert(srr === sumRr && h1 === hit1 && hk === hitk)
  }

  test("q188: confidence, bins, and ECE replay from the registered scores") {
    val sc = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, dir)
        .select("source", "pos", "score")
        .as[(String, Long, Long)].collect()
    }
    def conf(s: Long): Long =
      if (s >= 0L) {
        val p = 1L << math.min(s, 20L).toInt
        p * 1000000L / (p + 1L)
      } else 1000000L / (1L + (1L << math.min(-s, 20L).toInt))
    val expect = sc.map { case (src, pos, s) =>
      (src, math.min(conf(s) / 100000L, 9L), pos, conf(s))
    }.groupBy(r => (r._1, r._2)).map { case ((src, bin), rows) =>
      val n = rows.length.toLong
      (src, bin) -> (n, rows.map(_._3).sum,
        rows.map(_._4).sum / n, rows.map(_._3).sum * 1000000L / n)
    }
    val eces = expect.groupBy(_._1._1).map { case (src, bs) =>
      val nTot = bs.values.map(_._1).sum
      src -> bs.values.map { case (n, _, cm, acc) =>
        n * math.abs(cm - acc)
      }.sum / nTot
    }
    val out = run("q188_calibration_ece", dir)
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      val (n, np, cm, acc) = expect(k)
      assert(r.getLong(2) === n, s"$k n")
      assert(r.getLong(3) === np, s"$k n_pos")
      assert(r.getLong(4) === cm, s"$k conf_mean")
      assert(r.getLong(5) === acc, s"$k acc")
      assert(r.getLong(6) === eces(k._1), s"$k ece")
      // reliability sanity: both axes live on the ppm probability scale
      assert(cm >= 0L && cm <= 1000000L && acc >= 0L && acc <= 1000000L)
    }
    assert(out.length === expect.size)
  }

  test("q188: a planted overconfident twin drives ECE off zero") {
    // the q177 tie fixture: doc 7 carries the SAME text as the plant,
    // so the model assigns both its maximal confidence — the shared
    // top bin then holds one positive and one negative (acc 500000
    // against conf ≈ 10^6), the textbook overconfidence picture, and
    // ECE must move off zero (on the clean fixture perfect separation
    // truncates ECE to 0 — this is the discriminating branch)
    val d = Files.createTempDirectory("ece-docs").toString
    val block = "ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha ha"
    val rows = Seq(
      (0L, "ignored by the plant rewrite", "en", "s", 10L),
      (7L, block, "en", "s", 10L),
      (1L, "alpha beta gamma delta", "en", "s", 10L),
      (2L, "epsilon zeta eta theta", "en", "s", 10L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = run("q188_calibration_ece", d)
    assert(out.nonEmpty)
    // the bin holding the positive also holds its negative twin (same
    // text → same score → same bin), so its observed rate sits strictly
    // below its mean confidence — and ECE must move off zero
    val posBin = out.filter(_.getLong(3) > 0L).head
    assert(posBin.getLong(2) > posBin.getLong(3),
      "the twin (a negative) shares the positive's bin")
    assert(posBin.getLong(5) < posBin.getLong(4).max(500000L),
      "observed rate must undershoot claimed confidence")
    assert(posBin.getLong(6) > 0L, "overconfident twin must move ECE")
  }

  test("q190: the null control replays and never beats the real labels") {
    val sc = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, dir)
        .select("doc_id", "source", "score")
        .as[(Long, String, Long)].collect()
    }
    val stride = SampleGraphOps.EntropyPlantStride
    val out = run("q190_auc_null_control", dir).map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    sc.groupBy(_._2).foreach { case (src, rows) =>
      val lbl = rows.map { case (id, _, s) =>
        (if (graft.functions.Sketches.h64Scala(s"null:$id")
          % stride == 0) 1L else 0L, s)
      }
      val pos = lbl.filter(_._1 == 1L).map(_._2)
      val neg = lbl.filter(_._1 == 0L).map(_._2)
      val u2 = pos.iterator.map(p => neg.iterator.map(n =>
        if (p > n) 2L else if (p == n) 1L else 0L).sum).sum
      val (np, nn, u2q, auc, dev) = out(src)
      assert(np === pos.length.toLong && nn === neg.length.toLong)
      assert(u2q === u2, s"$src u2")
      val expAuc = if (np * nn > 0) u2 * 1000000L / (2 * np * nn) else -1L
      assert(auc === expAuc)
      assert(dev === (if (expAuc >= 0) math.abs(expAuc - 500000L) else -1L))
    }
    // the harness-honesty invariant: hash labels carry no signal, so
    // the REAL labels' AUC dominates the null wherever both exist
    val real = run("q177_classifier_auc", dir)
      .map(r => r.getString(0) -> r.getLong(5)).toMap
    var compared = 0
    out.foreach { case (src, (_, _, _, aucNull, _)) =>
      if (aucNull >= 0L && real(src) >= 0L) {
        compared += 1
        assert(real(src) >= aucNull,
          s"$src: null labels outscored the real plant ($aucNull vs ${real(src)})")
      }
    }
    assert(compared > 0, "no source had both AUCs defined — control inert")
  }
}
