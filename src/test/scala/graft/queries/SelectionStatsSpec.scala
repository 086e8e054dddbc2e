package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L107/L113/L114 semantics beyond the oracles: the DSIR hashed
  * density-ratio selection replayed end-to-end in plain Scala (feature
  * hashing, smoothed ladders, per-source ranking, plant exclusion),
  * and the Good–Turing / k-anonymity reports replayed from raw token
  * and strata counts.
  */
class SelectionStatsSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def ilog2(x: Long): Long =
    if (x <= 0) 0L else 63L - java.lang.Long.numberOfLeadingZeros(x)

  private def grams(text: String, n: Int): Seq[String] = {
    val ws = text.trim.split("\\s+").toSeq
    if (ws.length < n) Seq.empty
    else ws.sliding(n).map(_.mkString(" ")).toSeq
  }

  private def docs(): Seq[(Long, String, String)] =
    graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source", "text")
        .as[(Long, String, String)].collect().toSeq
    }

  test("q175: the DSIR selection replays end-to-end; plants never kept") {
    val base = docs()
    val pool = base ++ base.filter(_._1 % 83 == 3).map { case (id, src, t) =>
      (id + 1000000L, src, TextCorpusOps.OodMarkerBlock + " " + t)
    }
    val fe = pool.flatMap { case (id, src, t) =>
      grams(t, 2).map(g =>
        (id, src, Sketches.h64Scala("dsir:" + g) % 1024L))
    }
    val tc = fe.filter(r => r._1 % 7 == 0 && r._1 < 1000000L)
      .groupBy(_._3).map { case (f, rs) => f -> rs.length.toLong }
    val nt = tc.values.sum
    val rc = fe.groupBy(_._3).map { case (f, rs) => f -> rs.length.toLong }
    val nr = rc.values.sum
    val perDoc = fe.groupBy(r => (r._1, r._2)).map { case ((id, src), rs) =>
      val score = rs.map { r =>
        ilog2((tc.getOrElse(r._3, 0L) + 1) * 1000000L / (nt + 1024L)) -
          ilog2((rc(r._3) + 1) * 1000000L / (nr + 1024L)) + 21L
      }.sum
      val meanQ20 = score * 1048576L / rs.length
      (id, src, meanQ20, Sketches.h64Scala(s"dsirsel:$id") % 1000000L)
    }.toSeq
    val out = run("q175_dsir_importance_resampling").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(out.nonEmpty)
    perDoc.groupBy(_._2).foreach { case (src, rows) =>
      val ranked = rows.sortBy { case (id, _, m, j) => (-m, -j, id) }
      val quota = (ranked.length / 4).toInt
      val kept = ranked.take(quota)
      val (ns, nk, npl, nplk, smk, ck) = out(src)
      assert(ns === rows.length.toLong, s"$src n_scored")
      assert(nk === quota.toLong, s"$src n_kept")
      assert(npl === rows.count(_._1 >= 1000000L).toLong, s"$src n_plant")
      assert(nplk === kept.count(_._1 >= 1000000L).toLong)
      assert(nplk === 0L, s"$src: planted off-domain docs must sink")
      assert(smk === kept.map(_._3).sum, s"$src kept mean sum")
      assert(ck === kept.map(r =>
        Sketches.h64Scala(s"k:${r._1}") % 1000003L).sum, s"$src checksum")
    }
  }

  test("q181: Good-Turing / Chao1 replay from trigram counts") {
    val counts = docs()
      .flatMap { case (_, src, t) => grams(t, 3).map(src -> _) }
      .groupBy(identity).map { case ((src, g), rs) =>
        (src, g, rs.length.toLong)
      }
    val out = run("q181_good_turing_unseen").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    counts.groupBy(_._1).foreach { case (src, rows) =>
      val n = rows.map(_._3).sum
      val v = rows.size.toLong
      val f1 = rows.count(_._3 == 1L).toLong
      val f2 = rows.count(_._3 == 2L).toLong
      val (nQ, vQ, f1Q, f2Q, unseen, chao1) = out(src)
      assert((nQ, vQ, f1Q, f2Q) === ((n, v, f1, f2)), s"$src profile")
      assert(unseen === f1 * 1000000L / n)
      assert(chao1 === v + f1 * f1 / (2 * f2 + 1))
      // the estimate must be non-degenerate at the gated fixture:
      // singletons exist (else "unseen mass" reads as exactly zero and
      // the gate proves nothing)
      assert(f1 > 0L, s"$src: trigram tail must contain singletons")
    }
  }

  test("q182: small-cell audit replays from strata counts") {
    val cells = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select("source", "lang", "n_chars")
        .as[(String, String, Long)].collect()
    }.groupBy { case (src, lang, nc) =>
      (src, lang, math.min(nc / 256L, 7L))
    }.map { case (k, rs) => k -> rs.length.toLong }
    val out = run("q182_kanon_small_cells").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    cells.groupBy(_._1._1).foreach { case (src, strata) =>
      val small = strata.filter(_._2 < 5L)
      val (nStrata, nSmall, supp, rel, ck) = out(src)
      assert(nStrata === strata.size.toLong)
      assert(nSmall === small.size.toLong)
      assert(supp === small.values.sum)
      assert(rel === strata.values.sum - small.values.sum)
      assert(ck === small.keys.map { case (s2, l, b) =>
        Sketches.h64Scala(s"cell:$s2:$l:$b") % 1000003L
      }.sum)
    }
  }

  test("q187: the Zipf fit replays; every fixture source slopes downward") {
    val vc = docs().flatMap { case (_, src, text) =>
      text.trim.split("\\s+").toSeq.map(src -> _)
    }.groupBy(identity).map { case ((src, w), rs) =>
      (src, w, rs.length.toLong)
    }.toSeq
    val expect = vc.groupBy(_._1).map { case (src, rows) =>
      val ranked = rows.sortBy(r => (-r._3, r._2)).zipWithIndex
        .map { case ((_, _, c), i) => (ilog2(i + 1L), ilog2(c), c) }
      val n = ranked.length.toLong
      val sx = ranked.map(_._1).sum
      val sy = ranked.map(_._2).sum
      val sxy = ranked.map(r => r._1 * r._2).sum
      val sxx = ranked.map(r => r._1 * r._1).sum
      val slope = (n * sxy - sx * sy) * 1000000L /
        math.max(n * sxx - sx * sx, 1L)
      val icept = (sy * 1000000L - slope * sx) / n
      src -> (n, ranked.map(_._3).sum, slope, icept)
    }
    val out = run("q187_zipf_slope").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toMap
    assert(out === expect)
    // the corpus-health read: rank-frequency curves never RISE, and
    // the bulk of sources strictly decline (the ilog2 ladder flattens
    // a near-uniform vocabulary to slope 0 — one fixture source sits
    // there; a positive slope anywhere would mean the fit broke)
    out.foreach { case (src, (_, _, slope, _)) =>
      assert(slope <= 0L, s"$src: rank-frequency slope must not rise")
    }
    assert(out.count(_._2._3 < 0L) > out.size / 2,
      "most sources must slope strictly downward")
  }
}
