package graft.queries

import graft.SparkSpec
import graft.functions.Sketches

/** L115/L116/L117 semantics beyond the oracles: the IPF raking
  * alternation replayed step-by-step in plain Scala integer arithmetic,
  * the word2vec frequent-token subsample replayed occurrence-by-
  * occurrence (plus the structural claim the report implies: ONLY the
  * frequent class loses mass), and the HLL inclusion–exclusion overlap
  * replayed from raw registers against exact set intersections.
  */
class AllocationSketchSpec extends SparkSpec {

  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private def run(q: String) =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect()
    }

  private def docs(): Seq[(Long, String, String, Long)] =
    graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select("doc_id", "source", "text", "n_chars")
        .as[(Long, String, String, Long)].collect().toSeq
    }

  test("q183: the IPF alternation replays; marginals converge") {
    val base = docs()
    val cells = base.groupBy(r => (r._2, math.min(r._4 / 256L, 7L)))
      .map { case (k, rs) => k -> rs.length.toLong }
    val t = cells.values.sum
    val rwgt = cells.keys.map(_._1).toSeq.distinct.sorted.zipWithIndex
      .map { case (s, i) => s -> (i + 1L) }.toMap
    val srw = rwgt.values.sum
    val wgt = cells.keys.map(_._2).toSeq.distinct
      .map(b => b -> (8L - b)).toMap
    val sw = wgt.values.sum
    var m = cells.map { case (k, n) => k -> n * 1000000L / t }
    for (_ <- 1 to AllocationSketchOps.IpfIters) {
      val rs = m.groupBy(_._1._1).map { case (s, r) => s -> r.values.sum }
      m = m.map { case (k, v) =>
        k -> v * (rwgt(k._1) * 1000000L / srw) / math.max(rs(k._1), 1L)
      }
      val cs = m.groupBy(_._1._2).map { case (b, r) => b -> r.values.sum }
      m = m.map { case (k, v) =>
        k -> v * (wgt(k._2) * 1000000L / sw) / math.max(cs(k._2), 1L)
      }
    }
    val rowResid = m.groupBy(_._1._1).map { case (s, r) =>
      math.abs(r.values.sum - rwgt(s) * 1000000L / srw)
    }.sum
    val colResid = m.groupBy(_._1._2).map { case (b, r) =>
      math.abs(r.values.sum - wgt(b) * 1000000L / sw)
    }.sum
    val out = run("q183_ipf_raking")
    assert(out.nonEmpty)
    out.foreach { r =>
      val k = (r.getString(0), r.getLong(1))
      assert(r.getLong(2) === cells(k), s"$k n_docs")
      assert(r.getLong(3) === m(k), s"$k m_ppm")
      assert(r.getLong(4) === rowResid, "row_resid")
      assert(r.getLong(5) === colResid, "col_resid")
    }
    assert(out.length === cells.size)
    // the alternation must actually FIT: the double-iterations land
    // both marginals within 0.1% of their targets on the fixture (the
    // observed uniform source shares start far from the rank-ramp
    // row target)
    assert(rowResid < 1000L, s"row marginals off by $rowResid ppm")
    assert(colResid < 1000L, s"col marginals off by $colResid ppm")
    val resid0 = cells.groupBy(_._1._1).map { case (s, r) =>
      math.abs(r.map { case (_, n) => n * 1000000L / t }.sum
        - rwgt(s) * 1000000L / srw)
    }.sum
    assert(resid0 > rowResid * 10,
      s"fixture starts near-fitted (initial $resid0) — the gate proves nothing")
  }

  test("q184: the subsample replays; only the frequent class loses mass") {
    val toks = docs().flatMap { case (id, src, text, _) =>
      text.trim.split("\\s+").toSeq.zipWithIndex.map { case (w, i) =>
        (id, src, i + 1L, w)
      }
    }
    val vc = toks.groupBy(_._4).map { case (w, rs) => w -> rs.length.toLong }
    val n = vc.values.sum
    val keep = vc.map { case (w, c) =>
      val p = c * 1000000L / n
      val q20 = math.min(1048576L,
        math.floor(math.sqrt(
          (1000L * 1099511627776L / math.max(p, 1L)).toDouble)).toLong)
      w -> (p, q20)
    }
    val scored = toks.map { case (id, src, pos, w) =>
      val (p, q20) = keep(w)
      val kept = Sketches.h64Scala(s"ss:$id:$pos") % 1048576L < q20
      (src, w, p > 1000L, kept)
    }
    val out = run("q184_frequent_token_subsample").map(r =>
      r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    scored.groupBy(_._1).foreach { case (src, rows) =>
      val (nt, nk, fm, fk, vb, va) = out(src)
      assert(nt === rows.length.toLong, s"$src n_tokens")
      assert(nk === rows.count(_._4).toLong, s"$src n_kept")
      assert(fm === rows.count(_._3).toLong, s"$src freq_mass")
      assert(fk === rows.count(r => r._3 && r._4).toLong, s"$src freq_kept")
      assert(vb === rows.map(_._2).distinct.length.toLong, s"$src v_before")
      assert(va === rows.filter(_._4).map(_._2).distinct.length.toLong)
      // the word2vec contract: a token at or under the t threshold has
      // acceptance 2^20 — certain — so every dropped occurrence is
      // frequent-class, and something must actually drop
      assert(nt - nk === fm - fk, s"$src: non-frequent mass shrank")
      assert(fk < fm, s"$src: no frequent occurrence dropped — dial dead")
    }
  }

  test("q185: HLL inclusion-exclusion replays from raw registers") {
    def rho(h: Long): Long = {
      val m = h & ((1L << 54) - 1)
      math.min(if (m == 0L) 55L
        else 55L - (64L - java.lang.Long.numberOfLeadingZeros(m)), 30L)
    }
    def est(regs: Map[Long, Long]): Long = {
      val sHit = regs.values.map(r => 1L << (30 - r)).sum
      709L * 64 * 64 * (1L << 30) /
        ((sHit + (64L - regs.size) * (1L << 30)) * 1000L)
    }
    val sets = docs().flatMap { case (_, src, text, _) =>
      val ws = text.trim.split("\\s+").toSeq
      (if (ws.length < 3) Seq.empty[String]
       else ws.sliding(3).map(_.mkString(" ")).toSeq.distinct)
        .map(src -> _)
    }
    val regsBySrc = sets.map { case (src, w) => (src, Sketches.h64Scala(w)) }
      .groupBy(_._1).map { case (src, rs) =>
        src -> rs.map(_._2).groupBy(_ >> 54)
          .map { case (reg, hs) => reg -> hs.map(rho).max }
      }
    val bySrc = sets.groupBy(_._1).map { case (s, rs) =>
      s -> rs.map(_._2).toSet
    }
    val out = run("q185_hll_overlap_calibration")
    assert(out.nonEmpty)
    out.foreach { r =>
      val (s1, s2) = (r.getString(0), r.getString(1))
      val exact = (bySrc(s1) & bySrc(s2)).size.toLong
      val (e1, e2) = (est(regsBySrc(s1)), est(regsBySrc(s2)))
      val eu = est((regsBySrc(s1).toSeq ++ regsBySrc(s2).toSeq)
        .groupBy(_._1).map { case (reg, rs) => reg -> rs.map(_._2).max })
      assert(r.getLong(2) === exact, s"($s1,$s2) n_exact")
      assert(r.getLong(3) === e1, s"($s1,$s2) est_s1")
      assert(r.getLong(4) === e2, s"($s1,$s2) est_s2")
      assert(r.getLong(5) === eu, s"($s1,$s2) est_union")
      assert(r.getLong(6) === e1 + e2 - eu, s"($s1,$s2) est_inter")
      assert(r.getLong(7) === e1 + e2 - eu - exact, s"($s1,$s2) err")
    }
    val srcs = bySrc.keys.toSeq.sorted
    assert(out.length === srcs.length * (srcs.length - 1) / 2,
      "every source pair must report")
    assert(out.exists(_.getLong(2) > 0L),
      "fixture has no overlapping pair — the calibration gates nothing")
  }

  test("q189: Lincoln–Petersen replays; a planted duplicate mass is priced") {
    // the gated fixture carries no exact-dup texts, so plant one: 800
    // distinct texts + 200 copies in one source — dup_ppm must read
    // 200000 exactly, and the estimator must land near the distinct
    // count (the salts are fixed, so "near" is a deterministic number
    // the replay reproduces exactly; the ±bound proves it's calibrated,
    // not wild)
    import org.apache.spark.sql.functions.col
    val d = java.nio.file.Files.createTempDirectory("cr-docs").toString
    val rows = (0L until 800L).map(i =>
      (i, s"unique text body number $i", "en", "s", 20L)) ++
      (800L until 1000L).map(i =>
        (i, s"unique text body number ${i % 200}", "en", "s", 20L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q189_capture_recapture")(spark, d).collect()
    }
    assert(out.length === 1)
    val r = out.head
    // replay from first principles
    val fps = rows.map(_._2).distinct.map(Sketches.h64Scala)
    val s1 = fps.filter(f => Sketches.h64Scala(s"cr1:$f") % 8 == 0)
    val s2 = fps.filter(f => Sketches.h64Scala(s"cr2:$f") % 8 == 0)
    val m = s1.toSet.intersect(s2.toSet).size.toLong
    val est = s1.length.toLong * s2.length.toLong / math.max(m, 1L)
    assert(r.getLong(1) === 1000L && r.getLong(2) === 800L)
    assert(r.getLong(3) === s1.length.toLong)
    assert(r.getLong(4) === s2.length.toLong)
    assert(r.getLong(5) === m)
    assert(r.getLong(6) === est && r.getLong(7) === est - 800L)
    assert(r.getLong(8) === 200000L, "dup rate must read 20% exactly")
    assert(m > 0L, "800 distinct at 1/8 × 1/8 must overlap — salts broke")
    assert(math.abs(est - 800L) < 400L,
      s"estimator wildly off on a clean universe (est $est)")
  }

  test("q191: the plan replays; a starved top-share source is flagged") {
    import org.apache.spark.sql.functions.col
    // source names sort "a-big" < "zz-tiny", so the rank ramp hands
    // zz-tiny the TOP share while it holds almost no tokens — the
    // data-constrained flag must fire there and only there
    val d = java.nio.file.Files.createTempDirectory("plan-docs").toString
    val big = (0L until 200L).map(i =>
      (i, Seq.fill(40)("w").mkString(" "), "en", "a-big", 80L))
    val tiny = (1000L until 1002L).map(i =>
      (i, "w w", "en", "zz-tiny", 3L))
    (big ++ tiny).toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    val out = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q191_epoch_planner")(spark, d).collect()
    }.map(r => r.getString(0) -> (r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getBoolean(6))).toMap
    val supBig = out("a-big")._1
    val supTiny = out("zz-tiny")._1
    val t = supBig + supTiny
    // shares: ramp 1,2 over srw 3
    assert(out("a-big")._2 === 1000000L / 3L)
    assert(out("zz-tiny")._2 === 2000000L / 3L)
    Seq("a-big" -> supBig, "zz-tiny" -> supTiny).foreach { case (s0, sup) =>
      val share = out(s0)._2
      val demand = (t / 2L) * share / 1000000L
      assert(out(s0)._3 === demand, s"$s0 demand")
      assert(out(s0)._4 === demand * 1024L / math.max(sup, 1L), s"$s0 epochs")
    }
    assert(!out("a-big")._5, "the supplied source must not flag")
    assert(out("zz-tiny")._5,
      "a top-share source with no tokens must flag data-constrained")
    // and on the real fixture nothing flags (supply comfortably covers
    // the half-budget mixture) — the flag is a branch, not a constant
    val fixture = run("q191_epoch_planner")
    assert(fixture.forall(!_.getBoolean(6)))
  }
}
