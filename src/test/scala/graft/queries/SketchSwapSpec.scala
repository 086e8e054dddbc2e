package graft.queries

import graft.SparkSpec

/** L156–L160: the sketch-swap tier must reproduce its exact-form
  * twins ROW FOR ROW at the gated fixtures (the k ≥ n exactness
  * predicate), and the predicate's preconditions must actually hold
  * there — otherwise the equality tests would be testing luck.
  */
class SketchSwapSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def rows(q: String): Seq[Seq[Any]] =
    graft.core.CacheScope.scoped {
      graft.SparkEntry.queries(q)(spark, dir).collect().toSeq.map(_.toSeq)
    }

  test("exactness preconditions: group sizes under k, ids inside the guard domain") {
    import org.apache.spark.sql.functions._
    val docs = graft.core.Tables.documents(spark, dir)
    val (nDocs, maxDoc) = docs
      .agg(count(lit(1)), max(col("doc_id")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(nDocs <= 8192L, "global sketch (q224) must hold the corpus")
    assert(maxDoc < SketchSwapOps.IdDomain, "combined-key id domain")
    val emb = graft.core.Tables.embeddings(spark, dir)
    val (maxLabelN, maxVec) = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), max(col("vec_id")).as("mv"))
      .agg(max(col("n")), max(col("mv")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).head
    assert(maxLabelN <= 8192L && maxVec < SketchSwapOps.IdDomain)
    // q226's signed-score precondition (ADVICE r17): the +2^30 bias
    // keeps every combined key non-negative ONLY while NB scores stay
    // above -2^30 — and the 2^59 key bound needs the biased value
    // under 2^32. Assert both on the engine's own score frame, so a
    // future scoring change that breaks either bound fails HERE, not
    // silently outside the gated fixture.
    val (minScore, maxScore) = graft.core.CacheScope.scoped {
      TrainedFilterOps.nbDocScores(spark, dir)
        .agg(min(col("score")), max(col("score")))
        .collect().map(r => (r.getLong(0), r.getLong(1))).head
    }
    assert(minScore > -(1L << 30), s"min NB score $minScore must exceed -ScoreBias")
    assert(maxScore + (1L << 30) < (1L << 32),
      s"max biased score must stay under 2^32 for the 2^59 key bound")
  }

  test("combined-key guard raises loudly outside the id domain") {
    // VERDICT r17 #7: a production corpus whose ids outgrow 2^IdBits
    // must fail loudly, not collide silently. The guard is the shared
    // key constructor, so one raise here covers every q224–q233 site.
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val ok = Seq((5L, 3L), (0L, SketchSwapOps.IdDomain - 1L)).toDF("v", "id")
      .select(SketchSwapOps.combinedKey(col("v"), col("id")).as("key"))
      .collect().map(_.getLong(0)).toSeq
    assert(ok === Seq(5L * SketchSwapOps.IdDomain + 3L,
      SketchSwapOps.IdDomain - 1L))
    def raises(v: Long, id: Long): Unit = {
      val e = intercept[Exception] {
        Seq((v, id)).toDF("v", "id")
          .select(SketchSwapOps.combinedKey(col("v"), col("id")))
          .collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Seq.empty
        else Option(t.getMessage).toSeq ++ msgs(t.getCause)
      assert(msgs(e).exists(_.contains("combined-key domain violation")),
        s"($v, $id) must raise the guard, got: ${e.getMessage}")
    }
    raises(5L, SketchSwapOps.IdDomain) // id at the domain edge
    raises(5L, -1L)      // negative id
    raises(-1L, 3L)      // negative (post-bias) value
    raises(SketchSwapOps.ValueBound, 3L) // value past the int64-safe bound
    // nulls pass THROUGH as null keys (the aggregate skips them): one
    // bad row costs one sample draw, never the whole nightly job
    val withNull = Seq((Some(5L), Some(3L)), (None, Some(4L)),
        (Some(6L), None)).toDF("v", "id")
      .select(SketchSwapOps.combinedKey(col("v"), col("id")).as("key"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(withNull === Seq(Some(5L * SketchSwapOps.IdDomain + 3L),
      None, None), "null inputs yield null keys, no raise")
  }

  test("q228 clamp: the shifted Gini numerator never goes negative across engines") {
    // code-review r18: two equal docs of 2^27+1 chars — the unshifted
    // numerator is exactly 0 (perfect equality), but the two
    // independent floor-shifts push the shifted form to -1, where
    // Spark div (truncation, -> 0) and DuckDB // (floor, -> -1)
    // diverge. The clamp at 0 is the parity fix AND the truth: the
    // unshifted numerator is >= 0 by the Chebyshev sum inequality
    // (x is rank-sorted ascending).
    val x = (1L << 27) + 1L
    val xs = Seq(x, x)
    val n = xs.length.toLong
    val tot = xs.sum
    val srx = xs.zipWithIndex.map { case (v, i) => (i + 1) * v }.sum
    assert(2L * srx - (n + 1) * tot === 0L, "unshifted numerator is zero")
    val sc = math.max(graft.functions.Sketches.ilog2Scala(tot) - 27L, 0L)
    assert(sc === 1L, "the ladder engages")
    val shifted = 2L * (srx >> sc) - (n + 1) * (tot >> sc)
    assert(shifted === -1L, "floor-shifts push the numerator negative")
    val clamped = math.max(shifted, 0L) * 1000000L /
      math.max(n * (tot >> sc), 1L)
    assert(clamped === 0L, "clamped Gini is the true 0 on both engines")
  }

  test("q228 overflow ladder: shifted Lorenz sums track BigInt truth where longs wrap") {
    // ADVICE r17: (2·srx − (n+1)·tot)·10^6 wraps a Java long once docs
    // near ~90K chars fill an 8192-sample. Replay the shifted form on a
    // synthetic regime PAST the wrap point and pin it against exact
    // BigInt arithmetic: the ladder must stay within the truncation
    // budget (n_docs+2 units of the final ppm) while the UNSHIFTED
    // numerator provably leaves the long domain.
    val n = 8192L
    // one ~1.2 GB doc among 8191 one-char docs: Gini → 1, so the
    // numerator difference itself approaches n·tot and its ppm
    // multiply leaves the long domain
    val xs = (1L until n).map(_ => 1L) :+ 1200000000L
    val tot = xs.sum
    val srx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
    val unshifted = BigInt(2) * srx - BigInt(n + 1) * tot
    assert(unshifted * 1000000 > BigInt(Long.MaxValue),
      "fixture must sit past the long wrap point")
    val sc = math.max(graft.functions.Sketches.ilog2Scala(tot) - 27L, 0L)
    assert(sc > 0L, "the ladder must engage in this regime")
    val giniShifted = ((2L * (srx >> sc) - (n + 1) * (tot >> sc)) *
      1000000L) / math.max(n * (tot >> sc), 1L)
    val giniTrue = ((BigInt(2) * srx - BigInt(n + 1) * tot) *
      1000000 / (BigInt(n) * tot)).toLong
    assert(math.abs(giniShifted - giniTrue) <= 2L,
      s"shifted $giniShifted vs true $giniTrue")
    // every product in the shifted form stays under 2^63
    assert((BigInt(2) * (srx >> sc) * 1000000).bitLength < 63)
    assert((BigInt(n + 1) * (tot >> sc) * 1000000).bitLength < 63)
  }

  test("q224 == q167: sketched stage cuts reproduce the ntile table") {
    assert(rows("q224_curriculum_stages_sketched") ===
      rows("q167_curriculum_stages"))
  }

  test("q225 == q171: sketched median/MAD reproduce the exact fences") {
    assert(rows("q225_mad_outliers_sketched") === rows("q171_mad_outliers"))
  }

  test("q226 == q195: sketched τ reproduces conformal coverage incl. no-τ branch") {
    val exact = rows("q195_conformal_threshold")
    assert(exact.nonEmpty)
    assert(rows("q226_conformal_threshold_sketched") === exact)
    // the fixture exercises the no-τ branch (parity confounds source
    // and split here: test-half sources have no calibration docs), so
    // the equality covers the NULL-τ path, not just the happy path
    assert(exact.exists(_(2) == 0L), "no-τ branch exercised")
  }

  test("q227 == q219: sketched norm medians reproduce the health profile") {
    assert(rows("q227_norm_health_sketched") ===
      rows("q219_embedding_norm_health"))
  }

  test("q228 == q200: sample Gini is exact at k >= n") {
    assert(rows("q228_mass_concentration_sketched") ===
      rows("q200_mass_concentration"))
  }

  test("q229: control rows exact; the k=16 sketch replays hash-for-hash in Scala") {
    // (source, k) -> (n, exact_p50, sk_p50, value_err, rank, rank_err_ppm)
    val out = rows("q229_bottomk_accuracy_ladder").map(r =>
      (r(0).asInstanceOf[String], r(1).asInstanceOf[Long]) ->
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
          r(4).asInstanceOf[Long], r(5).asInstanceOf[Long],
          r(6).asInstanceOf[Long], r(7).asInstanceOf[Long])).toMap
    assert(out.nonEmpty && out.keys.map(_._2).toSet === Set(16L, 64L, 256L))
    // control: whenever k >= n the sketched median IS the exact one
    out.foreach { case ((src, k), (n, _, _, vErr, rank, rErr)) =>
      if (k >= n) {
        assert(vErr === 0L, s"$src k=$k control value")
        assert(rank === (n + 1) / 2 && rErr === 0L, s"$src k=$k control rank")
      }
    }
    // independent replay of the REAL sketch (k = 16 < n): recompute the
    // bottom-16 sample and its nearest-rank median in plain Scala from
    // the engine's own token frame, per source
    import org.apache.spark.sql.functions._
    val base = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"),
          graft.functions.TextFunctions.tokenCountBpeIsh(col("text"))
            .cast("long").as("tok"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    base.groupBy(_._1).foreach { case (src, docs) =>
      val keys = docs.map { case (_, id, tok) =>
        tok * SketchSwapOps.IdDomain + id }
      val n = keys.length.toLong
      val sample = keys
        .sortBy(v => (graft.plans.BottomKSketchAgg.hash("q229:16", v), v))
        .take(16).sorted
      val idx = math.max(1L, ((n + 1) / 2) * sample.length / n)
      val expectP50 = sample(idx.toInt - 1) / SketchSwapOps.IdDomain
      val expectRank = keys.count(_ <= sample(idx.toInt - 1)).toLong
      val (nn, _, skP50, _, rank, rErr) = out((src, 16L))
      assert(nn === n)
      assert(skP50 === expectP50, s"$src sketched median replay")
      assert(rank === expectRank, s"$src realized rank replay")
      assert(rErr === math.abs(expectRank - (n + 1) / 2) * 1000000L / n)
    }
  }

  test("q230: k=8192 control agrees totally; populations conserved per k") {
    val out = rows("q230_stage_swap_degradation").map(r =>
      (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long]) ->
        (r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
          r(4).asInstanceOf[Long], r(5).asInstanceOf[Long])).toMap
    val ks = out.keys.map(_._1).toSet
    assert(ks === Set(64L, 512L, 8192L))
    // control: at k >= n the cuts are the exact ntile boundaries
    out.filter(_._1._1 == 8192L).foreach {
      case ((_, st), (ne, nsk, na, ppm)) =>
        assert(ne === nsk && na === ne && ppm === 1000000L,
          s"stage $st control must agree totally")
    }
    // conservation: both assignments partition the corpus at every k
    val total = out.filter(_._1._1 == 8192L).values.map(_._1).sum
    ks.foreach { k =>
      val rowsK = out.filter(_._1._1 == k).values
      assert(rowsK.map(_._1).sum === total, s"k=$k exact partition")
      assert(rowsK.map(_._2).sum === total, s"k=$k sketched partition")
      rowsK.foreach { case (ne, _, na, ppm) =>
        assert(na <= ne && ppm <= 1000000L)
      }
    }
  }

  test("q231: exact unbinned KS/W1 replay; unbinned dominates the binned q169") {
    import org.apache.spark.sql.functions._
    // plain-Scala replay of the exact statistic (k >= half size here,
    // so the samples ARE the halves)
    val base = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    val expected = base.groupBy(_._1).map { case (src, docs) =>
      val ref = docs.filter(_._2 % 2 == 0).map(_._3)
      val cur = docs.filter(_._2 % 2 == 1).map(_._3)
      val (nr, nc) = (ref.length.toLong, cur.length.toLong)
      val vs = (ref ++ cur).distinct.sorted
      var (cumR, cumC) = (0L, 0L)
      val gaps = vs.map { v =>
        cumR += ref.count(_ == v); cumC += cur.count(_ == v)
        v -> math.abs(cumR * 1000000L / math.max(nr, 1L) -
          cumC * 1000000L / math.max(nc, 1L))
      }
      val ks = gaps.map(_._2).max
      val ksAt = gaps.filter(_._2 == ks).map(_._1).min
      val runs = vs.zip(vs.drop(1)).map { case (a, b) => b - a } :+ 0L
      val w1 = gaps.map(_._2).zip(runs).map { case (g, r) => g * r }.sum
      src -> (nr, nc, ks, ksAt, w1)
    }
    val out = rows("q231_unbinned_sample_drift").map(r =>
      r(0).asInstanceOf[String] -> (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Long])).toMap
    assert(out === expected)
    // resolution dominance: the unbinned KS can only see MORE than the
    // 32-bin q169 form (binning merges ECDF steps, never sharpens them)
    val binned = rows("q169_ks_drift").map(r =>
      r(0).asInstanceOf[String] -> r(3).asInstanceOf[Long]).toMap
    binned.foreach { case (src, ksBinned) =>
      assert(out(src)._3 >= ksBinned, s"$src unbinned >= binned KS")
    }
  }

  test("q232: roll-forward equals full rebuild at k < n, replayed in Scala") {
    import org.apache.spark.sql.functions._
    val out = rows("q232_sketch_ledger_rollforward").map(r =>
      r(0).asInstanceOf[String] -> (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Long],
        r(6).asInstanceOf[Long], r(7).asInstanceOf[Long])).toMap
    assert(out.nonEmpty)
    // the merge law holds for EVERY source, and not vacuously: at
    // least one source's full population exceeds k = 16 (so the sketch
    // truly truncated) — with this fixture every source does
    out.foreach { case (src, (n0, n1, nAll, sn, p50r, p50f, m)) =>
      assert(m === 1L, s"$src roll-forward must equal full rebuild")
      assert(p50r === p50f)
      assert(n0 + n1 === nAll)
      assert(sn === math.min(nAll, 16L), s"$src sample size")
    }
    assert(out.values.forall(_._3 > 16L), "every source truncates at k=16")
    // independent Scala replay of one source's roll-forward
    val base = graft.core.CacheScope.scoped {
      graft.core.Tables.documents(spark, dir)
        .select(col("source"), col("doc_id"), col("n_chars"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    }
    def bk(keys: Seq[Long]): Seq[Long] = keys
      .sortBy(v => (graft.plans.BottomKSketchAgg.hash("q232", v), v))
      .take(16).sorted
    base.groupBy(_._1).foreach { case (src, docs) =>
      val keys = docs.map { case (_, id, c) =>
        (id, c * SketchSwapOps.IdDomain + id) }
      val led = bk(keys.filter(_._1 % 2 == 0).map(_._2))
      val rolled = bk(led ++ keys.filter(_._1 % 2 == 1).map(_._2))
      val full = bk(keys.map(_._2))
      assert(rolled === full, s"$src merge law replay")
      val expectP50 = rolled((rolled.length + 1) / 2 - 1) /
        SketchSwapOps.IdDomain
      assert(out(src)._5 === expectP50, s"$src p50 replay")
    }
  }

  test("q234: stored-artifact roll-forward equals full rebuild; counts carry") {
    val out = rows("q234_sketch_ledger_store").map(r =>
      r(0).asInstanceOf[String] -> (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[Long], r(5).asInstanceOf[Long],
        r(6).asInstanceOf[Long], r(7).asInstanceOf[Long])).toMap
    assert(out.nonEmpty)
    out.foreach { case (src, (n0, n1, nAll, nLed, sn, _, m)) =>
      assert(m === 1L, s"$src stored roll-forward must equal full rebuild")
      assert(n0 + n1 === nAll, s"$src day split partitions the corpus")
      assert(nLed === nAll, s"$src ledger count carry")
      assert(sn === math.min(nAll, 16L), s"$src sample size")
      assert(nAll > 16L, s"$src truncates at k=16 (the law, not retention)")
    }
    // q232 (in-query law) and q234 (stored-artifact law) see the same
    // corpus: the day splits and totals agree row for row
    val inQuery = rows("q232_sketch_ledger_rollforward").map(r =>
      r(0).asInstanceOf[String] -> (r(1).asInstanceOf[Long],
        r(2).asInstanceOf[Long], r(3).asInstanceOf[Long])).toMap
    out.foreach { case (src, (n0, n1, nAll, _, _, _, _)) =>
      assert(inQuery(src) === ((n0, n1, nAll)), s"$src splits agree with q232")
    }
  }

  test("q233: budget rollup is consistent with q229; theory columns replay") {
    val acc = rows("q229_bottomk_accuracy_ladder").map(r =>
      (r(1).asInstanceOf[Long], r(7).asInstanceOf[Long]))
    val out = rows("q233_sketch_error_budget").map(r =>
      r(0).asInstanceOf[Long] -> (r(1).asInstanceOf[Long],
        r(3).asInstanceOf[Long], r(4).asInstanceOf[Long],
        r(5).asInstanceOf[Long], r(6).asInstanceOf[Long],
        r(7).asInstanceOf[Long], r(8).asInstanceOf[Long])).toMap
    assert(out.keySet === Set(16L, 64L, 256L))
    out.foreach { case (k, (nG, se, se3, maxM, within, bS, bT)) =>
      // theory replay: eps_se = 10^6/(2*isqrt(k)) — exact on this grid
      val sq = math.sqrt(k.toDouble).toLong
      assert(sq * sq === k, "grid is perfect squares")
      assert(se === 1000000L / (2L * sq) && se3 === 3L * se)
      // memory geometry priced off the agg's OWN exported constants
      // (VERDICT r17 #6), and those constants must match the real
      // serialized layout: two 8-byte longs per kept pair
      val bpp = graft.plans.BottomKSketchAgg.BytesPerPair.toLong
      val tf = graft.plans.BottomKSketchAgg.TransientPairsFactor.toLong
      assert(bpp === 16L && tf === 2L, "exported geometry matches serializer")
      assert(bS === bpp * k && bT === bpp * tf * k)
      // measured rollup: the worst q229 source at this k, exactly
      val expect = acc.filter(_._1 == k).map(_._2).max
      assert(maxM === expect, s"k=$k worst measured error")
      assert(within === (if (maxM <= se3) 1L else 0L))
      assert(nG === acc.count(_._1 == k).toLong)
    }
    // at this fixture the sketch is calibrated: every k within 3σ, and
    // the control k (>= every group) measures zero
    assert(out.values.forall(_._5 == 1L), "all k within the 3σ budget")
    assert(out(256L)._4 === 0L, "control k measures zero error")
  }

  test("k < n protocol: deterministic sample, in-bounds nearest-rank index") {
    // plain-Scala replay of the bottom-k protocol at k = 16 over 100
    // distinct keys: the sample is a pure function of the salted md5
    // order, and the downscaled rank index lands inside the sample for
    // every rank — the production (k < n) regime's two load-bearing
    // properties, testable without an engine
    val keys = (0L until 100L).map(v => v * SketchSwapOps.IdDomain + v)
    def sample(k: Int): Seq[Long] = keys
      .sortBy(v => (graft.plans.BottomKSketchAgg.hash("spec", v), v))
      .take(k).sorted
    val s16a = sample(16)
    assert(s16a === sample(16), "sample is deterministic")
    assert(s16a.toSet.subsetOf(keys.toSet) && s16a.size === 16)
    (1L to 100L).foreach { r =>
      val idx = math.max(1L, r * s16a.size / 100L)
      assert(idx >= 1L && idx <= s16a.size, s"rank $r index in bounds")
    }
    // k >= n degenerates to the identity: sample IS the sorted keys
    // and the index formula returns the rank itself
    val sAll = sample(128)
    assert(sAll === keys.sorted)
    (1L to 100L).foreach { r =>
      assert(math.max(1L, r * sAll.size / 100L) === r)
    }
  }
}
