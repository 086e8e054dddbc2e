package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Governance-closure operators (SURVEY §2.11a, L153–L154):
  *
  *  - L153 threshold-transfer matrix       → q221
  *  - L154 sketch-capacity planner         → q222
  *
  * Two reads that close loops other tiers opened: L127 hands every
  * source a conformal threshold with a finite-sample guarantee — but
  * pipelines constantly REUSE a threshold tuned on one source for
  * another (a new source arrives mid-quarter; a dashboard hardcodes
  * last month's τ), and the guarantee does not transfer; the matrix
  * measures exactly how wrong each cross-application is. And the
  * sketch tier (L64 Bloom, L67 CMS, L69 HLL) ships fixed-geometry
  * sketches whose dials someone must SIZE for the corpus at hand;
  * the planner derives the classic sizing formulas from the corpus's
  * own key universe — estimated by the tier's OWN graft_hll sketch,
  * with the exact count riding only as the truth/error column — in
  * the same documented-Q10-constant ladders as every other planner
  * (L123/L136/L147).
  *
  * Determinism: the matrix consumes the REGISTERED τ protocol
  * (CorpusAnalysisOps.conformalTaus) and the planner is pure integer
  * arithmetic with Q10 floors of 1/ln2, e, and 1.04.
  */
object TransferSizingOps {

  /** L154 dial grids: Bloom false-positive exponents (p = 2^-b), CMS
    * error exponents (ε = 2^-e, δ fixed at 2^-10 → depth 7 =
    * ⌈10·ln 2⌉), HLL relative-error targets in per-mille.
    * Q10 floors: 1/ln2 = 1.4427 → 1477; e = 2.71828 → 2783;
    * 1.04 → 1040 per-mille.
    */
  private[queries] val BloomFpExps = Seq(10L, 16L, 20L)
  private[queries] val CmsErrExps = Seq(10L, 14L)
  private[queries] val HllErrPm = Seq(10L, 20L)
  private[queries] val InvLn2Q10 = 1477L
  private[queries] val EQ10 = 2783L
  private[queries] val CmsDepthFixed = 7L

  /** L167 planted-cardinality dials: straddle both geometries' LC/raw
    * boundaries (5m/2 = 160 at m = 64, 640 at m = 256) — min(dial,
    * |corpus|) distinct values are planted per dial, so the small dials
    * exercise deep-LC, 128/512 sit near each boundary, 2048 is raw at
    * both m (corpus permitting).
    */
  private[queries] val LcDialNs = Seq(8L, 32L, 128L, 512L, 2048L)

  def all: Seq[GraftQuery] = {

    /* L153: threshold-transfer matrix — the conformal guarantee is
     * per-source: L127's τ_s bounds the clean flag rate ON SOURCE s.
     * Pipelines reuse thresholds across sources anyway (new sources
     * inherit an old τ; a global dashboard pins one number), and the
     * guarantee silently evaporates. The matrix applies every
     * source's REGISTERED τ (the q195 kernel, consumed not copied) to
     * every source's test-half clean docs: the diagonal reproduces
     * q195's own coverage (the spec pins the equality), off-diagonal
     * cells measure what cross-application actually flags — a column
     * far from ~10% means that source's score distribution is shifted
     * and inherited thresholds misfire on it. The tau_source axis is
     * TOTAL (ADVICE r16): a source whose calibration half is too small
     * to yield a τ still appears, as has_tau = 0 rows flagging nothing
     * (q195's own conservative branch — score > NULL never fires), so
     * a matrix reader can tell "source has no threshold" from "source
     * not in corpus". At 100 TB: the L86
     * passes + a |sources|-row broadcast τ table folded over the
     * test half map-side (the q198 broadcast-fold stance), rollup
     * ≤ |sources|² rows. */
    val q221 = GraftQuery(
      "q221_threshold_transfer_matrix", "L153 L127 L86 L35",
      (s, d) => {
        val sc = TrainedFilterOps.nbDocScores(s, d)
        val taus = sc.select(col("source").as("tau_source")).distinct()
          .join(CorpusAnalysisOps.conformalTaus(sc,
            CorpusAnalysisOps.conformalCalSizes(sc))
            .select(col("source").as("tau_source"), col("tau")),
            Seq("tau_source"), "left")
          .withColumn("has_tau",
            when(col("tau").isNotNull, 1L).otherwise(0L))
        sc.filter(col("doc_id") % 2 === 1 && col("pos") === 0)
          .crossJoin(broadcast(taus))
          .groupBy(col("tau_source"), col("has_tau"),
            col("source").as("apply_source"))
          .agg(count(lit(1)).as("n_test"),
            sum(when(col("score") > col("tau"), 1L).otherwise(0L))
              .as("n_flagged"))
          .withColumn("flag_ppm",
            expr("(n_flagged * 1000000) div greatest(n_test, 1)"))
          .select(col("tau_source"), col("has_tau"), col("apply_source"),
            col("n_test"), col("n_flagged"), col("flag_ppm"))
          .orderBy(col("tau_source"), col("apply_source"))
      },
      Some {
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          ${CorpusAnalysisOps.conformalTauCtesSql},
          ts AS (SELECT s.tau_source, tau.tau,
              CAST(CASE WHEN tau.tau IS NOT NULL THEN 1 ELSE 0 END
                AS BIGINT) AS has_tau
            FROM (SELECT DISTINCT source AS tau_source FROM sc) s
            LEFT JOIN tau ON tau.source = s.tau_source),
          te AS (SELECT source AS apply_source, score FROM sc
            WHERE doc_id % 2 = 1 AND pos = 0),
          mx AS (SELECT ts.tau_source, ts.has_tau, te.apply_source,
              CAST(COUNT(*) AS BIGINT) AS n_test,
              CAST(SUM(CASE WHEN te.score > ts.tau THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged
            FROM te CROSS JOIN ts GROUP BY 1, 2, 3)
          SELECT tau_source, has_tau, apply_source, n_test, n_flagged,
            (n_flagged * 1000000) // GREATEST(n_test, 1) AS flag_ppm
          FROM mx ORDER BY tau_source, apply_source"""
      })

    /* L154: sketch-capacity planner — the sizing table for the sketch
     * family the pipeline already runs, derived from the corpus's own
     * exact-dedup key universe (distinct h64(text) — what the L31/L64
     * ledger stores): Bloom at false-positive 2^-b needs
     * m = n·b/ln2 bits with k = b hashes (the optimal k IS log2(1/p)
     * — exactly, which is why the grid is in exponents); CMS at error
     * ε = 2^-e needs width ⌈e/ε⌉ (Euler's e, Q10-floored) and depth
     * ⌈ln(1/δ)⌉ = 7 at the house δ = 2^-10; HLL at relative error σ
     * needs (1.04/σ)² registers rounded UP to a power of two (the
     * register addressing demands it). One governance table pricing
     * bytes-per-guarantee before anyone allocates executor memory —
     * the L123/L136/L147 planner stance aimed at the sketch tier
     * itself. SELF-CONSISTENT sizing (ADVICE r16): the key-universe
     * input n is the planner's OWN tier's graft_hll estimate — at the
     * planner-grade m = 256 geometry with the TWO-REGIME estimator
     * (VERDICT r17 #2): zero registers + raw under 5m/2 switches to
     * linear counting m·ln(m/V) on the shared integer ladder, the
     * branch that removes the measured ~146k ppm small-range bias the
     * old raw-only m = 64 readout carried at sf0.001 (fp is already
     * the portable 60-bit hash, so it feeds the registers directly).
     * The planner cannot ride an exact distinct — its premise is that
     * exact distincts don't scale; the exact count stays in the gate
     * as the truth/error columns, and `lc_used` records which regime
     * sized the table (the L38 price-the-sketch stance aimed at the
     * planner itself). At 100 TB: one map-side register pass + a
     * 256-row aggregate for the estimate; the exact distinct aggregate
     * exists only to measure the error, and a production run can drop
     * it. Planner math on 7 rows. */
    val q222 = GraftQuery(
      "q222_sketch_capacity_planner", "L154 L64 L67 L69 L38",
      (s, d) => {
        import TextCorpusOps.{Hll256M, Hll256RemBits, Hll256Numerator,
          HllRhoCap, hllRegP, hllRhoCP, hllLcCol, hllLcUsed}
        val fp = Tables.documents(s, d)
          .select(Sketches.h64(col("text")).as("fp"))
        val est = fp.groupBy(hllRegP(col("fp"), Hll256RemBits).as("reg"))
          .agg(max(hllRhoCP(col("fp"), Hll256RemBits)).as("r"))
          .agg(count(lit(1)).as("n_hit"),
            sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - r)"))
              .as("s_hit"))
          .withColumn("est_raw", expr(s"$Hll256Numerator div ((s_hit + " +
            s"($Hll256M - n_hit) * ${1L << HllRhoCap}) * 1000)"))
          .withColumn("n_zero", lit(Hll256M.toLong) - col("n_hit"))
          .withColumn("lc_used",
            hllLcUsed(Hll256M, col("est_raw"), col("n_zero")))
          .withColumn("n_est", when(col("lc_used") === 1L,
            hllLcCol(Hll256M, col("n_zero"))).otherwise(col("est_raw")))
          .select(col("n_est"), col("lc_used"))
        val n = fp.agg(count_distinct(col("fp")).as("n_exact"))
          .crossJoin(broadcast(est))
          .withColumn("est_err_ppm", expr(
            "abs(n_est - n_exact) * 1000000 div greatest(n_exact, 1)"))
        val bloom = BloomFpExps.map(b =>
          struct(lit("bloom").as("sketch"), lit(b).as("dial"),
            expr(s"(n_est * $b * $InvLn2Q10) div 1024").as("p1"),
            lit(b).as("p2"),
            expr(s"((n_est * $b * $InvLn2Q10) div 1024 + 7) div 8")
              .as("bytes")))
        val cms = CmsErrExps.map(e =>
          struct(lit("cms").as("sketch"), lit(e).as("dial"),
            expr(s"($EQ10 * ${1L << e} + 1023) div 1024").as("p1"),
            lit(CmsDepthFixed).as("p2"),
            expr(s"((($EQ10 * ${1L << e} + 1023) div 1024) * " +
              s"$CmsDepthFixed) * 8").as("bytes")))
        val hll = HllErrPm.map { pm =>
          val mReq = (1040L / pm) * (1040L / pm)
          val log2 = 64L - java.lang.Long.numberOfLeadingZeros(mReq - 1L)
          struct(lit("hll").as("sketch"), lit(pm).as("dial"),
            lit(1L << log2).as("p1"), lit(log2).as("p2"),
            lit(1L << log2).as("bytes"))
        }
        n.select(col("n_est"), col("n_exact"), col("est_err_ppm"),
            col("lc_used"),
            explode(array(bloom ++ cms ++ hll: _*)).as("x"))
          .select(col("x.sketch").as("sketch"), col("x.dial").as("dial"),
            col("n_est"), col("n_exact"), col("est_err_ppm"),
            col("lc_used"),
            col("x.p1").as("p1"), col("x.p2").as("p2"),
            col("x.bytes").as("bytes"))
          .orderBy(col("sketch"), col("dial"))
      },
      Some {
        import TextCorpusOps.{Hll256M, Hll256RemBits, Hll256RemMask,
          HllRhoCap, Hll256Numerator, hllLcSql}
        val fp = Sketches.h64Sql("text")
        val bloomRows = BloomFpExps.map(b =>
          s"""SELECT 'bloom' AS sketch, CAST($b AS BIGINT) AS dial,
              n_est, n_exact, est_err_ppm, lc_used,
              (n_est * $b * $InvLn2Q10) // 1024 AS p1,
              CAST($b AS BIGINT) AS p2,
              ((n_est * $b * $InvLn2Q10) // 1024 + 7) // 8 AS bytes
            FROM nk""").mkString("\n          UNION ALL\n          ")
        val cmsRows = CmsErrExps.map(e =>
          s"""SELECT 'cms' AS sketch, CAST($e AS BIGINT) AS dial,
              n_est, n_exact, est_err_ppm, lc_used,
              ($EQ10 * ${1L << e} + 1023) // 1024 AS p1,
              CAST($CmsDepthFixed AS BIGINT) AS p2,
              ((($EQ10 * ${1L << e} + 1023) // 1024) * $CmsDepthFixed)
                * 8 AS bytes
            FROM nk""").mkString("\n          UNION ALL\n          ")
        val hllRows = HllErrPm.map { pm =>
          val mReq = (1040L / pm) * (1040L / pm)
          val log2 = 64L - java.lang.Long.numberOfLeadingZeros(mReq - 1L)
          s"""SELECT 'hll' AS sketch, CAST($pm AS BIGINT) AS dial,
              n_est, n_exact, est_err_ppm, lc_used,
              CAST(${1L << log2} AS BIGINT) AS p1,
              CAST($log2 AS BIGINT) AS p2,
              CAST(${1L << log2} AS BIGINT) AS bytes
            FROM nk"""
        }.mkString("\n          UNION ALL\n          ")
        s"""WITH f AS (SELECT $fp AS fp FROM documents),
          regs AS (SELECT fp >> $Hll256RemBits AS reg,
              MAX(LEAST(CASE WHEN (fp & $Hll256RemMask) = 0
                THEN ${Hll256RemBits + 1}
                ELSE ${Hll256RemBits + 1}
                  - length(format('{:b}', fp & $Hll256RemMask)) END,
                $HllRhoCap)) AS r
            FROM f GROUP BY 1),
          pe AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_hit,
              CAST(SUM(1::BIGINT << ($HllRhoCap - r)) AS BIGINT) AS s_hit
            FROM regs),
          er AS (SELECT n_hit, $Hll256M - n_hit AS n_zero,
              $Hll256Numerator // ((s_hit + ($Hll256M - n_hit)
                * ${1L << HllRhoCap}) * 1000) AS est_raw FROM pe),
          ec AS (SELECT *, CASE WHEN n_zero > 0
                AND est_raw * 2 <= ${5 * Hll256M} THEN 1 ELSE 0 END
                AS lc_used
            FROM er),
          ee AS (SELECT CASE WHEN lc_used = 1
                THEN ${hllLcSql(Hll256M, "n_zero")} ELSE est_raw END
                AS n_est,
              CAST(lc_used AS BIGINT) AS lc_used FROM ec),
          nk AS (SELECT ee.n_est,
              CAST(COUNT(DISTINCT f.fp) AS BIGINT) AS n_exact,
              abs(ee.n_est - CAST(COUNT(DISTINCT f.fp) AS BIGINT))
                * 1000000 // GREATEST(COUNT(DISTINCT f.fp), 1)
                AS est_err_ppm,
              ee.lc_used
            FROM f CROSS JOIN ee GROUP BY 1, 4)
          SELECT * FROM (
          $bloomRows
          UNION ALL
          $cmsRows
          UNION ALL
          $hllRows)
          ORDER BY sketch, dial"""
      })

    /* L167: HLL two-regime calibration sweep — the L38 price-the-sketch
     * stance aimed at the r18 linear-counting branch itself: the
     * corrected estimator (q137/q222's arithmetic) swept across PLANTED
     * cardinalities at both shipped geometries (m = 64 and the
     * planner-grade m = 256). Dial n plants exactly min(n, |corpus|)
     * distinct values via doc_id % n (ids are contiguous, so the
     * planted cardinality is known in-query — n_exact stays the truth
     * column); per (m, dial) the sweep reads zero registers, both
     * regimes' estimates, which regime FIRED, and err_ppm of the branch
     * that ran — one gated table showing where the LC/raw boundary sits
     * for each geometry and what each regime costs there, so an
     * operator choosing a precision dials it from measurement (the
     * q229-for-bottom-k stance, aimed at graft_hll). Measured at the
     * gated fixtures: LC beats raw at EVERY dial where it fires (at
     * n = 8/m = 64: est 9 vs raw 48), and m = 256 keeps LC alive
     * through n = 500 where m = 64 has none (58k vs 204k ppm) — but
     * the integer ladder carries an m-scaled ABSOLUTE floor at tiny n
     * (≤ 0.0861 bits of log2q10 mantissa error → ≤ ~0.06·m on the
     * estimate: at m = 256, n = 8 the est reads 11), the price of
     * engine-exact determinism over float ln; the sweep is where that
     * price is measured rather than assumed. At 100 TB: one
     * corpus scan exploded |dials|×, a ≤ m-row aggregate per (m, dial);
     * the exact distinct is per-dial bounded by the dial itself. */
    val q235 = GraftQuery(
      "q235_hll_regime_calibration", "L167 L69 L154 L38",
      (s, d) => {
        import TextCorpusOps.{HllM, HllRemBits, Hll256M, Hll256RemBits,
          HllRhoCap, HllNumerator, Hll256Numerator, hllRegP, hllRhoCP,
          hllLcCol, hllLcUsed}
        val base = Tables.documents(s, d).select(col("doc_id"))
          .select(explode(array(LcDialNs.map(lit): _*)).as("dial"),
            col("doc_id"))
          .withColumn("v", col("doc_id") % col("dial"))
          .withColumn("h",
            Sketches.h64(concat(lit("lc:"), col("v").cast("string"))))
        val exact = base.groupBy(col("dial"))
          .agg(count_distinct(col("v")).as("n_exact"))
        def sweep(m: Int, remBits: Int, numerator: Long) = {
          val est = base
            .groupBy(col("dial"), hllRegP(col("h"), remBits).as("reg"))
            .agg(max(hllRhoCP(col("h"), remBits)).as("r"))
            .groupBy(col("dial"))
            .agg(count(lit(1)).as("n_hit"),
              sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - r)"))
                .as("s_hit"))
            .withColumn("est_raw", expr(s"$numerator div ((s_hit + " +
              s"($m - n_hit) * ${1L << HllRhoCap}) * 1000)"))
            .withColumn("n_zero_regs", lit(m.toLong) - col("n_hit"))
            .withColumn("lc_used",
              hllLcUsed(m, col("est_raw"), col("n_zero_regs")))
            .withColumn("est", when(col("lc_used") === 1L,
              hllLcCol(m, col("n_zero_regs"))).otherwise(col("est_raw")))
          est.select(lit(m.toLong).as("m"), col("dial"),
            col("n_zero_regs"), col("est_raw"), col("est"),
            col("lc_used"))
        }
        sweep(HllM, HllRemBits, HllNumerator)
          .unionByName(sweep(Hll256M, Hll256RemBits, Hll256Numerator))
          .join(broadcast(exact), Seq("dial"))
          .withColumn("err_ppm", expr(
            "abs(est - n_exact) * 1000000 div greatest(n_exact, 1)"))
          .select(col("m"), col("dial"), col("n_exact"),
            col("n_zero_regs"), col("est_raw"), col("est"),
            col("lc_used"), col("err_ppm"))
          .orderBy(col("m"), col("dial"))
      },
      Some {
        import TextCorpusOps.{HllM, HllRemBits, Hll256M, Hll256RemBits,
          HllRhoCap, HllNumerator, Hll256Numerator, hllLcSql}
        val dials = LcDialNs.mkString(", ")
        val hv = Sketches.h64Sql("'lc:' || CAST(v AS VARCHAR)")
        def sweep(m: Int, remBits: Int, numerator: Long): String = {
          val mask = (1L << remBits) - 1
          val raw = s"($numerator // ((s_hit + ($m - n_hit) " +
            s"* ${1L << HllRhoCap}) * 1000))"
          s"""SELECT CAST($m AS BIGINT) AS m, dial,
              $m - n_hit AS n_zero_regs, $raw AS est_raw,
              CASE WHEN ($m - n_hit) > 0 AND $raw * 2 <= ${5 * m}
                THEN ${hllLcSql(m, s"($m - n_hit)")} ELSE $raw END AS est,
              CAST(CASE WHEN ($m - n_hit) > 0 AND $raw * 2 <= ${5 * m}
                THEN 1 ELSE 0 END AS BIGINT) AS lc_used
            FROM (SELECT dial, CAST(COUNT(*) AS BIGINT) AS n_hit,
                CAST(SUM(1::BIGINT << ($HllRhoCap - r)) AS BIGINT)
                  AS s_hit
              FROM (SELECT dial, h >> $remBits AS reg,
                  MAX(LEAST(CASE WHEN (h & $mask) = 0
                    THEN ${remBits + 1}
                    ELSE ${remBits + 1}
                      - length(format('{:b}', h & $mask)) END,
                    $HllRhoCap)) AS r
                FROM hh GROUP BY 1, 2)
              GROUP BY 1)"""
        }
        s"""WITH dl AS (SELECT unnest([$dials]) AS dial),
          vv AS (SELECT dl.dial, d.doc_id % dl.dial AS v
            FROM documents d CROSS JOIN dl),
          hh AS (SELECT dial, $hv AS h FROM vv),
          ex AS (SELECT dial, CAST(COUNT(DISTINCT v) AS BIGINT)
              AS n_exact FROM vv GROUP BY 1),
          sw AS (${sweep(HllM, HllRemBits, HllNumerator)}
            UNION ALL
            ${sweep(Hll256M, Hll256RemBits, Hll256Numerator)})
          SELECT sw.m, sw.dial, ex.n_exact, sw.n_zero_regs, sw.est_raw,
            sw.est, sw.lc_used,
            abs(sw.est - ex.n_exact) * 1000000
              // GREATEST(ex.n_exact, 1) AS err_ppm
          FROM sw JOIN ex ON ex.dial = sw.dial
          ORDER BY sw.m, sw.dial"""
      })

    Seq(q221, q222, q235)
  }
}
