package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Allocation and sketch-calibration operators (SURVEY §2.11a,
  * L115–L117, L121, L123):
  *
  *  - L115 iterative proportional fitting (raking)  → q183
  *  - L116 frequent-token subsampling               → q184
  *  - L117 HLL-union overlap calibration            → q185
  *  - L121 capture–recapture distinct calibration   → q189
  *  - L123 data-constrained epoch planner           → q191
  *
  * Three more governance jobs of a corpus build: fitting a training
  * mixture to TWO marginal targets at once (domain shares × length
  * shares — the 2-D generalization of L42's one-axis temperature
  * resample), word2vec-style frequent-token downsampling (the other
  * classic frequency intervention next to L16's repetition filters),
  * and calibrating the sketch-estimated cross-source overlap against
  * the exact L29 matrix (the L38 calibrate-the-sketch pattern applied
  * to HLL set algebra).
  */
object AllocationSketchOps {

  /** L115 geometry: length buckets, bucket width, IPF iterations. */
  private[queries] val IpfBucketChars = 256L
  private[queries] val IpfBuckets = 8L
  private[queries] val IpfIters = 5

  /** L116 dials: the word2vec t threshold (10^-3, in ppm) and the
    * acceptance fixed point (Q20).
    */
  private[queries] val SubsampleTppm = 1000L
  private[queries] val SubsampleQ = 1048576L // 2^20

  def all: Seq[GraftQuery] = {

    /* L115: iterative proportional fitting (raking) — fit the corpus
     * allocation to TWO marginal targets simultaneously: per-source
     * shares (a rank ramp over the sorted source names — the
     * temperature-tilted mixture a trainer actually requests; the
     * fixture's sources are uniform-count, so a uniform row target
     * would start pre-fitted and gate nothing) and per-length-bucket
     * shares (declining in length — the short-doc preference a
     * context-window-bound trainer has). One
     * scaling pass per axis per iteration, the Deming–Stephan
     * alternation: masses start at the observed cell shares (ppm of
     * total), each row step rescales every source's cells to its
     * target share, each column step rescales every bucket's cells to
     * its — 5 double-iterations land within integer-resolution of both
     * marginals on the gated fixtures, and the final row/column
     * residuals (Σ|marginal − target| in ppm) are part of the gate, so
     * a broken scaling step is visible as a residual jump, not just
     * shifted cells. All arithmetic is integer ppm with truncating
     * division (the q176 convention — Spark `div` ≡ DuckDB `//`);
     * masses stay ≤ 10^6 so every product is Long-safe by two orders
     * of magnitude. At 100 TB: the ONE corpus-sized pass is the cell
     * histogram (map-side combined to |sources|·|buckets| rows); the
     * iteration runs entirely on that cell frame with per-axis window
     * rescales, each reading the running frame once. */
    val q183 = GraftQuery(
      "q183_ipf_raking", "L115 L42 L89",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .select(col("source"),
            least(expr(s"n_chars div $IpfBucketChars"),
              lit(IpfBuckets - 1L)).as("bkt"))
          .groupBy(col("source"), col("bkt"))
          .agg(count(lit(1)).as("n"))
        val tt = cells.agg(sum(col("n")).as("t"))
        val rw = cells.select(col("source")).distinct()
          .select(col("source"), row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("source")))
            .cast("long").as("rwgt"))
        val rwt = rw.agg(sum(col("rwgt")).as("srw"))
        val cb = cells.select(col("bkt")).distinct()
          .select(col("bkt"), (lit(IpfBuckets) - col("bkt")).as("wgt"))
        val cbt = cb.agg(sum(col("wgt")).as("sw"))
        val m0 = cells.crossJoin(broadcast(tt)).crossJoin(broadcast(cbt))
          .crossJoin(broadcast(rwt))
          .join(broadcast(cb), Seq("bkt"))
          .join(broadcast(rw), Seq("source"))
          .select(col("source"), col("bkt"), col("n"),
            col("rwgt"), col("srw"), col("wgt"), col("sw"),
            expr("(n * 1000000) div t").as("m"))
          // r19 optimization: the running frame is ≤ |sources|·|buckets|
          // rows BY CONSTRUCTION at any corpus scale (it is the cell
          // histogram), yet each of the 2·IpfIters alternating window
          // rescales below re-hashes it source↔bkt — 2·IpfIters exchanges
          // and stage barriers of ~nothing (measured 3.55 s steady at
          // sf0.1, almost all scheduling). A single partition SATISFIES
          // every ClusteredDistribution, so after coalesce(1) the whole
          // iteration runs exchange-free in one task over the tiny frame
          // (guide §2.4); the one corpus-sized pass (the histogram) keeps
          // its full parallelism upstream.
          .coalesce(1)
        // each half-step reads the running frame ONCE (a window sum,
        // not an aggregate-and-join-back) so the logical plan grows
        // linearly in IpfIters — the join-back form doubles the plan
        // per half-step and AQE's tree walks go exponential
        val bymSrc = org.apache.spark.sql.expressions.Window
          .partitionBy(col("source"))
        val byBkt = org.apache.spark.sql.expressions.Window
          .partitionBy(col("bkt"))
        val mN = (1 to IpfIters).foldLeft(m0) { (m, _) =>
          m.withColumn("rs", sum(col("m")).over(bymSrc))
            .withColumn("m",
              expr("(m * ((rwgt * 1000000) div srw)) div greatest(rs, 1)"))
            .drop("rs")
            .withColumn("cs", sum(col("m")).over(byBkt))
            .withColumn("m",
              expr("(m * ((wgt * 1000000) div sw)) div greatest(cs, 1)"))
            .drop("cs")
        }
        val fr = mN.groupBy(col("source"), col("rwgt"), col("srw"))
          .agg(sum(col("m")).as("rs"))
          .agg(sum(abs(col("rs") - expr("(rwgt * 1000000) div srw")))
            .as("row_resid"))
        val fc = mN.groupBy(col("bkt"), col("wgt"), col("sw"))
          .agg(sum(col("m")).as("cs"))
          .agg(sum(abs(col("cs") - expr("(wgt * 1000000) div sw")))
            .as("col_resid"))
        mN.crossJoin(broadcast(fr)).crossJoin(broadcast(fc))
          .select(col("source"), col("bkt"), col("n").as("n_docs"),
            col("m").as("m_ppm"), col("row_resid"), col("col_resid"))
          .orderBy(col("source"), col("bkt"))
      },
      Some {
        // a_k and m_k are each referenced twice (scale sum + rescale);
        // MATERIALIZED keeps DuckDB's CTE inlining from doubling the
        // plan per half-step (4^iters blowup, measured: q183 alone ran
        // >120 s inlined, <0.1 s materialized) — the q92 stance
        def iterSql(k: Int): String =
          s"""r$k AS (SELECT source, CAST(SUM(m) AS BIGINT) AS rs
              FROM m${k - 1} GROUP BY 1),
          a$k AS MATERIALIZED (SELECT m.source, m.bkt, m.n, m.rwgt,
              m.srw, m.wgt, m.sw,
              (m.m * ((m.rwgt * 1000000) // m.srw))
                // GREATEST(r$k.rs, 1) AS m
            FROM m${k - 1} m JOIN r$k ON r$k.source = m.source),
          c$k AS (SELECT bkt, CAST(SUM(m) AS BIGINT) AS cs
              FROM a$k GROUP BY 1),
          m$k AS MATERIALIZED (SELECT m.source, m.bkt, m.n, m.rwgt,
              m.srw, m.wgt, m.sw,
              (m.m * ((m.wgt * 1000000) // m.sw)) // GREATEST(c$k.cs, 1)
                AS m
            FROM a$k m JOIN c$k ON c$k.bkt = m.bkt)"""
        s"""WITH cells AS (SELECT source,
              LEAST(n_chars // $IpfBucketChars, ${IpfBuckets - 1}) AS bkt,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2),
          tt AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM cells),
          rw AS (SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY source)
              AS BIGINT) AS rwgt
            FROM (SELECT DISTINCT source FROM cells)),
          rwt AS (SELECT CAST(SUM(rwgt) AS BIGINT) AS srw FROM rw),
          cb AS (SELECT bkt, $IpfBuckets - bkt AS wgt
            FROM (SELECT DISTINCT bkt FROM cells)),
          cbt AS (SELECT CAST(SUM(wgt) AS BIGINT) AS sw FROM cb),
          m0 AS (SELECT cells.source, cells.bkt, cells.n, rw.rwgt,
              rwt.srw, cb.wgt, cbt.sw, (cells.n * 1000000) // tt.t AS m
            FROM cells CROSS JOIN tt CROSS JOIN cbt CROSS JOIN rwt
              JOIN cb ON cb.bkt = cells.bkt
              JOIN rw ON rw.source = cells.source),
          ${(1 to IpfIters).map(iterSql).mkString(",\n          ")},
          fr AS (SELECT CAST(SUM(ABS(rs - ((rwgt * 1000000) // srw)))
              AS BIGINT) AS row_resid
            FROM (SELECT source, rwgt, srw, CAST(SUM(m) AS BIGINT) AS rs
              FROM m$IpfIters GROUP BY 1, 2, 3)),
          fc AS (SELECT CAST(SUM(ABS(cs - ((wgt * 1000000) // sw)))
              AS BIGINT) AS col_resid
            FROM (SELECT bkt, wgt, sw, CAST(SUM(m) AS BIGINT) AS cs
              FROM m$IpfIters GROUP BY 1, 2, 3))
          SELECT m.source, m.bkt, m.n AS n_docs, m.m AS m_ppm,
            fr.row_resid, fc.col_resid
          FROM m$IpfIters m CROSS JOIN fr CROSS JOIN fc
          ORDER BY source, bkt"""
      })

    /* L116: frequent-token subsampling — the word2vec intervention: a
     * token whose corpus frequency p exceeds t = 10^-3 is kept with
     * probability sqrt(t/p) (its information content per occurrence
     * shrinks as its frequency grows; downsampling rebalances training
     * signal toward rare words). Deterministic form: the acceptance is
     * floor(sqrt((t_ppm · 2^40) div p_ppm)) capped at 2^20 — the
     * ratio is an exact integer < 2^50, exactly representable as a
     * double, and IEEE sqrt is correctly rounded, so the Q20 dial is
     * engine-exact; the draw is the stateless per-OCCURRENCE hash
     * h64("ss:"‖doc‖":"‖pos) mod 2^20 (append-stable, replayable). The
     * per-source report proves the distribution shift: total vs kept
     * tokens, the frequent-class (p > t) occurrence mass before vs
     * after — the only mass that shrinks — and distinct vocabulary
     * before vs after (rare types must survive). At 100 TB: one
     * |vocab|-row count aggregate broadcast back over a second token
     * pass, map-side draw, one rollup — the L9/L86 two-pass shape. */
    val q184 = GraftQuery(
      "q184_frequent_token_subsample", "L116 L16 L9",
      (s, d) => {
        val toks = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            posexplode(Sketches.words(col("text"))))
          .select(col("doc_id"), col("source"),
            (col("pos") + 1).cast("long").as("pos"), col("col").as("w"))
        val vc = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
        val nt = vc.agg(sum(col("c")).as("n"))
        val scored = toks.join(broadcast(
            vc.crossJoin(broadcast(nt))
              .withColumn("p_ppm", expr("(c * 1000000) div n"))
              .withColumn("keep_q20",
                least(lit(SubsampleQ), floor(sqrt(
                  expr(s"($SubsampleTppm * 1099511627776) div " +
                    "greatest(p_ppm, 1)").cast("double")))))
              .select(col("w"), col("p_ppm"), col("keep_q20"))),
            Seq("w"))
          .withColumn("kept", Sketches.h64(concat(lit("ss:"),
            col("doc_id"), lit(":"), col("pos"))) % lit(SubsampleQ)
            < col("keep_q20"))
          .withColumn("freq", col("p_ppm") > SubsampleTppm)
        scored.groupBy(col("source"))
          .agg(count(lit(1)).as("n_tokens"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("freq"), 1L).otherwise(0L)).as("freq_mass"),
            sum(when(col("freq") && col("kept"), 1L).otherwise(0L))
              .as("freq_kept"),
            count_distinct(col("w")).as("v_before"),
            count_distinct(when(col("kept"), col("w"))).as("v_after"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val h = Sketches.h64Sql("'ss:' || doc_id || ':' || i")
        s"""WITH gd AS (SELECT doc_id, source, $ws AS g FROM documents),
          tok AS (SELECT doc_id, source, i, g[i] AS w FROM (
            SELECT doc_id, source, g,
              unnest(generate_series(1, len(g))) AS i FROM gd)),
          vc AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM tok
            GROUP BY 1),
          nt AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vc),
          kd AS (SELECT w, (c * 1000000) // nt.n AS p_ppm,
              LEAST($SubsampleQ, CAST(floor(sqrt(CAST(
                ($SubsampleTppm * 1099511627776)
                  // GREATEST((c * 1000000) // nt.n, 1) AS DOUBLE)))
                AS BIGINT)) AS keep_q20
            FROM vc CROSS JOIN nt),
          sc AS (SELECT tok.source, tok.w, kd.p_ppm > $SubsampleTppm
                AS freq,
              ($h % $SubsampleQ) < kd.keep_q20 AS kept
            FROM tok JOIN kd ON kd.w = tok.w)
          SELECT source, COUNT(*) AS n_tokens,
            CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(SUM(CASE WHEN freq THEN 1 ELSE 0 END) AS BIGINT)
              AS freq_mass,
            CAST(SUM(CASE WHEN freq AND kept THEN 1 ELSE 0 END)
              AS BIGINT) AS freq_kept,
            CAST(COUNT(DISTINCT w) AS BIGINT) AS v_before,
            CAST(COUNT(DISTINCT CASE WHEN kept THEN w END) AS BIGINT)
              AS v_after
          FROM sc GROUP BY 1 ORDER BY source"""
      })

    /* L117: HLL-union overlap calibration — the L38 calibrate-the-
     * sketch pattern applied to HLL set algebra: the exact cross-source
     * overlap matrix (L29) is the expensive truth (a distinct-key self-
     * join); the sketch path estimates it from per-source register
     * vectors alone via inclusion–exclusion — est(A∩B) = est(A) +
     * est(B) − est(A∪B), where the union sketch is the register-wise
     * MAX of the two sources' registers (the HLL merge law, the same
     * property the graft_hll UDAF's partial-merge relies on). The gate
     * computes both sides per source pair and the signed error — the
     * governance number that prices replacing the quadratic exact join
     * with kilobyte sketches at 100 TB. Registers ride the q137
     * integer-exact estimator arithmetic (raw estimator, capped rho,
     * no libm); the union merge adds one |pairs|·|regs|-row aggregate
     * over the BROADCAST per-source register frame — corpus-sized work
     * stays in the one shingle pass both paths share. */
    val q185 = GraftQuery(
      "q185_hll_overlap_calibration", "L117 L69 L29 L38",
      (s, d) => {
        import TextCorpusOps.{HllM, HllRemBits, HllRemMask, HllRhoCap,
          HllNumerator, hllReg, hllRhoC, hllLcCol, hllLcUsed}
        val w = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.shingles(col("text"), LlmPipeline.ShingleN))
              .as("w"))
        val dw = w.distinct()
        val regs = w.withColumn("h", Sketches.h64(col("w")))
          .groupBy(col("source"), hllReg(col("h")).as("reg"))
          // r20: rho reads the already-computed h column — the old form
          // re-evaluated h64(w) (a second md5 per shingle occurrence)
          // inside the aggregate; value identical by construction
          .agg(max(hllRhoC(col("h"))).as("r"))
        // the TWO-REGIME estimator (VERDICT r17 #2): the set-algebra
        // reads inherit the same linear-counting branch as q137, so a
        // small source (or a small union) is no longer read through
        // the raw estimator's biased small-range regime
        def estCols(df: org.apache.spark.sql.DataFrame,
            out: String): org.apache.spark.sql.DataFrame = df
          .withColumn("est_raw", expr(s"$HllNumerator div ((s_hit + " +
            s"($HllM - n_hit) * ${1L << HllRhoCap}) * 1000)"))
          .withColumn("v0", lit(HllM.toLong) - col("n_hit"))
          .withColumn(out, when(
            hllLcUsed(HllM, col("est_raw"), col("v0")) === 1L,
            hllLcCol(HllM, col("v0"))).otherwise(col("est_raw")))
          .drop("est_raw", "v0", "n_hit", "s_hit")
        val perSrc = estCols(regs.groupBy(col("source"))
          .agg(count(lit(1)).as("n_hit"),
            sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - r)"))
              .as("s_hit")), "est")
          .select(col("source"), col("est"))
        val pairs = perSrc.select(col("source").as("s1"),
            col("est").as("est_s1"))
          .join(perSrc.select(col("source").as("s2"),
            col("est").as("est_s2")), col("s1") < col("s2"))
        val merged = estCols(broadcast(pairs).join(regs,
            col("source") === col("s1") || col("source") === col("s2"))
          .groupBy(col("s1"), col("s2"), col("est_s1"), col("est_s2"),
            col("reg"))
          .agg(max(col("r")).as("r"))
          .groupBy(col("s1"), col("s2"), col("est_s1"), col("est_s2"))
          .agg(count(lit(1)).as("n_hit"),
            sum(expr(s"shiftleft(CAST(1 AS BIGINT), $HllRhoCap - r)"))
              .as("s_hit")), "est_union")
        val exact = dw.select(col("source").as("s1"), col("w"))
          .join(dw.select(col("source").as("s2"), col("w")), Seq("w"))
          .filter(col("s1") < col("s2"))
          .groupBy(col("s1"), col("s2"))
          .agg(count(lit(1)).as("n_exact"))
        merged
          .withColumn("est_inter",
            col("est_s1") + col("est_s2") - col("est_union"))
          .join(exact, Seq("s1", "s2"), "left")
          .select(col("s1"), col("s2"),
            coalesce(col("n_exact"), lit(0L)).as("n_exact"),
            col("est_s1"), col("est_s2"), col("est_union"),
            col("est_inter"),
            (col("est_inter") - coalesce(col("n_exact"), lit(0L)))
              .as("err"))
          .orderBy(col("s1"), col("s2"))
      },
      Some {
        import TextCorpusOps.{HllM, HllRemBits, HllRemMask, HllRhoCap,
          HllNumerator, hllLcSql}
        val ws = Sketches.shinglesSql("text", LlmPipeline.ShingleN)
        val hw = Sketches.h64Sql("w")
        def est(nHit: String, sHit: String): String = {
          val raw = s"($HllNumerator // (($sHit + ($HllM - $nHit) " +
            s"* ${1L << HllRhoCap}) * 1000))"
          s"(CASE WHEN ($HllM - $nHit) > 0 AND $raw * 2 <= ${5 * HllM} " +
            s"THEN ${hllLcSql(HllM, s"($HllM - $nHit)")} " +
            s"ELSE $raw END)"
        }
        s"""WITH w AS (SELECT source, unnest($ws) AS w FROM documents),
          hh AS (SELECT source, w, $hw AS h FROM w),
          regs AS (SELECT source, h >> $HllRemBits AS reg,
              MAX(LEAST(CASE WHEN (h & $HllRemMask) = 0
                THEN ${HllRemBits + 1}
                ELSE ${HllRemBits + 1}
                  - length(format('{:b}', h & $HllRemMask)) END,
                $HllRhoCap)) AS r
            FROM hh GROUP BY 1, 2),
          ps AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_hit,
              CAST(SUM(1::BIGINT << ($HllRhoCap - r)) AS BIGINT) AS s_hit
            FROM regs GROUP BY 1),
          pe AS (SELECT source, ${est("n_hit", "s_hit")} AS est FROM ps),
          pairs AS (SELECT a.source AS s1, b.source AS s2,
              a.est AS est_s1, b.est AS est_s2
            FROM pe a JOIN pe b ON a.source < b.source),
          mr AS (SELECT p.s1, p.s2, p.est_s1, p.est_s2, regs.reg,
              MAX(regs.r) AS r
            FROM pairs p JOIN regs
              ON regs.source = p.s1 OR regs.source = p.s2
            GROUP BY 1, 2, 3, 4, 5),
          mu AS (SELECT s1, s2, est_s1, est_s2,
              CAST(COUNT(*) AS BIGINT) AS n_hit,
              CAST(SUM(1::BIGINT << ($HllRhoCap - r)) AS BIGINT) AS s_hit
            FROM mr GROUP BY 1, 2, 3, 4),
          uu AS (SELECT s1, s2, est_s1, est_s2,
              ${est("n_hit", "s_hit")} AS est_union FROM mu),
          dw AS (SELECT DISTINCT source, w FROM w),
          ex AS (SELECT a.source AS s1, b.source AS s2,
              CAST(COUNT(*) AS BIGINT) AS n_exact
            FROM dw a JOIN dw b ON b.w = a.w AND a.source < b.source
            GROUP BY 1, 2)
          SELECT uu.s1, uu.s2, COALESCE(ex.n_exact, 0) AS n_exact,
            uu.est_s1, uu.est_s2, uu.est_union,
            uu.est_s1 + uu.est_s2 - uu.est_union AS est_inter,
            uu.est_s1 + uu.est_s2 - uu.est_union
              - COALESCE(ex.n_exact, 0) AS err
          FROM uu LEFT JOIN ex ON ex.s1 = uu.s1 AND ex.s2 = uu.s2
          ORDER BY uu.s1, uu.s2"""
      })

    /* L121: capture–recapture distinct-count calibration — the
     * Lincoln–Petersen estimator applied to the dedup ledger: two
     * INDEPENDENT deterministic samples of the text-fingerprint
     * universe (salts "cr1"/"cr2", rate 1/8 each — independence comes
     * from the salts, which is what separates this from plain hash
     * sampling), m = |S1 ∩ S2|, N̂ = |S1|·|S2| div max(m, 1). The
     * estimate is gated against the EXACT distinct count (the truth a
     * 100 TB build prices out — same stance as q185's HLL calibration,
     * but the estimator needs only two sample counts and an overlap,
     * which a pipeline often already has lying around as shard
     * samples). Per source: n_docs, n_distinct (exact), n_s1, n_s2,
     * m, the estimate and its signed error; the dup-rate read
     * (1 − distinct/total, in ppm) rides both sides. At 100 TB: the
     * fingerprint distinct is the dedup pass the corpus already runs
     * (8-byte keys); the samples are map-side hash flags on that
     * frame and everything after is a |sources|-row rollup. */
    val q189 = GraftQuery(
      "q189_capture_recapture", "L121 L38 L2",
      (s, d) => {
        val fps = Tables.documents(s, d)
          .select(col("source"), Sketches.h64(col("text")).as("fp"))
          .groupBy(col("source"), col("fp"))
          .agg(count(lit(1)).as("copies"))
          .withColumn("s1",
            Sketches.h64(concat(lit("cr1:"), col("fp"))) % 8 === 0)
          .withColumn("s2",
            Sketches.h64(concat(lit("cr2:"), col("fp"))) % 8 === 0)
        fps.groupBy(col("source"))
          .agg(sum(col("copies")).as("n_docs"),
            count(lit(1)).as("n_distinct"),
            sum(when(col("s1"), 1L).otherwise(0L)).as("n_s1"),
            sum(when(col("s2"), 1L).otherwise(0L)).as("n_s2"),
            sum(when(col("s1") && col("s2"), 1L).otherwise(0L)).as("m"))
          .withColumn("est_distinct",
            expr("(n_s1 * n_s2) div greatest(m, 1)"))
          .withColumn("err", col("est_distinct") - col("n_distinct"))
          .withColumn("dup_ppm", expr(
            "((n_docs - n_distinct) * 1000000) div n_docs"))
          .orderBy(col("source"))
      },
      Some {
        val hf = Sketches.h64Sql("text")
        val h1 = Sketches.h64Sql("'cr1:' || fp")
        val h2 = Sketches.h64Sql("'cr2:' || fp")
        s"""WITH fp AS (SELECT source, $hf AS fp,
              CAST(COUNT(*) AS BIGINT) AS copies
            FROM documents GROUP BY 1, 2),
          fl AS (SELECT source, copies,
              ($h1 % 8 = 0) AS s1, ($h2 % 8 = 0) AS s2 FROM fp),
          ag AS (SELECT source, CAST(SUM(copies) AS BIGINT) AS n_docs,
              CAST(COUNT(*) AS BIGINT) AS n_distinct,
              CAST(SUM(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS n_s1,
              CAST(SUM(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS n_s2,
              CAST(SUM(CASE WHEN s1 AND s2 THEN 1 ELSE 0 END) AS BIGINT)
                AS m
            FROM fl GROUP BY 1)
          SELECT source, n_docs, n_distinct, n_s1, n_s2, m,
            (n_s1 * n_s2) // GREATEST(m, 1) AS est_distinct,
            (n_s1 * n_s2) // GREATEST(m, 1) - n_distinct AS err,
            ((n_docs - n_distinct) * 1000000) // n_docs AS dup_ppm
          FROM ag ORDER BY source"""
      })

    /* L123: data-constrained epoch planner — the read that turns the
     * mixture REQUEST (the q183 rank-ramp target) plus the corpus's
     * per-source token supply into a training plan: demand_s =
     * budget·share_s, epochs over the source = demand div supply in
     * Q10 fixed point, and any source pushed past 4 epochs is flagged
     * (the data-constrained-scaling regime where repeating data stops
     * buying loss — rebalance the mixture or accept the discount).
     * Budget = half the corpus's total tokens (the dial a real plan
     * sweeps); token supply is the L9 BPE-ish count. The plan is a
     * governance TABLE, not a sampler — L42/L87 execute whatever plan
     * this prices. At 100 TB: one map-side token-count pass (the L9
     * column) into a |sources|-row rollup; the planner math runs on
     * |sources| rows. */
    val q191 = GraftQuery(
      "q191_epoch_planner", "L123 L42 L9",
      (s, d) => {
        val sup = Tables.documents(s, d)
          .select(col("source"),
            graft.functions.TextFunctions.tokenCountBpeIsh(col("text"))
              .cast("long").as("toks"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"), sum(col("toks")).as("supply"))
        val rw = sup.select(col("source")).distinct()
          .select(col("source"), row_number().over(
            org.apache.spark.sql.expressions.Window.orderBy(col("source")))
            .cast("long").as("rwgt"))
        val tot = sup.agg(sum(col("supply")).as("t"))
        val srw = rw.agg(sum(col("rwgt")).as("srw"))
        sup.join(broadcast(rw), Seq("source"))
          .crossJoin(broadcast(tot)).crossJoin(broadcast(srw))
          .withColumn("share_ppm", expr("(rwgt * 1000000) div srw"))
          .withColumn("demand", expr("((t div 2) * share_ppm) div 1000000"))
          .withColumn("epochs_q10",
            expr("(demand * 1024) div greatest(supply, 1)"))
          .withColumn("constrained", col("epochs_q10") > 4L * 1024L)
          .select(col("source"), col("n_docs"), col("supply"),
            col("share_ppm"), col("demand"), col("epochs_q10"),
            col("constrained"))
          .orderBy(col("source"))
      },
      Some {
        val toks = graft.functions.TextFunctions.tokenCountBpeIshSql("text")
        s"""WITH sup AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CAST($toks AS BIGINT)) AS BIGINT) AS supply
            FROM documents GROUP BY 1),
          rw AS (SELECT source, CAST(ROW_NUMBER() OVER (ORDER BY source)
              AS BIGINT) AS rwgt FROM (SELECT DISTINCT source FROM sup)),
          tt AS (SELECT CAST(SUM(supply) AS BIGINT) AS t FROM sup),
          sr AS (SELECT CAST(SUM(rwgt) AS BIGINT) AS srw FROM rw),
          pl AS (SELECT sup.source, sup.n_docs, sup.supply,
              (rw.rwgt * 1000000) // sr.srw AS share_ppm,
              ((tt.t // 2) * ((rw.rwgt * 1000000) // sr.srw)) // 1000000
                AS demand
            FROM sup JOIN rw ON rw.source = sup.source
              CROSS JOIN tt CROSS JOIN sr)
          SELECT source, n_docs, supply, share_ppm, demand,
            (demand * 1024) // GREATEST(supply, 1) AS epochs_q10,
            (demand * 1024) // GREATEST(supply, 1) > 4096 AS constrained
          FROM pl ORDER BY source"""
      })

    Seq(q183, q184, q185, q189, q191)
  }
}
