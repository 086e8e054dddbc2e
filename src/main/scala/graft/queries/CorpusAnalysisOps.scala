package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Corpus-analysis and index-planning operators (SURVEY §2.11a,
  * L124–L130):
  *
  *  - L124 Heaps'-law vocabulary growth          → q192
  *  - L125 Cohen's-kappa filter agreement        → q193
  *  - L126 PMI collocation mining                → q194
  *  - L127 conformal filter-threshold calibration → q195
  *  - L128 postings-compression planner (Elias γ) → q196
  *  - L129 OOV-rate vocabulary-budget curve      → q197
  *  - L130 consistent-hash-ring vnode dial       → q198
  *
  * The analysis layer that prices the NEXT corpus build: is more data
  * from a source still adding new vocabulary (Heaps slope), do the
  * trained and heuristic quality filters agree beyond chance (kappa),
  * which word pairs behave as units (PMI — tokenizer/vocab planning),
  * what filter threshold carries a finite-sample coverage guarantee
  * (split conformal), how many bits the L95 inverted index costs
  * under gap compression (Elias-gamma planner), what OOV rate each
  * tokenizer vocabulary budget buys per source, and how many virtual
  * nodes the shard ring needs before its load spread settles.
  *
  * Determinism: every statistic rides the shared integer ladders —
  * ilog2 for logs (L63 convention, clamped domain), ppm/Q10/Q20 fixed
  * point for ratios, (value, id) total orders for every rank — so the
  * DuckDB twins are bit-exact by construction.
  */
object CorpusAnalysisOps {

  /** L126 dials: minimum pair count (PMI over rare pairs is noise) and
    * the report depth.
    */
  private[queries] val PmiMinCount = 5L
  private[queries] val PmiTopK = 32

  /** L127 coverage target: flag at most ~10% of clean docs — the
    * calibration quantile is ⌈0.9·(n+1)⌉, the split-conformal order
    * statistic.
    */
  private[queries] val ConfNum = 9L

  /** L127's calibration-half clean-doc counts per source, over the
    * L86 score frame — factored so the q221 transfer matrix consumes
    * the REGISTERED protocol, not a copy.
    */
  private[queries] def conformalCalSizes(
      sc: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sc.filter(col("doc_id") % 2 === 0 && col("pos") === 0)
      .groupBy(col("source")).agg(count(lit(1)).as("n_cal"))

  /** L127's per-source conformal threshold — the ⌈ConfNum/ConfDen·
    * (n+1)⌉-th smallest clean calibration score under (score, doc_id)
    * order; sources without that order statistic carry no row.
    * Frame: (source, n_cal, tau).
    */
  private[queries] def conformalTaus(sc: org.apache.spark.sql.DataFrame,
      n: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    sc.filter(col("doc_id") % 2 === 0 && col("pos") === 0)
      .withColumn("rn", row_number().over(Window
        .partitionBy(col("source"))
        .orderBy(col("score"), col("doc_id"))).cast("long"))
      .join(n, Seq("source"))
      .filter(col("rn") ===
        expr(s"($ConfNum * (n_cal + 1) + $ConfDen - 1) div $ConfDen"))
      .select(col("source"), col("n_cal"), col("score").as("tau"))

  /** DuckDB twin of the τ protocol as CTEs (requires `sc` from
    * nbScoreCtesSql in scope) ending in `tau(source, n_cal, tau)`.
    */
  private[queries] def conformalTauCtesSql: String =
    s"""cal AS (SELECT source, doc_id, score FROM sc
          WHERE doc_id % 2 = 0 AND pos = 0),
      n AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_cal
        FROM cal GROUP BY 1),
      rkd AS (SELECT cal.source, cal.score, n.n_cal,
          CAST(row_number() OVER (PARTITION BY cal.source
            ORDER BY cal.score, cal.doc_id) AS BIGINT) AS rn
        FROM cal JOIN n ON n.source = cal.source),
      tau AS (SELECT source, n_cal, score AS tau FROM rkd
        WHERE rn = ($ConfNum * (n_cal + 1) + $ConfDen - 1)
          // $ConfDen)"""
  private[queries] val ConfDen = 10L

  /** L125 rater-B diversity threshold: distinct-word ratio below 1/2
    * in Q20 (the repetitive-text heuristic — the planted L74 block has
    * ratio 1/16, organic fixture docs sit near 1).
    */
  private[queries] val KappaDivQ20 = 524288L // 2^19

  /** L129 vocabulary budgets to price, and the single rank cut that
    * serves all of them (any word outside the top `max` is OOV for
    * every budget — the cut keeps the global rank window post-limit).
    */
  private[queries] val OovBudgets = Seq(256L, 1024L, 4096L)
  private[queries] val OovMaxBudget = 4096

  /** L130 ring geometry: shard count, the max vnodes-per-shard probed,
    * and the dial points. Ring coordinates are quantized to 8-doc-hash
    * steps with the shard id as the low bits — a TOTAL order both
    * engines compute identically, so coincident hashes can't diverge
    * the owner.
    */
  private[queries] val RingShards = 8L
  private[queries] val RingMaxVnodes = 16L
  private[queries] val RingDials = Seq(1L, 4L, 16L)

  def all: Seq[GraftQuery] = {

    /* L124: Heaps'-law vocabulary growth — "is more data from this
     * source still buying new types", the companion read to L113's
     * unseen mass and L119's Zipf slope: natural corpora grow their
     * vocabulary as V(n) ≈ K·n^β with β ∈ (0.4, 0.8); a template flood
     * flattens the curve (β → 0 — new docs, no new words) and random
     * noise pushes β → 1. Checkpoints are the DOUBLING windows of the
     * per-source ingestion order (rank bucket b = ilog2(rank), so
     * 32 checkpoints cover 4G docs): per bucket, token mass and the
     * count of types FIRST SEEN there; cumulative sums give (n_k, V_k)
     * at each checkpoint, and β is the same exact-integer least-squares
     * fit as q187 over (ilog2 n_k, ilog2 V_k). At 100 TB: the ingest id
     * IS the arrival order (the L31 monotone-ingest stance), so the
     * per-source rank is a property of the scan, not a sort; then one
     * word pass feeds two map-side-combined aggregates (per-bucket
     * token counts; per-(source, word) first-seen min), and the
     * cumulative window + fit run on ≤32 rows per source. Rank buckets
     * are dense by construction (ranks 1..n hit every ilog2 value up
     * to ilog2(n)); first-seen buckets left-join onto them. */
    val q192 = GraftQuery(
      "q192_heaps_vocab_growth", "L124 L119 L113",
      (s, d) => {
        val rk = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
          .withColumn("r", row_number().over(Window
            .partitionBy(col("source")).orderBy(col("doc_id"))).cast("long"))
        val w = rk.select(col("source"), col("r"),
          explode(Sketches.words(col("text"))).as("w"))
        val tok = w.groupBy(col("source"), Sketches.ilog2(col("r")).as("b"))
          .agg(count(lit(1)).as("tok"))
        val typ = w.groupBy(col("source"), col("w"))
          .agg(min(col("r")).as("rmin"))
          .groupBy(col("source"), Sketches.ilog2(col("rmin")).as("b"))
          .agg(count(lit(1)).as("typ"))
        val wc = Window.partitionBy(col("source")).orderBy(col("b"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val pts = tok.join(typ, Seq("source", "b"), "left")
          .select(col("source"), col("b"), col("tok"),
            coalesce(col("typ"), lit(0L)).as("typ"))
          .withColumn("cum_tok", sum(col("tok")).over(wc))
          .withColumn("cum_typ", sum(col("typ")).over(wc))
          .select(col("source"),
            col("cum_tok"), col("cum_typ"),
            Sketches.ilog2(col("cum_tok")).as("x"),
            Sketches.ilog2(col("cum_typ")).as("y"))
        pts.groupBy(col("source"))
          .agg(count(lit(1)).as("n_checkpoints"),
            max(col("cum_tok")).as("n_tokens"),
            max(col("cum_typ")).as("v_types"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("slope_ppm",
            expr("((n_checkpoints * sxy - sx * sy) * 1000000) " +
              "div greatest(n_checkpoints * sxx - sx * sx, 1)"))
          .withColumn("intercept_ppm",
            expr("(sy * 1000000 - slope_ppm * sx) div n_checkpoints"))
          .select(col("source"), col("n_checkpoints"), col("n_tokens"),
            col("v_types"), col("slope_ppm"), col("intercept_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val lr = Sketches.ilog2Sql("r")
        val lm = Sketches.ilog2Sql("rmin")
        val lx = Sketches.ilog2Sql("cum_tok")
        val ly = Sketches.ilog2Sql("cum_typ")
        s"""WITH rk AS (SELECT source, text, CAST(row_number() OVER
              (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS r
            FROM documents),
          w AS (SELECT source, r, unnest($ws) AS w FROM rk),
          tok AS (SELECT source, $lr AS b, CAST(COUNT(*) AS BIGINT) AS tok
            FROM w GROUP BY 1, 2),
          fs AS (SELECT source, w, CAST(MIN(r) AS BIGINT) AS rmin
            FROM w GROUP BY 1, 2),
          typ AS (SELECT source, $lm AS b, CAST(COUNT(*) AS BIGINT) AS typ
            FROM fs GROUP BY 1, 2),
          pts AS (SELECT tok.source, tok.b, tok.tok,
              COALESCE(typ.typ, 0) AS typ
            FROM tok LEFT JOIN typ
              ON typ.source = tok.source AND typ.b = tok.b),
          cm AS (SELECT source,
              CAST(SUM(tok) OVER (PARTITION BY source ORDER BY b
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tok,
              CAST(SUM(typ) OVER (PARTITION BY source ORDER BY b
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_typ
            FROM pts),
          pt AS (SELECT source, cum_tok, cum_typ,
              $lx AS x, $ly AS y FROM cm),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_checkpoints,
              CAST(MAX(cum_tok) AS BIGINT) AS n_tokens,
              CAST(MAX(cum_typ) AS BIGINT) AS v_types,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * y) AS BIGINT) AS sxy,
              CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pt GROUP BY 1),
          sl AS (SELECT *, ((n_checkpoints * sxy - sx * sy) * 1000000)
              // GREATEST(n_checkpoints * sxx - sx * sx, 1) AS slope_ppm
            FROM ag)
          SELECT source, n_checkpoints, n_tokens, v_types, slope_ppm,
            (sy * 1000000 - slope_ppm * sx) // n_checkpoints
              AS intercept_ppm
          FROM sl ORDER BY source"""
      })

    /* L125: Cohen's-kappa filter agreement — the chance-corrected read
     * on whether two quality filters measure the SAME thing: rater A is
     * the trained L86 NB classifier (decision score > 0, the registered
     * q154 kernel — not a copy), rater B the repetitive-text heuristic
     * (distinct-word ratio < 1/2 in Q20 over the same labeled text
     * view). Raw overlap (L56) rewards any imbalanced pair; kappa
     * subtracts the agreement their marginals would produce by chance:
     * po = agree·10^6 div n, pe = (pa·pb + (10^6−pa)·(10^6−pb)) div
     * 10^6, kappa = (po − pe)·10^6 div max(10^6 − pe, 1) — the guard
     * makes the degenerate no-variance case read 0, the standard
     * convention. Per source: n, both positive counts, agree count,
     * po/pe/kappa ppm. At 100 TB: the L86 train+score passes plus one
     * more word pass for the diversity ratio (map-side combined,
     * count + count-distinct per doc), one doc-keyed join, a
     * |sources|-row rollup. */
    val q193 = GraftQuery(
      "q193_kappa_filter_agreement", "L125 L86 L56",
      (s, d) => {
        val a = TrainedFilterOps.nbDocScores(s, d)
          .select(col("doc_id"), col("source"),
            when(col("score") > 0, 1L).otherwise(0L).as("ra"))
        val stride = SampleGraphOps.EntropyPlantStride
        val block = SampleGraphOps.LowEntropyBlock
        val b = Tables.documents(s, d)
          .select(col("doc_id"),
            when(col("doc_id") % stride === 0, lit(block))
              .otherwise(col("text")).as("text"))
          .select(col("doc_id"),
            explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("nw"), countDistinct(col("w")).as("nd"))
          .select(col("doc_id"),
            when(expr("(nd * 1048576) div nw") < KappaDivQ20, 1L)
              .otherwise(0L).as("rb"))
        a.join(b, Seq("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("ra")).as("n_a_pos"),
            sum(col("rb")).as("n_b_pos"),
            sum(when(col("ra") === col("rb"), 1L).otherwise(0L))
              .as("n_agree"))
          .withColumn("po_ppm", expr("(n_agree * 1000000) div n_docs"))
          .withColumn("pa", expr("(n_a_pos * 1000000) div n_docs"))
          .withColumn("pb", expr("(n_b_pos * 1000000) div n_docs"))
          .withColumn("pe_ppm", expr(
            "(pa * pb + (1000000 - pa) * (1000000 - pb)) div 1000000"))
          .withColumn("kappa_ppm", expr(
            "((po_ppm - pe_ppm) * 1000000) div " +
              "greatest(1000000 - pe_ppm, 1)"))
          .select(col("source"), col("n_docs"), col("n_a_pos"),
            col("n_b_pos"), col("n_agree"), col("po_ppm"),
            col("pe_ppm"), col("kappa_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val stride = SampleGraphOps.EntropyPlantStride
        val block = SampleGraphOps.LowEntropyBlock
        val ws = Sketches.wordsSql("text")
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          ra AS (SELECT doc_id, source,
              CASE WHEN score > 0 THEN 1 ELSE 0 END AS ra FROM sc),
          lb AS (SELECT doc_id,
              CASE WHEN doc_id % $stride = 0 THEN '$block' ELSE text END
                AS text
            FROM documents),
          dv AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nw,
              CAST(COUNT(DISTINCT w) AS BIGINT) AS nd
            FROM (SELECT doc_id, unnest($ws) AS w FROM lb) GROUP BY 1),
          rb AS (SELECT doc_id, CASE WHEN (nd * 1048576) // nw
              < $KappaDivQ20 THEN 1 ELSE 0 END AS rb FROM dv),
          cf AS (SELECT ra.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(ra.ra) AS BIGINT) AS n_a_pos,
              CAST(SUM(rb.rb) AS BIGINT) AS n_b_pos,
              CAST(SUM(CASE WHEN ra.ra = rb.rb THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree
            FROM ra JOIN rb ON rb.doc_id = ra.doc_id GROUP BY 1),
          pp AS (SELECT *, (n_agree * 1000000) // n_docs AS po_ppm,
              (n_a_pos * 1000000) // n_docs AS pa,
              (n_b_pos * 1000000) // n_docs AS pb
            FROM cf),
          pe AS (SELECT *, (pa * pb + (1000000 - pa) * (1000000 - pb))
              // 1000000 AS pe_ppm
            FROM pp)
          SELECT source, n_docs, n_a_pos, n_b_pos, n_agree, po_ppm,
            pe_ppm, ((po_ppm - pe_ppm) * 1000000)
              // GREATEST(1000000 - pe_ppm, 1) AS kappa_ppm
          FROM pe ORDER BY source"""
      })

    /* L126: PMI collocation mining — which word pairs behave as one
     * unit (tokenizer vocab candidates, multi-word entities, template
     * fragments): PMI = log(p(xy) / (p(x)·p(y))). On the integer ladder
     * the ratio is staged in Q10 pieces so no intermediate can overflow
     * at any corpus size — r = ((c_xy·2^10) div c_x)·((N·2^10) div c_y)
     * (first factor ≤ 2^10 since c_xy ≤ c_x; second ≤ N·2^10), pmi =
     * ilog2(r) − 20, negative for anti-correlated pairs and floored at
     * −20 by the clamped ladder. Pairs below the count floor are noise
     * and cut BEFORE the unigram joins. Report: global top-32 by
     * (pmi, c_xy, gram) with full provenance counts. At 100 TB: one
     * word pass (vocab-sized unigram agg), one bigram pass (the L95
     * postings shuffle), two vocab-keyed joins (AQE-broadcast when the
     * floored pair list is small), and the rank window runs AFTER the
     * orderBy.limit cut (the q135 post-limit stance) — the full pair
     * vocabulary never hits a single partition. */
    val q194 = GraftQuery(
      "q194_pmi_collocations", "L126 L95 L68",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("text"))
        val uni = docs.select(explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("c"))
        val tot = uni.agg(sum(col("c")).as("n"))
        val bi = docs.select(
            explode(call_function("graft_grams", col("text"), lit(2)))
              .as("gram"))
          .groupBy(col("gram")).agg(count(lit(1)).as("c_xy"))
          .filter(col("c_xy") >= PmiMinCount)
          .withColumn("w1", element_at(split(col("gram"), " "), 1))
          .withColumn("w2", element_at(split(col("gram"), " "), 2))
        val scored = bi
          .join(uni.select(col("w").as("w1"), col("c").as("c_x")), Seq("w1"))
          .join(uni.select(col("w").as("w2"), col("c").as("c_y")), Seq("w2"))
          .crossJoin(broadcast(tot))
          .withColumn("pmi", Sketches.ilog2(
            expr("((c_xy * 1024) div c_x) * ((n * 1024) div c_y)"))
            - lit(20L))
          .select(col("gram"), col("c_xy"), col("c_x"), col("c_y"),
            col("pmi"))
          .orderBy(col("pmi").desc, col("c_xy").desc, col("gram"))
          .limit(PmiTopK)
        scored.withColumn("rank", row_number().over(Window
            .orderBy(col("pmi").desc, col("c_xy").desc, col("gram")))
            .cast("long"))
          .select(col("rank"), col("gram"), col("c_xy"), col("c_x"),
            col("c_y"), col("pmi"))
          .orderBy(col("rank"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val lp = Sketches.ilog2Sql(
          "((c_xy * 1024) // c_x) * ((n * 1024) // c_y)")
        s"""WITH uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT unnest($ws) AS w FROM documents) GROUP BY 1),
          tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM uni),
          gd AS (SELECT CASE WHEN len($ws) >= 2 THEN
                list_transform(range(1, len($ws)),
                  i -> ($ws)[i] || ' ' || ($ws)[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS g
            FROM documents),
          bi AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS c_xy
            FROM (SELECT unnest(g) AS gram FROM gd) GROUP BY 1
            HAVING COUNT(*) >= $PmiMinCount),
          sp AS (SELECT gram, c_xy,
              split_part(gram, ' ', 1) AS w1,
              split_part(gram, ' ', 2) AS w2
            FROM bi),
          sc AS (SELECT sp.gram, sp.c_xy, u1.c AS c_x, u2.c AS c_y,
              $lp - 20 AS pmi
            FROM sp JOIN uni u1 ON u1.w = sp.w1
              JOIN uni u2 ON u2.w = sp.w2 CROSS JOIN tot),
          tk AS (SELECT * FROM sc
            ORDER BY pmi DESC, c_xy DESC, gram LIMIT $PmiTopK)
          SELECT CAST(row_number() OVER
              (ORDER BY pmi DESC, c_xy DESC, gram) AS BIGINT) AS rank,
            gram, c_xy, c_x, c_y, CAST(pmi AS BIGINT) AS pmi
          FROM tk ORDER BY rank"""
      })

    /* L127: split-conformal filter-threshold calibration — the
     * threshold-picking protocol with a DISTRIBUTION-FREE guarantee,
     * vs L78's empirical PR sweep: on a calibration half (doc_id
     * parity, the q169 stand-in for yesterday's labeled batch), take
     * the clean (non-plant) docs' NB scores and set τ = the
     * ⌈0.9·(n+1)⌉-th smallest under (score, doc_id) order; conformal
     * exchangeability then bounds the expected clean-doc flag rate
     * (score > τ) on the test half by ~10%. When a source's
     * calibration half is smaller than 9 clean docs the order
     * statistic doesn't exist — τ stays NULL and NOTHING flags (the
     * honest conservative branch, reported via has_tau = 0; scores
     * are signed, so no sentinel value could carry it). Per source:
     * n_cal, tau, test-half clean flag rate (the coverage audit), and
     * the plant-half flag count (the power read). At 100 TB: the L86
     * passes + one per-source rank window over calibration negatives
     * (sources are numerous → well-distributed; the sketch-τ
     * production form is REGISTERED as q226 (L158, spec-pinned equal
     * at the gated fixtures incl. the no-τ branch); this gated form
     * is its exact oracle). */
    val q195 = GraftQuery(
      "q195_conformal_threshold", "L127 L86 L78",
      (s, d) => {
        val sc = TrainedFilterOps.nbDocScores(s, d)
        val n = conformalCalSizes(sc)
        val tau = conformalTaus(sc, n)
        val test = sc.filter(col("doc_id") % 2 === 1)
        test.join(n, Seq("source"), "left")
          .join(tau.select(col("source"), col("tau")), Seq("source"), "left")
          .groupBy(col("source"))
          .agg(coalesce(min(col("n_cal")), lit(0L)).as("n_cal"),
            // scores are signed, so a sentinel can collide with a real
            // τ — has_tau carries the branch explicitly
            max(when(col("tau").isNotNull, 1L).otherwise(0L)).as("has_tau"),
            coalesce(min(col("tau")), lit(0L)).as("tau"),
            sum(when(col("pos") === 0, 1L).otherwise(0L)).as("n_test_neg"),
            sum(when(col("pos") === 0 && col("score") > col("tau"), 1L)
              .otherwise(0L)).as("n_neg_flagged"),
            sum(col("pos")).as("n_test_pos"),
            sum(when(col("pos") === 1 && col("score") > col("tau"), 1L)
              .otherwise(0L)).as("n_pos_flagged"))
          .withColumn("neg_flag_ppm", expr(
            "(n_neg_flagged * 1000000) div greatest(n_test_neg, 1)"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          $conformalTauCtesSql,
          th AS (SELECT sc.source, sc.pos, sc.score, tau.tau, n.n_cal
            FROM sc LEFT JOIN tau ON tau.source = sc.source
              LEFT JOIN n ON n.source = sc.source
            WHERE sc.doc_id % 2 = 1),
          ag AS (SELECT source,
              CAST(COALESCE(MIN(n_cal), 0) AS BIGINT) AS n_cal,
              CAST(MAX(CASE WHEN tau IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS has_tau,
              CAST(COALESCE(MIN(tau), 0) AS BIGINT) AS tau,
              CAST(SUM(CASE WHEN pos = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_test_neg,
              CAST(SUM(CASE WHEN pos = 0 AND score > tau THEN 1 ELSE 0
                END) AS BIGINT) AS n_neg_flagged,
              CAST(SUM(pos) AS BIGINT) AS n_test_pos,
              CAST(SUM(CASE WHEN pos = 1 AND score > tau THEN 1 ELSE 0
                END) AS BIGINT) AS n_pos_flagged
            FROM th GROUP BY 1)
          SELECT source, n_cal, has_tau, tau, n_test_neg, n_neg_flagged,
            n_test_pos, n_pos_flagged,
            (n_neg_flagged * 1000000) // GREATEST(n_test_neg, 1)
              AS neg_flag_ppm
          FROM ag ORDER BY source"""
      })

    /* L128: postings-compression planner — prices the L95 inverted
     * index's storage before building it: under Elias-gamma coding a
     * doc-id gap g costs 2·ilog2(g)+1 bits, so the planner computes
     * each gram's sorted-postings gap sequence (first gap = doc_id+1,
     * ids are 0-based), sums the per-gap costs, and rolls the result
     * up by df magnitude (bucket = ilog2(df)) against the raw 64-bit
     * cost — the classic result that FREQUENT terms compress hardest
     * (dense postings → small gaps) lands as ratio_ppm falling with
     * the bucket. Report per bucket: grams, postings, gamma bits, raw
     * bits, ratio. At 100 TB: postings are the same map-side-combined
     * (doc, gram) aggregate L95 builds; the gap window partitions by
     * gram (vocab-sized, well-distributed — hot grams are exactly the
     * dense ones whose windows are long but sequential), and the
     * rollup is ≤ 64 rows. */
    val q196 = GraftQuery(
      "q196_postings_size_planner", "L128 L95 L63",
      (s, d) => {
        val post = Tables.documents(s, d)
          .select(col("doc_id"),
            explode(call_function("graft_grams", col("text"), lit(2)))
              .as("gram"))
          .groupBy(col("gram"), col("doc_id"))
          .agg(count(lit(1)).as("tf"))
        val wg = Window.partitionBy(col("gram")).orderBy(col("doc_id"))
        val bits = post
          .withColumn("gap",
            col("doc_id") - lag(col("doc_id"), 1, -1L).over(wg))
          .withColumn("bits", lit(2L) * Sketches.ilog2(col("gap")) + 1L)
          .groupBy(col("gram"))
          .agg(count(lit(1)).as("df"), sum(col("bits")).as("gbits"))
        bits.groupBy(Sketches.ilog2(col("df")).as("df_bucket"))
          .agg(count(lit(1)).as("n_grams"),
            sum(col("df")).as("n_postings"),
            sum(col("gbits")).as("gamma_bits"))
          .withColumn("raw_bits", expr("n_postings * 64"))
          .withColumn("ratio_ppm",
            expr("(gamma_bits * 1000000) div raw_bits"))
          .orderBy(col("df_bucket"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val lg = Sketches.ilog2Sql("gap")
        val ld = Sketches.ilog2Sql("df")
        s"""WITH gd AS (SELECT doc_id, CASE WHEN len($ws) >= 2 THEN
                list_transform(range(1, len($ws)),
                  i -> ($ws)[i] || ' ' || ($ws)[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS g
            FROM documents),
          post AS (SELECT gram, doc_id FROM
              (SELECT doc_id, unnest(g) AS gram FROM gd)
            GROUP BY 1, 2),
          gp AS (SELECT gram,
              doc_id - LAG(doc_id, 1, -1) OVER (PARTITION BY gram
                ORDER BY doc_id) AS gap
            FROM post),
          gb AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df,
              CAST(SUM(2 * $lg + 1) AS BIGINT) AS gbits
            FROM gp GROUP BY 1),
          bk AS (SELECT $ld AS df_bucket,
              CAST(COUNT(*) AS BIGINT) AS n_grams,
              CAST(SUM(df) AS BIGINT) AS n_postings,
              CAST(SUM(gbits) AS BIGINT) AS gamma_bits
            FROM gb GROUP BY 1)
          SELECT df_bucket, n_grams, n_postings, gamma_bits,
            n_postings * 64 AS raw_bits,
            (gamma_bits * 1000000) // (n_postings * 64) AS ratio_ppm
          FROM bk ORDER BY df_bucket"""
      })

    /* L129: OOV-rate vocabulary-budget curve — the tokenizer-planning
     * companion to L50's fertility profile and L128's index planner:
     * for each candidate vocabulary budget V, what fraction of each
     * source's TOKEN mass falls outside the global top-V words (the
     * mass a V-entry word vocabulary would shatter into bytes/unks).
     * Per-source matters because a budget tuned on the majority source
     * quietly starves the others — the L35 argument at the tokenizer
     * layer. One global rank serves every budget: words are cut to the
     * top-4096 by (count, word) FIRST (TakeOrdered — the q135
     * post-limit stance, so the global rank window never sees the full
     * vocabulary), per-(source, word) token counts left-join that
     * broadcast list, and each budget is one conditional sum (rank
     * NULL or > V → OOV). At 100 TB: one word pass → two map-side-
     * combined vocab aggregates, a broadcast join, a |sources|-row
     * rollup emitted once per budget. */
    val q197 = GraftQuery(
      "q197_oov_budget_curve", "L129 L50 L35",
      (s, d) => {
        val w = Tables.documents(s, d).select(col("source"),
          explode(Sketches.words(col("text"))).as("w"))
        val top = w.groupBy(col("w")).agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("w")).limit(OovMaxBudget)
          .withColumn("rk", row_number().over(Window
            .orderBy(col("c").desc, col("w"))).cast("long"))
          .select(col("w"), col("rk"))
        val sw = w.groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("cs"))
          .join(broadcast(top), Seq("w"), "left")
        val sums = sum(col("cs")).as("n_tokens") +: OovBudgets.map(v =>
          sum(when(col("rk").isNull || col("rk") > v, col("cs"))
            .otherwise(0L)).as(s"oov_$v"))
        sw.groupBy(col("source")).agg(sums.head, sums.tail: _*)
          .select(col("source"), col("n_tokens"),
            explode(array(OovBudgets.map(v =>
              struct(lit(v).as("vocab_budget"),
                col(s"oov_$v").as("oov_tokens"))): _*)).as("x"))
          .select(col("source"), col("x.vocab_budget").as("vocab_budget"),
            col("n_tokens"), col("x.oov_tokens").as("oov_tokens"))
          .withColumn("oov_ppm",
            expr("(oov_tokens * 1000000) div n_tokens"))
          .orderBy(col("source"), col("vocab_budget"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val sums = OovBudgets.map(v =>
          s"""CAST(SUM(CASE WHEN rk IS NULL OR rk > $v THEN cs ELSE 0
              END) AS BIGINT) AS oov_$v""").mkString(",\n              ")
        val branches = OovBudgets.map(v =>
          s"""SELECT source, CAST($v AS BIGINT) AS vocab_budget,
              n_tokens, oov_$v AS oov_tokens,
              (oov_$v * 1000000) // n_tokens AS oov_ppm FROM ag""")
          .mkString("\n          UNION ALL\n          ")
        s"""WITH w AS (SELECT source, unnest($ws) AS w FROM documents),
          top AS (SELECT w, CAST(row_number() OVER
              (ORDER BY c DESC, w) AS BIGINT) AS rk
            FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w
              GROUP BY 1 ORDER BY c DESC, w LIMIT $OovMaxBudget)),
          sw AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS cs
            FROM w GROUP BY 1, 2),
          j AS (SELECT sw.source, sw.cs, top.rk
            FROM sw LEFT JOIN top ON top.w = sw.w),
          ag AS (SELECT source, CAST(SUM(cs) AS BIGINT) AS n_tokens,
              $sums
            FROM j GROUP BY 1)
          $branches
          ORDER BY source, vocab_budget"""
      })

    /* L130: consistent-hash-ring vnode dial — the load-spread planning
     * read on ring placement (the L81 hash-ring primitive turned into
     * an infra dial): with one vnode per shard the ring's 8 arcs are
     * wildly uneven (arc length is an order statistic of 8 uniforms);
     * every added vnode subdivides the arcs and the per-shard load
     * spread tightens toward uniform — THE reason rings ship vnodes.
     * Geometry: shard s places vnodes at r(s, v) = (h64("ring:"‖s‖":"‖
     * v) div 8)·8 + s — position quantized to 8 steps, shard id in the
     * low bits, a TOTAL order so two engines can't disagree on
     * coincident hashes; a doc at pd = (h64("pos:"‖id) div 8)·8 is
     * owned by the first vnode clockwise (min r ≥ pd, wrapping to the
     * global min — the two-tier min is exactly the ring lookup). The
     * nested dials share one pass: vnode sets v < V nest, so each V is
     * a pair of conditional mins over the same 128-row broadcast
     * frame. Report per (vnodes, shard): population and share, zero
     * shards densified in. At 100 TB: the vnode table is 8·16 rows
     * broadcast, ownership is a map-side fold per doc (production
     * evaluates it as one expression; the cross-join form is the
     * oracle-clear shape), and the rollup is 24 rows. */
    val q198 = GraftQuery(
      "q198_ring_vnode_dial", "L130 L111 L81",
      (s, d) => {
        val vn = s.range(RingShards).select(col("id").as("sh"))
          .crossJoin(s.range(RingMaxVnodes).select(col("id").as("v")))
          .withColumn("h", Sketches.h64(concat(lit("ring:"), col("sh"),
            lit(":"), col("v"))))
          .select(col("v"), expr(s"(h div 8) * 8 + sh").as("r"))
        val dp = Tables.documents(s, d)
          .select(col("doc_id"),
            Sketches.h64(concat(lit("pos:"), col("doc_id"))).as("h"))
          .select(col("doc_id"), expr("(h div 8) * 8").as("pd"))
        val ownCols = RingDials.map(vv => coalesce(
          min(when(col("v") < vv && col("r") >= col("pd"), col("r"))),
          min(when(col("v") < vv, col("r")))).as(s"o_$vv"))
        val owners = dp.crossJoin(broadcast(vn))
          .groupBy(col("doc_id"))
          .agg(ownCols.head, ownCols.tail: _*)
        val long = owners.select(explode(array(RingDials.map(vv =>
            struct(lit(vv).as("vnodes"),
              (col(s"o_$vv") % RingShards).as("shard"))): _*)).as("x"))
          .select(col("x.vnodes").as("vnodes"), col("x.shard").as("shard"))
        val grid = s.range(RingShards).select(col("id").as("shard"))
          .crossJoin(s.range(1).select(explode(array(
            RingDials.map(v => lit(v)): _*)).as("vnodes")))
        val tot = long.groupBy(col("vnodes")).agg(count(lit(1)).as("n"))
        grid.join(long.groupBy(col("vnodes"), col("shard"))
            .agg(count(lit(1)).as("n_docs")), Seq("vnodes", "shard"), "left")
          .select(col("vnodes"), col("shard"),
            coalesce(col("n_docs"), lit(0L)).as("n_docs"))
          .join(broadcast(tot), Seq("vnodes"))
          .withColumn("share_ppm", expr("(n_docs * 1000000) div n"))
          .select(col("vnodes"), col("shard"), col("n_docs"),
            col("share_ppm"))
          .orderBy(col("vnodes"), col("shard"))
      },
      Some {
        val hr = Sketches.h64Sql("'ring:' || sh || ':' || v.range")
        val hp = Sketches.h64Sql("'pos:' || doc_id")
        val owns = RingDials.map(vv =>
          s"""COALESCE(MIN(CASE WHEN v < $vv AND r >= pd THEN r END),
              MIN(CASE WHEN v < $vv THEN r END)) AS o_$vv""")
          .mkString(",\n              ")
        val unpiv = RingDials.map(vv =>
          s"SELECT CAST($vv AS BIGINT) AS vnodes, o_$vv % $RingShards " +
            "AS shard FROM own").mkString("\n            UNION ALL\n            ")
        val dials = RingDials.map(v => s"($v)").mkString(", ")
        s"""WITH vn AS (SELECT v.range AS v,
              (($hr) // 8) * 8 + sh AS r
            FROM (SELECT range AS sh FROM range($RingShards))
            CROSS JOIN range($RingMaxVnodes) v),
          dp AS (SELECT doc_id, (($hp) // 8) * 8 AS pd FROM documents),
          own AS (SELECT doc_id,
              $owns
            FROM dp CROSS JOIN vn GROUP BY 1),
          lo AS ($unpiv),
          ld AS (SELECT vnodes, shard, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM lo GROUP BY 1, 2),
          tot AS (SELECT vnodes, CAST(SUM(n_docs) AS BIGINT) AS n
            FROM ld GROUP BY 1),
          grid AS (SELECT CAST(d.vnodes AS BIGINT) AS vnodes,
              s.range AS shard
            FROM (VALUES $dials) d(vnodes) CROSS JOIN range($RingShards) s)
          SELECT grid.vnodes, grid.shard,
            CAST(COALESCE(ld.n_docs, 0) AS BIGINT) AS n_docs,
            (COALESCE(ld.n_docs, 0) * 1000000) // tot.n AS share_ppm
          FROM grid LEFT JOIN ld ON ld.vnodes = grid.vnodes
              AND ld.shard = grid.shard
            JOIN tot ON tot.vnodes = grid.vnodes
          ORDER BY grid.vnodes, grid.shard"""
      })

    Seq(q192, q193, q194, q195, q196, q197, q198)
  }
}
