package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Planner / estimator-calibration operators (SURVEY §2.11a,
  * L136–L139):
  *
  *  - L136 compute-optimal (Chinchilla) data planner  → q204
  *  - L137 b-bit MinHash calibration                  → q205
  *  - L138 Spearman quality-signal rank agreement     → q206
  *  - L139 dataset-cartography bootstrap quadrants    → q207
  *
  * The tier that prices DECISIONS other tiers execute: how large a
  * training run this corpus can feed before repetition discounts kick
  * in (the Chinchilla allocation read, in log space so no corpus size
  * overflows it), what a 1-bit MinHash signature — 16× smaller on the
  * wire — actually costs in resemblance accuracy on THIS corpus (the
  * L38 price-the-sketch stance at a different width), whether two
  * quality signals that AGREE on decisions (L125's kappa) also agree
  * on the RANKING a selection would consume (Spearman — thresholds
  * move, rankings are what survive), and which documents a trained
  * filter finds easy / hard / ambiguous under training-set
  * perturbation (the data-maps read: 4 hash-seeded bootstrap replicas
  * of the L86 classifier, score spread = sensitivity).
  *
  * Determinism: the planner rides the log2q10 mantissa-linear ladder,
  * the calibration buckets are integer match counts, the Spearman
  * ranks are (value, doc_id) total orders, and the bootstrap weights
  * are portable-hash functions of the doc id — every twin bit-exact.
  */
object PlannerCalibrationOps {

  /** L136 FLOP-budget grid (log2: ~1e6 … ~1e24 FLOPs — toy to
    * frontier; the small end keeps the data-constrained branch
    * two-sided on gated fixtures) and the Q10 ladder constants:
    * D_opt = sqrt(10·C/3) → log2 D = (log2 C + log2(10/3))/2 with
    * log2(10/3)·2^10 = 1778.65 → 1778; N_opt = D/20 with
    * log2(20)·2^10 = 4425.65 → 4425 (floor — documented rounding).
    */
  private[queries] val FlopBudgetsLog2 = Seq(20L, 40L, 60L, 80L)
  private[queries] val Log2TenThirdsQ10 = 1778L
  private[queries] val Log2TwentyQ10 = 4425L
  private[queries] val EpochCapLog2Q10 = 2048L // > 4 epochs flags

  /** L138 overflow ladder: below den = 2^41 the Spearman numerator
    * rescales exactly (6·sd2 ≤ 2·den keeps it under 2^62); above, the
    * denominator shifts instead — same branch on both engines.
    */
  private[queries] val SpearmanExactMax = 2199023255552L // 2^41

  /** L139 replica count (hash-seeded bootstrap). */
  private[queries] val CartReplicas = 4

  /** L139 bootstrap weight for replica r — a Poisson(1) surrogate on
    * the portable hash: m = h64("boot:r:"‖id) % 4 → weight 0 (p=¼),
    * 1 (p=½), 2 (p=¼); mean 1, variance ½. The SQL twin of the Column
    * form built inline in q207 (`hExpr` must already be the 60-bit
    * hash).
    */
  private def bootWeightSql(h: String): String =
    s"CASE WHEN $h % 4 = 0 THEN 0 WHEN $h % 4 = 3 THEN 2 ELSE 1 END"

  def all: Seq[GraftQuery] = {

    /* L136: compute-optimal data planner — the Chinchilla allocation
     * read on this corpus: a compute budget C is spent optimally at
     * D ≈ sqrt(10·C/3) training tokens and N = D/20 parameters
     * (C = 6·N·D with the 20-tokens-per-parameter optimum), so each
     * budget in the grid prices how many tokens the run WANTS against
     * how many each source can SUPPLY — epochs = D_opt/supply in log
     * space, and a source pushed past 4 epochs flags data-constrained
     * (the regime where repeating data stops buying loss; L123 prices
     * the same wall from the mixture side, this from the compute
     * side). Everything rides the log2q10 mantissa-linear ladder —
     * supplies, optima and epochs never leave log space, so no corpus
     * size can overflow the math (frontier budgets are 2^80 FLOPs).
     * At 100 TB: one word-count pass into a |sources|-row rollup;
     * planner math on |sources|·|grid| rows. */
    val q204 = GraftQuery(
      "q204_compute_optimal_plan", "L136 L123 L9",
      (s, d) => {
        val supply = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("supply_tokens"))
          .withColumn("s_log2q10", Sketches.log2q10(col("supply_tokens")))
        supply
          .select(col("source"), col("supply_tokens"), col("s_log2q10"),
            explode(array(FlopBudgetsLog2.map(c =>
              lit(c).as("c")): _*)).as("c_log2"))
          .withColumn("d_opt_log2q10",
            expr(s"(c_log2 * 1024 + $Log2TenThirdsQ10) div 2"))
          .withColumn("n_opt_log2q10",
            expr(s"d_opt_log2q10 - $Log2TwentyQ10"))
          .withColumn("epochs_log2q10",
            expr("d_opt_log2q10 - s_log2q10"))
          .withColumn("data_constrained",
            when(col("epochs_log2q10") > EpochCapLog2Q10, 1L)
              .otherwise(0L))
          .select(col("source"), col("c_log2"), col("supply_tokens"),
            col("s_log2q10"), col("d_opt_log2q10"),
            col("n_opt_log2q10"), col("epochs_log2q10"),
            col("data_constrained"))
          .orderBy(col("source"), col("c_log2"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val lg = Sketches.log2q10Sql("supply_tokens")
        val grid = FlopBudgetsLog2.map(c =>
          s"SELECT CAST($c AS BIGINT) AS c_log2")
          .mkString(" UNION ALL ")
        s"""WITH sup AS (SELECT source,
              CAST(COUNT(*) AS BIGINT) AS supply_tokens
            FROM (SELECT source, unnest($ws) AS w FROM documents)
            GROUP BY 1),
          sl AS (SELECT source, supply_tokens, $lg AS s_log2q10
            FROM sup),
          grid AS ($grid),
          pl AS (SELECT source, c_log2, supply_tokens, s_log2q10,
              (c_log2 * 1024 + $Log2TenThirdsQ10) // 2 AS d_opt_log2q10
            FROM sl CROSS JOIN grid)
          SELECT source, c_log2, supply_tokens, s_log2q10,
            d_opt_log2q10,
            d_opt_log2q10 - $Log2TwentyQ10 AS n_opt_log2q10,
            d_opt_log2q10 - s_log2q10 AS epochs_log2q10,
            CAST(CASE WHEN d_opt_log2q10 - s_log2q10 > $EpochCapLog2Q10
              THEN 1 ELSE 0 END AS BIGINT) AS data_constrained
          FROM pl ORDER BY source, c_log2"""
      })

    /* L137: b-bit MinHash calibration — the L38 "price the sketch"
     * read at a 16×-smaller width: keeping only the LOW BIT of each
     * of the 16 MinHash positions shrinks the signature from 128 to
     * 2 bytes, and the Li–König estimator recovers resemblance from
     * bit agreement as Ĵ = 2·A − 1 (a random unrelated pair agrees on
     * half its bits; clamped at 0). For every LSH candidate pair the
     * report buckets by 1-bit agreement count and lays the 1-bit
     * estimate next to the full-signature estimate and the exact
     * shingle Jaccard — the evidence for choosing a signature width
     * on THIS corpus. At 100 TB: runs over candidate pairs only
     * (banding + the executed hot-bucket guard bound them); the
     * output is ≤ 17 rows. */
    val q205 = GraftQuery(
      "q205_bbit_minhash_calibration", "L137 L38 L3",
      (s, d) => {
        val ex = LlmPipeline.shingleRows(s, d)
        val sig = LlmPipeline.signaturesOf(ex)
        val cand = LlmPipeline.lshCandidates(
          LlmPipeline.lshBands(sig, "bbit_hot_buckets"))
        val sigA = sig.select(col("doc_id").as("a") +:
          (0 until Sketches.NumHashes).map(i => col(s"s$i").as(s"a$i")): _*)
        val sigB = sig.select(col("doc_id").as("b") +:
          (0 until Sketches.NumHashes).map(i => col(s"s$i").as(s"b$i")): _*)
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = cand
          .join(ex.as("ea"), col("a") === col("ea.doc_id"))
          .join(ex.as("eb"),
            col("b") === col("eb.doc_id") && col("ea.s") === col("eb.s"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"))
        val pairs = cand
          .join(inter, Seq("a", "b"), "left")
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .join(sigA, "a").join(sigB, "b")
          .withColumn("exact_j",
            coalesce(col("inter"), lit(0L)).cast("double") /
              (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))))
          .withColumn("n_match", (0 until Sketches.NumHashes)
            .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
            .reduce(_ + _))
          .withColumn("n_match_1bit", (0 until Sketches.NumHashes)
            .map(i => when(col(s"a$i") % 2 === col(s"b$i") % 2, 1L)
              .otherwise(0L))
            .reduce(_ + _))
        pairs.groupBy(col("n_match_1bit"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(expr("n_match * 1000000 div 16")).as("sfe"),
            sum(floor(col("exact_j") * lit(1e6)).cast("long"))
              .as("sum_exact_u"),
            min(col("exact_j")).as("min_exact"),
            max(col("exact_j")).as("max_exact"))
          .withColumn("est_1bit_ppm", expr(
            "greatest(2 * (n_match_1bit * 1000000 div 16) - 1000000, 0)"))
          .withColumn("mean_full_est_ppm", expr("sfe div n_pairs"))
          .withColumn("mean_exact",
            (col("sum_exact_u").cast("double") /
              col("n_pairs").cast("double")) / lit(1e6))
          .select(col("n_match_1bit"), col("est_1bit_ppm"),
            col("n_pairs"), col("mean_full_est_ppm"),
            col("mean_exact"), col("min_exact"), col("max_exact"))
          .orderBy(col("n_match_1bit"))
      },
      Some {
        val matchTerms = (0 until Sketches.NumHashes)
          .map(i => s"(CASE WHEN ga.s$i = gb.s$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        val bitTerms = (0 until Sketches.NumHashes)
          .map(i => s"(CASE WHEN ga.s$i % 2 = gb.s$i % 2 THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH ${LlmPipeline.sigCtesSql},
          ${LlmPipeline.bandCandCtesSql},
          pa AS (SELECT c.a, c.b,
              ${Sketches.jaccardSql("sa.sh", "sb.sh")} AS exact_j,
              CAST(($matchTerms) AS BIGINT) AS n_match,
              CAST(($bitTerms) AS BIGINT) AS n_match_1bit
            FROM cand c
              JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
              JOIN sig ga ON ga.doc_id = c.a JOIN sig gb ON gb.doc_id = c.b)
          SELECT n_match_1bit,
            GREATEST(2 * (n_match_1bit * 1000000 // 16) - 1000000, 0)
              AS est_1bit_ppm,
            COUNT(*) AS n_pairs,
            CAST(SUM(n_match * 1000000 // 16) AS BIGINT) // COUNT(*)
              AS mean_full_est_ppm,
            (CAST(SUM(CAST(floor(exact_j * 1e6) AS BIGINT)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) / 1e6 AS mean_exact,
            MIN(exact_j) AS min_exact, MAX(exact_j) AS max_exact
          FROM pa GROUP BY 1 ORDER BY n_match_1bit"""
      })

    /* L138: Spearman quality-signal rank agreement — L125's kappa asks
     * whether two filters make the same DECISIONS; this asks whether
     * the trained L86 score and the L74 entropy heuristic impose the
     * same ORDER on the corpus, which is what actually matters once a
     * selection consumes the signal as a ranking (L21/L93 take top
     * fractions — thresholds move, rankings survive). Both signals are
     * oriented as junk-ness (NB score descending = most positive
     * first; entropy ascending = most repetitive first) over the SAME
     * labeled view, ranked by (value, doc_id) total orders, and
     * ρ = 1 − 6·Σd²/(n(n²−1)) rides a Q20 ladder with the q201-style
     * two-branch rescale. Domain bound: the rescale protects only the
     * NUMERATOR — den = n(n²−1) itself (and Σd² ~ n³/3 with it)
     * overflows BIGINT once a single source exceeds ~2^21 docs, and
     * DuckDB raises where Java wraps, so the twins diverge in failure
     * mode beyond that. Per-source n < 2^21 is the operator's stated
     * domain; at production the L43 fixed-size inspection sample keeps
     * n at the sample size, far inside it. At 100 TB:
     * production ranks the L43 fixed-size inspection sample per
     * source; this gated form is the exact oracle of that protocol
     * (the q171 stance). The two rank windows partition by source. */
    val q206 = GraftQuery(
      "q206_signal_rank_agreement", "L138 L86 L74 L125",
      (s, d) => {
        val a = TrainedFilterOps.nbDocScores(s, d)
          .select(col("doc_id"), col("source"), col("score"))
        val b = SampleGraphOps.entropyPerDoc(s, d)
          .select(col("doc_id"), col("hp"))
        val ra = Window.partitionBy(col("source"))
          .orderBy(col("score").desc, col("doc_id"))
        val rb = Window.partitionBy(col("source"))
          .orderBy(col("hp"), col("doc_id"))
        a.join(b, Seq("doc_id"))
          .withColumn("ra", row_number().over(ra).cast("long"))
          .withColumn("rb", row_number().over(rb).cast("long"))
          .withColumn("dd", col("ra") - col("rb"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("dd") * col("dd")).as("sum_d2"))
          .withColumn("den", expr("n_docs * (n_docs * n_docs - 1)"))
          .withColumn("t_q20", expr(
            s"CASE WHEN den < $SpearmanExactMax THEN " +
              "(6 * sum_d2 * 1048576) div greatest(den, 1) " +
              "ELSE (6 * sum_d2) div greatest(den div 1048576, 1) END"))
          .withColumn("rho_ppm",
            expr("1000000 - (t_q20 * 1000000) div 1048576"))
          .select(col("source"), col("n_docs"), col("sum_d2"),
            col("rho_ppm"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          ${SampleGraphOps.entropyCtesSql},
          j AS (SELECT sc.doc_id, sc.source, sc.score, h.hp
            FROM sc JOIN h ON h.doc_id = sc.doc_id),
          rk AS (SELECT source,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY score DESC, doc_id) AS BIGINT) AS ra,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY hp, doc_id) AS BIGINT) AS rb
            FROM j),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM((ra - rb) * (ra - rb)) AS BIGINT) AS sum_d2
            FROM rk GROUP BY 1),
          tq AS (SELECT source, n_docs, sum_d2,
              n_docs * (n_docs * n_docs - 1) AS den FROM ag),
          tt AS (SELECT *, CASE WHEN den < $SpearmanExactMax THEN
              (6 * sum_d2 * 1048576) // GREATEST(den, 1)
              ELSE (6 * sum_d2) // GREATEST(den // 1048576, 1) END
              AS t_q20 FROM tq)
          SELECT source, n_docs, sum_d2,
            1000000 - (t_q20 * 1000000) // 1048576 AS rho_ppm
          FROM tt ORDER BY source"""
      })

    /* L139: dataset-cartography bootstrap quadrants — the data-maps
     * read on the trained filter: retrain the L86 NB ladder under 4
     * hash-seeded bootstrap replicas of its training multiset (weights
     * 0/1/2 from the portable hash — a Poisson(1) surrogate; the L85
     * bootstrap stance applied to the MODEL instead of the statistic),
     * score every doc under every replica IN ONE PASS (the model agg
     * carries 8 weighted sums; the word join is shared), and map each
     * doc by (mean score, replica spread): documents whose score
     * barely moves are easy (stable evidence) or hard (stably
     * negative); documents whose score swings with the training draw
     * are AMBIGUOUS — the band worth human review before the filter
     * gates on them. Regions split at per-source MEDIANS (exact order
     * statistics on (value, doc_id) total orders — data-driven cuts
     * can't go degenerate on an arbitrary corpus), and the rollup
     * reports the plant mass per region (the planted positives should
     * concentrate in one region — the signal read). At 100 TB: the
     * L86 passes with 8 sums instead of 2, two source-partitioned
     * rank windows on doc-level frames, a |sources|-row median join,
     * a ≤3·|sources|-row rollup. */
    val rs = 0 until CartReplicas
    val q207 = GraftQuery(
      "q207_cartography_quadrants", "L139 L86 L85",
      (s, d) => {
        val stride = SampleGraphOps.EntropyPlantStride
        val block = SampleGraphOps.LowEntropyBlock
        val lab = Tables.documents(s, d)
          .select(col("doc_id"), col("source"),
            when(col("doc_id") % stride === 0, lit(block))
              .otherwise(col("text")).as("text"),
            when(col("doc_id") % stride === 0, 1L).otherwise(0L)
              .as("pos"))
        val wted = rs.foldLeft(lab) { (df, r) =>
          val m = Sketches.h64(concat(lit(s"boot:$r:"),
            col("doc_id").cast("string"))) % 4
          df.withColumn(s"wt$r",
            when(m === 0, 0L).when(m === 3, 2L).otherwise(1L))
        }
        val words = wted.select(col("doc_id") +: col("source") +:
          col("pos") +: rs.map(r => col(s"wt$r")) :+
          explode(Sketches.words(col("text"))).as("w"): _*)
        val modelAggs = rs.flatMap(r => Seq(
          sum(col("pos") * col(s"wt$r")).as(s"cp$r"),
          sum((lit(1L) - col("pos")) * col(s"wt$r")).as(s"cn$r")))
        val model = words.groupBy(col("w"))
          .agg(modelAggs.head, modelAggs.tail: _*)
        val totAggs = rs.flatMap(r => Seq(
          sum(col(s"cp$r")).as(s"np$r"),
          sum(col(s"cn$r")).as(s"nn$r"))) :+ count(lit(1)).as("v")
        val totals = model.agg(totAggs.head, totAggs.tail: _*)
        val llrCols = rs.map(r => expr(
          s"(length(bin(((cp$r + 1) * 1048576) div (np$r + v))) - 1) - " +
            s"(length(bin(((cn$r + 1) * 1048576) div (nn$r + v))) - 1)")
          .cast("long").as(s"llr$r"))
        val scoreAggs = rs.map(r => sum(col(s"llr$r")).as(s"sc$r"))
        val scored = words.join(broadcast(model), Seq("w"))
          .crossJoin(broadcast(totals))
          .select(col("doc_id") +: col("source") +: col("pos") +:
            llrCols: _*)
          .groupBy(col("doc_id"), col("source"), col("pos"))
          .agg(scoreAggs.head, scoreAggs.tail: _*)
          .withColumn("mean_score",
            expr(rs.map(r => s"sc$r").mkString("(", " + ", ")") +
              s" div $CartReplicas"))
          .withColumn("spread", expr(
            s"greatest(${rs.map(r => s"sc$r").mkString(", ")}) - " +
              s"least(${rs.map(r => s"sc$r").mkString(", ")})"))
        val rm = Window.partitionBy(col("source"))
          .orderBy(col("mean_score"), col("doc_id"))
        val rw = Window.partitionBy(col("source"))
          .orderBy(col("spread"), col("doc_id"))
        val ranked = scored
          .withColumn("rm", row_number().over(rm).cast("long"))
          .withColumn("rs", row_number().over(rw).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("source"))).cast("long"))
        val med = ranked.groupBy(col("source"))
          .agg(max(when(col("rm") === expr("(n + 1) div 2"),
            col("mean_score"))).as("med_mean"),
            max(when(col("rs") === expr("(n + 1) div 2"),
              col("spread"))).as("med_spread"))
        ranked.join(broadcast(med), Seq("source"))
          .withColumn("region",
            when(col("spread") > col("med_spread"), "ambiguous")
              .when(col("mean_score") > col("med_mean"), "easy")
              .otherwise("hard"))
          .groupBy(col("source"), col("region"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pos")).as("n_plant"),
            expr("sum(mean_score) div count(1)").as("avg_mean_score"),
            expr("sum(spread) div count(1)").as("avg_spread"))
          .orderBy(col("source"), col("region"))
      },
      Some {
        val stride = SampleGraphOps.EntropyPlantStride
        val block = SampleGraphOps.LowEntropyBlock
        val ws = Sketches.wordsSql("text")
        val wtCols = rs.map(r => bootWeightSql(Sketches.h64Sql(
          s"'boot:$r:' || CAST(doc_id AS VARCHAR)")) + s" AS wt$r")
          .mkString(",\n              ")
        val modelSums = rs.map(r =>
          s"CAST(SUM(pos * wt$r) AS BIGINT) AS cp$r, " +
            s"CAST(SUM((1 - pos) * wt$r) AS BIGINT) AS cn$r")
          .mkString(",\n              ")
        val totSums = rs.map(r =>
          s"CAST(SUM(cp$r) AS BIGINT) AS np$r, " +
            s"CAST(SUM(cn$r) AS BIGINT) AS nn$r")
          .mkString(",\n              ")
        val llrs = rs.map(r =>
          s"""(length(format('{:b}', ((m.cp$r + 1) * 1048576)
              // (t.np$r + t.v))) - 1)
            - (length(format('{:b}', ((m.cn$r + 1) * 1048576)
              // (t.nn$r + t.v))) - 1) AS llr$r""")
          .mkString(",\n              ")
        val scSums = rs.map(r =>
          s"CAST(SUM(llr$r) AS BIGINT) AS sc$r")
          .mkString(",\n              ")
        val scList = rs.map(r => s"sc$r").mkString(", ")
        s"""WITH lab AS (SELECT doc_id, source,
              CASE WHEN doc_id % $stride = 0 THEN '$block' ELSE text END
                AS text,
              CASE WHEN doc_id % $stride = 0 THEN 1 ELSE 0 END AS pos,
              $wtCols
            FROM documents),
          w AS (SELECT doc_id, source, pos,
              ${rs.map(r => s"wt$r").mkString(", ")}, unnest($ws) AS w
            FROM lab),
          m AS (SELECT w, $modelSums FROM w GROUP BY 1),
          t AS (SELECT $totSums, CAST(COUNT(*) AS BIGINT) AS v FROM m),
          sw AS (SELECT w.doc_id, w.source, w.pos, $llrs
            FROM w JOIN m ON m.w = w.w CROSS JOIN t),
          sc AS (SELECT doc_id, source, pos, $scSums
            FROM sw GROUP BY 1, 2, 3),
          pd AS (SELECT doc_id, source, pos,
              (${rs.map(r => s"sc$r").mkString(" + ")})
                // $CartReplicas AS mean_score,
              GREATEST($scList) - LEAST($scList) AS spread
            FROM sc),
          rk AS (SELECT *,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY mean_score, doc_id) AS BIGINT) AS rm,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY spread, doc_id) AS BIGINT) AS rs,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM pd),
          md AS (SELECT source,
              MAX(CASE WHEN rm = (n + 1) // 2 THEN mean_score END)
                AS med_mean,
              MAX(CASE WHEN rs = (n + 1) // 2 THEN spread END)
                AS med_spread
            FROM rk GROUP BY 1),
          rg AS (SELECT rk.source, rk.pos, rk.mean_score, rk.spread,
              CASE WHEN rk.spread > md.med_spread THEN 'ambiguous'
                WHEN rk.mean_score > md.med_mean THEN 'easy'
                ELSE 'hard' END AS region
            FROM rk JOIN md ON md.source = rk.source)
          SELECT source, region, COUNT(*) AS n_docs,
            CAST(SUM(pos) AS BIGINT) AS n_plant,
            CAST(SUM(mean_score) AS BIGINT) // COUNT(*)
              AS avg_mean_score,
            CAST(SUM(spread) AS BIGINT) // COUNT(*) AS avg_spread
          FROM rg GROUP BY 1, 2 ORDER BY source, region"""
      })

    Seq(q204, q205, q206, q207)
  }
}
