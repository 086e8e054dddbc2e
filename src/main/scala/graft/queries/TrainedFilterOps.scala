package graft.queries

import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.Sketches

/** Trained-filter and distribution-governance operators (SURVEY §2.11a,
  * L86–L88) — the stage where the pipeline stops applying FIXED rules
  * and starts applying models/policies derived from the corpus itself:
  *
  *  - L86 in-corpus Naive-Bayes quality classifier (train→score→gate) → q154
  *  - L87 distribution-matching rejection sampler                      → q155
  *  - L88 leakage-free split repair (cluster-coherent reassignment)    → q156
  *
  * Determinism: the NB log-likelihoods ride the integer-log2 ladder
  * (binary-string length — the L63/L74 convention; no libm), the
  * rejection draw is the portable hash against a Q20 fixed-point
  * acceptance, and the split repair reuses q97's exact cluster key and
  * the funnel's L14 split — all constants shared between engines.
  */
object TrainedFilterOps {

  /** L86 likelihood scale: counts are compared as
    * ilog2((c+1)·2^S div (N+V)); S = 20 keeps every gated-SF numerator
    * ≥ 1 (the dial grows with log2(corpus words) at production scale —
    * at S too small the ratio floors to 0 and the ladder loses
    * resolution gracefully, identically on both engines).
    */
  private[queries] val NbShift = 1048576L // 2^20

  /** L87 acceptance fixed point (Q20) and the length-bucket width. */
  private[queries] val RejQ = 1048576L
  private[queries] val RejBucketChars = 64L

  /** L87's stateless accept decision over any frame carrying a Q20
    * `acc_q20` column — accept iff h64("rej:"||doc_id) mod 2^20 falls
    * under the acceptance. Shared by q155 and the governed release.
    */
  private[graft] def rejectionAccepts(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    df.filter(Sketches.h64(concat(lit("rej:"),
      col("doc_id").cast("string"))) % RejQ < col("acc_q20"))

  /** L88's cluster-coherent split reassignment over any
    * (doc_id, split, ck) frame: emits the input plus `n` (cluster
    * size) and `new_split`. Shared by q156 and the governed release.
    */
  private[graft] def repairSplits(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val choice = docs.groupBy(col("ck"))
      .agg(count(lit(1)).as("n"),
        min(struct(col("doc_id"), col("split"))).as("m"))
      .select(col("ck"), col("n"), col("m.split").as("home"))
    docs.join(choice, Seq("ck"))
      .withColumn("new_split",
        when(col("n") >= 2, col("home")).otherwise(col("split")))
  }

  /** L86's per-doc NB frame — (doc_id, source, pos, score) — the
    * train→score kernel factored out of q154 so the classifier-guided
    * sampler (q161) consumes the REGISTERED model, not a copy.
    */
  private[graft] def nbDocScores(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    val labeled = Tables.documents(s, d)
      .select(col("doc_id"), col("source"),
        when(col("doc_id") % SampleGraphOps.EntropyPlantStride === 0,
          lit(SampleGraphOps.LowEntropyBlock)).otherwise(col("text"))
          .as("text"),
        when(col("doc_id") % SampleGraphOps.EntropyPlantStride === 0,
          1L).otherwise(0L).as("pos"))
    val words = labeled.select(col("doc_id"), col("source"), col("pos"),
      explode(Sketches.words(col("text"))).as("w"))
    val model = words.groupBy(col("w"))
      .agg(sum(col("pos")).as("cp"),
        sum(lit(1L) - col("pos")).as("cn"))
    val totals = model.agg(sum(col("cp")).as("np"),
      sum(col("cn")).as("nn"), count(lit(1)).as("v"))
    words.join(broadcast(model), Seq("w"))
      .crossJoin(broadcast(totals))
      .withColumn("llr",
        (length(bin(expr(s"((cp + 1) * $NbShift) div (np + v)"))) - 1
          ).cast("long") -
        (length(bin(expr(s"((cn + 1) * $NbShift) div (nn + v)"))) - 1
          ).cast("long"))
      .groupBy(col("doc_id"), col("source"), col("pos"))
      .agg(sum(col("llr")).as("score"))
  }

  /** DuckDB twin of [[nbDocScores]] as CTEs ending in
    * `sc(doc_id, source, pos, score)`.
    */
  private[queries] def nbScoreCtesSql: String = {
    val stride = SampleGraphOps.EntropyPlantStride
    val block = SampleGraphOps.LowEntropyBlock
    val ws = Sketches.wordsSql("text")
    s"""lab AS (SELECT doc_id, source,
          CASE WHEN doc_id % $stride = 0 THEN '$block' ELSE text END
            AS text,
          CASE WHEN doc_id % $stride = 0 THEN 1 ELSE 0 END AS pos
        FROM documents),
      w AS (SELECT doc_id, source, pos, unnest($ws) AS w FROM lab),
      m AS (SELECT w, CAST(SUM(pos) AS BIGINT) AS cp,
          CAST(SUM(1 - pos) AS BIGINT) AS cn FROM w GROUP BY 1),
      t AS (SELECT CAST(SUM(cp) AS BIGINT) AS np,
          CAST(SUM(cn) AS BIGINT) AS nn,
          CAST(COUNT(*) AS BIGINT) AS v FROM m),
      sw AS (SELECT w.doc_id, w.source, w.pos,
          (length(format('{:b}', ((m.cp + 1) * $NbShift) // (t.np + t.v)))
             - 1)
          - (length(format('{:b}', ((m.cn + 1) * $NbShift) // (t.nn + t.v)))
             - 1) AS llr
        FROM w JOIN m ON m.w = w.w CROSS JOIN t),
      sc AS (SELECT doc_id, source, pos, CAST(SUM(llr) AS BIGINT)
          AS score FROM sw GROUP BY 1, 2, 3)"""
  }

  def all: Seq[GraftQuery] = {

    /* L86: the CCNet/fastText-shaped TRAINED quality classifier, as one
     * self-contained train→score→evaluate pass: labels come from the
     * established L74 plant (the %41 slice IS the positive class, so the
     * confusion counts are exact ground truth, not annotation), training
     * is one explode + vocab-sized aggregate (per-word class counts),
     * the model ships back as a BROADCAST join (never a driver collect),
     * and scoring is the per-word integer log-likelihood ratio
     * ilog2((c_pos+1)·2^S div (N_pos+V)) − ilog2((c_neg+1)·2^S div
     * (N_neg+V)) summed per doc — Laplace-smoothed multinomial NB on the
     * libm-free ladder. decision: score > 0. The per-source confusion
     * matrix (tp/fp vs the plant) gates the whole train→score loop
     * end-to-end: a wrong count anywhere moves tp/fp/sum_score. At
     * 100 TB: one corpus pass to train (map-side-combined vocab agg),
     * one to score (broadcast model + per-doc re-agg) — the q88
     * train-then-score shape with a learned per-word weight instead of
     * a membership bit. */
    val q154 = GraftQuery(
      "q154_nb_quality_classifier", "L86 L23 L35",
      (s, d) => {
        nbDocScores(s, d).groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("pos")).as("n_pos"),
            sum(when(col("score") > 0, 1L).otherwise(0L)).as("n_pred_pos"),
            sum(when(col("pos") === 1 && col("score") > 0, 1L).otherwise(0L))
              .as("tp"),
            sum(when(col("pos") === 0 && col("score") > 0, 1L).otherwise(0L))
              .as("fp"),
            sum(col("score")).as("sum_score"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH $nbScoreCtesSql
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(pos) AS BIGINT) AS n_pos,
            CAST(SUM(CASE WHEN score > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_pred_pos,
            CAST(SUM(CASE WHEN pos = 1 AND score > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS tp,
            CAST(SUM(CASE WHEN pos = 0 AND score > 0 THEN 1 ELSE 0 END)
              AS BIGINT) AS fp,
            CAST(SUM(score) AS BIGINT) AS sum_score
          FROM sc GROUP BY 1 ORDER BY source"""
      })

    /* L87: distribution-matching rejection sampler — debias a corpus
     * feature (here: the length distribution) toward a target (uniform
     * over buckets) WITHOUT a global sort or a second pass over ranked
     * data: per-bucket acceptance = (target·2^20) div bucket_count in
     * Q20 fixed point (target = the min bucket count — flattening), and
     * each doc accepts iff h64("rej:"||doc_id) mod 2^20 < acceptance —
     * a stateless deterministic draw, reproducible under appends and
     * across engines. The output is the governance curve: per bucket
     * before/after counts, the acceptance dial, and the achieved
     * deviation from target in ppm (binomial noise, measured not
     * assumed). At 100 TB: one map-side-combined 8-row histogram, the
     * acceptance frame broadcasts back, accept is a map-side predicate
     * — two scans, no shuffle beyond 8-row aggregates. */
    val q155 = GraftQuery(
      "q155_rejection_resample", "L87 L30 L18",
      (s, d) => {
        val b = Tables.documents(s, d)
          .select(col("doc_id"),
            least(expr(s"n_chars div $RejBucketChars"), lit(7L)).as("bkt"))
        val c = b.groupBy(col("bkt")).agg(count(lit(1)).as("n_before"))
        val t = c.agg(min(col("n_before")).as("target"))
        val a = c.crossJoin(broadcast(t))
          .withColumn("acc_q20", expr(s"(target * $RejQ) div n_before"))
        val kept = rejectionAccepts(b.join(
            broadcast(a.select(col("bkt"), col("acc_q20"))), Seq("bkt")))
          .groupBy(col("bkt")).agg(count(lit(1)).as("n_after"))
        a.join(kept, Seq("bkt"), "left")
          .select(col("bkt"), col("n_before"), col("acc_q20"),
            coalesce(col("n_after"), lit(0L)).as("n_after"), col("target"),
            expr(s"abs(coalesce(n_after, 0) - target) * 1000000 div target")
              .as("dev_ppm"))
          .orderBy(col("bkt"))
      },
      Some {
        val h = Sketches.h64Sql("'rej:' || doc_id")
        s"""WITH b AS (SELECT doc_id,
              LEAST(n_chars // $RejBucketChars, 7) AS bkt FROM documents),
          c AS (SELECT bkt, CAST(COUNT(*) AS BIGINT) AS n_before
            FROM b GROUP BY 1),
          t AS (SELECT MIN(n_before) AS target FROM c),
          a AS (SELECT c.bkt, c.n_before,
              (t.target * $RejQ) // c.n_before AS acc_q20, t.target
            FROM c CROSS JOIN t),
          k AS (SELECT b.bkt, CAST(COUNT(*) AS BIGINT) AS n_after
            FROM b JOIN a ON a.bkt = b.bkt
            WHERE $h % $RejQ < a.acc_q20 GROUP BY 1)
          SELECT a.bkt, a.n_before, a.acc_q20,
            COALESCE(k.n_after, 0) AS n_after, a.target,
            abs(COALESCE(k.n_after, 0) - a.target) * 1000000 // a.target
              AS dev_ppm
          FROM a LEFT JOIN k ON k.bkt = a.bkt
          ORDER BY a.bkt"""
      })

    /* L88: leakage-free split repair — the FIX for what the q97 audit
     * measures: the L14 id-hash split is content-blind, so bag-of-words
     * duplicate clusters can straddle train/val/test and leak eval
     * content into training. Repair: every multi-doc cluster moves
     * WHOLE to its home split (the split of its minimum-doc_id member —
     * deterministic, and stable under re-runs because the minimum
     * member never changes when docs are only appended); singleton
     * clusters keep their hash split, preserving the split ratios up to
     * the moved mass. The in-query `leaking_after` recount (≡ 0 by
     * construction) rides every row — the oracle re-derives it, so the
     * gate proves the repair, not just the bookkeeping. At 100 TB: one
     * hash aggregate per cluster key, one shuffle-on-ck join back
     * (co-located if the corpus is K8-bucketed by ck), |splits|-row
     * output. */
    val q156 = GraftQuery(
      "q156_split_leakage_repair", "L88 L32 L14",
      (s, d) => {
        val docs = LlmPipeline.funnelFlags(s, d)
          .select(col("doc_id"), col("split"),
            Sketches.h64(array_join(sort_array(array_distinct(
              Sketches.words(col("text")))), " ")).as("ck"))
        val repaired = repairSplits(docs)
        val leakAfter = repaired.groupBy(col("ck"))
          .agg(max(col("n")).as("n2"),
            countDistinct(col("new_split")).as("ns"))
          .filter(col("n2") >= 2 && col("ns") >= 2)
          .agg(count(lit(1)).as("leaking_after"))
        val before = docs.groupBy(col("split"))
          .agg(count(lit(1)).as("n_before"))
        repaired.groupBy(col("new_split"))
          .agg(count(lit(1)).as("n_after"),
            sum(when(col("new_split") =!= col("split"), 1L).otherwise(0L))
              .as("n_moved_in"))
          .join(before, col("new_split") === col("split"))
          .crossJoin(broadcast(leakAfter))
          .select(col("new_split").as("split"), col("n_before"),
            col("n_after"), col("n_moved_in"), col("leaking_after"))
          .orderBy(col("split"))
      },
      Some {
        val ck = Sketches.h64Sql(
          s"array_to_string(list_sort(list_distinct(${Sketches.wordsSql("text")})), ' ')")
        s"""WITH ${LlmPipeline.funnelBaseCtesSql},
          docs AS (SELECT doc_id, split, $ck AS ck FROM base),
          ch AS (SELECT ck, COUNT(*) AS n, MIN(doc_id) AS d0
            FROM docs GROUP BY 1),
          hm AS (SELECT c.ck, c.n, d.split AS home
            FROM ch c JOIN docs d ON d.ck = c.ck AND d.doc_id = c.d0),
          rp AS (SELECT d.doc_id, d.split, d.ck,
              CASE WHEN h.n >= 2 THEN h.home ELSE d.split END AS new_split
            FROM docs d JOIN hm h ON h.ck = d.ck),
          la AS (SELECT CAST(COUNT(*) AS BIGINT) AS leaking_after FROM
            (SELECT ck FROM rp GROUP BY ck
             HAVING COUNT(*) >= 2 AND COUNT(DISTINCT new_split) >= 2)),
          bf AS (SELECT split, CAST(COUNT(*) AS BIGINT) AS n_before
            FROM docs GROUP BY 1)
          SELECT r.new_split AS split, bf.n_before,
            CAST(COUNT(*) AS BIGINT) AS n_after,
            CAST(SUM(CASE WHEN r.new_split <> r.split THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved_in,
            (SELECT leaking_after FROM la) AS leaking_after
          FROM rp r JOIN bf ON bf.split = r.new_split
          GROUP BY 1, 2 ORDER BY split"""
      })

    /* L93: classifier-guided sampling — the FineWeb-Edu move: instead of
     * a hard keep/drop threshold on the trained quality score, sample
     * each doc with probability proportional to its ORGANIC-ness
     * (smax − score, min-max normalized to Q20 — the planted class sits
     * at smax, so it is sampled at ~rate 0 while the most-organic doc is
     * always kept): acceptance is the stateless h64("qs:"‖doc_id) draw
     * against the per-doc Q20 dial, reproducible under appends. The
     * report proves the DISTRIBUTION SHIFT, not just counts: per-source
     * kept counts, plant-kept counts (≈0), and summed scores before vs
     * after (kept mass must skew organic). Consumes the REGISTERED L86
     * model via the factored [[nbDocScores]] kernel. At 100 TB: the L86
     * passes plus one 1-row min/max broadcast and a map-side accept —
     * no new shuffle. */
    val q161 = GraftQuery(
      "q161_classifier_guided_sampling", "L93 L86 L87",
      (s, d) => {
        val sc = nbDocScores(s, d)
        val st = sc.agg(min(col("score")).as("smin"),
          max(col("score")).as("smax"))
        val a = sc.crossJoin(broadcast(st))
          .withColumn("acc_q20", expr(
            s"((smax - score) * $RejQ) div greatest(1, smax - smin)"))
          .withColumn("kept", Sketches.h64(concat(lit("qs:"),
            col("doc_id").cast("string"))) % RejQ < col("acc_q20"))
        a.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(col("pos")).as("n_plant"),
            sum(when(col("kept") && col("pos") === 1, 1L).otherwise(0L))
              .as("n_plant_kept"),
            sum(col("score")).as("sum_score"),
            sum(when(col("kept"), col("score")).otherwise(0L))
              .as("sum_score_kept"))
          .orderBy(col("source"))
      },
      Some {
        val h = Sketches.h64Sql("'qs:' || doc_id")
        s"""WITH $nbScoreCtesSql,
          st AS (SELECT MIN(score) AS smin, MAX(score) AS smax FROM sc),
          a AS (SELECT sc.*,
              ((st.smax - sc.score) * $RejQ)
                // GREATEST(1, st.smax - st.smin) AS acc_q20
            FROM sc CROSS JOIN st),
          k AS (SELECT a.*,
              ($h % $RejQ) < acc_q20 AS kept FROM a)
          SELECT source, COUNT(*) AS n_docs,
            CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(SUM(pos) AS BIGINT) AS n_plant,
            CAST(SUM(CASE WHEN kept AND pos = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_plant_kept,
            CAST(SUM(score) AS BIGINT) AS sum_score,
            CAST(SUM(CASE WHEN kept THEN score ELSE 0 END) AS BIGINT)
              AS sum_score_kept
          FROM k GROUP BY 1 ORDER BY source"""
      })

    /* L109: exact ROC-AUC of the trained classifier (Mann–Whitney form)
     * — the threshold-free companion to the L78 PR sweep: AUC is the
     * probability a random positive (plant) outscores a random negative,
     * computed exactly from the REGISTERED L86 scores (the nbDocScores
     * kernel — same model q154/q161 gate) via the rank-sum identity.
     * The scalable shape is a HISTOGRAM cumulative, never a global
     * per-doc sort: scores collapse to per-(source, score) counts
     * (|distinct scores| rows — the NB integer ladder keeps this small),
     * a cumulative window over those rows yields the negatives-below
     * count, and U2 = Σ_s np(s)·(2·nn_below(s) + nn(s)) — twice the
     * Mann–Whitney U with the tie term (np·nn at equal scores counts
     * half) folded in at integer precision. auc_ppm = U2·10^6 div
     * (2·np·nn); a source with no plants (or all plants) reports −1
     * rather than dividing by zero. All quantities are non-negative
     * integers, so div/`//` agree without floor adjustment. At 100 TB:
     * the L86 passes plus one map-side-combined histogram and a window
     * over |distinct scores| rows per source — no new corpus-sized
     * shuffle; the ·10^6 rescale happens after the per-source reduce,
     * so the only quadratic-in-n product is np·nn (a production corpus
     * computes auc in a wider unit or per shard first). */
    val q177 = GraftQuery(
      "q177_classifier_auc", "L109 L86 L78",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val h = nbDocScores(s, d)
          .groupBy(col("source"), col("score"))
          .agg(sum(col("pos")).as("np"),
            sum(lit(1L) - col("pos")).as("nn"))
        val w = Window.partitionBy(col("source")).orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.withColumn("nn_below", sum(col("nn")).over(w) - col("nn"))
          .groupBy(col("source"))
          .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
            count(lit(1)).as("n_scores"),
            sum(col("np") * (col("nn_below") * 2 + col("nn"))).as("u2"))
          .withColumn("auc_ppm",
            when(col("n_pos") * col("n_neg") > 0,
              expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
              .otherwise(lit(-1L)))
          .select(col("source"), col("n_pos"), col("n_neg"),
            col("n_scores"), col("u2"), col("auc_ppm"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH $nbScoreCtesSql,
          h AS (SELECT source, score, CAST(SUM(pos) AS BIGINT) AS np,
              CAST(SUM(1 - pos) AS BIGINT) AS nn
            FROM sc GROUP BY 1, 2),
          c AS (SELECT *, CAST(SUM(nn) OVER (PARTITION BY source
              ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) - nn
              AS nn_below FROM h),
          au AS (SELECT source, CAST(SUM(np) AS BIGINT) AS n_pos,
              CAST(SUM(nn) AS BIGINT) AS n_neg,
              CAST(COUNT(*) AS BIGINT) AS n_scores,
              CAST(SUM(np * (2 * nn_below + nn)) AS BIGINT) AS u2
            FROM c GROUP BY 1)
          SELECT source, n_pos, n_neg, n_scores, u2,
            CASE WHEN n_pos * n_neg > 0
              THEN (u2 * 1000000) // (2 * n_pos * n_neg)
              ELSE -1 END AS auc_ppm
          FROM au ORDER BY source"""
      })

    /* L120: reliability-diagram calibration audit + ECE — the third
     * read on the trained filter, orthogonal to both gates it joins:
     * q161's PR sweep prices a THRESHOLD, q177's AUC scores the
     * RANKING, this one asks whether the scores MEAN what they claim —
     * does a doc scored "90% positive" come up positive 90% of the
     * time? (An over-confident quality filter silently narrows the
     * corpus; calibration is the number that catches it before the
     * threshold is chosen.) The NB score is log₂ odds on the ilog2
     * ladder, so the implied probability needs no libm: σ₂(s) =
     * 2^s/(1+2^s) is an EXACT RATIONAL — conf_ppm = (2^s·10^6) div
     * (2^s+1) for s ≥ 0, 10^6 div (1+2^−s) below, |s| capped at 20
     * bits where the ppm ladder saturates anyway. Docs bucket by
     * confidence decile; per (source, bin): n, n_pos, mean confidence
     * vs observed positive rate (both ppm), and per source the
     * expected calibration error ECE = Σ_b n_b·|conf_b − acc_b| div n
     * broadcast onto every row (the q178 summary stance). At 100 TB:
     * the L86 passes + one map-side column (two shifts, a division)
     * + a ≤10·|sources|-row rollup — no new corpus-sized shuffle. */
    val q188 = GraftQuery(
      "q188_calibration_ece", "L120 L109 L86",
      (s, d) => {
        val conf = nbDocScores(s, d)
          .withColumn("conf_ppm", expr(
            "CASE WHEN score >= 0 THEN " +
              "(shiftleft(CAST(1 AS BIGINT), CAST(LEAST(score, 20) AS INT))" +
              " * 1000000) div " +
              "(shiftleft(CAST(1 AS BIGINT), CAST(LEAST(score, 20) AS INT))" +
              " + 1) " +
              "ELSE 1000000 div (1 + shiftleft(CAST(1 AS BIGINT), " +
              "CAST(LEAST(-score, 20) AS INT))) END"))
          .withColumn("bin", least(expr("conf_ppm div 100000"), lit(9L)))
        val bins = conf.groupBy(col("source"), col("bin"))
          .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
            sum(col("conf_ppm")).as("sum_conf"))
          .withColumn("conf_mean_ppm", expr("sum_conf div n"))
          .withColumn("acc_ppm", expr("(n_pos * 1000000) div n"))
        val ece = bins.groupBy(col("source"))
          .agg(sum(col("n")).as("n_docs"),
            sum(col("n") * abs(col("conf_mean_ppm") - col("acc_ppm")))
              .as("werr"))
          .select(col("source"), expr("werr div n_docs").as("ece_ppm"))
        bins.join(broadcast(ece), Seq("source"))
          .select(col("source"), col("bin"), col("n"), col("n_pos"),
            col("conf_mean_ppm"), col("acc_ppm"), col("ece_ppm"))
          .orderBy(col("source"), col("bin"))
      },
      Some {
        s"""WITH $nbScoreCtesSql,
          cf AS (SELECT source, pos,
              CASE WHEN score >= 0 THEN
                ((1::BIGINT << CAST(LEAST(score, 20) AS INT)) * 1000000)
                  // ((1::BIGINT << CAST(LEAST(score, 20) AS INT)) + 1)
              ELSE 1000000 // (1 + (1::BIGINT
                << CAST(LEAST(-score, 20) AS INT))) END AS conf_ppm
            FROM sc),
          cb AS (SELECT source, LEAST(conf_ppm // 100000, 9) AS bin,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(pos) AS BIGINT) AS n_pos,
              CAST(SUM(conf_ppm) AS BIGINT) AS sum_conf
            FROM cf GROUP BY 1, 2),
          bb AS (SELECT source, bin, n, n_pos,
              sum_conf // n AS conf_mean_ppm,
              (n_pos * 1000000) // n AS acc_ppm
            FROM cb),
          ec AS (SELECT source,
              CAST(SUM(n * abs(conf_mean_ppm - acc_ppm)) AS BIGINT)
                // CAST(SUM(n) AS BIGINT) AS ece_ppm
            FROM bb GROUP BY 1)
          SELECT bb.source, bb.bin, bb.n, bb.n_pos, bb.conf_mean_ppm,
            bb.acc_ppm, ec.ece_ppm
          FROM bb JOIN ec ON ec.source = bb.source
          ORDER BY bb.source, bb.bin"""
      })

    /* L122: permutation null-control for the classifier eval — the
     * negative control every eval harness owes its reader: re-run the
     * exact q177 AUC machinery over the SAME registered scores but
     * with labels REPLACED by a deterministic hash pseudo-label at the
     * plant rate (h64("null:"‖doc_id) % stride == 0 — independent of
     * the text, so no signal exists by construction). A healthy
     * harness scores ≈ ½; a null AUC pinned at 0/10^6 (label leak into
     * the score path) or exactly ½ with zero variance (degenerate
     * histogram) means the EVAL is broken, not the model — the control
     * that catches it before anyone trusts q177/q188. Report per
     * source: null class sizes, auc_null_ppm, and |auc − ½| in ppm;
     * the spec additionally pins real-labels AUC > null AUC per
     * source. Same cost shape as q177: the L86 passes + a histogram
     * window — the null label is one map-side hash column. */
    val q190 = GraftQuery(
      "q190_auc_null_control", "L122 L109 L86",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val stride = SampleGraphOps.EntropyPlantStride
        val h = nbDocScores(s, d)
          .withColumn("npos", when(Sketches.h64(concat(lit("null:"),
            col("doc_id"))) % lit(stride) === 0, 1L).otherwise(0L))
          .groupBy(col("source"), col("score"))
          .agg(sum(col("npos")).as("np"),
            sum(lit(1L) - col("npos")).as("nn"))
        val w = Window.partitionBy(col("source")).orderBy(col("score"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        h.withColumn("nn_below", sum(col("nn")).over(w) - col("nn"))
          .groupBy(col("source"))
          .agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
            sum(col("np") * (col("nn_below") * 2 + col("nn"))).as("u2"))
          .withColumn("auc_null_ppm",
            when(col("n_pos") * col("n_neg") > 0,
              expr("(u2 * 1000000) div (2 * n_pos * n_neg)"))
              .otherwise(lit(-1L)))
          .withColumn("dev_ppm",
            when(col("auc_null_ppm") >= 0,
              abs(col("auc_null_ppm") - 500000L)).otherwise(lit(-1L)))
          .select(col("source"), col("n_pos"), col("n_neg"),
            col("u2"), col("auc_null_ppm"), col("dev_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val stride = SampleGraphOps.EntropyPlantStride
        val hn = Sketches.h64Sql("'null:' || doc_id")
        s"""WITH $nbScoreCtesSql,
          nl AS (SELECT source, score,
              CASE WHEN $hn % $stride = 0 THEN 1 ELSE 0 END AS npos
            FROM sc),
          h AS (SELECT source, score, CAST(SUM(npos) AS BIGINT) AS np,
              CAST(SUM(1 - npos) AS BIGINT) AS nn
            FROM nl GROUP BY 1, 2),
          c AS (SELECT *, CAST(SUM(nn) OVER (PARTITION BY source
              ORDER BY score ROWS UNBOUNDED PRECEDING) AS BIGINT) - nn
              AS nn_below FROM h),
          au AS (SELECT source, CAST(SUM(np) AS BIGINT) AS n_pos,
              CAST(SUM(nn) AS BIGINT) AS n_neg,
              CAST(SUM(np * (2 * nn_below + nn)) AS BIGINT) AS u2
            FROM c GROUP BY 1),
          fin AS (SELECT source, n_pos, n_neg, u2,
              CASE WHEN n_pos * n_neg > 0
                THEN (u2 * 1000000) // (2 * n_pos * n_neg)
                ELSE -1 END AS auc_null_ppm
            FROM au)
          SELECT source, n_pos, n_neg, u2, auc_null_ppm,
            CASE WHEN auc_null_ppm >= 0 THEN abs(auc_null_ppm - 500000)
              ELSE -1 END AS dev_ppm
          FROM fin ORDER BY source"""
      })

    Seq(q154, q155, q156, q161, q177, q188, q190)
  }
}
