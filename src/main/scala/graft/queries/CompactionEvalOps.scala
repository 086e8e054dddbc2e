package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Ledger-maintenance and retrieval-evaluation operators
  * (SURVEY §2.11a, L147–L149):
  *
  *  - L147 dedup-ledger compaction planner (LSM)  → q215
  *  - L148 MinHash containment calibration        → q216
  *  - L149 graded nDCG retrieval audit            → q217
  *
  * L147 prices the storage engine UNDER the pipeline: the L31/L64
  * dedup ledger at 100 TB is an LSM tree that must absorb every
  * ingest batch, and the compaction policy dial (size-tiered vs
  * leveled, fan-out F) trades write amplification against read
  * amplification — the planner derives both from the corpus's own
  * arrival series, before anyone provisions disks. L148 extends the
  * L38/L137 price-the-sketch family to the ASYMMETRIC statistic:
  * containment of the smaller document in the larger — what
  * sub/superstring relations (L55) look like to a MinHash signature;
  * resemblance alone under-reports exactly those pairs. L149 extends
  * the L109/L110 eval family with the graded metric rankers actually
  * report: nDCG — MRR sees only the exact top-1, nDCG credits the
  * whole graded prefix with log-position discounts.
  *
  * Determinism: the planner is pure ilog2 arithmetic on arrival
  * counts, containment rides the ppm ladder over the q103/q205
  * candidate kernel, and the nDCG discount is the log2q10 ladder —
  * the ideal-DCG normalizer is a compile-time constant both engines
  * share.
  */
object CompactionEvalOps {

  /** L147 fan-out dial points (ilog2(F) = 1, 2, 3). */
  private[queries] val Fanouts = Seq(2L, 4L, 8L)

  /** L149 grade depth: the exact top-3 earn grades 3/2/1; the ideal
    * DCG places them at ranks 1/2/3 — a constant of the grading
    * scheme: 3·2^20 div log2q10(2) + 2·2^20 div log2q10(3) +
    * 1·2^20 div log2q10(4) = 3072 + 1365 + 512.
    */
  private[queries] val NdcgGrades = 3L
  private[queries] val NdcgIdealQ20 = 4949L

  def all: Seq[GraftQuery] = {

    /* L147: dedup-ledger compaction planner — the ledger behind L31's
     * incremental dedup and L64's admission gate is an LSM tree at
     * production scale, and its compaction policy is a dial nobody
     * should set unpriced: size-tiered rewrites each entry once per
     * level (WA = levels, RA = levels·F sorted runs consulted);
     * leveled rewrites ~(F+1)/2 times per level (WA = levels·(F+1)/2,
     * doubled here to stay integral) but keeps one run per level
     * (RA = levels). Levels follow from the corpus's own arrival
     * series: batch = mean daily arrival mass (the flush unit),
     * levels = ilog2(batches) div ilog2(F) + 1. The planner emits the
     * classic tradeoff table per fan-out — the L123/L136 stance: a
     * governance TABLE pricing what the infra executes. At 100 TB:
     * one events scan into two scalars; planner math on |F| rows. */
    val q215 = GraftQuery(
      "q215_compaction_planner", "L147 L31 L64 L128",
      (s, d) => {
        val daily = Tables.events(s, d)
          .select(expr("ts div 86400000000000").as("day"))
          .agg(count(lit(1)).as("total"),
            count_distinct(col("day")).as("n_days"))
          .withColumn("batch", expr("greatest(total div n_days, 1)"))
          .withColumn("n_batches", expr("greatest(total div batch, 1)"))
        daily.select(col("total"), col("n_days"), col("batch"),
            col("n_batches"),
            explode(array(Fanouts.map(f =>
              lit(f).as("f")): _*)).as("fanout"))
          .withColumn("lf", Sketches.ilog2(col("fanout")))
          .withColumn("lgb", Sketches.ilog2(col("n_batches")))
          .withColumn("levels", expr("lgb div lf + 1"))
          .withColumn("wa_tiered", col("levels"))
          .withColumn("wa_leveled_x2", col("levels") * (col("fanout") + 1))
          .withColumn("ra_tiered", col("levels") * col("fanout"))
          .withColumn("ra_leveled", col("levels"))
          .withColumn("rows_written_tiered", col("total") * col("levels"))
          .select(col("fanout"), col("total"), col("n_days"),
            col("batch"), col("n_batches"), col("levels"),
            col("wa_tiered"), col("wa_leveled_x2"), col("ra_tiered"),
            col("ra_leveled"), col("rows_written_tiered"))
          .orderBy(col("fanout"))
      },
      Some {
        val lgB = Sketches.ilog2Sql("n_batches")
        val grid = Fanouts.map(f =>
          s"SELECT CAST($f AS BIGINT) AS fanout").mkString(" UNION ALL ")
        s"""WITH ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS total,
              CAST(COUNT(DISTINCT epoch_us(ts) // 86400000000)
                AS BIGINT) AS n_days
            FROM events),
          ba AS (SELECT total, n_days,
              GREATEST(total // n_days, 1) AS batch FROM ag),
          bb AS (SELECT *, GREATEST(total // batch, 1) AS n_batches
            FROM ba),
          fg AS ($grid),
          pl AS (SELECT bb.*, fg.fanout,
              CAST((length(format('{:b}', GREATEST(fg.fanout, 1))) - 1)
                AS BIGINT) AS lf
            FROM bb CROSS JOIN fg),
          lv AS (SELECT *, ($lgB // lf) + 1 AS levels FROM pl)
          SELECT fanout, total, n_days, batch, n_batches, levels,
            levels AS wa_tiered,
            levels * (fanout + 1) AS wa_leveled_x2,
            levels * fanout AS ra_tiered,
            levels AS ra_leveled,
            total * levels AS rows_written_tiered
          FROM lv ORDER BY fanout"""
      })

    /* L148: MinHash containment calibration — resemblance is the
     * SYMMETRIC overlap statistic; when one document contains another
     * (the L55 chunk-containment relation), Jaccard under-reports
     * exactly by the size skew, and the containment estimator
     * recovers it from the signature estimate plus the two exact set
     * sizes (which the index stores anyway):
     * Ĉ = Ĵ·(|A|+|B|) / ((1+Ĵ)·min(|A|,|B|)), clamped to 1. For every
     * LSH candidate pair the report buckets by EXACT containment
     * decile and lays the estimate next to the truth — the measured
     * evidence for whether signature-level containment screening can
     * replace the exact L55 join at scale (the L38/L137 stance on the
     * asymmetric statistic). At 100 TB: candidate pairs only; ≤10
     * output rows. */
    val q216 = GraftQuery(
      "q216_containment_calibration", "L148 L55 L38 L3",
      (s, d) => {
        val ex = LlmPipeline.shingleRows(s, d)
        val sig = LlmPipeline.signaturesOf(ex)
        val cand = LlmPipeline.lshCandidates(
          LlmPipeline.lshBands(sig, "cont_hot_buckets"))
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
        cand
          .join(inter, Seq("a", "b"), "left")
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .join(sigA, "a").join(sigB, "b")
          .withColumn("n_match", (0 until Sketches.NumHashes)
            .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
            .reduce(_ + _))
          .withColumn("j_est_ppm", expr("(n_match * 1000000) div 16"))
          .withColumn("m", least(col("sza"), col("szb")))
          .withColumn("est_c_ppm", expr(
            "least((j_est_ppm * (sza + szb) * 1000000) div " +
              "greatest((1000000 + j_est_ppm) * m, 1), 1000000)"))
          .withColumn("exact_c_ppm",
            expr("(coalesce(inter, 0) * 1000000) div greatest(m, 1)"))
          .withColumn("bucket", least(expr("exact_c_ppm div 100000"),
            lit(9L)))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n_pairs"),
            expr("sum(est_c_ppm) div count(1)").as("mean_est_c_ppm"),
            expr("sum(exact_c_ppm) div count(1)").as("mean_exact_c_ppm"),
            max(col("est_c_ppm")).as("max_est_c_ppm"))
          .orderBy(col("bucket"))
      },
      Some {
        val matchTerms = (0 until Sketches.NumHashes)
          .map(i => s"(CASE WHEN ga.s$i = gb.s$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH ${LlmPipeline.sigCtesSql},
          ${LlmPipeline.bandCandCtesSql},
          pa AS (SELECT c.a, c.b,
              CAST(len(list_intersect(sa.sh, sb.sh)) AS BIGINT)
                AS inter,
              CAST(len(sa.sh) AS BIGINT) AS sza,
              CAST(len(sb.sh) AS BIGINT) AS szb,
              CAST(($matchTerms) AS BIGINT) * 1000000 // 16
                AS j_est_ppm
            FROM cand c
              JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
              JOIN sig ga ON ga.doc_id = c.a JOIN sig gb ON gb.doc_id = c.b),
          cc AS (SELECT *,
              LEAST(sza, szb) AS m,
              LEAST((j_est_ppm * (sza + szb) * 1000000)
                // GREATEST((1000000 + j_est_ppm) * LEAST(sza, szb), 1),
                1000000) AS est_c_ppm,
              (inter * 1000000) // GREATEST(LEAST(sza, szb), 1)
                AS exact_c_ppm
            FROM pa)
          SELECT LEAST(exact_c_ppm // 100000, 9) AS bucket,
            COUNT(*) AS n_pairs,
            CAST(SUM(est_c_ppm) AS BIGINT) // COUNT(*)
              AS mean_est_c_ppm,
            CAST(SUM(exact_c_ppm) AS BIGINT) // COUNT(*)
              AS mean_exact_c_ppm,
            CAST(MAX(est_c_ppm) AS BIGINT) AS max_est_c_ppm
          FROM cc GROUP BY 1 ORDER BY bucket"""
      })

    /* L149: graded nDCG retrieval audit — the eval family's third
     * read: q177 scores a CLASSIFIER's ranking (AUC), q178 scores the
     * IVF list by the exact top-1 alone (MRR/hit); nDCG credits the
     * whole graded prefix the way rankers are actually reported. The
     * exact brute-force top-3 earn grades 3/2/1 (the registered L6
     * kernel is the truth); each IVF position i ∈ 1..5 earns
     * grade·2^20 div log2q10(i+1) — the log-position discount on the
     * shared mantissa-linear ladder — and the ideal DCG is the
     * grading scheme's own constant (grades at ranks 1/2/3 =
     * 3072 + 1365 + 512 = 4949), so ndcg_ppm = dcg·10^6 div 4949 is
     * engine-exact with NO per-query normalizer pass. Per query:
     * dcg_q20, ndcg_ppm, graded hits; suite mean broadcast (the q178
     * summary stance). At 100 TB: both ranked lists are the
     * registered kernels' own candidate-bounded frames; the join is
     * (q_id, vec_id)-keyed on ≤ 8·|queries| rows. */
    val q217 = GraftQuery(
      "q217_ndcg_retrieval_audit", "L149 L110 L109 L6 L11",
      (s, d) => {
        val truth = LlmPipeline.bruteTopK(s, d)
          .filter(col("rank") <= NdcgGrades)
          .select(col("q_id"), col("vec_id"),
            (lit(NdcgGrades + 1) - col("rank")).as("grade"))
        val ivf = LlmPipeline.ivfTopK(s, d)
          .select(col("q_id"), col("vec_id"), col("rank"))
        val per = ivf.join(truth, Seq("q_id", "vec_id"), "left")
          .withColumn("grade", coalesce(col("grade"), lit(0L)))
          .withColumn("disc", Sketches.log2q10(col("rank") + 1))
          .withColumn("gain_q20",
            expr("(grade * 1048576) div disc"))
          .groupBy(col("q_id"))
          .agg(sum(col("gain_q20")).as("dcg_q20"),
            sum(when(col("grade") > 0, 1L).otherwise(0L))
              .as("n_graded_hits"))
          .withColumn("ndcg_ppm",
            expr(s"(dcg_q20 * 1000000) div $NdcgIdealQ20"))
        val sm = per.agg(count(lit(1)).as("n_queries"),
          expr("sum(ndcg_ppm) div count(1)").as("mean_ndcg_ppm"))
        per.crossJoin(broadcast(sm))
          .select(col("q_id"), col("dcg_q20"), col("n_graded_hits"),
            col("ndcg_ppm"), col("n_queries"), col("mean_ndcg_ppm"))
          .orderBy(col("q_id"))
      },
      Some {
        val disc = Sketches.log2q10Sql("ivr.rank + 1")
        s"""WITH ${LlmPipeline.bruteRankedCtesSql("br")},
          ${LlmPipeline.ivfRankedCtesSql("ivr")},
          tr AS (SELECT q_id, vec_id,
              ${NdcgGrades + 1} - rank AS grade
            FROM br WHERE rank <= $NdcgGrades),
          pg AS (SELECT ivr.q_id,
              COALESCE(tr.grade, 0) AS grade,
              (COALESCE(tr.grade, 0) * 1048576) // ($disc) AS gain_q20
            FROM ivr LEFT JOIN tr
              ON tr.q_id = ivr.q_id AND tr.vec_id = ivr.vec_id
            WHERE ivr.rank <= ${LlmPipeline.TopK}),
          per AS (SELECT q_id,
              CAST(SUM(gain_q20) AS BIGINT) AS dcg_q20,
              CAST(SUM(CASE WHEN grade > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_graded_hits
            FROM pg GROUP BY 1),
          pn AS (SELECT *, (dcg_q20 * 1000000) // $NdcgIdealQ20
              AS ndcg_ppm FROM per),
          sm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
              CAST(SUM(ndcg_ppm) AS BIGINT) // COUNT(*)
                AS mean_ndcg_ppm FROM pn)
          SELECT pn.q_id, pn.dcg_q20, pn.n_graded_hits, pn.ndcg_ppm,
            sm.n_queries, sm.mean_ndcg_ppm
          FROM pn CROSS JOIN sm ORDER BY q_id"""
      })

    Seq(q215, q216, q217)
  }
}
