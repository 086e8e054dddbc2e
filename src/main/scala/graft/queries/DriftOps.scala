package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.{Sketches, TextFunctions}

/** Corpus drift / robust-statistics operators (SURVEY §2.11a,
  * L101–L103, L118):
  *
  *  - L101 binned two-sample KS drift statistic → q169
  *  - L102 integer-log PSI drift                → q170
  *  - L103 median/MAD robust outlier filter     → q171
  *  - L118 binned Wasserstein-1 (EMD) drift     → q186
  *
  * The monitoring layer of a continuously-rebuilt corpus: detect when
  * today's snapshot's feature distributions have drifted from the
  * reference build (KS = worst ECDF gap, PSI = log-weighted per-bin
  * divergence, W1 = total displaced mass × distance — the three
  * standard drift reads over ONE shared histogram), and robustly
  * trim feature outliers without assuming normality (median/MAD
  * instead of mean/stddev — one giant document can't move the fence).
  *
  * Both snapshot halves here are the doc_id-parity split of one corpus
  * (the deterministic stand-in for "yesterday vs today"); at
  * production the two sides are two snapshot directories and every
  * aggregate below is unchanged.
  */
object DriftOps {

  /** L101 dials: 32 ECDF bins of 32 chars (shared with the streaming
    * form, [[graft.streaming.StreamingDrift]]).
    */
  private[graft] val KsBins = 32
  private[graft] val KsBinChars = 32L

  /** L102 dials: 16 token-count bins of width 16, Laplace-smoothed
    * proportions in ppm (shared with the streaming readout,
    * [[graft.streaming.StreamingDrift.psiReport]]).
    */
  private[graft] val PsiBins = 16
  private[graft] val PsiBinToks = 16L

  /** L103 fence: |x − median| ≤ max(3·MAD, 1). */
  private[queries] val MadK = 3L

  def all: Seq[GraftQuery] = {

    /* L101: two-sample KS drift — the distribution-change alarm between
     * a reference and a current snapshot, computed on a BINNED ECDF
     * (32 fixed bins) instead of the classic sorted-sample form: the
     * binned statistic needs one map-side-combined histogram per side
     * (32·|sources| rows total) and a 32-row cumulative window — no
     * global sort at any scale — and lower-bounds the exact KS (equal
     * at bin edges). Both cumulative fractions ride exact integer ppm
     * (cum·10^6 div n). The report: per source, both sample sizes, the
     * max ECDF gap in ppm and the first bin attaining it. */
    val q169 = GraftQuery(
      "q169_ks_drift", "L101 L30",
      (s, d) => {
        val b = Tables.documents(s, d).select(col("source"),
          (col("doc_id") % 2).as("half"),
          least(expr(s"n_chars div $KsBinChars"), lit(KsBins - 1L)).as("bin"))
        val h = b.groupBy(col("source"), col("bin"))
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("cr"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("cc"))
        val w = Window.partitionBy(col("source")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val t = h.withColumn("cum_r", sum(col("cr")).over(w))
          .withColumn("cum_c", sum(col("cc")).over(w))
        val tot = h.groupBy(col("source"))
          .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
        val gaps = t.join(tot, Seq("source"))
          // empty-side guard: a source whose docs all share one parity has
          // n=0 on one side; its ECDF is identically 0 (cum is 0 there
          // too), so a max(n,1) denominator is exact, not an approximation
          .withColumn("gap_ppm", abs(
            expr("cum_r * 1000000 div greatest(n_ref, 1) " +
              "- cum_c * 1000000 div greatest(n_cur, 1)")))
        val ks = gaps.groupBy(col("source"))
          .agg(max(col("gap_ppm")).as("ks_ppm"))
        gaps.join(ks, Seq("source"))
          .filter(col("gap_ppm") === col("ks_ppm"))
          .groupBy(col("source"))
          .agg(min(col("n_ref")).as("n_ref"), min(col("n_cur")).as("n_cur"),
            min(col("ks_ppm")).as("ks_ppm"), min(col("bin")).as("ks_bin"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH b AS (SELECT source, doc_id % 2 AS half,
              LEAST(n_chars // $KsBinChars, ${KsBins - 1}) AS bin
            FROM documents),
          h AS (SELECT source, bin,
              CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS cr,
              CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS cc
            FROM b GROUP BY 1, 2),
          t AS (SELECT *,
              CAST(SUM(cr) OVER (PARTITION BY source ORDER BY bin
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_r,
              CAST(SUM(cc) OVER (PARTITION BY source ORDER BY bin
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c
            FROM h),
          tot AS (SELECT source, CAST(SUM(cr) AS BIGINT) AS n_ref,
              CAST(SUM(cc) AS BIGINT) AS n_cur FROM h GROUP BY 1),
          g AS (SELECT t.source, t.bin, tot.n_ref, tot.n_cur,
              abs(t.cum_r * 1000000 // GREATEST(tot.n_ref, 1)
                - t.cum_c * 1000000 // GREATEST(tot.n_cur, 1)) AS gap_ppm
            FROM t JOIN tot ON tot.source = t.source),
          ks AS (SELECT source, CAST(MAX(gap_ppm) AS BIGINT) AS ks_ppm
            FROM g GROUP BY 1)
          SELECT g.source, MIN(g.n_ref) AS n_ref, MIN(g.n_cur) AS n_cur,
            CAST(MIN(ks.ks_ppm) AS BIGINT) AS ks_ppm,
            CAST(MIN(g.bin) AS BIGINT) AS ks_bin
          FROM g JOIN ks ON ks.source = g.source AND g.gap_ppm = ks.ks_ppm
          GROUP BY 1 ORDER BY g.source"""
      })

    /* L102: PSI drift on the integer-log ladder — the per-bin
     * population-stability index monitoring teams track per feature,
     * here over the L9 BPE-ish token count in 16 bins:
     * psi_bin = (p_ppm − q_ppm) · (ilog2(p_ppm) − ilog2(q_ppm)), both
     * proportions Laplace-smoothed ((c+1)·10^6 div (n+bins) ≥ 1, so
     * the ladder is always defined) — ln replaced by floor(log2) (the
     * L63 convention), preserving PSI's sign structure (both factors
     * move together) while staying libm-free and engine-exact. The
     * histogram is DENSIFIED to all 16 bins before scoring: with
     * Laplace smoothing an absent bin's term is NOT zero whenever
     * nr ≠ nc (p = 10^6 div (nr+16) vs q = 10^6 div (nc+16) differ,
     * and can even straddle an ilog2 step), so observed-bins-only
     * would undercount the defined 16-bin PSI (ADVICE r15); the dense
     * frame is 16·|sources| rows — free. n_bins_hit still reports the
     * OBSERVED bin count. At 100 TB: one map-side-combined
     * 16·|sources|-row histogram, pure column math after. */
    val q170 = GraftQuery(
      "q170_psi_drift", "L102 L63 L9",
      (s, d) => {
        val b = Tables.documents(s, d).select(col("source"),
          (col("doc_id") % 2).as("half"),
          TextFunctions.tokenCountBpeIsh(col("text")).cast("long").as("toks"))
          .select(col("source"), col("half"),
            least(expr(s"toks div $PsiBinToks"), lit(PsiBins - 1L)).as("bin"))
        val h = b.groupBy(col("source"), col("bin"))
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("cr"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("cc"))
        val tot = h.groupBy(col("source"))
          .agg(sum(col("cr")).as("nr"), sum(col("cc")).as("nc"))
        val dense = h.select(col("source")).distinct()
          .select(col("source"),
            explode(sequence(lit(0L), lit(PsiBins - 1L))).as("bin"))
          .join(h, Seq("source", "bin"), "left")
          .select(col("source"),
            coalesce(col("cr"), lit(0L)).as("cr"),
            coalesce(col("cc"), lit(0L)).as("cc"))
        dense.join(tot, Seq("source"))
          .withColumn("p_ppm", expr(s"(cr + 1) * 1000000 div (nr + $PsiBins)"))
          .withColumn("q_ppm", expr(s"(cc + 1) * 1000000 div (nc + $PsiBins)"))
          .withColumn("term", (col("p_ppm") - col("q_ppm")) *
            (Sketches.ilog2(col("p_ppm")) - Sketches.ilog2(col("q_ppm"))))
          .groupBy(col("source"))
          .agg(min(col("nr")).as("n_ref"), min(col("nc")).as("n_cur"),
            sum(col("term")).as("psi_sum"),
            sum(when(col("cr") + col("cc") > 0, 1L).otherwise(0L))
              .as("n_bins_hit"))
          .orderBy(col("source"))
      },
      Some {
        val toks = TextFunctions.tokenCountBpeIshSql("text")
        val lp = Sketches.ilog2Sql("p_ppm")
        val lq = Sketches.ilog2Sql("q_ppm")
        s"""WITH b AS (SELECT source, doc_id % 2 AS half,
              LEAST(CAST($toks AS BIGINT) // $PsiBinToks, ${PsiBins - 1})
                AS bin
            FROM documents),
          h AS (SELECT source, bin,
              CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS cr,
              CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS cc
            FROM b GROUP BY 1, 2),
          tot AS (SELECT source, CAST(SUM(cr) AS BIGINT) AS nr,
              CAST(SUM(cc) AS BIGINT) AS nc FROM h GROUP BY 1),
          dense AS (SELECT s.source, r.range AS bin,
              COALESCE(h.cr, 0) AS cr, COALESCE(h.cc, 0) AS cc
            FROM (SELECT DISTINCT source FROM h) s
            CROSS JOIN range($PsiBins) r
            LEFT JOIN h ON h.source = s.source AND h.bin = r.range),
          p AS (SELECT dense.source, dense.cr, dense.cc,
              (dense.cr + 1) * 1000000 // (tot.nr + $PsiBins) AS p_ppm,
              (dense.cc + 1) * 1000000 // (tot.nc + $PsiBins) AS q_ppm,
              tot.nr, tot.nc
            FROM dense JOIN tot ON tot.source = dense.source)
          SELECT source, MIN(nr) AS n_ref, MIN(nc) AS n_cur,
            CAST(SUM((p_ppm - q_ppm) * ($lp - $lq)) AS BIGINT) AS psi_sum,
            CAST(SUM(CASE WHEN cr + cc > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_bins_hit
          FROM p GROUP BY 1 ORDER BY source"""
      })

    /* L103: median/MAD robust outlier fence — trim feature outliers
     * (here n_chars) per source with order statistics instead of
     * mean/stddev, so a single pathological document cannot drag the
     * fence toward itself. Median and MAD are DISCRETE order statistics
     * (the element at rank (n+1) div 2 under (value, doc_id) order —
     * engine-portable with no interpolation convention), fence =
     * max(3·MAD, 1) so a zero-MAD stratum still keeps its median
     * ties. Reports the fence and what it dropped (count + id
     * checksum). The rank windows partition by source; the 100 TB path
     * is REGISTERED as q225 (L157 — both medians from per-source L59
     * sketches, fence applied map-side, spec-pinned equal to this
     * query at the gated fixtures); this gated form is the sketch's
     * exact oracle. */
    val q171 = GraftQuery(
      "q171_mad_outliers", "L103 L59 L30",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          col("source"), col("n_chars"))
        val cnt = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
        val med = docs
          .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("n_chars"), col("doc_id"))))
          .join(cnt, Seq("source"))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("source"), col("n_chars").as("med"))
        val dev = docs.join(med, Seq("source"))
          .withColumn("dev", abs(col("n_chars") - col("med")))
        val mad = dev
          .withColumn("rn", row_number().over(Window.partitionBy(col("source"))
            .orderBy(col("dev"), col("doc_id"))))
          .join(cnt, Seq("source"))
          .filter(col("rn") === expr("(n + 1) div 2"))
          .select(col("source"), col("dev").as("mad"))
        dev.join(mad, Seq("source"))
          .withColumn("fence", greatest(lit(MadK) * col("mad"), lit(1L)))
          .withColumn("keep", col("dev") <= col("fence"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("med")).as("med"), min(col("mad")).as("mad"),
            min(col("fence")).as("fence"),
            sum(when(col("keep"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(!col("keep"), 1L).otherwise(0L)).as("n_dropped"),
            sum(when(!col("keep"),
              Sketches.h64(col("doc_id").cast("string")) % lit(1000003L))
              .otherwise(0L)).as("dropped_checksum"))
          .orderBy(col("source"))
      },
      Some {
        val h = Sketches.h64Sql("CAST(doc_id AS VARCHAR)")
        s"""WITH cnt AS (SELECT source, COUNT(*) AS n
              FROM documents GROUP BY 1),
          r1 AS (SELECT doc_id, source, n_chars, row_number() OVER
              (PARTITION BY source ORDER BY n_chars, doc_id) AS rn
            FROM documents),
          med AS (SELECT r1.source, r1.n_chars AS med
            FROM r1 JOIN cnt ON cnt.source = r1.source
            WHERE r1.rn = (cnt.n + 1) // 2),
          dv AS (SELECT d.doc_id, d.source, d.n_chars,
              abs(d.n_chars - med.med) AS dev, med.med
            FROM documents d JOIN med ON med.source = d.source),
          r2 AS (SELECT *, row_number() OVER
              (PARTITION BY source ORDER BY dev, doc_id) AS rn FROM dv),
          mad AS (SELECT r2.source, r2.dev AS mad
            FROM r2 JOIN cnt ON cnt.source = r2.source
            WHERE r2.rn = (cnt.n + 1) // 2),
          f AS (SELECT dv.*, mad.mad,
              GREATEST($MadK * mad.mad, 1) AS fence
            FROM dv JOIN mad ON mad.source = dv.source)
          SELECT source, COUNT(*) AS n_docs,
            CAST(MIN(med) AS BIGINT) AS med,
            CAST(MIN(mad) AS BIGINT) AS mad,
            CAST(MIN(fence) AS BIGINT) AS fence,
            CAST(SUM(CASE WHEN dev <= fence THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(SUM(CASE WHEN dev > fence THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dropped,
            CAST(SUM(CASE WHEN dev > fence THEN $h % 1000003 ELSE 0 END)
              AS BIGINT) AS dropped_checksum
          FROM f GROUP BY 1 ORDER BY source"""
      })

    /* L118: binned Wasserstein-1 (earth-mover) drift — the third leg
     * of the drift triple: KS (q169) reads the WORST ECDF gap, PSI
     * (q170) a log-weighted per-bin divergence, W1 the TOTAL displaced
     * probability mass × distance — the number mixture-matching
     * actually minimizes, and the only one of the three that scales
     * with HOW FAR mass moved, not just that it moved. On the shared
     * 32-bin histogram the identity is exact: W1 = Σ over bin
     * positions of |F_ref(b) − F_cur(b)| (unit bin width). Absent
     * bins carry the previous gap, so instead of densifying the
     * histogram the sum weights each OBSERVED bin's gap by its run
     * length to the next observed bin (lead(bin) − bin, last one
     * closing at KsBins) — identical values, no synthetic rows.
     * Report per source: both sizes, emd_ppm_bins (Σ gap·run, ppm ×
     * bin units) and w1_ppm (div KsBins — the mean ECDF gap, a
     * support-free [0, 10^6] number comparable across features).
     * At 100 TB: the same one map-side-combined histogram as q169;
     * the window and rollup run on 32·|sources| rows. */
    val q186 = GraftQuery(
      "q186_emd_drift", "L118 L101 L30",
      (s, d) => {
        val b = Tables.documents(s, d).select(col("source"),
          (col("doc_id") % 2).as("half"),
          least(expr(s"n_chars div $KsBinChars"), lit(KsBins - 1L)).as("bin"))
        val h = b.groupBy(col("source"), col("bin"))
          .agg(sum(when(col("half") === 0, 1L).otherwise(0L)).as("cr"),
            sum(when(col("half") === 1, 1L).otherwise(0L)).as("cc"))
        val wcum = Window.partitionBy(col("source")).orderBy(col("bin"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wlead = Window.partitionBy(col("source")).orderBy(col("bin"))
        val tot = h.groupBy(col("source"))
          .agg(sum(col("cr")).as("n_ref"), sum(col("cc")).as("n_cur"))
        h.withColumn("cum_r", sum(col("cr")).over(wcum))
          .withColumn("cum_c", sum(col("cc")).over(wcum))
          .withColumn("run",
            lead(col("bin"), 1, KsBins).over(wlead) - col("bin"))
          .join(tot, Seq("source"))
          .withColumn("gap_ppm", abs(
            expr("cum_r * 1000000 div greatest(n_ref, 1) " +
              "- cum_c * 1000000 div greatest(n_cur, 1)")))
          .groupBy(col("source"))
          .agg(min(col("n_ref")).as("n_ref"), min(col("n_cur")).as("n_cur"),
            sum(col("gap_ppm") * col("run")).as("emd_ppm_bins"))
          .withColumn("w1_ppm", expr(s"emd_ppm_bins div $KsBins"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH b AS (SELECT source, doc_id % 2 AS half,
              LEAST(n_chars // $KsBinChars, ${KsBins - 1}) AS bin
            FROM documents),
          h AS (SELECT source, bin,
              CAST(SUM(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS cr,
              CAST(SUM(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS cc
            FROM b GROUP BY 1, 2),
          t AS (SELECT *,
              CAST(SUM(cr) OVER (PARTITION BY source ORDER BY bin
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_r,
              CAST(SUM(cc) OVER (PARTITION BY source ORDER BY bin
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
              CAST(LEAD(bin, 1, $KsBins) OVER (PARTITION BY source
                ORDER BY bin) - bin AS BIGINT) AS run
            FROM h),
          tot AS (SELECT source, CAST(SUM(cr) AS BIGINT) AS n_ref,
              CAST(SUM(cc) AS BIGINT) AS n_cur FROM h GROUP BY 1),
          g AS (SELECT t.source, tot.n_ref, tot.n_cur, t.run,
              abs(t.cum_r * 1000000 // GREATEST(tot.n_ref, 1)
                - t.cum_c * 1000000 // GREATEST(tot.n_cur, 1)) AS gap_ppm
            FROM t JOIN tot ON tot.source = t.source)
          SELECT source, MIN(n_ref) AS n_ref, MIN(n_cur) AS n_cur,
            CAST(SUM(gap_ppm * run) AS BIGINT) AS emd_ppm_bins,
            CAST(SUM(gap_ppm * run) AS BIGINT) // $KsBins AS w1_ppm
          FROM g GROUP BY 1 ORDER BY source"""
      })

    Seq(q169, q170, q171, q186)
  }
}
