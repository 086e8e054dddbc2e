package graft.queries

import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Sketch-swap closure operators (SURVEY §2.11a, L156–L160):
  *
  *  - L156 sketched curriculum stage cuts      → q224
  *  - L157 sketched median/MAD fence           → q225
  *  - L158 sketched conformal threshold        → q226
  *  - L159 sketched embedding-norm median      → q227
  *  - L160 sketched Lorenz/Gini concentration  → q228
  *
  * Five exact-oracle operators (q167 curriculum ntile, q171 MAD
  * fences, q195 conformal τ, q219 norm medians, q200 Gini) documented
  * "at 100 TB the cut points come from the L59 quantile sketch" — this
  * tier WIRES that promise as code instead of scaladoc (VERDICT r16
  * #1). Each operator derives its order statistics from
  * `graft_bottomk` (q124's registered TypedImperativeAggregate — a
  * deterministic, merge-tree-independent bottom-k-by-hash sample the
  * DuckDB oracle reproduces bit-for-bit) over a COMBINED sort key
  * value·2^20 + id, which linearizes the engine-wide (value, id) total
  * order into one integer so a rank in key space IS the exact-form
  * rank — ties included, which a value-only sketch cannot split. The
  * remaining work (assignment, fences, flag folds, Lorenz sums) is the
  * same map-side arithmetic as the exact forms, against the ≤ k-entry
  * broadcast sample.
  *
  * EXACTNESS PREDICATE (spec-pinned): whenever k ≥ the group's row
  * count the sample IS the full key multiset, every derived rank
  * statistic equals the exact window form, and SketchSwapSpec asserts
  * row-for-row equality with the exact queries at the gated fixtures
  * (all gated groups sit far under k = 8192). Beyond k the sample
  * rank r maps to sample index (r·sample_n) div n — the nearest-rank
  * estimate with standard error ≈ sqrt(p(1−p)/k) in rank space, which
  * reduces to r exactly when sample_n = n (the formula, not a branch,
  * carries the exactness). Production therefore dials k DOWN for
  * memory, never a different code path.
  *
  * Key-domain bounds (all enforced by construction at the gated
  * fixtures and spec-checked): ids < 2^20 ([[IdBits]]); values are
  * non-negative µ-unit/char/token integers except q226's signed NB
  * score, which rides a +2^30 bias so the combined key stays
  * non-negative and truncating division (Spark `div`) agrees with
  * DuckDB `//` (floor) — the engines diverge on negative division, so
  * NO sketched key is ever negative. Products stay under 2^52.
  *
  * At 100 TB: one hash aggregate with map-side partial merge per
  * sketch (≤ 2k pairs in flight per group), a kilobyte broadcast of
  * the cut points / fences / taus, and the exact forms' own map-side
  * folds. No global sort, no per-group rank window over the corpus.
  */
object SketchSwapOps {

  /** Bottom-k capacity: covers every gated group (max 5000 keys at
    * sf0.1) with exact equality; the production memory/accuracy dial.
    */
  private[queries] val SwapK = 8192

  /** Combined-key id width: doc_id/vec_id < 2^20 at every gated SF
    * (max 4999); production widens to the next power of two above the
    * id domain (the L98 Feistel stance — only the constant changes).
    */
  private[queries] val IdBits = 20
  private[queries] val IdDomain = 1L << IdBits // 1048576

  /** q226 score bias: NB scores are signed; +2^30 keeps combined keys
    * non-negative so truncating and floor division agree.
    */
  private[queries] val ScoreBias = 1L << 30

  /** Sample index for exact-form rank `r` over group size `n`:
    * greatest(1, (r·sample_n) div n) — equals r when sample_n = n.
    * Columns `sample`, `sample_n`, and the named rank/size must be in
    * scope; emitted as SQL text so both engines share one rendering.
    */
  private def idxExpr(r: String, n: String): String =
    s"element_at(sample, cast(greatest(1, (($r) * sample_n) div ($n)) as int))"
  private def idxSql(r: String, n: String): String =
    s"sample[GREATEST(1, ((($r) * len(sample)) // ($n)))]"

  /** DuckDB bottom-k sample CTE chain over `src(grp, key)` (grp may be
    * a constant for global sketches): ends in `sm<sfx>(grp, sample)`
    * with the sample sorted ascending — the exact multiset
    * `graft_bottomk` returns, reproduced via the same salted md5 hash
    * order. `sfx` disambiguates when one oracle chains two sketches.
    */
  private def sampleCtesSql(salt: String, srcCte: String,
      sfx: String = ""): String = {
    val h = s"CAST(('0x' || substr(md5('bk:$salt:' || " +
      "CAST(key AS VARCHAR)), 1, 15)) AS BIGINT)"
    s"""hk$sfx AS (SELECT grp, key, $h AS h FROM $srcCte),
      rk_bk$sfx AS (SELECT grp, key, row_number() OVER (PARTITION BY grp
          ORDER BY h, key) AS rn_bk
        FROM hk$sfx),
      sm$sfx AS (SELECT grp, list(key ORDER BY key) AS sample
        FROM rk_bk$sfx WHERE rn_bk <= $SwapK GROUP BY 1)"""
  }

  def all: Seq[GraftQuery] = {

    /* L156: sketched curriculum stage cuts — q167's 4-stage table
     * computed WITHOUT the global ntile sort: one graft_bottomk over
     * the combined (q_u, doc_id) key yields the 3 ntile boundary keys
     * (cum_t = t·(n div 4) + min(t, n mod 4), the exact ntile tile
     * sizes), and stage assignment is a map-side comparison of each
     * doc's key against the 3 broadcast cut points — stage =
     * 1 + Σ [key > cut_t], which reproduces ntile exactly because
     * combined keys are DISTINCT (ties split by doc_id inside the
     * key). Output schema and values are q167's own per-stage table
     * (SketchSwapSpec pins the equality); the only plan difference is
     * the one the 100 TB user needs: a mergeable aggregate replaces
     * the single-partition global sort. */
    val q224 = GraftQuery(
      "q224_curriculum_stages_sketched", "L156 L99 L59 L9",
      (s, d) => {
        val base = CurriculumOps.stageBase(s, d)
          .withColumn("key", col("q_u") * lit(IdDomain) + col("doc_id"))
        val nStages = CurriculumOps.CurriculumStages.toLong
        val cuts = base.agg(count(lit(1)).as("n"),
            call_function("graft_bottomk", col("key"), lit(SwapK),
              lit("q224")).as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
        val cutCols = (1L until nStages).map { t =>
          val cum = s"($t * (n div $nStages) + least($t, n % $nStages))"
          expr(idxExpr(cum, "n")).as(s"c$t")
        }
        val cutRow = cuts.select(cutCols: _*)
        val assigned = base.crossJoin(broadcast(cutRow))
          .withColumn("stage", (1L until nStages)
            .map(t => when(col("key") > col(s"c$t"), 1L).otherwise(0L))
            .foldLeft(lit(1L))(_ + _))
        assigned.groupBy(col("stage"))
          .agg(count(lit(1)).as("n_docs"),
            min(col("q_u")).as("q_min"),
            max(col("q_u")).as("q_max"),
            sum(col("toks")).as("token_budget"),
            sum(Sketches.h64(concat(col("doc_id"), lit("@"), col("stage")))
              % lit(1000003L)).as("member_checksum"))
          .orderBy(col("stage"))
      },
      Some {
        val nStages = CurriculumOps.CurriculumStages.toLong
        val ck = Sketches.h64Sql("doc_id || '@' || stage")
        val cutSels = (1L until nStages).map { t =>
          val cum = s"($t * (n // $nStages) + LEAST($t, n % $nStages))"
          s"${idxSql(cum, "n")} AS c$t"
        }.mkString(", ")
        val stageSum = (1L until nStages)
          .map(t => s"(CASE WHEN key > c$t THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH ${CurriculumOps.stageBaseCtesSql},
          ky AS (SELECT 0 AS grp, doc_id, q_u, toks,
              q_u * $IdDomain + doc_id AS key
            FROM sq),
          nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ky),
          ${sampleCtesSql("q224", "ky")},
          ct AS (SELECT $cutSels FROM sm, nn),
          st AS (SELECT ky.doc_id, ky.q_u, ky.toks,
              CAST(1 + $stageSum AS BIGINT) AS stage
            FROM ky CROSS JOIN ct)
          SELECT stage, COUNT(*) AS n_docs,
            CAST(MIN(q_u) AS BIGINT) AS q_min,
            CAST(MAX(q_u) AS BIGINT) AS q_max,
            CAST(SUM(toks) AS BIGINT) AS token_budget,
            CAST(SUM($ck % 1000003) AS BIGINT) AS member_checksum
          FROM st GROUP BY 1 ORDER BY stage"""
      })

    /* L157: sketched median/MAD fence — q171's robust outlier trim
     * with both order statistics (per-source median, then median of
     * absolute deviations) drawn from two per-source bottom-k sketches
     * instead of two corpus-wide rank windows. Pass 1 sketches the
     * (n_chars, doc_id) keys → broadcast medians; pass 2 sketches the
     * (dev, doc_id) keys of the deviation frame → broadcast MADs; the
     * fence (max(3·MAD, 1)) and drop accounting are q171's own
     * map-side fold. Same output, spec-pinned. At 100 TB: two
     * map-side-combined hash aggregates replace two windows whose
     * per-source partitions would each hold the source's full rows. */
    val q225 = GraftQuery(
      "q225_mad_outliers_sketched", "L157 L103 L59 L30",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"),
          col("source"), col("n_chars"))
        val med = docs
          .withColumn("key", col("n_chars") * lit(IdDomain) + col("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n"),
            call_function("graft_bottomk", col("key"), lit(SwapK),
              lit("q225m")).as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
          .withColumn("med",
            expr(idxExpr("(n + 1) div 2", "n") + s" div $IdDomain"))
          .select(col("source"), col("n"), col("med"))
        val dev = docs.join(broadcast(med), Seq("source"))
          .withColumn("dev", abs(col("n_chars") - col("med")))
        val mad = dev
          .withColumn("key", col("dev") * lit(IdDomain) + col("doc_id"))
          .groupBy(col("source"))
          .agg(min(col("n")).as("n"),
            call_function("graft_bottomk", col("key"), lit(SwapK),
              lit("q225d")).as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
          .withColumn("mad",
            expr(idxExpr("(n + 1) div 2", "n") + s" div $IdDomain"))
          .select(col("source"), col("mad"))
        dev.join(broadcast(mad), Seq("source"))
          .withColumn("fence",
            greatest(lit(DriftOps.MadK) * col("mad"), lit(1L)))
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
        val medSample = sampleCtesSql("q225m", "ky1", "1")
        val madSample = sampleCtesSql("q225d", "ky2", "2")
        s"""WITH cnt AS (SELECT source AS grp, CAST(COUNT(*) AS BIGINT)
              AS n FROM documents GROUP BY 1),
          ky1 AS (SELECT source AS grp, doc_id,
              n_chars * $IdDomain + doc_id AS key
            FROM documents),
          $medSample,
          md AS (SELECT sm1.grp,
              ${idxSql("(cnt.n + 1) // 2", "cnt.n")
                .replace("sample", "sm1.sample")} // $IdDomain AS med,
              cnt.n
            FROM sm1 JOIN cnt ON cnt.grp = sm1.grp),
          dv AS (SELECT d.doc_id, d.source, d.n_chars,
              abs(d.n_chars - md.med) AS dev, md.med, md.n
            FROM documents d JOIN md ON md.grp = d.source),
          ky2 AS (SELECT source AS grp, doc_id,
              dev * $IdDomain + doc_id AS key
            FROM dv),
          $madSample,
          mad AS (SELECT sm2.grp,
              ${idxSql("(cnt.n + 1) // 2", "cnt.n")
                .replace("sample", "sm2.sample")} // $IdDomain AS mad
            FROM sm2 JOIN cnt ON cnt.grp = sm2.grp),
          f AS (SELECT dv.*, mad.mad,
              GREATEST(${DriftOps.MadK} * mad.mad, 1) AS fence
            FROM dv JOIN mad ON mad.grp = dv.source)
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

    /* L158: sketched conformal threshold — q195's per-source τ (the
     * ⌈0.9·(n+1)⌉-th smallest clean calibration score) drawn from a
     * per-source bottom-k sketch of the biased (score, doc_id) keys
     * instead of the calibration rank window. Sources whose
     * calibration half is smaller than the order statistic stay
     * τ-less exactly as in q195 (the rank simply exceeds n_cal —
     * NULL, nothing flags, has_tau = 0); the coverage/power fold over
     * the test half is q195's own. Same output, spec-pinned. At
     * 100 TB: the L86 passes + one hash aggregate; the broadcast τ
     * table is |sources| rows either way. */
    val q226 = GraftQuery(
      "q226_conformal_threshold_sketched", "L158 L127 L59 L86",
      (s, d) => {
        val cn = CorpusAnalysisOps.ConfNum
        val cd = CorpusAnalysisOps.ConfDen
        val sc = TrainedFilterOps.nbDocScores(s, d)
        val sk = sc.filter(col("doc_id") % 2 === 0 && col("pos") === 0)
          .withColumn("key",
            (col("score") + lit(ScoreBias)) * lit(IdDomain) + col("doc_id"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_cal"),
            call_function("graft_bottomk", col("key"), lit(SwapK),
              lit("q226")).as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
          .withColumn("r", expr(s"($cn * (n_cal + 1) + $cd - 1) div $cd"))
          .withColumn("tau", when(col("r") <= col("n_cal"),
            expr(idxExpr("r", "n_cal") + s" div $IdDomain") - ScoreBias))
        val n = sk.select(col("source"), col("n_cal"))
        val tau = sk.filter(col("tau").isNotNull)
          .select(col("source"), col("tau"))
        val test = sc.filter(col("doc_id") % 2 === 1)
        test.join(n, Seq("source"), "left")
          .join(tau, Seq("source"), "left")
          .groupBy(col("source"))
          .agg(coalesce(min(col("n_cal")), lit(0L)).as("n_cal"),
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
        val cn = CorpusAnalysisOps.ConfNum
        val cd = CorpusAnalysisOps.ConfDen
        s"""WITH ${TrainedFilterOps.nbScoreCtesSql},
          cal AS (SELECT source, doc_id, score FROM sc
            WHERE doc_id % 2 = 0 AND pos = 0),
          ky AS (SELECT source AS grp, doc_id,
              (score + $ScoreBias) * $IdDomain + doc_id AS key
            FROM cal),
          nn AS (SELECT source AS grp, CAST(COUNT(*) AS BIGINT) AS n_cal
            FROM cal GROUP BY 1),
          ${sampleCtesSql("q226", "ky")},
          tu AS (SELECT nn.grp AS source, nn.n_cal,
              CASE WHEN ($cn * (n_cal + 1) + $cd - 1) // $cd <= n_cal
                THEN ${idxSql(s"($cn * (n_cal + 1) + $cd - 1) // $cd",
                  "n_cal")} // $IdDomain - $ScoreBias
              END AS tau
            FROM nn JOIN sm ON sm.grp = nn.grp),
          n AS (SELECT source, n_cal FROM tu),
          tau AS (SELECT source, n_cal, tau FROM tu
            WHERE tau IS NOT NULL),
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

    /* L159: sketched embedding-norm median — q219's per-label health
     * profile with the median drawn from a per-label bottom-k sketch
     * of the (nu, vec_id) keys; the mean/range/outlier-fence fold is
     * q219's own map-side arithmetic against the broadcast medians.
     * Same output, spec-pinned. At 100 TB: the rank window over every
     * label's full vector population becomes one hash aggregate. */
    val q227 = GraftQuery(
      "q227_norm_health_sketched", "L159 L151 L59 L103",
      (s, d) => {
        val n = HealthAuditOps.normFrame(s, d)
        val med = n
          .withColumn("key", col("nu") * lit(IdDomain) + col("vec_id"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n"),
            call_function("graft_bottomk", col("key"), lit(SwapK),
              lit("q227")).as("sample"))
          .withColumn("sample_n", size(col("sample")).cast("long"))
          .withColumn("med_u",
            expr(idxExpr("(n + 1) div 2", "n") + s" div $IdDomain"))
          .select(col("label"), col("med_u"))
        n.join(broadcast(med), Seq("label"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            expr("sum(nu) div count(1)").as("mean_norm_u"),
            max(col("med_u")).as("median_norm_u"),
            min(col("nu")).as("min_norm_u"),
            max(col("nu")).as("max_norm_u"),
            sum(when(col("nu") > col("med_u") *
              HealthAuditOps.NormFenceNum ||
              col("nu") * HealthAuditOps.NormFenceNum < col("med_u"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("label"))
      },
      Some {
        val fence = HealthAuditOps.NormFenceNum
        s"""WITH ${HealthAuditOps.normFrameCtesSql},
          cnt AS (SELECT label AS grp, CAST(COUNT(*) AS BIGINT) AS n
            FROM nu GROUP BY 1),
          ky AS (SELECT label AS grp, vec_id,
              nu * $IdDomain + vec_id AS key
            FROM nu),
          ${sampleCtesSql("q227", "ky")},
          md AS (SELECT sm.grp AS label,
              ${idxSql("(cnt.n + 1) // 2", "cnt.n")} // $IdDomain
                AS med_u
            FROM sm JOIN cnt ON cnt.grp = sm.grp)
          SELECT nu.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
            CAST(SUM(nu.nu) AS BIGINT) // COUNT(*) AS mean_norm_u,
            CAST(MAX(md.med_u) AS BIGINT) AS median_norm_u,
            CAST(MIN(nu.nu) AS BIGINT) AS min_norm_u,
            CAST(MAX(nu.nu) AS BIGINT) AS max_norm_u,
            CAST(SUM(CASE WHEN nu.nu > md.med_u * $fence
              OR nu.nu * $fence < md.med_u THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers
          FROM nu JOIN md ON md.label = nu.label
          GROUP BY 1 ORDER BY nu.label"""
      })

    /* L160: sketched Lorenz/Gini concentration — q200's per-source
     * mass-concentration read computed on the bottom-k sample of the
     * (n_chars, doc_id) keys: the sample arrives SORTED, so its
     * position index IS the rank and the Lorenz sums (Σ rk·x, the
     * bottom-half and top-decile shares) fold over a posexplode of
     * the ≤ k-entry sample instead of a corpus-wide rank window.
     * Unlike the pure order-statistic swaps above, the Gini is a
     * whole-distribution functional — at k < n this is the classic
     * sample Gini (consistent, not unbiased); at the gated fixtures
     * k ≥ n makes it the exact statistic, spec-pinned against q200.
     * At 100 TB: one hash aggregate + |sources|·k exploded rows. */
    val q228 = GraftQuery(
      "q228_mass_concentration_sketched", "L160 L132 L59 L30",
      (s, d) => {
        val sk = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("key", col("n_chars") * lit(IdDomain) + col("doc_id"))
          .groupBy(col("source"))
          .agg(call_function("graft_bottomk", col("key"), lit(SwapK),
            lit("q228")).as("sample"))
        val ex = sk.select(col("source"),
            size(col("sample")).cast("long").as("n"),
            posexplode(col("sample")).as(Seq("pos", "key")))
          .select(col("source"), col("n"),
            (col("pos") + 1).cast("long").as("rk"),
            expr(s"key div $IdDomain").as("x"))
        ex.groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("x")).as("total_chars"),
            sum(col("rk") * col("x")).as("srx"),
            sum(when(col("rk") <= expr("n div 2"), col("x"))
              .otherwise(0L)).as("bh"),
            sum(when(col("rk") > expr("n - n div 10"), col("x"))
              .otherwise(0L)).as("td"))
          .withColumn("gini_ppm", expr(
            "((2 * srx - (n_docs + 1) * total_chars) * 1000000) div " +
              "greatest(n_docs * total_chars, 1)"))
          .withColumn("bottom_half_ppm",
            expr("(bh * 1000000) div greatest(total_chars, 1)"))
          .withColumn("top_decile_ppm",
            expr("(td * 1000000) div greatest(total_chars, 1)"))
          .select(col("source"), col("n_docs"), col("total_chars"),
            col("gini_ppm"), col("bottom_half_ppm"),
            col("top_decile_ppm"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH ky AS (SELECT source AS grp, doc_id,
              n_chars * $IdDomain + doc_id AS key
            FROM documents),
          ${sampleCtesSql("q228", "ky")},
          ex0 AS (SELECT grp AS source,
              CAST(len(sample) AS BIGINT) AS n,
              unnest(sample) AS key
            FROM sm),
          ex AS (SELECT source, n,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY key) AS BIGINT) AS rk,
              key // $IdDomain AS x
            FROM ex0),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(x) AS BIGINT) AS total_chars,
              CAST(SUM(rk * x) AS BIGINT) AS srx,
              CAST(SUM(CASE WHEN rk <= n // 2 THEN x ELSE 0 END)
                AS BIGINT) AS bh,
              CAST(SUM(CASE WHEN rk > n - n // 10 THEN x ELSE 0
                END) AS BIGINT) AS td
            FROM ex GROUP BY 1)
          SELECT source, n_docs, total_chars,
            ((2 * srx - (n_docs + 1) * total_chars) * 1000000)
              // GREATEST(n_docs * total_chars, 1) AS gini_ppm,
            (bh * 1000000) // GREATEST(total_chars, 1)
              AS bottom_half_ppm,
            (td * 1000000) // GREATEST(total_chars, 1)
              AS top_decile_ppm
          FROM ag ORDER BY source"""
      })

    Seq(q224, q225, q226, q227, q228)
  }
}
