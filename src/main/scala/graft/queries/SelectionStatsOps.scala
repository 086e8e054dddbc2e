package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Hashed-feature selection and corpus-statistics operators
  * (SURVEY §2.11a, L107/L113/L114):
  *
  *  - L107 DSIR hashed importance resampling    → q175
  *  - L113 Good–Turing unseen-mass / Chao1      → q181
  *  - L114 k-anonymity small-cell audit         → q182
  *
  * Three governance numbers a corpus build reads before training:
  * which docs a hashed density-ratio selector keeps (the DSIR move —
  * importance weights over a FIXED hashed feature space, so the
  * model is two count vectors, not a vocabulary), how much probability
  * mass the corpus has never seen (Good–Turing — "is more crawling
  * worth it"), and which metadata strata are so small they identify
  * their members (the k-anonymity gate run before releasing per-strata
  * statistics).
  */
object SelectionStatsOps {

  /** L107 hashed feature space: word bigrams → h64 mod 2^10 buckets.
    * Collisions FOLD features together by design (the hashing trick —
    * the feature space never grows with the corpus); 2^10 keeps the
    * fixture's ~10³ distinct bigrams spread while staying far under
    * the ppm ladder's resolution floor.
    */
  private[queries] val DsirBuckets = 1024L

  /** Non-negativity shift per feature token: the ilog2 ppm ladder
    * spans [0, 20], so +21 keeps every per-token contribution ≥ 0
    * (integer `div` on negatives floors differently across engines —
    * the q132 stance). 21·2^20 per token ≡ neutral.
    */
  private[queries] val DsirShift = 21L

  /** Keep quota: top quarter per source by mean importance. */
  private[queries] val DsirKeepDen = 4L

  /** L113 gram width: word 3-grams — the 31-word synthetic vocabulary
    * saturates unigram (and most bigram) frequencies, while the
    * trigram tail is long enough that singletons/doubletons exist at
    * every gated SF and the unseen-mass estimate is non-degenerate.
    */
  private[queries] val GtGramN = 3

  /** L114 anonymity threshold and length-bucket width. */
  private[queries] val KAnonK = 5L
  private[queries] val KAnonBucketChars = 256L

  def all: Seq[GraftQuery] = {

    /* L107: DSIR-style hashed importance resampling — data selection
     * by density ratio over a HASHED feature space (Xie et al.'s DSIR
     * recipe): both the target (in-domain seed, the L65 %7 slice) and
     * raw distributions are Laplace-smoothed counts over h64(bigram)
     * mod 2^10 buckets, a doc's log importance weight is the sum over
     * its feature TOKENS of ilog2(p_target) − ilog2(p_raw) on the ppm
     * ladder (+21-shifted per token into the non-negative domain, the
     * q132 stance), and selection keeps the top quarter PER SOURCE by
     * mean weight (Q20), hash-jitter + doc_id tie-broken — the
     * deterministic counterpart of DSIR's Gumbel top-k, and the
     * domain-balanced shape production selection runs anyway. The L65
     * plant rides along: %83==3 docs re-enter the pool (+10^6 ids)
     * with the 48-token marker block, whose bigrams are target-OOV but
     * raw-frequent, so planted docs sink to the bottom of every
     * source's ranking and n_plant_kept stays 0 on the gated fixtures.
     * Where L65 builds per-WORD rank models (a vocabulary that grows
     * with the corpus), the DSIR model is two FIXED 2^10-bucket count
     * vectors — the difference that lets the selector ship as a
     * broadcast array at any corpus size. At 100 TB: one gram pass,
     * two |buckets|-row map-side-combined aggregates broadcast back,
     * one doc-keyed aggregate, and per-source top-k windows (sources
     * are numerous → well-distributed partitions). */
    val q175 = GraftQuery(
      "q175_dsir_importance_resampling", "L107 L65 L41 L93",
      (s, d) => {
        val docs = Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text"))
        val pool = docs.unionByName(docs.filter(col("doc_id") % 83 === 3)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("source"),
            concat(lit(TextCorpusOps.OodMarkerBlock + " "), col("text"))
              .as("text")))
        val fe = pool.select(col("doc_id"), col("source"),
            explode(call_function("graft_grams", col("text"), lit(2)))
              .as("gram"))
          .select(col("doc_id"), col("source"),
            (Sketches.h64(concat(lit("dsir:"), col("gram")))
              % lit(DsirBuckets)).as("f"))
        val tc = fe.filter(col("doc_id") % 7 === 0 &&
            col("doc_id") < 1000000L)
          .groupBy(col("f")).agg(count(lit(1)).as("ct"))
        val tt = tc.agg(coalesce(sum(col("ct")), lit(0L)).as("nt"))
        val rc = fe.groupBy(col("f")).agg(count(lit(1)).as("cr"))
        val rt = rc.agg(sum(col("cr")).as("nr"))
        val ds = fe.join(broadcast(tc), Seq("f"), "left")
          .join(broadcast(rc), Seq("f"))
          .crossJoin(broadcast(tt)).crossJoin(broadcast(rt))
          .withColumn("tok",
            Sketches.ilog2(expr(s"((coalesce(ct, 0) + 1) * 1000000) div " +
              s"(nt + $DsirBuckets)")) -
            Sketches.ilog2(expr(s"((cr + 1) * 1000000) div " +
              s"(nr + $DsirBuckets)")) + lit(DsirShift))
          .groupBy(col("doc_id"), col("source"))
          .agg(sum(col("tok")).as("score"), count(lit(1)).as("n_feat"))
          .withColumn("mean_q20", expr("(score * 1048576) div n_feat"))
          .withColumn("jit", Sketches.h64(concat(lit("dsirsel:"),
            col("doc_id").cast("string"))) % lit(1000000L))
        val rk = ds
          .withColumn("rk", row_number().over(Window
            .partitionBy(col("source"))
            .orderBy(col("mean_q20").desc, col("jit").desc, col("doc_id"))))
          .withColumn("ns", count(lit(1)).over(Window
            .partitionBy(col("source"))))
          .withColumn("kept", col("rk") <= expr(s"ns div $DsirKeepDen"))
        rk.groupBy(col("source"))
          .agg(count(lit(1)).as("n_scored"),
            sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
            sum(when(col("doc_id") >= 1000000L, 1L).otherwise(0L))
              .as("n_plant"),
            sum(when(col("kept") && col("doc_id") >= 1000000L, 1L)
              .otherwise(0L)).as("n_plant_kept"),
            sum(when(col("kept"), col("mean_q20")).otherwise(0L))
              .as("sum_mean_kept"),
            sum(when(col("kept"), Sketches.h64(concat(lit("k:"),
              col("doc_id").cast("string"))) % lit(1000003L))
              .otherwise(0L)).as("kept_checksum"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val hf = Sketches.h64Sql("'dsir:' || gram")
        val tIlog = Sketches.ilog2Sql(
          s"((COALESCE(tc.ct, 0) + 1) * 1000000) // (tt.nt + $DsirBuckets)")
        val rIlog = Sketches.ilog2Sql(
          s"((rc.cr + 1) * 1000000) // (rt.nr + $DsirBuckets)")
        s"""WITH pool AS (SELECT doc_id, source, text FROM documents
            UNION ALL
            SELECT doc_id + 1000000, source,
              '${TextCorpusOps.OodMarkerBlock} ' || text
            FROM documents WHERE doc_id % 83 = 3),
          gd AS (SELECT doc_id, source,
              CASE WHEN len($ws) >= 2 THEN
                list_transform(range(1, len($ws)),
                  i -> ($ws)[i] || ' ' || ($ws)[i+1])
              ELSE CAST([] AS VARCHAR[]) END AS g
            FROM pool),
          fe AS (SELECT doc_id, source, $hf % $DsirBuckets AS f
            FROM (SELECT doc_id, source, unnest(g) AS gram FROM gd)),
          tc AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS ct FROM fe
            WHERE doc_id % 7 = 0 AND doc_id < 1000000 GROUP BY 1),
          tt AS (SELECT CAST(COALESCE(SUM(ct), 0) AS BIGINT) AS nt
            FROM tc),
          rc AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS cr FROM fe
            GROUP BY 1),
          rt AS (SELECT CAST(SUM(cr) AS BIGINT) AS nr FROM rc),
          ds AS (SELECT fe.doc_id, fe.source,
              CAST(SUM($tIlog - $rIlog + $DsirShift) AS BIGINT) AS score,
              CAST(COUNT(*) AS BIGINT) AS n_feat
            FROM fe LEFT JOIN tc ON tc.f = fe.f JOIN rc ON rc.f = fe.f
              CROSS JOIN tt CROSS JOIN rt
            GROUP BY 1, 2),
          sc AS (SELECT *, (score * 1048576) // n_feat AS mean_q20,
              ${Sketches.h64Sql("'dsirsel:' || doc_id")} % 1000000 AS jit
            FROM ds),
          rk AS (SELECT *, row_number() OVER (PARTITION BY source
              ORDER BY mean_q20 DESC, jit DESC, doc_id) AS rk,
              COUNT(*) OVER (PARTITION BY source) AS ns
            FROM sc),
          k AS (SELECT *, rk <= ns // $DsirKeepDen AS kept FROM rk)
          SELECT source, COUNT(*) AS n_scored,
            CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
              AS n_kept,
            CAST(SUM(CASE WHEN doc_id >= 1000000 THEN 1 ELSE 0 END)
              AS BIGINT) AS n_plant,
            CAST(SUM(CASE WHEN kept AND doc_id >= 1000000 THEN 1 ELSE 0
              END) AS BIGINT) AS n_plant_kept,
            CAST(SUM(CASE WHEN kept THEN mean_q20 ELSE 0 END) AS BIGINT)
              AS sum_mean_kept,
            CAST(SUM(CASE WHEN kept THEN
              ${Sketches.h64Sql("'k:' || doc_id")} % 1000003 ELSE 0 END)
              AS BIGINT) AS kept_checksum
          FROM k GROUP BY 1 ORDER BY source"""
      })

    /* L113: Good–Turing unseen mass + Chao1 richness — "how much of
     * the distribution has this corpus never seen", the number that
     * prices further crawling/dedup against diminishing returns. Over
     * word 3-grams per source: the Good–Turing estimate of the
     * probability mass on UNSEEN types is F1/N (singleton tokens over
     * total tokens, exact in ppm), and the Chao1 lower bound on the
     * true type count is V + F1²/(2·F2) (integerized with a +1
     * denominator guard so a zero-doubleton stratum degrades to
     * +F1²·~half rather than dividing by zero — identically on both
     * engines). The whole statistic reduces to the frequency-of-
     * frequencies profile, which is why it scales: one gram pass →
     * per-(source, gram) counts (map-side combined), then a
     * |sources|·|distinct counts|-sized rollup — no sorts, no joins.
     * At 100 TB the per-(source, gram) aggregate is the same shuffle
     * the L51 term-divergence pass already pays. */
    val q181 = GraftQuery(
      "q181_good_turing_unseen", "L113 L69 L30",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"),
            explode(call_function("graft_grams", col("text"),
              lit(GtGramN))).as("gram"))
          .groupBy(col("source"), col("gram"))
          .agg(count(lit(1)).as("c"))
        counts.groupBy(col("source"))
          .agg(sum(col("c")).as("n_tokens"),
            count(lit(1)).as("v"),
            sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
            sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"))
          .withColumn("unseen_ppm",
            expr("(f1 * 1000000) div n_tokens"))
          .withColumn("chao1", expr("v + (f1 * f1) div (2 * f2 + 1)"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH gd AS (SELECT source,
              CASE WHEN len($ws) >= $GtGramN THEN
                list_transform(range(1, len($ws) - ${GtGramN - 2}),
                  i -> ($ws)[i] || ' ' || ($ws)[i+1] || ' ' || ($ws)[i+2])
              ELSE CAST([] AS VARCHAR[]) END AS g
            FROM documents),
          cnt AS (SELECT source, gram, CAST(COUNT(*) AS BIGINT) AS c
            FROM (SELECT source, unnest(g) AS gram FROM gd)
            GROUP BY 1, 2),
          agg AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
              CAST(COUNT(*) AS BIGINT) AS v,
              CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS f1,
              CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                AS f2
            FROM cnt GROUP BY 1)
          SELECT source, n_tokens, v, f1, f2,
            (f1 * 1000000) // n_tokens AS unseen_ppm,
            v + (f1 * f1) // (2 * f2 + 1) AS chao1
          FROM agg ORDER BY source"""
      })

    /* L114: k-anonymity small-cell suppression audit — the release
     * gate on per-strata statistics: a stratum (source, lang, length
     * bucket) with fewer than k members identifies its documents, so
     * its row must be suppressed before any per-strata report ships.
     * The audit counts each source's strata, flags cells below k = 5,
     * and reports the suppressed vs released population plus a
     * flagged-cell key checksum (so a changed bucketing rule diverges
     * the gate, not just the counts). At 100 TB: one map-side-combined
     * (source, lang, bucket) aggregate — cells, not docs, flow into
     * the rollup. */
    val q182 = GraftQuery(
      "q182_kanon_small_cells", "L114 L30 L14",
      (s, d) => {
        val cells = Tables.documents(s, d)
          .select(col("source"), col("lang"),
            least(expr(s"n_chars div $KAnonBucketChars"), lit(7L))
              .as("bkt"))
          .groupBy(col("source"), col("lang"), col("bkt"))
          .agg(count(lit(1)).as("n"))
          .withColumn("small", col("n") < KAnonK)
        cells.groupBy(col("source"))
          .agg(count(lit(1)).as("n_strata"),
            sum(when(col("small"), 1L).otherwise(0L)).as("n_small"),
            sum(when(col("small"), col("n")).otherwise(0L))
              .as("pop_suppressed"),
            sum(when(!col("small"), col("n")).otherwise(0L))
              .as("pop_released"),
            sum(when(col("small"), Sketches.h64(concat(lit("cell:"),
              col("source"), lit(":"), col("lang"), lit(":"),
              col("bkt"))) % lit(1000003L)).otherwise(0L))
              .as("small_checksum"))
          .orderBy(col("source"))
      },
      Some {
        val ck = Sketches.h64Sql("'cell:' || source || ':' || lang " +
          "|| ':' || bkt")
        s"""WITH cells AS (SELECT source, lang,
              LEAST(n_chars // $KAnonBucketChars, 7) AS bkt,
              CAST(COUNT(*) AS BIGINT) AS n
            FROM documents GROUP BY 1, 2, 3),
          f AS (SELECT *, n < $KAnonK AS small FROM cells)
          SELECT source, COUNT(*) AS n_strata,
            CAST(SUM(CASE WHEN small THEN 1 ELSE 0 END) AS BIGINT)
              AS n_small,
            CAST(SUM(CASE WHEN small THEN n ELSE 0 END) AS BIGINT)
              AS pop_suppressed,
            CAST(SUM(CASE WHEN NOT small THEN n ELSE 0 END) AS BIGINT)
              AS pop_released,
            CAST(SUM(CASE WHEN small THEN $ck % 1000003 ELSE 0 END)
              AS BIGINT) AS small_checksum
          FROM f GROUP BY 1 ORDER BY source"""
      })

    /* L119: Zipf-slope corpus health — the companion read to L113's
     * unseen mass: natural language keeps a log-log rank-frequency
     * slope near −1 (Zipf's law); template/boilerplate floods flatten
     * it toward 0 (few types eat everything) and word-salad/random
     * corpora steepen or shred it. The fit is exact-integer least
     * squares on the ilog2 ladder (the L63 stance — libm-free):
     * points (x, y) = (ilog2(rank), ilog2(count)) over the per-source
     * vocabulary ranked by (count DESC, word), slope_ppm =
     * (n·Σxy − Σx·Σy)·10^6 div (n·Σx² − (Σx)², ≥ 1-guarded),
     * intercept_ppm = (Σy·10^6 − slope_ppm·Σx) div n — derived FROM
     * the integerized slope so both engines compose identically.
     * At 100 TB: one gram pass → per-(source, word) counts (map-side
     * combined); the rank window runs on the |vocab|-row frame (the
     * L63/L68 stance) and the fit is a |sources|-row rollup. */
    val q187 = GraftQuery(
      "q187_zipf_slope", "L119 L113 L63",
      (s, d) => {
        val counts = Tables.documents(s, d)
          .select(col("source"),
            explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("source"), col("w"))
          .agg(count(lit(1)).as("c"))
        val ranked = counts
          .withColumn("r", row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("source"))
              .orderBy(col("c").desc, col("w"))).cast("long"))
          .select(col("source"), col("c"),
            Sketches.ilog2(col("r")).as("x"),
            Sketches.ilog2(col("c")).as("y"))
        ranked.groupBy(col("source"))
          .agg(count(lit(1)).as("v"), sum(col("c")).as("n_tokens"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("slope_ppm",
            expr("((v * sxy - sx * sy) * 1000000) " +
              "div greatest(v * sxx - sx * sx, 1)"))
          .withColumn("intercept_ppm",
            expr("(sy * 1000000 - slope_ppm * sx) div v"))
          .select(col("source"), col("v"), col("n_tokens"),
            col("slope_ppm"), col("intercept_ppm"))
          .orderBy(col("source"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val lx = Sketches.ilog2Sql("r")
        val ly = Sketches.ilog2Sql("c")
        s"""WITH w AS (SELECT source, unnest($ws) AS w FROM documents),
          vc AS (SELECT source, w, CAST(COUNT(*) AS BIGINT) AS c
            FROM w GROUP BY 1, 2),
          rk AS (SELECT source, c, CAST(row_number() OVER
              (PARTITION BY source ORDER BY c DESC, w) AS BIGINT) AS r
            FROM vc),
          pt AS (SELECT source, c, $lx AS x, $ly AS y FROM rk),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS v,
              CAST(SUM(c) AS BIGINT) AS n_tokens,
              CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
              CAST(SUM(x * y) AS BIGINT) AS sxy,
              CAST(SUM(x * x) AS BIGINT) AS sxx
            FROM pt GROUP BY 1),
          sl AS (SELECT *, ((v * sxy - sx * sy) * 1000000)
              // GREATEST(v * sxx - sx * sx, 1) AS slope_ppm
            FROM ag)
          SELECT source, v, n_tokens, slope_ppm,
            (sy * 1000000 - slope_ppm * sx) // v AS intercept_ppm
          FROM sl ORDER BY source"""
      })

    Seq(q175, q181, q182, q187)
  }
}
