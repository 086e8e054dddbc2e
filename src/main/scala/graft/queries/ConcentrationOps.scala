package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Corpus-economics operators (SURVEY §2.11a, L132–L135):
  *
  *  - L132 Lorenz/Gini document-mass concentration  → q200
  *  - L133 term burstiness (index of dispersion)    → q201
  *  - L134 Kish effective sample size of weights    → q202
  *  - L135 hashing-trick collision audit            → q203
  *
  * The "how much corpus do we REALLY have" tier: whether a source's
  * character mass is spread across its documents or locked up in a few
  * giants (Gini — a handful of mega-docs dominating a source's token
  * budget is a sampling hazard every mixture planner needs priced),
  * which terms cluster into few documents vs spread evenly (burstiness
  * separates topical content words from glue — a vocabulary-planning
  * and stopword read), how many effective documents survive the L92
  * soft-dedup weighting (Kish ESS — the honest denominator for every
  * per-source statistic computed on the weighted corpus), and how much
  * type/token mass the L41/L86 feature-hashing width actually aliases
  * (the collision audit that prices the 2^b dial before a classifier
  * trains on it).
  *
  * Determinism: all statistics ride the shared integer ladders (ppm /
  * Q10 / Q20 fixed point, ilog2 for logs, (value, id) total orders for
  * every rank), so the DuckDB twins are bit-exact by construction.
  */
object ConcentrationOps {

  /** L133 dials: per-doc counts clip at 2^10 (burstiness saturation —
    * keeps Σc² ≤ 2^10·Σc so the Q10 rescale below stays Long-safe at
    * any corpus size), terms need df ≥ 4 to report (dispersion over
    * fewer docs is noise), and the report is the top-16 burstiest.
    */
  private[graft] val BurstClip = 1024L
  private[queries] val BurstMinDf = 4L
  private[queries] val BurstTopK = 16
  /** Occurrence totals below 2^43 take the exact (ssq·2^10) div tot
    * path (ssq ≤ 2^10·tot keeps the numerator under 2^63 there); above
    * it the denominator shifts instead — same value ±1 ulp of the
    * ladder, chosen identically by both engines.
    */
  private[graft] val BurstExactMax = 8796093022208L // 2^43

  /** L135 feature-hash widths to price (bits). */
  private[queries] val HashWidthBits = Seq(8, 12, 16)

  def all: Seq[GraftQuery] = {

    /* L132: Lorenz/Gini document-mass concentration — is a source's
     * character mass spread across its documents or concentrated in a
     * few giants? A source whose top decile holds 80% of the mass
     * contributes far fewer EFFECTIVE documents than its row count
     * claims, skews any per-doc sampling scheme, and hides boilerplate
     * floods (many near-empty rows + a few mega-docs). Per source, over
     * the (n_chars, doc_id) total order (ties broken deterministically;
     * the Gini sum is tie-order invariant because equal masses
     * contribute rank-sum × mass): gini_ppm = (2·Σ rk·x − (n+1)·Σx)·
     * 10^6 div (n·Σx) — the exact mean-difference form — plus the two
     * operational quantile shares (bottom-half and top-decile mass).
     * At 100 TB: production folds the same statistic over the L59
     * bottom-k sample — REGISTERED as q228 (L160, the sample Gini,
     * spec-pinned equal to this query at the gated fixtures); this
     * gated form is its exact oracle. The per-source rank is one
     * window over source-partitioned data (well-distributed; no global
     * sort), and the rollup is |sources| rows. */
    val q200 = GraftQuery(
      "q200_mass_concentration", "L132 L30 L59",
      (s, d) => {
        val w = Window.partitionBy(col("source"))
          .orderBy(col("n_chars"), col("doc_id"))
        Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("n_chars"))
          .withColumn("rk", row_number().over(w).cast("long"))
          .withColumn("n", count(lit(1))
            .over(Window.partitionBy(col("source"))).cast("long"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(col("n_chars")).as("total_chars"),
            sum(col("rk") * col("n_chars")).as("srx"),
            sum(when(col("rk") <= expr("n div 2"), col("n_chars"))
              .otherwise(0L)).as("bh"),
            sum(when(col("rk") > expr("n - n div 10"), col("n_chars"))
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
        s"""WITH rk AS (SELECT source, n_chars,
              CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS BIGINT) AS rk,
              CAST(COUNT(*) OVER (PARTITION BY source) AS BIGINT) AS n
            FROM documents),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS total_chars,
              CAST(SUM(rk * n_chars) AS BIGINT) AS srx,
              CAST(SUM(CASE WHEN rk <= n // 2 THEN n_chars ELSE 0 END)
                AS BIGINT) AS bh,
              CAST(SUM(CASE WHEN rk > n - n // 10 THEN n_chars ELSE 0
                END) AS BIGINT) AS td
            FROM rk GROUP BY 1)
          SELECT source, n_docs, total_chars,
            ((2 * srx - (n_docs + 1) * total_chars) * 1000000)
              // GREATEST(n_docs * total_chars, 1) AS gini_ppm,
            (bh * 1000000) // GREATEST(total_chars, 1)
              AS bottom_half_ppm,
            (td * 1000000) // GREATEST(total_chars, 1)
              AS top_decile_ppm
          FROM ag ORDER BY source"""
      })

    /* L133: term burstiness — the variance-to-mean ratio (index of
     * dispersion) of each term's per-document occurrence counts over
     * ALL N corpus docs: VMR ≈ 1 is Poisson scatter (glue/function
     * words), VMR >> 1 means the term's occurrences clump into few
     * documents (topical content words, template fragments — the
     * Church–Gale burstiness signal behind stopword lists, keyword
     * extraction and tokenizer vocabulary planning). Zero-docs
     * contribute nothing to Σc or Σc², so both sums run over the
     * postings only and the N-doc statistic falls out exactly:
     * VMR = Σc² div Σc − Σc div N, both terms in Q10. Per-doc counts
     * clip at 2^10 (saturation — and the Long-safety invariant
     * Σc² ≤ 2^10·Σc); below tot = 2^43 the first term rescales the
     * numerator exactly, above it the denominator shifts instead (both
     * engines pick the same branch). At 100 TB: one word pass into a
     * map-side-combined (doc, term) count, a vocab-sized rollup, a
     * broadcast scalar for N, and the orderBy.limit top-16 (post-limit
     * rank stance — no global window sees the vocabulary). */
    val q201 = GraftQuery(
      "q201_term_burstiness", "L133 L9 L16",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val n = docs.agg(count(lit(1)).as("n_corpus_docs"))
        val pc = docs
          .select(col("doc_id"), explode(Sketches.words(col("text")))
            .as("w"))
          .groupBy(col("doc_id"), col("w"))
          .agg(least(count(lit(1)), lit(BurstClip)).as("c"))
        pc.groupBy(col("w"))
          .agg(count(lit(1)).as("df"), sum(col("c")).as("n_occ"),
            sum(col("c") * col("c")).as("sumsq"))
          .filter(col("df") >= BurstMinDf)
          .crossJoin(broadcast(n))
          .withColumn("vmr_q10", expr(
            s"(CASE WHEN n_occ < $BurstExactMax THEN " +
              "(sumsq * 1024) div n_occ " +
              "ELSE sumsq div greatest(n_occ div 1024, 1) END) - " +
              "(n_occ * 1024) div n_corpus_docs"))
          .orderBy(col("vmr_q10").desc, col("n_occ").desc, col("w"))
          .limit(BurstTopK)
          .select(col("w").as("term"), col("df"), col("n_occ"),
            col("sumsq"), col("vmr_q10"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_corpus_docs
              FROM documents),
          pc AS (SELECT doc_id, w,
              LEAST(CAST(COUNT(*) AS BIGINT), $BurstClip) AS c
            FROM (SELECT doc_id, unnest($ws) AS w FROM documents)
            GROUP BY 1, 2),
          vg AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df,
              CAST(SUM(c) AS BIGINT) AS n_occ,
              CAST(SUM(c * c) AS BIGINT) AS sumsq
            FROM pc GROUP BY 1 HAVING COUNT(*) >= $BurstMinDf)
          SELECT w AS term, df, n_occ, sumsq,
            (CASE WHEN n_occ < $BurstExactMax THEN (sumsq * 1024) // n_occ
              ELSE sumsq // GREATEST(n_occ // 1024, 1) END) -
              (n_occ * 1024) // n_corpus_docs AS vmr_q10
          FROM vg, n
          ORDER BY vmr_q10 DESC, n_occ DESC, w LIMIT $BurstTopK"""
      })

    /* L134: Kish effective sample size of the soft-dedup weights — the
     * honest denominator for the weighted corpus: the L92 weighting
     * keeps every duplicate at weight 1/cluster-size, so n_docs rows no
     * longer carry n_docs of evidence; ESS = (Σw)²/Σw² is the
     * importance-sampling diagnostic that says how many UNIT-WEIGHT
     * documents the weighted set is worth (all-unique → ESS = n;
     * everything one cluster → ESS ≈ cluster count). Consumes the
     * REGISTERED q160 cluster kernel (WebCorpusOps.clusterSizes), not a
     * copy. Ladder: w = 2^20 div csz; the ratio is computed mean-wise —
     * ess_ratio_ppm = ((Σw div n)² div 2^20)·10^6 div (Σ(w² div 2^20)
     * div n) — every intermediate ≤ 2^40 regardless of corpus size.
     * At 100 TB: the q160 passes + a |sources|-row rollup. */
    val q202 = GraftQuery(
      "q202_ess_soft_dedup", "L134 L92 L2",
      (s, d) => {
        WebCorpusOps.clusterSizes(s, d)
          .withColumn("wq", expr("1048576 div csz"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            sum(when(col("csz") === 1, 1L).otherwise(0L)).as("n_unique"),
            sum(col("wq")).as("sw"),
            sum(expr("(wq * wq) div 1048576")).as("sw2"))
          .withColumn("mw", expr("sw div n_docs"))
          .withColumn("mw2", expr("sw2 div n_docs"))
          .withColumn("ess_ratio_ppm", expr(
            "(((mw * mw) div 1048576) * 1000000) div greatest(mw2, 1)"))
          .withColumn("ess_docs",
            expr("(n_docs * ess_ratio_ppm) div 1000000"))
          .select(col("source"), col("n_docs"), col("n_unique"),
            col("sw").as("sum_w_q20"), col("ess_ratio_ppm"),
            col("ess_docs"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH ${WebCorpusOps.clusterCtesSql},
          wq AS (SELECT source, csz, 1048576 // csz AS wq FROM cj),
          ag AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN csz = 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_unique,
              CAST(SUM(wq) AS BIGINT) AS sw,
              CAST(SUM((wq * wq) // 1048576) AS BIGINT) AS sw2
            FROM wq GROUP BY 1),
          mm AS (SELECT *, sw // n_docs AS mw, sw2 // n_docs AS mw2
            FROM ag),
          es AS (SELECT *, (((mw * mw) // 1048576) * 1000000)
              // GREATEST(mw2, 1) AS ess_ratio_ppm FROM mm)
          SELECT source, n_docs, n_unique, sw AS sum_w_q20,
            ess_ratio_ppm,
            (n_docs * ess_ratio_ppm) // 1000000 AS ess_docs
          FROM es ORDER BY source"""
      })

    /* L135: hashing-trick collision audit — prices the 2^b feature
     * width the L41/L86 classifiers hash their vocabulary into: how
     * many distinct types share a bucket with another type, and how
     * much TOKEN mass sits in collided buckets (mass-weighted aliasing
     * is what actually moves a trained filter — a rare type colliding
     * with "the" is invisible; two frequent types colliding is not).
     * All widths read from ONE hash frame (2^8 | 2^12 | 2^16 nest by
     * construction — the q198 nested-dial stance): per width, per
     * bucket: types and mass; rollup per width: occupied buckets,
     * collided types, collided-mass ppm, max bucket fan-in. At 100 TB:
     * one word pass into the map-side-combined vocab agg, then a
     * 3·|vocab|-row explode and two vocab-sized shuffles — no
     * corpus-sized state anywhere. */
    val q203 = GraftQuery(
      "q203_hash_collision_audit", "L135 L41 L86",
      (s, d) => {
        val vocab = Tables.documents(s, d)
          .select(explode(Sketches.words(col("text"))).as("w"))
          .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
          .withColumn("h", Sketches.h64(concat(lit("feat:"), col("w"))))
        val widths = vocab.select(col("cnt"),
          explode(array(HashWidthBits.map(b =>
            struct(lit(b.toLong).as("width_bits"),
              (col("h") % lit(1L << b)).as("bucket"))): _*)).as("x"))
          .select(col("x.width_bits").as("width_bits"),
            col("x.bucket").as("bucket"), col("cnt"))
        val buckets = widths.groupBy(col("width_bits"), col("bucket"))
          .agg(count(lit(1)).as("nt"), sum(col("cnt")).as("mass"))
        buckets.groupBy(col("width_bits"))
          .agg(sum(col("nt")).as("n_types"),
            count(lit(1)).as("n_buckets"),
            sum(when(col("nt") >= 2, col("nt")).otherwise(0L))
              .as("collided_types"),
            sum(when(col("nt") >= 2, col("mass")).otherwise(0L))
              .as("cm"),
            sum(col("mass")).as("total_mass"),
            max(col("nt")).as("max_bucket_types"))
          .withColumn("collided_mass_ppm",
            expr("(cm * 1000000) div greatest(total_mass, 1)"))
          .select(col("width_bits"), col("n_types"), col("n_buckets"),
            col("collided_types"), col("collided_mass_ppm"),
            col("max_bucket_types"))
          .orderBy(col("width_bits"))
      },
      Some {
        val ws = Sketches.wordsSql("text")
        val h = Sketches.h64Sql("'feat:' || w")
        val branches = HashWidthBits.map(b =>
          s"""SELECT CAST($b AS BIGINT) AS width_bits,
              h % ${1L << b} AS bucket, cnt FROM vocab""")
          .mkString("\n          UNION ALL\n          ")
        s"""WITH vocab AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt,
              $h AS h
            FROM (SELECT unnest($ws) AS w FROM documents) GROUP BY 1),
          wd AS ($branches),
          bk AS (SELECT width_bits, bucket,
              CAST(COUNT(*) AS BIGINT) AS nt,
              CAST(SUM(cnt) AS BIGINT) AS mass
            FROM wd GROUP BY 1, 2),
          ag AS (SELECT width_bits, CAST(SUM(nt) AS BIGINT) AS n_types,
              CAST(COUNT(*) AS BIGINT) AS n_buckets,
              CAST(SUM(CASE WHEN nt >= 2 THEN nt ELSE 0 END) AS BIGINT)
                AS collided_types,
              CAST(SUM(CASE WHEN nt >= 2 THEN mass ELSE 0 END)
                AS BIGINT) AS cm,
              CAST(SUM(mass) AS BIGINT) AS total_mass,
              CAST(MAX(nt) AS BIGINT) AS max_bucket_types
            FROM bk GROUP BY 1)
          SELECT width_bits, n_types, n_buckets, collided_types,
            (cm * 1000000) // GREATEST(total_mass, 1)
              AS collided_mass_ppm,
            max_bucket_types
          FROM ag ORDER BY width_bits"""
      })

    Seq(q200, q201, q202, q203)
  }
}
