package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.{Sketches, TextFunctions}

/** Corpus-curation operators layered on the LLM-pipeline primitives
  * (SURVEY §2.11a, L33–L38) — the measurement/reporting half of a
  * production training-data build:
  *
  *  - L33 chunk-level exact dedup (cross-doc passage dedup)   → q98
  *  - L34 per-benchmark contamination report                  → q99
  *  - L35 adaptive per-language quality thresholds            → q100
  *  - L36 dedup-impact profile per source                     → q101
  *  - L37 shingle-novelty scoring                             → q102
  *  - L38 MinHash-vs-exact Jaccard calibration curve          → q103
  *  - L39 cluster-balanced resampling (topic balance)         → q104
  *  - L40 quantizer refinement (one Lloyd/k-means step)       → q105
  *  - L41 hashing-trick linear classifier scoring             → q106
  *  - L42 temperature-resampled mixture allocation            → q107
  *  - L43 deterministic stratified inspection sample          → q108
  *
  * Every operator reuses the pipeline's shared builders
  * ([[LlmPipeline.chunkFrame]], [[LlmPipeline.signaturesOf]],
  * [[LlmPipeline.lshBands]], [[LlmPipeline.shingleRows]]) so the
  * constructions — and their DuckDB oracle twins — have exactly one
  * source of truth each.
  */
object LlmCuration {

  /** Deterministic duplicate planting (the q96/q87 pattern): replay the
    * `doc_id % 97 == 1` slice under shifted ids so the duplicate branch of
    * a dedup operator fires at every scale factor instead of only where
    * fixture luck provides a collision. Applied identically in the oracle.
    */
  private[queries] def withReplays(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame =
    docs.unionByName(docs.filter(col("doc_id") % 97 === 1)
      .withColumn("doc_id", col("doc_id") + 1000000L))

  private[queries] def replaySrcSql(cols: String): String =
    s"(SELECT $cols FROM documents UNION ALL " +
      s"SELECT ${cols.replace("doc_id", "doc_id + 1000000 AS doc_id")} " +
      s"FROM documents WHERE doc_id % 97 = 1)"

  val all: Seq[GraftQuery] = {

    /* L33: chunk-level exact dedup — the passage-granularity analog of L1
     * (Lee et al.'s "Deduplicating Training Data Makes Language Models
     * Better" operates at substring level; the tractable distributed form
     * is fixed-window chunks). L20's chunk frame keyed by chunk
     * fingerprint: the canonical copy of a repeated passage is the min
     * (doc_id, chunk_id) occurrence, every other occurrence is a dup.
     * Per-doc report: how much of each document is made of passages seen
     * elsewhere. At 100 TB: the chunk frame is map-side 1→N expansion,
     * clusters are one hash-groupBy on 8-byte fingerprints, and the
     * cluster re-join keys on the same fingerprint — no window, nothing
     * quadratic. The (doc, chunk) pair packs into one BIGINT so the
     * canonical choice is a plain MIN (no struct ordering divergence
     * between engines). */
    val q98 = GraftQuery(
      "q98_chunk_dedup", "L33 L20 L1",
      (s, d) => {
        val docs = withReplays(
          Tables.documents(s, d).select(col("doc_id"), col("text")))
        val ch = LlmPipeline.chunkFrame(docs)
          .select(col("doc_id"), col("chunk_fp"),
            (col("doc_id") * 1048576L + col("chunk_id")).as("k"))
        val cl = ch.groupBy(col("chunk_fp"))
          .agg(count(lit(1)).as("n"), min(col("k")).as("keeper"))
        ch.join(cl, Seq("chunk_fp"))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_chunks"),
            sum(when(col("n") > 1, 1L).otherwise(0L)).as("n_shared_chunks"),
            sum(when(col("n") > 1 && col("k") =!= col("keeper"), 1L)
              .otherwise(0L)).as("n_dup_chunks"))
          .withColumn("dup_ppm", expr("n_dup_chunks * 1000000 div n_chunks"))
          .orderBy(col("doc_id"))
      },
      Some {
        s"""WITH ${LlmPipeline.chunkCtesSql(replaySrcSql("doc_id, text"))},
          ck AS (SELECT doc_id, chunk_fp,
              doc_id * 1048576 + chunk_id AS k FROM chunks),
          cl AS (SELECT chunk_fp, COUNT(*) AS n, MIN(k) AS keeper
            FROM ck GROUP BY 1)
          SELECT ck.doc_id, COUNT(*) AS n_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_shared_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 AND ck.k <> cl.keeper THEN 1 ELSE 0 END)
              AS BIGINT) AS n_dup_chunks,
            CAST(SUM(CASE WHEN cl.n > 1 AND ck.k <> cl.keeper THEN 1 ELSE 0 END)
              AS BIGINT) * 1000000 // COUNT(*) AS dup_ppm
          FROM ck JOIN cl ON cl.chunk_fp = ck.chunk_fp
          GROUP BY 1 ORDER BY doc_id"""
      })

    /* L34: per-benchmark contamination report — the INVERSE read of L17.
     * q76/q85 flag which CORPUS docs are contaminated; an eval owner needs
     * the view per BENCHMARK (here: the eval docs' source): how many of
     * its eval documents and distinct n-grams exist, and how many corpus
     * documents share at least one n-gram with it — the number that
     * decides whether a benchmark is still trustworthy against a corpus.
     * At 100 TB: eval grams are benchmark-sized (broadcast), the corpus
     * gram stream joins map-side, the distinct collapses to
     * (benchmark, doc) pairs bounded by corpus hits, and the output is
     * |benchmarks| rows. */
    val q99 = GraftQuery(
      "q99_benchmark_contamination", "L34 L17",
      (s, d) => {
        val docs = Tables.documents(s, d)
        val ev = docs.filter(col("doc_id") % 97 === 0)
        val evGrams = LlmPipeline.shingleRowsOf(ev, carry = Seq("source"))
          .select(col("source").as("benchmark"),
            TextFunctions.md5Fingerprint(col("s")).as("g"))
          .distinct()
        val evDocs = ev.groupBy(col("source").as("benchmark"))
          .agg(count(lit(1)).as("n_eval_docs"))
        val evGramCounts = evGrams.groupBy(col("benchmark"))
          .agg(count(lit(1)).as("n_eval_grams"))
        val corpusGrams = LlmPipeline
          .shingleRowsOf(docs.filter(col("doc_id") % 97 =!= 0))
          .select(col("doc_id"), TextFunctions.md5Fingerprint(col("s")).as("g"))
        val hits = corpusGrams.join(broadcast(evGrams), Seq("g"))
          .select(col("benchmark"), col("doc_id")).distinct()
          .groupBy(col("benchmark")).agg(count(lit(1)).as("n_dirty_docs"))
        val tot = docs.filter(col("doc_id") % 97 =!= 0)
          .agg(count(lit(1)).as("n_corpus"))
        evDocs
          .join(evGramCounts, Seq("benchmark"))
          .join(hits, Seq("benchmark"), "left")
          .crossJoin(broadcast(tot))
          .select(col("benchmark"), col("n_eval_docs"), col("n_eval_grams"),
            coalesce(col("n_dirty_docs"), lit(0L)).as("n_dirty_docs"),
            expr("coalesce(n_dirty_docs, 0) * 1000000 div n_corpus")
              .as("dirty_ppm"))
          .orderBy(col("benchmark"))
      },
      Some {
        val shed = Sketches.shinglesSql("text", LlmPipeline.ShingleN)
        val gfp = TextFunctions.md5FingerprintSql("s")
        s"""WITH ev AS (SELECT source, doc_id, unnest($shed) AS s
            FROM documents WHERE doc_id % 97 = 0),
          evg AS (SELECT DISTINCT source AS benchmark, $gfp AS g FROM ev),
          evd AS (SELECT source AS benchmark, COUNT(*) AS n_eval_docs
            FROM documents WHERE doc_id % 97 = 0 GROUP BY 1),
          evgc AS (SELECT benchmark, COUNT(*) AS n_eval_grams
            FROM evg GROUP BY 1),
          cg AS (SELECT doc_id, $gfp AS g FROM
            (SELECT doc_id, unnest($shed) AS s FROM documents
             WHERE doc_id % 97 <> 0)),
          hits AS (SELECT benchmark, COUNT(*) AS n_dirty_docs FROM
            (SELECT DISTINCT evg.benchmark, cg.doc_id
             FROM cg JOIN evg ON evg.g = cg.g) GROUP BY 1),
          tot AS (SELECT COUNT(*) AS n_corpus FROM documents
            WHERE doc_id % 97 <> 0)
          SELECT evd.benchmark, evd.n_eval_docs, evgc.n_eval_grams,
            COALESCE(hits.n_dirty_docs, 0) AS n_dirty_docs,
            COALESCE(hits.n_dirty_docs, 0) * 1000000 // tot.n_corpus
              AS dirty_ppm
          FROM evd JOIN evgc USING (benchmark)
            LEFT JOIN hits USING (benchmark), tot
          ORDER BY benchmark"""
      })

    /* L35: adaptive per-language quality thresholds — a fixed global
     * quality floor (L16's shape) over-filters low-resource languages
     * whose score distribution sits lower (fewer English stopwords, other
     * length profiles); the production fix (Gopher/Dolma style) is a
     * per-language floor at a distribution quantile. Threshold = P25 of
     * the floor(q*1e6)-quantized integer score per language (dyadic-exact
     * quantile over integers — the q95 portability argument), report =
     * threshold + how many docs survive it. At 100 TB: the quantile
     * aggregates a count-map over the bounded quantized domain with
     * map-side partial merge; thresholds are a |langs|-row broadcast back
     * onto the scoring pass; output |langs| rows. */
    val q100 = GraftQuery(
      "q100_adaptive_quality", "L35 L9 A2",
      (s, d) => {
        val t = Tables.documents(s, d).select(col("lang"),
          floor(TextFunctions.qualityScoreColumn(col("text")) * lit(1e6))
            .cast("long").as("qi"))
        val thr = t.groupBy(col("lang"))
          .agg(count(lit(1)).as("n_docs"), expr("percentile(qi, 0.25)").as("q25"))
        val kept = t.join(broadcast(thr.select(col("lang"), col("q25"))), Seq("lang"))
          .groupBy(col("lang"))
          .agg(sum(when(col("qi") >= col("q25"), 1L).otherwise(0L)).as("n_keep"))
        thr.join(kept, Seq("lang"))
          .withColumn("keep_ppm", expr("n_keep * 1000000 div n_docs"))
          .select(col("lang"), col("n_docs"), col("q25"), col("n_keep"),
            col("keep_ppm"))
          .orderBy(col("lang"))
      },
      Some {
        val q = TextFunctions.qualityScoreSql("text")
        s"""WITH t AS (SELECT lang, CAST(floor(($q) * 1e6) AS BIGINT) AS qi
            FROM documents),
          thr AS (SELECT lang, COUNT(*) AS n_docs,
              quantile_cont(qi, 0.25e0) AS q25
            FROM t GROUP BY 1),
          kept AS (SELECT t.lang,
              CAST(SUM(CASE WHEN t.qi >= thr.q25 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_keep
            FROM t JOIN thr ON thr.lang = t.lang GROUP BY 1)
          SELECT thr.lang, thr.n_docs, thr.q25, kept.n_keep,
            kept.n_keep * 1000000 // thr.n_docs AS keep_ppm
          FROM thr JOIN kept ON kept.lang = thr.lang ORDER BY thr.lang"""
      })

    /* L36: dedup-impact profile — per source, what dedup would actually
     * save: docs and tokens in non-canonical copies of L2's canonical-form
     * clusters. This is the report that decides whether a source is worth
     * crawling (a mirror-heavy source shows dup_ppm near 1e6) and sizes
     * the post-dedup corpus before committing to the build. Replays
     * planted (q96 pattern) so the dup branch fires at every SF. At
     * 100 TB: one 8-byte-key groupBy for the clusters, one fingerprint
     * re-join, |sources|-row output — the same bounded shape as L1/L2. */
    val q101 = GraftQuery(
      "q101_dedup_impact", "L36 L2 L9",
      (s, d) => {
        val docs = withReplays(Tables.documents(s, d)
          .select(col("doc_id"), col("source"), col("text")))
        val dk = docs.select(col("doc_id"), col("source"),
          Sketches.h64(array_join(sort_array(array_distinct(
            Sketches.words(col("text")))), " ")).as("ck"),
          TextFunctions.tokenCountWs(col("text")).cast("long").as("tok"))
        val cl = dk.groupBy(col("ck")).agg(min(col("doc_id")).as("keeper"))
        dk.join(cl, Seq("ck"))
          .groupBy(col("source"))
          .agg(count(lit(1)).as("n_docs"),
            countDistinct(col("ck")).as("n_clusters"),
            sum(when(col("doc_id") =!= col("keeper"), 1L).otherwise(0L))
              .as("n_dup_docs"),
            sum(col("tok")).as("total_tokens"),
            sum(when(col("doc_id") =!= col("keeper"), col("tok")).otherwise(0L))
              .as("dup_tokens"))
          .withColumn("dup_ppm", expr("n_dup_docs * 1000000 div n_docs"))
          .orderBy(col("source"))
      },
      Some {
        val ck = Sketches.h64Sql(
          s"array_to_string(list_sort(list_distinct(${Sketches.wordsSql("text")})), ' ')")
        val tok = s"CASE WHEN len(trim(text)) = 0 THEN 0 " +
          s"ELSE len(regexp_split_to_array(trim(text), '\\s+')) END"
        s"""WITH pl AS (SELECT doc_id, source, text FROM documents
            UNION ALL SELECT doc_id + 1000000, source, text FROM documents
            WHERE doc_id % 97 = 1),
          dk AS (SELECT doc_id, source, $ck AS ck,
              CAST($tok AS BIGINT) AS tok FROM pl),
          cl AS (SELECT ck, MIN(doc_id) AS keeper FROM dk GROUP BY 1)
          SELECT source, COUNT(*) AS n_docs,
            COUNT(DISTINCT dk.ck) AS n_clusters,
            CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
              AS n_dup_docs,
            CAST(SUM(tok) AS BIGINT) AS total_tokens,
            CAST(SUM(CASE WHEN doc_id <> keeper THEN tok ELSE 0 END) AS BIGINT)
              AS dup_tokens,
            CAST(SUM(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
              * 1000000 // COUNT(*) AS dup_ppm
          FROM dk JOIN cl ON cl.ck = dk.ck GROUP BY 1 ORDER BY source"""
      })

    /* L37: shingle-novelty scoring — the complement of L26's boilerplate
     * lexicon: per document, the fraction of its distinct 3-gram shingles
     * that occur NOWHERE else in the corpus (df = 1). Low novelty means
     * the document is assembled from text that already exists — the soft
     * signal that catches near-template docs L1/L2's exact keys miss and
     * that upweights genuinely novel text in mixture design. At 100 TB:
     * the shared shingle frame feeds one fingerprint-keyed df aggregate
     * (map-side combined) and one fingerprint re-join; output is one row
     * per document with ≥1 shingle (sub-n-word docs have no 3-grams and
     * are out of scope by construction). */
    val q102 = GraftQuery(
      "q102_novelty_score", "L37 L26 L10",
      (s, d) => {
        // r19 optimization (guide §2.3): a fingerprint with df == 1 has
        // exactly ONE owning document, so its owner rides the df
        // aggregate itself as min(doc_id) — the old form joined the full
        // gram-level frame back against the df table (a second shuffle of
        // every (doc, g) row) and re-aggregated the joined frame by doc,
        // i.e. three corpus-scale exchanges where two suffice. n_shingles
        // and n_unique now come from two independent doc/g-keyed
        // aggregates joined at |docs| size. Row set identical: every gram
        // has a df row (the old inner join dropped nothing), and
        // sum(df = 1) per doc ≡ count of df-1 fingerprints whose
        // min(doc_id) is that doc.
        val gr = LlmPipeline.shingleRows(s, d)
          .select(col("doc_id"), TextFunctions.md5Fingerprint(col("s")).as("g"))
        val uniq = gr.groupBy(col("g"))
          .agg(count(lit(1)).as("df"), min(col("doc_id")).as("d0"))
          .filter(col("df") === 1)
          .groupBy(col("d0").as("doc_id"))
          .agg(count(lit(1)).as("n_unique"))
        gr.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
          .join(uniq, Seq("doc_id"), "left")
          .withColumn("n_unique", coalesce(col("n_unique"), lit(0L)))
          .withColumn("novelty_ppm", expr("n_unique * 1000000 div n_shingles"))
          .select(col("doc_id"), col("n_shingles"), col("n_unique"),
            col("novelty_ppm"))
          .orderBy(col("doc_id"))
      },
      Some {
        val shed = Sketches.shinglesSql("text", LlmPipeline.ShingleN)
        val gfp = TextFunctions.md5FingerprintSql("s")
        s"""WITH sr AS (SELECT doc_id, unnest($shed) AS s FROM documents),
          gr AS (SELECT doc_id, $gfp AS g FROM sr),
          dfq AS (SELECT g, COUNT(*) AS df FROM gr GROUP BY 1)
          SELECT gr.doc_id, COUNT(*) AS n_shingles,
            CAST(SUM(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_unique,
            CAST(SUM(CASE WHEN dfq.df = 1 THEN 1 ELSE 0 END) AS BIGINT)
              * 1000000 // COUNT(*) AS novelty_ppm
          FROM gr JOIN dfq ON dfq.g = gr.g GROUP BY 1 ORDER BY doc_id"""
      })

    /* L38: MinHash-vs-exact Jaccard calibration — "measure, don't guess"
     * applied to the dedup sketch itself: for every LSH candidate pair,
     * the signature-agreement estimate (matching positions / 16) next to
     * the exact shingle Jaccard, bucketed by match count. The curve tells
     * an operator what estimated similarity a given agreement level
     * actually implies on THIS corpus — the evidence behind choosing the
     * band/row dials and the verify threshold, exactly as AnnRecallSpec
     * backs the ANN dials. At 100 TB: runs over candidate pairs only
     * (banding + the executed hot-bucket guard bound them), signatures
     * re-join by doc id, the exact Jaccard is the same relational
     * intersect-count q36 uses, and the output is ≤ 17 rows. */
    val q103 = GraftQuery(
      "q103_minhash_calibration", "L38 L3 L4",
      (s, d) => {
        val ex = LlmPipeline.shingleRows(s, d)
        val sig = LlmPipeline.signaturesOf(ex)
        val cand = LlmPipeline.lshCandidates(
          LlmPipeline.lshBands(sig, "calib_hot_buckets"))
        val sigA = sig.select(col("doc_id").as("a") +:
          (0 until Sketches.NumHashes).map(i => col(s"s$i").as(s"a$i")): _*)
        val sigB = sig.select(col("doc_id").as("b") +:
          (0 until Sketches.NumHashes).map(i => col(s"s$i").as(s"b$i")): _*)
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = cand
          .join(ex.as("ea"), col("a") === col("ea.doc_id"))
          .join(ex.as("eb"), col("b") === col("eb.doc_id") && col("ea.s") === col("eb.s"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"))
        val pairs = cand
          .join(inter, Seq("a", "b"), "left")
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .join(sigA, "a").join(sigB, "b")
          .withColumn("exact_j", coalesce(col("inter"), lit(0L)).cast("double") /
            (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))))
          .withColumn("n_match", (0 until Sketches.NumHashes)
            .map(i => when(col(s"a$i") === col(s"b$i"), 1L).otherwise(0L))
            .reduce(_ + _))
        pairs.groupBy(col("n_match"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(floor(col("exact_j") * lit(1e6)).cast("long")).as("sum_exact_u"),
            min(col("exact_j")).as("min_exact"),
            max(col("exact_j")).as("max_exact"))
          .withColumn("est_ppm", expr("n_match * 1000000 div 16"))
          .withColumn("mean_exact",
            (col("sum_exact_u").cast("double") / col("n_pairs").cast("double"))
              / lit(1e6))
          .select(col("n_match"), col("est_ppm"), col("n_pairs"),
            col("mean_exact"), col("min_exact"), col("max_exact"))
          .orderBy(col("n_match"))
      },
      Some {
        val matchTerms = (0 until Sketches.NumHashes)
          .map(i => s"(CASE WHEN ga.s$i = gb.s$i THEN 1 ELSE 0 END)")
          .mkString(" + ")
        s"""WITH ${LlmPipeline.sigCtesSql},
          ${LlmPipeline.bandCandCtesSql},
          pa AS (SELECT c.a, c.b,
              ${Sketches.jaccardSql("sa.sh", "sb.sh")} AS exact_j,
              CAST(($matchTerms) AS BIGINT) AS n_match
            FROM cand c
              JOIN sh sa ON sa.doc_id = c.a JOIN sh sb ON sb.doc_id = c.b
              JOIN sig ga ON ga.doc_id = c.a JOIN sig gb ON gb.doc_id = c.b)
          SELECT n_match, n_match * 1000000 // 16 AS est_ppm,
            COUNT(*) AS n_pairs,
            (CAST(SUM(CAST(floor(exact_j * 1e6) AS BIGINT)) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE)) / 1e6 AS mean_exact,
            MIN(exact_j) AS min_exact, MAX(exact_j) AS max_exact
          FROM pa GROUP BY 1 ORDER BY n_match"""
      })

    /* L39: cluster-balanced resampling — the embedding-space complement of
     * L18's metadata mixture: assign every vector to its quantizer cell
     * (the q92 broadcast-codebook argmax — cells are data-adaptive topics)
     * and downsample each cell to the SMALLEST cell's size, so no topic
     * cluster dominates the training mix (the SemDeDup/SSL-curation
     * balance step; metadata strata can't see that two sources are the
     * same topic, cells can). Membership is the q73/q77 salted id-hash —
     * a vector's fate is a function of its id and the observed cell
     * counts alone, reproducible across re-runs and engines. The
     * threshold is pure integer math (n_min·1e6 div n), no float
     * acceptance boundary to diverge on. At 100 TB: the corpus is never
     * shuffled — cell assignment is a broadcast NLJ + map-side max_by,
     * acceptance is a map-side filter against a broadcast |cells|-row
     * threshold table; only |cells|-row aggregates shuffle. */
    val q104 = GraftQuery(
      "q104_cluster_balance", "L39 L27 L18",
      (s, d) => {
        val e = LlmPipeline.embeddingFrame(s, d)
        val asn = LlmPipeline.cellAssignOf(e)
        val counts = asn.groupBy(col("cell")).agg(count(lit(1)).as("n"))
        val nmin = counts.agg(min(col("n")).as("n_min"))
        val thr = counts.crossJoin(broadcast(nmin))
          .withColumn("thresh_ppm", expr("n_min * 1000000 div n"))
        val sampled = asn
          .join(broadcast(thr.select(col("cell"), col("thresh_ppm"))), Seq("cell"))
          .filter(pmod(TextFunctions.md5Fingerprint(
            concat(lit("cbal:"), col("vec_id").cast("string"))),
            lit(1000000L)) < col("thresh_ppm"))
          .groupBy(col("cell")).agg(count(lit(1)).as("n_sampled"))
        thr.join(sampled, Seq("cell"), "left")
          .select(col("cell"), col("n").as("n_docs"), col("thresh_ppm"),
            coalesce(col("n_sampled"), lit(0L)).as("n_sampled"))
          .orderBy(col("cell"))
      },
      Some {
        val fp = TextFunctions.md5FingerprintSql(
          "'cbal:' || CAST(vec_id AS VARCHAR)")
        s"""WITH ${LlmPipeline.cellAsnCtesSql()},
          cnt AS (SELECT cell, COUNT(*) AS n FROM asn GROUP BY 1),
          nm AS (SELECT MIN(n) AS n_min FROM cnt),
          thr AS (SELECT cell, n, n_min * 1000000 // n AS thresh_ppm
            FROM cnt, nm),
          acc AS (SELECT asn.cell, COUNT(*) AS n_sampled
            FROM asn JOIN thr USING (cell)
            WHERE $fp % 1000000 < thresh_ppm GROUP BY 1)
          SELECT thr.cell, thr.n AS n_docs, thr.thresh_ppm,
            COALESCE(acc.n_sampled, CAST(0 AS BIGINT)) AS n_sampled
          FROM thr LEFT JOIN acc USING (cell) ORDER BY thr.cell"""
      })

    /* L40: quantizer refinement — one Lloyd/k-means iteration over the
     * shared cell assignment (the training half of the L27/L39 quantizer:
     * the stride-sampled codebook is the INIT, this is the step that turns
     * it into a real k-means codebook; at 100 TB the refined codebook is an
     * input artifact produced by exactly this job). New centroid = per-cell
     * mean of member vectors, component-wise. Engine-portability: raw
     * float sums are order-dependent, so each component quantizes to
     * floor(v·1e6) LONG first (exact, associative), sums exactly, and
     * divides once at the end — the q86 rule applied per dimension. At
     * 100 TB: the corpus is never re-joined or shuffled — the assignment
     * CARRIES the vector through the argmax aggregate
     * ([[LlmPipeline.cellAssignCarryingVec]]), the 1→Dims expansion is
     * map-side, and the (cell, pos) aggregate map-side-combines down to
     * |cells|·Dims rows before the only shuffle. */
    val q105 = GraftQuery(
      "q105_quantizer_refine", "L40 L27 L11",
      (s, d) => {
        val e = LlmPipeline.embeddingFrame(s, d)
        val asn = LlmPipeline.cellAssignCarryingVec(e)
        asn.select(col("cell"), posexplode(col("embedding")))
          .select(col("cell"), (col("pos") + 1).cast("long").as("pos"),
            floor(col("col").cast("double") * lit(1e6)).cast("long").as("vq"))
          .groupBy(col("cell"), col("pos"))
          .agg(count(lit(1)).as("n"), sum(col("vq")).as("sum_vq"))
          .withColumn("centroid",
            (col("sum_vq").cast("double") / col("n").cast("double")) / lit(1e6))
          .select(col("cell"), col("pos"), col("n"), col("centroid"))
          .orderBy(col("cell"), col("pos"))
      },
      Some {
        s"""WITH ${LlmPipeline.cellAsnCtesSql()},
          comp AS (SELECT asn.cell, i AS pos,
              CAST(floor(CAST(e.embedding[i] AS DOUBLE) * 1e6) AS BIGINT) AS vq
            FROM embeddings e JOIN asn USING (vec_id),
              generate_series(1, ${LlmPipeline.Dims}) t(i))
          SELECT cell, pos, COUNT(*) AS n,
            (CAST(SUM(vq) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) / 1e6
              AS centroid
          FROM comp GROUP BY 1, 2 ORDER BY cell, pos"""
      })

    /* L41: hashing-trick linear classifier scoring — the fastText-shaped
     * quality/topic filter every production curation stack runs (CCNet,
     * LLaMA, RefinedWeb): tokenize, hash each token into a fixed feature
     * space (the hashing trick — no vocabulary table to build, ship, or
     * join), score = Σ weight[bucket(token)], threshold → keep/drop. The
     * operator under test is the SCORING infrastructure; the weight vector
     * is a model input in production, so here it derives deterministically
     * from the bucket id (integer LCG-style mix → [-500, 500]) to stay
     * oracle-checkable — same stance as q88's data-derived vocab model.
     * All-integer score: no float threshold to diverge on. At 100 TB:
     * token explode and bucket/weight math are map-side, the per-doc sum
     * map-side-combines, one shuffle on doc_id; weights need no broadcast
     * at all (arithmetic, not a table — a real model rides a |buckets|-row
     * broadcast join instead, same plan shape). */
    val q106 = GraftQuery(
      "q106_hash_classifier", "L41 L9",
      (s, d) => {
        val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        docs.select(col("doc_id"),
            explode(Sketches.words(lower(col("text")))).as("w"))
          .filter(length(col("w")) > 0)
          .withColumn("bucket",
            TextFunctions.md5Fingerprint(col("w")) % lit(1024L))
          .withColumn("weight",
            (col("bucket") * lit(2654435761L)) % lit(1001L) - lit(500L))
          .groupBy(col("doc_id"))
          .agg(count(lit(1)).as("n_tokens"), sum(col("weight")).as("score"))
          .withColumn("label",
            when(col("score") >= 0, lit("keep")).otherwise(lit("drop")))
          .orderBy(col("doc_id"))
      },
      Some {
        val fp = TextFunctions.md5FingerprintSql("w")
        s"""WITH toks AS (SELECT doc_id, w FROM (
              SELECT doc_id,
                unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS w
              FROM documents) WHERE length(w) > 0),
          feats AS (SELECT doc_id,
              ($fp % 1024) * 2654435761 % 1001 - 500 AS weight FROM toks)
          SELECT doc_id, COUNT(*) AS n_tokens,
            CAST(SUM(weight) AS BIGINT) AS score,
            CASE WHEN SUM(weight) >= 0 THEN 'keep' ELSE 'drop' END AS label
          FROM feats GROUP BY 1 ORDER BY doc_id"""
      })

    /* L42: temperature-resampled mixture allocation — the multilingual/
     * multi-source mixing arithmetic (mC4, XLM-R, PaLM): target share per
     * source ∝ n_tokens^(1/τ) with τ=2, so low-resource sources are
     * upsampled relative to their raw share without letting any source
     * dominate. From per-source token counts and a token budget, emit each
     * source's share, target tokens, sampling rate, and epoch count
     * (epochs > 1 ⇒ the source repeats to hit its target — the
     * over-sampling signal that caps τ in practice). Portability: n^(1/2)
     * is IEEE-exact (sqrt is correctly rounded), quantized to
     * floor(·1e6) LONG before the cross-source sum (double sums are
     * order-dependent; longs are exact), then pure integer div — bound:
     * budget·sq < 2^63 holds through corpus ~1e14 tokens at this budget;
     * bigger corpora drop the quantization to 1e3. At 100 TB: per-source
     * counts are one map-side-combined aggregate to |sources| rows;
     * everything after is |sources|-row arithmetic against a broadcast
     * one-row total. */
    val q107 = GraftQuery(
      "q107_temperature_mixture", "L42 L18 L9",
      (s, d) => {
        val budget = 1000000L
        val n = Tables.documents(s, d)
          .select(col("source"),
            TextFunctions.tokenCountBpeIsh(col("text")).cast("long").as("tok"))
          .groupBy(col("source")).agg(sum(col("tok")).as("n_tok"))
          .withColumn("sq",
            floor(sqrt(col("n_tok").cast("double")) * lit(1e6)).cast("long"))
        val total = n.agg(sum(col("sq")).as("total_sq"))
        n.crossJoin(broadcast(total))
          .withColumn("share_ppm", expr("sq * 1000000 div total_sq"))
          .withColumn("target_tok", expr(s"$budget * sq div total_sq"))
          .withColumn("rate_ppm", expr(
            "case when n_tok = 0 then 0 " +
              "else least(1000000, target_tok * 1000000 div n_tok) end"))
          .withColumn("epochs", expr(
            "case when n_tok = 0 then 0 " +
              "else (target_tok + n_tok - 1) div n_tok end"))
          .select(col("source"), col("n_tok"), col("share_ppm"),
            col("target_tok"), col("rate_ppm"), col("epochs"))
          .orderBy(col("source"))
      },
      Some {
        s"""WITH n AS (SELECT source,
              CAST(SUM(${TextFunctions.tokenCountBpeIshSql("text")}) AS BIGINT)
                AS n_tok
            FROM documents GROUP BY 1),
          sq AS (SELECT source, n_tok,
              CAST(floor(sqrt(CAST(n_tok AS DOUBLE)) * 1e6) AS BIGINT) AS sq
            FROM n),
          tot AS (SELECT CAST(SUM(sq) AS BIGINT) AS total_sq FROM sq)
          SELECT source, n_tok, sq * 1000000 // total_sq AS share_ppm,
            1000000 * sq // total_sq AS target_tok,
            CASE WHEN n_tok = 0 THEN 0 ELSE least(1000000,
              (1000000 * sq // total_sq) * 1000000 // n_tok) END AS rate_ppm,
            CASE WHEN n_tok = 0 THEN 0
              ELSE ((1000000 * sq // total_sq) + n_tok - 1) // n_tok END
              AS epochs
          FROM sq, tot ORDER BY source"""
      })

    /* L43: deterministic stratified inspection sample — every curation
     * decision above (thresholds, classifier dials, dedup caps) ends with
     * a human reading sampled documents; the production need is "K docs
     * per source, reproducibly, without sorting the corpus". This is the
     * scalable two-phase top-K-per-group pattern: a broadcast |sources|-row
     * threshold (K·C·1e6 div n ppm, oversample C=8) prefilters map-side to
     * ~K·C rows per stratum, and only those survivors reach the rank
     * window — the global sort a naive row_number() would shuffle never
     * happens. The PREFILTER IS PART OF THE SEMANTICS (a Bernoulli-
     * threshold sample capped at K, the TABLESAMPLE-style contract), so
     * engine and oracle agree exactly at every SF by construction; the
     * salted hash ("samp:" ‖ doc_id) decorrelates membership from the
     * split/shard/dedup hashes, and (h, doc_id) ordering makes ranks
     * tie-free. Strata smaller than K·C pass the threshold wholesale and
     * rank completely. */
    val q108 = GraftQuery(
      "q108_stratified_sample", "L43 L14 O2",
      (s, d) => {
        val k = 5L
        val over = 8L
        val docs = Tables.documents(s, d)
        val counts = docs.groupBy(col("source")).agg(count(lit(1)).as("n"))
          .withColumn("thr_ppm",
            least(lit(1000000L), expr(s"${k * over} * 1000000 div n")))
        val pre = docs
          .withColumn("h", TextFunctions.md5Fingerprint(
            concat(lit("samp:"), col("doc_id").cast("string"))) % lit(1000000L))
          .join(broadcast(counts), Seq("source"))
          .filter(col("h") < col("thr_ppm"))
        pre.withColumn("rank", row_number().over(
            Window.partitionBy(col("source"))
              .orderBy(col("h"), col("doc_id"))))
          .filter(col("rank") <= k)
          .select(col("source"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("h"))
          .orderBy(col("source"), col("rank"))
      },
      Some {
        val fp = TextFunctions.md5FingerprintSql(
          "'samp:' || CAST(doc_id AS VARCHAR)")
        s"""WITH n AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
          h AS (SELECT source, doc_id, $fp % 1000000 AS h FROM documents),
          pre AS (SELECT h.source, h.doc_id, h.h
            FROM h JOIN n USING (source)
            WHERE h.h < least(1000000, 40 * 1000000 // n.n)),
          ranked AS (SELECT source, doc_id, h,
              row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
                AS rank
            FROM pre)
          SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, h
          FROM ranked WHERE rank <= 5 ORDER BY source, rank"""
      })

    Seq(q98, q99, q100, q101, q102, q103, q104, q105, q106, q107, q108)
  }
}
