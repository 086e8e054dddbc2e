package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Retrieval / ranking operators (SURVEY §2.11a, L95–L97 + L104):
  *
  *  - L95 BM25 inverted-index top-k retrieval      → q163 (+ q172)
  *  - L96 late-interaction (maxsim) reranking      → q164
  *  - L97 matryoshka truncated-dim recall audit    → q165
  *  - L104 reciprocal-rank-fusion hybrid retrieval → q172
  *
  * The retrieval stack a training-data pipeline runs against its own
  * corpus: BM25 for lexical lookup (benchmark decontamination, targeted
  * subset mining), late-interaction scoring for higher-fidelity
  * reranking of a candidate page, truncated-dim ("matryoshka") search
  * to buy back index cost, and rank fusion to combine the lexical and
  * dense lists into one retrieval answer.
  *
  * Determinism: all scores ride integer ladders — BM25 on the L63/L86
  * ilog2 + Q10 fixed-point scheme (no libm), maxsim/cosine as
  * fixed-order float64 chains quantized with a single `floor(x·10^k)`
  * before any reordering aggregate (the q86 rule) — so engine/oracle
  * agreement is bit-exact by construction.
  */
object RetrievalOps {

  /** BM25 dials in Q10 fixed point: k1 = 1.2, b = 0.75, one = 1.0. */
  private[queries] val BmK1 = 1228L
  private[queries] val BmB = 768L
  private[queries] val BmQ = 1024L

  /** idf numerator scale (the L86 NbShift convention, 2^20). */
  private[queries] val IdfShift = 1048576L

  private[queries] val BmTopK = 10
  private[queries] val MaxSimTopK = 5
  private[queries] val FuseDepth = 20
  private[queries] val RecallK = 10

  /** The planted benchmark queries: word bigrams with corpus df ≈ 5–8%
    * (the indexing unit is the word 2-gram — with a 31-word synthetic
    * vocabulary, unigram df saturates near |corpus| and idf would
    * floor to a constant; bigrams keep the idf ladder informative).
    * Each qid also has a dense form: the exemplar embedding
    * vec_id = qid·50 (the q38/q125 doc_id == vec_id alignment).
    */
  private[queries] val BenchQueries: Seq[(Long, Seq[String])] = Seq(
    0L -> Seq("spark join", "window merge"),
    1L -> Seq("fast scan", "slow query"),
    2L -> Seq("customer order", "data stream"),
    3L -> Seq("the table", "vector hash"))

  private def ilog2(c: org.apache.spark.sql.Column) = Sketches.ilog2(c)
  private def ilog2Sql(e: String): String = Sketches.ilog2Sql(e)

  /** The flat benchmark gram list (streaming-form spec probes). */
  private[graft] def benchGrams: Seq[String] = BenchQueries.flatMap(_._2)

  /** Shared BM25 scoring chain → (qid, doc_id, score).
    *
    * One corpus pass builds the postings — per-(doc, bigram) tf plus the
    * gram-count doc length — then df and corpus totals are vocab-sized /
    * 1-row aggregates that BROADCAST back against the postings restricted
    * to the (tiny, broadcast) query-term list. Scoring is
    * idf · tf-saturation in integers:
    *
    *   idf    = ilog2(((N − df + 1) · 2^20) div (df + 1))
    *   tfn    = (tf·(k1+1)_Q10·2^20) div (tf·2^20
    *                + k1_Q10·((1−b)_Q10 + (b_Q10·dl) div avgdl))
    *            — numerator Q30 over denominator Q20 → tfn is Q10:
    *            1024 at (tf=1, dl=avgdl), saturating to (k1+1) = 2252
    *            as tf grows (both denominator terms share the Q20
    *            scale; an earlier cut left the tf term at Q10, which
    *            underweighted tf 1024× and effectively disabled
    *            saturation — ADVICE r15)
    *   score  = Σ_terms idf · tfn
    *
    * At 100 TB: the postings aggregate is map-side combined on
    * (doc_id, gram); df is a |vocab|-row aggregate; the query-term join
    * prunes the postings to matching grams BEFORE any per-query work, so
    * the per-(qid, doc) aggregate only sees candidate docs. The final
    * top-k window partitions by qid — at a production query load the
    * per-qid candidate list is capped by a score threshold first (the
    * L15 eviction-heap note).
    */
  private[graft] def bm25Scored(s: SparkSession, d: String): DataFrame = {
    // non-distinct bigrams via the native graft_grams node: one split per
    // row, fully codegen-resident (the lambda form was a CodegenFallback
    // island whose split CollapseProject re-inlined O(dl)× per row —
    // measured 15.5 s → 1.5 s at sf0.1)
    val gd = Tables.documents(s, d)
      .select(col("doc_id"),
        call_function("graft_grams", col("text"), lit(2)).as("g"))
    val post = gd
      .select(col("doc_id"), size(col("g")).cast("long").as("dl"),
        explode(col("g")).as("gram"))
      .groupBy(col("doc_id"), col("dl"), col("gram"))
      .agg(count(lit(1)).as("tf"))
    val st = post.groupBy(col("gram")).agg(count(lit(1)).as("df"))
    val tot = gd.agg(count(lit(1)).as("n"),
      sum(size(col("g")).cast("long")).as("sdl"))
    val qf = s.range(1).select(explode(array(
        BenchQueries.flatMap { case (q, ts) => ts.map(t =>
          struct(lit(q).as("qid"), lit(t).as("gram"))) }: _*)).as("x"))
      .select(col("x.qid").as("qid"), col("x.gram").as("gram"))
    post.join(broadcast(qf), Seq("gram"))
      .join(broadcast(st), Seq("gram"))
      .crossJoin(broadcast(tot))
      .withColumn("idf",
        ilog2(expr(s"((n - df + 1) * $IdfShift) div (df + 1)")))
      .withColumn("tfn", expr(
        s"(tf * ${BmK1 + BmQ} * $BmQ * $BmQ) div (tf * $BmQ * $BmQ + " +
          s"$BmK1 * (($BmQ - $BmB) + ($BmB * dl) div (sdl div n)))"))
      .groupBy(col("qid"), col("doc_id"))
      .agg(sum(col("idf") * col("tfn")).as("score"))
  }

  /** DuckDB twin of [[bm25Scored]] as CTEs ending in
    * `sc_bm(qid, doc_id, score)`.
    */
  private[queries] def bm25CtesSql: String = {
    val ws = Sketches.wordsSql("text")
    val vals = BenchQueries.flatMap { case (q, ts) =>
      ts.map(t => s"($q, '$t')") }.mkString(", ")
    val idf = ilog2Sql(s"((tot.n - st.df + 1) * $IdfShift) // (st.df + 1)")
    val tfn = s"(post.tf * ${BmK1 + BmQ} * $BmQ * $BmQ) // " +
      s"(post.tf * $BmQ * $BmQ + " +
      s"$BmK1 * (($BmQ - $BmB) + ($BmB * post.dl) // (tot.sdl // tot.n)))"
    s"""gd AS (SELECT doc_id,
          CASE WHEN len($ws) >= 2 THEN
            list_transform(range(1, len($ws)),
              i -> ($ws)[i] || ' ' || ($ws)[i+1])
          ELSE CAST([] AS VARCHAR[]) END AS g
        FROM documents),
      pe AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS dl,
          unnest(g) AS gram FROM gd),
      post AS (SELECT doc_id, dl, gram, CAST(COUNT(*) AS BIGINT) AS tf
        FROM pe GROUP BY 1, 2, 3),
      st AS (SELECT gram, CAST(COUNT(*) AS BIGINT) AS df
        FROM post GROUP BY 1),
      tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(len(g) AS BIGINT)) AS BIGINT) AS sdl FROM gd),
      qt AS (SELECT CAST(qid AS BIGINT) AS qid, gram
        FROM (VALUES $vals) AS t(qid, gram)),
      sc_bm AS (SELECT qt.qid, post.doc_id,
          CAST(SUM($idf * ($tfn)) AS BIGINT) AS score
        FROM post JOIN qt ON qt.gram = post.gram
          JOIN st ON st.gram = post.gram CROSS JOIN tot
        GROUP BY 1, 2)"""
  }

  /** L96 maxsim kernel at an explicit query stride (queries =
    * vec_id % stride == 0). The registered q164 bakes stride 50 (its
    * oracle sees every pair); [[maxsimRerankAdaptive]] is the
    * production default with the [[Sketches.queryStrideFor]] budget
    * dial.
    */
  private[graft] def maxsimRerank(s: SparkSession, d: String,
      stride: Long): DataFrame = {
    // one native Σᵢ maxⱼ pass per (query, doc) pair
    // (plans/MaxSimExpression — VERDICT r18 #3: the composed form
    // exploded both sides 8× into 64 rows per pair through two pair-
    // keyed hash aggregates; this keeps the pair row count at 1 and the
    // token loops inside whole-stage codegen), bit-identical to the
    // exploded chain and the DuckDB twin
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val q = e.filter(col("vec_id") % stride === 0)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
    broadcast(q)
      .join(e.select(col("vec_id").as("did"), col("embedding").as("de")),
        col("did") =!= col("qid"))
      .select(col("qid"), col("did"),
        call_function("graft_maxsim", col("qe"), col("de"),
          lit(8), lit(8)).as("score_u"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("score_u").desc, col("did"))))
      .filter(col("rank") <= MaxSimTopK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("did"), col("score_u"))
      .orderBy(col("qid"), col("rank"))
  }

  /** L97 matryoshka-audit kernel at an explicit query stride — same
    * registered-floor/adaptive-default split as [[maxsimRerank]].
    */
  private[graft] def matryoshkaAgreement(s: SparkSession, d: String,
      stride: Long): DataFrame = {
    val dims = Seq(8, 16, 32, 64)
    val e0 = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val withNorms = dims.foldLeft(e0)((f, p) =>
      f.withColumn(s"n$p", Sketches.norm(col("embedding"), p)))
    val q = withNorms.select(col("vec_id").as("qid"),
      col("embedding").as("qe"),
      col("n8").as("qn8"), col("n16").as("qn16"),
      col("n32").as("qn32"), col("n64").as("qn64"))
      .filter(col("qid") % stride === 0)
    val pairs = dims.foldLeft(
      broadcast(q).join(withNorms, col("vec_id") =!= col("qid")))(
      (f, p) => f.withColumn(s"c${p}_u",
        floor(Sketches.cosineFromParts(
          Sketches.dot(col("qe"), col("embedding"), p),
          col(s"qn$p"), col(s"n$p")) * lit(1e9))))
    val rk = dims.foldLeft(
      pairs.select(col("qid") +: col("vec_id").as("did") +:
        dims.map(p => col(s"c${p}_u")): _*))(
      (f, p) => f.withColumn(s"rn$p", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col(s"c${p}_u").desc, col("did")))))
    val qs = rk.select(col("qid")).distinct()
    val per = Seq(8, 16, 32).map { p =>
      val ov = rk.filter(col("rn64") <= RecallK && col(s"rn$p") <= RecallK)
        .groupBy(col("qid")).agg(count(lit(1)).as("ov"))
      qs.join(ov, Seq("qid"), "left")
        .select(coalesce(col("ov"), lit(0L)).as("ov"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("ov")).as("sum_overlap"),
          min(col("ov")).as("min_overlap"))
        .select(lit(p.toLong).as("dims"), col("n_queries"),
          col("sum_overlap"), col("min_overlap"),
          expr(s"sum_overlap * 1000000 div (n_queries * $RecallK)")
            .as("mean_recall_ppm"))
    }
    per.reduce(_.unionByName(_)).orderBy(col("dims"))
  }

  private val strideMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  /** Query stride resolved from the corpus row count read from parquet
    * footers ([[Tables.footerRowCount]]: zero Spark jobs at plan-build
    * time, VERDICT r18 #2), memoized per immutable fixture dir;
    * production resolves it from catalog stats.
    */
  private[graft] def queryStride(s: SparkSession, d: String): Long =
    strideMemo.computeIfAbsent(d, _ => java.lang.Long.valueOf(
      Sketches.queryStrideFor(
        Tables.footerRowCount(s, d, "embeddings")))).longValue()

  /** Drop every memoized stride. The memo key is the directory PATH, so
    * a dir whose contents are regenerated at a different scale within
    * one JVM (ScaleRehearsal rewrites `target/scaleN` between modes)
    * would otherwise keep serving the stale stride and mis-size the
    * adaptive query budget (ADVICE r15) — any in-process fixture
    * rebuild must call this right after writing.
    */
  private[graft] def resetStrideMemo(): Unit = strideMemo.clear()

  /** Adaptive-default forms — the production query budget. */
  private[graft] def maxsimRerankAdaptive(s: SparkSession,
      d: String): DataFrame = maxsimRerank(s, d, queryStride(s, d))
  private[graft] def matryoshkaAgreementAdaptive(s: SparkSession,
      d: String): DataFrame = matryoshkaAgreement(s, d, queryStride(s, d))

  /** Two-stage retrieval composition — the production shape the L96
    * scaladoc promises: a cheap first stage (L95 BM25, depth
    * `firstStageDepth`) proposes candidates, the expensive late-
    * interaction scorer reranks ONLY those. Queries are the benchmark
    * qids; each qid's dense form is its exemplar embedding
    * (vec_id = qid·50, the q172 alignment), candidates join their
    * vectors on the doc_id == vec_id alignment (docs without vectors
    * drop out). Output: top-`MaxSimTopK` per qid by exact maxsim over
    * the candidate set, carrying the first-stage rank as provenance.
    * At 100 TB the candidate frame is |queries|·depth rows — the
    * maxsim token join is broadcast-sized no matter the corpus, which
    * is the entire point of staging. Spec-proven (RerankPipelineSpec):
    * candidate containment, exact Scala score replay, ordering.
    */
  private[graft] def rerankPipeline(s: SparkSession, d: String,
      firstStageDepth: Int = FuseDepth): DataFrame = {
    val cand = bm25Scored(s, d)
      .withColumn("rs", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .filter(col("rs") <= firstStageDepth)
      .select(col("qid"), col("doc_id"), col("rs"))
    val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val qe = e.filter(col("vec_id") % 50 === 0 && col("vec_id") <= 150)
      .select(expr("vec_id div 50").as("qid"), col("embedding").as("qe"))
    // same native single-pass scorer as maxsimRerank: candidates join
    // their doc vectors by id, exemplars broadcast, one row per pair
    broadcast(cand)
      .join(e.select(col("vec_id").as("doc_id"), col("embedding").as("de")),
        Seq("doc_id"))
      .join(broadcast(qe), Seq("qid"))
      .select(col("qid"), col("doc_id"), col("rs"),
        call_function("graft_maxsim", col("qe"), col("de"),
          lit(8), lit(8)).as("score_u"))
      .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
        .orderBy(col("score_u").desc, col("doc_id"))))
      .filter(col("rank") <= MaxSimTopK)
      .select(col("qid"), col("rank").cast("long").as("rank"),
        col("doc_id"), col("score_u"), col("rs").as("first_stage_rank"))
      .orderBy(col("qid"), col("rank"))
  }

  def all: Seq[GraftQuery] = {

    /* L95: BM25 top-k retrieval over an inverted index — the lexical
     * retrieval primitive (benchmark decontamination lookups, targeted
     * subset mining, eval-set neighbor pulls all start here). The gate
     * ranks 4 planted bigram queries over the whole corpus and checks
     * the full (rank, doc, score) lists — one wrong tf, df, doc length
     * or a broken tie-break reorders some list. */
    val q163 = GraftQuery(
      "q163_bm25_topk", "L95 L23 L9",
      (s, d) => {
        bm25Scored(s, d)
          .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("score").desc, col("doc_id"))))
          .filter(col("rank") <= BmTopK)
          .select(col("qid"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("score"))
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        s"""WITH $bm25CtesSql,
          rk AS (SELECT *, row_number() OVER
              (PARTITION BY qid ORDER BY score DESC, doc_id) AS rank
            FROM sc_bm)
          SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, score
          FROM rk WHERE rank <= $BmTopK ORDER BY qid, rank"""
      })

    /* L96: late-interaction (maxsim) reranking — the ColBERT scoring
     * shape: each embedding is read as 8 token sub-vectors of 8 dims,
     * score(q, d) = Σ_i max_j <q_i, d_j>. The score is ONE native loop
     * expression per (query, doc) pair (plans/MaxSimExpression): the
     * query side broadcasts, the doc side streams map-side, and both
     * token loops run inside whole-stage codegen — no row fan-out, no
     * pair-keyed aggregate (the previous composed form exploded both
     * sides 8× into 64 rows per pair through two hash aggregates —
     * VERDICT r18 #3). The per-token max is quantized to µ-units BEFORE
     * the cross-token sum so the final score is an order-free integer
     * sum (the q86 rule), bit-identical to the composed chain and the
     * oracle's exploded formulation. At 100 TB the doc side stays
     * partitioned by vec_id and only candidate pairs from a first-stage
     * retriever are scored (rerankPipeline, RerankPipelineSpec) — here
     * the candidate set is the full corpus so the oracle sees every
     * pair. */
    val q164 = GraftQuery(
      "q164_maxsim_rerank", "L96 L6 L27",
      (s, d) => maxsimRerank(s, d, 50L),
      Some {
        val dot = Sketches.dotSql("qt.tok", "dt.tok", 8)
        s"""WITH tk AS (SELECT vec_id, t.i AS i,
              list_slice(embedding, t.i*8+1, t.i*8+8) AS tok
            FROM embeddings, range(8) AS t(i)),
          qt AS (SELECT vec_id AS qid, i, tok FROM tk WHERE vec_id % 50 = 0),
          dt AS (SELECT vec_id AS did, tok FROM tk),
          mx AS MATERIALIZED (SELECT qt.qid, dt.did, qt.i,
              CAST(floor(MAX($dot) * 1000000) AS BIGINT) AS mx_u
            FROM qt JOIN dt ON dt.did <> qt.qid GROUP BY 1, 2, 3),
          sc AS MATERIALIZED (SELECT qid, did,
              CAST(SUM(mx_u) AS BIGINT) AS score_u FROM mx GROUP BY 1, 2),
          rk AS (SELECT *, row_number() OVER
              (PARTITION BY qid ORDER BY score_u DESC, did) AS rank
            FROM sc)
          SELECT qid, CAST(rank AS BIGINT) AS rank, did, score_u
          FROM rk WHERE rank <= $MaxSimTopK ORDER BY qid, rank"""
      })

    /* L97: matryoshka truncated-dim recall audit — measure what top-10
     * recall a prefix-p cosine (p ∈ {8, 16, 32}) retains against the
     * full 64-dim ranking, per query. This is the governance number
     * behind truncating stored vectors (a 4× index-size cut is free iff
     * recall holds). One pair pass computes all four cosines (the
     * prefix dot is a strict prefix of the full dot's accumulation
     * chain), quantized to 10^-9 units; the four rankings window over
     * stored integer columns; overlap joins the ≤10 ranks. At 100 TB
     * the pair set comes from the ANN index (q70), not a cross join —
     * the audit math downstream is unchanged (the q158 protocol). */
    val q165 = GraftQuery(
      "q165_matryoshka_agreement", "L97 L90 L6",
      (s, d) => matryoshkaAgreement(s, d, 50L),
      Some {
        val cos = Seq(8, 16, 32, 64).map { p =>
          val c = Sketches.cosineSql(
            Sketches.dotSql("q.embedding", "e.embedding", p),
            Sketches.normSql("q.embedding", p),
            Sketches.normSql("e.embedding", p))
          s"CAST(floor(($c) * 1000000000) AS BIGINT) AS c${p}_u"
        }.mkString(",\n              ")
        val rns = Seq(8, 16, 32, 64).map(p =>
          s"row_number() OVER (PARTITION BY qid ORDER BY c${p}_u DESC, did)" +
            s" AS rn$p").mkString(",\n              ")
        val branches = Seq(8, 16, 32).map(p =>
          s"""ov$p AS (SELECT qid, CAST(COUNT(*) AS BIGINT) AS ov FROM rk
              WHERE rn64 <= $RecallK AND rn$p <= $RecallK GROUP BY 1),
            a$p AS (SELECT CAST($p AS BIGINT) AS dims,
              CAST(COUNT(*) AS BIGINT) AS n_queries,
              CAST(SUM(COALESCE(ov, 0)) AS BIGINT) AS sum_overlap,
              CAST(MIN(COALESCE(ov, 0)) AS BIGINT) AS min_overlap
              FROM qs LEFT JOIN ov$p USING (qid))""").mkString(",\n          ")
        s"""WITH sc AS MATERIALIZED (SELECT q.vec_id AS qid,
              e.vec_id AS did,
              $cos
            FROM embeddings q JOIN embeddings e ON e.vec_id <> q.vec_id
            WHERE q.vec_id % 50 = 0),
          rk AS (SELECT qid, did,
              $rns
            FROM sc),
          qs AS (SELECT DISTINCT qid FROM sc),
          $branches
          SELECT dims, n_queries, sum_overlap, min_overlap,
            sum_overlap * 1000000 // (n_queries * $RecallK)
              AS mean_recall_ppm
          FROM (SELECT * FROM a8 UNION ALL SELECT * FROM a16
            UNION ALL SELECT * FROM a32) ORDER BY dims"""
      })

    /* L104: reciprocal-rank-fusion hybrid retrieval — fuse the BM25
     * lexical list (L95, text form of each query) with the dense cosine
     * list (the query's exemplar embedding, vec_id = qid·50) by
     * RRF(d) = Σ_lists 1/(60 + rank), in integer µ-units
     * (10^6 div (60+rank)); docs missing from a list contribute 0.
     * Rank fusion needs ONLY ranks — no score calibration across
     * scorers — which is why it survives integerization exactly. Both
     * source lists cut at depth 20; the fused top-10 reports each doc's
     * provenance (its rank in each list, −1 = absent). At 100 TB both
     * lists come from their indexes (inverted / ANN); the fusion join is
     * per-qid on ≤ 2·depth rows — driver-free and broadcastable. */
    val q172 = GraftQuery(
      "q172_rrf_hybrid_fusion", "L104 L95 L6",
      (s, d) => {
        val sparse = bm25Scored(s, d)
          .withColumn("rs", row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("score").desc, col("doc_id"))).cast("long"))
          .filter(col("rs") <= FuseDepth)
          .select(col("qid"), col("doc_id"), col("rs"))
        val e = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"),
          Sketches.norm(col("embedding"), 64).as("nrm"))
        val ex = e.filter(col("vec_id").isin(0L, 50L, 100L, 150L))
          .select(expr("vec_id div 50").as("qid"),
            col("embedding").as("qe"), col("nrm").as("qn"))
        val dense = broadcast(ex).crossJoin(e)
          .withColumn("cos_u", floor(Sketches.cosineFromParts(
            Sketches.dot(col("qe"), col("embedding"), 64),
            col("qn"), col("nrm")) * lit(1e9)))
          .withColumn("rd", row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("cos_u").desc, col("vec_id"))).cast("long"))
          .filter(col("rd") <= FuseDepth)
          .select(col("qid"), col("vec_id").as("doc_id"), col("rd"))
        sparse.join(dense, Seq("qid", "doc_id"), "full")
          .withColumn("rrf_u",
            coalesce(expr("1000000 div (60 + rs)"), lit(0L)) +
              coalesce(expr("1000000 div (60 + rd)"), lit(0L)))
          .withColumn("rank", row_number().over(Window.partitionBy(col("qid"))
            .orderBy(col("rrf_u").desc, col("doc_id"))))
          .filter(col("rank") <= BmTopK)
          .select(col("qid"), col("rank").cast("long").as("rank"),
            col("doc_id"), col("rrf_u"),
            coalesce(col("rs"), lit(-1L)).as("rank_sparse"),
            coalesce(col("rd"), lit(-1L)).as("rank_dense"))
          .orderBy(col("qid"), col("rank"))
      },
      Some {
        val cos = Sketches.cosineSql(
          Sketches.dotSql("q.embedding", "e.embedding", 64),
          Sketches.normSql("q.embedding", 64),
          Sketches.normSql("e.embedding", 64))
        s"""WITH $bm25CtesSql,
          spr AS (SELECT qid, doc_id, CAST(rs AS BIGINT) AS rs FROM
            (SELECT qid, doc_id, row_number() OVER
              (PARTITION BY qid ORDER BY score DESC, doc_id) AS rs
             FROM sc_bm) WHERE rs <= $FuseDepth),
          dp0 AS MATERIALIZED (SELECT q.vec_id // 50 AS qid,
              e.vec_id AS doc_id,
              CAST(floor(($cos) * 1000000000) AS BIGINT) AS cos_u
            FROM embeddings q CROSS JOIN embeddings e
            WHERE q.vec_id IN (0, 50, 100, 150)),
          dpr AS (SELECT qid, doc_id, CAST(rd AS BIGINT) AS rd FROM
            (SELECT qid, doc_id, row_number() OVER
              (PARTITION BY qid ORDER BY cos_u DESC, doc_id) AS rd
             FROM dp0) WHERE rd <= $FuseDepth),
          fu AS (SELECT COALESCE(s.qid, d.qid) AS qid,
              COALESCE(s.doc_id, d.doc_id) AS doc_id, s.rs, d.rd,
              COALESCE(1000000 // (60 + s.rs), 0) +
                COALESCE(1000000 // (60 + d.rd), 0) AS rrf_u
            FROM spr s FULL OUTER JOIN dpr d
              ON d.qid = s.qid AND d.doc_id = s.doc_id),
          rk AS (SELECT *, row_number() OVER
              (PARTITION BY qid ORDER BY rrf_u DESC, doc_id) AS rank
            FROM fu)
          SELECT qid, CAST(rank AS BIGINT) AS rank, doc_id, rrf_u,
            COALESCE(rs, -1) AS rank_sparse, COALESCE(rd, -1) AS rank_dense
          FROM rk WHERE rank <= $BmTopK ORDER BY qid, rank"""
      })

    Seq(q163, q164, q165, q172)
  }
}
