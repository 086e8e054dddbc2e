package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Pipeline-health audit operators (SURVEY §2.11a, L150–L152 + L155):
  *
  *  - L150 dedup-bias audit                 → q218
  *  - L151 embedding-norm health profile    → q219
  *  - L152 near-dup transitivity audit      → q220
  *  - L155 split-balance audit              → q223
  *
  * Audits of assumptions the pipeline's own stages quietly
  * make: that deduplication removes a REPRESENTATIVE slice of the
  * corpus (it usually does not — duplicated content skews toward
  * boilerplate, so dedup shifts the surviving quality/length mix,
  * and the bias should be measured, not assumed); that embedding
  * batches are healthy (collapsed or exploded vector norms are the
  * classic symptom of a bad encoder run, invisible to the spectral
  * reads L108/L131 which normalize by the Gram scale); and that
  * near-duplicate similarity is transitive enough for L19's
  * connected-components clustering to be sound (components merge
  * docs connected through middles — the audit measures how often
  * a wedge's endpoints actually meet the verify threshold).
  *
  * Determinism: classes and medians ride (value, id) total orders,
  * norms floor to integer micro-units before any aggregation (the
  * q103 floor-sum convention), and the transitivity verdicts reuse
  * the registered verify's own float-jaccard comparison.
  */
object HealthAuditOps {

  /** L150 cluster-size class boundaries. */
  private[queries] val SmallClusterMax = 3L

  /** L151 outlier fence: a norm is flagged when it is more than 2×
    * the label median or less than half of it (in micro-units).
    */
  private[queries] val NormFenceNum = 2L

  /** L152 per-node degree cap for the wedge build: the upstream
    * hot-bucket guard bounds BUCKET size (10k), not verified-graph
    * DEGREE — a mirror-heavy corpus can hold a 10k-member verified
    * dup clique below that cap, whose Σdeg² wedge enumeration is
    * ~10⁸ rows (ADVICE r16). Each node keeps its d smallest
    * neighbors by id (a deterministic total order — edges are
    * unique pairs), so wedges are ≤ |nodes|·d²/2 by construction;
    * capped_nodes rides the gate as the coverage dial.
    */
  private[queries] val WedgeDegreeCap = 64L

  /** L151's per-vector norm frame (label, vec_id, nu µ-units) —
    * factored so the L159 sketched form (q227) consumes the
    * REGISTERED norm ladder, not a copy.
    */
  private[queries] def normFrame(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame =
    Tables.embeddings(s, d)
      .select(col("label").cast("long").as("label"),
        col("vec_id"),
        floor(Sketches.norm(col("embedding"), LlmPipeline.Dims) *
          lit(1e6)).cast("long").as("nu"))

  /** DuckDB twin of [[normFrame]] as a CTE `nu(label, vec_id, nu)`. */
  private[queries] def normFrameCtesSql: String = {
    val nrm = Sketches.normSql("embedding", LlmPipeline.Dims)
    s"""nu AS (SELECT CAST(label AS BIGINT) AS label, vec_id,
          CAST(floor(($nrm) * 1e6) AS BIGINT) AS nu
        FROM embeddings)"""
  }

  def all: Seq[GraftQuery] = {

    /* L150: dedup-bias audit — what KIND of documents does dedup
     * remove? The L1/L92 stages drop or downweight duplicate-cluster
     * members as if they were a uniform sample of the corpus; in real
     * web data duplicated content skews toward boilerplate (short,
     * low-quality, few sources), so deduplication silently shifts the
     * surviving distribution. The audit classes every doc by its
     * exact-cluster size (unique / small 2–3 / large 4+, the
     * registered q160/q202 kernel) and reports each class's count,
     * source breadth, trained-quality mean (the registered L86
     * score) and length mean — the measured evidence for whether a
     * dedup pass needs a quality-reweighting companion (L92) or not.
     * At 100 TB: the cluster and score kernels' own passes + one
     * doc-keyed join + a 3-row rollup. */
    val q218 = GraftQuery(
      "q218_dedup_bias_audit", "L150 L92 L86 L36",
      (s, d) => {
        val cs = WebCorpusOps.clusterSizes(s, d)
          .select(col("doc_id"), col("n_chars"),
            when(col("csz") === 1, "unique")
              .when(col("csz") <= SmallClusterMax, "small")
              .otherwise("large").as("dup_class"))
        val sc = TrainedFilterOps.nbDocScores(s, d)
          .select(col("doc_id"), col("source"), col("pos"), col("score"))
        cs.join(sc, Seq("doc_id"))
          .groupBy(col("dup_class"))
          .agg(count(lit(1)).as("n_docs"),
            count_distinct(col("source")).as("n_sources"),
            sum(col("pos")).as("n_plant"),
            expr("sum(score) div count(1)").as("avg_score"),
            expr("sum(n_chars) div count(1)").as("avg_chars"))
          .orderBy(col("dup_class"))
      },
      Some {
        s"""WITH ${WebCorpusOps.clusterCtesSql},
          ${TrainedFilterOps.nbScoreCtesSql},
          cl2 AS (SELECT cj.doc_id, cj.n_chars,
              CASE WHEN cj.csz = 1 THEN 'unique'
                WHEN cj.csz <= $SmallClusterMax THEN 'small'
                ELSE 'large' END AS dup_class
            FROM cj),
          jo AS (SELECT cl2.dup_class, cl2.n_chars, sc.source,
              sc.pos, sc.score
            FROM cl2 JOIN sc ON sc.doc_id = cl2.doc_id)
          SELECT dup_class, CAST(COUNT(*) AS BIGINT) AS n_docs,
            CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
            CAST(SUM(pos) AS BIGINT) AS n_plant,
            CAST(SUM(score) AS BIGINT) // COUNT(*) AS avg_score,
            CAST(SUM(n_chars) AS BIGINT) // COUNT(*) AS avg_chars
          FROM jo GROUP BY 1 ORDER BY dup_class"""
      })

    /* L151: embedding-norm health profile — the encoder-run health
     * read the spectral audits can't see: L108/L131 normalize by the
     * Gram scale, so a batch of collapsed (near-zero) or exploded
     * vectors shifts the spectrum they analyze without tripping them.
     * Vector norms floor to integer micro-units (the q103 floor-sum
     * convention — the float part is the engine-parity-established
     * left-associated dot + IEEE sqrt), then everything is integer:
     * per label, count, mean, exact median (the (norm_u, vec_id)
     * order statistic) and the 2×-fence outlier count. At 100 TB:
     * one embeddings scan; the rank window partitions by label; the
     * sketch-median production form is REGISTERED as q227 (L159,
     * spec-pinned equal at the gated fixtures). */
    val q219 = GraftQuery(
      "q219_embedding_norm_health", "L151 L103 L131",
      (s, d) => {
        val n = normFrame(s, d)
        val ranked = n
          .withColumn("rk", row_number().over(Window
            .partitionBy(col("label"))
            .orderBy(col("nu"), col("vec_id"))).cast("long"))
          .withColumn("nn", count(lit(1))
            .over(Window.partitionBy(col("label"))).cast("long"))
        val med = ranked.groupBy(col("label"))
          .agg(max(when(col("rk") === expr("(nn + 1) div 2"),
            col("nu"))).as("med_u"))
        ranked.join(broadcast(med), Seq("label"))
          .groupBy(col("label"))
          .agg(count(lit(1)).as("n_vecs"),
            expr("sum(nu) div count(1)").as("mean_norm_u"),
            max(col("med_u")).as("median_norm_u"),
            min(col("nu")).as("min_norm_u"),
            max(col("nu")).as("max_norm_u"),
            sum(when(col("nu") > col("med_u") * NormFenceNum ||
              col("nu") * NormFenceNum < col("med_u"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("label"))
      },
      Some {
        s"""WITH $normFrameCtesSql,
          rk AS (SELECT *,
              CAST(row_number() OVER (PARTITION BY label
                ORDER BY nu, vec_id) AS BIGINT) AS rk,
              CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS nn
            FROM nu),
          md AS (SELECT label,
              MAX(CASE WHEN rk = (nn + 1) // 2 THEN nu END) AS med_u
            FROM rk GROUP BY 1)
          SELECT rk.label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
            CAST(SUM(rk.nu) AS BIGINT) // COUNT(*) AS mean_norm_u,
            CAST(MAX(md.med_u) AS BIGINT) AS median_norm_u,
            CAST(MIN(rk.nu) AS BIGINT) AS min_norm_u,
            CAST(MAX(rk.nu) AS BIGINT) AS max_norm_u,
            CAST(SUM(CASE WHEN rk.nu > md.med_u * $NormFenceNum
              OR rk.nu * $NormFenceNum < md.med_u THEN 1 ELSE 0 END)
              AS BIGINT) AS n_outliers
          FROM rk JOIN md ON md.label = rk.label
          GROUP BY 1 ORDER BY rk.label"""
      })

    /* L152: near-dup transitivity audit — L19's connected-components
     * clustering treats near-duplication as transitive: if a~b and
     * b~c the component merges all three, whether or not a~c holds.
     * Similarity is NOT transitive in general (two edits in different
     * directions compound), and how often the assumption fails on
     * THIS corpus is exactly the semantic slack of every
     * cluster-level decision (L21 keeper choice, L92 weights, L57
     * histograms). The audit enumerates the wedges of the REGISTERED
     * verified-pair graph (q36's kernel at its baked geometry),
     * re-verifies every induced endpoint pair with the same exact
     * shingle Jaccard and the same 0.8 threshold, and reports wedge
     * and closure counts. At 100 TB: edges are verified near-dups
     * (sparse by construction — banding + the hot-bucket guard);
     * wedges are Σ deg² over that sparse graph UNDER the per-node
     * degree cap ([[WedgeDegreeCap]] smallest neighbors by id —
     * deterministic, reported via capped_nodes so a capped audit is
     * visibly a sample, not a census), and the re-verify joins
     * shingle rows for induced pairs only. */
    val q220 = GraftQuery(
      "q220_transitivity_audit", "L152 L19 L4",
      (s, d) => {
        // r19 note: the audit reads the verified edge set five ways and
        // the shingle frame four ways, and the tempting sharing "fixes"
        // both measured WORSE than recomputation here. A lazy persist on
        // the reused frames was catastrophic in suite context (13.9 s vs
        // 6.9 s baseline: AQE materializes independent stages
        // concurrently, and concurrent scanners of a not-yet-populated
        // InMemoryRelation each recompute the whole kernel while
        // fighting for memory); a doc_id repartition to force exchange
        // sharing measured ~5.4 s vs ~4.1 s for the plain recomputing
        // form (the map-side shingle pass is cheaper than shuffling it).
        // So: plain frames, recompute over share — measured, not
        // assumed (OPTIMIZATION_r19.md §8).
        val ex = LlmPipeline.shingleRows(s, d)
        val sig = LlmPipeline.signaturesOf(ex)
        val cand = LlmPipeline.lshCandidates(
          LlmPipeline.lshBands(sig, "trans_hot_buckets"))
        val edges = LlmPipeline.jaccardVerify(ex, cand)
          .select(col("doc_a"), col("doc_b"))
        val sym = edges.select(col("doc_a").as("m"), col("doc_b").as("e"))
          .unionByName(edges.select(col("doc_b").as("m"),
            col("doc_a").as("e")))
        val symc = sym
          .withColumn("rn", row_number().over(Window
            .partitionBy(col("m")).orderBy(col("e"))))
          .filter(col("rn") <= WedgeDegreeCap)
          .select(col("m"), col("e"))
        val nCapped = sym.groupBy(col("m"))
          .agg(count(lit(1)).as("deg"))
          .agg(sum(when(col("deg") > WedgeDegreeCap, 1L).otherwise(0L))
            .as("capped_nodes"))
          .select(coalesce(col("capped_nodes"), lit(0L))
            .as("capped_nodes"))
        val wedges = symc.as("s1")
          .join(symc.as("s2"), col("s1.m") === col("s2.m") &&
            col("s1.e") < col("s2.e"))
          .select(col("s1.e").as("a"), col("s2.e").as("b"))
        val induced = wedges.distinct()
        val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val inter = induced
          .join(ex.as("ea"), col("a") === col("ea.doc_id"))
          .join(ex.as("eb"),
            col("b") === col("eb.doc_id") && col("ea.s") === col("eb.s"))
          .groupBy(col("a"), col("b"))
          .agg(count(lit(1)).as("inter"))
        val verdicts = induced
          .join(inter, Seq("a", "b"), "left")
          .join(sizes.select(col("doc_id").as("a"), col("sz").as("sza")), "a")
          .join(sizes.select(col("doc_id").as("b"), col("sz").as("szb")), "b")
          .withColumn("j",
            coalesce(col("inter"), lit(0L)).cast("double") /
              (col("sza") + col("szb") - coalesce(col("inter"), lit(0L))))
          .withColumn("closed",
            when(col("j") >= LlmPipeline.JaccardThreshold, 1L)
              .otherwise(0L))
        val nEdges = edges.agg(count(lit(1)).as("n_edges"))
        val nWedges = wedges.agg(count(lit(1)).as("n_wedges"))
        verdicts.agg(count(lit(1)).as("n_induced_pairs"),
            sum(col("closed")).as("n_closed"))
          .crossJoin(broadcast(nEdges))
          .crossJoin(broadcast(nWedges))
          .crossJoin(broadcast(nCapped))
          .withColumn("closure_ppm", expr(
            "(n_closed * 1000000) div greatest(n_induced_pairs, 1)"))
          .select(col("n_edges"), col("n_wedges"),
            col("n_induced_pairs"), col("n_closed"),
            col("closure_ppm"), col("capped_nodes"))
      },
      Some {
        s"""WITH ${LlmPipeline.sigCtesSql},
          ${LlmPipeline.bandCandCtesSql},
          ed AS (SELECT c.a AS doc_a, c.b AS doc_b
            FROM cand c JOIN sh sa ON sa.doc_id = c.a
              JOIN sh sb ON sb.doc_id = c.b
            WHERE ${Sketches.jaccardSql("sa.sh", "sb.sh")}
              >= ${LlmPipeline.JaccardThreshold}e0),
          sym AS (SELECT doc_a AS m, doc_b AS e FROM ed
            UNION ALL SELECT doc_b, doc_a FROM ed),
          symr AS (SELECT m, e,
              row_number() OVER (PARTITION BY m ORDER BY e) AS rn
            FROM sym),
          symc AS (SELECT m, e FROM symr WHERE rn <= $WedgeDegreeCap),
          cn AS (SELECT CAST(COALESCE(SUM(CASE WHEN deg > $WedgeDegreeCap
                THEN 1 ELSE 0 END), 0) AS BIGINT) AS capped_nodes
            FROM (SELECT m, COUNT(*) AS deg FROM sym GROUP BY 1)),
          wg AS (SELECT s1.e AS a, s2.e AS b
            FROM symc s1 JOIN symc s2
              ON s2.m = s1.m AND s1.e < s2.e),
          ind AS (SELECT DISTINCT a, b FROM wg),
          vd AS (SELECT ind.a, ind.b,
              CASE WHEN ${Sketches.jaccardSql("sa.sh", "sb.sh")}
                >= ${LlmPipeline.JaccardThreshold}e0 THEN 1 ELSE 0 END
                AS closed
            FROM ind JOIN sh sa ON sa.doc_id = ind.a
              JOIN sh sb ON sb.doc_id = ind.b),
          ag AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_induced_pairs,
              CAST(SUM(closed) AS BIGINT) AS n_closed FROM vd),
          ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM ed),
          nw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_wedges FROM wg)
          SELECT ne.n_edges, nw.n_wedges, ag.n_induced_pairs,
            ag.n_closed,
            (ag.n_closed * 1000000)
              // GREATEST(ag.n_induced_pairs, 1) AS closure_ppm,
            cn.capped_nodes
          FROM ag CROSS JOIN ne CROSS JOIN nw CROSS JOIN cn"""
      })

    /* L155: split-balance audit — the L14 deterministic split
     * PROMISES 80/10/10 in expectation, per source, but each source
     * realizes a finite-sample draw of the salted hash, and a small
     * or unlucky source can land far enough off target to starve its
     * own val/test cells (every per-source eval downstream divides by
     * them). The audit applies the REGISTERED split ladder (the
     * funnel's "split:"-salted hash and eval-slice exclusion,
     * LlmPipeline's own constants) and reports per (source, split)
     * realized share vs target with the signed deviation — the
     * finite-sample coverage read on the split the funnel actually
     * ships (q80 gates the split's VALUES; this prices its BALANCE).
     * At 100 TB: one map-side hash column into a ≤3·|sources|-row
     * rollup. */
    val q223 = GraftQuery(
      "q223_split_balance_audit", "L155 L14 L88",
      (s, d) => {
        val h = pmod(graft.functions.TextFunctions.md5Fingerprint(
          concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
        val tp = LlmPipeline.TrainPct
        val vp = LlmPipeline.ValPct
        Tables.documents(s, d)
          .filter(col("doc_id") % 97 =!= 0)
          .select(col("source"),
            when(h < tp, "train").when(h < tp + vp, "val")
              .otherwise("test").as("split"))
          .groupBy(col("source"), col("split"))
          .agg(count(lit(1)).as("n_docs"))
          .withColumn("n_source", sum(col("n_docs")).over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("source"))))
          .withColumn("share_ppm",
            expr("(n_docs * 1000000) div greatest(n_source, 1)"))
          .withColumn("target_ppm", expr(
            s"CAST(CASE split WHEN 'train' THEN ${tp * 10000L} " +
              s"WHEN 'val' THEN ${vp * 10000L} " +
              s"ELSE ${(100 - tp - vp) * 10000L} END AS BIGINT)"))
          .withColumn("dev_ppm", expr("share_ppm - target_ppm"))
          .select(col("source"), col("split"), col("n_docs"),
            col("n_source"), col("share_ppm"), col("target_ppm"),
            col("dev_ppm"))
          .orderBy(col("source"), col("split"))
      },
      Some {
        val h = graft.functions.TextFunctions.md5FingerprintSql(
          "'split:' || CAST(doc_id AS VARCHAR)")
        val tp = LlmPipeline.TrainPct
        val vp = LlmPipeline.ValPct
        s"""WITH sp AS (SELECT source,
              CASE WHEN $h % 100 < $tp THEN 'train'
                WHEN $h % 100 < ${tp + vp} THEN 'val'
                ELSE 'test' END AS split
            FROM documents WHERE doc_id % 97 <> 0),
          ag AS (SELECT source, split, CAST(COUNT(*) AS BIGINT)
              AS n_docs FROM sp GROUP BY 1, 2),
          ns AS (SELECT *, CAST(SUM(n_docs) OVER (PARTITION BY source)
              AS BIGINT) AS n_source FROM ag)
          SELECT source, split, n_docs, n_source,
            (n_docs * 1000000) // GREATEST(n_source, 1) AS share_ppm,
            CAST(CASE split WHEN 'train' THEN ${tp * 10000L}
              WHEN 'val' THEN ${vp * 10000L}
              ELSE ${(100 - tp - vp) * 10000L} END AS BIGINT)
              AS target_ppm,
            (n_docs * 1000000) // GREATEST(n_source, 1) -
              CASE split WHEN 'train' THEN ${tp * 10000L}
                WHEN 'val' THEN ${vp * 10000L}
                ELSE ${(100 - tp - vp) * 10000L} END AS dev_ppm
          FROM ns ORDER BY source, split"""
      })

    Seq(q218, q219, q220, q223)
  }
}
