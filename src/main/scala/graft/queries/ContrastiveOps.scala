package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.Sketches

/** Contrastive-training data operators over the labeled embedding
  * corpus (SURVEY §2.11a, L105–L106):
  *
  *  - L105 hard-negative mining         → q173
  *  - L106 label-noise centroid audit   → q174
  *
  * Both consume the `label` column the fixtures carry: L105 mines the
  * highest-similarity OTHER-label vectors per anchor (the negatives
  * that actually move a contrastive loss — random negatives are too
  * easy), L106 flags vectors whose nearest per-label centroid is not
  * their own label's (the confident-learning-style label-noise signal
  * that gates a labeled corpus before training on it).
  */
object ContrastiveOps {

  /** L105: negatives per anchor; the q38 anchor protocol. */
  private[queries] val HardNegK = 5

  /** L106 component quantum: floor(v·10^6) per dimension (the q105
    * centroid rule) — all affinity arithmetic is over these exact
    * integers.
    */
  private[queries] val CompQ = 1e6

  def all: Seq[GraftQuery] = {

    /* L105: hard-negative mining — for each anchor (the q38 query
     * protocol, vec_id % 50 == 0), the top-5 highest-cosine vectors
     * carrying a DIFFERENT label: the negatives a contrastive/embedding
     * trainer actually learns from (in-batch random negatives quickly
     * become trivial; mined hard negatives keep the loss informative).
     * Rank by exact cosine, deterministic id tie-break; the full
     * (rank, id, label, cos) list is gated. At 100 TB the candidate
     * set comes from the ANN index (q70's cells) instead of the scan —
     * same scoring and ranking downstream; the label filter rides the
     * candidate join (a predicate, not a post-filter over materialized
     * pairs). */
    val q173 = GraftQuery(
      "q173_hard_negative_mining", "L105 L6 L81",
      (s, d) => {
        val e = Tables.embeddings(s, d).select(col("vec_id"),
          col("embedding"), col("label"),
          Sketches.norm(col("embedding"), 64).as("nrm"))
        val q = e.filter(col("vec_id") % 50 === 0)
          .select(col("vec_id").as("q_id"), col("label").as("q_label"),
            col("embedding").as("qe"), col("nrm").as("qn"))
        broadcast(q).join(e, col("label") =!= col("q_label"))
          .withColumn("cos", Sketches.cosineFromParts(
            Sketches.dot(col("qe"), col("embedding"), 64),
            col("qn"), col("nrm")))
          .withColumn("rank", row_number().over(Window.partitionBy(col("q_id"))
            .orderBy(col("cos").desc, col("vec_id"))))
          .filter(col("rank") <= HardNegK)
          .select(col("q_id"), col("rank").cast("long").as("rank"),
            col("vec_id"), col("label").cast("long").as("neg_label"),
            col("cos"))
          .orderBy(col("q_id"), col("rank"))
      },
      Some {
        val cos = Sketches.cosineSql(
          Sketches.dotSql("q.embedding", "e.embedding", 64),
          Sketches.normSql("q.embedding", 64),
          Sketches.normSql("e.embedding", 64))
        s"""WITH pairs AS MATERIALIZED (
            SELECT q.vec_id AS q_id, e.vec_id AS vec_id,
              CAST(e.label AS BIGINT) AS neg_label, $cos AS cos
            FROM embeddings q JOIN embeddings e ON e.label <> q.label
            WHERE q.vec_id % 50 = 0),
          rk AS (SELECT *, row_number() OVER
              (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rank
            FROM pairs)
          SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, neg_label, cos
          FROM rk WHERE rank <= $HardNegK ORDER BY q_id, rank"""
      })

    /* L106: label-noise centroid audit — flag vectors that sit closer
     * to ANOTHER label's centroid than to their own (the
     * confident-learning signal: at production, flagged examples are
     * re-annotated or dropped before contrastive training). Centroids
     * are exact per-(label, dim) integer means on the q105 ladder
     * (floor(v·10^6) quantization → associative long sums → one
     * division); affinity(v, label) = Σ_dim vq·cq div |c| — the
     * integer dot against the centroid, normalized by the centroid's
     * length (IEEE sqrt/division are correctly rounded, so doubles
     * over identical integer inputs are engine-exact; the vector's own
     * norm is a common factor across labels and cancels from the
     * comparison). margin = floor(own − best_other) in quantized
     * units; flagged = margin < 0. At 100 TB: the (label, dim)
     * centroid aggregate map-side-combines to |labels|·Dims rows; the
     * affinity pass joins the tiny broadcast centroid frame on dim and
     * re-aggregates per (vec, label) — two corpus passes, no
     * all-pairs work. */
    val q174 = GraftQuery(
      "q174_label_noise_audit", "L106 L40 L27",
      (s, d) => {
        val vq = Tables.embeddings(s, d)
          .select(col("vec_id"), col("label").cast("long").as("vlabel"),
            posexplode(col("embedding")))
          .select(col("vec_id"), col("vlabel"),
            (col("pos") + 1).cast("long").as("pos"),
            floor(col("col").cast("double") * lit(CompQ)).as("vq"))
        val cq = vq.groupBy(col("vlabel").as("clabel"), col("pos"))
          .agg(expr("sum(vq) div count(1)").as("cq"))
        val n2 = cq.groupBy(col("clabel"))
          .agg(sum(col("cq") * col("cq")).as("n2"))
        val aff = vq.join(broadcast(cq), Seq("pos"))
          .groupBy(col("vec_id"), col("vlabel"), col("clabel"))
          .agg(sum(col("vq") * col("cq")).as("dot_q"))
          .join(broadcast(n2), Seq("clabel"))
          .withColumn("aff",
            col("dot_q").cast("double") / sqrt(col("n2").cast("double")))
        aff.groupBy(col("vec_id"), col("vlabel"))
          .agg(max(when(col("clabel") === col("vlabel"), col("aff")))
            .as("own"),
            max(when(col("clabel") =!= col("vlabel"), col("aff")))
              .as("best_other"))
          .withColumn("margin", floor(col("own") - col("best_other")))
          .groupBy(col("vlabel").as("label"))
          .agg(count(lit(1)).as("n_vecs"),
            sum(when(col("margin") < 0, 1L).otherwise(0L)).as("n_flagged"),
            sum(col("margin")).as("sum_margin"),
            min(col("margin")).as("min_margin"))
          .orderBy(col("label"))
      },
      Some {
        s"""WITH vq AS (SELECT vec_id, CAST(label AS BIGINT) AS vlabel,
              i AS pos,
              CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT)
                AS vq
            FROM embeddings, generate_series(1, 64) t(i)),
          cq AS (SELECT vlabel AS clabel, pos,
              CAST(SUM(vq) AS BIGINT) // COUNT(*) AS cq
            FROM vq GROUP BY 1, 2),
          n2 AS (SELECT clabel, CAST(SUM(cq * cq) AS BIGINT) AS n2
            FROM cq GROUP BY 1),
          dots AS MATERIALIZED (SELECT vq.vec_id, vq.vlabel, cq.clabel,
              CAST(SUM(vq.vq * cq.cq) AS BIGINT) AS dot_q
            FROM vq JOIN cq ON cq.pos = vq.pos GROUP BY 1, 2, 3),
          aff AS (SELECT dots.*, CAST(dot_q AS DOUBLE) /
              sqrt(CAST(n2.n2 AS DOUBLE)) AS aff
            FROM dots JOIN n2 ON n2.clabel = dots.clabel),
          mg AS (SELECT vec_id, vlabel,
              CAST(floor(MAX(CASE WHEN clabel = vlabel THEN aff END)
                - MAX(CASE WHEN clabel <> vlabel THEN aff END)) AS BIGINT)
                AS margin
            FROM aff GROUP BY 1, 2)
          SELECT vlabel AS label, COUNT(*) AS n_vecs,
            CAST(SUM(CASE WHEN margin < 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_flagged,
            CAST(SUM(margin) AS BIGINT) AS sum_margin,
            CAST(MIN(margin) AS BIGINT) AS min_margin
          FROM mg GROUP BY 1 ORDER BY label"""
      })

    Seq(q173, q174)
  }
}
