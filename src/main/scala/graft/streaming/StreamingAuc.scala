package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming form of L109's exact ROC-AUC monitor (q177): the
  * per-(source, score) class histogram accumulated over a stream of
  * FROZEN-MODEL classifier scores, with the exact Mann–Whitney AUC
  * readable after every micro-batch — the shape a quality-classifier
  * canary runs in production (is the classifier still separating the
  * planted class on tonight's ingest?).
  *
  * State is the histogram itself — `(source, score) → (np, nn)`, sized
  * by |distinct scores| (the NB integer ladder keeps this small), not
  * by stream length. Per micro-batch the batch's histogram is built
  * RELATIONALLY (the same map-side-combined group-by the batch operator
  * uses; only the count map crosses to the driver) and added into held
  * state. Count addition is associative and commutative, so the
  * accumulated histogram equals a one-shot build over the union of all
  * arrivals under any chunking or arrival order, and [[aucReport]]
  * over it reproduces the oracle-gated q177 rows exactly
  * (`StreamingAucSpec` asserts both). The model is FROZEN by contract
  * (the L58 incremental stance): arrivals carry already-scored docs —
  * re-training online would change past scores and is a batch rebuild,
  * not a monitor update. Counting state is NOT idempotent under
  * replay — exactly-once sinks own replay protection.
  */
object StreamingAuc {

  case class Scored(doc_id: Long, source: String, pos: Long, score: Long)

  /** (source, score) → (n_pos, n_neg). */
  type Hist = Map[(String, Long), (Long, Long)]

  val empty: Hist = Map.empty

  /** Fold one micro-batch into `h` (unmodified; a new map returns). */
  def observeBatch(mb: Dataset[Scored], h: Hist): Hist = {
    val sp = mb.sparkSession
    import sp.implicits._
    val batch = mb.toDF()
      .groupBy(col("source"), col("score"))
      .agg(sum(col("pos")).as("np"),
        sum(lit(1L) - col("pos")).as("nn"))
      .as[(String, Long, Long, Long)].collect()
    batch.foldLeft(h) { case (acc, (s, sc, np, nn)) =>
      val k = (s, sc)
      val (p0, n0) = acc.getOrElse(k, (0L, 0L))
      acc + (k -> (p0 + np, n0 + nn))
    }
  }

  /** AUC readout — the q177 arithmetic replayed over the held
    * histogram: per source, negatives-below accumulated in score
    * order, U2 = Σ np·(2·nn_below + nn), auc_ppm = U2·10^6 div
    * (2·np·nn) (−1 when a class is empty). Returns
    * (source, n_pos, n_neg, n_scores, u2, auc_ppm) sorted by source —
    * the q177 row shape.
    */
  def aucReport(h: Hist): Seq[(String, Long, Long, Long, Long, Long)] = {
    h.groupBy(_._1._1).toSeq.sortBy(_._1).map { case (src, entries) =>
      val byScore = entries.toSeq
        .map { case ((_, sc), (np, nn)) => (sc, np, nn) }
        .sortBy(_._1)
      var nnBelow = 0L
      var u2 = 0L
      byScore.foreach { case (_, np, nn) =>
        u2 += np * (2 * nnBelow + nn)
        nnBelow += nn
      }
      val nPos = byScore.map(_._2).sum
      val nNeg = byScore.map(_._3).sum
      val auc =
        if (nPos * nNeg > 0) u2 * 1000000L / (2 * nPos * nNeg) else -1L
      (src, nPos, nNeg, byScore.length.toLong, u2, auc)
    }
  }
}
