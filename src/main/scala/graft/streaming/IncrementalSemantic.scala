package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}

/** Streaming form of L58 incremental semantic dedup (q123): classify an
  * ARRIVING embedding stream against a STATIC corpus, verdict-for-verdict
  * equal to the batch operator.
  *
  * The frozen models (stride codebook + corpus cell assignment — stored
  * artifacts of the corpus build in production, the K8 layout) are built
  * ONCE; each micro-batch then runs the exact batch classification
  * kernel via `foreachBatch`. The kernel is stateless in the batch —
  * a vector's verdict depends only on itself and the frozen corpus — so
  * micro-batch partitioning is irrelevant and the stream carries ZERO
  * state (no watermark, no store). `foreachBatch` rather than a
  * stream-static join chain because the verify step ends in a per-batch
  * min aggregate, which as a STREAMING aggregate would force update mode
  * and a state store for what is logically a per-arrival computation;
  * per-micro-batch relational execution keeps the plan identical to
  * q123's. IncrementalSemanticSpec proves stream == batch.
  */
object IncrementalSemantic {
  case class BatchVec(vec_id: Long, embedding: Array[Float])

  /** Frozen corpus models — see `CorpusOps.semanticModels`. */
  def models(corpus: DataFrame): (DataFrame, DataFrame) =
    graft.queries.CorpusOps.semanticModels(corpus)

  /** The per-micro-batch classification: exactly the batch kernel. */
  def classify(batch: Dataset[BatchVec], cb: DataFrame, asnC: DataFrame,
      corpus: DataFrame): DataFrame =
    graft.queries.CorpusOps.classifySemanticBatch(
      batch.toDF(), cb, asnC, corpus)
}
