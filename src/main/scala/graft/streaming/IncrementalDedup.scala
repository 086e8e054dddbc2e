package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming form of L31 incremental dedup (q96): classify an ARRIVING
  * document stream against a STATIC corpus, verdict-for-verdict equal to
  * the batch operator.
  *
  * The corpus collapses ONCE to two models — min corpus doc id per
  * content fingerprint and per canonical bag-of-words key (the exact
  * aggregates the batch form computes, which do not depend on the batch:
  * restricting a per-key min to the keys a batch probes never changes the
  * min) — and every micro-batch stream-static LEFT-joins them. With the
  * models broadcast, classification is map-side per micro-batch: no
  * streaming state, no shuffle of the arriving data, corpus scanned only
  * at model build. At 100 TB the models are the deduplicated KEY set, not
  * the corpus — and where even that outgrows a broadcast, the same plan
  * downgrades to a shuffle hash join on the key without touching the
  * stream logic. IncrementalDedupSpec proves stream == batch q96.
  */
object IncrementalDedup {
  case class BatchDoc(doc_id: Long, text: String)

  /** (doc_id, fp, ck) — the same key expressions the batch operator uses. */
  private def keyed(df: DataFrame): DataFrame =
    df.select(col("doc_id"),
      graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"),
      graft.functions.Sketches.h64(array_join(sort_array(array_distinct(
        graft.functions.Sketches.words(col("text")))), " ")).as("ck"))

  /** Static corpus models: (min corpus doc per fp, min corpus doc per ck). */
  def corpusModels(corpus: DataFrame): (DataFrame, DataFrame) = {
    val k = keyed(corpus)
    (k.groupBy(col("fp")).agg(min(col("doc_id")).as("first_exact")),
      k.groupBy(col("ck")).agg(min(col("doc_id")).as("first_near")))
  }

  /** Classify a (possibly streaming) batch against prebuilt corpus models:
    * exact_dup (content fingerprint known) beats near_dup (canonical key
    * known) beats new — the batch operator's precedence.
    */
  def classify(batch: Dataset[BatchDoc], fpMin: DataFrame,
      ckMin: DataFrame): DataFrame =
    keyed(batch.toDF())
      .join(broadcast(fpMin), Seq("fp"), "left")
      .join(broadcast(ckMin), Seq("ck"), "left")
      .select(col("doc_id"),
        when(col("first_exact").isNotNull, "exact_dup")
          .when(col("first_near").isNotNull, "near_dup")
          .otherwise("new").as("verdict"),
        coalesce(col("first_exact"), col("first_near")).as("matched_doc"))
}
