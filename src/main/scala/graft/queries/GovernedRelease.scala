package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Sketches

/** The governed nightly release (composition) — the end-to-end job a
  * training-data team actually schedules, chaining the round's
  * governance operators over the established funnel:
  *
  *   funnel survivors (L1/L16/L17/L14: canon ∧ keep ∧ ¬dirty)
  *     → leakage-free split repair (L88: clusters move whole)
  *     → train split only
  *     → per-domain quota cap   (L84: salted exact top-Cap)
  *     → rejection resample     (L87: flatten the length profile)
  *
  * Every stage is the SAME kernel its oracle-gated query registers
  * (funnelFlags / repairSplits / withDomain+domainCapKeptIds /
  * rejectionAccepts) — the composition adds NO new semantics, only the
  * chaining, so its correctness reduces to the gated parts plus the
  * interface contracts GovernedReleaseSpec pins: zero leaking clusters
  * among released docs, no domain over cap, the length profile
  * flattened to the train-split's own bucket minimum, and end-to-end
  * determinism. At 100 TB the chain is: the funnel's own shuffles, one
  * ck-keyed join (co-located under a ck-bucketed K8 layout), two
  * window stages over salted domain keys, one broadcast of an 8-row
  * acceptance frame — nothing wider than the funnel itself.
  */
object GovernedRelease {

  /** The released training corpus: (doc_id, source, lang, n_chars, dom,
    * bkt) — docs that survive the funnel, land in the repaired train
    * split, fit their domain's quota and pass the length-flattening
    * draw.
    */
  def releaseTrainCorpus(s: SparkSession, d: String): DataFrame = {
    val flags = LlmPipeline.funnelFlags(s, d)
      .filter(col("canon") && col("keep") && !col("dirty"))
      .select(col("doc_id"), col("lang"), col("source"), col("split"),
        col("text"), length(col("text")).as("n_chars"),
        Sketches.h64(array_join(sort_array(array_distinct(
          Sketches.words(col("text")))), " ")).as("ck"))
    val train = TrainedFilterOps.repairSplits(flags)
      .filter(col("new_split") === "train")
      .select(col("doc_id"), col("source"), col("lang"), col("n_chars"))
    val domed = CorpusShapingOps.withDomain(train)
    val capped = domed.join(CorpusShapingOps.domainCapKeptIds(domed),
      col("doc_id") === col("kept_id")).drop("kept_id")
    val bucketed = capped.withColumn("bkt",
      least(expr(s"n_chars div ${TrainedFilterOps.RejBucketChars}"),
        lit(7L)))
    val hist = bucketed.groupBy(col("bkt"))
      .agg(count(lit(1)).as("n_before"))
    val acc = hist.crossJoin(broadcast(
        hist.agg(min(col("n_before")).as("target"))))
      .withColumn("acc_q20",
        expr(s"(target * ${TrainedFilterOps.RejQ}) div n_before"))
      .select(col("bkt"), col("acc_q20"))
    TrainedFilterOps.rejectionAccepts(
      bucketed.join(broadcast(acc), Seq("bkt")))
  }
}
