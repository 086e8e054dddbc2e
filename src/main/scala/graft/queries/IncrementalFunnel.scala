package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.functions.TextFunctions

/** Nightly incremental corpus maintenance: q96's batch-vs-corpus
  * classification composed with the training funnel and an append-mode
  * shard update — the production shape that turns the engine from
  * batch-rebuild to incremental upkeep (VERDICT r10 #5).
  *
  * One run: classify the arriving batch against the existing corpus
  * (L31), push the genuinely-new documents through the SAME funnel stages
  * the full rebuild runs (L1 canonical dedup within the batch, L16
  * quality, L17 decontamination vs the FROZEN eval model, L14 split),
  * K4-style resume-anti-join against keys already on disk, and append
  * the survivors into the existing shard layout.
  *
  * Contracts that make this equal to a from-scratch rebuild on the
  * merged corpus (IncrementalFunnelSpec proves both):
  *
  *  - '''Monotone ingest ids.''' Every batch doc_id must exceed every
  *    corpus doc_id (asserted loudly). Then no batch document can unseat
  *    a corpus document as its fingerprint cluster's min-id keeper, so
  *    the corpus's survivor set — and therefore every already-written
  *    shard file — is untouched by the merge.
  *  - '''Frozen eval model.''' Decontamination screens the batch against
  *    the eval-gram fingerprints pinned at corpus build
  *    ([[LlmPipeline.evalGramFingerprints]]): an arriving eval document
  *    must not retroactively contaminate (retract) rows a trainer
  *    already consumed. The comparator rebuild uses the same pinned
  *    model — in production the decontamination set is an input, not
  *    something each nightly re-derives (the q85 shape).
  *  - '''Pure-hash layout.''' Shard membership and split assignment are
  *    salted hashes of doc_id, so new rows land in deterministic shard
  *    directories as NEW files; old files are never rewritten
  *    (byte-stability asserted file-for-file).
  *
  * At 100 TB: the corpus is touched only to build key models (fp/ck
  * minima for classification, the frozen eval grams — aggregate frames
  * that broadcast, or downgrade to shuffle joins when even the key set
  * outgrows a broadcast); everything batch-sided is batch-sized; the
  * resume anti-join reads one column (doc_id) of the existing layout;
  * the append's single exchange carries only the new rows.
  */
object IncrementalFunnel {

  /** Classify `batch` against the corpus and funnel the genuinely-new
    * documents to the rows a rebuild would add: exact duplicates of
    * corpus content are dropped (q96 `exact_dup` — the corpus keeper
    * wins), near-duplicates survive exactly as the rebuild keeps them
    * (the funnel's dedup stage is exact-canonical), and the batch is
    * internally deduplicated by the same min-id rule.
    */
  def batchSurvivors(s: SparkSession, corpusDir: String, batch: DataFrame)
      : DataFrame = {
    import s.implicits._
    val corpus = Tables.documents(s, corpusDir)
    val evalG = LlmPipeline.evalGramFingerprints(corpus)
    // q96's corpus models + classification, verbatim
    val (fpMin, ckMin) = graft.streaming.IncrementalDedup.corpusModels(corpus)
    val verdicts = graft.streaming.IncrementalDedup.classify(
      batch.select(col("doc_id"), col("text"))
        .as[graft.streaming.IncrementalDedup.BatchDoc],
      fpMin, ckMin)
    // funnel flags of the batch alone: with monotone ids, batch-internal
    // canon + absence-from-corpus ⟺ merged-corpus canon
    LlmPipeline.funnelFlagsOver(batch, evalG)
      .join(verdicts.filter(col("verdict") =!= "exact_dup")
        .select(col("doc_id")), Seq("doc_id"), "left_semi")
      .filter(col("canon") && col("keep") && !col("dirty"))
      .select(col("doc_id"), col("lang"), col("split"), col("text"))
  }

  /** Run one nightly increment: append `batch`'s funnel survivors to the
    * existing shard layout at `outDir`. Returns the number of rows
    * appended (0 on a pure re-run — the resume anti-join makes the
    * operation idempotent, and a crash between runs is recovered by
    * simply running again).
    */
  def updateTrainingShards(s: SparkSession, corpusDir: String,
      batch: DataFrame, outDir: String, nShards: Int = 64,
      maxRecordsPerFile: Long = 1000000L, redactPii: Boolean = true): Long = {
    // monotone-ingest guard: the invariant that keeps every already-
    // written shard file byte-stable (see class doc). Two single-value
    // aggregates — driver-side by design, this is a job-level precondition
    val maxCorpus = Tables.documents(s, corpusDir)
      .agg(max(col("doc_id"))).head.getLong(0)
    val minBatch = batch.agg(min(col("doc_id"))).head.getLong(0)
    require(minBatch > maxCorpus,
      s"IncrementalFunnel requires monotone ingest ids: batch min doc_id " +
        s"$minBatch must exceed corpus max doc_id $maxCorpus — a smaller " +
        "arriving id could unseat a shipped document as its cluster keeper")

    val survivors = batchSurvivors(s, corpusDir, batch)
    val out = if (redactPii) {
      survivors.withColumn("text", TextFunctions.redactPii(col("text")))
    } else survivors
    // K4-style resume: never re-append a key already on disk (crash
    // between write and bookkeeping, or a plain re-run, appends nothing).
    // Column-pruned read — one long column of the existing layout.
    val existing = scala.util.Try(
        s.read.parquet(outDir).select(col("doc_id")))
      .getOrElse(s.emptyDataFrame.select(lit(0L).as("doc_id")).limit(0))
    val fresh = out.join(existing, Seq("doc_id"), "left_anti")
    // count + write over one materialization: the increment is batch-sized
    // by definition, so the persist is bounded by the night's ingest, not
    // the corpus (an Observation metric would avoid the persist but AQE's
    // empty-relation propagation drops the CollectMetrics node on a
    // zero-row re-run, losing the count)
    fresh.persist()
    try {
      val appended = fresh.count()
      if (appended > 0) {
        graft.sinks.ShardWriter.append(fresh, "doc_id", nShards, outDir,
          maxRecordsPerFile)
      }
      appended
    } finally fresh.unpersist()
  }
}
