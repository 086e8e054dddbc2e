package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

import graft.plans.BottomKSketchAgg

/** Streaming form of L59's bottom-k quantile sketch (q124): the
  * per-source sample accumulated over an ingest stream, with the
  * nearest-rank quantile readout available after every micro-batch.
  *
  * State is the sample itself — per source, the k values whose salted
  * md5 hash is smallest, plus the running count. The hash is a PURE
  * FUNCTION of the value ([[BottomKSketchAgg.hash]]), so the held
  * values are sufficient state: merge recomputes hashes and keeps the
  * k smallest under the (hash, value) total order — associative,
  * commutative, and merge-tree independent exactly like the batch
  * aggregate, so the accumulated sample EQUALS a one-shot build over
  * the union of all arrivals under any chunking or arrival order, and
  * [[report]] reproduces the oracle-gated q124 rows bit-for-bit
  * (`StreamingQuantilesSpec` asserts both). Each micro-batch runs the
  * same relational `graft_bottomk` aggregate the batch operator uses —
  * only (source, ≤k values, count) rows cross to the driver. Like the
  * counting sketches, the state is NOT idempotent under replay: the
  * sample is a multiset of row draws, so re-observing rows whose
  * values repeat adds more copies of the same (hash, value) pair (a
  * group whose sample is not yet full visibly grows) — exactly-once
  * sinks own replay protection, for the sample and for n_docs alike.
  */
object StreamingQuantiles {

  /** q124's geometry, shared: k = 64 values of the L9 BPE-ish token
    * count, salt "q124".
    */
  val K = 64
  val Salt = "q124"

  case class Arrival(doc_id: Long, source: String, tok: Long)

  /** source → (n_docs, bottom-k value sample, sorted ascending). */
  type State = Map[String, (Long, Vector[Long])]

  val empty: State = Map.empty

  private def mergeSample(a: Vector[Long], b: Vector[Long]): Vector[Long] =
    (a ++ b).sortBy(v => (BottomKSketchAgg.hash(Salt, v), v))
      .take(K).sorted

  /** Fold one micro-batch into `st` (unmodified; a new map returns). */
  def observeBatch(mb: Dataset[Arrival], st: State): State = {
    val sp = mb.sparkSession
    import sp.implicits._
    val batch = mb.toDF()
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_bottomk", col("tok"), lit(K), lit(Salt))
          .as("sample"))
      .as[(String, Long, Seq[Long])].collect()
    batch.foldLeft(st) { case (acc, (src, n, sample)) =>
      val (n0, s0) = acc.getOrElse(src, (0L, Vector.empty[Long]))
      acc + (src -> (n0 + n, mergeSample(s0, sample.toVector)))
    }
  }

  /** Quantile readout — the q124 arithmetic over the held samples:
    * nearest-rank P25/P50/P75 by pure integer indexing. Returns
    * (source, n_docs, sample_n, p25, p50, p75) sorted by source — the
    * oracle-gated q124 rows exactly.
    */
  def report(st: State): Seq[(String, Long, Long, Long, Long, Long)] =
    st.toSeq.sortBy(_._1).map { case (src, (n, sample)) =>
      val sn = sample.length.toLong
      def at(rank: Long): Long = sample((rank - 1).toInt)
      (src, n, sn, at((sn + 3) / 4), at((sn + 1) / 2),
        at((3 * sn + 3) / 4))
    }

  // ---- stream/batch state interop over the persisted ledger ----

  /** The held per-source state AS ledger rows — the exact (grp,
    * n_rows, sample) schema [[graft.sinks.SketchLedger]] stores. A
    * streaming job's saved state IS the nightly artifact: write it
    * with `SketchLedger.write`, and a BATCH `rollForward` against the
    * stored file continues exactly where the stream stopped (and vice
    * versa via [[fromLedger]]) — one persisted format, two execution
    * modes, the same merge law (StreamingQuantilesSpec proves the
    * round-trip and the cross-mode continuation both equal one-shot
    * builds).
    */
  def toLedger(spark: org.apache.spark.sql.SparkSession,
      st: State): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    st.toSeq.sortBy(_._1)
      .map { case (g, (n, s)) => (g, n, s) }
      .toDF("grp", "n_rows", "sample")
  }

  /** Rebuild streaming state from a ledger frame (read back from the
    * stored artifact, or produced by a batch `SketchLedger` build).
    */
  def fromLedger(df: org.apache.spark.sql.DataFrame): State =
    df.collect().map { r =>
      r.getString(0) -> (r.getLong(1), r.getSeq[Long](2).toVector)
    }.toMap

  // ---- L156 live curriculum dial (VERDICT r17 #5) ----

  /** q224's geometry, shared: one GLOBAL bottom-k over the combined
    * (q_u, doc_id) key — salt "q224", k = the batch tier's SwapK — so
    * the streaming state is the batch sketch, mergeable by
    * construction.
    */
  val StageSalt = "q224"
  val StageK: Int = graft.queries.SketchSwapOps.SwapK

  case class StageArrival(doc_id: Long, q_u: Long)

  /** Global stage state: (total rows seen, combined-key sample). */
  type StageState = (Long, Vector[Long])
  val emptyStage: StageState = (0L, Vector.empty)

  /** Fold one micro-batch of (doc_id, q_u) arrivals into the global
    * stage state. Each micro-batch runs the SAME guarded-key
    * `graft_bottomk` aggregate q224 ships (the id-domain guard raises
    * in-stream exactly as in batch); only (n, ≤k keys) cross to the
    * driver, and the merge keeps the k smallest under the (hash, key)
    * order — so the accumulated state equals a one-shot build under
    * any chunking or arrival order, which is what makes [[stageCuts]]
    * equal the batch q224 cuts after every micro-batch.
    */
  def observeStageBatch(mb: Dataset[StageArrival],
      st: StageState): StageState = {
    val sp = mb.sparkSession
    import sp.implicits._
    val (n, sample) = mb.toDF()
      .select(graft.queries.SketchSwapOps
        .combinedKey(col("q_u"), col("doc_id")).as("key"))
      .agg(count(lit(1)).as("n"),
        call_function("graft_bottomk", col("key"), lit(StageK),
          lit(StageSalt)).as("sample"))
      .as[(Long, Seq[Long])].collect().head
    val merged = (st._2 ++ sample)
      .sortBy(v => (BottomKSketchAgg.hash(StageSalt, v), v))
      .take(StageK).sorted.toVector
    (st._1 + n, merged)
  }

  /** Stage-cut readout — q224's cut arithmetic over the held state:
    * cut_t = sample[greatest(1, (cum_t·sample_n) div n)] at the exact
    * ntile tile boundaries cum_t = t·(n div S) + min(t, n mod S).
    * Returns the S−1 boundary KEYS (a doc is in stage 1 + #{t : key >
    * cut_t}, q224's map-side assignment) — the live curriculum dial:
    * after every micro-batch these are the batch q224 cuts for the
    * rows seen so far (StreamingQuantilesSpec pins the equality under
    * chunking).
    */
  def stageCuts(st: StageState,
      stages: Int = graft.queries.CurriculumOps.CurriculumStages)
      : Seq[Long] = {
    val (n, sample) = st
    require(n > 0L && sample.nonEmpty, "stageCuts needs observed rows")
    val sn = sample.length.toLong
    // the tier's shared cut arithmetic — NOT a local re-derivation, so
    // the live dial cannot drift from the gated q224 formula
    import graft.queries.SketchSwapOps.{cutIndexScala, tileCumScala}
    (1L until stages.toLong).map { t =>
      sample(cutIndexScala(tileCumScala(t, n, stages), n, sn).toInt - 1)
    }
  }
}
