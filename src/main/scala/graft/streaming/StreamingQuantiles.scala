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
}
