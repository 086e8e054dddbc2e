package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.functions._

/** Streaming form of L72's weighted priority sample (q140): a running
  * top-(k+1)-by-priority reservoir over an unbounded document stream,
  * with the subset-sum estimator available after every micro-batch.
  *
  * The top-(k+1) of a union is the top-(k+1) of the per-chunk
  * top-(k+1)s — the merge is associative, commutative and (deduping by
  * doc_id) IDEMPOTENT, so the accumulated state is row-identical to the
  * batch operator's TakeOrdered over everything seen so far under any
  * chunking, arrival order, or replay (`StreamingPrioritySampleSpec`
  * proves state == q140's sample on the same corpus). Per micro-batch
  * only the batch's own top-(k+1) rows cross to the driver (the same
  * TakeOrdered shape as the batch query — no global sort); state is
  * k+1 fixed-width rows, independent of stream length. The estimator
  * readout mirrors q140 exactly: τ = the (k+1)-th priority (0 while the
  * stream is still sub-k), estimate = Σ max(w, τ) over the k sample
  * rows. The exact running total Σw is carried alongside (one long) so
  * the spec can pin the estimator against it; a production readout that
  * doesn't want the exact side simply ignores it.
  */
object StreamingPrioritySample {

  import graft.queries.SampleGraphOps.{PrioK, withPriority}

  case class Arrival(doc_id: Long, w: Long)

  /** One reservoir row: the priority is derived state (recomputable from
    * doc_id and w) but kept to make the merge a plain sort.
    */
  case class Entry(priority: Long, docId: Long, w: Long)

  case class State(top: Seq[Entry], exactTotal: Long, nSeen: Long) {
    def tau: Long =
      if (top.size == PrioK + 1) top.last.priority else 0L
    def sample: Seq[Entry] = top.take(PrioK)
    def estTotal: Long = sample.map(e => math.max(e.w, tau)).sum
  }

  def emptyState: State = State(Nil, 0L, 0L)

  /** Fold one micro-batch into the reservoir. Replayed doc_ids dedup to
    * their first arrival (same hash → same priority), so the TOP rows
    * are replay-idempotent; the exact running total is counting state
    * and is only advanced by NEW doc_ids in the kept frontier — exact
    * under at-least-once delivery only when the replay still overlaps
    * the batch top cut, which is the honest limit of a k-row state
    * (the spec pins both sides of it).
    */
  def observeBatch(mb: Dataset[Arrival], st: State): State = {
    val batch = withPriority(mb.toDF()
      .groupBy(col("doc_id")).agg(max(col("w")).as("w")))
      .select(col("priority"), col("doc_id"), col("w"))
      .orderBy(col("priority").desc, col("doc_id")).limit(PrioK + 1)
      .collect()
      .map(r => Entry(r.getLong(0), r.getLong(1), r.getLong(2)))
    val batchTotal = mb.toDF()
      .groupBy(col("doc_id")).agg(max(col("w")).as("w"))
      .agg(coalesce(sum(col("w")), lit(0L))).collect()(0).getLong(0)
    val batchN = mb.toDF().select(col("doc_id")).distinct().count()
    val seen = st.top.map(_.docId).toSet
    val fresh = batch.filterNot(e => seen.contains(e.docId))
    val merged = (st.top ++ fresh)
      .sortBy(e => (-e.priority, e.docId)).take(PrioK + 1)
    val dupInTop = batch.map(_.w).sum - fresh.map(_.w).sum
    State(merged, st.exactTotal + batchTotal - dupInTop, st.nSeen + batchN)
  }

  /** Drain a memory-stream query, reporting the running estimator after
    * each batch.
    */
  def run(arrivals: Dataset[Arrival]): (State, Seq[Long]) = {
    var st = emptyState
    val ests = Seq.newBuilder[Long]
    val q = arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[Arrival], _: Long) =>
        st = observeBatch(mb, st)
        ests += st.estTotal
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    (st, ests.result())
  }
}
