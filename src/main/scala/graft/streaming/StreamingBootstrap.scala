package graft.streaming

import org.apache.spark.sql.Dataset

/** Streaming form of L85's Poisson-bootstrap corpus CIs (q153): the
  * running per-(source, replicate) weighted totals over an ingest
  * stream, so the nightly corpus report's error bars are maintained
  * incrementally instead of re-scanned.
  *
  * Per micro-batch the batch's partials are built RELATIONALLY by the
  * SAME kernel the batch operator uses
  * ([[graft.queries.CorpusShapingOps.bootstrapReplicates]] — one
  * map-side-combined pass; only |sources|·R rows cross to the driver)
  * and ADDED into the held state. Every cell is an associative,
  * commutative BIGINT sum, so the accumulated state is VALUE-IDENTICAL
  * to a one-shot build over the union of all arrivals under any
  * chunking or arrival order (StreamingBootstrapSpec asserts it against
  * the registered q153). Like the CMS form — and unlike Bloom/HLL —
  * the state is NOT idempotent: a replayed batch double-counts
  * (counting state; the spec pins the property); exactly-once sinks or
  * the L31 admission pattern own replay protection. State is one
  * (nd, exact_chars, t2) triple per (source, replicate) — bounded by
  * |sources|·R, not stream length.
  */
object StreamingBootstrap {

  import graft.queries.CorpusShapingOps

  case class Arrival(doc_id: Long, source: String, n_chars: Long)

  /** (nd, exact_chars, t2) — all associative sums. */
  type Cell = (Long, Long, Long)
  type State = Map[(String, Long), Cell]

  def empty: State = Map.empty

  def add(a: State, b: State): State =
    (a.keySet ++ b.keySet).iterator.map { k =>
      val x = a.getOrElse(k, (0L, 0L, 0L))
      val y = b.getOrElse(k, (0L, 0L, 0L))
      k -> ((x._1 + y._1, x._2 + y._2, x._3 + y._3))
    }.toMap

  /** Fold one micro-batch into `st` (unmodified; a new map returns). */
  def observeBatch(mb: Dataset[Arrival], st: State): State = {
    val part = CorpusShapingOps.bootstrapReplicates(mb.toDF())
      .collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    add(st, part)
  }

  /** The q153 readout over the held state: per source —
    * (n_docs, exact_chars, boot_mean, boot_min, boot_max, boot_ssq),
    * exactly the registered query's outer aggregate re-expressed over
    * the |sources|·R cells.
    */
  def readout(st: State): Seq[(String, Long, Long, Long, Long, Long, Long)] =
    st.groupBy(_._1._1).map { case (src, cells) =>
      val vs = cells.values.toSeq
      val t2s = vs.map(_._3)
      (src, vs.map(_._1).max, vs.map(_._2).max,
        t2s.sum / (2L * CorpusShapingOps.BootReps),
        t2s.min / 2L, t2s.max / 2L,
        t2s.map(t => t * t).sum)
    }.toSeq.sortBy(_._1)

  /** Drain a memory-stream query, folding each micro-batch into state. */
  def run(arrivals: Dataset[Arrival]): State = {
    var st = empty
    val q = arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[Arrival], _: Long) =>
        st = observeBatch(mb, st)
        ()
      }
      .start()
    q.processAllAvailable()
    q.stop()
    st
  }
}
