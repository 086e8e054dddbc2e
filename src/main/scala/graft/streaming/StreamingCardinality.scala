package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Streaming form of L69's HLL cardinality (q137): the running
  * distinct-count readout over an ingest stream, with state held as the
  * 64-register array instead of the unbounded exact distinct set.
  *
  * Per micro-batch the batch's register maxima are derived RELATIONALLY
  * (the exact per-row math q137 uses — `TextCorpusOps.hllReg` /
  * `hllRhoC`, one map-side-combined aggregate collapsing the batch to
  * ≤64 rows) and merged into the held array by MAX. Register max is
  * associative/commutative/idempotent, so the accumulated array is
  * BYTE-IDENTICAL to a one-shot build over the union of all arrivals
  * regardless of micro-batch chunking or arrival order
  * (`StreamingCardinalitySpec` asserts the bytes), replays cannot
  * inflate the estimate (idempotence — the property counting-based
  * streaming aggregates lack), and a restart rebuilds or checkpoints a
  * 64-BYTE artifact. State is the register array alone: memory fixed by
  * the geometry dial, NOT by stream length or distinct history.
  */
object StreamingCardinality {

  import graft.queries.TextCorpusOps.{HllM, hllEstimateCorrected,
    hllReg, hllRhoC}

  case class Arrival(doc_id: Long, w: String)

  /** Fold one micro-batch into `regs` (unmodified; a new array returns)
    * and report the running integer estimate after the merge — the
    * TWO-REGIME readout q137's `est` column computes relationally
    * (linear counting while zero registers remain and the raw estimate
    * sits under 5m/2, raw harmonic mean after), so stream == batch
    * holds for the corrected estimator, not just the raw one. The batch
    * pass is one explode-free map + a ≤64-row aggregate; only the
    * register rows cross to the driver.
    */
  def observeBatch(mb: Dataset[Arrival],
      regs: Array[Byte]): (Array[Byte], Long) = {
    require(regs.length == HllM, s"expected $HllM registers")
    val h = graft.functions.Sketches.h64(col("w"))
    val batchRegs = mb.toDF()
      .select(hllReg(h).as("reg"), hllRhoC(h).as("rho"))
      .groupBy(col("reg")).agg(max(col("rho")).as("r"))
      .collect()
    val out = regs.clone()
    batchRegs.foreach { row =>
      val reg = row.getLong(0).toInt
      val r = row.getLong(1)
      if (r > (out(reg) & 0xff)) out(reg) = r.toByte
    }
    (out, hllEstimateCorrected(out))
  }

  /** Drain a memory-stream query: fold every pending micro-batch through
    * [[observeBatch]] via foreachBatch, returning the final registers and
    * the per-batch running estimates (the readout a monitoring sink would
    * publish).
    */
  def run(arrivals: Dataset[Arrival], regs0: Array[Byte])
      : (Array[Byte], Seq[Long]) = {
    var regs = regs0
    val ests = Seq.newBuilder[Long]
    val q = arrivals.writeStream
      .outputMode("append")
      .foreachBatch { (mb: Dataset[Arrival], _: Long) =>
        val (r, e) = observeBatch(mb, regs)
        regs = r
        ests += e
        () // the += above returns the builder; foreachBatch wants Unit
      }
      .start()
    q.processAllAvailable()
    q.stop()
    (regs, ests.result())
  }
}
