package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.queries.TextCorpusOps

/** Streaming HLL cardinality (L69 streaming form): the accumulated
  * register array must be byte-identical to a one-shot build over the
  * union of all arrivals under ANY micro-batch chunking or arrival order
  * (register max is associative/commutative/idempotent), replays must not
  * move the estimate (the idempotence counting aggregates lack), and the
  * running estimate must equal the batch operator's integer math on the
  * same data.
  */
class StreamingCardinalitySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingCardinality.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(graft.functions.Sketches.shingles(
          col("text"), graft.queries.LlmPipeline.ShingleN)).as("w"))
      .as[StreamingCardinality.Arrival].collect()

  private def oneShot(rows: Seq[StreamingCardinality.Arrival]): Array[Byte] = {
    val (regs, _) = StreamingCardinality.observeBatch(
      rows.toDS(), new Array[Byte](TextCorpusOps.HllM))
    regs
  }

  test("chunking/order invariance, replay idempotence, stream==batch estimate") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length > 1000)
    val reference = oneShot(rows.toSeq)

    // three uneven chunks, newest-first order, plus a full replay of the
    // middle chunk at the end — the replay must be a no-op
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 5)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a.toSeq, b.toSeq, c.toSeq, b.toSeq)
    }
    var regs = new Array[Byte](TextCorpusOps.HllM)
    val ests = Seq.newBuilder[Long]
    val stream = MemoryStream[StreamingCardinality.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingCardinality.Arrival],
            _: Long) =>
          val (r, e) = StreamingCardinality.observeBatch(mb, regs)
          regs = r
          ests += e
          ()
      }
      .start()
    try chunks.foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    } finally q.stop()

    assert(java.util.Arrays.equals(regs, reference),
      "accumulated registers differ from the one-shot build")
    val estimates = ests.result()
    assert(estimates.size === chunks.size)
    // replay idempotence: the trailing replay batch left the estimate put
    assert(estimates(3) === estimates(2), "a replayed chunk moved the estimate")
    // monotone: registers only grow, so the estimate never shrinks
    estimates.zip(estimates.tail).foreach { case (a, b) => assert(b >= a) }
    // stream==batch: the final readout is the batch operator's math
    assert(estimates.last === TextCorpusOps.hllEstimate(reference))
    // ...and it sits in the raw estimator's working range for this corpus
    val exact = rows.map(_.w).distinct.length
    assert(math.abs(estimates.last - exact).toDouble / exact < 0.5,
      s"estimate ${estimates.last} implausible vs exact $exact")
  }
}
