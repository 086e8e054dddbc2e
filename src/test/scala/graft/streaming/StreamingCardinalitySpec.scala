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
    // monotone IN THE RAW ESTIMATOR's terms: registers only grow. The
    // corrected readout may step down once at the LC→raw boundary (the
    // two-regime estimator's documented behavior), so the strict check
    // applies to estimates after the raw regime is reached; this
    // fixture's chunks are large enough that every readout is raw-regime
    estimates.zip(estimates.tail).foreach { case (a, b) =>
      assert(b >= a, "estimate shrank within this fixture's raw regime")
    }
    // stream==batch: the final readout is the batch operator's
    // TWO-REGIME math (q137's `est` column)
    assert(estimates.last === TextCorpusOps.hllEstimateCorrected(reference))
    // ...and it sits in the raw estimator's working range for this corpus
    val exact = rows.map(_.w).distinct.length
    assert(math.abs(estimates.last - exact).toDouble / exact < 0.5,
      s"estimate ${estimates.last} implausible vs exact $exact")
  }

  test("linear-counting regime: a small stream reads m·ln(m/V), accurate where raw is biased") {
    // 40 distinct tokens into 64 registers — the small-range regime the
    // LC branch exists for. The streaming readout must (a) fire the
    // branch, (b) equal the shared ladder math exactly, and (c) land
    // far closer to truth than the raw harmonic estimate
    val small = (0 until 40).map(i =>
      StreamingCardinality.Arrival(i.toLong, s"tok$i"))
    val (regs, est) = StreamingCardinality.observeBatch(
      small.toDS(), new Array[Byte](TextCorpusOps.HllM))
    val v = regs.count(_ == 0).toLong
    val raw = TextCorpusOps.hllEstimate(regs)
    assert(v > 0 && raw * 2 <= 5L * TextCorpusOps.HllM,
      s"fixture must sit in the LC regime (v=$v raw=$raw)")
    assert(est === TextCorpusOps.hllLcScala(TextCorpusOps.HllM, v))
    assert(math.abs(est - 40L) <= math.abs(raw - 40L),
      s"LC ($est) must not be farther from truth than raw ($raw)")
    assert(math.abs(est - 40L) <= 6L, s"LC estimate $est vs 40 distinct")
  }
}
