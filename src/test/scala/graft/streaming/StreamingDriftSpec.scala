package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming KS drift (L101 streaming form): the accumulated histogram
  * must equal a one-shot build under any chunking/order (count add is
  * associative+commutative), the final readout must reproduce the
  * oracle-gated q169 rows exactly, and per-batch sample sizes are
  * monotone.
  */
class StreamingDriftSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingDrift.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[StreamingDrift.Arrival].collect()

  test("chunking invariance + stream == batch q169 readout") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)

    // one-shot reference state over all arrivals at once
    val oneShot = StreamingDrift.observeBatch(
      spark.createDataset(rows.toSeq), StreamingDrift.empty)

    // micro-batched, newest-first chunks of uneven size
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingDrift.empty
    val sizes = Seq.newBuilder[Long]
    val stream = MemoryStream[StreamingDrift.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingDrift.Arrival],
            _: Long) =>
          st = StreamingDrift.observeBatch(mb, st)
          sizes += StreamingDrift.ksReport(st).map(r => r._2 + r._3).sum
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated state must equal one-shot build")
    val seen = sizes.result()
    assert(seen === seen.sorted, "sample sizes are monotone")
    assert(seen.last === 500L)

    // the readout reproduces the oracle-gated batch operator row-for-row
    val batchRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q169_ks_drift")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingDrift.ksReport(st) === batchRows)

    // ONE held state, every drift read: the W1 readout over the same
    // accumulated histogram reproduces the oracle-gated q186 rows
    val emdRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q186_emd_drift")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingDrift.emdReport(st) === emdRows)
  }

  test("PSI state: chunking invariance + stream == batch q170 readout") {
    implicit val sqlCtx = spark.sqlContext
    // the q170 feature ladder (BPE-ish token counts), as arrivals
    val rows = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"),
        graft.functions.TextFunctions.tokenCountBpeIsh(col("text"))
          .cast("long").as("toks"))
      .as[StreamingDrift.PsiArrival].collect()
    assert(rows.length === 500)

    val oneShot = StreamingDrift.observePsiBatch(
      spark.createDataset(rows.toSeq), StreamingDrift.empty)

    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingDrift.empty
    val stream = MemoryStream[StreamingDrift.PsiArrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingDrift.PsiArrival],
            _: Long) =>
          st = StreamingDrift.observePsiBatch(mb, st)
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated PSI state must equal one-shot build")

    // the readout completes the drift triple in streaming form: it
    // reproduces the oracle-gated q170 rows exactly
    val batchRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q170_psi_drift")(spark, sf)
        .as[(String, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingDrift.psiReport(st) === batchRows)
  }
}
