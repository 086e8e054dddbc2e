package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming AUC monitor (L109 streaming form): the accumulated class
  * histogram must equal a one-shot build under any chunking/order, the
  * readout must reproduce the oracle-gated q177 rows exactly, and
  * per-batch sample sizes are monotone.
  */
class StreamingAucSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingAuc.Scored] =
    graft.core.CacheScope.scoped {
      graft.queries.TrainedFilterOps.nbDocScores(spark, sf)
        .select(col("doc_id"), col("source"), col("pos"), col("score"))
        .as[StreamingAuc.Scored].collect()
    }

  test("chunking invariance + stream == batch q177 readout") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)

    val oneShot = StreamingAuc.observeBatch(
      spark.createDataset(rows.toSeq), StreamingAuc.empty)

    // micro-batched, newest-first chunks of uneven size
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingAuc.empty
    val sizes = Seq.newBuilder[Long]
    val stream = MemoryStream[StreamingAuc.Scored]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingAuc.Scored],
            _: Long) =>
          st = StreamingAuc.observeBatch(mb, st)
          sizes += StreamingAuc.aucReport(st).map(r => r._2 + r._3).sum
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated state must equal one-shot build")
    val seen = sizes.result()
    assert(seen === seen.sorted, "sample sizes are monotone")
    assert(seen.last === 500L)

    val batchRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q177_classifier_auc")(spark, sf)
        .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingAuc.aucReport(st) === batchRows)
  }
}
