package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.SparkSpec

/** Streaming effective-rank monitor (L131 streaming form): the
  * accumulated per-label Gram must equal a one-shot build under any
  * chunking/order, and the readout must reproduce the oracle-gated
  * q199 rows exactly.
  */
class StreamingGramSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingGram.Emb] =
    graft.core.CacheScope.scoped {
      graft.core.Tables.embeddings(spark, sf)
        .select("vec_id", "embedding", "label")
        .as[StreamingGram.Emb].collect()
    }

  test("chunking invariance + stream == batch q199 readout") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.nonEmpty)

    val oneShot = StreamingGram.observeBatch(
      spark.createDataset(rows.toSeq), StreamingGram.empty)

    // micro-batched, newest-first chunks of uneven size
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    var st = StreamingGram.empty
    val stream = MemoryStream[StreamingGram.Emb]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingGram.Emb], _: Long) =>
          st = StreamingGram.observeBatch(mb, st)
          ()
      }
      .start()
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated Gram must equal one-shot build")

    val batchRows = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q199_effective_rank")(spark, sf)
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    }
    assert(StreamingGram.effectiveRankReport(st) === batchRows)
  }
}
