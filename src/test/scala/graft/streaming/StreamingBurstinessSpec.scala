package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming burstiness statistics (L133 streaming form): accumulated
  * (df, Σc, Σc²) per term must equal a one-shot build under any
  * chunking, and the VMR readout must reproduce the batch q201 ladder
  * for the fixture's reported terms.
  */
class StreamingBurstinessSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingBurstiness.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[StreamingBurstiness.Arrival].collect()

  test("chunking invariance + VMR readout matches the batch query") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)
    val oneShot = StreamingBurstiness.observeBatch(
      spark.createDataset(rows.toSeq), StreamingBurstiness.empty)

    var st = StreamingBurstiness.empty
    val stream = MemoryStream[StreamingBurstiness.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingBurstiness.Arrival],
            _: Long) =>
          st = StreamingBurstiness.observeBatch(mb, st)
          ()
      }
      .start()
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 3)
      val (b, c) = rest.splitAt(rest.length / 4)
      Seq(a.toSeq, b.toSeq, c.toSeq)
    }
    chunks.foreach { ch => stream.addData(ch); q.processAllAvailable() }
    q.stop()

    assert(st === oneShot, "accumulated stats must equal one-shot build")
    assert(st.nDocs === 500L)

    // VMR readout vs the registered batch query's reported rows
    val batch = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q201_term_burstiness")(spark, sf).collect()
    }
    assert(batch.nonEmpty)
    batch.foreach { r =>
      val term = r.getString(0)
      assert(StreamingBurstiness.vmr(st, term) === Some(r.getLong(4)),
        s"vmr of '$term'")
      val (df, tot, ssq) = st.terms(term)
      assert(df === r.getLong(1) && tot === r.getLong(2) &&
        ssq === r.getLong(3), s"triple of '$term'")
    }
    assert(StreamingBurstiness.vmr(st, "no-such-term-ever") === None)
  }
}
