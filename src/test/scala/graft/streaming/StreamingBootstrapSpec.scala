package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream==batch, order/chunking invariance and the pinned
  * NON-idempotence of the L85 bootstrap's streaming form, against the
  * registered q153 as the reference.
  */
class StreamingBootstrapSpec extends SparkSpec {

  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def arrivals(): Seq[StreamingBootstrap.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
      .as[StreamingBootstrap.Arrival].collect().toSeq

  test("chunked/reordered stream reproduces the registered q153 rows") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)
    // newest-first, uneven chunks
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 7)
      val (b, c) = rest.splitAt(rest.length / 3)
      Seq(a, b, c)
    }
    val stream = MemoryStream[StreamingBootstrap.Arrival]
    chunks.foreach(c => stream.addData(c))
    val st = StreamingBootstrap.run(stream.toDS())
    val got = StreamingBootstrap.readout(st)
    val want = graft.SparkEntry.queries("q153_bootstrap_ci")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq.sortBy(_._1)
    assert(got === want, "stream readout must equal the batch gate")
  }

  test("add is order-insensitive; replay double-counts (pinned)") {
    val rows = arrivals()
    val (a, b) = rows.splitAt(200)
    val sa = StreamingBootstrap.observeBatch(a.toDS(),
      StreamingBootstrap.empty)
    val sb = StreamingBootstrap.observeBatch(b.toDS(),
      StreamingBootstrap.empty)
    assert(StreamingBootstrap.add(sa, sb) ===
      StreamingBootstrap.add(sb, sa), "commutative merge")
    // NOT idempotent: counting state — a replayed chunk MUST move it
    val replayed = StreamingBootstrap.add(StreamingBootstrap.add(sa, sb), sb)
    val once = StreamingBootstrap.add(sa, sb)
    assert(replayed !== once, "replay must double-count (counting state)")
    val srcOfB = b.head.source
    val ndOnce = once.filter(_._1._1 == srcOfB).values.map(_._1).max
    val ndTwice = replayed.filter(_._1._1 == srcOfB).values.map(_._1).max
    assert(ndTwice > ndOnce)
  }
}
