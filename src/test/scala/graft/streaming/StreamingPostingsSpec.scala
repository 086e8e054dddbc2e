package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Streaming BM25 statistics (L95 streaming form): accumulated df /
  * n / Σdl must equal a one-shot build under any chunking, and the idf
  * readout must reproduce the batch q163 scoring ladder's idf for the
  * planted benchmark grams.
  */
class StreamingPostingsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingPostings.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text"))
      .as[StreamingPostings.Arrival].collect()

  test("chunking invariance + idf readout matches the batch ladder") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length === 500)
    val oneShot = StreamingPostings.observeBatch(
      spark.createDataset(rows.toSeq), StreamingPostings.empty)

    var st = StreamingPostings.empty
    val ns = Seq.newBuilder[Long]
    val stream = MemoryStream[StreamingPostings.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingPostings.Arrival],
            _: Long) =>
          st = StreamingPostings.observeBatch(mb, st)
          ns += st.n
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
    val seen = ns.result()
    assert(seen === seen.sorted && seen.last === 500L)

    // idf readout vs an independent replay of the batch ladder
    def grams(t: String): Seq[String] = {
      val w = t.trim.split("\\s+").toSeq
      if (w.size < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = rows.map(r => grams(r.text))
    val n = all.length.toLong
    def ilog2(x: Long): Long = 63 - java.lang.Long.numberOfLeadingZeros(x)
    graft.queries.RetrievalOps.benchGrams.foreach { g =>
      val df = all.count(_.contains(g)).toLong
      val expect = ilog2(((n - df + 1) * 1048576L) / (df + 1))
      assert(StreamingPostings.idf(st, g) === expect, s"idf of '$g'")
      assert(df > 0L, s"benchmark gram '$g' must occur in the fixture")
    }
    assert(StreamingPostings.avgdl(st) ===
      all.map(_.size.toLong).sum / n)
    // a never-seen gram takes the unseen-term ceiling (df = 0)
    assert(StreamingPostings.idf(st, "xyzzy absent") ===
      ilog2((n + 1) * 1048576L))
  }
}
