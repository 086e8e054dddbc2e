package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.Sketches

/** Streaming CMS frequency (L67 streaming form): the accumulated counter
  * matrix must be byte-identical to a one-shot build over the
  * concatenation of all arrivals under any chunking/order (counter add is
  * associative+commutative), running estimates must never undercount the
  * exact prefix counts and must be monotone, and — unlike the Bloom/HLL
  * state — a replay MUST move the counters (counting state is not
  * idempotent; pinning it here keeps the property from being mistaken
  * for a bug later).
  */
class StreamingFrequencySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  import spark.implicits._

  private def arrivals(): Array[StreamingFrequency.Arrival] =
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        explode(Sketches.words(col("text"))).as("w"))
      .as[StreamingFrequency.Arrival].collect()

  private def oneShot(rows: Seq[StreamingFrequency.Arrival]): Array[Byte] =
    StreamingFrequency.observeBatch(rows.toDS(),
      StreamingFrequency.emptySketch)

  test("chunking invariance, monotone never-undercount, replay counts") {
    implicit val sqlCtx = spark.sqlContext
    val rows = arrivals()
    assert(rows.length > 1000)
    val probes = rows.map(_.w).distinct.sorted.take(3).toSeq :+
      "absent-term-xyzzy"
    val hs = probes.map(Sketches.h64Scala)

    // chunks: newest-first order with a mid-stream replay of chunk b —
    // the reference one-shot must therefore contain b TWICE
    val chunks = {
      val (a, rest) = rows.reverse.splitAt(rows.length / 5)
      val (b, c) = rest.splitAt(rest.length / 2)
      Seq(a.toSeq, b.toSeq, b.toSeq, c.toSeq)
    }
    val reference = oneShot(chunks.flatten)
    val refNoReplay = oneShot(chunks.head ++ chunks(1) ++ chunks(3))

    var sk = StreamingFrequency.emptySketch
    val perBatch = Seq.newBuilder[Seq[Long]]
    val stream = MemoryStream[StreamingFrequency.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingFrequency.Arrival],
            _: Long) =>
          sk = StreamingFrequency.observeBatch(mb, sk)
          perBatch += hs.map(StreamingFrequency.estimate(sk, _))
          ()
      }
      .start()
    try chunks.foreach { chunk =>
      stream.addData(chunk)
      q.processAllAvailable()
    } finally q.stop()

    assert(java.util.Arrays.equals(sk, reference),
      "accumulated matrix differs from the one-shot build")
    assert(!java.util.Arrays.equals(sk, refNoReplay),
      "a replayed chunk must move counting state (CMS is not idempotent)")

    val ests = perBatch.result()
    assert(ests.size === chunks.size)
    // per-term estimates are monotone non-decreasing across batches
    ests.zip(ests.tail).foreach { case (prev, cur) =>
      prev.zip(cur).foreach { case (p, c) => assert(c >= p) }
    }
    // one-sided at every prefix: estimate >= exact count of arrivals so far
    val prefixes = chunks.inits.toSeq.reverse.tail.map(_.flatten)
    ests.zip(prefixes).foreach { case (est, prefix) =>
      val exact = prefix.groupBy(_.w).view.mapValues(_.size.toLong).toMap
      probes.zip(est).foreach { case (p, e) =>
        assert(e >= exact.getOrElse(p, 0L),
          s"undercount for '$p' at a stream prefix")
      }
    }
    // the readout helper agrees with the codegen'd query expression
    val viaExpr = spark.range(1).select(
      probes.map(p => graft.functions.Sketches.h64(lit(p))).zipWithIndex
        .map { case (h, i) => org.apache.spark.sql.functions
          .call_function("graft_cms_query", lit(sk), h,
            lit(graft.queries.TextCorpusOps.CmsDepth)).as(s"e$i") }: _*)
      .collect()(0)
    probes.indices.foreach { i =>
      assert(viaExpr.getLong(i) === ests.last(i),
        "driver readout diverges from graft_cms_query")
    }
  }
}
