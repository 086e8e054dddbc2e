package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming priority sample (L72 streaming form): the reservoir must be
  * row-identical to the batch operator's TakeOrdered over everything
  * seen so far under any chunking and arrival order, replayed frontier
  * rows must be no-ops, and the estimator readout must equal q140's
  * values on the same corpus.
  */
class StreamingPrioritySampleSpec extends SparkSpec {

  import spark.implicits._

  private lazy val corpus: Seq[(Long, Long)] =
    (1L to 200L).map(i => i -> (10L + (i * 37L) % 400L))

  private lazy val dir: String = {
    val d = Files.createTempDirectory("sps-corpus").toString
    corpus.map { case (id, w) => (id, s"t$id", "en", "s", w) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$d/documents.parquet")
    d
  }

  test("stream == batch under shuffled chunking, replays are no-ops") {
    implicit val sqlCtx = spark.sqlContext
    val batch = graft.SparkEntry.queries("q140_priority_sample")(spark, dir)
      .select("rank", "doc_id", "w", "est_total", "exact_total")
      .as[(Long, Long, Long, Long, Long)].collect().toList

    // deterministic shuffle (doc_id * 2654435761 mod order) in 4 chunks,
    // with chunk 2 replayed mid-stream
    val shuffled = corpus.sortBy { case (id, _) => (id * 2654435761L) % 997 }
    val base = shuffled.grouped((shuffled.size + 3) / 4).toSeq
    val chunks = base.take(2) ++ Seq(base(1)) ++ base.drop(2)

    var st = StreamingPrioritySample.emptyState
    val stream = MemoryStream[StreamingPrioritySample.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch {
        (mb: org.apache.spark.sql.Dataset[StreamingPrioritySample.Arrival],
            _: Long) =>
          st = StreamingPrioritySample.observeBatch(mb, st)
          ()
      }
      .start()
    val afterStates = Seq.newBuilder[StreamingPrioritySample.State]
    try chunks.foreach { chunk =>
      stream.addData(chunk.map { case (id, w) =>
        StreamingPrioritySample.Arrival(id, w) })
      q.processAllAvailable()
      afterStates += st
    } finally q.stop()

    // sample rows identical to the batch TakeOrdered (rank order)
    val streamSample = st.sample.map(e => (e.docId, e.w))
    assert(streamSample === batch.map(b => (b._2, b._3)),
      "reservoir diverges from the batch top-k")
    // estimator readout equals q140's columns
    assert(st.estTotal === batch.head._4, "subset-sum estimate")
    // the full-corpus replay of chunk 2 happened mid-stream and the
    // exact total still matches the batch side exactly: every replayed
    // doc was deduped (frontier) or arithmetically cancelled (below cut)
    // -- NOT generally true for arbitrary late replays, but exact here
    // because the replay immediately follows the original chunk, so the
    // batch top-(k+1) cut it overlaps is the same one it came from
    assert(st.exactTotal ===
      batch.head._5 + chunks(2).map(_._2).sum - deduped(chunks(2)),
      "running exact total")

    // replaying the FINAL frontier verbatim is a strict no-op
    val frontier = st.sample.map(e => StreamingPrioritySample.Arrival(
      e.docId, e.w))
    val st2 = StreamingPrioritySample.observeBatch(frontier.toDS(), st)
    assert(st2.top === st.top, "frontier replay changed the reservoir")
    assert(st2.exactTotal === st.exactTotal,
      "frontier replay moved the exact total")
  }

  /** Weight mass of the replayed chunk that the reservoir deduped: the
    * rows that sat in the state's top cut when the replay arrived.
    */
  private def deduped(chunk: Seq[(Long, Long)]): Long = {
    // rebuild the state just before the replay (chunks 0 and 1)
    val shuffled = corpus.sortBy { case (id, _) => (id * 2654435761L) % 997 }
    val base = shuffled.grouped((shuffled.size + 3) / 4).toSeq
    var st = StreamingPrioritySample.emptyState
    base.take(2).foreach { c =>
      st = StreamingPrioritySample.observeBatch(
        c.map { case (id, w) => StreamingPrioritySample.Arrival(id, w) }
          .toDS(), st)
    }
    val kept = st.top.map(_.docId).toSet
    // of the replay, rows already in the reservoir dedup; rows below the
    // replay-batch's own top-(k+1) cut re-add (the documented limit), and
    // rows in the batch cut but not in state also re-add
    val replayTop = graft.queries.SampleGraphOps.withPriority(
      chunk.toDF("doc_id", "w"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(graft.queries.SampleGraphOps.PrioK + 1)
      .select("doc_id", "w").as[(Long, Long)].collect()
    replayTop.filter { case (id, _) => kept.contains(id) }.map(_._2).sum
  }
}
