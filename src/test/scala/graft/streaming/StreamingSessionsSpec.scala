package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming sessionization (T11 streaming form): closed sessions under
  * event-time-ordered multi-batch arrival must equal the batch q82 rollups
  * on the same fixture, and the event-time timeout must flush the final
  * open session per key once the watermark passes its gap.
  */
class StreamingSessionsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val GapUs = 1800000000L // 30 min — q82's SessionGapUs

  test("streamed gap sessions == batch q82 under time-ordered 4-batch arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = graft.core.Tables.events(spark, sf)
      .select(col("event_id"), expr("ts div 1000").as("tsu"), col("user_id"))
      .as[StreamingSessions.Ev].collect().sortBy(e => (e.tsu, e.event_id))

    val stream = MemoryStream[StreamingSessions.Ev]
    val q = StreamingSessions.sessionize(stream.toDS(), GapUs, "0 seconds")
      .writeStream.format("memory").queryName("stream_sessions").outputMode("append")
      .start()
    try {
      evs.grouped(evs.length / 4 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      // sentinel far past every session's gap: advances the watermark so
      // the last open session of every key times out and flushes
      val flushAt = evs.map(_.tsu).max + 1000L * GapUs
      stream.addData(StreamingSessions.Ev(-1L, flushAt, -1L))
      q.processAllAvailable()
      stream.addData(StreamingSessions.Ev(-2L, flushAt + GapUs + 1, -1L))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("stream_sessions").as[StreamingSessions.SessionOut]
      .collect().filter(_.user_id >= 0)
      .map(s => (s.user_id, s.session_start, s.session_end, s.n_events, s.duration_us))
      .sortBy(t => (t._1, t._2))

    val want = graft.SparkEntry.queries("q82_sessionize")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2), r.getLong(5)))
      .sortBy(t => (t._1, t._2))

    assert(got.length === want.length,
      s"session count: streamed ${got.length} vs batch ${want.length}")
    got.zip(want).foreach { case (g, w) =>
      assert(g === w, s"session mismatch: streamed $g vs batch $w")
    }
  }
}
