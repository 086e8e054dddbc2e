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

  test("timeout clamps above the watermark when the delay exceeds the gap") {
    // a legitimately-late event (inside the watermark delay, but older than
    // watermark - gap) computes end + gap <= watermark; unclamped, the
    // state API rejects that timestamp and kills the whole query
    val watermarkMs = 10_000_000L
    val lateTsu = (watermarkMs - 60_000L) * 1000L // 60 s before the watermark
    val gapUs = 10_000_000L                       // 10 s gap << 60 s lateness
    val state = org.apache.spark.sql.streaming.TestGroupState.create[StreamingSessions.SessState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(watermarkMs)),
      hasTimedOut = false)
    StreamingSessions.sessionFunc(gapUs)(
      7L, Iterator(StreamingSessions.Ev(1L, lateTsu, 7L)), state).toList
    assert(state.getTimeoutTimestampMs.isPresent)
    assert(state.getTimeoutTimestampMs.get() === watermarkMs + 1,
      "computed timeout at/before the watermark must clamp to watermark + 1")
  }

  test("expired events (older than the watermark) are dropped, not sessioned") {
    // The reference's stale policy (F8/T4: `stale < now` → drop) in
    // streaming form: an event that arrives AFTER the watermark has passed
    // its timestamp is expired — Spark's pre-state late-row filter must
    // drop it so it neither reopens a closed session nor emits a new one.
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 10_000_000L // 10 s gap, zero watermark delay
    val stream = MemoryStream[StreamingSessions.Ev]
    val q = StreamingSessions.sessionize(stream.toDS(), gapUs, "0 seconds")
      .writeStream.format("memory").queryName("expired_sessions").outputMode("append")
      .start()
    val base = 200_000_000_000L
    try {
      stream.addData(StreamingSessions.Ev(1L, base, 1L))
      q.processAllAvailable()
      // sentinel pushes the watermark far past base + gap: user 1's session
      // times out and closes with exactly one event
      stream.addData(StreamingSessions.Ev(-1L, base + 1_000_000_000_000L, -1L))
      q.processAllAvailable()
      // EXPIRED: an event for user 1 a hair after its closed session —
      // far older than the watermark — and an expired event for a user
      // never seen before; both must vanish without a trace
      stream.addData(StreamingSessions.Ev(2L, base + 1_000_000L, 1L),
        StreamingSessions.Ev(3L, base + 2_000_000L, 9L))
      q.processAllAvailable()
      // flush anything that (incorrectly) opened
      stream.addData(StreamingSessions.Ev(-2L, base + 2_000_000_000_000L, -1L))
      q.processAllAvailable()
      stream.addData(StreamingSessions.Ev(-3L, base + 3_000_000_000_000L, -1L))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("expired_sessions").as[StreamingSessions.SessionOut]
      .collect().filter(_.user_id >= 0)
    assert(closed.count(_.user_id == 1L) === 1, s"user 1 must close exactly once: ${closed.toSeq}")
    val s1 = closed.find(_.user_id == 1L).get
    assert(s1.n_events === 1L && s1.session_end === base,
      s"the expired event must not extend the closed session: $s1")
    assert(!closed.exists(_.user_id == 9L),
      s"an expired event must not open a session for a new key: ${closed.toSeq}")
  }

  test("sessions survive a watermark delay longer than the gap (end-to-end)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val gapUs = 10_000_000L // 10 s gap, 1 h delay: every event takes the clamp-risk path
    val stream = MemoryStream[StreamingSessions.Ev]
    val q = StreamingSessions.sessionize(stream.toDS(), gapUs, "1 hour")
      .writeStream.format("memory").queryName("late_sessions").outputMode("append")
      .start()
    try {
      val base = 100_000_000_000L
      stream.addData(StreamingSessions.Ev(1L, base, 1L))
      q.processAllAvailable()
      // out-of-order events within the delay, older than watermark - gap
      stream.addData(StreamingSessions.Ev(2L, base - 1_000_000_000L, 1L),
        StreamingSessions.Ev(3L, base - 990_000_000L, 2L))
      q.processAllAvailable()
      // sentinel advances the watermark far enough to flush everything
      stream.addData(StreamingSessions.Ev(-1L, base + 10_000_000_000_000L, -1L))
      q.processAllAvailable()
      stream.addData(StreamingSessions.Ev(-2L, base + 10_000_100_000_000L, -1L))
      q.processAllAvailable()
    } finally q.stop()
    val closed = spark.table("late_sessions").as[StreamingSessions.SessionOut]
      .collect().filter(_.user_id >= 0)
    assert(closed.exists(_.user_id == 1L) && closed.exists(_.user_id == 2L),
      s"late events must still close sessions, got ${closed.toSeq}")
  }
}
