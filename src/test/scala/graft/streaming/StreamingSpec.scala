package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.SparkSpec
import graft.queries.Temporal

/** Streaming-state semantics: the flatMapGroupsWithState merge must agree
  * with the batch analogs (q09 latest-state, q16 fill-if-missing) on the
  * same data under out-of-order arrival, and event-time TTL must expire
  * idle keys (T2).
  */
class StreamingSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed keyed merge == batch q09/q16 under shuffled 3-chunk arrival") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val evs = KeyedMerge.eventsAsDs(spark, sf).collect()
    val stream = MemoryStream[KeyedMerge.Ev]
    val q = KeyedMerge.latestState(stream.toDS(), ttlMicros = None, "3650 days")
      .writeStream.format("memory").queryName("keyed_merge").outputMode("update")
      .start()
    try {
      // event_id is uncorrelated with event time, so chunking by id modulo
      // interleaves heavily out-of-order batches
      (0 until 3).foreach { r =>
        stream.addData(evs.filter(_.event_id % 3 == r).toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    // final state per key = the emission with the highest update counter
    val got = spark.table("keyed_merge").as[KeyedMerge.StateOut].collect()
      .groupBy(_.user_id).map { case (_, rows) => rows.maxBy(_.n_updates) }

    val wantLatest = Temporal.q09.run(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
      .toMap
    val wantFilled = Temporal.q16.run(spark, sf).collect()
      .map(r => r.getLong(0) -> Option(r.get(1)).map(_.asInstanceOf[Double]))
      .toMap

    assert(got.size === wantLatest.size)
    got.foreach { s =>
      val (eid, tsu, etype, v) = wantLatest(s.user_id)
      assert((s.event_id, s.tsu, s.event_type, s.value) === ((eid, tsu, etype, v)),
        s"latest-state mismatch for user ${s.user_id}")
      assert(s.filled === wantFilled(s.user_id), s"filled mismatch for user ${s.user_id}")
    }
  }

  test("event-time TTL expires idle keys with a tombstone") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 1000000000000L // µs
    val hour = 3600000000L
    val stream = MemoryStream[KeyedMerge.Ev]
    val q = KeyedMerge.latestState(stream.toDS(),
        ttlMicros = Some(KeyedMerge.DefaultTtlMicros), "0 seconds")
      .writeStream.format("memory").queryName("ttl_merge").outputMode("update")
      .start()
    try {
      stream.addData(KeyedMerge.Ev(1, t0, 1, "click", 1.0),
        KeyedMerge.Ev(2, t0, 2, "click", 2.0))
      q.processAllAvailable()
      stream.addData(KeyedMerge.Ev(3, t0 + 7 * hour, 2, "view", 3.0)) // advances watermark past user 1's TTL
      q.processAllAvailable()
      stream.addData(KeyedMerge.Ev(4, t0 + 8 * hour, 2, "view", 4.0)) // next batch fires the timeout
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("ttl_merge").as[KeyedMerge.StateOut].collect()
    val expired = out.filter(_.expired)
    assert(expired.map(_.user_id).toSeq === Seq(1L), s"got ${expired.toSeq}")
    // user 2 stayed alive through its updates
    assert(out.filter(o => o.user_id == 2 && !o.expired).map(_.n_updates).max === 3L)
  }

  test("T8/K6: checkpointed state survives a query restart") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val tmp = java.nio.file.Files.createTempDirectory("graft_ckpt")
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString
    val t0 = 3000000000000L
    def sinkTo(ds: org.apache.spark.sql.Dataset[KeyedMerge.StateOut]) =
      ds.writeStream.outputMode("update")
        .option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyedMerge.StateOut], _: Long) =>
          batch.write.mode("append").parquet(outDir)
        }

    // run 1: two events for key 7, then a clean stop
    val s1 = MemoryStream[KeyedMerge.Ev]
    val q1 = sinkTo(KeyedMerge.latestState(s1.toDS(), None, "1 hour")).start()
    try {
      s1.addData(KeyedMerge.Ev(1, t0, 7, "click", 1.0),
        KeyedMerge.Ev(2, t0 + 1, 7, "view", 2.0))
      q1.processAllAvailable()
    } finally q1.stop()

    // run 2: SAME checkpoint, fresh source — the state store must restore
    // key 7's state (reference: snapshot reload with re-validation,
    // ais-proxy/server.js:210-247)
    val s2 = MemoryStream[KeyedMerge.Ev]
    s2.addData(KeyedMerge.Ev(1, t0, 7, "click", 1.0),
      KeyedMerge.Ev(2, t0 + 1, 7, "view", 2.0)) // replayed batch 0 (offsets restart)
    val q2 = sinkTo(KeyedMerge.latestState(s2.toDS(), None, "1 hour")).start()
    try {
      s2.addData(KeyedMerge.Ev(3, t0 + 2, 7, "error", 9.0))
      q2.processAllAvailable()
    } finally q2.stop()

    val out = spark.read.parquet(outDir).as[KeyedMerge.StateOut].collect()
    val last = out.maxBy(_.n_updates)
    // 2 updates from run 1's state + 1 new event = 3; the error row carries
    // no reading so filled stays 2.0
    assert(last.n_updates === 3L, s"state not restored: $out")
    assert(last.event_id === 3L && last.filled === Some(2.0))
  }

  test("vessel per-field precedence merge (J5/T1/T3) — field-by-field table") {
    import VesselMerge._
    val t = 1000L
    def obs(src: String, ts: Long, name: Option[String] = None,
        shipType: Option[Int] = None, draught: Option[Double] = None,
        lat: Option[Double] = None, lon: Option[Double] = None) =
      VesselObs(1L, ts, src, name, shipType, None, None, None, draught, lat, lon)

    // AIS static overwrites when present; absent fields never clear
    val s1 = mergeObs(empty(1), obs("ais", t, name = Some("ALFA"), shipType = Some(70)))
    val s2 = mergeObs(s1, obs("ais", t + 1, name = Some("BRAVO")))
    assert(s2.name === Some("BRAVO") && s2.shipType === Some(70))
    assert(s2.nameSource === Some("ais"))

    // enrichment fills ONLY missing fields
    val s3 = mergeObs(s2, obs("marinesia", t + 2, name = Some("CHARLIE"), draught = Some(5.5)))
    assert(s3.name === Some("BRAVO"), "enrichment must not overwrite a present name")
    assert(s3.draught === Some(5.5), "enrichment fills the missing draught")

    // zero counts as missing: an AIS draught of 0 is fillable later
    val z1 = mergeObs(empty(1), obs("ais", t, draught = Some(0.0)))
    val z2 = mergeObs(z1, obs("marinesia", t + 1, draught = Some(7.0)))
    assert(z2.draught === Some(7.0))

    // marinesia-first name fills and tags provenance; later AIS overwrites it
    val m1 = mergeObs(empty(1), obs("marinesia", t, name = Some("MIKE")))
    assert(m1.name === Some("MIKE") && m1.nameSource === Some("marinesia"))
    val m2 = mergeObs(m1, obs("ais", t + 1, name = Some("NOVEMBER")))
    assert(m2.name === Some("NOVEMBER") && m2.nameSource === Some("ais"))

    // position: enrichment applies only when NEWER than the last position
    val p1 = mergeObs(empty(1), obs("ais", t + 10, lat = Some(-41.0), lon = Some(174.0)))
    val pOld = mergeObs(p1, obs("marinesia", t + 5, lat = Some(-42.0), lon = Some(175.0)))
    assert(pOld.lat === Some(-41.0) && pOld.posTs === t + 10, "older enrichment position ignored")
    val pNew = mergeObs(p1, obs("marinesia", t + 20, lat = Some(-42.0), lon = Some(175.0)))
    assert(pNew.lat === Some(-42.0) && pNew.posTs === t + 20)
  }

  test("T7: Trigger.AvailableNow drains the backlog then stops on its own") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val t0 = 4000000000000L
    val s = MemoryStream[KeyedMerge.Ev]
    s.addData(KeyedMerge.Ev(1, t0, 1, "click", 1.0),
      KeyedMerge.Ev(2, t0 + 1, 2, "view", 2.0))
    val q = KeyedMerge.latestState(s.toDS(), None, "1 hour")
      .writeStream.format("memory").queryName("avail_now").outputMode("update")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000) // self-terminates after draining
    assert(!q.isActive, "AvailableNow query should stop itself")
    assert(spark.table("avail_now").count() === 2)
  }

  test("S1/S14: readStream graft-rest feeds the keyed merge, cursor survives restart") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_merge").toFile
    def page(p: Int, id: Long, typ: String, k: Long): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, s"page-$p.json"), "UTF-8")
      try w.write(s"""{"page":$p,"items":[{"id":$id,"type":"$typ","k":$k}],"total":1}""")
      finally w.close()
    }
    page(0, 7L, "click", 100L)
    page(1, 7L, "view", 200L)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rest_merge_ckpt")
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString

    // the WebSocket-transport analog: paginated feed → typed events →
    // flatMapGroupsWithState latest-state merge, checkpointed end to end
    def start() = KeyedMerge.latestState(
      spark.readStream.format("graft-rest")
        .option("endpoint", s"file://${dir.getAbsolutePath}/page-{page}.json")
        .load()
        .select(col("k").as("event_id"), (col("k") * 1000000L).as("tsu"),
          col("id").as("user_id"), col("type").as("event_type"),
          col("k").cast("double").as("value"))
        .as[KeyedMerge.Ev],
      ttlMicros = None, "1 hour")
      .writeStream.outputMode("update").option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[KeyedMerge.StateOut], _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }.start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val run1 = spark.read.parquet(outDir).as[KeyedMerge.StateOut].collect()
    assert(run1.maxBy(_.n_updates).n_updates === 2L, s"run 1 should merge pages 0-1: ${run1.toSeq}")

    // a new page lands while the stream is down; the restarted query must
    // resume at the checkpointed page cursor AND the restored key state
    page(2, 7L, "error", 300L)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val last = spark.read.parquet(outDir).as[KeyedMerge.StateOut].collect().maxBy(_.n_updates)
    assert(last.n_updates === 3L, "state + cursor must both restore")
    assert(last.event_id === 300L && last.event_type === "error")
    assert(last.filled === Some(200.0), "error rows carry no reading; fill stays at the view")
  }

  /** Local push-server fixture for the graft-socket tests (the Dsv2RestSpec
    * local-server pattern, but a raw socket): the test owns each accepted
    * connection, so it can push lines and drop the peer mid-stream like the
    * reference's upstream feed.
    */
  private case class PushServer(server: java.net.ServerSocket,
      accepted: java.util.concurrent.LinkedBlockingQueue[java.net.Socket],
      acceptCount: java.util.concurrent.atomic.AtomicInteger) {
    def port: Int = server.getLocalPort
    def awaitConnection(msg: String): java.net.Socket = {
      val s = accepted.poll(30, java.util.concurrent.TimeUnit.SECONDS)
      assert(s != null, msg)
      s
    }
  }

  private def withPushServer(body: PushServer => Unit): Unit = {
    val server = new java.net.ServerSocket(0, 8, java.net.InetAddress.getLoopbackAddress)
    val ps = PushServer(server,
      new java.util.concurrent.LinkedBlockingQueue[java.net.Socket](),
      new java.util.concurrent.atomic.AtomicInteger(0))
    val acceptor = new Thread("spec-push-server") {
      override def run(): Unit =
        try while (true) {
          val s = server.accept(); ps.acceptCount.incrementAndGet(); ps.accepted.put(s)
        } catch { case _: java.io.IOException => () } // server closed
    }
    acceptor.setDaemon(true)
    acceptor.start()
    try body(ps) finally server.close()
  }

  private def pushLine(s: java.net.Socket, line: String): Unit = {
    val w = new java.io.OutputStreamWriter(s.getOutputStream, "UTF-8")
    w.write(line + "\n"); w.flush()
  }

  test("S1/S14: socket-push transport drives the keyed merge and reconnects after a drop") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, from_json}
    withPushServer { ps =>
      def push(s: java.net.Socket, ev: (Long, Long, Long, String, Double)): Unit =
        pushLine(s, s"""{"event_id":${ev._1},"tsu":${ev._2},"user_id":${ev._3},"event_type":"${ev._4}","value":${ev._5}}""")
      val evSchema = org.apache.spark.sql.Encoders.product[KeyedMerge.Ev].schema

      val q = KeyedMerge.latestState(
        spark.readStream.format("graft-socket")
          .option("host", "127.0.0.1").option("port", ps.port.toString)
          .load()
          .select(from_json(col("line"), evSchema).as("ev"))
          .select(col("ev.*")).as[KeyedMerge.Ev],
        ttlMicros = None, "1 hour")
        .writeStream.format("memory").queryName("socket_merge").outputMode("update")
        .start()

      // the push source buffers on its own thread, so "available" lags the
      // write — poll the sink to a target update count instead of a single
      // processAllAvailable
      def awaitUpdates(n: Long, msg: String): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var done = false
        while (!done && System.nanoTime() < deadline) {
          q.processAllAvailable()
          val rows = spark.table("socket_merge").as[KeyedMerge.StateOut].collect()
          if (rows.nonEmpty && rows.map(_.n_updates).max >= n) done = true
          else Thread.sleep(50)
        }
        assert(done, msg)
      }

      try {
        val t0 = 5000000000000L
        val c1 = ps.awaitConnection("source never dialed the server")
        push(c1, (1L, t0, 7L, "click", 1.0))
        push(c1, (2L, t0 + 1, 7L, "view", 2.0))
        awaitUpdates(2, "pushed lines did not reach the keyed merge")

        c1.close() // abrupt drop — no FIN handshake with pending reads matters here
        val c2 = ps.awaitConnection("source did not reconnect after the drop")
        assert(ps.acceptCount.get >= 2, "reconnect must be a NEW connection")
        push(c2, (3L, t0 + 2, 7L, "error", 9.0))
        awaitUpdates(3, "post-reconnect line did not reach the keyed merge")

        val last = spark.table("socket_merge").as[KeyedMerge.StateOut].collect()
          .maxBy(_.n_updates)
        // state carried across the drop: the error row brings no reading, so
        // the fill must still be the pre-drop view's 2.0
        assert(last.event_id === 3L && last.filled === Some(2.0))
        c2.close()
      } finally q.stop()
    }
  }

  /** Upgrade an accepted raw socket into a WebSocket server connection:
    * read the client's HTTP request, answer 101 with the derived accept
    * key (the stub side of `graft.sources.socket.WsFraming`'s client
    * handshake). After this, unmasked server text frames can be pushed.
    */
  private def wsAccept(s: java.net.Socket): Unit = {
    import graft.sources.socket.WsFraming
    val headers = WsFraming.readHttpHeaders(s.getInputStream)
    assert(headers.head.startsWith("GET "), s"not a WS upgrade: ${headers.head}")
    val key = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-key:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse(fail("client sent no Sec-WebSocket-Key"))
    val out = s.getOutputStream
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${WsFraming.acceptKeyFor(key)}\r\n\r\n")
      .getBytes("US-ASCII"))
    out.flush()
  }

  private def pushWsText(s: java.net.Socket, msg: String): Unit =
    graft.sources.socket.WsFraming.writeFrame(
      s.getOutputStream, 0x1, msg.getBytes("UTF-8"), None)

  test("S1/S14 over ws://: RFC 6455 handshake + frames drive the keyed merge, reconnect included") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, from_json}
    withPushServer { ps =>
      def push(s: java.net.Socket, ev: (Long, Long, Long, String, Double)): Unit =
        pushWsText(s, s"""{"event_id":${ev._1},"tsu":${ev._2},"user_id":${ev._3},"event_type":"${ev._4}","value":${ev._5}}""")
      val evSchema = org.apache.spark.sql.Encoders.product[KeyedMerge.Ev].schema

      val q = KeyedMerge.latestState(
        spark.readStream.format("graft-socket")
          .option("host", "127.0.0.1").option("port", ps.port.toString)
          .option("protocol", "ws").option("path", "/feed")
          .option("subscribe", """{"bbox":[[-48,166],[-34,179]]}""")
          .load()
          .select(from_json(col("line"), evSchema).as("ev"))
          .select(col("ev.*")).as[KeyedMerge.Ev],
        ttlMicros = None, "1 hour")
        .writeStream.format("memory").queryName("ws_merge").outputMode("update")
        .start()

      def awaitUpdates(n: Long, msg: String): Unit = {
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var done = false
        while (!done && System.nanoTime() < deadline) {
          q.processAllAvailable()
          val rows = spark.table("ws_merge").as[KeyedMerge.StateOut].collect()
          if (rows.nonEmpty && rows.map(_.n_updates).max >= n) done = true
          else Thread.sleep(50)
        }
        assert(done, msg)
      }

      // after each accept+handshake the client must SUBSCRIBE before the
      // server pushes anything — a redial that skips the re-subscribe
      // would receive nothing on a real feed
      def expectSubscribe(c: java.net.Socket, when: String): Unit = {
        val (opcode, payload) = graft.sources.socket.WsFraming.readClientFrame(c.getInputStream)
        assert(opcode === 0x1, s"$when: subscription must be a text frame")
        assert(new String(payload, "UTF-8") === """{"bbox":[[-48,166],[-34,179]]}""",
          s"$when: wrong subscription payload")
      }

      try {
        val t0 = 6000000000000L
        val c1 = ps.awaitConnection("source never dialed the ws server")
        wsAccept(c1)
        expectSubscribe(c1, "initial connect")
        push(c1, (1L, t0, 7L, "click", 1.0))
        push(c1, (2L, t0 + 1, 7L, "view", 2.0))
        awaitUpdates(2, "ws frames did not reach the keyed merge")

        c1.close() // mid-stream drop, no close frame — like a dead upstream
        val c2 = ps.awaitConnection("source did not redial after the ws drop")
        assert(ps.acceptCount.get >= 2, "reconnect must be a NEW connection")
        wsAccept(c2) // the redial must re-handshake from scratch
        expectSubscribe(c2, "reconnect") // ...and re-subscribe from scratch
        push(c2, (3L, t0 + 2, 7L, "error", 9.0))
        awaitUpdates(3, "post-reconnect ws frame did not reach the keyed merge")

        val last = spark.table("ws_merge").as[KeyedMerge.StateOut].collect()
          .maxBy(_.n_updates)
        // state carried across the drop: the error row brings no reading,
        // so the fill must still be the pre-drop view's 2.0
        assert(last.event_id === 3L && last.filled === Some(2.0))
        c2.close()
      } finally q.stop()
    }
  }

  test("S2 over S1: jsonais dialect canonicalization composes over the socket transport") {
    import org.apache.spark.sql.functions.col
    // the reference's actual AIS pipeline: socket push feed → 6-dialect
    // jsonais canonicalize — here as two composed library pieces instead of
    // one hand-rolled client (ais-proxy/server.js:256-345 + :470-560)
    withPushServer { ps =>
      val canon = graft.ingest.Jsonais.canonicalizeDf(
        spark.readStream.format("graft-socket")
          .option("host", "127.0.0.1").option("port", ps.port.toString)
          .load(),
        col("line"), "canon", dropAfterParse = Seq("line"))
        .filter(col("canon").isNotNull)
        .select(col("canon.mmsi"), col("canon.lat"), col("canon.lon"))
      val q = canon.writeStream.format("memory").queryName("socket_ais")
        .outputMode("append").start()
      try {
        val c = ps.awaitConnection("source never dialed")
        // msgs[] dialect (first element invalid → second wins) + APRS dialect
        pushLine(c, """{"msgs":[{"mmsi":"7","lat":"-41.1","lon":"174.1"},{"mmsi":"512000001","lat":"-41.2","lon":"174.2","rxtime":"20240101000000"}]}""")
        pushLine(c, """{"call":"512000005","lat":"-44.0","lng":"171.0","time":"2024-01-04T05:06:07Z"}""")
        pushLine(c, "not json at all") // must be dropped, not crash the stream
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (spark.table("socket_ais").count() < 2 && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        val rows = spark.table("socket_ais").collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2))).sortBy(_._1)
        assert(rows.toSeq === Seq((512000001L, -41.2, 174.2), (512000005L, -44.0, 171.0)),
          s"got ${rows.toSeq}")
        c.close()
      } finally q.stop()
    }
  }

  test("graft-socket survives a checkpointed restart: cursor reconciles, no dupes, no loss") {
    import org.apache.spark.sql.functions.col
    withPushServer { ps =>
      val tmp = java.nio.file.Files.createTempDirectory("graft_socket_ckpt")
      val ckpt = tmp.resolve("ckpt").toString
      val outDir = tmp.resolve("out").toString
      def start() = spark.readStream.format("graft-socket")
        .option("host", "127.0.0.1").option("port", ps.port.toString)
        .load().select(col("line"))
        .writeStream.outputMode("append").option("checkpointLocation", ckpt)
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
          batch.write.mode("append").parquet(outDir)
          ()
        }.start()
      def lines(): Seq[String] =
        try spark.read.parquet(outDir).collect().map(_.getString(0)).toSeq
        catch { case _: Exception => Seq.empty } // outDir not created yet
      def pushAndAwait(q: org.apache.spark.sql.streaming.StreamingQuery,
          c: java.net.Socket, line: String, expect: Int): Unit = {
        pushLine(c, line)
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (lines().size < expect && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        assert(lines().size >= expect, s"expected $expect lines, got ${lines()}")
      }

      // run 1: two lines through the checkpointed pipeline, clean stop
      val q1 = start()
      try {
        val c1 = ps.awaitConnection("run 1 never dialed")
        pushAndAwait(q1, c1, "alpha", 1)
        pushAndAwait(q1, c1, "bravo", 2)
        c1.close()
      } finally q1.stop()
      // between c1.close() and q1.stop() the run-1 source may have redialed
      // (50 ms backoff). q1.stop() joins the reader, so no NEW dials follow
      // — but a handshake completed just before the join can still be
      // sitting in (or racing into) the acceptor's queue. Drain until the
      // queue stays empty for 500 ms so a late-enqueued stale connection
      // cannot be mistaken for run 2's dial
      while (ps.accepted.poll(500, java.util.concurrent.TimeUnit.MILLISECONDS) != null) ()

      // run 2: SAME checkpoint, fresh source incarnation (its internal
      // numbering restarts at 0 while the checkpoint cursor is at 2) — the
      // restart must neither crash on the cursor gap, nor re-deliver
      // alpha/bravo, nor skip the first post-restart line
      val q2 = start()
      try {
        val c2 = ps.awaitConnection("run 2 never dialed")
        pushAndAwait(q2, c2, "charlie", 3)
        c2.close()
      } finally q2.stop()

      val got = lines().sorted
      assert(got === Seq("alpha", "bravo", "charlie"), s"got $got")
    }
  }

  test("graft-socket maxLinesPerTrigger drains a pushed backlog in bounded batches") {
    withPushServer { ps =>
      val batchSizes = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
      val q = spark.readStream.format("graft-socket")
        .option("host", "127.0.0.1").option("port", ps.port.toString)
        .option("maxLinesPerTrigger", "2")
        .load()
        .writeStream.outputMode("append")
        .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
          val n = batch.count()
          if (n > 0) batchSizes.add(n)
          ()
        }.start()
      try {
        val c = ps.awaitConnection("source never dialed")
        (1 to 5).foreach(i => pushLine(c, s"line-$i"))
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        while (batchSizes.asScala.sum < 5 && System.nanoTime() < deadline) {
          q.processAllAvailable(); Thread.sleep(50)
        }
        val sizes = batchSizes.asScala.toSeq
        assert(sizes.sum === 5L, s"all pushed lines must arrive: $sizes")
        assert(sizes.forall(_ <= 2L), s"every micro-batch must respect the cap: $sizes")
        assert(sizes.size >= 3, s"a 5-line backlog at cap 2 needs >=3 batches: $sizes")
        c.close()
      } finally q.stop()
    }
  }

  test("vessel table: streamed union of AIS + enrichment sources (U2)") {
    import spark.implicits._
    import VesselMerge._
    implicit val sqlCtx = spark.sqlContext

    val t0 = 2000000000000L
    val ais = MemoryStream[VesselObs]
    val enrich = MemoryStream[VesselObs]
    val q = vesselTable(ais.toDS().union(enrich.toDS()), None, "1 hour")
      .writeStream.format("memory").queryName("vessels").outputMode("update")
      .start()
    try {
      ais.addData(VesselObs(111000000L, t0, "ais", Some("TUI"), None, None, None,
        None, None, Some(-41.3), Some(174.8)))
      enrich.addData(VesselObs(111000000L, t0 + 1, "marinesia", Some("WRONG"),
        Some(70), None, None, Some("NELSON"), Some(4.2), None, None))
      q.processAllAvailable()
    } finally q.stop()

    val last = spark.table("vessels").as[VesselState].collect().maxBy(_.lastUpdate)
    assert(last.name === Some("TUI"), "AIS name wins over enrichment fill")
    assert(last.shipType === Some(70) && last.destination === Some("NELSON"))
    assert(last.lat === Some(-41.3))
  }

  test("L22/L25 text cleaning streams as-is: scrub + NFC in a streaming projection") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    graft.plans.GraftExtensions.register(spark)

    // stateless column transforms need no stream-specific form — the SAME
    // expressions run under readStream; stream output == batch output
    val docs = Seq(
      "mail u@ex.com from 10.0.0.1",
      "caf\u00e9 already clean",
      "cafe\u0301 needs composing, call +64 21 5550199")
    val clean = (c: org.apache.spark.sql.Column) =>
      graft.plans.NfcNormalizeExpression.nfcNormalize(
        graft.functions.TextFunctions.redactPii(c))

    val stream = MemoryStream[String]
    val q = stream.toDS().toDF("text").select(clean(col("text")).as("clean"))
      .writeStream.format("memory").queryName("clean_docs").outputMode("append")
      .start()
    try {
      docs.foreach(stream.addData(_))
      q.processAllAvailable()
    } finally q.stop()

    val got = spark.table("clean_docs").as[String].collect().sorted.toSeq
    val want = docs.toDF("text").select(clean(col("text")).as("clean"))
      .as[String].collect().sorted.toSeq
    assert(got === want, "stream must equal batch for the stateless cleaners")
    assert(want.exists(_.contains("<EMAIL>")) && want.exists(_.contains("<PHONE>")))
    assert(want.count(_.contains("caf\u00e9")) === 2, "NFC composed both forms")
  }
}
