package graft.sources.socket

import java.net.{InetAddress, Socket}
import java.nio.file.Files
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import javax.net.ssl.{KeyManagerFactory, SSLContext, SSLServerSocket}

import org.apache.spark.sql.connector.read.streaming.ReadLimit

/** TLS (`wss://`) transport contract of the socket pump — the reference's
  * one real WebSocket endpoint is TLS (`ais-proxy/server.js:256-262`
  * connects `wss://stream.aisstream.io`), so the first thing a real user
  * does is point `graft-socket` at a `wss://` feed:
  *
  *  - full stack over a local `SSLServerSocket` with a self-signed cert
  *    trusted via `option("truststore", ...)`: TLS handshake → RFC 6455
  *    upgrade → subscribe → text frames → rows;
  *  - mid-stream abrupt drop: the pump re-dials with a FRESH TLS
  *    handshake, re-upgrades, and re-sends the subscription (the
  *    reference's re-subscribe-on-open semantics, unchanged over TLS);
  *  - an untrusted certificate fails the dial into the normal
  *    backoff-and-redial path (diagnosable retry loop), never a dead pump
  *    with a live-looking query.
  *
  * The WS framing itself is transport-agnostic (WsFramingSpec covers the
  * codec); what TLS adds — and what this spec pins — is the handshake
  * placement: TLS first, HTTP upgrade inside the encrypted stream.
  */
class SocketTlsSpec extends graft.SparkSpec {

  /** Self-signed server identity + matching client truststore, generated
    * once per suite with the JDK's own keytool (PKCS12, CN=localhost).
    */
  private lazy val (keystorePath: String, truststorePath: String, storePass: String) = {
    val dir = Files.createTempDirectory("graft-tls-spec")
    val ks = dir.resolve("server.p12").toString
    val cert = dir.resolve("server.der").toString
    val ts = dir.resolve("trust.p12").toString
    val pass = "changeit"
    def run(cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
    }
    // SAN is required: the pump enables HTTPS endpoint identification, and
    // hostname verification matches subjectAltName, not the CN
    run("keytool", "-genkeypair", "-alias", "spec", "-keyalg", "RSA", "-keysize", "2048",
      "-storetype", "PKCS12", "-keystore", ks, "-storepass", pass,
      "-dname", "CN=localhost", "-validity", "1",
      "-ext", "SAN=dns:localhost,ip:127.0.0.1")
    run("keytool", "-exportcert", "-alias", "spec", "-keystore", ks,
      "-storepass", pass, "-file", cert)
    run("keytool", "-importcert", "-alias", "spec", "-file", cert, "-keystore", ts,
      "-storetype", "PKCS12", "-storepass", pass, "-noprompt")
    (ks, ts, pass)
  }

  /** TLS stub server socket from the self-signed keystore. */
  private def sslServerSocket(): SSLServerSocket = {
    val ks = java.security.KeyStore.getInstance("PKCS12")
    val in = new java.io.FileInputStream(keystorePath)
    try ks.load(in, storePass.toCharArray) finally in.close()
    val kmf = KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(ks, storePass.toCharArray)
    val ctx = SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    ctx.getServerSocketFactory.createServerSocket(0, 8, InetAddress.getLoopbackAddress)
      .asInstanceOf[SSLServerSocket]
  }

  private def withTlsServer(body: (SSLServerSocket, LinkedBlockingQueue[Socket]) => Unit): Unit = {
    val server = sslServerSocket()
    val accepted = new LinkedBlockingQueue[Socket]()
    val acceptor = new Thread("tls-spec-server") {
      override def run(): Unit =
        try while (true) accepted.put(server.accept())
        catch { case _: java.io.IOException => () } // server closed
    }
    acceptor.setDaemon(true)
    acceptor.start()
    try body(server, accepted) finally server.close()
  }

  /** Server side of the WS upgrade (the SocketReconnectSpec stub, over the
    * TLS stream).
    */
  private def wsAccept(s: Socket): Unit = {
    val headers = WsFraming.readHttpHeaders(s.getInputStream)
    assert(headers.head.startsWith("GET /feed "), s"unexpected request: ${headers.head}")
    val key = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-key:") =>
        h.substring(h.indexOf(':') + 1).trim
    }.getOrElse(fail("no Sec-WebSocket-Key"))
    val out = s.getOutputStream
    out.write(("HTTP/1.1 101 Switching Protocols\r\n" +
      "Upgrade: websocket\r\nConnection: Upgrade\r\n" +
      s"Sec-WebSocket-Accept: ${WsFraming.acceptKeyFor(key)}\r\n\r\n").getBytes("US-ASCII"))
    out.flush()
  }

  private def readSubscribe(s: Socket): String = {
    val (opcode, payload) = WsFraming.readClientFrame(s.getInputStream)
    assert(opcode === 0x1, "subscription must arrive as a text frame")
    new String(payload, "UTF-8")
  }

  private def pushWsText(s: Socket, msg: String): Unit =
    WsFraming.writeFrame(s.getOutputStream, 0x1, msg.getBytes("UTF-8"), None)

  private def awaitBuffered(stream: SocketPushMicroBatchStream, n: Long, msg: String): Unit = {
    val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
    var have = -1L
    while (have < n && System.nanoTime() < deadline) {
      have = stream.reportLatestOffset().asInstanceOf[SocketOffset].rows
      if (have < n) Thread.sleep(20)
    }
    assert(have >= n, s"$msg (buffered $have of $n)")
  }

  test("wss://: TLS + upgrade + subscribe deliver rows; a drop re-handshakes and re-subscribes") {
    withTlsServer { (server, accepted) =>
      val sub = """{"bbox":[[-48,166],[-34,179]]}"""
      val stream = new SocketPushMicroBatchStream("localhost", server.getLocalPort,
        reconnectMs = 20, maxReconnectMs = 100, protocol = "wss", wsPath = "/feed",
        subscribe = Some(sub), truststore = Some(truststorePath),
        truststorePassword = Some(storePass))
      try {
        val c1 = accepted.poll(30, TimeUnit.SECONDS)
        assert(c1 != null, "pump never completed a TLS dial")
        wsAccept(c1)
        assert(readSubscribe(c1) === sub, "subscription must follow the first handshake")
        pushWsText(c1, "alpha")
        pushWsText(c1, "bravo")
        awaitBuffered(stream, 2, "frames over TLS did not reach the buffer")

        // abrupt mid-stream drop: no WS close frame — the pump must come
        // back with a FRESH TLS handshake (a NEW accepted connection) and
        // re-send the subscription before any further data flows
        c1.close()
        val c2 = accepted.poll(30, TimeUnit.SECONDS)
        assert(c2 != null, "pump did not re-dial after the TLS drop")
        wsAccept(c2)
        assert(readSubscribe(c2) === sub, "re-connect must re-subscribe")
        pushWsText(c2, "charlie")
        awaitBuffered(stream, 3, "post-reconnect frame did not reach the buffer")

        // drain through the micro-batch planner: contents and order intact
        val end = stream.latestOffset(SocketOffset(0L), ReadLimit.allAvailable())
        val rows = stream.planInputPartitions(SocketOffset(0L), end)
          .flatMap(_.asInstanceOf[SocketRowsPartition].rows)
        assert(rows.map(_._1).toSeq === Seq("alpha", "bravo", "charlie"))
        c2.close()
      } finally stream.stop()
    }
  }

  test("omitted truststorePassword still authenticates against a password-protected JKS truststore") {
    // KeyStore.load(in, null) reads JKS certificate entries WITHOUT the
    // keystore integrity check — the standard client behavior. The old
    // default of "" passed an empty char[], which FORCES the check and
    // failed any password-protected truststore whenever the option was
    // simply omitted (round-8 ADVICE). JKS specifically: its trusted-cert
    // entries are stored in the clear (only the MAC uses the password),
    // so null-load yields usable trust anchors; PKCS12 cert bags are
    // password-encrypted, so a protected PKCS12 still needs the option.
    val dir = Files.createTempDirectory("graft-tls-jks")
    val cert = dir.resolve("server.der").toString
    val jks = dir.resolve("trust.jks").toString
    def run(cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val out = new String(p.getInputStream.readAllBytes())
      assert(p.waitFor() == 0, s"${cmd.mkString(" ")} failed:\n$out")
    }
    run("keytool", "-exportcert", "-alias", "spec", "-keystore", keystorePath,
      "-storepass", storePass, "-file", cert)
    run("keytool", "-importcert", "-alias", "spec", "-file", cert, "-keystore", jks,
      "-storetype", "JKS", "-storepass", "sekrit-unknown-to-client", "-noprompt")
    withTlsServer { (server, accepted) =>
      val stream = new SocketPushMicroBatchStream("localhost", server.getLocalPort,
        reconnectMs = 20, maxReconnectMs = 100, protocol = "wss", wsPath = "/feed",
        truststore = Some(jks)) // truststorePassword deliberately omitted
      try {
        val c1 = accepted.poll(30, TimeUnit.SECONDS)
        assert(c1 != null, "pump never completed a TLS dial with the password omitted")
        wsAccept(c1)
        pushWsText(c1, "delta")
        awaitBuffered(stream, 1, "frame did not arrive over the password-less truststore dial")
        c1.close()
      } finally stream.stop()
    }
  }

  test("untrusted certificate: dial fails into backoff-and-redial, not a dead pump") {
    withTlsServer { (server, accepted) =>
      // no truststore option → JVM default trust → self-signed is rejected
      val stream = new SocketPushMicroBatchStream("localhost", server.getLocalPort,
        reconnectMs = 10, maxReconnectMs = 40, protocol = "wss")
      // the server side of a TLS handshake only runs when the accepted
      // socket is actually read — drive it per connection so the client's
      // trust rejection surfaces instead of both sides blocking
      def driveHandshake(c: Socket): Unit = {
        val t = new Thread(() =>
          try c.getInputStream.read()
          catch { case _: Throwable => () }
          finally (try c.close() catch { case _: Throwable => () }))
        t.setDaemon(true)
        t.start()
      }
      try {
        // each retry opens a TCP connection that dies during TLS handshake;
        // seeing several accepts proves the backoff-redial loop is live
        val c1 = accepted.poll(10, TimeUnit.SECONDS)
        assert(c1 != null, "pump never attempted a dial")
        driveHandshake(c1)
        val c2 = accepted.poll(10, TimeUnit.SECONDS)
        assert(c2 != null, "rejected handshake must retry, not kill the pump")
        driveHandshake(c2)
        assert(stream.readerAlive, "pump must stay alive through cert rejections")
        assert(stream.reportLatestOffset().asInstanceOf[SocketOffset].rows === 0L,
          "no data can cross an unauthenticated channel")
      } finally stream.stop()
    }
  }

  test("streaming glue over wss://: readStream → micro-batches → memory sink") {
    import spark.implicits._
    withTlsServer { (server, accepted) =>
      val sub = """{"subscribe":"all"}"""
      val q = spark.readStream.format("graft-socket")
        .option("host", "localhost").option("port", server.getLocalPort.toString)
        .option("protocol", "wss").option("path", "/feed")
        .option("subscribe", sub)
        .option("truststore", truststorePath)
        .option("truststorePassword", storePass)
        .load()
        .writeStream.format("memory").queryName("wss_rows").outputMode("append")
        .start()
      try {
        val c1 = accepted.poll(30, TimeUnit.SECONDS)
        assert(c1 != null, "query never dialed over TLS")
        wsAccept(c1)
        assert(readSubscribe(c1) === sub)
        pushWsText(c1, """{"k":1}""")
        pushWsText(c1, """{"k":2}""")
        val deadline = System.nanoTime() + 30L * 1000 * 1000 * 1000
        var rows = Array.empty[(String, Long)]
        while (rows.length < 2 && System.nanoTime() < deadline) {
          q.processAllAvailable()
          rows = spark.table("wss_rows").as[(String, Long)].collect()
          if (rows.length < 2) Thread.sleep(50)
        }
        assert(rows.map(_._1).sorted.toSeq === Seq("""{"k":1}""", """{"k":2}"""),
          "TLS-transported frames must arrive as rows with their payloads intact")
        c1.close()
      } finally q.stop()
    }
  }
}
