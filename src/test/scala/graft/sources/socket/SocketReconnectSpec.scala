package graft.sources.socket

import java.net.{InetAddress, ServerSocket, Socket}
import java.util.concurrent.{LinkedBlockingQueue, TimeUnit}

import org.scalatest.funsuite.AnyFunSuite

/** Reconnect-policy contract of the socket pump, at the socket level (no
  * Spark query needed — the pump runs from construction): deliberate WS
  * closes (1000/1008) halt for good, transient closes redial, and a
  * maxReconnectAttempts budget bounds consecutive failed dials. Mirrors
  * the reference's close handler and retry cap
  * (`ais-proxy/server.js:252,330-350`).
  */
class SocketReconnectSpec extends AnyFunSuite {

  private def withServer(body: (ServerSocket, LinkedBlockingQueue[Socket]) => Unit): Unit = {
    val server = new ServerSocket(0, 8, InetAddress.getLoopbackAddress)
    val accepted = new LinkedBlockingQueue[Socket]()
    val acceptor = new Thread("reconnect-spec-server") {
      override def run(): Unit =
        try while (true) accepted.put(server.accept())
        catch { case _: java.io.IOException => () }
    }
    acceptor.setDaemon(true)
    acceptor.start()
    try body(server, accepted) finally server.close()
  }

  private def wsAccept(s: Socket): Unit = {
    val headers = WsFraming.readHttpHeaders(s.getInputStream)
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

  private def sendClose(s: Socket, code: Int): Unit =
    WsFraming.writeFrame(s.getOutputStream, 0x8,
      Array(((code >> 8) & 0xff).toByte, (code & 0xff).toByte), None)

  private def awaitDead(stream: SocketPushMicroBatchStream, msg: String): Unit = {
    val deadline = System.nanoTime() + 10L * 1000 * 1000 * 1000
    while (stream.readerAlive && System.nanoTime() < deadline) Thread.sleep(20)
    assert(!stream.readerAlive, msg)
  }

  test("transient ws close redials; close 1008 halts the pump with no further dial") {
    withServer { (server, accepted) =>
      def await(msg: String): Socket = {
        val c = accepted.poll(10, TimeUnit.SECONDS); assert(c != null, msg); c
      }
      val stream = new SocketPushMicroBatchStream("127.0.0.1", server.getLocalPort,
        reconnectMs = 20, maxReconnectMs = 100, protocol = "ws")
      try {
        val c1 = await("pump never dialed")
        wsAccept(c1)
        // 1011 (internal error) is transient: the pump must come back
        sendClose(c1, 1011)
        val c2 = await("transient close (1011) must redial")
        wsAccept(c2)
        // 1008 (policy/auth) is deliberate: pump ends, no further dial
        sendClose(c2, 1008)
        awaitDead(stream, "close 1008 must end the pump")
        assert(accepted.poll(500, TimeUnit.MILLISECONDS) == null,
          "no redial may follow a deliberate close")
      } finally stream.stop()
    }
  }

  test("close 1000 (normal closure) also halts the pump") {
    withServer { (server, accepted) =>
      val stream = new SocketPushMicroBatchStream("127.0.0.1", server.getLocalPort,
        reconnectMs = 20, maxReconnectMs = 100, protocol = "ws")
      try {
        val c1 = accepted.poll(10, TimeUnit.SECONDS)
        assert(c1 != null, "pump never dialed")
        wsAccept(c1)
        sendClose(c1, 1000)
        awaitDead(stream, "close 1000 must end the pump")
        assert(accepted.poll(500, TimeUnit.MILLISECONDS) == null,
          "no redial may follow a normal closure")
      } finally stream.stop()
    }
  }

  test("maxReconnectAttempts bounds consecutive failed dials; success resets the budget") {
    // a port with nothing listening: dial fails immediately every cycle
    val probe = new ServerSocket(0, 1, InetAddress.getLoopbackAddress)
    val deadPort = probe.getLocalPort
    probe.close()
    val capped = new SocketPushMicroBatchStream("127.0.0.1", deadPort,
      reconnectMs = 5, maxReconnectMs = 10, maxReconnectAttempts = 3)
    try awaitDead(capped, "pump must give up after the attempt budget")
    finally capped.stop()

    // ...and with the default (0 = unlimited) the pump keeps trying
    val persistent = new SocketPushMicroBatchStream("127.0.0.1", deadPort,
      reconnectMs = 5, maxReconnectMs = 10)
    try {
      Thread.sleep(300)
      assert(persistent.readerAlive, "unlimited retries must keep the pump alive")
    } finally persistent.stop()
  }
}
