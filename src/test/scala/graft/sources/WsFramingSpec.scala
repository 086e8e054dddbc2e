package graft.sources

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, IOException}
import java.nio.charset.StandardCharsets
import java.security.SecureRandom

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.socket.WsFraming

/** Codec-level RFC 6455 contract tests (no Spark, no sockets): handshake
  * key derivation against the RFC's own test vector, frame decode across
  * the length encodings, fragmentation with interleaved control frames,
  * ping→pong and close echo behavior, and the protocol-error paths that
  * must throw (masked server frames, RSV bits, orphan continuations) so
  * the pump's redial recovery is reached instead of silent corruption.
  */
class WsFramingSpec extends AnyFunSuite {

  private val rnd = new SecureRandom()

  private def serverFrames(frames: Array[Byte]*): ByteArrayInputStream =
    new ByteArrayInputStream(frames.flatten.toArray)

  /** Build one raw unmasked server frame (test-side encoder independent of
    * WsFraming.writeFrame, so decode is tested against hand-laid bytes).
    */
  private def rawFrame(fin: Boolean, opcode: Int, payload: Array[Byte],
      rsv: Int = 0): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write((if (fin) 0x80 else 0x00) | (rsv << 4) | opcode)
    val n = payload.length
    if (n < 126) out.write(n)
    else if (n <= 0xffff) { out.write(126); out.write(n >> 8); out.write(n & 0xff) }
    else {
      out.write(127)
      (7 to 0 by -1).foreach(i => out.write(((n.toLong >> (8 * i)) & 0xff).toInt))
    }
    out.write(payload)
    out.toByteArray
  }

  test("accept key matches the RFC 6455 section 1.3 worked example") {
    assert(WsFraming.acceptKeyFor("dGhlIHNhbXBsZSBub25jZQ==") ===
      "s3pPLMBiTxaQ9kYGzzhZRbK+xOo=")
  }

  test("single unmasked text frame decodes to its message") {
    val in = serverFrames(rawFrame(fin = true, 0x1, "hello".getBytes(StandardCharsets.UTF_8)))
    val out = new ByteArrayOutputStream()
    assert(WsFraming.readMessage(in, out, rnd) === Some("hello"))
    assert(out.size() === 0, "no control reply expected")
  }

  test("16-bit extended length round-trips (126..65535 byte payloads)") {
    val payload = Array.fill[Byte](300)('x'.toByte)
    val in = serverFrames(rawFrame(fin = true, 0x1, payload))
    assert(WsFraming.readMessage(in, new ByteArrayOutputStream(), rnd) ===
      Some(new String(payload, StandardCharsets.UTF_8)))
  }

  test("fragmented message reassembles; interleaved ping is answered with a masked pong") {
    val in = serverFrames(
      rawFrame(fin = false, 0x1, "ab".getBytes(StandardCharsets.UTF_8)),
      rawFrame(fin = true, 0x9, "ka".getBytes(StandardCharsets.UTF_8)), // ping mid-message
      rawFrame(fin = true, 0x0, "cd".getBytes(StandardCharsets.UTF_8)))
    val out = new ByteArrayOutputStream()
    assert(WsFraming.readMessage(in, out, rnd) === Some("abcd"))
    // the pong reply: FIN+0xA, masked, 2-byte payload that unmasks to "ka"
    val reply = out.toByteArray
    assert((reply(0) & 0xff) === 0x8A, "reply must be a FIN pong")
    assert((reply(1) & 0x80) !== 0, "client frames must be masked")
    assert((reply(1) & 0x7f) === 2)
    val mask = reply.slice(2, 6)
    assert(WsFraming.unmask(reply.slice(6, 8), mask).toSeq ===
      "ka".getBytes(StandardCharsets.UTF_8).toSeq)
  }

  test("close frame yields None and echoes a masked close") {
    val in = serverFrames(rawFrame(fin = true, 0x8, Array(0x03.toByte, 0xe8.toByte)))
    val out = new ByteArrayOutputStream()
    assert(WsFraming.readMessage(in, out, rnd) === None)
    assert((out.toByteArray()(0) & 0xff) === 0x88, "echo must be a FIN close")
    assert((out.toByteArray()(1) & 0x80) !== 0, "echo must be masked")
  }

  test("protocol violations throw: masked server frame, RSV bits, orphan continuation") {
    // masked server frame: set the mask bit on a 0-length text frame
    val masked = Array[Byte](0x81.toByte, 0x80.toByte, 0, 0, 0, 0)
    intercept[IOException] {
      WsFraming.readMessage(new ByteArrayInputStream(masked), new ByteArrayOutputStream(), rnd)
    }
    intercept[IOException] {
      WsFraming.readMessage(
        serverFrames(rawFrame(fin = true, 0x1, Array.empty, rsv = 4)),
        new ByteArrayOutputStream(), rnd)
    }
    intercept[IOException] {
      WsFraming.readMessage(
        serverFrames(rawFrame(fin = true, 0x0, "x".getBytes(StandardCharsets.UTF_8))),
        new ByteArrayOutputStream(), rnd)
    }
    intercept[EOFException] {
      // truncated payload: header promises 5 bytes, stream has 2
      val truncated = rawFrame(fin = true, 0x1, "hello".getBytes(StandardCharsets.UTF_8)).take(4)
      WsFraming.readMessage(new ByteArrayInputStream(truncated), new ByteArrayOutputStream(), rnd)
    }
  }

  test("writeFrame(masked) and the decoder agree with the stub-server encoder") {
    // client-encoder → unmask → payload: proves mask application is XOR
    // with the 4-byte key the header carries
    val out = new ByteArrayOutputStream()
    WsFraming.writeFrame(out, 0x1, "payload".getBytes(StandardCharsets.UTF_8), Some(rnd))
    val b = out.toByteArray
    assert((b(0) & 0xff) === 0x81)
    val n = b(1) & 0x7f
    assert(n === 7)
    val mask = b.slice(2, 6)
    assert(new String(WsFraming.unmask(b.slice(6, 6 + n), mask), StandardCharsets.UTF_8) ===
      "payload")
  }

  test("readClientFrame enforces masking and round-trips writeFrame(masked)") {
    val out = new ByteArrayOutputStream()
    WsFraming.writeFrame(out, 0x1, "subscribe-me".getBytes(StandardCharsets.UTF_8), Some(rnd))
    val (opcode, payload) = WsFraming.readClientFrame(new ByteArrayInputStream(out.toByteArray))
    assert(opcode === 0x1)
    assert(new String(payload, StandardCharsets.UTF_8) === "subscribe-me")
    // an unmasked frame must be rejected on the server side
    intercept[IOException] {
      WsFraming.readClientFrame(serverFrames(
        rawFrame(fin = true, 0x1, "bare".getBytes(StandardCharsets.UTF_8))))
    }
  }

  test("idlePing: a read timeout at a frame boundary emits a masked ping and keeps reading") {
    // stream that times out twice before serving a complete text frame
    val frame = rawFrame(fin = true, 0x1, "late".getBytes(StandardCharsets.UTF_8))
    val in = new java.io.InputStream {
      private var timeouts = 2
      private var i = 0
      override def read(): Int = {
        if (timeouts > 0) { timeouts -= 1; throw new java.net.SocketTimeoutException("idle") }
        if (i < frame.length) { i += 1; frame(i - 1) & 0xff } else -1
      }
    }
    val out = new ByteArrayOutputStream()
    assert(WsFraming.readMessage(in, out, rnd, idlePing = true) === Some("late"))
    // two pings went out: each FIN+0x9, masked, empty payload (2+4 bytes)
    val sent = out.toByteArray
    assert(sent.length === 12, s"expected two 6-byte masked pings, got ${sent.length} bytes")
    Seq(0, 6).foreach { off =>
      assert((sent(off) & 0xff) === 0x89, "keepalive must be a FIN ping")
      assert((sent(off + 1) & 0xff) === 0x80, "keepalive must be masked with empty payload")
    }
    // ...and WITHOUT idlePing the timeout propagates (dead-peer path)
    val in2 = new java.io.InputStream {
      override def read(): Int = throw new java.net.SocketTimeoutException("idle")
    }
    intercept[java.net.SocketTimeoutException] {
      WsFraming.readMessage(in2, new ByteArrayOutputStream(), rnd)
    }
  }

  test("client handshake: well-formed upgrade request; refusal and bad accept key throw") {
    // request shape: capture what the client writes (EOF on the empty
    // response stream is expected and proves the request precedes any read)
    val reqBuf = new ByteArrayOutputStream()
    intercept[EOFException] {
      WsFraming.clientHandshake(new ByteArrayInputStream(Array.emptyByteArray),
        reqBuf, "feedhost", 8080, "/feed", rnd)
    }
    val req = new String(reqBuf.toByteArray, StandardCharsets.US_ASCII)
    assert(req.startsWith("GET /feed HTTP/1.1\r\n"))
    assert(req.contains("Host: feedhost:8080\r\n"))
    assert(req.toLowerCase.contains("upgrade: websocket"))
    assert(req.toLowerCase.contains("sec-websocket-version: 13"))
    assert(req.endsWith("\r\n\r\n"))

    // refused upgrade throws (backoff path, not a hung reader)
    val refusal = "HTTP/1.1 403 Forbidden\r\n\r\n".getBytes(StandardCharsets.US_ASCII)
    intercept[IOException] {
      WsFraming.clientHandshake(new ByteArrayInputStream(refusal),
        new ByteArrayOutputStream(), "h", 1, "/", rnd)
    }
    // a 101 whose accept key doesn't commit to OUR nonce throws — the
    // correct-key path runs end-to-end in StreamingSpec's stub server
    val badKey = ("HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n" +
      "Sec-WebSocket-Accept: AAAAAAAAAAAAAAAAAAAAAAAAAAA=\r\n\r\n")
      .getBytes(StandardCharsets.US_ASCII)
    intercept[IOException] {
      WsFraming.clientHandshake(new ByteArrayInputStream(badKey),
        new ByteArrayOutputStream(), "h", 1, "/", rnd)
    }
  }
}
