package graft.sources.socket

import java.io.{EOFException, IOException, InputStream, OutputStream}
import java.nio.charset.StandardCharsets
import java.security.{MessageDigest, SecureRandom}
import java.util.Base64

/** Minimal RFC 6455 WebSocket codec — the client side of the reference's
  * actual live-feed transport (`ais-proxy/server.js:256` and
  * `display-proxy/lambdas/tak-contacts-ws/index.mjs:145` both dial
  * `ws://` endpoints). Everything above this layer — buffering, reconnect
  * with backoff, offsets, admission control, the keyed merge — is
  * transport-agnostic and lives in [[SocketPushMicroBatchStream]]; this
  * object supplies exactly the two missing pieces: the HTTP upgrade
  * handshake and frame encode/decode.
  *
  * Scope (all this source needs, nothing more):
  *  - client handshake: `Sec-WebSocket-Key` → verified `Sec-WebSocket-Accept`
  *  - server→client frames: unmasked (RFC 6455 §5.1 — a masked server
  *    frame is a protocol error and fails the connection), text/binary
  *    with continuation fragments, interleaved control frames
  *  - client→server frames: always masked (pong replies, close echo)
  *  - no extensions (RSV bits must be 0), no subprotocol negotiation
  *
  * Errors surface as IOException/EOFException: the pump's existing
  * backoff-and-redial path is the correct recovery for every one of them.
  */
object WsFraming {

  /** RFC 6455 §1.3 — the fixed GUID concatenated to the client key. */
  val Guid = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

  /** `Sec-WebSocket-Accept` for a given `Sec-WebSocket-Key`:
    * base64(SHA-1(key + GUID)). Shared by the client (verification) and
    * the spec's stub server (response construction).
    */
  def acceptKeyFor(key: String): String =
    Base64.getEncoder.encodeToString(
      MessageDigest.getInstance("SHA-1")
        .digest((key + Guid).getBytes(StandardCharsets.US_ASCII)))

  /** Client HTTP upgrade handshake over already-connected streams. Writes
    * the GET, reads the response header block, and validates 101 + the
    * accept key; throws IOException on anything else. On return the
    * stream is positioned at the first frame byte.
    */
  def clientHandshake(in: InputStream, out: OutputStream,
      host: String, port: Int, path: String, rnd: SecureRandom): Unit = {
    val keyBytes = new Array[Byte](16)
    rnd.nextBytes(keyBytes)
    val key = Base64.getEncoder.encodeToString(keyBytes)
    out.write((s"GET $path HTTP/1.1\r\n" +
      s"Host: $host:$port\r\n" +
      "Upgrade: websocket\r\n" +
      "Connection: Upgrade\r\n" +
      s"Sec-WebSocket-Key: $key\r\n" +
      "Sec-WebSocket-Version: 13\r\n\r\n").getBytes(StandardCharsets.US_ASCII))
    out.flush()
    val headers = readHttpHeaders(in)
    val status = headers.headOption.getOrElse("")
    if (!status.startsWith("HTTP/1.1 101"))
      throw new IOException(s"WebSocket upgrade refused: '$status'")
    val accept = headers.collectFirst {
      case h if h.toLowerCase.startsWith("sec-websocket-accept:") =>
        h.substring(h.indexOf(':') + 1).trim
    }
    if (!accept.contains(acceptKeyFor(key)))
      throw new IOException("WebSocket accept-key mismatch: got " +
        accept.getOrElse("<absent>"))
  }

  /** Read one CRLF-delimited HTTP header block (request or response line
    * included) byte-by-byte — no read-ahead buffering, because the frame
    * stream follows immediately and must not be swallowed. Bounded so a
    * non-HTTP peer can't grow the header forever.
    */
  def readHttpHeaders(in: InputStream, maxBytes: Int = 16384): Seq[String] = {
    val sb = new StringBuilder
    while (!(sb.length >= 4 && sb.substring(sb.length - 4) == "\r\n\r\n")) {
      val b = in.read()
      if (b < 0) throw new EOFException("peer closed during HTTP header block")
      if (sb.length >= maxBytes)
        throw new IOException(s"HTTP header block exceeds $maxBytes bytes")
      sb.append(b.toChar) // header block is ASCII by construction
    }
    sb.substring(0, sb.length - 4).split("\r\n", -1).toSeq
  }

  /** Largest data-frame payload this client accepts (defensive: a garbage
    * or hostile length prefix must not allocate unbounded memory).
    */
  val MaxFramePayload: Long = 16L * 1024 * 1024

  /** Message-level events [[readEvent]] can yield: one complete text
    * message, or the peer's close (with its status code when the close
    * frame carried one — the caller uses it to distinguish deliberate
    * closure from a transient drop).
    */
  sealed trait WsEvent
  case class WsText(msg: String) extends WsEvent
  case class WsClosed(code: Option[Int]) extends WsEvent

  /** [[readEvent]] with closes collapsed to None — the transient-drop-only
    * view for callers that treat every close as a redial.
    */
  def readMessage(in: InputStream, out: OutputStream, rnd: SecureRandom,
      idlePing: Boolean = false): Option[String] =
    readEvent(in, out, rnd, idlePing) match {
      case WsText(m) => Some(m)
      case WsClosed(_) => None
    }

  /** Read frames until one complete text (or binary, decoded lossily as
    * UTF-8) message is assembled. Interleaved pings are answered with
    * masked pongs transparently; pongs are ignored. A close frame is
    * echoed (masked) and returned as [[WsClosed]] with its status code;
    * EOF mid-frame and protocol violations throw — the caller's redial
    * path handles those.
    *
    * `idlePing = true` turns a read timeout AT A FRAME BOUNDARY (the
    * socket's SO_TIMEOUT expiring before the next frame's first byte)
    * into a masked client ping — the reference's 30 s keepalive
    * (`ais-proxy/server.js:292-296`) — and keeps waiting. A timeout
    * MID-frame still throws: a peer that stalls inside a frame is dead,
    * not idle.
    */
  def readEvent(in: InputStream, out: OutputStream, rnd: SecureRandom,
      idlePing: Boolean = false): WsEvent = {
    val assembled = new java.io.ByteArrayOutputStream()
    var assembling = false
    while (true) {
      val b0 =
        if (!idlePing) read1(in)
        else {
          var first = -1
          while (first < 0) {
            try first = read1(in)
            catch { case _: java.net.SocketTimeoutException =>
              writeFrame(out, 0x9, Array.emptyByteArray, Some(rnd))
            }
          }
          first
        }
      val fin = (b0 & 0x80) != 0
      if ((b0 & 0x70) != 0)
        throw new IOException(f"RSV bits set (0x$b0%02x) with no extension negotiated")
      val opcode = b0 & 0x0f
      val b1 = read1(in)
      if ((b1 & 0x80) != 0)
        throw new IOException("masked server frame (RFC 6455 section 5.1 violation)")
      val len7 = b1 & 0x7f
      val len: Long = len7 match {
        case 126 => ((read1(in).toLong << 8) | read1(in)) & 0xffffL
        case 127 => (0 until 8).foldLeft(0L)((acc, _) => (acc << 8) | read1(in))
        case n => n.toLong
      }
      if (len < 0 || len > MaxFramePayload)
        throw new IOException(s"frame payload length $len exceeds cap $MaxFramePayload")
      val payload = readN(in, len.toInt)
      opcode match {
        case 0x1 | 0x2 => // text / binary: first fragment of a message
          if (assembling)
            throw new IOException("new data frame while a fragmented message is open")
          if (fin) return WsText(new String(payload, StandardCharsets.UTF_8))
          assembled.write(payload); assembling = true
        case 0x0 => // continuation
          if (!assembling)
            throw new IOException("continuation frame with no message open")
          assembled.write(payload)
          if (fin) return WsText(new String(assembled.toByteArray, StandardCharsets.UTF_8))
        case 0x8 => // close: echo (masked — we are the client) and finish
          try writeFrame(out, 0x8, payload.take(125), Some(rnd))
          catch { case _: IOException => () } // peer may already be gone
          return WsClosed(
            if (payload.length >= 2)
              Some(((payload(0) & 0xff) << 8) | (payload(1) & 0xff))
            else None)
        case 0x9 => writeFrame(out, 0xA, payload, Some(rnd)) // ping → pong
        case 0xA => () // unsolicited pong — keepalive noise, ignore
        case other => throw new IOException(f"unsupported opcode 0x$other%x")
      }
    }
    WsClosed(None) // unreachable
  }

  /** Write one FIN frame. `maskWith = Some(rnd)` produces a client frame
    * (masked, per RFC 6455 §5.3); `None` a server frame (unmasked) — the
    * latter exists for the spec's stub server.
    */
  def writeFrame(out: OutputStream, opcode: Int, payload: Array[Byte],
      maskWith: Option[SecureRandom]): Unit = {
    val header = new java.io.ByteArrayOutputStream()
    header.write(0x80 | (opcode & 0x0f))
    val maskBit = if (maskWith.isDefined) 0x80 else 0x00
    val n = payload.length
    if (n < 126) header.write(maskBit | n)
    else if (n <= 0xffff) {
      header.write(maskBit | 126)
      header.write((n >> 8) & 0xff); header.write(n & 0xff)
    } else {
      header.write(maskBit | 127)
      (7 to 0 by -1).foreach(i => header.write(((n.toLong >> (8 * i)) & 0xff).toInt))
    }
    val body = maskWith match {
      case Some(rnd) =>
        val mask = new Array[Byte](4)
        rnd.nextBytes(mask)
        header.write(mask)
        payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte }
      case None => payload
    }
    out.write(header.toByteArray)
    out.write(body)
    out.flush()
  }

  /** Unmask a client frame's payload in place — stub-server side. */
  def unmask(payload: Array[Byte], mask: Array[Byte]): Array[Byte] =
    payload.zipWithIndex.map { case (b, i) => (b ^ mask(i % 4)).toByte }

  /** Stub-server side: read ONE client frame, enforce the client-must-mask
    * rule (RFC 6455 §5.3), and return (opcode, unmasked payload). Single
    * frame only — this codec's client never fragments.
    */
  def readClientFrame(in: InputStream): (Int, Array[Byte]) = {
    val b0 = read1(in)
    val b1 = read1(in)
    if ((b1 & 0x80) == 0)
      throw new IOException("client frame must be masked (RFC 6455 section 5.3)")
    val len7 = b1 & 0x7f
    val len: Long = len7 match {
      case 126 => ((read1(in).toLong << 8) | read1(in)) & 0xffffL
      case 127 => (0 until 8).foldLeft(0L)((acc, _) => (acc << 8) | read1(in))
      case n => n.toLong
    }
    // len < 0: a 64-bit length with the high bit set wrapped negative —
    // reject it like readEvent does, or readN would see a garbage size
    if (len < 0 || len > MaxFramePayload)
      throw new IOException(s"client frame payload $len exceeds cap $MaxFramePayload")
    val mask = readN(in, 4)
    (b0 & 0x0f, unmask(readN(in, len.toInt), mask))
  }

  private def read1(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("peer closed mid-frame")
    b
  }

  private def readN(in: InputStream, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val k = in.read(buf, off, n - off)
      if (k < 0) throw new EOFException(s"peer closed mid-payload ($off/$n bytes)")
      off += k
    }
    buf
  }
}
