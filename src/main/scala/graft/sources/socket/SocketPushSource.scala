package graft.sources.socket

import java.io.{BufferedReader, InputStreamReader}
import java.net.Socket
import java.nio.charset.StandardCharsets
import java.util.{Map => JMap}

import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Push-socket streaming source (SURVEY §2.1 S1/S14 literal transport).
  *
  * The reference's live feeds are socket PUSH, not poll: a long-lived
  * connection the server writes newline-delimited messages into, with the
  * client expected to reconnect (with backoff) when the peer drops it
  * (`ais-proxy/server.js:256-345` — connect, subscribe, buffer, reconnect on
  * `close`/`error`; `display-proxy/lambdas/tak-contacts-ws/index.mjs:145-200`).
  * This is the same source family as `graft-rest` but with the transport the
  * reference actually uses for AIS/CoT:
  *
  * `spark.readStream.format("graft-socket").option("host", h).option("port", p)`
  * yields rows `(line STRING, seq LONG)`; downstream parsing (jsonais,
  * `from_json`) and the keyed-state merge ([[graft.streaming.KeyedMerge]])
  * are unchanged — transport and semantics compose instead of being one
  * hand-rolled client like the reference.
  *
  * Three wire protocols behind the same reader thread:
  * `option("protocol", "tcp")` (default) reads newline-delimited text;
  * `option("protocol", "ws")` speaks RFC 6455 WebSocket — the reference
  * feeds' actual framing (`ais-proxy/server.js:256`); `option("protocol",
  * "wss")` is the same WebSocket codec over TLS — the reference's real
  * endpoint is `wss://` (`ais-proxy/server.js:256-262`), trusted via the
  * JVM default chain or `option("truststore", jksPath)` +
  * `option("truststorePassword", pw)` for self-signed feeds. All via
  * [[WsFraming]]:
  * HTTP upgrade on connect (`option("path", ...)`, default "/"), one text
  * message per row, pings answered transparently, close/EOF/protocol
  * errors all funneling into the same backoff-and-redial recovery.
  * `option("subscribe", msg)` sends `msg` after EVERY successful
  * (re)connect — the reference re-sends its subscription JSON on each
  * 'open' (`ais-proxy/server.js:286-290`), because a redial without a
  * re-subscribe receives nothing. `option("pingIntervalMs", n)` (ws
  * only) sends a client ping after `n` ms of idle — the reference's 30 s
  * keepalive. Reconnect policy mirrors the reference's close handler
  * (`ais-proxy/server.js:330-350`): close codes 1000/1008 (normal /
  * auth) end the pump for good instead of redialing, and
  * `option("maxReconnectAttempts", n)` bounds consecutive failed dials
  * (0 = retry forever, the long-lived-job default).
  *
  * Execution model (the public `TextSocketMicroBatchStream` shape): a single
  * driver-side reader thread owns the connection and appends lines to a
  * buffer; the offset is the count of lines consumed; each micro-batch ships
  * the `[start, end)` slice to executors; `commit` trims the buffer below
  * the committed offset so memory is bounded by one trigger's backlog, not
  * the stream's history. A push subscription is inherently one connection —
  * at scale you run one source per subscription (per feed/bbox shard) and
  * union them, which is exactly the reference's N-upstream fan-in; the
  * per-source driver cost is a thread and one trigger of buffered lines.
  *
  * Reconnect: the reader thread survives socket drops — on EOF/IOException
  * it backs off (exponential, `reconnectMs`..`maxReconnectMs`) and redials,
  * resetting the backoff after a successful connect. Lines pushed while
  * disconnected are lost, exactly like the reference's transport (its
  * recovery path is the server-side snapshot replay, which is the
  * checkpointed-restart semantics proven in StreamingSpec/Dsv2RestSpec).
  */
class SocketPushTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-socket"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SocketPushTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new SocketPushTable(schema, properties.asScala.toMap)
}

object SocketPushTableProvider {
  /** Raw pushed line plus its stream sequence number (the offset the line
    * was consumed at — a stable per-connection identity for dedup/debug).
    */
  val Schema: StructType = StructType(Seq(
    StructField("line", StringType),
    StructField("seq", LongType)))
}

class SocketPushTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String =
    s"graft-socket(${props.getOrElse("host", "?")}:${props.getOrElse("port", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // normalize like RestScan: options travel through the lowercasing
    // CaseInsensitiveStringMap, but table PROPERTIES keep original case —
    // a camelCase key from that path must not silently miss the lookups
    val opts = props.map { case (k, v) => k.toLowerCase -> v } ++ options.asScala
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = schema
        override def description(): String = name()
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SocketPushMicroBatchStream(
            opts.getOrElse("host",
              throw new IllegalArgumentException("graft-socket requires a host option")),
            opts.getOrElse("port",
              throw new IllegalArgumentException("graft-socket requires a port option")).toInt,
            opts.getOrElse("reconnectms", "50").toLong,
            opts.getOrElse("maxreconnectms", "2000").toLong,
            opts.get("maxlinespertrigger").map { v =>
              val n = v.toLong
              require(n > 0, s"graft-socket maxLinesPerTrigger must be > 0, got $n")
              n
            },
            opts.getOrElse("linesperpartition", "10000").toInt,
            opts.getOrElse("protocol", "tcp"),
            opts.getOrElse("path", "/"),
            opts.get("subscribe"),
            opts.getOrElse("pingintervalms", "0").toLong,
            opts.getOrElse("maxreconnectattempts", "0").toInt,
            opts.get("truststore"),
            opts.get("truststorepassword"))
      }
    }
  }
}

/** Line-count offset: `rows` = lines consumed since the stream started. */
case class SocketOffset(rows: Long) extends Offset {
  override def json(): String = rows.toString
}

class SocketPushMicroBatchStream(host: String, port: Int,
    reconnectMs: Long, maxReconnectMs: Long,
    maxLinesPerTrigger: Option[Long] = None,
    linesPerPartition: Int = 10000,
    protocol: String = "tcp",
    wsPath: String = "/",
    subscribe: Option[String] = None,
    pingIntervalMs: Long = 0,
    maxReconnectAttempts: Int = 0,
    truststore: Option[String] = None,
    truststorePassword: Option[String] = None) extends MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{ReadLimit, ReadMaxRows}

  // fail at construction, not as a silently-dead reader thread: these
  // values are only ever used inside the pump loop, where an
  // IllegalArgumentException would otherwise kill it without surfacing
  require(port > 0 && port <= 65535, s"graft-socket port out of range: $port")
  require(reconnectMs > 0, s"graft-socket reconnectMs must be > 0, got $reconnectMs")
  require(maxReconnectMs >= reconnectMs,
    s"graft-socket maxReconnectMs ($maxReconnectMs) must be >= reconnectMs ($reconnectMs)")
  require(protocol == "tcp" || protocol == "ws" || protocol == "wss",
    s"graft-socket protocol must be 'tcp', 'ws', or 'wss', got '$protocol'")
  require(wsPath.startsWith("/"), s"graft-socket path must start with '/', got '$wsPath'")
  require(pingIntervalMs >= 0,
    s"graft-socket pingIntervalMs must be >= 0, got $pingIntervalMs")
  // setSoTimeout takes an Int: a larger value would truncate negative and
  // turn EVERY connect cycle into a silent backoff-redial loop
  require(pingIntervalMs <= Int.MaxValue,
    s"graft-socket pingIntervalMs must be <= ${Int.MaxValue}, got $pingIntervalMs")
  require(pingIntervalMs == 0 || protocol != "tcp",
    "graft-socket pingIntervalMs requires protocol=ws/wss (tcp has no ping frame)")
  require(maxReconnectAttempts >= 0,
    s"graft-socket maxReconnectAttempts must be >= 0 (0 = unlimited), got $maxReconnectAttempts")
  require(truststore.isEmpty || protocol == "wss",
    "graft-socket truststore requires protocol=wss")
  private val useWs = protocol == "ws" || protocol == "wss"
  private val useTls = protocol == "wss"

  /** TLS socket factory for `wss`: the JVM default trust chain, or — for
    * self-signed endpoints (and the TLS spec's local stub) — the JKS/PKCS12
    * truststore from `option("truststore", path)` +
    * `option("truststorePassword", pw)`. Built once; dial failures
    * (untrusted cert, handshake alert) surface per-connect in the pump's
    * normal backoff path.
    */
  private lazy val sslFactory: javax.net.ssl.SSLSocketFactory = truststore match {
    case None => javax.net.ssl.SSLContext.getDefault.getSocketFactory
    case Some(path) =>
      val ks = java.security.KeyStore.getInstance(java.security.KeyStore.getDefaultType)
      val in = new java.io.FileInputStream(path)
      // null password = load WITHOUT the keystore integrity check (the
      // standard client behavior); an empty char[] would FORCE the check
      // and fail on any password-protected truststore when the option is
      // simply omitted
      try ks.load(in, truststorePassword.map(_.toCharArray).orNull)
      finally in.close()
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, null)
      ctx.getSocketFactory
  }

  /** Dial one connection: plain TCP for tcp/ws, TLS for wss. The TLS
    * handshake runs eagerly so a certificate rejection fails THIS connect
    * cycle (backoff-and-redial) instead of surfacing lazily mid-read.
    */
  private def dial(): Socket =
    if (!useTls) new Socket(host, port)
    else {
      val s = sslFactory.createSocket(host, port).asInstanceOf[javax.net.ssl.SSLSocket]
      // HTTPS endpoint identification: the peer cert must actually name
      // `host` — without this, ANY trusted certificate authenticates any
      // endpoint (silent MITM exposure for every wss feed)
      val params = s.getSSLParameters
      params.setEndpointIdentificationAlgorithm("HTTPS")
      s.setSSLParameters(params)
      s.startHandshake()
      s
    }

  /** Close codes after which the pump does NOT redial: 1000 (normal
    * closure) and 1008 (policy violation — auth rejection in practice).
    * The reference applies exactly this policy
    * (`ais-proxy/server.js:333-337`: "closed normally or due to auth
    * error, not reconnecting") — hammering a server that deliberately
    * ended the stream is wrong at any scale.
    */
  private val FinalCloseCodes = Set(1000, 1008)
  // frame-mask randomness for client→server control frames (ws only)
  private lazy val wsRandom = new java.security.SecureRandom()

  // buffer holds lines [firstOffset, firstOffset + buffer.size); all access
  // under `lock`. The reader thread is the only writer; commit() trims.
  private val lock = new Object
  private val buffer = new ArrayBuffer[String]()
  private var firstOffset = 0L
  // false until this incarnation has planned or committed a batch — gates
  // the restart fast-forward (renumbering is only safe while nothing has
  // been delivered yet)
  private var started = false
  @volatile private var stopped = false
  @volatile private var currentSocket: Socket = null

  private val reader = new Thread(s"graft-socket-$host:$port") {
    override def run(): Unit = {
      var backoff = reconnectMs
      // consecutive cycles without a completed connect (dial or handshake
      // failure); reset on success, like the reference's reconnectAttempts
      var attempts = 0
      var lastLogged: String = null
      while (!stopped) {
        var connected = false
        try {
          val s = dial()
          currentSocket = s
          // stop() may have run while the dial was in flight (connect is not
          // interruptible): bail out instead of blocking in readLine forever
          if (stopped) return
          if (useWs) {
            // ws:// transport (the reference's actual feed protocol): HTTP
            // upgrade first — a server that accepts TCP but refuses the
            // upgrade throws here and takes the normal backoff path (the
            // reset below is only reached on a COMPLETED handshake)
            WsFraming.clientHandshake(s.getInputStream, s.getOutputStream,
              host, port, wsPath, wsRandom)
            connected = true; attempts = 0
            backoff = reconnectMs
            lastLogged = null
            // subscription goes out after EVERY successful handshake — a
            // redial without a re-subscribe receives nothing (the
            // reference re-sends its subscription on each 'open',
            // ais-proxy/server.js:286-290)
            subscribe.foreach { sub =>
              WsFraming.writeFrame(s.getOutputStream, 0x1,
                sub.getBytes(StandardCharsets.UTF_8), Some(wsRandom))
            }
            // keepalive: SO_TIMEOUT + idlePing turns an idle read timeout
            // at a frame boundary into a client ping (reference pings
            // every 30 s to hold the upstream open)
            val idlePing = pingIntervalMs > 0
            if (idlePing) s.setSoTimeout(pingIntervalMs.toInt)
            // one WS text message = one pushed document (the reference
            // sends one AIS/CoT JSON per message); embedded newlines split
            // into rows so message framing and line framing stay equivalent
            // for downstream parsers, and blank segments are dropped
            var live = true
            while (live && !stopped) {
              WsFraming.readEvent(s.getInputStream, s.getOutputStream,
                  wsRandom, idlePing) match {
                case WsFraming.WsText(m) =>
                  m.split("\n").foreach { l =>
                    if (l.nonEmpty) lock.synchronized { buffer += l }
                  }
                case WsFraming.WsClosed(code) if code.exists(FinalCloseCodes) =>
                  // deliberate closure (normal end-of-stream or auth
                  // rejection): redialing would hammer a server that chose
                  // to end the stream — pump ends for good; buffered lines
                  // stay drainable by later micro-batches
                  System.err.println(s"[graft-socket] $host:$port closed the " +
                    s"stream (code ${code.get}) — not reconnecting")
                  return
                case WsFraming.WsClosed(_) =>
                  live = false // transient close — redial like a drop
              }
            }
          } else {
            connected = true; attempts = 0
            backoff = reconnectMs // successful dial resets the backoff
            lastLogged = null // next failure after a live connection logs again
            // tcp subscribe: one line out after every (re)connect — same
            // re-subscription semantics as the ws path
            subscribe.foreach { sub =>
              val w = s.getOutputStream
              w.write((sub + "\n").getBytes(StandardCharsets.UTF_8))
              w.flush()
            }
            val in = new BufferedReader(
              new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8))
            var line = in.readLine()
            while (line != null && !stopped) {
              lock.synchronized { buffer += line }
              line = in.readLine()
            }
          }
        } catch {
          // dropped, refused, or anything else transient — a pump that dies
          // on an unanticipated throwable hangs the query at 0 rows forever,
          // so every non-fatal error takes the backoff-and-redial path.
          // Log each DISTINCT error once per outage (not per retry): a
          // typo'd host must be diagnosable from the logs, but a long
          // outage must not flood them at the retry cadence
          case scala.util.control.NonFatal(e) =>
            val msg = s"${e.getClass.getSimpleName}: ${e.getMessage}"
            if (msg != lastLogged) {
              lastLogged = msg
              System.err.println(
                s"[graft-socket] $host:$port unavailable, retrying with backoff: $msg")
            }
        }
        finally {
          val s = currentSocket
          if (s != null) { try s.close() catch { case _: java.io.IOException => () } }
        }
        if (!stopped) {
          if (!connected) {
            attempts += 1
            if (maxReconnectAttempts > 0 && attempts >= maxReconnectAttempts) {
              // the reference gives up after MAX_RECONNECT_ATTEMPTS
              // (ais-proxy/server.js:252,346-350); 0 keeps the default
              // retry-forever behavior for long-lived jobs
              System.err.println(s"[graft-socket] $host:$port unreachable after " +
                s"$attempts attempts — giving up")
              return
            }
          }
          try Thread.sleep(backoff) catch { case _: InterruptedException => () }
          backoff = math.min(backoff * 2, maxReconnectMs)
        }
      }
    }
  }
  reader.setDaemon(true)
  reader.start()

  /** Spec hook: whether the pump thread is still running (false after a
    * deliberate-close halt, a reconnect-budget exhaustion, or stop()).
    */
  private[socket] def readerAlive: Boolean = reader.isAlive

  override def initialOffset(): Offset = SocketOffset(0L)
  override def deserializeOffset(json: String): Offset = SocketOffset(json.trim.toLong)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used with SupportsAdmissionControl")

  /** Admission control (the `graft-rest` maxPagesPerTrigger shape): after a
    * reconnect against a fast producer the buffered backlog drains in
    * bounded micro-batches instead of one giant catch-up job.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxLinesPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    lock.synchronized {
      val s = start.asInstanceOf[SocketOffset].rows
      // clean-restart reconciliation: the checkpointed cursor resumes ahead
      // of this incarnation's 0-based numbering. Before anything has been
      // planned or committed, renumbering is safe (nothing was delivered),
      // so adopt the cursor — lines buffered since reconnect become
      // [s, s + size) instead of being silently skipped
      if (!started && s > firstOffset) firstOffset = s
      started = true
      // ...and never regress below the cursor either way
      val avail = math.max(firstOffset + buffer.size, s)
      SocketOffset(limit match {
        case m: ReadMaxRows => math.min(avail, s + m.maxRows)
        case _ => avail
      })
    }
  override def reportLatestOffset(): Offset =
    lock.synchronized { SocketOffset(firstOffset + buffer.size) }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    lock.synchronized {
      val s = start.asInstanceOf[SocketOffset].rows
      val e = end.asInstanceOf[SocketOffset].rows
      if (!started) {
        // first planning call of this incarnation with no latestOffset
        // before it = a checkpoint REPLAY of the last logged batch (a fresh
        // query's batch 0 always resolves latestOffset first). The replayed
        // range is checkpoint-numbered; the 0-based buffer holds only lines
        // pushed since the reconnect, so serving the range from it would
        // deliver the WRONG lines. The original data is gone — this
        // transport is replay-less, like Spark's own socket source — so the
        // replay yields no rows, and the numbering fast-forwards past the
        // replayed range (keeping the buffer: those lines become
        // [e, e + size) and flow into the NEXT batch instead of being
        // dropped or mislabeled)
        started = true
        if (e > firstOffset) firstOffset = e
        Array.empty
      } else {
        // in-incarnation offsets: belt-and-braces clamp to what is buffered
        val lo = math.max(s, firstOffset)
        val hi = math.min(e, firstOffset + buffer.size)
        val rows = (lo until hi).map { off =>
          (buffer((off - firstOffset).toInt), off)
        }.toArray
        // chunk so a deep post-reconnect backlog parses in parallel instead
        // of serializing on one task (downstream jsonais/from_json is the
        // expensive part, not the transport)
        rows.grouped(math.max(1, linesPerPartition))
          .map(SocketRowsPartition(_): InputPartition).toArray
      }
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new SocketRowsReaderFactory

  override def commit(end: Offset): Unit = lock.synchronized {
    val e = end.asInstanceOf[SocketOffset].rows
    if (e > firstOffset + buffer.size) {
      // committing STRICTLY past everything buffered = the replayed-batch
      // case after a restart (a normal full drain commits exactly at
      // firstOffset + size and takes the trim branch): fast-forward the
      // numbering to the checkpointed cursor and KEEP the buffer — these
      // lines arrived post-restart and were never delivered (dropping them
      // here would silently lose live data)
      firstOffset = e
    } else if (e > firstOffset) {
      buffer.remove(0, (e - firstOffset).toInt)
      firstOffset = e
    }
  }

  override def stop(): Unit = {
    stopped = true
    val s = currentSocket
    if (s != null) { try s.close() catch { case _: java.io.IOException => () } }
    reader.interrupt()
    // join so a stopped stream leaves no pump behind still buffering (the
    // post-connect `stopped` check bounds how long a dial in flight can
    // outlive us; daemon status backstops a pathological blocked join)
    try reader.join(5000) catch { case _: InterruptedException => () }
  }
}

/** One micro-batch's buffered lines (driver → executors by value — the
  * slice is at most one trigger's backlog of a single push connection).
  */
case class SocketRowsPartition(rows: Array[(String, Long)]) extends InputPartition

class SocketRowsReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val rows = partition.asInstanceOf[SocketRowsPartition].rows
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < rows.length }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(rows(i)._1), rows(i)._2)
      override def close(): Unit = ()
    }
  }
}
