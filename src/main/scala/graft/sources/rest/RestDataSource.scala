package graft.sources.rest

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Data Source V2 reader for the paginated REST envelope feed (SURVEY §2.1
  * S13 "partition-per-page", S1 subscription pushdown; reference
  * `tak-cot-proxy/index.mjs:359-403` — numbered `{page, items, total}`
  * envelopes fetched until an empty/missing page, with the bbox /
  * message-type narrowing rendered into the subscription).
  *
  * `spark.read.format("graft-rest").option("endpoint", tpl).load()` where
  * `tpl` contains a `{page}` placeholder (`file:` and `http(s):` URLs; no
  * other transports). One Spark input partition per page — page fetches run
  * in parallel across executors, which is the property that scales this to
  * thousands of pages. Early exit appears twice, like the reference's
  * fetch loop: planning probes page existence sequentially until the first
  * miss (`:400-402`), and each reader stops at an empty `items` array.
  *
  * Pushdown: [[SupportsPushDownFilters]] accepts equality/comparison
  * predicates on the envelope's item fields and renders them into the
  * subscription string the "server" (the page fetcher) enforces — exactly
  * the shape of the reference's server-side bbox/type subscription
  * (`ais-proxy/server.js:279-283`). Unsupported predicates stay in the
  * Spark plan. [[SupportsPushDownRequiredColumns]] prunes the emitted
  * columns.
  */
class RestTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-rest"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RestTableProvider.DefaultSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new RestTable(schema, properties.asScala.toMap)
}

object RestTableProvider {
  /** The q56 envelope's item fields plus the page number. */
  val DefaultSchema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("type", StringType),
    StructField("k", LongType),
    StructField("page", LongType)))
}

class RestTable(schema: StructType, props: Map[String, String])
    extends Table with SupportsRead {
  override def name(): String = s"graft-rest(${props.getOrElse("endpoint", "?")})"
  override def schema(): StructType = schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RestScanBuilder(schema, props ++ options.asScala)
}

class RestScanBuilder(fullSchema: StructType, props: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = fullSchema

  /** Server-side-expressible predicates: (in)equality + comparisons on the
    * item fields, plus type-set (`In`) and substring (`StringContains`)
    * narrowing — the reference's message-type-list / text subscription
    * (`ais-proxy/server.js:279-283`, `power-outages/server.js:517-536`).
    * Everything else is returned for Spark to evaluate.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, rest) = filters.partition {
      case EqualTo(a, _) => fullSchema.fieldNames.contains(a)
      case GreaterThan(a, _) => fullSchema.fieldNames.contains(a)
      case GreaterThanOrEqual(a, _) => fullSchema.fieldNames.contains(a)
      case LessThan(a, _) => fullSchema.fieldNames.contains(a)
      case LessThanOrEqual(a, _) => fullSchema.fieldNames.contains(a)
      case In(a, _) => fullSchema.fieldNames.contains(a)
      case StringContains(a, _) => fullSchema.fieldNames.contains(a)
      case IsNotNull(a) => fullSchema.fieldNames.contains(a)
      case _ => false
    }
    pushed = ok
    rest
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RestScan(required, props, pushed)
}

/** One page = one input partition. */
case class RestPagePartition(page: Long, uri: String) extends InputPartition

class RestScan(readSchema0: StructType, props: Map[String, String],
    pushed: Array[Filter]) extends Scan with Batch {

  // DSv2 options are case-insensitive everywhere else (they travel through
  // CaseInsensitiveStringMap, which lowercases), so normalize before lookup
  // — a camelCase key from the table-properties path must not silently miss
  private val opts = props.map { case (k, v) => k.toLowerCase -> v }
  private val endpoint = opts.getOrElse("endpoint",
    throw new IllegalArgumentException("graft-rest requires an endpoint option"))
  private val maxPages = opts.getOrElse("maxpages", "100000").toLong
  private val probeMode = opts.getOrElse("probe", "doubling")
  private val maxPagesPerTrigger: Option[Long] =
    opts.get("maxpagespertrigger").map { v =>
      val n = try v.toLong catch {
        case _: NumberFormatException => throw new IllegalArgumentException(
          s"graft-rest maxPagesPerTrigger must be a positive long, got '$v'")
      }
      require(n > 0, s"graft-rest maxPagesPerTrigger must be > 0, got $n" +
        " (0 would stall the stream forever)")
      n
    }

  /** The reference renders pushed predicates into the subscription string
    * (`ais-proxy/server.js:279-283`); shown in `description()` so plans
    * surface what was pushed.
    */
  val subscription: String = pushed.map {
    case EqualTo(a, v) => s"$a=$v"
    case GreaterThan(a, v) => s"$a>$v"
    case GreaterThanOrEqual(a, v) => s"$a>=$v"
    case LessThan(a, v) => s"$a<$v"
    case LessThanOrEqual(a, v) => s"$a<=$v"
    case In(a, vs) => s"$a in(${vs.map(String.valueOf).sorted.mkString(",")})"
    case StringContains(a, v) => s"$a contains($v)"
    case IsNotNull(a) => s"$a?"
    case f => f.toString
  }.sorted.mkString("&")

  override def readSchema(): StructType = readSchema0
  override def description(): String =
    s"graft-rest endpoint=$endpoint subscription=[$subscription]"
  override def toBatch: Batch = this

  /** S1/S14 streaming transport parity (`ais-proxy/server.js:256-345`,
    * `tak-contacts-ws/index.mjs:145-200`): the offset is the page cursor,
    * and each micro-batch reads exactly the pages that appeared since the
    * last one — `readStream.format("graft-rest")` feeds
    * [[graft.streaming.KeyedMerge]] directly, with Structured Streaming
    * supplying checkpointed restart (the reference's snapshot reload).
    */
  override def toMicroBatchStream(checkpointLocation: String):
      org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new RestMicroBatchStream(readSchema0, endpoint, maxPages, probeMode,
      maxPagesPerTrigger, pushed)

  /** Partition-per-page. Planning discovers the page count with a
    * doubling-then-bisect existence search by default (probe 1, 2, 4, …
    * until a miss, then binary-search the boundary) — O(log n) driver
    * round-trips instead of O(n), which is what keeps planning cheap at
    * thousands of pages. Doubling relies on the REST pagination contract
    * that pages are contiguous from 0 ("page exists" is monotone); for a
    * server that answers 200 past the end of the feed, `probe=sequential`
    * restores the reference's exact walk-until-first-miss schedule
    * (`tak-cot-proxy/index.mjs:400-402`). Existence is a HEAD / stat
    * probe either way — no page body is ever fetched at planning time.
    */
  override def planInputPartitions(): Array[InputPartition] =
    Array.tabulate(RestScan.pageCount(endpoint, maxPages, probeMode).toInt) { i =>
      RestPagePartition(i.toLong, endpoint.replace("{page}", i.toString))
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(readSchema0, pushed)
}

object RestScan {
  /** Number of existing pages in [0, maxPages], all pages below `from`
    * already known to exist (a consumed stream cursor). `doubling`
    * (default) is an exponential probe + bisect over the "page exists"
    * predicate — ≤ 2·log2(new pages) + 2 probes, correct when pages are
    * contiguous from 0. `sequential` is the reference-exact walk that
    * stops at the first missing page — O(n) probes, but also correct when
    * a server keeps answering past the end of the feed.
    */
  def pageCount(endpoint: String, maxPages: Long, mode: String = "doubling",
      from: Long = 0L): Long = {
    def ex(p: Long): Boolean =
      p < maxPages && RestPageFetch.exists(endpoint.replace("{page}", p.toString))
    mode match {
      case "sequential" =>
        var page = from
        while (ex(page)) page += 1
        page
      case _ =>
        if (!ex(from)) from
        else {
          var lo = from // highest page known to exist
          var hi = from + 1 // candidate first-missing page
          while (ex(hi)) { lo = hi; hi = math.min(from + (hi - from) * 2, maxPages) }
          while (hi - lo > 1) { // invariant: ex(lo) && !ex(hi)
            val mid = lo + (hi - lo) / 2
            if (ex(mid)) lo = mid else hi = mid
          }
          hi
        }
    }
  }
}

/** Page-cursor offset: `pages` = number of contiguous pages consumed. */
case class RestOffset(pages: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = pages.toString
}

/** Micro-batch facet of the paginated feed: `latestOffset` resumes the
  * O(log new-pages) existence search from the committed cursor (pages
  * only ever append), and a batch is the half-open page range
  * `[start, end)` — one input partition per new page, same reader and
  * pushed subscription as the batch scan. Page discovery happens on the
  * driver only; executors fetch page bodies.
  *
  * Admission control: `maxPagesPerTrigger` caps each micro-batch (the
  * Kafka `maxOffsetsPerTrigger` shape) so a restart against a deep
  * backlog drains in bounded batches instead of one giant catch-up job.
  */
class RestMicroBatchStream(schema: StructType, endpoint: String,
    maxPages: Long, probeMode: String, maxPagesPerTrigger: Option[Long],
    pushed: Array[Filter])
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxRows}

  override def initialOffset(): Offset = RestOffset(0L)
  override def getDefaultReadLimit: ReadLimit =
    maxPagesPerTrigger.map(m => ReadLimit.maxRows(m)).getOrElse(ReadLimit.allAvailable())
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(start, limit) is used with SupportsAdmissionControl")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[RestOffset].pages
    val avail = RestScan.pageCount(endpoint, maxPages, probeMode, from = s)
    RestOffset(limit match {
      case m: ReadMaxRows => math.min(avail, s + m.maxRows)
      case _ => avail
    })
  }
  override def reportLatestOffset(): Offset = null // unknown without a probe
  override def deserializeOffset(json: String): Offset =
    RestOffset(json.trim.toLong)
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[RestOffset].pages
    val e = end.asInstanceOf[RestOffset].pages
    (s until e).map { p =>
      RestPagePartition(p, endpoint.replace("{page}", p.toString)): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new RestReaderFactory(schema, pushed)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

class RestReaderFactory(schema: StructType, pushed: Array[Filter])
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new RestPageReader(partition.asInstanceOf[RestPagePartition], schema, pushed)
}

/** Fetch + parse one page envelope; emit one row per item surviving the
  * subscription. An empty `items` array yields no rows (the per-reader
  * early-exit).
  */
class RestPageReader(p: RestPagePartition, schema: StructType,
    pushed: Array[Filter]) extends PartitionReader[InternalRow] {

  private val items: Iterator[Map[String, Any]] = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(RestPageFetch.fetch(p.uri))
    val arr = root.get("items")
    if (arr == null || !arr.isArray) Iterator.empty
    else arr.elements().asScala.map { it =>
      Map[String, Any](
        "id" -> it.path("id").asLong(),
        "type" -> it.path("type").asText(),
        "k" -> it.path("k").asLong(),
        "page" -> p.page)
    }.filter(row => pushed.forall(RestPageFetch.eval(_, row)))
  }

  private var cur: Map[String, Any] = _
  override def next(): Boolean = {
    if (items.hasNext) { cur = items.next(); true } else false
  }
  override def get(): InternalRow =
    InternalRow.fromSeq(schema.fields.toSeq.map { f =>
      (f.dataType, cur(f.name)) match {
        case (StringType, v: String) => UTF8String.fromString(v)
        case (LongType, v: Long) => v
        case (_, v) => v
      }
    })
  override def close(): Unit = ()
}

/** Transport + the "server side" of the pushed subscription. */
object RestPageFetch {
  /** Total existence probes issued (test observability for the O(log n)
    * planning guarantee).
    */
  val probeCount = new java.util.concurrent.atomic.AtomicLong(0L)

  def exists(uri: String): Boolean = {
    probeCount.incrementAndGet()
    if (uri.startsWith("file:")) new java.io.File(new java.net.URI(uri)).exists()
    else {
      val c = new java.net.URI(uri).toURL.openConnection()
      c match {
        case h: java.net.HttpURLConnection =>
          h.setRequestMethod("HEAD"); h.getResponseCode == 200
        case _ => true
      }
    }
  }

  def fetch(uri: String): String = {
    val in = new java.net.URI(uri).toURL.openStream()
    try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
  }

  /** Evaluate a pushed predicate against an item (numbers compare as Long,
    * strings lexically — the envelope's only types).
    */
  def eval(f: Filter, row: Map[String, Any]): Boolean = {
    def cmp(attr: String, v: Any): Option[Int] = (row.get(attr), v) match {
      case (Some(a: Long), n: Number) => Some(java.lang.Long.compare(a, n.longValue()))
      case (Some(a: String), s: String) => Some(a.compareTo(s))
      case _ => None
    }
    f match {
      case EqualTo(a, v) => cmp(a, v).contains(0)
      case GreaterThan(a, v) => cmp(a, v).exists(_ > 0)
      case GreaterThanOrEqual(a, v) => cmp(a, v).exists(_ >= 0)
      case LessThan(a, v) => cmp(a, v).exists(_ < 0)
      case LessThanOrEqual(a, v) => cmp(a, v).exists(_ <= 0)
      case In(a, vs) => vs.exists(v => cmp(a, v).contains(0))
      case StringContains(a, v) => row.get(a) match {
        case Some(s: String) => s.contains(v)
        case _ => false
      }
      case IsNotNull(a) => row.get(a).exists(_ != null)
      case _ => true
    }
  }
}
