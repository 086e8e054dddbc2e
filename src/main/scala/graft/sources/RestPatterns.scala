package graft.sources

import org.apache.spark.sql.{Dataset, Encoders}

/** Network-source execution patterns (SURVEY §2.1 S1/S3/S8/S13, §2.4 J8,
  * §2.10 T10) with the transport abstracted behind [[Fetcher]] — this
  * environment has no egress, so specs drive the patterns with
  * deterministic stub fetchers; a production HTTP client drops in behind
  * the same trait.
  *
  * What is REAL here (and spec-tested): the distributed fan-out shape,
  * retry/backoff scheduling, the per-key rate-limit ledger, pagination
  * early-exit, and the subscription predicate-pushdown rendering.
  */
object RestPatterns {

  /** Transport: url → Left(error) | Right(body). Implementations must be
    * serializable (constructed on executors).
    */
  trait Fetcher extends Serializable {
    def fetch(url: String): Either[String, String]
  }

  /** T10: retry with exponential backoff
    * (`weather-proxy/server.js:149-159`, `create_nationalmap_mbtiles.py:
    * 48-59`): delays base·2^attempt, injected sleeper so tests don't wait.
    */
  def fetchWithRetry(fetcher: Fetcher, url: String, maxRetries: Int = 3,
      baseDelayMs: Long = 200, sleep: Long => Unit = Thread.sleep): Either[String, String] = {
    var attempt = 0
    var last: Either[String, String] = Left("unattempted")
    while (attempt <= maxRetries) {
      last = fetcher.fetch(url)
      if (last.isRight) return last
      if (attempt < maxRetries) sleep(baseDelayMs * (1L << attempt))
      attempt += 1
    }
    last
  }

  /** S8: fan-out per-key REST source (`power-outages/scrapers/tlc.js:
    * 34-78` — 255 localities × fault types): repartition the key list for
    * fetch parallelism, one fetcher per partition, retry per key.
    */
  def fanOutFetch(keys: Dataset[String], urlFor: String => String,
      fetcher: Fetcher, parallelism: Int): Dataset[(String, String)] = {
    implicit val enc = Encoders.tuple(Encoders.STRING, Encoders.STRING)
    keys.repartition(parallelism).mapPartitions { it =>
      it.map { k =>
        k -> fetchWithRetry(fetcher, urlFor(k), sleep = _ => ()).getOrElse("")
      }
    }
  }

  /** S13: early-exit pagination (`tak-cot-proxy/index.mjs:359-403`):
    * fetch `page=N` until the page is empty or `collected >= total`.
    * `parseItems` returns (items, total).
    */
  def paginate[T](fetcher: Fetcher, urlForPage: Int => String,
      parseItems: String => (Seq[T], Long), maxPages: Int = 1000): Seq[T] = {
    val out = Seq.newBuilder[T]
    var page = 0
    var collected = 0L
    var total = Long.MaxValue
    var done = false
    while (!done && page < maxPages) {
      fetcher.fetch(urlForPage(page)) match {
        case Left(_) => done = true
        case Right(body) =>
          val (items, t) = parseItems(body)
          total = t
          if (items.isEmpty) done = true // early exit (:400-402)
          else {
            out ++= items
            collected += items.size
            if (collected >= total) done = true
            page += 1
          }
      }
    }
    out.result()
  }

  /** J8: rate-limited per-key external lookup
    * (`scripts/find-missing-types.js:36-92`, `docs/NAME_LOOKUP.md:17-37`):
    * skip keys already looked up today (the ledger), space calls by a
    * minimum interval. Returns (key, result-or-skip-marker).
    */
  def rateLimitedLookup(keys: Seq[String], ledger: Set[String],
      fetcher: Fetcher, urlFor: String => String, minIntervalMs: Long,
      sleep: Long => Unit = Thread.sleep): Seq[(String, Option[String])] = {
    var first = true
    keys.map { k =>
      if (ledger.contains(k)) k -> None // ≤ 1/day/key
      else {
        if (!first) sleep(minIntervalMs) // 1 req / interval
        first = false
        k -> fetchWithRetry(fetcher, urlFor(k), sleep = _ => ()).toOption
      }
    }
  }

  /** S1: the AISStream subscription message — SOURCE-LEVEL predicate
    * pushdown (`ais-proxy/server.js:279-283`): bounding boxes + message
    * types ride the subscription so filtered rows never leave the
    * upstream.
    */
  def subscriptionMessage(apiKey: String, bbox: ((Double, Double), (Double, Double)),
      messageTypes: Seq[String]): String = {
    val ((latMin, lonMin), (latMax, lonMax)) = bbox
    s"""{"APIKey":"$apiKey","BoundingBoxes":[[[$latMin,$lonMin],[$latMax,$lonMax]]],""" +
      s""""FilterMessageTypes":[${messageTypes.map(t => s"\"$t\"").mkString(",")}]}"""
  }

  /** S3/T5: poll-source snapshot ingest — rows older than the TTL horizon
    * are skipped at the source (`ais-proxy/server.js:1471-1472`), the
    * watermark analog.
    */
  def freshRows[T](rows: Seq[T], tsSecOf: T => Long, nowSec: Long,
      ttlSec: Long = 21600): Seq[T] =
    rows.filter(r => nowSec - tsSecOf(r) <= ttlSec)
}
