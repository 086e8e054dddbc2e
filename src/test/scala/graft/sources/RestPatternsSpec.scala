package graft.sources

import java.util.concurrent.ConcurrentHashMap
import graft.SparkSpec
import RestPatterns._

/** Fails the first `failures` calls per url, then succeeds. Top-level so
  * closures shipping it to executors stay serializable.
  */
class FlakyFetcher(failures: Int) extends Fetcher {
  val calls = new ConcurrentHashMap[String, Integer]()
  def fetch(url: String): Either[String, String] = {
    val n = calls.merge(url, 1, (a, b) => a + b)
    if (n <= failures) Left(s"boom $n") else Right(s"body:$url")
  }
}

/** Specs for the network-source patterns with deterministic stub
  * transports (no egress in this environment).
  */
class RestPatternsSpec extends SparkSpec {

  test("T10: retry with exponential backoff — delays double, success returned") {
    val delays = scala.collection.mutable.ArrayBuffer[Long]()
    val f = new FlakyFetcher(2)
    val got = fetchWithRetry(f, "u1", maxRetries = 3, baseDelayMs = 100, sleep = delays += _)
    assert(got === Right("body:u1"))
    assert(delays.toSeq === Seq(100L, 200L), "one delay per failure, doubling")
    // permanent failure: retries exhausted, last error surfaces
    val dead = fetchWithRetry(new FlakyFetcher(99), "u2", maxRetries = 2,
      baseDelayMs = 1, sleep = _ => ())
    assert(dead === Left("boom 3"))
  }

  test("S8: fan-out per-key fetch runs distributed and covers every key") {
    import spark.implicits._
    val keys = (1 to 100).map(i => s"loc$i")
    val fetched = fanOutFetch(keys.toDS(), k => s"https://api/$k",
      new FlakyFetcher(0), parallelism = 8).collect().toMap
    assert(fetched.size === 100)
    assert(fetched("loc7") === "body:https://api/loc7")
  }

  test("S13: pagination early-exits on empty page and on total reached") {
    // pages of 3 items, total 7 → pages 0,1,2 with 3+3+1 items
    val f = new Fetcher {
      def fetch(url: String): Either[String, String] = {
        val page = url.split("page=")(1).toInt
        val start = page * 3
        val items = (start until math.min(start + 3, 7)).mkString(",")
        Right(s"$items|7")
      }
    }
    def parse(body: String): (Seq[Int], Long) = {
      val Array(items, total) = body.split("\\|")
      (if (items.isEmpty) Seq.empty else items.split(",").toSeq.map(_.toInt), total.toLong)
    }
    assert(paginate(f, p => s"x?page=$p", parse) === (0 until 7))
    // empty first page → nothing
    val empty = new Fetcher {
      def fetch(url: String): Either[String, String] = Right("|0")
    }
    assert(paginate(empty, p => s"x?page=$p", parse) === Seq.empty)
  }

  test("J8: rate-limited lookup skips ledgered keys and spaces calls") {
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val f = new FlakyFetcher(0)
    val got = rateLimitedLookup(Seq("a", "b", "c", "d"), ledger = Set("b", "d"),
      f, k => s"vf/$k", minIntervalMs = 2000, sleep = sleeps += _)
    assert(got === Seq("a" -> Some("body:vf/a"), "b" -> None,
      "c" -> Some("body:vf/c"), "d" -> None))
    assert(sleeps.toSeq === Seq(2000L), "only the second real call waits")
    assert(f.calls.size === 2, "ledgered keys never hit the network")
  }

  test("S12: remote tile fetch + PNG decode + reprojection gather (integration)") {
    import spark.implicits._
    import graft.raster._
    // "remote" tiles: a stub fetcher serving PNG bytes for any tile url
    val (r, g, b) = Codecs.elevationToRgb(42.0)
    val tileFetcher = new Fetcher {
      def fetch(url: String): Either[String, String] = Right(url) // body unused; fetch-per-key shape
    }
    val z = 6; val x = 125; val y = 47
    val keys = Reproject.coveringMercTiles(z, x, y)
    // fan-out fetch of the covering tile keys (the LINZ fetch stage), then
    // decode: here the "download" produces a constant-elevation PNG
    val fetched = fanOutFetch(keys.map(k => s"${k.z}/${k.x}/${k.y}").toDS(),
      u => s"https://tiles/$u.png", tileFetcher, parallelism = 4).collect()
    assert(fetched.length === keys.size)
    val srcTiles = keys.map { k =>
      val px = new Array[Byte](Tiles.TileSize * Tiles.TileSize * 4)
      var i = 0
      while (i < px.length) {
        px(i) = r.toByte; px(i + 1) = g.toByte; px(i + 2) = b.toByte; px(i + 3) = 255.toByte
        i += 4
      }
      // round-trip through the REAL PNG codec, like a fetched tile would
      Png.decode(k.z, k.x, k.y, Png.encode(Tile(k.z, k.x, k.y, Tiles.TileSize, Tiles.TileSize, px)))
    }
    val geoid = GeoidGrid(-90.0, 0.0, 1.0, 1.0, 180, 360, Array.fill(180 * 360)(3f))
    val out = Reproject.reprojectTile(z, x, y, srcTiles.map(t => (t.x, t.y) -> t).toMap, geoid)
    val e = Codecs.terrainRgbToElevation(out.pixels(0) & 0xff, out.pixels(1) & 0xff, out.pixels(2) & 0xff)
    assert(math.abs(e - 45.0) <= 0.05 + 1e-9, s"got $e")
  }

  test("S1: subscription message carries the pushed-down predicates") {
    val msg = subscriptionMessage("KEY", ((-48.0, 166.0), (-34.0, 179.0)),
      Seq("PositionReport", "ShipStaticData"))
    assert(msg.contains("\"BoundingBoxes\":[[[-48.0,166.0],[-34.0,179.0]]]"))
    assert(msg.contains("\"FilterMessageTypes\":[\"PositionReport\",\"ShipStaticData\"]"))
  }

  test("S3/T5: poll snapshot drops rows older than the TTL horizon") {
    val rows = Seq(("v1", 1000L), ("v2", 90000L), ("v3", 100000L))
    val fresh = freshRows[(String, Long)](rows, _._2, nowSec = 100000L, ttlSec = 21600)
    assert(fresh.map(_._1) === Seq("v2", "v3"))
  }
}
