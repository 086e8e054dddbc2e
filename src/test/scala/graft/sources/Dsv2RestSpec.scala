package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSv2 `graft-rest` reader (SURVEY S13/S1): partition-per-page planning,
  * early exit at the first missing page, and subscription pushdown enforced
  * by the source (not the Spark plan).
  */
class Dsv2RestSpec extends SparkSpec {

  private def writePage(dir: java.io.File, name: String, text: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
    try w.write(text) finally w.close()
  }

  /** n contiguous pages, one `{"id":p,"type":"t","k":p}` item each. */
  private def stageContiguous(n: Int): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_contig").toFile
    (0 until n).foreach { p =>
      writePage(dir, s"page-$p.json",
        s"""{"page":$p,"items":[{"id":$p,"type":"t","k":$p}],"total":1}""")
    }
    dir
  }

  private def stagePages(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_spec").toFile
    writePage(dir, "page-0.json",
      """{"page":0,"items":[{"id":1,"type":"click","k":5},{"id":2,"type":"view","k":20}],"total":2}""")
    writePage(dir, "page-1.json",
      """{"page":1,"items":[{"id":3,"type":"click","k":30}],"total":1}""")
    writePage(dir, "page-2.json", """{"page":2,"items":[],"total":0}""")
    // page-3 missing → planning must stop; page-4 is poison that must
    // never be fetched (unparseable JSON would throw)
    writePage(dir, "page-4.json", "NOT JSON")
    dir
  }

  // the poison fixture violates page contiguity on purpose, so these tests
  // exercise the reference-exact sequential probe; doubling-mode tests
  // stage their own contiguous fixtures
  private def read(dir: java.io.File) =
    spark.read.format("graft-rest")
      .option("endpoint", s"file://${dir.getAbsolutePath}/page-{page}.json")
      .option("probe", "sequential")
      .load()

  test("partition-per-page with early exit at the first missing page") {
    val dir = stagePages()
    val df = read(dir)
    assert(df.rdd.getNumPartitions === 3, "one input partition per existing page")
    val rows = df.select("id", "type", "k", "page").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    // poison page-4 absent: planning stopped at the page-3 hole
    assert(rows === Set((1L, "click", 5L, 0L), (2L, "view", 20L, 0L),
      (3L, "click", 30L, 1L)))
  }

  test("predicate pushdown lands in the subscription and the source enforces it") {
    val dir = stagePages()
    val df = read(dir).filter(col("type") === "click" && col("k") >= 10)
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.nonEmpty, "expected a DSv2 BatchScan")
    val desc = scans.head.scan.description()
    assert(desc.contains("type=click") && desc.contains("k>=10"),
      s"subscription should carry both pushed predicates: $desc")
    assert(df.collect().map(_.getLong(0)).toSet === Set(3L))
  }

  test("column pruning reaches the reader schema") {
    val dir = stagePages()
    val df = read(dir).select("id")
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    assert(scans.head.scan.readSchema().fieldNames.toSeq === Seq("id"))
  }

  test("In and StringContains push into the subscription and drop rows at source") {
    val dir = stagePages()
    val df = read(dir)
      .filter(col("type").isin("click", "tap") && col("type").contains("li"))
    val scans = df.queryExecution.sparkPlan.collect { case b: BatchScanExec => b }
    val desc = scans.head.scan.description()
    assert(desc.contains("type in(click,tap)") && desc.contains("type contains(li)"),
      s"subscription should carry the type-set and substring predicates: $desc")
    // the Spark plan keeps no residual Filter — the source enforces both
    val residual = df.queryExecution.optimizedPlan.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    assert(residual.isEmpty, "pushed predicates must not stay in the plan")
    assert(df.collect().map(_.getLong(0)).toSet === Set(1L, 3L))
  }

  test("planning discovers the page count in O(log n) existence probes") {
    val dir = stageContiguous(8)
    val before = graft.sources.rest.RestPageFetch.probeCount.get()
    val n = graft.sources.rest.RestScan.pageCount(
      s"file://${dir.getAbsolutePath}/page-{page}.json", 100000L)
    val probes = graft.sources.rest.RestPageFetch.probeCount.get() - before
    assert(n === 8L)
    // 0,1,2,4,8(miss),6,7 — doubling then bisect, not a page-per-probe walk
    assert(probes === 7L, s"expected 7 probes for 8 pages, got $probes")
  }

  test("doubling page count == sequential for every contiguous feed length") {
    val dir = stageContiguous(40)
    val ep = s"file://${dir.getAbsolutePath}/page-{page}.json"
    // maxPages = n simulates a feed of exactly n pages (cap interplay with
    // the bisect boundary); the 40-page dir exercises the miss boundary
    (0 to 40).foreach { n =>
      val d = graft.sources.rest.RestScan.pageCount(ep, n, "doubling")
      val s = graft.sources.rest.RestScan.pageCount(ep, n, "sequential")
      assert(d === s && d === math.min(n, 40), s"feed length $n: doubling=$d sequential=$s")
    }
    // cursor-relative discovery agrees from every starting offset
    (0 to 40).foreach { from =>
      val d = graft.sources.rest.RestScan.pageCount(ep, 100000L, "doubling", from)
      assert(d === 40L, s"from=$from: got $d")
    }
  }

  test("http transport: HEAD-probe planning + body fetch against a live server") {
    // the reference feed is an HTTP service — exercise the real transport
    // with the JDK's built-in server: 3 pages, 404 beyond, and a HEAD/GET
    // method log proving planning probes without fetching bodies
    val pages = Map(
      0 -> """{"page":0,"items":[{"id":1,"type":"click","k":5}],"total":1}""",
      1 -> """{"page":1,"items":[{"id":2,"type":"view","k":20}],"total":1}""",
      2 -> """{"page":2,"items":[],"total":0}""")
    val methods = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/feed/", { exchange =>
      val page = exchange.getRequestURI.getPath.stripPrefix("/feed/page-")
        .stripSuffix(".json").toInt
      methods.add(s"${exchange.getRequestMethod} $page")
      pages.get(page) match {
        case Some(body) if exchange.getRequestMethod == "HEAD" =>
          exchange.sendResponseHeaders(200, -1)
        case Some(body) =>
          val bytes = body.getBytes("UTF-8")
          exchange.sendResponseHeaders(200, bytes.length)
          exchange.getResponseBody.write(bytes)
        case None => exchange.sendResponseHeaders(404, -1)
      }
      exchange.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val df = spark.read.format("graft-rest")
        .option("endpoint", s"http://127.0.0.1:$port/feed/page-{page}.json")
        .load()
        .filter(col("k") >= 10)
      assert(df.rdd.getNumPartitions === 3, "one partition per live page")
      assert(df.collect().map(_.getLong(0)).toSet === Set(2L))
      val log = methods.toArray(Array.empty[String]).toSeq
      assert(log.count(_.startsWith("HEAD")) >= 3, s"planning must HEAD-probe: $log")
      // bodies fetched only for existing pages, exactly one GET each
      assert(log.filter(_.startsWith("GET")).sorted === Seq("GET 0", "GET 1", "GET 2"),
        s"each live page fetched once, none past the end: $log")
    } finally server.stop(0)
  }

  test("maxPagesPerTrigger drains a backlog in bounded micro-batches") {
    val dir = stageContiguous(5)
    val tmp = java.nio.file.Files.createTempDirectory("graft_rest_admission_out")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-rest")
      .option("endpoint", s"file://${dir.getAbsolutePath}/page-{page}.json")
      .option("MAXPAGESPERTRIGGER", "2") // options are case-insensitive
      .load()
      .writeStream.option("checkpointLocation", tmp.resolve("ckpt").toString)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }.start()
    try q.processAllAvailable() finally q.stop()
    // 5 pages at 2 per trigger → 2+2+1, never more than the cap
    assert(batchSizes.sum === 5L, s"backlog must drain fully: $batchSizes")
    assert(batchSizes.forall(_ <= 2L), s"no batch may exceed the cap: $batchSizes")
    assert(batchSizes.count(_ > 0) === 3, s"expected 3 non-empty batches: $batchSizes")
  }

  test("micro-batch stream reads only newly appeared pages and restores its cursor") {
    import spark.implicits._
    // contiguous fixture (default doubling probe): pages 0-2, page 2 empty
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_stream_pages").toFile
    writePage(dir, "page-0.json",
      """{"page":0,"items":[{"id":1,"type":"click","k":5},{"id":2,"type":"view","k":20}],"total":2}""")
    writePage(dir, "page-1.json", """{"page":1,"items":[{"id":3,"type":"click","k":30}],"total":1}""")
    writePage(dir, "page-2.json", """{"page":2,"items":[],"total":0}""")
    val tmp = java.nio.file.Files.createTempDirectory("graft_rest_stream")
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString
    def start() = spark.readStream.format("graft-rest")
      .option("endpoint", s"file://${dir.getAbsolutePath}/page-{page}.json")
      .load()
      .writeStream.option("checkpointLocation", ckpt)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.write.mode("append").parquet(outDir)
      }.start()

    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val firstRun = spark.read.parquet(outDir).as[(Long, String, Long, Long)].collect().toSet
    assert(firstRun.map(_._1) === Set(1L, 2L, 3L), s"run 1 should drain pages 0-2: $firstRun")

    // page 3 appears while the stream is down; restart must resume at
    // offset 3 and emit ONLY the new page (no replay of pages 0-2)
    writePage(dir, "page-3.json",
      """{"page":3,"items":[{"id":9,"type":"tap","k":90}],"total":1}""")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val all = spark.read.parquet(outDir).as[(Long, String, Long, Long)].collect()
    assert(all.length === 4, s"restart must not replay consumed pages: ${all.toSeq}")
    assert(all.map(_._1).toSet === Set(1L, 2L, 3L, 9L))
  }
}
