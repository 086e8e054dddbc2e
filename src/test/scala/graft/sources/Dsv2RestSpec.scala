package graft.sources

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** DSv2 `graft-rest` reader (SURVEY S13/S1): partition-per-page planning,
  * early exit at the first missing page, and subscription pushdown enforced
  * by the source (not the Spark plan).
  */
class Dsv2RestSpec extends SparkSpec {

  private def stagePages(): java.io.File = {
    val dir = java.nio.file.Files.createTempDirectory("graft_rest_spec").toFile
    def write(name: String, text: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.File(dir, name), "UTF-8")
      try w.write(text) finally w.close()
    }
    write("page-0.json",
      """{"page":0,"items":[{"id":1,"type":"click","k":5},{"id":2,"type":"view","k":20}],"total":2}""")
    write("page-1.json",
      """{"page":1,"items":[{"id":3,"type":"click","k":30}],"total":1}""")
    write("page-2.json", """{"page":2,"items":[],"total":0}""")
    // page-3 missing → planning must stop; page-4 is poison that must
    // never be fetched (unparseable JSON would throw)
    write("page-4.json", "NOT JSON")
    dir
  }

  private def read(dir: java.io.File) =
    spark.read.format("graft-rest")
      .option("endpoint", s"file://${dir.getAbsolutePath}/page-{page}.json")
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
}
