package graft.sinks

import java.nio.file.Files

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** K8 contract: a corpus store persisted with [[BucketedLayout.write]] is
  * joined and aggregated on its bucket key with ZERO shuffle exchanges and
  * zero sorts in the executed plan, while the identical unbucketed plan
  * pays both — and the results are row-identical. This is the
  * pay-the-exchange-once layout for stores that both sides of a nightly
  * join read at corpus scale (fingerprint stores, shard inventories).
  */
class BucketedLayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val NBuckets = 4

  private def shuffles(p: SparkPlan): Int =
    flattenExecuted(p).count(_.isInstanceOf[ShuffleExchangeExec])
  private def sorts(p: SparkPlan): Int =
    flattenExecuted(p).count(_.isInstanceOf[SortExec])

  private def executed(df: org.apache.spark.sql.DataFrame): SparkPlan = {
    df.write.format("noop").mode("overwrite").save() // materialize AQE stages
    df.queryExecution.executedPlan
  }

  test("bucketed-bucketed join and groupBy run with zero shuffles and zero sorts") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("source"), col("n_chars"))
    // two "stores" sharing the join key: the doc inventory and a
    // fingerprint-store stand-in keyed by the same doc_id
    val fps = docs.select(col("doc_id"),
      graft.functions.Sketches.h64(col("source")).as("fp"))
    val base = Files.createTempDirectory("bucketed").toString
    BucketedLayout.write(docs, "bl_docs", "doc_id", NBuckets, s"$base/docs")
    BucketedLayout.write(fps, "bl_fps", "doc_id", NBuckets, s"$base/fps")
    try {
      // force the non-broadcast path: this test is about the LARGE-LARGE
      // join where broadcasting is not an option
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val a = BucketedLayout.table(spark, "bl_docs")
      val b = BucketedLayout.table(spark, "bl_fps")

      val joined = a.join(b, Seq("doc_id"))
      val jp = executed(joined)
      assert(shuffles(jp) === 0,
        s"bucketed join must not shuffle either side:\n$jp")

      val agg = a.groupBy(col("doc_id")).agg(sum(col("n_chars")).as("c"))
      val ap = executed(agg)
      assert(shuffles(ap) === 0,
        s"groupBy on the bucket key must aggregate in place:\n$ap")

      // With the sorted-bucket-scan dial on, the scan also advertises the
      // sortBy order (safe because the writer guarantees one file per
      // bucket) and the SMJ drops its per-bucket SortExecs too. Spark
      // leaves this off by default only because verifying the one-file
      // precondition costs a listing at planning time.
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val jps = executed(
        spark.table("bl_docs").join(spark.table("bl_fps"), Seq("doc_id")))
      assert(shuffles(jps) === 0)
      assert(sorts(jps) === 0,
        s"sorted-bucket scan must satisfy the SMJ ordering:\n$jps")

      // the same plans WITHOUT the layout pay the exchanges the store
      // layout eliminated — this is what the write-time exchange bought
      val ju = executed(docs.join(fps, Seq("doc_id")))
      assert(shuffles(ju) >= 1, "unbucketed large-large join must shuffle")

      // row-identical to the unbucketed join
      val got = joined.select(col("doc_id"), col("source"), col("fp"))
        .orderBy(col("doc_id")).collect().toSeq
      val want = docs.join(fps, Seq("doc_id"))
        .select(col("doc_id"), col("source"), col("fp"))
        .orderBy(col("doc_id")).collect().toSeq
      assert(got === want)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      spark.sql("DROP TABLE IF EXISTS bl_docs")
      spark.sql("DROP TABLE IF EXISTS bl_fps")
    }
  }

  test("bucket layout is one file per bucket (the sorted-scan precondition)") {
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("n_chars"))
    val base = Files.createTempDirectory("bucketed1f").toString
    BucketedLayout.write(docs, "bl_one", "doc_id", NBuckets, s"$base/one")
    try {
      val files = new java.io.File(s"$base/one").listFiles()
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
      assert(files.length === NBuckets,
        s"expected exactly $NBuckets bucket files, got ${files.length}")
      // and nothing was lost on the way through the bucketed write
      assert(BucketedLayout.table(spark, "bl_one").count() === docs.count())
    } finally spark.sql("DROP TABLE IF EXISTS bl_one")
  }
}
