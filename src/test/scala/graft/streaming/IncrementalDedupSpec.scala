package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream == batch proof for L31: the streaming classification
  * (stream-static joins against the once-built corpus models) must emit
  * the identical (doc_id, verdict, matched_doc) set as the oracle-gated
  * batch q96 over the same corpus and batch — including the planted
  * verbatim replays, in any micro-batch partitioning of the arrivals.
  */
class IncrementalDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed classification equals batch q96 verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchTruth = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q96_incremental_dedup")(spark, sf).collect()
    }.map(r => r.getLong(0) -> (r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap

    val docs = graft.core.Tables.documents(spark, sf)
    val (fpMin, ckMin) = IncrementalDedup.corpusModels(
      docs.filter(col("doc_id") % 10 =!= 0))
    // the q96 batch: %10 docs plus the planted verbatim replays
    val arrivals = (docs.filter(col("doc_id") % 10 === 0)
        .select(col("doc_id"), col("text"))
      unionAll docs.filter(col("doc_id") % 10 =!= 0 && col("doc_id") % 97 === 1)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      .as[IncrementalDedup.BatchDoc].collect().sortBy(_.doc_id)

    val stream = MemoryStream[IncrementalDedup.BatchDoc]
    val q = IncrementalDedup.classify(stream.toDS(), fpMin, ckMin)
      .writeStream.format("memory").queryName("inc_dedup").outputMode("append")
      .start()
    val got = try {
      // uneven micro-batches: classification is stateless, so the
      // partitioning of arrivals must be irrelevant
      arrivals.grouped(arrivals.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      spark.table("inc_dedup").collect()
        .map(r => r.getLong(0) -> (r.getString(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    } finally q.stop()

    assert(got.keySet === batchTruth.keySet,
      "streamed batch must classify exactly the batch operator's doc set")
    val diff = got.filter { case (k, v) => batchTruth(k) != v }
    assert(diff.isEmpty, s"stream/batch verdict divergence: ${diff.take(5)}")
    // and the fixture exercises all three verdicts
    assert(got.values.map(_._1).toSet === Set("exact_dup", "near_dup", "new"),
      "fixture must fire every verdict branch")
  }
}
