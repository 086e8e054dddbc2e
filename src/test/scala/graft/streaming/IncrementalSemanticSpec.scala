package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Stream == batch proof for L58: classifying the arriving vectors in
  * uneven micro-batches through `foreachBatch` (frozen codebook + static
  * corpus assignment, zero streaming state) must produce the identical
  * (vec_id, cell, dup_of, verdict) set as the oracle-gated batch q123
  * over the same corpus and arrivals — including the planted replays.
  */
class IncrementalSemanticSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("streamed classification equals batch q123 verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchTruth = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q123_incremental_semantic_dedup")(spark, sf)
        .collect()
    }.map(r => r.getLong(0) -> (r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      .toMap

    val eAll = graft.core.Tables.embeddings(spark, sf)
    val corpus = eAll.filter(col("vec_id") % 89 =!= 0)
      .select(col("vec_id"), col("embedding"),
        graft.functions.Sketches.norm(col("embedding"), 64).as("nrm"))
      .persist()
    val (cb, asnC) = IncrementalSemantic.models(corpus)
    val asnCached = asnC.persist() // the stored corpus artifact stand-in

    // the q123 arrival set: the %89 slice plus the planted replays
    val arrivals = (eAll.filter(col("vec_id") % 89 === 0)
        .select(col("vec_id"), col("embedding"))
      unionAll eAll.filter(col("vec_id") % 89 =!= 0 && col("vec_id") % 83 === 2)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .as[IncrementalSemantic.BatchVec].collect().sortBy(_.vec_id)
    assert(arrivals.nonEmpty)

    val acc = scala.collection.mutable.Map[Long, (Long, Option[Long], String)]()
    val stream = MemoryStream[IncrementalSemantic.BatchVec]
    val q = stream.toDS().writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[IncrementalSemantic.BatchVec],
          _: Long) =>
        IncrementalSemantic.classify(mb, cb, asnCached, corpus)
          .collect().foreach { r =>
            acc.synchronized {
              acc(r.getLong(0)) = (r.getLong(1),
                if (r.isNullAt(2)) None else Some(r.getLong(2)),
                r.getString(3))
            }
          }
      }
      .start()
    try {
      // uneven micro-batches: the kernel is stateless in the batch, so
      // the partitioning of arrivals must be irrelevant
      arrivals.grouped(arrivals.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally {
      q.stop()
      corpus.unpersist()
      asnCached.unpersist()
    }

    assert(acc.keySet === batchTruth.keySet,
      "streamed arrivals must classify exactly the batch operator's set")
    val diff = acc.filter { case (k, v) => batchTruth(k) != v }
    assert(diff.isEmpty, s"stream/batch verdict divergence: ${diff.take(5)}")
    // the fixture fires both verdict branches
    assert(acc.values.map(_._3).toSet === Set("semantic_dup", "new"),
      "fixture must fire both verdicts")
  }

  test("verdicts are invariant to late, out-of-order micro-batch arrival") {
    // The stateless analog of the watermark-boundary case: the frozen
    // models make a vector's verdict depend only on itself and the static
    // corpus, so replays arriving LATE — in a later micro-batch than their
    // originals, in reverse vec_id order, one replay isolated in its own
    // trailing batch — must classify identically to the batch operator.
    // (The reference's F8/T4 stale policy drops expired rows at read; here
    // there is no event-time to expire, so the contract is order-blindness.)
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batchTruth = graft.core.CacheScope.scoped {
      graft.SparkEntry.queries("q123_incremental_semantic_dedup")(spark, sf)
        .collect()
    }.map(r => r.getLong(0) -> (r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getLong(2)), r.getString(3)))
      .toMap

    val eAll = graft.core.Tables.embeddings(spark, sf)
    val corpus = eAll.filter(col("vec_id") % 89 =!= 0)
      .select(col("vec_id"), col("embedding"),
        graft.functions.Sketches.norm(col("embedding"), 64).as("nrm"))
      .persist()
    val (cb, asnC) = IncrementalSemantic.models(corpus)
    val asnCached = asnC.persist()

    val arrivals = (eAll.filter(col("vec_id") % 89 === 0)
        .select(col("vec_id"), col("embedding"))
      unionAll eAll.filter(col("vec_id") % 89 =!= 0 && col("vec_id") % 83 === 2)
        .select((col("vec_id") + 1000000L).as("vec_id"), col("embedding")))
      .as[IncrementalSemantic.BatchVec].collect()
    // newest-first, and one planted replay held back as the final
    // singleton batch — the most adversarial arrival order
    val (replays, originals) = arrivals.partition(_.vec_id >= 1000000L)
    assert(replays.nonEmpty, "fixture must plant replays")
    val heldBack = replays.maxBy(_.vec_id)
    val early = (originals ++ replays.filter(_.vec_id != heldBack.vec_id))
      .sortBy(-_.vec_id)

    val acc = scala.collection.mutable.Map[Long, (Long, Option[Long], String)]()
    val stream = MemoryStream[IncrementalSemantic.BatchVec]
    val q = stream.toDS().writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[IncrementalSemantic.BatchVec],
          _: Long) =>
        IncrementalSemantic.classify(mb, cb, asnCached, corpus)
          .collect().foreach { r =>
            acc.synchronized {
              acc(r.getLong(0)) = (r.getLong(1),
                if (r.isNullAt(2)) None else Some(r.getLong(2)),
                r.getString(3))
            }
          }
      }
      .start()
    try {
      early.grouped(early.length / 2 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
      stream.addData(heldBack)
      q.processAllAvailable()
    } finally {
      q.stop()
      corpus.unpersist()
      asnCached.unpersist()
    }

    assert(acc.keySet === batchTruth.keySet)
    val diff = acc.filter { case (k, v) => batchTruth(k) != v }
    assert(diff.isEmpty,
      s"late/out-of-order arrival changed verdicts: ${diff.take(5)}")
    assert(acc(heldBack.vec_id) == batchTruth(heldBack.vec_id),
      "the held-back replay must classify identically in its singleton batch")
  }
}
