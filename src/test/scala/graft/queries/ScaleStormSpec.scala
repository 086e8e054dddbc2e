package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Planted-skew rehearsal (VERDICT r10 #2): a boilerplate storm bigger
  * than the hot-bucket cap runs through the REGISTERED q36 pipeline and
  * proves, end-to-end in the executed plan, that
  *
  *  - the guard BINDS: the mega-cluster's quadratic pair join never
  *    happens (no storm pair reaches the output);
  *  - the guard is REPORTED: the `lsh_hot_buckets` observation carries
  *    nonzero `dropped_buckets` / `dropped_rows` out of the same run —
  *    the at-scale signal that distinguishes "guard fired" from a bare
  *    hash mismatch;
  *  - normal documents are untouched: a genuine near-dup pair in a cold
  *    bucket still comes out.
  *
  * (SkewBucketSpec proves the guard kernel on synthetic band frames;
  * this spec proves the wiring of the production query at a
  * cap-crossing size — 10 001 identical documents vs HotBucketCap
  * 10 000.)
  */
class ScaleStormSpec extends SparkSpec {

  import spark.implicits._

  test("q36 survives a >cap boilerplate storm: pairs capped, drops observable") {
    val dir = Files.createTempDirectory("storm-corpus").toString
    val stormText = "one two three four five six seven eight nine ten eleven twelve"
    val pairText = (0 until 50).map(i => s"p$i").mkString(" ")
    val docs =
      // the storm: 10 001 byte-identical documents — every band bucket
      // they hash to crosses the 10 000 cap
      (0 until 10001).map(i => (100000L + i, stormText, "en", "storm", 0L)) ++
      // normal corpus
      (1L to 50L).map(i => (i, (0 until 15).map(w => s"w${i}x$w").mkString(" "),
        "en", "base", 0L)) ++
      // one genuine near-dup pair in a cold bucket (identical content →
      // identical signatures → certain band collision, bucket size 2)
      Seq((201L, pairText, "en", "base", 0L), (202L, pairText, "en", "base", 0L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(8)
      .write.parquet(s"$dir/documents.parquet")

    // CollectMetrics accumulators are reset after the execution-end event
    // in Spark 4.1, so a post-hoc `qe.observedMetrics` read returns zeros:
    // the metric must be captured AT completion time, the way Verify's
    // QueryExecutionListener does (`[verify][observed]` lines)
    val captured = new java.util.concurrent.ConcurrentHashMap[
      String, org.apache.spark.sql.Row]()
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        qe.observedMetrics.foreach { case (k, v) => captured.put(k, v) }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val df = graft.SparkEntry.queries("q36_lsh_neardup_pairs")(spark, dir)
    try {
      graft.core.CacheScope.scoped {
        df.write.format("noop").mode("overwrite").save()
      }
      // the listener bus is async — wait for the completion event
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (!captured.containsKey("lsh_hot_buckets") && System.nanoTime() < deadline)
        Thread.sleep(50)
    } finally spark.listenerManager.unregister(listener)

    assert(captured.containsKey("lsh_hot_buckets"),
      s"expected the lsh_hot_buckets observation, got ${captured.keySet()}")
    val m = captured.get("lsh_hot_buckets")
    val droppedBuckets = m.getAs[Long]("dropped_buckets")
    val droppedRows = m.getAs[Long]("dropped_rows")
    assert(droppedBuckets > 0, "storm must trip the hot-bucket guard")
    assert(droppedRows >= 10001L,
      s"dropped_rows must cover the storm cluster, got $droppedRows")
    info(s"guard fired: dropped_buckets=$droppedBuckets dropped_rows=$droppedRows")

    // the guard binds: no storm pair in the output, the cold pair survives
    val pairs = graft.core.CacheScope.scoped {
      df.select(col("doc_a"), col("doc_b")).as[(Long, Long)].collect().toSet
    }
    assert(!pairs.exists { case (a, b) => a >= 100000L && b >= 100000L },
      "a storm pair leaked past the guard")
    assert(pairs.contains((201L, 202L)),
      "the genuine cold-bucket near-dup pair must survive the guard")
  }
}
