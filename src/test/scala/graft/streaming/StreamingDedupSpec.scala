package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** Streaming exact dedup (L1 x T-ops): the admitted set must equal the
  * batch q33 min-id survivors over the same corpus and fingerprint
  * expression when documents arrive in id order (in any batch
  * partitioning), duplicate counts must accumulate across batches, and
  * event-time TTL must tombstone idle fingerprints so a later re-arrival
  * is re-admitted.
  */
class StreamingDedupSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def corpus(): Array[StreamingDedup.Doc] = {
    import spark.implicits._
    graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"), col("doc_id").as("tsu"),
        TextFunctions.md5Fingerprint(col("text")).as("fp"))
      .as[StreamingDedup.Doc].collect().sortBy(_.doc_id)
  }

  test("streamed dedup admits exactly the batch min-id survivors") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // the fixture corpus plus injected exact duplicates (copies of the
    // first 25 docs, later ids/timestamps) — the fixture alone may be
    // duplicate-free, which would make this equivalence vacuous
    val base = corpus()
    val dups = base.take(25).map(d =>
      d.copy(doc_id = d.doc_id + 10000, tsu = d.tsu + 10000))
    val docs = (base ++ dups).sortBy(_.doc_id)

    val stream = MemoryStream[StreamingDedup.Doc]
    val q = StreamingDedup.dedupStream(stream.toDS(), ttlMicros = None, "3650 days")
      .writeStream.format("memory").queryName("stream_dedup").outputMode("append")
      .start()
    try {
      // id-ordered arrival split into 3 uneven batches: admission order is
      // the batch survivor rule (min doc_id per fingerprint)
      docs.grouped(docs.length / 3 + 1).foreach { chunk =>
        stream.addData(chunk.toSeq)
        q.processAllAvailable()
      }
    } finally q.stop()

    val decisions = spark.table("stream_dedup").as[StreamingDedup.Decision].collect()
    assert(decisions.length === docs.length, "one decision per input document")

    // ground truth from the batch rule: min doc_id per fingerprint
    val survivorOf = docs.groupBy(_.fp).map { case (fp, ds) =>
      fp -> ds.map(_.doc_id).min
    }
    val admitted = decisions.filter(_.admitted).map(_.doc_id).toSet
    assert(admitted === survivorOf.values.toSet,
      "streaming admitted set must equal the min-id survivor per fingerprint")
    assert(dups.forall(d => !admitted.contains(d.doc_id)),
      "every injected duplicate must be suppressed")
    decisions.filterNot(_.admitted).foreach { d =>
      assert(d.survivor === survivorOf(d.fp),
        s"doc ${d.doc_id} suppressed by ${d.survivor}, rule says ${survivorOf(d.fp)}")
    }

    // cross-check the batch operator itself: q33's canonical set over the
    // raw corpus = the admitted ids that came from the corpus
    val canonical = graft.SparkEntry.queries("q33_exact_dedup")(spark, sf).collect()
      .filter(_.getBoolean(3)).map(_.getLong(0)).toSet
    assert(admitted.filter(_ < 10000) === canonical,
      "corpus-side admissions must equal q33's is_canonical rows")
  }

  test("duplicate counts accumulate across batches; TTL tombstones and re-admits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val hour = 3600000000L
    val t0 = 1000000000000000L
    val stream = MemoryStream[StreamingDedup.Doc]
    val q = StreamingDedup.dedupStream(stream.toDS(),
        ttlMicros = Some(6 * hour), "0 seconds")
      .writeStream.format("memory").queryName("ttl_dedup").outputMode("append")
      .start()
    try {
      stream.addData(StreamingDedup.Doc(1, t0, 42L), StreamingDedup.Doc(2, t0 + 1, 42L))
      q.processAllAvailable()
      stream.addData(StreamingDedup.Doc(3, t0 + 2, 42L)) // third copy, same batch key
      q.processAllAvailable()
      // watermark far past fp 42's TTL; next batch fires the timeout
      stream.addData(StreamingDedup.Doc(4, t0 + 8 * hour, 7L))
      q.processAllAvailable()
      stream.addData(StreamingDedup.Doc(5, t0 + 9 * hour, 42L)) // re-arrival after expiry
      q.processAllAvailable()
    } finally q.stop()

    val out = spark.table("ttl_dedup").as[StreamingDedup.Decision].collect()
    val fp42 = out.filter(d => d.fp == 42L && !d.expired).sortBy(_.doc_id)
    assert(fp42.map(d => (d.doc_id, d.admitted, d.survivor, d.n_dups)).toSeq ===
      Seq((1L, true, 1L, 0L), (2L, false, 1L, 1L), (3L, false, 1L, 2L),
        (5L, true, 5L, 0L)),
      "admission, accumulation, and post-expiry re-admission")
    val tombs = out.filter(_.expired)
    assert(tombs.map(t => (t.fp, t.survivor, t.n_dups)).toSeq === Seq((42L, 1L, 2L)),
      "TTL must tombstone the idle fingerprint with its final dup count")
  }

  test("TTL timeout clamps above the watermark when TTL < watermark delay") {
    // a late doc with lastTsu + ttl <= watermark would otherwise hand the
    // state API a timeout at/before the watermark — query-killing IAE
    val watermarkMs = 50_000_000L
    val lateTsu = (watermarkMs - 120_000L) * 1000L // 2 min before the watermark
    val ttlUs = 10_000_000L                        // 10 s TTL << 2 min lateness
    val state = org.apache.spark.sql.streaming.TestGroupState.create[StreamingDedup.SeenState](
      org.apache.spark.api.java.Optional.empty(),
      org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout,
      0L, org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(watermarkMs)),
      hasTimedOut = false)
    StreamingDedup.dedupFunc(Some(ttlUs))(
      42L, Iterator(StreamingDedup.Doc(1L, lateTsu, 42L)), state).toList
    assert(state.getTimeoutTimestampMs.isPresent)
    assert(state.getTimeoutTimestampMs.get() === watermarkMs + 1,
      "computed timeout at/before the watermark must clamp to watermark + 1")
  }
}
