package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Streaming Bloom admission (L64 streaming form): verdicts across uneven
  * micro-batches must equal the sequential reference semantics (bitmap
  * hit = seen, exact first-occurrence within a batch), the accumulated
  * bitmap must be byte-identical to a one-shot batch build over the same
  * arrivals (OR-union is chunking- and order-independent), and the
  * no-false-negative contract must hold end-to-end: nothing admitted
  * earlier may be admitted again later.
  */
class StreamingAdmissionSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private val BitsLog2 = 14
  private val K = 2

  test("streamed admission: verdict semantics, bitmap equality, no re-admission") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // arrivals: every document once, plus replays of the %11==3 slice
    // under new ids LATER in the stream (they must classify 'seen'), plus
    // one within-batch duplicate pair
    val docs = graft.core.Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.functions.TextFunctions.md5Fingerprint(col("text")).as("fp"))
      .as[StreamingAdmission.Arrival].collect().sortBy(_.doc_id)
    val replays = docs.filter(_.doc_id % 11 == 3)
      .map(a => a.copy(doc_id = a.doc_id + 1000000L))
    val dupPair = docs.take(1).map(a => a.copy(doc_id = a.doc_id + 2000000L))
    assert(replays.nonEmpty)

    var bitmap = new Array[Byte](1 << (BitsLog2 - 3))
    val verdicts = scala.collection.mutable.Map[Long, String]()
    val stream = MemoryStream[StreamingAdmission.Arrival]
    val q = stream.toDS().writeStream
      .foreachBatch { (mb: org.apache.spark.sql.Dataset[StreamingAdmission.Arrival],
          _: Long) =>
        val (v, bm) = StreamingAdmission.admitBatch(mb, bitmap, BitsLog2, K)
        v.collect().foreach(r => verdicts.synchronized {
          verdicts(r.getLong(0)) = r.getString(2)
        })
        bitmap = bm
      }
      .start()
    try {
      // batch 1+2: all originals in two uneven chunks; batch 3: the
      // replays plus a same-batch duplicate of an already-seen doc
      val (b1, b2) = docs.splitAt(docs.length / 3)
      Seq(b1.toSeq, b2.toSeq, (replays ++ dupPair).toSeq).foreach { chunk =>
        stream.addData(chunk)
        q.processAllAvailable()
      }
    } finally q.stop()

    // replays arrived after their originals were admitted: every one must
    // classify 'seen' (no false negatives across the batch boundary)
    replays.foreach(a => assert(verdicts(a.doc_id) === "seen",
      s"replay ${a.doc_id} re-admitted — false negative"))
    dupPair.foreach(a => assert(verdicts(a.doc_id) === "seen",
      s"same-fp arrival ${a.doc_id} must hit the already-merged bitmap"))
    // originals: mostly admitted; any 'seen' original is a Bloom false
    // positive or a genuine fixture exact-dup — both must be rare here
    // (2 KiB filter at ~3% load) and NONE may be 'dup_in_batch' unless
    // its fp truly repeats within one chunk
    val admitted = docs.count(a => verdicts(a.doc_id) == "admitted")
    assert(admitted >= docs.length * 9 / 10,
      s"only $admitted/${docs.length} originals admitted")

    // the accumulated bitmap equals a one-shot batch build over the union
    val all = (docs ++ replays ++ dupPair).toSeq.toDS()
    val oneShot = all
      .agg(call_function("graft_bloom", col("fp"), lit(BitsLog2), lit(K)))
      .head().getAs[Array[Byte]](0)
    assert(java.util.Arrays.equals(bitmap, oneShot),
      "accumulated bitmap diverged from the one-shot batch build")
  }

  test("dup_in_batch fires only on genuine within-batch fp repeats") {
    import spark.implicits._
    val base = Seq(
      StreamingAdmission.Arrival(1L, 42L),
      StreamingAdmission.Arrival(2L, 42L), // same fp, higher id
      StreamingAdmission.Arrival(3L, 7L)).toDS()
    val (v, bm) = StreamingAdmission.admitBatch(base,
      new Array[Byte](1 << (BitsLog2 - 3)), BitsLog2, K)
    val got = v.collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(got(1L) === "admitted")
    assert(got(2L) === "dup_in_batch")
    assert(got(3L) === "admitted")
    // and the merged bitmap now sees both fps
    assert(graft.plans.BloomFilterAgg.probe(bm, 42L, K))
    assert(graft.plans.BloomFilterAgg.probe(bm, 7L, K))
  }
}
