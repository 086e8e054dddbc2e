package graft.raster

import graft.SparkSpec

/** Plumbing tests for the multimodal binary-column path: schema, partition
  * batching, deterministic stub features.
  */
class MultimodalSpec extends SparkSpec {
  import Multimodal._

  test("binary payloads flow through per-partition feature extraction") {
    import spark.implicits._
    val rows = (1L to 100L).map(i =>
      MediaRow(i, if (i % 2 == 0) "image/png" else "audio/wav",
        Array.fill((i * 37 % 600).toInt)((i % 251).toByte)))
    val ds = spark.createDataset(rows).repartition(7) // exercise batching
    val got = extractFeatures(ds, StubDecoder).collect().map(f => f.media_id -> f).toMap
    assert(got.size === 100)
    rows.foreach { r =>
      val f = got(r.media_id)
      assert(f.n_bytes === r.payload.length)
      assert(f.mime === r.mime)
      assert(f.width === r.payload.length % 512)
      val want = StubDecoder.decode(r.media_id, r.mime, r.payload)
      assert(f === want, s"non-deterministic features for ${r.media_id}")
    }
  }

  test("empty payload is handled (no div-by-zero)") {
    val f = StubDecoder.decode(1, "image/png", Array.empty)
    assert(f.n_bytes === 0 && f.mean_byte === 0.0)
  }
}
