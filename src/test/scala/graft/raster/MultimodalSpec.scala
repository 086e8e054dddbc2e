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

  test("resize holds the width*height size contract across partitions") {
    import spark.implicits._
    val rows = (1L to 60L).map(i =>
      MediaRow(i, "image/png", Array.tabulate((i * 53 % 900).toInt)(j => (j % 251).toByte)))
    val got = resizeAll(spark.createDataset(rows).repartition(5), 16, 9, StubResizer)
      .collect().map(r => r.media_id -> r).toMap
    assert(got.size === 60)
    rows.foreach { r =>
      val out = got(r.media_id)
      assert(out.payload.length === 16 * 9, s"size contract broken for ${r.media_id}")
      assert(out.width === 16 && out.height === 9 && out.mime === r.mime)
      val want = StubResizer.resize(r, 16, 9)
      assert(out.payload.sameElements(want.payload),
        s"non-deterministic resize for ${r.media_id}")
    }
    // empty input → zero-filled output of the contracted size
    val empty = StubResizer.resize(MediaRow(0, "image/png", Array.empty), 16, 9)
    assert(empty.payload.length === 144 && empty.payload.forall(_ == 0))
  }

  test("frame sampling is the 1->N flatMap shape with exact cardinality") {
    import spark.implicits._
    import StubFrameSampler.{FrameBytes, FrameMs}
    // payload sizes chosen to cover 0 frames (short), exact multiples and
    // a trailing partial frame
    val sizes = Seq(0, 10, FrameBytes, FrameBytes * 7, FrameBytes * 7 + 13, FrameBytes * 25)
    val rows = sizes.zipWithIndex.map { case (n, i) =>
      MediaRow(i.toLong, "video/mp4", Array.tabulate(n)(j => ((j + i) % 251).toByte))
    }
    val everyMs = 80L // step 2: every other frame
    val got = sampleFrames(spark.createDataset(rows).repartition(3), everyMs, StubFrameSampler)
      .collect().groupBy(_.media_id)
    rows.foreach { r =>
      val nFrames = r.payload.length / FrameBytes
      val expected = (0 until nFrames by 2).toSeq
      val frames = got.getOrElse(r.media_id, Array.empty).sortBy(_.frame_idx)
      assert(frames.map(_.frame_idx).toSeq === expected,
        s"frame indices wrong for ${r.media_id}")
      frames.foreach { f =>
        assert(f.t_ms === f.frame_idx * FrameMs)
        assert(f.payload.length === FrameBytes)
        val want = r.payload.slice(f.frame_idx * FrameBytes, (f.frame_idx + 1) * FrameBytes)
        assert(f.payload.sameElements(want), s"frame content wrong at ${f.frame_idx}")
      }
    }
    // total output cardinality differs from input — the flatMap contract
    assert(got.values.map(_.length).sum === rows.map(_.payload.length / FrameBytes)
      .map(n => (n + 1) / 2).sum)
  }
}
