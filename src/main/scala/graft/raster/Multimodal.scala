package graft.raster

import org.apache.spark.sql.{Dataset, Encoders}

/** Multimodal column plumbing (builder brief): media rides as an opaque
  * `binary` column with typed metadata; decode / feature-extraction runs
  * batched per partition.
  *
  * The actual image/audio codecs are NOT in this environment, so
  * [[StubDecoder]] is a clearly-marked deterministic fake — the Spark-side
  * plumbing (schema, partition batching, feature shape) is real and tested,
  * and a production decoder drops in behind the same trait.
  */
object Multimodal {

  final case class MediaRow(media_id: Long, mime: String, payload: Array[Byte])

  final case class MediaFeatures(media_id: Long, mime: String, n_bytes: Int,
      width: Int, height: Int, mean_byte: Double)

  /** Decoder contract: bytes + mime → features. Implementations must be
    * deterministic and serializable (constructed per partition).
    */
  trait MediaDecoder extends Serializable {
    def decode(mediaId: Long, mime: String, bytes: Array[Byte]): MediaFeatures
  }

  /** STUB — deterministic fake standing in for a real image decoder.
    * "Dimensions" are derived from the byte length and "luma" from the mean
    * byte value, so tests are stable and engine-checkable.
    */
  object StubDecoder extends MediaDecoder {
    def decode(mediaId: Long, mime: String, bytes: Array[Byte]): MediaFeatures = {
      var sum = 0L
      var i = 0
      while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
      MediaFeatures(mediaId, mime, bytes.length,
        width = bytes.length % 512, height = bytes.length / 512 + 1,
        mean_byte = if (bytes.isEmpty) 0.0 else sum.toDouble / bytes.length)
    }
  }

  /** Batched per-partition decode — the `mapInPandas`-equivalent shape in
    * Scala: one decoder instance per partition, streaming rows through it
    * (no per-row construction, no driver collect).
    */
  def extractFeatures(media: Dataset[MediaRow], decoder: MediaDecoder): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { rows =>
      rows.map(r => decoder.decode(r.media_id, r.mime, r.payload))
    }
  }

  final case class ResizedMedia(media_id: Long, mime: String, width: Int,
      height: Int, payload: Array[Byte])

  /** Resizer contract: 1 input row → 1 output row whose payload length is
    * exactly `width * height` — the size contract downstream batch sizing
    * (`spark.sql.files.maxPartitionBytes`, arrow batch rows) plans against.
    */
  trait MediaResizer extends Serializable {
    def resize(row: MediaRow, width: Int, height: Int): ResizedMedia
  }

  /** STUB — nearest-neighbor over the byte stream standing in for a real
    * scaler: output byte i samples input byte ⌊i·len/n⌋, so content is a
    * deterministic function of the input and the size contract is exact.
    */
  object StubResizer extends MediaResizer {
    def resize(r: MediaRow, width: Int, height: Int): ResizedMedia = {
      val n = width * height
      val out = new Array[Byte](n)
      if (r.payload.nonEmpty) {
        var i = 0
        while (i < n) {
          out(i) = r.payload((i.toLong * r.payload.length / n).toInt)
          i += 1
        }
      }
      ResizedMedia(r.media_id, r.mime, width, height, out)
    }
  }

  /** Batched per-partition resize (same mapInPandas-equivalent shape as
    * [[extractFeatures]]).
    */
  def resizeAll(media: Dataset[MediaRow], width: Int, height: Int,
      resizer: MediaResizer): Dataset[ResizedMedia] = {
    implicit val enc = Encoders.product[ResizedMedia]
    media.mapPartitions { rows =>
      rows.map(r => resizer.resize(r, width, height))
    }
  }

  final case class FrameRow(media_id: Long, frame_idx: Int, t_ms: Long,
      payload: Array[Byte])

  /** Frame sampler contract: 1 video row → 0..N frame rows — the flatMap
    * batch shape, where output cardinality differs from input. This is the
    * case a `mapInPandas` pipeline must declare with an exploded return
    * schema, and the reason the sampler returns an Iterator (a partition's
    * frames stream out without materializing the whole expansion).
    */
  trait FrameSampler extends Serializable {
    def sample(row: MediaRow, everyMs: Long): Iterator[FrameRow]
  }

  /** STUB — models the payload as fixed-size frames ([[FrameBytes]] bytes,
    * [[FrameMs]] apart, i.e. 25 fps); emits every k-th frame where
    * k = everyMs/FrameMs. A trailing partial frame is dropped, as a real
    * demuxer drops a truncated final packet.
    */
  object StubFrameSampler extends FrameSampler {
    val FrameBytes = 64
    val FrameMs = 40L
    def sample(r: MediaRow, everyMs: Long): Iterator[FrameRow] = {
      val nFrames = r.payload.length / FrameBytes
      val step = math.max(1L, everyMs / FrameMs).toInt
      Iterator.range(0, nFrames, step).map { fi =>
        FrameRow(r.media_id, fi, fi * FrameMs,
          java.util.Arrays.copyOfRange(r.payload, fi * FrameBytes, (fi + 1) * FrameBytes))
      }
    }
  }

  /** Batched per-partition frame sampling — the 1→N expansion runs inside
    * the partition iterator, so a long video expands lazily instead of
    * buffering all frames in executor memory.
    */
  def sampleFrames(media: Dataset[MediaRow], everyMs: Long,
      sampler: FrameSampler): Dataset[FrameRow] = {
    implicit val enc = Encoders.product[FrameRow]
    media.mapPartitions { rows =>
      rows.flatMap(r => sampler.sample(r, everyMs))
    }
  }
}
