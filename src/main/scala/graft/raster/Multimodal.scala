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
}
