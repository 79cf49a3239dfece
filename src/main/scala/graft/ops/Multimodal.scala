package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal plumbing: image/audio/video payloads ride as opaque `binary`
 * columns with typed metadata. PNG payloads get a REAL in-JVM decode
 * ([[Png]]: inflate + per-scanline unfiltering) via [[extractImageMeta]];
 * other codecs (JPEG/audio/video need libraries this container doesn't
 * ship) fall back to the clearly-marked stub feature below. The
 * Spark-side plumbing — schema, batched per-partition processing shape,
 * partition sizing — is shared by both paths.
 *
 * At scale: binary payloads dominate bytes, so the pipeline repartitions
 * by byte budget (`targetPartitionBytes`), processes per-partition in
 * batches (the Scala analog of `mapInPandas` batch shape), and keeps
 * metadata-only projections free of payload IO via column pruning.
 */
object Multimodal {

  final case class MediaMeta(doc_id: Long, media_type: String, n_bytes: Long,
      width: Int, height: Int)

  final case class MediaFeature(doc_id: Long, n_bytes: Long, feature: Array[Float])

  /** Decoded-image row: dimensions straight from IHDR, pixel_sum over the
    * unfiltered bytes — a value only a correct full decode can produce. */
  final case class ImageMeta(doc_id: Long, width: Int, height: Int,
      channels: Int, pixel_sum: Long)

  /** Wrap a text table as a binary-payload media table (payload = UTF-8
    * bytes; the container has no real media fixtures). */
  def asMediaTable(df: DataFrame, idCol: String, payloadCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("doc_id"),
      encode(col(payloadCol), "UTF-8").as("payload"),
      lit("application/octet-stream").as("media_type"),
      octet_length(col(payloadCol)).cast("long").as("n_bytes"))

  /**
   * STUB decode: a real deployment would decode image/audio frames here
   * (e.g. via a JNI codec or `mapInPandas` on PySpark). This deterministic
   * fake derives an 8-dim "feature" from payload byte statistics so the
   * batched plumbing is exercisable end-to-end.
   */
  private def stubDecodeFeature(payload: Array[Byte]): Array[Float] = {
    // ??? <- real codec goes here; deterministic fake below
    val f = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      f(i % 8) += (payload(i) & 0xFF) / 255.0f
      i += 1
    }
    if (payload.length > 0) { var j = 0; while (j < 8) { f(j) /= payload.length; j += 1 } }
    f
  }

  /** Batched per-partition feature extraction (mapInPandas batch shape:
    * iterator of rows in, iterator of typed results out). */
  def extractFeatures(spark: SparkSession, media: DataFrame,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[MediaFeature] = {
    import spark.implicits._
    // sum over zero rows is SQL null — an empty media table yields an
    // empty result, not an unboxing NPE
    val totalBytes = media.agg(coalesce(sum(col("n_bytes")), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("doc_id"), col("payload"), col("n_bytes"))
      .repartition(math.min(parts, 2048))
      .as[(Long, Array[Byte], Long)]
      .mapPartitions { iter =>
        iter.map { case (id, payload, nb) =>
          MediaFeature(id, nb, stubDecodeFeature(payload))
        }
      }
  }

  /** REAL image decode over PNG payloads (same byte-budget partitioning as
    * [[extractFeatures]]): each partition decodes its payloads in-JVM —
    * inflate + unfilter, [[Png.decode]] — and emits per-image dimensions
    * plus the pixel sum. Non-PNG payloads are skipped (width = -1 rows
    * would poison oracles; callers filter by media_type upstream). */
  def extractImageMeta(spark: SparkSession, media: DataFrame,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[ImageMeta] = {
    import spark.implicits._
    val totalBytes = media.agg(coalesce(sum(col("n_bytes")), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("doc_id"), col("payload"))
      .repartition(math.min(parts, 2048))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          if (!Png.isPng(payload)) None
          else {
            val img = Png.decode(payload)
            var sum = 0L
            var i = 0
            while (i < img.pixels.length) { sum += img.pixels(i) & 0xFF; i += 1 }
            Some(ImageMeta(id, img.width, img.height, img.channels, sum))
          }
        }
      }
  }

  /** Decoded-audio row: format fields straight from `fmt `, `peak` and
    * `sum_abs` over the decoded signed samples — integer stats only a
    * correct chunk-walk + little-endian PCM decode can produce (and
    * hash-stable for oracles, unlike a float RMS). */
  final case class AudioMeta(doc_id: Long, sample_rate: Int, channels: Int,
      bits: Int, n_frames: Long, peak: Long, sum_abs: Long)

  /** REAL audio decode over WAV payloads (same byte-budget partitioning
    * as [[extractFeatures]]): each partition walks the RIFF chunk list
    * and decodes PCM in-JVM ([[Wav.decode]]). Non-WAV payloads are
    * skipped, mirroring [[extractImageMeta]]. */
  def extractAudioMeta(spark: SparkSession, media: DataFrame,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[AudioMeta] = {
    import spark.implicits._
    val totalBytes = media.agg(coalesce(sum(col("n_bytes")), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("doc_id"), col("payload"))
      .repartition(math.min(parts, 2048))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          if (!Wav.isWav(payload)) None
          else {
            val a = Wav.decode(payload)
            var peak = 0L; var sumAbs = 0L
            var i = 0
            while (i < a.samples.length) {
              val v = math.abs(a.samples(i).toLong)
              if (v > peak) peak = v
              sumAbs += v
              i += 1
            }
            Some(AudioMeta(id, a.sampleRate, a.channels, a.bitsPerSample,
              a.samples.length.toLong / a.channels, peak, sumAbs))
          }
        }
      }
  }

  /** Decode + nearest-neighbor RESIZE over PNG payloads, emitting the
    * resized image's meta ([[Png.resizeNearest]] — exact-integer index
    * mapping, so oracles replay it). Same partitioning/skip discipline
    * as [[extractImageMeta]]. */
  def resizeImages(spark: SparkSession, media: DataFrame, w2: Int, h2: Int,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[ImageMeta] = {
    import spark.implicits._
    val totalBytes = media.agg(coalesce(sum(col("n_bytes")), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("doc_id"), col("payload"))
      .repartition(math.min(parts, 2048))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          if (!Png.isPng(payload)) None
          else {
            val img = Png.resizeNearest(Png.decode(payload), w2, h2)
            var s = 0L
            var i = 0
            while (i < img.pixels.length) { s += img.pixels(i) & 0xFF; i += 1 }
            Some(ImageMeta(id, img.width, img.height, img.channels, s))
          }
        }
      }
  }

  /** Decode + FRAME-SAMPLE over WAV payloads, emitting the decimated
    * clip's meta ([[Wav.frameSample]] — every stride-th frame). Same
    * partitioning/skip discipline as [[extractAudioMeta]]. */
  def frameSampleAudio(spark: SparkSession, media: DataFrame, stride: Int,
      targetPartitionBytes: Long = 128L * 1024 * 1024): Dataset[AudioMeta] = {
    import spark.implicits._
    val totalBytes = media.agg(coalesce(sum(col("n_bytes")), lit(0L)))
      .first().getLong(0)
    val parts = math.max(1, (totalBytes / targetPartitionBytes).toInt)
    media.select(col("doc_id"), col("payload"))
      .repartition(math.min(parts, 2048))
      .as[(Long, Array[Byte])]
      .mapPartitions { iter =>
        iter.flatMap { case (id, payload) =>
          if (!Wav.isWav(payload)) None
          else {
            val a = Wav.frameSample(Wav.decode(payload), stride)
            var peak = 0L; var sumAbs = 0L
            var i = 0
            while (i < a.samples.length) {
              val v = math.abs(a.samples(i).toLong)
              if (v > peak) peak = v
              sumAbs += v
              i += 1
            }
            Some(AudioMeta(id, a.sampleRate, a.channels, a.bitsPerSample,
              a.samples.length.toLong / a.channels, peak, sumAbs))
          }
        }
      }
  }
}
