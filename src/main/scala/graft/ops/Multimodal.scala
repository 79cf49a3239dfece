package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Multimodal plumbing: image/audio/video payloads ride as opaque `binary`
 * columns with typed metadata. The decode/feature-extract step is a STUB
 * (no codec libraries ship in this container — clearly marked below); the
 * Spark-side plumbing — schema, batched per-partition processing shape,
 * partition sizing — is real and tested.
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
}
