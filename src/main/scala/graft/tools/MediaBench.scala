package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decode-throughput probe for the in-JVM codecs behind
  * [[graft.ops.Multimodal]]: synthesizes `n` payloads per format at
  * realistic small-web-asset sizes, runs the signature-dispatched decode
  * verb over the whole mixed column, and prints per-format MB/s — the
  * number behind DESIGN.md's "decode at corpus scale" claim. Decode is
  * embarrassingly parallel (per-row flatMap), so cluster throughput is
  * per-core MB/s x cores; what this measures is the per-core constant.
  *
  * Usage: runMain graft.tools.MediaBench [nPerFormat]
  */
object MediaBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toInt else 20000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // 64x48 images: gray PNG (AC-rich formula), gray JPEG, gray GIF
    val mkPng = udf((id: Long) => graft.ops.Png.encode(64, 48, 1,
      Array.tabulate(64 * 48)(i => ((i * 31 + id * 7) % 256).toByte)))
    val mkJpeg = udf((id: Long) => graft.ops.Jpeg.encode(64, 48, 1,
      Array.tabulate(64 * 48)(i => ((i * 31 + id * 7) % 256).toByte)))
    val mkGif = udf((id: Long) => graft.ops.Gif.encode(64, 48,
      Array.tabulate(64 * 48)(i => ((i * 31 + id * 7) % 256).toByte)))

    def bench(tag: String, mk: org.apache.spark.sql.Column): Unit = {
      val media = spark.range(n.toLong).select(col("id").as("doc_id"),
          mk.as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
        .persist()
      val bytes = media.agg(sum("n_bytes")).first().getLong(0)
      graft.ops.Multimodal.extractImageMeta(spark, media, -1)
        .toDF().agg(sum("pixel_sum")).first() // warm (JIT + codegen)
      val t0 = System.nanoTime()
      val s = graft.ops.Multimodal.extractImageMeta(spark, media, -1)
        .toDF().agg(sum("pixel_sum"), count(lit(1))).first()
      val dt = (System.nanoTime() - t0) / 1e9
      require(s.getLong(1) == n, s"$tag decoded ${s.getLong(1)} of $n")
      println(f"MEDIABENCH $tag n=$n payload_mb=${bytes / 1e6}%.1f " +
        f"wall=$dt%.2f s -> ${bytes / 1e6 / dt}%.1f MB/s " +
        f"(${n / dt}%.0f imgs/s) at local[32]")
      media.unpersist()
      ()
    }
    bench("png", mkPng(col("id")))
    bench("jpeg", mkJpeg(col("id")))
    bench("gif", mkGif(col("id")))
    spark.stop()
  }
}
