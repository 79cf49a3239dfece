package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing

/** The pure-JVM PNG codec: exact pixel roundtrip across color types and
  * sizes (the encoder cycles all five scanline filters, so every unfilter
  * path is on the line), plus rejection of non-PNG payloads. */
class PngSpec extends AnyFunSuite {

  private def pix(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i => Hashing.mix64(seed + i).toByte)

  test("roundtrip: gray / gray+alpha / RGB / RGBA, odd sizes, all filters") {
    for {
      channels <- Seq(1, 2, 3, 4)
      (w, h) <- Seq((1, 1), (16, 8), (7, 13), (33, 5), (64, 64))
    } {
      val px = pix(w * h * channels, 31L * channels + w * 1000 + h)
      val bytes = Png.encode(w, h, channels, px)
      assert(Png.isPng(bytes))
      val img = Png.decode(bytes)
      assert(img.width == w && img.height == h && img.channels == channels)
      assert(img.pixels.sameElements(px),
        s"pixel mismatch at channels=$channels ${w}x$h")
    }
  }

  test("resizeNearest: floor index mapping, identity at same size") {
    val px = pix(16 * 8 * 3, 99L)
    val img = Png.Image(16, 8, 3, px)
    val same = Png.resizeNearest(img, 16, 8)
    assert(same.pixels.sameElements(px))
    val r = Png.resizeNearest(img, 4, 4)
    assert(r.width == 4 && r.height == 4 && r.channels == 3)
    for (y <- 0 until 4; x <- 0 until 4; k <- 0 until 3)
      assert(r.pixels((y * 4 + x) * 3 + k) ==
        px(((y * 8 / 4) * 16 + x * 16 / 4) * 3 + k))
    // non-divisible target: 7x13 -> 3x5 uses floor(src*dst ratios)
    val odd = Png.Image(7, 13, 1, pix(7 * 13, 5L))
    val r2 = Png.resizeNearest(odd, 3, 5)
    for (y <- 0 until 5; x <- 0 until 3)
      assert(r2.pixels(y * 3 + x) == odd.pixels((y * 13 / 5) * 7 + x * 7 / 3))
  }

  test("decode rejects non-PNG and truncated payloads") {
    intercept[IllegalArgumentException] {
      Png.decode("definitely not a png".getBytes)
    }
    val good = Png.encode(8, 8, 1, pix(64, 7L))
    intercept[Exception] { Png.decode(good.take(good.length - 20)) }
  }

  test("extractImageMeta decodes PNGs, skips foreign and corrupt payloads") {
    val spark = graft.spark.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0L until 20L).map { id =>
      val payload =
        if (id % 5 == 4) Array[Byte](1, 2, 3) // not a PNG: must be skipped
        else if (id == 7L)
          // CORRUPT: valid 8-byte signature, truncated IDAT (the classic
          // partial-download artifact) — must be quarantined, not abort
          // the whole job
          Png.encode(4, 3, 1, Array.tabulate(12)(_.toByte)).take(30)
        else Png.encode(4, 3, 1,
          Array.tabulate(12)(i => ((i + id) % 256).toByte))
      (id, payload)
    }
    val media = rows.toDF("doc_id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
    val out = Multimodal.extractImageMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.size == 15 && !out.contains(7L))
    out.foreach { case (id, m) =>
      assert(m.width == 4 && m.height == 3 && m.channels == 1)
      assert(m.pixel_sum == (0 until 12).map(i => (i + id) % 256).sum)
    }
    // targetPartitionBytes <= 0 skips the sizing pass, same rows out
    val out0 = Multimodal.extractImageMeta(spark, media,
      targetPartitionBytes = 0L).collect()
    assert(out0.map(_.doc_id).sorted.sameElements(out.keys.toArray.sorted))
  }
}
