package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing

/** The pure-JVM Y4M codec: exact frame roundtrip for mono and 4:2:0
  * (the encoder plants unknown Xgraft parameters on the stream and frame
  * headers, so the tag-skip grammar is always on the line), rejection of
  * malformed payloads, frame sampling, and the Spark-side video-meta
  * extraction. */
class Y4mSpec extends AnyFunSuite {

  private def frame(n: Int, seed: Long): Array[Byte] =
    Array.tabulate(n)(i => Hashing.mix64(seed + i).toByte)

  test("roundtrip: mono and 4:2:0, varying frame counts") {
    for {
      mono <- Seq(true, false)
      nFrames <- Seq(1, 3, 7)
    } {
      val (w, h) = (6, 4)
      val fb = if (mono) w * h else w * h + 2 * ((w / 2) * (h / 2))
      val frames = Array.tabulate(nFrames)(f => frame(fb, f * 1000L + fb))
      val v = Y4m.Video(w, h, 30000, 1001, mono, frames)
      val bytes = Y4m.encode(v)
      assert(Y4m.isY4m(bytes))
      val d = Y4m.decode(bytes)
      assert(d.width == w && d.height == h && d.mono == mono)
      assert(d.fpsNum == 30000 && d.fpsDen == 1001)
      assert(d.frames.length == nFrames)
      for (f <- 0 until nFrames)
        assert(d.frames(f).sameElements(frames(f)),
          s"frame $f mismatch at mono=$mono n=$nFrames")
    }
  }

  test("frameSample keeps every stride-th frame, stretches the rate") {
    val frames = Array.tabulate(13)(f => frame(24, f * 7L))
    val v = Y4m.Video(6, 4, 24, 1, mono = true, frames)
    val d = Y4m.frameSample(v, 4)
    assert(d.fpsNum == 24 && d.fpsDen == 4)
    assert(d.frames.length == 4) // frames 0,4,8,12
    for (f <- 0 until 4)
      assert(d.frames(f).sameElements(frames(f * 4)))
    val id = Y4m.frameSample(v, 1)
    assert(id.frames.length == 13 && id.fpsDen == 1)
  }

  test("decode rejects non-Y4M, truncated, and unsupported payloads") {
    intercept[IllegalArgumentException] {
      Y4m.decode("definitely not a y4m".getBytes)
    }
    val good = Y4m.encode(Y4m.Video(6, 4, 24, 1, mono = true,
      Array(frame(24, 1L), frame(24, 2L))))
    // truncate inside the last frame's plane data
    intercept[IllegalArgumentException] { Y4m.decode(good.take(good.length - 5)) }
    // unsupported colorspace must be rejected, not mis-sliced
    val cs = new String(good, "ISO-8859-1").replace("Cmono", "C444")
    val e = intercept[IllegalArgumentException] {
      Y4m.decode(cs.getBytes("ISO-8859-1"))
    }
    assert(e.getMessage.contains("colorspace"))
    // high-bit-depth 4:2:0 (2 bytes/sample) must be rejected too — a
    // prefix match on "420" would wave it through and mis-slice frames
    val cs10 = new String(good, "ISO-8859-1").replace("Cmono", "C420p10")
    val e10 = intercept[IllegalArgumentException] {
      Y4m.decode(cs10.getBytes("ISO-8859-1"))
    }
    assert(e10.getMessage.contains("colorspace"), e10.getMessage)
    // 4:2:0 with odd dimensions must be rejected at encode time
    intercept[IllegalArgumentException] {
      Y4m.encode(Y4m.Video(5, 4, 24, 1, mono = false, Array.empty))
    }
  }

  test("extractVideoMeta decodes Y4Ms, skips foreign payloads") {
    val spark = graft.spark.SparkTestSession.spark
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val rows = (0L until 12L).map { id =>
      val payload =
        if (id % 4 == 3) Array[Byte](9, 9, 9) // not a Y4M: must be skipped
        else Y4m.encode(Y4m.Video(4, 2, 24, 1, mono = true,
          Array.tabulate(2)(f =>
            Array.tabulate(8)(i => (id + f * 10 + i).toByte))))
      (id, payload)
    }
    val media = rows.toDF("doc_id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
    val out = Multimodal.extractVideoMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.size == 9)
    out.foreach { case (id, m) =>
      val px = for (f <- 0 until 2; i <- 0 until 8) yield (id + f * 10 + i).toInt
      assert(m.width == 4 && m.height == 2 && m.n_frames == 2)
      assert(m.fps_num == 24 && m.fps_den == 1)
      assert(m.y_sum == px.sum && m.y_peak == px.max)
    }
  }
}
