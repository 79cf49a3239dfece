package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing

/** The pure-JVM WAV codec: exact sample roundtrip across widths/channels
  * (the encoder plants an odd-length junk chunk, so the chunk-skip and
  * word-padding paths are always on the line), rejection of malformed
  * payloads, and the Spark-side audio-meta extraction. */
class WavSpec extends AnyFunSuite {

  private def samples16(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => Hashing.mix64(seed + i).toShort.toInt)

  private def samples8(n: Int, seed: Long): Array[Int] =
    Array.tabulate(n)(i => (Hashing.mix64(seed + i) & 0xFF).toInt - 128)

  test("roundtrip: 8/16-bit, mono/stereo, odd sample counts") {
    for {
      bits <- Seq(8, 16)
      channels <- Seq(1, 2)
      frames <- Seq(1, 13, 64, 333)
    } {
      val n = frames * channels
      val s = if (bits == 8) samples8(n, bits + frames)
              else samples16(n, bits + frames)
      val a = Wav.Audio(8000 + frames, channels, bits, s)
      val bytes = Wav.encode(a)
      assert(Wav.isWav(bytes))
      val d = Wav.decode(bytes)
      assert(d.sampleRate == a.sampleRate && d.channels == channels &&
        d.bitsPerSample == bits)
      assert(d.samples.sameElements(s),
        s"sample mismatch at bits=$bits ch=$channels frames=$frames")
    }
  }

  test("frameSample keeps every stride-th frame, all channels") {
    val s = samples16(13 * 2, 11L) // 13 stereo frames
    val a = Wav.Audio(16000, 2, 16, s)
    val d = Wav.frameSample(a, 4)
    assert(d.sampleRate == 4000 && d.channels == 2)
    assert(d.samples.length == 4 * 2) // frames 0,4,8,12
    for (f <- 0 until 4; c <- 0 until 2)
      assert(d.samples(f * 2 + c) == s(f * 4 * 2 + c))
    val id = Wav.frameSample(a, 1)
    assert(id.samples.sameElements(s))
  }

  test("decode rejects non-WAV, truncated, and non-PCM payloads") {
    intercept[IllegalArgumentException] {
      Wav.decode("definitely not a wav".getBytes)
    }
    val good = Wav.encode(Wav.Audio(8000, 1, 16, samples16(32, 5L)))
    intercept[Exception] { Wav.decode(good.take(good.length - 20)) }
    // flip the fmt audioFormat field (offset 20 = fmt body start) to 2
    val nonPcm = good.clone(); nonPcm(20) = 2
    val e = intercept[IllegalArgumentException] { Wav.decode(nonPcm) }
    assert(e.getMessage.contains("PCM"))
  }

  test("extractAudioMeta decodes WAVs, skips foreign payloads") {
    val spark = graft.spark.SparkTestSession.spark
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rows = (0L until 20L).map { id =>
      val payload =
        if (id % 5 == 4) Array[Byte](1, 2, 3) // not a WAV: must be skipped
        else Wav.encode(Wav.Audio(16000, 2, 16,
          Array.tabulate(24)(i => (i * 100 + id.toInt) - 1200)))
      (id, payload)
    }
    val media = rows.toDF("doc_id", "payload")
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
    val out = Multimodal.extractAudioMeta(spark, media)
      .collect().map(m => m.doc_id -> m).toMap
    assert(out.size == 16)
    out.foreach { case (id, m) =>
      val s = (0 until 24).map(i => (i * 100 + id.toInt) - 1200)
      assert(m.sample_rate == 16000 && m.channels == 2 && m.bits == 16)
      assert(m.n_frames == 12)
      assert(m.peak == s.map(v => math.abs(v)).max)
      assert(m.sum_abs == s.map(v => math.abs(v).toLong).sum)
    }
  }
}
