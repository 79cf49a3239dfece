package graft.ops

import java.io.ByteArrayOutputStream

/**
 * Minimal pure-JVM WAV (RIFF/PCM) codec — the audio half of the
 * multimodal layer next to [[Png]]. The container ships no audio
 * libraries, but canonical WAV is just a RIFF chunk list around raw PCM,
 * so a real decode needs only the container walk: RIFF/WAVE signature,
 * word-aligned chunk iteration (unknown chunks skipped — metadata chunks
 * like LIST/cue are routine in real files), `fmt ` parse (PCM only), and
 * little-endian sample extraction (8-bit unsigned, 16-bit signed).
 *
 * `encode` synthesizes deterministic fixtures; it deliberately inserts an
 * ODD-LENGTH junk chunk between `fmt ` and `data`, so a decode of its
 * output exercises both the unknown-chunk skip and the RIFF padding rule,
 * not just the happy path.
 *
 * The reference has no media path; this implements the training-pipeline
 * multimodal requirement (SURVEY LLM-ops layer) with a real decoder
 * behind [[Multimodal.extractAudioMeta]]. Format per RIFF/WAVE spec
 * (Microsoft/IBM 1991); samples are held SIGNED regardless of width
 * (8-bit PCM's unsigned bytes are re-centered by -128).
 */
object Wav {

  /** `samples` is channel-interleaved, one Int per sample, signed. */
  final case class Audio(sampleRate: Int, channels: Int, bitsPerSample: Int,
      samples: Array[Int])

  def isWav(b: Array[Byte]): Boolean =
    b != null && b.length >= 12 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8)
  private def le32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xFF) | ((b(o + 1) & 0xFF) << 8) |
      ((b(o + 2) & 0xFF) << 16) | ((b(o + 3) & 0xFF) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  // ---- encode --------------------------------------------------------------

  def encode(a: Audio): Array[Byte] = {
    require(a.bitsPerSample == 8 || a.bitsPerSample == 16,
      s"PCM 8/16-bit only, got ${a.bitsPerSample}")
    require(a.channels >= 1 && a.samples.length % a.channels == 0,
      "sample count must be a whole number of frames")
    val bps = a.bitsPerSample / 8
    val dataLen = a.samples.length * bps
    val junk = Array.tabulate(7)(i => (i * 17).toByte) // odd length on purpose
    val out = new ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xFF); out.write((v >>> 8) & 0xFF) }
    def w32(v: Int): Unit = { w16(v & 0xFFFF); w16((v >>> 16) & 0xFFFF) }
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val riffLen = 4 + (8 + 16) + (8 + junk.length + 1) +
      (8 + dataLen + (dataLen & 1))
    ascii("RIFF"); w32(riffLen); ascii("WAVE")
    ascii("fmt "); w32(16)
    w16(1) // PCM
    w16(a.channels); w32(a.sampleRate)
    w32(a.sampleRate * a.channels * bps) // byte rate
    w16(a.channels * bps) // block align
    w16(a.bitsPerSample)
    ascii("junk"); w32(junk.length); out.write(junk); out.write(0) // pad byte
    ascii("data"); w32(dataLen)
    var i = 0
    while (i < a.samples.length) {
      val s = a.samples(i)
      if (bps == 1) out.write((s + 128) & 0xFF) else w16(s & 0xFFFF)
      i += 1
    }
    if ((dataLen & 1) == 1) out.write(0)
    out.toByteArray
  }

  // ---- decode --------------------------------------------------------------

  def decode(b: Array[Byte]): Audio = {
    require(isWav(b), "not a RIFF/WAVE payload")
    var off = 12
    var channels = 0; var rate = 0; var bits = 0; var haveFmt = false
    while (off + 8 <= b.length) {
      val t = tag(b, off)
      val len = le32(b, off + 4)
      require(len >= 0 && off + 8 + len <= b.length,
        s"truncated WAV: chunk $t claims $len bytes past the payload end")
      val body = off + 8
      t match {
        case "fmt " =>
          require(len >= 16, s"fmt chunk too short ($len)")
          val audioFormat = le16(b, body)
          require(audioFormat == 1,
            s"only PCM (format 1) supported, got $audioFormat")
          channels = le16(b, body + 2)
          rate = le32(b, body + 4)
          bits = le16(b, body + 14)
          require(bits == 8 || bits == 16,
            s"PCM 8/16-bit only, got $bits")
          require(channels >= 1, s"bad channel count $channels")
          haveFmt = true
        case "data" =>
          require(haveFmt, "data chunk before fmt chunk")
          val bps = bits / 8
          val n = len / bps
          val samples = new Array[Int](n)
          var i = 0
          while (i < n) {
            samples(i) =
              if (bps == 1) (b(body + i) & 0xFF) - 128
              else le16(b, body + 2 * i).toShort.toInt
            i += 1
          }
          return Audio(rate, channels, bits, samples)
        case _ => // LIST, cue, junk, ... — skip
      }
      off = body + len + (len & 1) // chunks are word-aligned
    }
    throw new IllegalArgumentException("no data chunk in WAV payload")
  }

  // ---- transforms ----------------------------------------------------------

  /** Keep every `stride`-th FRAME (all channels of it) — the deterministic
    * decimation a training pipeline uses to subsample long clips; exact
    * so oracles can replay it. Sample rate scales down to match. */
  def frameSample(a: Audio, stride: Int): Audio = {
    require(stride >= 1, s"bad stride $stride")
    val frames = a.samples.length / a.channels
    val kept = (frames + stride - 1) / stride
    val out = new Array[Int](kept * a.channels)
    var f = 0
    while (f < kept) {
      var c = 0
      while (c < a.channels) {
        out(f * a.channels + c) = a.samples(f * stride * a.channels + c)
        c += 1
      }
      f += 1
    }
    Audio(a.sampleRate / stride, a.channels, a.bitsPerSample, out)
  }
}
