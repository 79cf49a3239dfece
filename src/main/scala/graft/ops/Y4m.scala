package graft.ops

import java.io.ByteArrayOutputStream

/**
 * Minimal pure-JVM Y4M (YUV4MPEG2) codec — the video corner of the
 * multimodal layer next to [[Png]] (image) and [[Wav]] (audio). The
 * container ships no video libraries, but Y4M (the mjpegtools raw-video
 * interchange format every ffmpeg pipeline can emit) is just an ASCII
 * stream header followed by `FRAME`-delimited raw planar YUV, so a real
 * decode needs only the header grammar: magic + space-separated tagged
 * parameters (`W<w> H<h> F<num>:<den> I<...> A<...> C<colorspace>`,
 * order-free, unknown tags skipped), then per frame a `FRAME` line whose
 * own optional parameters must also be skipped, then the raw planes
 * (`Cmono`: Y only; `C420*`: Y + quarter-size U and V).
 *
 * `encode` synthesizes deterministic fixtures; it deliberately writes an
 * unknown `Xgraft` parameter on the stream header AND on every frame
 * header, so a decode of its output always exercises the tag-skip
 * grammar, not just the happy path.
 *
 * The reference has no media path; this implements the training-pipeline
 * multimodal requirement (SURVEY LLM-ops layer) with a real decoder
 * behind [[Multimodal.extractVideoMeta]]. Format per the YUV4MPEG2
 * specification shipped with mjpegtools (`yuv4mpeg(5)`).
 */
object Y4m {

  /** `frames`: one raw plane blob per frame — `width*height` luma bytes,
    * then (unless `mono`) two `(width/2)*(height/2)` chroma planes. */
  final case class Video(width: Int, height: Int, fpsNum: Int, fpsDen: Int,
      mono: Boolean, frames: Array[Array[Byte]]) {
    def frameBytes: Int =
      if (mono) width * height
      else width * height + 2 * ((width / 2) * (height / 2))
  }

  private val Magic = "YUV4MPEG2 ".getBytes("US-ASCII")

  def isY4m(b: Array[Byte]): Boolean =
    b != null && b.length >= Magic.length &&
      java.util.Arrays.equals(b, 0, Magic.length, Magic, 0, Magic.length)

  // ---- encode --------------------------------------------------------------

  def encode(v: Video): Array[Byte] = {
    require(v.width > 0 && v.height > 0, s"bad size ${v.width}x${v.height}")
    require(v.mono || (v.width % 2 == 0 && v.height % 2 == 0),
      s"4:2:0 needs even dimensions, got ${v.width}x${v.height}")
    require(v.fpsNum > 0 && v.fpsDen > 0, "bad frame rate")
    val fb = v.frameBytes
    v.frames.foreach(f => require(f.length == fb,
      s"frame has ${f.length} bytes, expected $fb"))
    val out = new ByteArrayOutputStream()
    def ascii(s: String): Unit = out.write(s.getBytes("US-ASCII"))
    val cs = if (v.mono) "mono" else "420mpeg2"
    // Ip / A1:1 / Xgraft: parameters a correct decoder must tolerate
    ascii(s"YUV4MPEG2 W${v.width} H${v.height} F${v.fpsNum}:${v.fpsDen}" +
      s" Ip A1:1 C$cs Xgraft\n")
    v.frames.foreach { f =>
      ascii("FRAME Xgraft\n")
      out.write(f)
    }
    out.toByteArray
  }

  // ---- decode --------------------------------------------------------------

  /** Index one past the next `\n` at/after `from`; fails on truncation. */
  private def lineEnd(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i < b.length && b(i) != '\n') i += 1
    require(i < b.length, "truncated Y4M: unterminated header line")
    i + 1
  }

  /** The 8-bit 4:2:0 colorspace names (yuv4mpeg.h's C420 family minus the
    * p10/p12/p16 high-bit-depth variants this byte-per-sample slicer
    * cannot represent). */
  private val Cs420_8bit = Set("420", "420jpeg", "420mpeg2", "420paldv")

  def decode(b: Array[Byte]): Video = {
    require(isY4m(b), "not a YUV4MPEG2 payload")
    val hdrEnd = lineEnd(b, Magic.length)
    val params = new String(b, Magic.length, hdrEnd - 1 - Magic.length,
      "US-ASCII").split(' ').filter(_.nonEmpty)
    var w = -1; var h = -1; var fn = 30; var fd = 1; var cs = "420mpeg2"
    params.foreach { p =>
      p.charAt(0) match {
        case 'W' => w = p.substring(1).toInt
        case 'H' => h = p.substring(1).toInt
        case 'F' =>
          val Array(n, d) = p.substring(1).split(':')
          fn = n.toInt; fd = d.toInt
        case 'C' => cs = p.substring(1)
        case _ => // I, A, X... — skip
      }
    }
    require(w > 0 && h > 0, s"Y4M header missing W/H (got ${w}x$h)")
    require(fn > 0 && fd > 0, s"bad frame rate $fn:$fd")
    val mono = cs == "mono"
    // exact 8-bit 4:2:0 names only: a prefix match would wave through the
    // 10/12/16-bit variants (C420p10...) whose planes are 2 bytes/sample
    // and mis-slice every frame at the 8-bit size
    require(mono || Cs420_8bit(cs),
      s"only mono and 8-bit 4:2:0 colorspaces supported, got C$cs")
    require(mono || (w % 2 == 0 && h % 2 == 0),
      s"4:2:0 needs even dimensions, got ${w}x$h")
    require(w.toLong * h * 3 / 2 <= Png.MaxRasterBytes,
      s"Y4M frame ${w}x$h exceeds the decode cap (corrupt header?)")
    val fb = if (mono) w * h else w * h + 2 * ((w / 2) * (h / 2))
    val frames = Array.newBuilder[Array[Byte]]
    var off = hdrEnd
    while (off < b.length) {
      require(off + 5 <= b.length &&
        b(off) == 'F' && b(off + 1) == 'R' && b(off + 2) == 'A' &&
        b(off + 3) == 'M' && b(off + 4) == 'E',
        s"expected FRAME marker at offset $off")
      val dataStart = lineEnd(b, off + 5) // frame params (if any) skipped
      require(dataStart + fb <= b.length,
        s"truncated Y4M: frame needs $fb bytes past offset $dataStart")
      frames += java.util.Arrays.copyOfRange(b, dataStart, dataStart + fb)
      off = dataStart + fb
    }
    Video(w, h, fn, fd, mono, frames.result())
  }

  // ---- transforms ----------------------------------------------------------

  /** Keep every `stride`-th frame — the deterministic temporal decimation
    * a training pipeline uses to subsample clips ("frame sampling");
    * exact so oracles can replay it. The frame rate scales down exactly
    * by stretching the rational's denominator. */
  def frameSample(v: Video, stride: Int): Video = {
    require(stride >= 1, s"bad stride $stride")
    val kept = Array.range(0, v.frames.length, stride).map(v.frames)
    v.copy(fpsDen = v.fpsDen * stride, frames = kept)
  }
}
