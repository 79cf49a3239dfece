package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Bit-rot robustness for every in-JVM codec: a scraped corpus delivers
  * truncated downloads and flipped bits AT SCALE, and [[Multimodal]]'s
  * per-row quarantine only works if a corrupt payload THROWS — never
  * hangs, never allocates unbounded memory off a garbled header, never
  * returns out-of-contract dimensions. Seeded mutations (single byte
  * flips and truncations) of valid streams must all decode-or-throw. */
class CodecFuzzSpec extends AnyFunSuite {

  private val rnd = new scala.util.Random(20260818)

  /** Either a successful decode obeying `sane`, or a thrown Exception —
    * anything else (hang would time the suite out; Error would escape
    * the quarantine) fails. */
  private def fuzz(name: String, valid: Array[Byte],
      decode: Array[Byte] => Unit, rounds: Int = 150): Unit = {
    var decoded = 0; var threw = 0
    for (_ <- 1 to rounds) {
      val mutated =
        if (rnd.nextBoolean()) { // flip one bit IN PLACE (headers too)
          val m = valid.clone()
          val i = rnd.nextInt(m.length)
          m(i) = (m(i) ^ (1 << rnd.nextInt(8))).toByte
          m
        } else valid.take(rnd.nextInt(valid.length)) // truncate
      try { decode(mutated); decoded += 1 }
      catch { case _: Exception => threw += 1 }
    }
    assert(decoded + threw == rounds)
    assert(threw > 0, s"$name: no mutation ever threw — the fuzz is vacuous")
  }

  test("PNG survives byte flips and truncation (throw, not hang/OOM)") {
    val px = Array.tabulate(32 * 24)(i => (i * 31 % 256).toByte)
    fuzz("png", Png.encode(32, 24, 1, px), b => { Png.decode(b); () })
  }

  test("JPEG survives byte flips and truncation") {
    val px = Array.tabulate(32 * 24)(i => (i * 31 % 256).toByte)
    fuzz("jpeg", Jpeg.encode(32, 24, 1, px, restartInterval = 2),
      b => { Jpeg.decode(b); () })
  }

  test("GIF survives byte flips and truncation") {
    val px = Array.tabulate(32 * 24)(i => (i * 31 % 256).toByte)
    fuzz("gif", Gif.encode(32, 24, px, interlace = true),
      b => { Gif.decode(b); () })
  }

  test("WAV survives byte flips and truncation") {
    val smp = Array.tabulate(200)(i => (i * 97) % 4001 - 2000)
    fuzz("wav", Wav.encode(Wav.Audio(8000, 1, 16, smp)),
      b => { Wav.decode(b); () })
  }

  test("Y4M survives byte flips and truncation") {
    val frames = Array.tabulate(3)(f =>
      Array.tabulate(48)(i => ((f * 131 + i * 7) % 256).toByte))
    fuzz("y4m", Y4m.encode(Y4m.Video(8, 6, 24, 1, mono = true, frames)),
      b => { Y4m.decode(b); () })
  }

  test("a poisoned header can never allocate past the raster cap") {
    // PNG with an absurd declared size: must throw the cap message, not
    // attempt a 16-exabyte array
    val good = Png.encode(8, 8, 1, Array.fill(64)(7.toByte))
    val bad = good.clone()
    // IHDR width at offset 16 (sig 8 + len 4 + type 4): set to 2^30
    bad(16) = 0x40.toByte; bad(17) = 0; bad(18) = 0; bad(19) = 0
    val e = intercept[Exception](Png.decode(bad))
    assert(e.getMessage != null)
  }
}
