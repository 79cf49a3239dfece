package graft.tools

import graft.core.Hashing
import graft.synth.Corpus

/** Single-thread microbench of the shingle hot loop (no Spark). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = 20000
    val bytes = (0 until n).map(i =>
      Corpus.contentOf(i.toLong, "scala", 42L, 120)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    var acc = 0L
    var r = 0
    while (r < 2) { // warm JIT
      var i = 0
      while (i < n) { acc += Hashing.shinglesBytes(bytes(i), 19, 31).length; i += 1 }
      r += 1
    }
    val t0 = System.nanoTime()
    var i = 0
    while (i < n) { acc += Hashing.shinglesBytes(bytes(i), 19, 31).length; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    val totalBytes = bytes.map(_.length.toLong).sum
    println(f"[kernel] $n rows in $dt%.3f s = ${n / dt}%.0f rows/s, " +
      f"${totalBytes / dt / 1e6}%.1f MB/s single-thread (acc=$acc)")

    // component costs: raw rolling+mix (no window/dedup) vs full shingles
    var acc2 = 0L
    var r2 = 0
    while (r2 < 2) {
      var i2 = 0
      while (i2 < n) {
        val hs = Hashing.kmerHashesBytes(bytes(i2), 19)
        acc2 += hs(hs.length - 1); i2 += 1
      }
      r2 += 1
    }
    val tk0 = System.nanoTime()
    var i3 = 0
    while (i3 < n) {
      val hs = Hashing.kmerHashesBytes(bytes(i3), 19)
      acc2 += hs(hs.length - 1); i3 += 1
    }
    val dtk = (System.nanoTime() - tk0) / 1e9
    println(f"[kernel] kmer-only: ${totalBytes / dtk / 1e6}%.1f MB/s 1T (acc=$acc2)")

    // multi-thread scaling of the same loop (JVM-level, no Spark)
    Seq(2, 8, 32).foreach { t =>
      val th0 = System.nanoTime()
      val threads = (0 until t).map { _ =>
        new Thread(() => {
          var a = 0L; var j = 0
          while (j < n) { a += Hashing.shinglesBytes(bytes(j), 19, 31).length; j += 1 }
          if (a == -1) println("")
        })
      }
      threads.foreach(_.start()); threads.foreach(_.join())
      val tdt = (System.nanoTime() - th0) / 1e9
      println(f"[kernel] $t%2d threads x $n rows: $tdt%.3f s = " +
        f"${t * totalBytes / tdt / 1e6}%.1f MB/s aggregate")
    }
  }
}
