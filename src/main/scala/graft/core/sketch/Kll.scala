package graft.core.sketch

import scala.collection.mutable.ArrayBuffer

/**
 * KLL-style mergeable quantile sketch over doubles (Karnin-Lall-Liberty
 * 2016 family): a ladder of compactors; level h items carry weight 2^h;
 * when a level overflows its capacity (k * c^(depth-1-h), c = 2/3,
 * floor 2), the sorted buffer is halved by keeping alternating items and
 * promoting them one level up.
 *
 * Determinism: compaction keeps odd/even-indexed items by a per-level
 * alternating flag (no RNG) — bit-for-bit reproducible across runs and
 * merge orders of the same partition content; rank error stays O(1/k)
 * in practice and is asserted empirically against exact oracles in tests
 * (the north-rule "published bound" check uses a conservative 1.65*e(k)
 * envelope, e(k) ~ 2.3/k per the KLL paper's constant-factor regime).
 *
 * No analog in the reference; required by the north rule for file-size /
 * shingle-count quantile queries.
 *
 * Serialized layout: [k: Int][nLevels: Int][n: Long][flags: Long]
 * then per level [len: Int][items: Double*len].
 */
final class Kll(val k: Int) extends Serializable {
  require(k >= 8)
  private[sketch] var levels: ArrayBuffer[ArrayBuffer[Double]] =
    ArrayBuffer(ArrayBuffer.empty[Double])
  private[sketch] var alternate: Long = 0L // bit per level: keep odd vs even next time
  private[sketch] var _n: Long = 0L

  def n: Long = _n

  private def capacity(level: Int): Int = {
    val depth = levels.length
    val h = depth - 1 - level // 0 for the top level
    math.max(2, math.ceil(k * math.pow(2.0 / 3.0, h.toDouble)).toInt)
  }

  def add(x: Double): Unit = {
    levels(0) += x
    _n += 1
    compress()
  }

  private def totalCapacity: Int = {
    var s = 0; var l = 0
    while (l < levels.length) { s += capacity(l); l += 1 }
    s
  }

  private def size: Int = {
    var s = 0; var l = 0
    while (l < levels.length) { s += levels(l).length; l += 1 }
    s
  }

  private def compress(): Unit = {
    while (size >= totalCapacity) {
      // compact the lowest level at/over its capacity
      var l = 0
      while (l < levels.length && levels(l).length < capacity(l)) l += 1
      if (l == levels.length) return
      compactLevel(l)
    }
  }

  private def compactLevel(l: Int): Unit = {
    if (l + 1 == levels.length) levels += ArrayBuffer.empty[Double]
    val sorted = levels(l).sorted
    // weight conservation: only an even count can be halved-and-promoted;
    // an odd buffer leaves its last item behind at this level.
    val odd = sorted.length % 2 == 1
    val m = if (odd) sorted.length - 1 else sorted.length
    val keepOdd = ((alternate >>> l) & 1L) == 1L
    alternate ^= (1L << l)
    val start = if (keepOdd) 1 else 0
    val up = levels(l + 1)
    var i = start
    while (i < m) { up += sorted(i); i += 2 }
    levels(l) = if (odd) ArrayBuffer(sorted(m)) else ArrayBuffer.empty[Double]
  }

  def merge(other: Kll): Kll = {
    require(other.k == k, s"incompatible KLL k=$k vs ${other.k}")
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < other.levels.length) { levels(l) ++= other.levels(l); l += 1 }
    _n += other._n
    compress()
    this
  }

  /** All (value, weight) pairs, for rank/quantile evaluation. */
  private def weighted: Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var l = 0
    while (l < levels.length) {
      val wgt = 1L << l
      levels(l).foreach(v => out += ((v, wgt)))
      l += 1
    }
    out.sortBy(_._1).toArray
  }

  /** Estimated value at rank fraction q in [0,1]. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0)
    val w = weighted
    if (w.isEmpty) return Double.NaN
    val target = q * _n
    var cum = 0L
    var i = 0
    while (i < w.length) {
      cum += w(i)._2
      if (cum >= target) return w(i)._1
      i += 1
    }
    w.last._1
  }

  /** Estimated rank fraction of value x. */
  def rank(x: Double): Double = {
    if (_n == 0) return Double.NaN
    var below = 0L
    var l = 0
    while (l < levels.length) {
      val wgt = 1L << l
      levels(l).foreach(v => if (v <= x) below += wgt)
      l += 1
    }
    below.toDouble / _n
  }

  /** Conservative published-style rank-error envelope for this k. */
  def rankErrorBound: Double = math.min(0.5, 1.65 * 2.3 / k)

  def toBytes: Array[Byte] = {
    var sz = 4 + 4 + 8 + 8
    levels.foreach(b => sz += 4 + b.length * 8)
    val bb = java.nio.ByteBuffer.allocate(sz).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(k).putInt(levels.length).putLong(_n).putLong(alternate)
    levels.foreach { b =>
      bb.putInt(b.length)
      b.foreach(bb.putDouble)
    }
    bb.array()
  }
}

object Kll {
  def empty(k: Int = 256): Kll = new Kll(k)

  def fromBytes(bytes: Array[Byte]): Kll = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val k = bb.getInt(); val nLevels = bb.getInt()
    val sk = new Kll(k)
    val n = bb.getLong(); val alt = bb.getLong()
    sk.levels = ArrayBuffer.fill(nLevels)(ArrayBuffer.empty[Double])
    var l = 0
    while (l < nLevels) {
      val len = bb.getInt()
      var i = 0
      while (i < len) { sk.levels(l) += bb.getDouble(); i += 1 }
      l += 1
    }
    sk.alternate = alt
    sk._n = n
    sk
  }
}
