package graft.core

/**
 * MinHash signatures + banded LSH keys, and 64-bit SimHash — the near-dup
 * primitives of the training-data pipeline layer (no analog in the
 * reference; first-class per the builder brief).
 *
 * MinHash: signature(i) = min over the set's hashes of mix64(h ^ seed_i);
 * E[matching coordinates] = Jaccard(A,B). Banded LSH: split the signature
 * into b bands of r rows; band key = hash of the band's slice; pairs
 * agreeing on >=1 band key are candidates (detection prob 1-(1-J^r)^b).
 */
object MinHash {

  /** Deterministic per-permutation seeds derived from one master seed. */
  def permSeeds(numPerms: Int, seed: Long = Hashing.DefaultSeed): Array[Long] = {
    val out = new Array[Long](numPerms)
    var s = seed
    var i = 0
    while (i < numPerms) { s = Hashing.mix64(s + 0x9E3779B97F4A7C15L); out(i) = s; i += 1 }
    out
  }

  /** MinHash signature of a distinct-hash set. Empty set -> all Long.MaxValue. */
  def signature(hashes: Array[Long], seeds: Array[Long]): Array[Long] = {
    val sig = Array.fill(seeds.length)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val h = hashes(i)
      var p = 0
      while (p < seeds.length) {
        val v = Hashing.mix64(h ^ seeds(p))
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  /**
   * One-permutation MinHash (Li, Owen, Zhang 2012) with rotation
   * densification (Shrivastava, Li 2014): ONE mix64 per element instead of
   * k — the element's hash picks a bucket (unsigned mod k) and competes
   * for that bucket's minimum; empty buckets borrow the nearest filled
   * bucket to the right (circular), offset per hop to stay decorrelated.
   * Same E[matching coords] = Jaccard estimator, identical sets still map
   * to identical signatures (the banded-LSH J=1 guarantee), ~k x cheaper
   * on the q17-style signature hot loop.
   */
  def signatureOPH(hashes: Array[Long], k: Int,
      seed: Long = Hashing.DefaultSeed): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < hashes.length) {
      val v = Hashing.mix64(hashes(i) ^ seed)
      val b = java.lang.Long.remainderUnsigned(v, k.toLong).toInt
      if (v < sig(b)) sig(b) = v
      i += 1
    }
    // rotation densification
    var j = 0
    while (j < k) {
      if (sig(j) == Long.MaxValue) {
        var hop = 1
        while (hop <= k && sig((j + hop) % k) == Long.MaxValue) hop += 1
        if (hop <= k) sig(j) = sig((j + hop) % k) + hop * 0x9E3779B97F4A7C15L
      }
      j += 1
    }
    sig
  }

  /** Banded LSH bucket keys: one 64-bit key per band. */
  def bandKeys(sig: Array[Long], bands: Int): Array[Long] = {
    require(sig.length % bands == 0, s"sig ${sig.length} not divisible into $bands bands")
    val r = sig.length / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var h = 0x8F3F73B5CF1C9ADEL + b
      var i = b * r
      while (i < (b + 1) * r) { h = Hashing.mix64(h ^ sig(i)); i += 1 }
      out(b) = h
      b += 1
    }
    out
  }

  /** Estimated Jaccard from two signatures. */
  def estimateJaccard(a: Array[Long], b: Array[Long]): Double = {
    require(a.length == b.length)
    var eq = 0; var i = 0
    while (i < a.length) { if (a(i) == b(i)) eq += 1; i += 1 }
    eq.toDouble / a.length
  }

  /** Exact Jaccard of two sorted-distinct hash arrays (verification step). */
  def exactJaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    var i = 0; var j = 0; var inter = 0L
    while (i < a.length && j < b.length) {
      val x = a(i) + Long.MinValue; val y = b(j) + Long.MinValue
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    val union = a.length.toLong + b.length - inter
    if (union == 0) 1.0 else inter.toDouble / union
  }
}

/** 64-bit SimHash over weighted token hashes (Charikar 2002). */
object SimHash {
  def simhash(tokenHashes: Array[Long]): Long = {
    val acc = new Array[Int](64)
    var i = 0
    while (i < tokenHashes.length) {
      val h = tokenHashes(i)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
}
