package graft.build

/**
 * Cost-based filter sizing with technical-bin splitting — the capability of
 * the reference's capacity-simulation planner (ganon
 * src/ganon-build/GanonBuild.cpp:290-412 sizing math, :428-616
 * `optimal_hashes`, :619-653 `create_bin_map_hash`).
 *
 * Instead of sizing every bin for the LARGEST target (which costs
 * `numBins x bits(max-target)` and explodes on skewed corpora), the planner
 * simulates candidate per-bin capacities `c`, computes for each the number
 * of technical bins (`sum ceil(n_t / c)`), the bin size under the
 * false-positive budget CORRECTED for the multiple-testing effect of
 * splitting one target across several bins, and picks the capacity
 * minimizing a harmonic mean of (filter-size ratio, bin-count ratio) —
 * exactly the reference's scoring, including its five modes.
 *
 * Pure driver-side math over the pass-1 cardinalities; O(|targets|) per
 * simulated capacity. The reference simulates every 100 hashes; we cap the
 * number of simulation points (default 1024) so planning stays sub-second
 * for billion-hash targets — same optimum up to step granularity.
 */
object Sizing {

  private val Ln2 = math.log(2.0)

  /** Bloom bits for n elements at fp, with the optimal hash count
    * (GanonBuild.cpp:290-296 `bin_size`). */
  def binSizeBits(maxFp: Double, nHashes: Long): Long =
    math.ceil(-nHashes.toDouble * math.log(maxFp) / (Ln2 * Ln2)).toLong

  /** Bloom bits for n elements at fp with h FIXED hash functions
    * (GanonBuild.cpp:298-306). */
  def binSizeBits(maxFp: Double, nHashes: Long, h: Int): Long =
    math.ceil(nHashes
      * (-h / math.log(1.0 - math.exp(math.log(maxFp) / h)))).toLong

  /** Optimal h from the bits/element ratio (GanonBuild.cpp:308-314). */
  def hashFunctionsFromRatio(binSizeBits: Long, nHashes: Long): Int =
    (Ln2 * (binSizeBits / math.max(1.0, nHashes.toDouble))).toInt

  /** Resolve h: 0 = derive from ratio; clamp to [1, maxH]
    * (GanonBuild.cpp:316-333). */
  def resolveHashFunctions(binSizeBits: Long, nHashes: Long,
      hashFunctions: Int, maxHashFunctions: Int): Int = {
    var h = hashFunctions
    if (h == 0) h = hashFunctionsFromRatio(binSizeBits, nHashes)
    if (h > maxHashFunctions || h == 0) h = maxHashFunctions
    h
  }

  /** Technical bins needed if each holds at most `capacity` hashes
    * (GanonBuild.cpp:336-347 `number_of_bins`). */
  def numberOfBins(counts: Array[Long], capacity: Long): Long = {
    var b = 0L; var i = 0
    while (i < counts.length) {
      b += (counts(i) + capacity - 1) / capacity
      i += 1
    }
    b
  }

  /** Bin-size growth rate to keep a target split across `maxSplitBins`
    * bins within the original fp budget — the multiple-testing correction
    * (GanonBuild.cpp:350-362 `correction_rate`). */
  def correctionRate(maxSplitBins: Long, maxFp: Double, h: Int,
      nHashes: Long): Double = {
    if (maxSplitBins <= 1) return 1.0
    val targetFpr = 1.0 - math.exp(math.log1p(-maxFp) / maxSplitBins)
    binSizeBits(targetFpr, nHashes, h).toDouble / binSizeBits(maxFp, nHashes, h)
  }

  /** Bins rounded to the 64-multiple the interleaved layout needs
    * (GanonBuild.cpp:365-371). */
  def optimalBins(nBins: Long): Long = ((nBins + 63) / 64) * 64

  /** Single-bin theoretical fp (GanonBuild.cpp:374-380). */
  def falsePositive(binSizeBits: Long, h: Int, nHashes: Long): Double =
    math.pow(1.0 - math.exp(-h / (binSizeBits / math.max(1.0, nHashes.toDouble))), h.toDouble)

  /** Split-corrected theoretical (max, avg) fp across targets
    * (GanonBuild.cpp:382-412 `true_false_positive`). */
  def trueFalsePositive(counts: Array[Long], maxHashesBin: Long,
      binSizeBits: Long, h: Int): (Double, Double) = {
    var hi = 0.0; var sum = 0.0
    var i = 0
    while (i < counts.length) {
      val c = math.max(1L, counts(i))
      val nBinsTarget = (c + maxHashesBin - 1) / maxHashesBin
      val nHashesBin = (c + nBinsTarget - 1) / nBinsTarget
      val realFp = 1.0 - math.pow(
        1.0 - falsePositive(binSizeBits, h, nHashesBin), nBinsTarget.toDouble)
      if (realFp > hi) hi = realFp
      sum += realFp
      i += 1
    }
    (hi, sum / counts.length)
  }

  /** Chosen configuration: per-bin capacity, corrected bin size, h, and the
    * technical-bin count (pre-64-rounding). */
  final case class SizingResult(
      maxHashesBin: Long,
      binSizeBits: Long,
      hashFunctions: Int,
      nBins: Long,
      expectedMaxFp: Double,
      expectedAvgFp: Double)

  /**
   * The capacity simulation (GanonBuild.cpp:428-616, max-fp path).
   *
   * @param mode "avg" (default harmonic mean) | "smaller" | "smallest" |
   *             "faster" | "fastest" — same semantics as the reference
   * @param hashFunctions 0 = derive optimal per candidate
   * @param maxSimPoints cap on simulated capacities (reference: every 100
   *                     hashes unbounded; we keep its 100 floor but bound
   *                     the point count so planning is O(points x targets))
   */
  def optimalHashes(maxFp: Double, counts: Array[Long], mode: String = "avg",
      hashFunctions: Int = 0, maxHashFunctions: Int = 8,
      maxSimPoints: Int = 1024): SizingResult = {
    require(counts.nonEmpty, "no targets to size")
    require(maxFp > 0 && maxFp < 1)
    val maxHashes = math.max(1L, counts.max)

    final case class Sim(nHashes: Long, nBins: Long, filterBits: Long)
    val sims = scala.collection.mutable.ArrayBuffer.empty[Sim]
    var minFilter = 0L
    var minBins = 0L

    val step = math.max(100L, maxHashes / maxSimPoints)
    val iter = if (maxHashes < step) maxHashes else step
    var n = maxHashes + 1
    var break = false
    while (n > iter && !break) {
      val nHashes = n - 1
      val nBins = numberOfBins(counts, nHashes)
      val maxSplitBins = (maxHashes + nHashes - 1) / nHashes
      // size the bin for the SPLIT-CORRECTED per-bin fp target directly
      // (1-(1-maxFp)^(1/maxSplit)): algebraically the reference's
      // crate-inflated size (GanonBuild.cpp:524-545) but with the hash
      // count re-optimized for the corrected ratio — the reference clamps
      // h <= 5 (a seqan3 constraint we do not have), which inflates heavy
      // splits by ~20% over the information-theoretic size
      val binFpTarget =
        if (maxSplitBins <= 1) maxFp
        else 1.0 - math.exp(math.log1p(-maxFp) / maxSplitBins)
      var bits = 0L
      var h = 0
      if (hashFunctions == 0) {
        bits = binSizeBits(binFpTarget, nHashes)
        h = resolveHashFunctions(bits, nHashes, 0, maxHashFunctions)
        // with h clamped below the optimum, re-size at that h
        if (h < hashFunctionsFromRatio(bits, nHashes))
          bits = binSizeBits(binFpTarget, nHashes, h)
      } else {
        h = resolveHashFunctions(0L, nHashes, hashFunctions, maxHashFunctions)
        bits = binSizeBits(binFpTarget, nHashes, h)
      }
      val filterBits = bits * optimalBins(nBins)
      if (filterBits == 0L) break = true
      else {
        if (minFilter == 0L || filterBits < minFilter) minFilter = filterBits
        if (minBins == 0L || nBins < minBins) minBins = nBins
        sims += Sim(nHashes, nBins, filterBits)
      }
      n -= iter
    }
    require(sims.nonEmpty, "sizing simulation produced no candidates")

    // harmonic-mean scoring with mode deviation (GanonBuild.cpp:565-616)
    val modeVal = mode match {
      case "smaller" | "faster"   => 0.5
      case "smallest" | "fastest" => 0.0
      case _                      => 1.0
    }
    var varVal = 1.0; var binsVal = 1.0
    if (mode == "smaller" || mode == "smallest") varVal = modeVal
    else if (mode == "faster" || mode == "fastest") binsVal = modeVal

    var best: Sim = null
    var minAvg = 0.0
    sims.foreach { s =>
      val varRatio = s.filterBits.toDouble / minFilter
      val binsRatio = s.nBins.toDouble / minBins
      val avg = (1.0 + modeVal * modeVal) * (varRatio * binsRatio) /
        (varVal * varRatio + binsVal * binsRatio)
      if (best == null || avg < minAvg) { minAvg = avg; best = s }
    }
    var binBits = best.filterBits / optimalBins(best.nBins)
    var h = resolveHashFunctions(binBits, best.nHashes, hashFunctions,
      maxHashFunctions)
    // enforce the budget: integer-truncated h and the avg-fill approximation
    // can leave the split-corrected fp a few % over maxFp (the reference
    // only REPORTS the exceedance, GanonBuild.cpp:382-412; our tests and
    // queries treat maxFp as a hard bound) — grow the bin until it holds
    var (maxRealFp, avgRealFp) =
      trueFalsePositive(counts, best.nHashes, binBits, h)
    while (maxRealFp > maxFp) {
      binBits = (binBits * 1.05).toLong + 64
      h = resolveHashFunctions(binBits, best.nHashes, hashFunctions,
        maxHashFunctions)
      val fp = trueFalsePositive(counts, best.nHashes, binBits, h)
      maxRealFp = fp._1; avgRealFp = fp._2
    }
    SizingResult(best.nHashes, binBits, h, best.nBins, maxRealFp, avgRealFp)
  }
}
