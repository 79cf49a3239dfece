package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashing
import graft.core.sketch.{Bloom, InterleavedBloom}
import graft.spark.GraftFunctions

/** Shingling + filter-sizing parameters (role of ganon's IBFConfig,
  * src/utils/include/utils/IBFConfig.hpp:5-41). `sizingMode` mirrors the
  * reference's five optimal_hashes modes (GanonBuild.cpp:565-616). */
final case class IbfParams(
    k: Int = 19,
    w: Int = 31, // reference defaults: -k 19 -w 31 (config.py); w>k shrinks
                 // the per-row hash set ~2/(w-k+2) with the same guarantees
    seed: Long = Hashing.DefaultSeed,
    maxFp: Double = 0.01,
    hllP: Int = 14,
    minContentLen: Int = 0,
    sizingMode: String = "avg")

/** Driver-side sizing result (role of ganon's IBFConfig after
  * optimal_hashes, src/ganon-build/GanonBuild.cpp:428-616): numBins is the
  * TECHNICAL bin count (targets split at maxHashesBin capacity). */
final case class IbfPlan(
    numBins: Int,
    bitsPerBin: Long,
    numHashes: Int,
    maxHashesBin: Long,
    expectedMaxFp: Double)

/**
 * Technical-bin layout: target i owns bins [base(i), base(i)+split(i)) —
 * the role of ganon's bin_map (GanonBuild.cpp:619-653 create_bin_map_hash).
 * The reference slices each target's hash list by index ranges; we route by
 * hash VALUE (`routeBin`) so the assignment is a pure per-hash function —
 * computable on any executor without materializing the sorted list.
 */
final case class BinLayout(base: Array[Int], split: Array[Int], numBins: Int)
    extends Serializable {
  def numGroups: Int = (numBins + 63) / 64
  /** Does any target span a 64-bin group boundary? (limits coarse pruning) */
  lazy val anyGroupSpanning: Boolean = base.indices.exists { i =>
    (base(i) / 64) != ((base(i) + split(i) - 1) / 64)
  }
}

object BinLayout {
  private val RouteSeed = 0xC2B2AE3D27D4EB4FL

  /** Which of a target's `split` bins hash `h` lives in — deterministic,
    * uniform, independent of the shingle seed. */
  @inline def routeBin(h: Long, split: Int): Int =
    if (split == 1) 0
    else java.lang.Long.remainderUnsigned(
      Hashing.mix64(h ^ RouteSeed), split.toLong).toInt

  def fromCounts(counts: Array[Long], maxHashesBin: Long): BinLayout = {
    val split = counts.map(c =>
      math.max(1L, (math.max(1L, c) + maxHashesBin - 1) / maxHashesBin).toInt)
    val base = new Array[Int](counts.length)
    var acc = 0
    var i = 0
    while (i < counts.length) { base(i) = acc; acc += split(i); i += 1 }
    BinLayout(base, split, acc)
  }
}

/** Broadcastable probe side of the classify join: flat IBF or the
  * two-level (HIBF-like) layout — Classify is layout-agnostic. `counts`
  * passed to probe are PER TARGET (split technical bins already summed,
  * GanonClassify.cpp:517-527 semantics; clamping at n_hashes happens in
  * the classifier). */
trait ProbeDb extends Serializable {
  def targets: Array[String]
  def targetHashes: Array[Long]
  def params: IbfParams
  def plan: IbfPlan
  /** Split-corrected expected FPR of target `t` (GanonClassify.cpp:968-979:
    * 1 - (1 - fp_bin)^n_bins_target over the average per-bin load). */
  def binFpr(t: Int): Double
  /** Count hash membership per TARGET into `counts` (len >= targets.length).
    * `cutoff` is the per-read threshold known BEFORE probing — two-level
    * layouts use it to prune whole groups (the reference's HIBF pushdown,
    * hierarchical_interleaved_bloom_filter.hpp:433-460). */
  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit
  def sizeBytes: Long
  @transient lazy val targetIndex: Map[String, Int] = targets.zipWithIndex.toMap
}

/** Shared split-bin bookkeeping for both concrete layouts. */
private[graft] trait SplitBinDb extends ProbeDb {
  def layout: BinLayout

  protected def isFlat: Boolean = layout.numBins == targets.length

  // per-target split-corrected fp, precomputed once per executor
  @transient private lazy val fprByTarget: Array[Double] =
    Array.tabulate(targets.length) { t =>
      val s = layout.split(t)
      val c = math.max(1L, targetHashes(t))
      val perBin = (c + s - 1) / s
      val single = Bloom.falsePositiveRate(plan.bitsPerBin, plan.numHashes, perBin)
      Bloom.splitCorrectedFpr(single, s)
    }

  def binFpr(t: Int): Double = fprByTarget(t)

  // per-thread technical-bin scratch (the broadcast db is shared across
  // tasks in one executor; per-row allocation would churn the TLAB)
  @transient protected lazy val techScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](layout.numBins))

  // grow-on-demand per-thread position matrix (n_hashes x numHashes ints)
  // shared by both two-level probe variants
  @transient private lazy val rowScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](1024 * plan.numHashes))
  protected def rowMatrix(n: Int): Array[Int] = {
    var m = rowScratch.get()
    if (m.length < n * plan.numHashes) {
      m = new Array[Int](n * plan.numHashes)
      rowScratch.set(m)
    }
    m
  }

  /** Fold technical-bin counts into per-target counts (+=). */
  protected def foldToTargets(tech: Array[Int], counts: Array[Int]): Unit = {
    var t = 0
    while (t < targets.length) {
      val b0 = layout.base(t)
      val n = layout.split(t)
      var acc = 0
      var s = 0
      while (s < n) { acc += tech(b0 + s); s += 1 }
      counts(t) += acc
      t += 1
    }
  }
}

/**
 * The flat sketch database: one interleaved Bloom over all TECHNICAL bins
 * plus the target->bins layout (role of ganon's serialized (IBFConfig,
 * hashes_count, bin_map, ibf) — src/ganon-build/GanonBuild.cpp:251-288).
 */
final class SketchDb(
    val ibf: InterleavedBloom,
    val targets: Array[String],       // target index -> name (sorted)
    val targetHashes: Array[Long],    // target index -> estimated distinct hashes
    val layout: BinLayout,
    val params: IbfParams,
    val plan: IbfPlan) extends SplitBinDb {

  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit =
    if (isFlat) ibf.bulkCount(hashes, counts)
    else {
      val tech = techScratch.get()
      java.util.Arrays.fill(tech, 0)
      ibf.bulkCount(hashes, tech)
      foldToTargets(tech, counts)
    }

  /** Union-membership FPR probe for target `t` (any of its split bins). */
  def containsTarget(hash: Long, t: Int): Boolean =
    ibf.containsInBins(hash, layout.base(t), layout.base(t) + layout.split(t))

  def sizeBytes: Long = ibf.sizeBytes
}

/**
 * Two-level (HIBF-like) layout: a coarse IBF over 64-bin GROUPS prunes
 * which fine shards to probe. The coarse bin of group g contains the union
 * of the hashes routed into the group, so coarseCount(g) >= count(any
 * member bin) — a group below the read's threshold can be skipped with
 * zero false negatives. When a split target spans groups its total count
 * is divided between coarse bins, so full-cutoff pruning is only safe for
 * span-free layouts; otherwise we fall back to presence pruning
 * (skip only zero-hit groups), which is always lossless.
 * Executor memory: only the coarse IBF must stay hot; shards are
 * independent blobs (loadable lazily from the sketch store at real scale).
 */
final class TwoLevelSketchDb(
    val coarse: InterleavedBloom,          // bins = groups
    val shards: Array[InterleavedBloom],   // one fine IBF per 64-bin group
    val targets: Array[String],
    val targetHashes: Array[Long],
    val layout: BinLayout,
    val params: IbfParams,
    val plan: IbfPlan) extends SplitBinDb {

  private val groupCutoffSafe = !layout.anyGroupSpanning

  // per-thread coarse count scratch — the probe runs once per READ,
  // so per-row allocation here is pure GC churn (same discipline as
  // techScratch)
  @transient private lazy val gcScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](shards.length))

  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit = {
    val gc = gcScratch.get()
    java.util.Arrays.fill(gc, 0)
    coarse.bulkCount(hashes, gc)
    val effCutoff = if (groupCutoffSafe) cutoff else 1
    val tech = techScratch.get()
    java.util.Arrays.fill(tech, 0)
    // every shard shares (bitsPerBin, numHashes): derive each hash's probe
    // rows ONCE into a matrix, then sweep the surviving shards GROUP-MAJOR
    // (one shard's ~bitsPerBin/8-byte word array stays cache-resident for
    // the whole hash sweep; a hash-major walk across shards thrashes)
    var any = false
    var g = 0
    while (g < shards.length && !any) { any = gc(g) >= effCutoff; g += 1 }
    if (any) {
      val rows = rowMatrix(hashes.length)
      InterleavedBloom.probeRowsAll(hashes, plan.bitsPerBin, plan.numHashes,
        rows)
      g = 0
      while (g < shards.length) {
        if (gc(g) >= effCutoff)
          shards(g).countAtRowsMatrix1(rows, hashes.length, tech, g * 64)
        g += 1
      }
    }
    foldToTargets(tech, counts)
  }

  def sizeBytes: Long = coarse.sizeBytes + shards.map(_.sizeBytes).sum
}

/** Minimal serializable Hadoop-configuration carrier for executor-side
  * filesystem access (Hadoop's `Configuration` is Writable, not
  * Serializable). */
final class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

/**
 * Two-level layout with LAZY shards: only the coarse filter and the bin
 * metadata ship with the broadcast; each executor fetches a group's fine
 * shard from the sketch store ON FIRST PROBE of that group and caches it.
 * With coarse pruning, shards for groups a workload never hits are never
 * read — executor memory is bounded by the WORKING SET of groups, not the
 * database size (the HIBF lazy-load story; the reference keeps the whole
 * HIBF resident, GanonClassify.cpp:949-986) — and `maxCacheBytes` bounds
 * even the working set: past it, the least-recently-probed shard is
 * evicted (a shifting workload over a 500 GB store no longer resident-sets
 * every shard it ever touched). SIZE THE BOUND ABOVE THE WORKLOAD'S
 * INSTANTANEOUS working set: eviction granularity is per probe, so a
 * bound below what one saturating sweep needs degrades to a blob
 * re-fetch+parse per (read, evicted group) — the bound protects memory
 * across workload SHIFTS, it is not a magic way to probe a store bigger
 * than the reads' own reach.
 *
 * SNAPSHOT PINNING: the handle carries its generation's per-group blob
 * pointers (`shardGens`), and updates never mutate committed blobs — only
 * write the next generation's — so this handle keeps reading exactly the
 * bits it was loaded with even while the store is updated underneath it.
 *
 * `readShard` resolves through the Hadoop FileSystem API, so the store can
 * live on file://, hdfs:// or any mounted FS. The SESSION's Hadoop
 * configuration rides along serialized — a fresh `Configuration()` on the
 * executor would drop every `spark.hadoop.*` setting (object-store
 * credentials, HA nameservice mappings) and break the first shard fetch.
 */
final class LazyTwoLevelDb(
    val coarse: InterleavedBloom,
    val targets: Array[String],
    val targetHashes: Array[Long],
    val layout: BinLayout,
    val params: IbfParams,
    val plan: IbfPlan,
    val storeDir: String,
    val generation: Int,
    val shardGens: Array[Int],
    hadoopConf: SerializableHadoopConf,
    maxCacheBytes: Long = Long.MaxValue) extends SplitBinDb {

  private val groupCutoffSafe = !layout.anyGroupSpanning

  @transient private lazy val shardCache =
    new java.util.concurrent.atomic.AtomicReferenceArray[InterleavedBloom](
      layout.numGroups)
  // LRU bookkeeping: a coarse monotonic clock stamped per access (lazySet —
  // no fence on the probe hot path) + resident-byte accounting. Eviction
  // only runs on load (rare), where a synchronized scan over numGroups is
  // cheap.
  @transient private lazy val lastAccess =
    new java.util.concurrent.atomic.AtomicLongArray(layout.numGroups)
  @transient private lazy val accessClock =
    new java.util.concurrent.atomic.AtomicLong()
  @transient private lazy val resident =
    new java.util.concurrent.atomic.AtomicLong()

  // recency stamps exist only to pick eviction victims; with an unbounded
  // cache (the default) nothing ever evicts, so skip the per-(read, group)
  // accessClock.incrementAndGet on the probe hot path entirely — a full
  // RMW on one shared cache line across all probe threads is real money
  // at millions of probes/second on a wide executor
  private val lruBounded = maxCacheBytes != Long.MaxValue

  private def shard(g: Int): InterleavedBloom = {
    var s = shardCache.get(g)
    if (s == null) {
      s = readShard(g)
      // stamp recency BEFORE publishing so an eviction scan never picks
      // the in-flight shard as the zero-stamped "oldest" entry, and
      // account the bytes BEFORE the CAS so a racing evictor's
      // subtraction can never precede this addition (that ordering would
      // leave `resident` permanently overcounting an evicted shard and
      // degrade the cache toward per-probe refetches)
      if (lruBounded) lastAccess.lazySet(g, accessClock.incrementAndGet())
      resident.addAndGet(s.sizeBytes)
      if (shardCache.compareAndSet(g, null, s)) {
        if (resident.get() > maxCacheBytes) evictLru(keep = g)
      } else {
        // CAS lost: another thread cached it first — back out our
        // accounting; the locally read shard is correct either way
        resident.addAndGet(-s.sizeBytes)
      }
    }
    if (lruBounded) lastAccess.lazySet(g, accessClock.incrementAndGet())
    s
  }

  private def evictLru(keep: Int): Unit = synchronized {
    while (resident.get() > maxCacheBytes) {
      var victim = -1
      var oldest = Long.MaxValue
      var g = 0
      while (g < layout.numGroups) {
        if (g != keep && shardCache.get(g) != null) {
          val a = lastAccess.get(g)
          if (a < oldest) { oldest = a; victim = g }
        }
        g += 1
      }
      if (victim < 0) return // only the just-loaded shard is resident
      val s = shardCache.getAndSet(victim, null)
      if (s != null) resident.addAndGet(-s.sizeBytes)
    }
  }

  private def readShard(g: Int): InterleavedBloom =
    graft.io.SketchStore.readShardBlob(hadoopConf.value, storeDir,
      shardGens, g).getOrElse {
      // None only for the NoBlobGen sentinel (appended group that routed
      // zero hashes): probe it as all-empty bins. A blob MISSING under a
      // real pointer throws inside readShardBlob — a gc'd pinned
      // generation must fail fast, not silently lose its matches.
      val nLocal = math.min(64, layout.numBins - g * 64)
      InterleavedBloom.empty(nLocal, plan.bitsPerBin, plan.numHashes)
    }

  // per-thread count scratch — probe runs per read (see TwoLevelSketchDb)
  @transient private lazy val gcScratch: ThreadLocal[Array[Int]] =
    ThreadLocal.withInitial(() => new Array[Int](layout.numGroups))

  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit = {
    val gc = gcScratch.get()
    java.util.Arrays.fill(gc, 0)
    coarse.bulkCount(hashes, gc)
    val effCutoff = if (groupCutoffSafe) cutoff else 1
    val tech = techScratch.get()
    java.util.Arrays.fill(tech, 0)
    // group-major with the shared position matrix (see
    // TwoLevelSketchDb.probe); first probe of a group fetches its shard
    // from the store
    var any = false
    var g = 0
    while (g < layout.numGroups && !any) { any = gc(g) >= effCutoff; g += 1 }
    if (any) {
      val rows = rowMatrix(hashes.length)
      InterleavedBloom.probeRowsAll(hashes, plan.bitsPerBin, plan.numHashes,
        rows)
      g = 0
      while (g < layout.numGroups) {
        if (gc(g) >= effCutoff)
          shard(g).countAtRowsMatrix1(rows, hashes.length, tech, g * 64)
        g += 1
      }
    }
    foldToTargets(tech, counts)
  }

  /** Broadcast footprint: the coarse filter only (shards stay off-heap of
    * the broadcast, fetched per executor on demand). */
  def sizeBytes: Long = coarse.sizeBytes

  /** How many shards this JVM has materialized (observability/tests). */
  def loadedShards: Int = {
    var n = 0; var g = 0
    while (g < layout.numGroups) {
      if (shardCache.get(g) != null) n += 1
      g += 1
    }
    n
  }

  /** Resident shard-cache bytes in this JVM (bounded by maxCacheBytes). */
  def residentBytes: Long = resident.get()
}

/**
 * Distributed build (Spark shape of ganon-build's two thread pools,
 * src/ganon-build/GanonBuild.cpp:752-921):
 *
 *   pass 1  groupBy(target).agg(hll(shingles))   -> per-target cardinalities
 *   driver  Sizing.optimalHashes: capacity simulation + split-bin layout
 *   pass 2  route hashes to 64-bin groups map-side, groupBy(grp) building
 *           one interleaved SHARD per group on executors
 *   driver  stitch the G shard columns into the broadcastable IBF
 *           (a strided memcopy of the final filter — no OR-merging, no
 *           transposing, no per-partition partials on the driver)
 *
 * Shuffle discipline: per-row-deduped hash subsets shuffle exactly once,
 * keyed by group. When numGroups >= parallelism the aggregation is
 * exchange-free-complete (one task per group, no partial blobs); below
 * that, map-side partials are bounded by numGroups x shardBytes per task.
 * Mega-target skew is structurally gone: every technical bin holds at most
 * ~maxHashesBin hashes, so reducers are load-balanced by construction
 * (the salting idea, but derived from the same split-bin plan the
 * reference uses — GanonBuild.cpp:619-653).
 *
 * Checkpointing: with `checkpointDir`, each pass persists its result
 * parquet and is skipped on re-run (resumability per the north rule;
 * role of ganon's save_state markers, src/ganon/util.py:138-143).
 */
object SketchBuild {

  /** The (target, hs) shingle projection both passes consume. */
  private def hashedProjection(df: DataFrame, targetCol: String,
      contentCol: String, p: IbfParams): DataFrame = {
    val base =
      if (p.minContentLen > 0) df.filter(octet_length(col(contentCol)) >= p.minContentLen)
      else df
    base.select(col(targetCol).as("target"),
      GraftFunctions.shingles(col(contentCol), p.k, p.w, p.seed).as("hs"))
  }

  /** Pass-1 result: (target, n_hashes estimate). */
  def targetCardinalities(df: DataFrame, targetCol: String, contentCol: String,
      p: IbfParams): DataFrame =
    targetCardinalitiesHashed(hashedProjection(df, targetCol, contentCol, p), p)

  private def targetCardinalitiesHashed(hashed: DataFrame,
      p: IbfParams): DataFrame =
    hashed.groupBy("target")
      .agg(GraftFunctions.hllCount(col("hs"), p.hllP).as("n_hashes"))

  /** Driver-side sizing via the capacity simulation; 5% headroom on the bin
    * size covers the HLL estimate error (1.04/sqrt(2^p)) so the realized FP
    * stays within budget even when pass 1 undersized a bin. */
  def plan(cards: Seq[(String, Long)], p: IbfParams): (IbfPlan, BinLayout) = {
    require(cards.nonEmpty, "no targets to build")
    val counts = cards.map(_._2).toArray
    val s = Sizing.optimalHashes(p.maxFp, counts, p.sizingMode)
    val bits = ((math.ceil(s.binSizeBits * 1.05).toLong + 63) / 64) * 64
    val layout = BinLayout.fromCounts(counts, s.maxHashesBin)
    val (maxFpReal, _) =
      Sizing.trueFalsePositive(counts, s.maxHashesBin, bits, s.hashFunctions)
    (IbfPlan(layout.numBins, bits, s.hashFunctions, s.maxHashesBin, maxFpReal),
      layout)
  }

  def build(spark: SparkSession, df: DataFrame, targetCol: String,
      contentCol: String, p: IbfParams = IbfParams(),
      checkpointDir: Option[String] = None,
      persistShingles: Boolean = false): SketchDb = {
    val (cards, thePlan, layout, shardRows) =
      buildShards(spark, df, targetCol, contentCol, p, checkpointDir,
        twoLevel = false, persistShingles)
    val ibf = InterleavedBloom.empty(layout.numBins, thePlan.bitsPerBin,
      thePlan.numHashes)
    val w = ibf.wordsPerRow
    shardRows.foreach { case (g, blob, _) =>
      val shard = InterleavedBloom.fromBytes(blob)
      var pos = 0
      while (pos < thePlan.bitsPerBin) {
        ibf.words(pos * w + g) = shard.words(pos)
        pos += 1
      }
    }
    new SketchDb(ibf, cards.map(_._1).toArray, cards.map(_._2).toArray,
      layout, p, thePlan)
  }

  /**
   * Two-level build: the SAME single pass also aggregates one coarse
   * union-Bloom per 64-bin group (no third scan over the content, no
   * bin re-extraction); shards are kept as independent per-group filters.
   */
  def buildTwoLevel(spark: SparkSession, df: DataFrame, targetCol: String,
      contentCol: String, p: IbfParams = IbfParams(), groupSize: Int = 64,
      checkpointDir: Option[String] = None,
      persistShingles: Boolean = false): TwoLevelSketchDb = {
    require(groupSize == 64, "interleaved layout fixes the group size at 64")
    val (cards, thePlan, layout, shardRows) =
      buildShards(spark, df, targetCol, contentCol, p, checkpointDir,
        twoLevel = true, persistShingles)
    val nGroups = layout.numGroups
    val shards = new Array[InterleavedBloom](nGroups)
    val coarseBins = new Array[(Int, Bloom)](nGroups)
    shardRows.foreach { case (g, blob, coarseBlob) =>
      // re-window the 64-wide shard to the group's real bin count
      val full = InterleavedBloom.fromBytes(blob)
      val nLocal = math.min(64, layout.numBins - g * 64)
      shards(g) = new InterleavedBloom(nLocal, full.bitsPerBin,
        full.numHashes, full.words)
      coarseBins(g) = (g, Bloom.fromBytes(coarseBlob))
    }
    // groups whose targets routed ZERO hashes (all content empty/filtered)
    // produce no shard row: materialize empty shards so probe/sizeBytes
    // see zero-count bins, matching the flat build's tolerance
    var g = 0
    while (g < nGroups) {
      if (shards(g) == null) {
        val nLocal = math.min(64, layout.numBins - g * 64)
        shards(g) = InterleavedBloom.empty(nLocal, thePlan.bitsPerBin,
          thePlan.numHashes)
      }
      g += 1
    }
    val presentCoarse = coarseBins.toSeq.filter(_ != null)
    val coarse =
      if (presentCoarse.nonEmpty) InterleavedBloom.fromBins(presentCoarse, nGroups)
      else InterleavedBloom.empty(nGroups, 64L, 1)
    new TwoLevelSketchDb(coarse, shards, cards.map(_._1).toArray,
      cards.map(_._2).toArray, layout, p, thePlan)
  }

  /** The shared two-pass pipeline with the pass-2 result left DISTRIBUTED:
    * one row per touched 64-bin group (grp, shard[, coarse]). With
    * `persistShingles` the (target, hs) projection is computed ONCE and
    * persisted (memory-and-disk) between the passes — the Spark analog of
    * the reference's `.min` hash spill files (GanonBuild.cpp:139-182),
    * trading cache space for a second full shingle scan. The returned
    * cleanup releases it AFTER the caller's pass-2 action. */
  private def planAndShard(spark: SparkSession, df: DataFrame,
      targetCol: String, contentCol: String, p: IbfParams,
      checkpointDir: Option[String], twoLevel: Boolean,
      persistShingles: Boolean = false)
      : (Seq[(String, Long)], IbfPlan, BinLayout, DataFrame, () => Unit) = {
    import spark.implicits._

    var hashed = hashedProjection(df, targetCol, contentCol, p)
    if (persistShingles) hashed = hashed.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleanup: () => Unit =
      if (persistShingles) () => { hashed.unpersist(); () } else () => ()

    // ---- pass 1 (or resume) ----
    val tag = paramsTag(p) + s";target=$targetCol;content=$contentCol;two=$twoLevel"
    val cardsDf = checkpointed(spark, checkpointDir, "pass1_cardinalities",
        tag) {
      targetCardinalitiesHashed(hashed, p)
    }
    val cards = cardsDf.as[(String, Long)].collect().sortBy(_._1).toSeq
    val (thePlan, layout) = plan(cards, p)

    // coarse at a LOOSER fp than the fine bins (see coarseSizing): at 0.05
    // the resident top level costs ~6.2 bits/element vs 14.4 at 0.001 —
    // the broadcast shrinks ~2.3x for free
    val (coarseBits, coarseH) =
      if (twoLevel) coarseSizing(cards, layout, p.maxFp) else (64L, 1)

    // ---- pass 2 (or resume): route -> one shard per 64-bin group ----
    val entries = cards.indices.map(i =>
      (cards(i)._1, layout.base(i), layout.split(i)))
    val binsDf = checkpointed(spark, checkpointDir, "pass2_group_shards",
        tag) {
      shardPass(spark, hashed, thePlan, entries,
        layout.numGroups, coarseBits, coarseH, twoLevel)
    }
    (cards, thePlan, layout, binsDf, cleanup)
  }

  /** Coarse-filter sizing for a two-level layout: each group's union is at
    * most the sum of the full hash sets of the targets touching it (span
    * superset); the coarse fp is deliberately looser than the fine one —
    * a coarse FP only costs an extra shard probe, never a result FP. */
  private def coarseSizing(cards: Seq[(String, Long)], layout: BinLayout,
      maxFp: Double): (Long, Int) = {
    val groupLoad = new Array[Long](layout.numGroups)
    cards.indices.foreach { t =>
      val g0 = layout.base(t) / 64
      val g1 = (layout.base(t) + layout.split(t) - 1) / 64
      (g0 to g1).foreach(g => groupLoad(g) += cards(t)._2)
    }
    val maxN = math.max(1L, (groupLoad.max * 1.05).toLong)
    val coarseFp = math.max(0.05, maxFp)
    val m = Bloom.optimalBits(maxN, coarseFp)
    (m, math.min(16, Bloom.optimalHashes(m, maxN)))
  }

  /** In-memory variant: collect the (small) shard rows to the driver. */
  private def buildShards(spark: SparkSession, df: DataFrame,
      targetCol: String, contentCol: String, p: IbfParams,
      checkpointDir: Option[String], twoLevel: Boolean,
      persistShingles: Boolean)
      : (Seq[(String, Long)], IbfPlan, BinLayout, Array[(Int, Array[Byte], Array[Byte])]) = {
    val (cards, thePlan, layout, binsDf, cleanup) =
      planAndShard(spark, df, targetCol, contentCol, p, checkpointDir,
        twoLevel, persistShingles)
    val shardRows = binsDf.collect().map { r =>
      (r.getInt(0), r.getAs[Array[Byte]]("shard"),
        if (twoLevel) r.getAs[Array[Byte]]("coarse") else null)
    }
    cleanup()
    (cards, thePlan, layout, shardRows)
  }

  /**
   * Build DIRECTLY into the sketch store with driver memory bounded by
   * coarse + metadata: each 64-bin group's shard blob is written to
   * `dir/shards/grp_<g>.bin` straight from the executor that aggregated it
   * (the Spark shape of the reference's stream-to-disk filter save,
   * GanonBuild.cpp:251-288 — at its published 299-501 GB database scale,
   * docs/default_databases.md:29-76, a driver-resident assembly would OOM);
   * only the per-group COARSE blobs (the broadcast working set) return to
   * the driver. The build writes a NEW generation (blobs into
   * `shards_v<N>/`, committed by flipping CURRENT last), so a rebuild over
   * an existing store never disturbs readers pinned to the old snapshot
   * and a crash leaves the old generation fully loadable. Returns the lazy
   * db over the store just written — no Array[InterleavedBloom] ever
   * materializes on the driver.
   */
  def buildToStore(spark: SparkSession, df: DataFrame, targetCol: String,
      contentCol: String, dir: String, p: IbfParams = IbfParams(),
      checkpointDir: Option[String] = None,
      persistShingles: Boolean = false,
      commitTag: Option[(String, Long)] = None): LazyTwoLevelDb = {
    val (cards, thePlan, layout, binsDf, cleanup) =
      planAndShard(spark, df, targetCol, contentCol, p, checkpointDir,
        twoLevel = true, persistShingles)
    storeGeneration(spark, dir, p, cards, thePlan, layout, binsDf, cleanup,
      commitTag = commitTag)
  }

  /** The executor-blob-writing tail shared by [[buildToStore]] and
    * [[compactStored]]: claim the next generation, stream every group's
    * (re-windowed) shard blob from the executor that aggregated it, stitch
    * the coarse filter driver-side, commit the manifest. */
  private def storeGeneration(spark: SparkSession, dir: String, p: IbfParams,
      cards: Seq[(String, Long)], thePlan: IbfPlan, layout: BinLayout,
      binsDf: DataFrame, cleanup: () => Unit,
      basedOnGen: Option[Int] = None,
      commitTag: Option[(String, Long)] = None): LazyTwoLevelDb = {
    import spark.implicits._
    val numBins = layout.numBins
    val nGroups = layout.numGroups
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    // When the plan was derived FROM an existing generation (compaction),
    // claim exactly base+1 — claimGeneration's under-lock CURRENT re-read
    // then fails fast if a concurrent update committed after the manifest
    // was read. Claiming CURRENT+1 here instead would silently discard
    // that interleaved commit (lost update: the compacted store would be
    // built from stale metadata). Fresh builds have no base to go stale.
    val gen = basedOnGen match {
      case Some(base) => base + 1
      case None => graft.io.SketchStore
        .currentGeneration(conf.value, dir).getOrElse(0) + 1
    }
    graft.io.SketchStore.claimGeneration(conf.value, dir, gen)
    graft.io.SketchStore.releaseClaimOnFailure(conf.value, dir, gen) {
    val shardDir = graft.io.SketchStore.shardDirOf(dir, gen)
    graft.io.SketchStore.clearClaimedShardDir(conf.value, shardDir)
    // ONE action: write each group's (re-windowed) shard blob executor-side,
    // return only (grp, coarseBlob) — the driver-bounded metadata
    val coarseRows = binsDf
      .select(col("grp"), col("shard"), col("coarse"))
      .as[(Int, Array[Byte], Array[Byte])]
      .mapPartitions { iter =>
        iter.map { case (g, blob, coarseBlob) =>
          val full = InterleavedBloom.fromBytes(blob)
          val nLocal = math.min(64, numBins - g * 64)
          val windowed = new InterleavedBloom(nLocal, full.bitsPerBin,
            full.numHashes, full.words)
          graft.io.SketchStore.writeShardBlob(conf.value, shardDir, g,
            windowed.toBytes)
          (g, coarseBlob)
        }
      }.collect()
    cleanup()
    // untouched groups (all content empty/filtered) get the NoBlobGen
    // sentinel: readers probe them as all-empty bins (both the lazy and
    // eager loaders special-case the sentinel), so NO blob is written —
    // the old driver-serial empty-blob loop was one filesystem round-trip
    // per untouched group, 100k round-trips on a sparse 100k-group store
    val present = coarseRows.map(_._1).toSet
    val shardGens = Array.tabulate(nGroups)(g =>
      if (present(g)) gen else graft.io.SketchStore.NoBlobGen)
    val coarse =
      if (coarseRows.nonEmpty)
        InterleavedBloom.fromBins(
          coarseRows.toSeq.map { case (g, cb) => (g, Bloom.fromBytes(cb)) },
          nGroups)
      else InterleavedBloom.empty(nGroups, 64L, 1)
    val db = new LazyTwoLevelDb(coarse, cards.map(_._1).toArray,
      cards.map(_._2).toArray, layout, p, thePlan, dir, gen, shardGens, conf,
      graft.io.SketchStore.configuredCacheBytes(spark))
    graft.io.SketchStore.writeManifest(spark, db, "two", coarse.toBytes, dir,
      gen, shardGens, commitTag)
    db
    } // releaseClaimOnFailure
  }

  /** The routed shard aggregation over the (target, hs) projection for the
    * given bin-map entries (target, base, split). Returns one row per
    * touched 64-bin group. */
  private def shardPass(spark: SparkSession, hashed: DataFrame,
      thePlan: IbfPlan,
      entries: Seq[(String, Int, Int)], numGroups: Int,
      coarseBits: Long = 64L, coarseH: Int = 1,
      twoLevel: Boolean = false): DataFrame = {
    val layoutDf = broadcast(
      spark.createDataFrame(entries).toDF("target", "base", "split"))
    val parts = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)

    // SPLIT-FREE layouts (every target fits one technical bin — the common
    // case whenever maxHashesBin covers the largest target): a row's whole
    // hash set lands in the single group base/64, so routing is a pure
    // column function — no per-row UDF invoke, tuple allocation or
    // generic explode on the build hot path (guide §4: built-ins over
    // closures). Split layouts keep the per-hash routing UDF below;
    // either path feeds IbfShardAgg, which re-routes per hash anyway.
    // NOTE: no row-level empty-hs filter here — a predicate on `hs` gets
    // pushed through the shingle projection by substitution and re-runs
    // the kernel per row (verified in the physical plan); empty slices
    // are instead ignored by IbfShardAgg and never-fed groups drop via
    // the null-shard filter after the aggregation.
    val anySplit = entries.exists(_._3 > 1)
    val routed =
      if (!anySplit)
        hashed.join(layoutDf, Seq("target"))
          .select(shiftright(col("base"), 6).as("grp"), col("base"),
            col("split"), col("hs"))
      else {
        // per-(row x spanned-group) hash subsets, computed map-side so the
        // one shuffle carries exactly the per-row-deduped hashes
        val route = udf((hs: Array[Long], base: Int, split: Int) => {
          if (hs == null || hs.isEmpty) Array.empty[(Int, Array[Long])]
          else if (split == 1) Array((base / 64, hs))
          else {
            val byGrp = scala.collection.mutable.LinkedHashMap
              .empty[Int, scala.collection.mutable.ArrayBuilder.ofLong]
            var i = 0
            while (i < hs.length) {
              val bin = base + BinLayout.routeBin(hs(i), split)
              byGrp.getOrElseUpdate(bin / 64,
                new scala.collection.mutable.ArrayBuilder.ofLong) += hs(i)
              i += 1
            }
            byGrp.iterator.map { case (g, b) => (g, b.result()) }.toArray
          }
        })
        hashed
          .join(layoutDf, Seq("target"))
          .select(col("base"), col("split"),
            explode(route(col("hs"), col("base"), col("split"))).as("r"))
          .select(col("r._1").as("grp"), col("base"), col("split"),
            col("r._2").as("hs"))
      }
    // enough groups -> exchange-free complete aggregation (one task per
    // group, zero partial blobs); few groups -> map-side partials are
    // cheap (numGroups x shardBytes per task) and keep input parallelism
    // (coalescing the map side to the core count was measured neutral
    // here — lz4 absorbs the duplicate partial buffers — and costs scan
    // balance on SMT-capped cores, so input parallelism wins)
    val pre =
      if (numGroups >= parts) routed.repartition(numGroups, col("grp"))
      else routed
    val aggCols =
      GraftFunctions.ibfShard(col("grp"), col("base"), col("split"),
        col("hs"), thePlan.bitsPerBin, thePlan.numHashes).as("shard") ::
      (if (twoLevel)
        List(GraftFunctions.bloomSketch(col("hs"), coarseBits, coarseH)
          .as("coarse"))
       else Nil)
    // a null shard marks a group that never received a non-empty slice
    // (all its targets' content empty/filtered): drop it, preserving the
    // untouched-group semantics (NoBlobGen sentinel / implicit empty)
    pre.groupBy("grp").agg(aggCols.head, aggCols.tail: _*)
      .filter(col("shard").isNotNull)
  }

  /**
   * Incremental update of a built db (capability of `ganon update`,
   * reference src/ganon/build_update.py:157, tests/ganon/integration/
   * test_update.py): add new targets / new content and drop targets
   * WITHOUT rebuilding untouched bins.
   *
   * The plan (bitsPerBin, numHashes, maxHashesBin) is frozen: new targets
   * get fresh technical bins appended after the current layout (split at
   * the same capacity), removed targets have their bin columns zeroed
   * (bins stay allocated — compaction would re-route every surviving
   * hash), and rows for EXISTING targets route into their existing bins.
   * Only the touched 64-bin groups are re-aggregated; the untouched
   * filter columns are copied bit-for-bit. If an existing target grows
   * past its planned capacity its realized FP drifts above budget — the
   * returned plan's expectedMaxFp reports the drift; rebuild to recover.
   */
  def update(spark: SparkSession, db: SketchDb, addDf: DataFrame,
      targetCol: String, contentCol: String,
      removeTargets: Seq[String] = Nil): SketchDb = {
    import spark.implicits._
    val p = db.params
    val removeSet = removeTargets.toSet
    val unknown = removeSet.filterNot(db.targetIndex.contains)
    require(unknown.isEmpty,
      s"removeTargets not in the db: ${unknown.toSeq.sorted.mkString(", ")}")

    // pass 1 on the delta only
    val addCards =
      if (addDf == null) Seq.empty[(String, Long)]
      else targetCardinalities(addDf, targetCol, contentCol, p)
        .as[(String, Long)].collect().sortBy(_._1).toSeq
    val (existingAdds, newAdds) =
      addCards.partition(c => db.targetIndex.contains(c._1))
    require(existingAdds.forall(c => !removeSet.contains(c._1)) &&
      newAdds.forall(c => !removeSet.contains(c._1)),
      "cannot add and remove the same target")

    // surviving + new layout entries (bases of survivors are untouched)
    val survivors = db.targets.indices.filterNot(i => removeSet(db.targets(i)))
    var nextBin = db.layout.numBins
    val newEntries = newAdds.map { case (t, c) =>
      val split = math.max(1L, (math.max(1L, c) + db.plan.maxHashesBin - 1) /
        db.plan.maxHashesBin).toInt
      val e = (t, nextBin, split)
      nextBin += split
      e
    }
    val targets =
      (survivors.map(db.targets) ++ newAdds.map(_._1)).toArray
    val addByTarget = existingAdds.toMap
    val counts =
      (survivors.map(i => db.targetHashes(i) +
        addByTarget.getOrElse(db.targets(i), 0L)) ++ newAdds.map(_._2)).toArray
    val bases =
      (survivors.map(db.layout.base) ++ newEntries.map(_._2)).toArray
    val splits =
      (survivors.map(db.layout.split) ++ newEntries.map(_._3)).toArray
    val layout = BinLayout(bases, splits, nextBin)

    // re-stride the old filter into the (possibly wider) new bin space
    val ibf = InterleavedBloom.empty(nextBin, db.plan.bitsPerBin,
      db.plan.numHashes)
    val wOld = db.ibf.wordsPerRow
    val wNew = ibf.wordsPerRow
    var pos = 0L
    while (pos < db.plan.bitsPerBin) {
      var g = 0
      while (g < wOld) {
        ibf.words((pos * wNew + g).toInt) = db.ibf.words((pos * wOld + g).toInt)
        g += 1
      }
      pos += 1
    }
    // zero removed targets' bin columns
    removeSet.foreach { t =>
      val i = db.targetIndex(t)
      var b = db.layout.base(i)
      val end = b + db.layout.split(i)
      while (b < end) {
        val word = b >>> 6
        val mask = ~(1L << (b & 63))
        var p2 = 0L
        while (p2 < db.plan.bitsPerBin) {
          ibf.words((p2 * wNew + word).toInt) &= mask
          p2 += 1
        }
        b += 1
      }
    }
    // shard-aggregate the delta and OR the touched group columns in
    if (addDf != null && addCards.nonEmpty) {
      val entries = existingAdds.map { case (t, _) =>
        val i = db.targetIndex(t)
        (t, db.layout.base(i), db.layout.split(i))
      } ++ newEntries
      val touched = shardPass(spark,
        hashedProjection(addDf, targetCol, contentCol, p),
        db.plan, entries, layout.numGroups)
        .collect().map(r => (r.getInt(0), r.getAs[Array[Byte]]("shard")))
      touched.foreach { case (g, blob) =>
        val shard = InterleavedBloom.fromBytes(blob)
        var p2 = 0L
        while (p2 < db.plan.bitsPerBin) {
          ibf.words((p2 * wNew + g).toInt) |= shard.words(p2.toInt)
          p2 += 1
        }
      }
    }
    val (maxFpReal, _) = Sizing.trueFalsePositive(
      counts.map(math.max(1L, _)), db.plan.maxHashesBin, db.plan.bitsPerBin,
      db.plan.numHashes)
    new SketchDb(ibf, targets, counts, layout, p,
      db.plan.copy(numBins = nextBin, expectedMaxFp = maxFpReal))
  }

  /**
   * Incremental update of a STORED two-level db — the O(delta) case the
   * shard layout was built for (`ganon update` on the layout you actually
   * run at scale; reference src/ganon/build_update.py:157): only the
   * 64-bin groups touched by added/removed targets have their
   * `grp_<g>.bin` blobs rewritten; untouched shards are never read.
   *
   * Same frozen-plan semantics as [[update]]: new targets get fresh bins
   * appended (split at the planned capacity), removed targets' bin columns
   * are zeroed in their shard blobs, existing targets' new content routes
   * into their existing bins. Removal cannot delete from the COARSE filter
   * (a Bloom has no removal) — coarse counts stay an upper bound, so
   * pruning remains lossless and removed groups are merely probed once
   * before their zeroed fine bins report nothing.
   *
   * Work split: the delta aggregation is distributed; each touched group's
   * mask + OR-merge + rewrite happens on the executor that aggregated it,
   * and removal-ONLY groups (masked but receiving no delta) are masked in
   * a parallel executor pass — removing a mega-target split across
   * thousands of groups never funnels blob I/O through the driver. The
   * manifest commits last.
   *
   * SNAPSHOT ISOLATION: the update reads generation N's blobs and writes
   * only `shards_v<N+1>/`, flipping CURRENT after the new manifest lands —
   * committed blobs are never mutated. A LazyTwoLevelDb loaded before (or
   * DURING) the update keeps serving generation N's exact bits; loads
   * after the flip see N+1. Concurrent updates are excluded by the
   * generation lock (the second claimant fails fast). A crash mid-update
   * leaves CURRENT at N — the store stays loadable and correct.
   */
  def updateStored(spark: SparkSession, dir: String, addDf: DataFrame,
      targetCol: String, contentCol: String,
      removeTargets: Seq[String] = Nil,
      persistShingles: Boolean = false,
      commitTag: Option[(String, Long)] = None): LazyTwoLevelDb = {
    import spark.implicits._
    val db0 = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    val p = db0.params
    val removeSet = removeTargets.toSet
    val unknown = removeSet.filterNot(db0.targetIndex.contains)
    require(unknown.isEmpty,
      s"removeTargets not in the db: ${unknown.toSeq.sorted.mkString(", ")}")

    // pass 1 on the delta only; the same projection feeds the shard pass
    // (one delta scan, optionally persisted — see planAndShard's note)
    val hashedOpt = Option(addDf).map { d =>
      val h = hashedProjection(d, targetCol, contentCol, p)
      if (persistShingles)
        h.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else h
    }
    val addCards = hashedOpt
      .map(h => targetCardinalitiesHashed(h, p)
        .as[(String, Long)].collect().sortBy(_._1).toSeq)
      .getOrElse(Seq.empty[(String, Long)])
    val (existingAdds, newAdds) =
      addCards.partition(c => db0.targetIndex.contains(c._1))
    require(addCards.forall(c => !removeSet.contains(c._1)),
      "cannot add and remove the same target")

    // frozen-plan layout append (bases of survivors untouched; removed
    // targets' bins stay allocated as masked holes)
    val survivors = db0.targets.indices.filterNot(i => removeSet(db0.targets(i)))
    var nextBin = db0.layout.numBins
    val newEntries = newAdds.map { case (t, c) =>
      val split = math.max(1L, (math.max(1L, c) + db0.plan.maxHashesBin - 1) /
        db0.plan.maxHashesBin).toInt
      val e = (t, nextBin, split)
      nextBin += split
      e
    }
    val targets =
      (survivors.map(db0.targets) ++ newAdds.map(_._1)).toArray
    val addByTarget = existingAdds.toMap
    val counts =
      (survivors.map(i => db0.targetHashes(i) +
        addByTarget.getOrElse(db0.targets(i), 0L)) ++ newAdds.map(_._2)).toArray
    val bases =
      (survivors.map(db0.layout.base) ++ newEntries.map(_._2)).toArray
    val splits =
      (survivors.map(db0.layout.split) ++ newEntries.map(_._3)).toArray
    val layout = BinLayout(bases, splits, nextBin)
    val nGroupsNew = layout.numGroups
    val conf = new SerializableHadoopConf(spark.sparkContext.hadoopConfiguration)
    val hconf = spark.sparkContext.hadoopConfiguration

    // claim the NEXT generation and write only into its shard dir; the old
    // generation's blobs are read-only inputs (snapshot isolation)
    val gen0 = db0.generation
    val gens0 = db0.shardGens
    val oldNumGroups = db0.layout.numGroups
    val gen = gen0 + 1
    graft.io.SketchStore.claimGeneration(hconf, dir, gen)
    graft.io.SketchStore.releaseClaimOnFailure(hconf, dir, gen) {
    val newShardDir = graft.io.SketchStore.shardDirOf(dir, gen)
    graft.io.SketchStore.clearClaimedShardDir(hconf, newShardDir)

    // removal = per-group bin-column masks over the OLD layout, applied
    // wherever the old blob is first read (no driver-side blob I/O)
    val maskRanges: Map[Int, Array[(Int, Int)]] = {
      val m = scala.collection.mutable.Map
        .empty[Int, scala.collection.mutable.ArrayBuffer[(Int, Int)]]
      removeSet.toSeq.sorted.foreach { t =>
        val i = db0.targetIndex(t)
        val b0 = db0.layout.base(i)
        val b1 = b0 + db0.layout.split(i)
        (b0 / 64 to (b1 - 1) / 64).foreach { g =>
          m.getOrElseUpdate(g,
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((math.max(0, b0 - g * 64), math.min(64, b1 - g * 64)))
        }
      }
      m.map { case (k, v) => k -> v.toArray }.toMap
    }
    val maskB = spark.sparkContext.broadcast(maskRanges)

    // 1. additions: shard-aggregate the delta; each touched group's
    //    executor reads the OLD blob (pinned generation), applies its
    //    removal mask, ORs the delta in, and writes the NEW generation's
    //    blob; only coarse deltas return to the driver
    val numBinsNew = nextBin
    val bitsPerBin = db0.plan.bitsPerBin
    val coarseBits = db0.coarse.bitsPerBin
    val coarseH = db0.coarse.numHashes
    val touchedCoarse: Array[(Int, Array[Byte])] =
      if (hashedOpt.nonEmpty && addCards.nonEmpty) {
        val entries = existingAdds.map { case (t, _) =>
          val i = db0.targetIndex(t)
          (t, db0.layout.base(i), db0.layout.split(i))
        } ++ newEntries
        shardPass(spark, hashedOpt.get,
          db0.plan, entries,
          nGroupsNew, coarseBits, coarseH, twoLevel = true)
          .select(col("grp"), col("shard"), col("coarse"))
          .as[(Int, Array[Byte], Array[Byte])]
          .mapPartitions { iter =>
            val masks = maskB.value
            iter.map { case (g, blob, coarseBlob) =>
              val delta = InterleavedBloom.fromBytes(blob)
              val nLocal = math.min(64, numBinsNew - g * 64)
              // <=64-bin shards always carry bitsPerBin words, so widening
              // the group's bin count (appends extending the last old
              // group) is a pure header change
              if (g < oldNumGroups)
                graft.io.SketchStore.readShardBlob(conf.value, dir, gens0, g)
                  .foreach { old =>
                    masks.get(g).foreach(_.foreach { case (lo, hi) =>
                      old.zeroBins(lo, hi)
                    })
                    var i = 0
                    while (i < delta.words.length) {
                      delta.words(i) |= old.words(i); i += 1
                    }
                  }
              graft.io.SketchStore.writeShardBlob(conf.value, newShardDir, g,
                new InterleavedBloom(nLocal, delta.bitsPerBin,
                  delta.numHashes, delta.words).toBytes)
              (g, coarseBlob)
            }
          }.collect()
      } else Array.empty
    if (persistShingles) hashedOpt.foreach(_.unpersist())

    // 2. removal-ONLY groups (masked, no delta): mask + rewrite in a
    //    parallel executor pass — a mega-target's thousands of touched
    //    groups distribute instead of serializing through the driver
    val touchedSet = touchedCoarse.map(_._1).toSet
    val removalOnly = maskRanges.keysIterator.filterNot(touchedSet).toSeq.sorted
    if (removalOnly.nonEmpty) {
      val parts = math.min(removalOnly.size,
        math.max(1, spark.sparkContext.defaultParallelism))
      spark.sparkContext.parallelize(removalOnly, parts).foreach { g =>
        graft.io.SketchStore.readShardBlob(conf.value, dir, gens0, g)
          .foreach { sh =>
            maskB.value(g).foreach { case (lo, hi) => sh.zeroBins(lo, hi) }
            graft.io.SketchStore.writeShardBlob(conf.value, newShardDir, g,
              sh.toBytes)
          }
      }
    }
    // both consumers of the mask (the delta pass, collected above, and the
    // removal-only pass) have completed — destroy the broadcast now rather
    // than leaking one per update on a long-lived session
    maskB.destroy()

    // 3. per-group generation pointers: groups whose blob was WRITTEN this
    //    generation point at it; untouched groups keep their old pointers
    //    (the O(delta) property — nothing is copied or hard-linked)
    val removalOnlySet = removalOnly.toSet
    val gens1 = Array.tabulate(nGroupsNew) { g =>
      if (touchedSet(g)) gen // delta pass always writes these blobs
      else if (removalOnlySet(g))
        // the removal-only pass writes a blob ONLY if the old pointer had
        // one (readShardBlob's Option is empty for the sentinel) — a
        // sentinel group must KEEP its sentinel, or the pointer would name
        // a blob that was never written and every later read fails fast
        // with a bogus "gc'd or corrupt" diagnosis
        (if (gens0(g) == graft.io.SketchStore.NoBlobGen)
          graft.io.SketchStore.NoBlobGen
        else gen)
      else if (g < gens0.length) gens0(g)
      // appended group with no delta rows: no blob on disk — the sentinel
      // says so explicitly, so readers probe it as empty instead of
      // mistaking it for a lost blob (which fails fast)
      else graft.io.SketchStore.NoBlobGen
    }

    // 4. coarse: re-stride to the (possibly wider) new group count, OR in
    //    the touched groups' delta unions
    val coarseNew = restride(db0.coarse, nGroupsNew)
    touchedCoarse.foreach { case (g, cb) =>
      coarseNew.orBin(g, Bloom.fromBytes(cb))
    }

    // 5. manifest + CURRENT flip LAST (the commit point)
    val (maxFpReal, _) = Sizing.trueFalsePositive(
      counts.map(math.max(1L, _)), db0.plan.maxHashesBin, bitsPerBin,
      db0.plan.numHashes)
    val db = new LazyTwoLevelDb(coarseNew, targets, counts, layout, p,
      db0.plan.copy(numBins = nextBin, expectedMaxFp = maxFpReal),
      dir, gen, gens1, conf,
      graft.io.SketchStore.configuredCacheBytes(spark))
    graft.io.SketchStore.writeManifest(spark, db, "two", coarseNew.toBytes,
      dir, gen, gens1, commitTag)
    db
    } // releaseClaimOnFailure
  }

  /** Degradation report of a stored two-level db after update cycles:
    * `holeFrac` = fraction of allocated technical bins that are masked
    * holes (removed targets' bins stay allocated — updateStored cannot
    * re-route survivors), `fpDrift` = realized expectedMaxFp over the
    * configured budget (grown targets exceed their planned capacity), and
    * whether either crosses its threshold — the [[compactStored]] trigger.
    * Metadata-only: no blob is read. */
  final case class CompactionStats(holeFrac: Double, fpDrift: Double,
      advised: Boolean)

  def compactionAdvised(spark: SparkSession, dir: String,
      holeFracMax: Double = 0.3, fpDriftMax: Double = 2.0): CompactionStats = {
    val m = graft.io.SketchStore.readManifest(spark, dir)
    val live = m.layout.split.map(_.toLong).sum
    val holeFrac = 1.0 - live.toDouble / math.max(1, m.layout.numBins)
    val fpDrift = m.plan.expectedMaxFp / m.params.maxFp
    CompactionStats(holeFrac, fpDrift,
      holeFrac > holeFracMax || fpDrift > fpDriftMax)
  }

  /**
   * Compact a stored two-level db (capability of the reference's layout
   * rebuild on update, src/ganon/build_update.py:157): squeeze the masked
   * holes removed targets leave behind, re-fit bin capacity to the
   * CURRENT cardinalities (clearing any expectedMaxFp drift from grown
   * targets), and re-derive the coarse filter from the surviving hash
   * sets (a Bloom cannot forget, so coarse staleness otherwise grows
   * unboundedly across update cycles — SURVEY §2; [[compactionAdvised]]
   * is the trigger). Pass 1 is SKIPPED — the sizing reuses the manifest's
   * per-target cardinalities — so compaction costs ONE content scan (the
   * re-shard), half a fresh build. The result commits as the next
   * generation of the same store: pinned readers keep their snapshot,
   * and [[graft.io.SketchStore.gcGenerations]] reclaims the old layout.
   *
   * `df` must hold the content of exactly the store's CURRENT targets
   * (`targetCol` matching the manifest's target set): rows for unknown
   * targets are ignored by the shard rout(e)ing join, and a target absent
   * from `df` would come back with empty bins.
   */
  def compactStored(spark: SparkSession, dir: String, df: DataFrame,
      targetCol: String, contentCol: String,
      persistShingles: Boolean = false): LazyTwoLevelDb =
    compactStoredFrom(spark, dir, df, targetCol, contentCol,
      graft.io.SketchStore.readManifest(spark, dir), persistShingles)

  /** [[compactStored]] body, split at the manifest read so the
    * stale-manifest race (an update committing between the read and the
    * generation claim) is deterministically testable. */
  private[graft] def compactStoredFrom(spark: SparkSession, dir: String,
      df: DataFrame, targetCol: String, contentCol: String,
      m: graft.io.SketchStore.Manifest,
      persistShingles: Boolean = false): LazyTwoLevelDb = {
    require(m.layoutKind == "two", s"not a two-level store: ${m.layoutKind}")
    val p = m.params
    // fresh plan from the manifest's survivor cardinalities: holes gone,
    // capacity re-fit, split counts re-derived
    val cards = m.targets.zip(m.counts).sortBy(_._1).toSeq
    val (thePlan, layout) = plan(cards, p)
    val (coarseBits, coarseH) = coarseSizing(cards, layout, p.maxFp)
    var hashed = hashedProjection(df, targetCol, contentCol, p)
    if (persistShingles) hashed = hashed.persist(
      org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cleanup: () => Unit =
      if (persistShingles) () => { hashed.unpersist(); () } else () => ()
    val entries = cards.indices.map(i =>
      (cards(i)._1, layout.base(i), layout.split(i)))
    val binsDf = shardPass(spark, hashed, thePlan, entries,
      layout.numGroups, coarseBits, coarseH, twoLevel = true)
    storeGeneration(spark, dir, p, cards, thePlan, layout, binsDf, cleanup,
      basedOnGen = Some(m.generation))
  }

  /** Copy an interleaved filter into a wider bin space (same bitsPerBin,
    * bin columns preserved; new columns zero). */
  private def restride(src: InterleavedBloom, newNumBins: Int): InterleavedBloom = {
    val out = InterleavedBloom.empty(newNumBins, src.bitsPerBin, src.numHashes)
    val wOld = src.wordsPerRow
    val wNew = out.wordsPerRow
    var pos = 0L
    while (pos < src.bitsPerBin) {
      var g = 0
      while (g < wOld) {
        out.words((pos * wNew + g).toInt) = src.words((pos * wOld + g).toInt)
        g += 1
      }
      pos += 1
    }
    out
  }

  /** Resume guard: a checkpoint is only valid for the PARAMS that produced
    * it. The fingerprint is written next to the data and checked on
    * resume — a changed maxFp/k/w/seed recomputes instead of silently
    * stitching stale shards into a differently-sized plan. (Same INPUT
    * data per checkpointDir remains the caller's contract, as with any
    * path-keyed checkpoint.) */
  private def paramsTag(p: IbfParams): String =
    s"k=${p.k};w=${p.w};seed=${p.seed};maxFp=${p.maxFp};hllP=${p.hllP};" +
      s"minLen=${p.minContentLen};mode=${p.sizingMode}"

  private def checkpointed(spark: SparkSession, dir: Option[String],
      stage: String, tag: String)(make: => DataFrame): DataFrame = dir match {
    case None => make
    case Some(d) =>
      val path = s"$d/$stage"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val ok = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
      val tagPath = new org.apache.hadoop.fs.Path(path + "/_PARAMS")
      val tagMatches = fs.exists(tagPath) && {
        val in = fs.open(tagPath)
        try {
          val buf = new Array[Byte](fs.getFileStatus(tagPath).getLen.toInt)
          in.readFully(0, buf)
          new String(buf, java.nio.charset.StandardCharsets.UTF_8) == tag
        } finally in.close()
      }
      if (!fs.exists(ok) || !tagMatches) {
        make.write.mode("overwrite").parquet(path)
        val out = fs.create(tagPath, true)
        try out.write(tag.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        finally out.close()
      }
      spark.read.parquet(path)
  }
}
