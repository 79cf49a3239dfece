package graft.build

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashing
import graft.core.sketch.{Bloom, InterleavedBloom}
import graft.spark.GraftFunctions

/** Shingling + filter-sizing parameters (role of ganon's IBFConfig,
  * src/utils/include/utils/IBFConfig.hpp:5-41). */
final case class IbfParams(
    k: Int = 19,
    w: Int = 31, // reference defaults: -k 19 -w 31 (config.py); w>k shrinks
                 // the per-row hash set ~2/(w-k+2) with the same guarantees
    seed: Long = Hashing.DefaultSeed,
    maxFp: Double = 0.01,
    hllP: Int = 14,
    minContentLen: Int = 0)

/** Driver-side sizing result (role of ganon's optimal_hashes planner,
  * src/ganon-build/GanonBuild.cpp:428-616). */
final case class IbfPlan(
    numBins: Int,
    bitsPerBin: Long,
    numHashes: Int,
    maxBinHashes: Long,
    expectedMaxFp: Double)

/** Broadcastable probe side of the classify join: flat IBF or the
  * two-level (HIBF-like) layout — Classify is layout-agnostic. */
trait ProbeDb extends Serializable {
  def targets: Array[String]
  def targetHashes: Array[Long]
  def params: IbfParams
  def plan: IbfPlan
  /** Expected single-probe FPR of bin `bin` given its load. */
  def binFpr(bin: Int): Double
  /** Count hash membership per bin into `counts` (len >= targets.length).
    * `cutoff` is the per-read threshold known BEFORE probing — two-level
    * layouts use it to prune whole groups (the reference's HIBF pushdown,
    * hierarchical_interleaved_bloom_filter.hpp:433-460). */
  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit
  def sizeBytes: Long
  @transient lazy val targetIndex: Map[String, Int] = targets.zipWithIndex.toMap
}

/**
 * The flat sketch database: one interleaved Bloom over all bins + bin
 * metadata (role of ganon's serialized (IBFConfig, hashes_count, bin_map,
 * ibf) — src/ganon-build/GanonBuild.cpp:251-288).
 */
final class SketchDb(
    val ibf: InterleavedBloom,
    val targets: Array[String],       // bin index -> target name
    val targetHashes: Array[Long],    // bin index -> estimated distinct hashes
    val params: IbfParams,
    val plan: IbfPlan) extends ProbeDb {

  def binFpr(bin: Int): Double =
    Bloom.falsePositiveRate(plan.bitsPerBin, plan.numHashes, targetHashes(bin))

  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit =
    ibf.bulkCount(hashes, counts)

  def sizeBytes: Long = ibf.sizeBytes
}

/**
 * Two-level (HIBF-like) layout: a coarse IBF over bin GROUPS prunes which
 * fine shards to probe. The coarse bin of group g contains the UNION of
 * its member bins' hashes, so coarseCount(g) >= count(any member) — if the
 * group's coarse count is below the read's cutoff, every member bin is
 * below it too and the whole shard is skipped with zero false negatives
 * (FPs only inflate coarse counts, which only costs pruning power).
 * Executor memory: only the coarse IBF must stay hot; shards are
 * independent blobs (loadable lazily from the sketch store at real scale).
 */
final class TwoLevelSketchDb(
    val coarse: InterleavedBloom,          // bins = groups
    val shards: Array[InterleavedBloom],   // one fine IBF per group
    val groupBins: Array[Array[Int]],      // group -> global bin indices
    val targets: Array[String],
    val targetHashes: Array[Long],
    val params: IbfParams,
    val plan: IbfPlan) extends ProbeDb {

  def binFpr(bin: Int): Double =
    Bloom.falsePositiveRate(plan.bitsPerBin, plan.numHashes, targetHashes(bin))

  def probe(hashes: Array[Long], counts: Array[Int], cutoff: Int): Unit = {
    val gc = new Array[Int](shards.length)
    coarse.bulkCount(hashes, gc)
    var g = 0
    while (g < shards.length) {
      if (gc(g) >= cutoff) {
        val local = new Array[Int](groupBins(g).length)
        shards(g).bulkCount(hashes, local)
        var i = 0
        while (i < local.length) {
          counts(groupBins(g)(i)) += local(i)
          i += 1
        }
      }
      g += 1
    }
  }

  def sizeBytes: Long = coarse.sizeBytes + shards.map(_.sizeBytes).sum
}

/**
 * Two-pass distributed build (Spark shape of ganon-build's two thread
 * pools, src/ganon-build/GanonBuild.cpp:752-921):
 *
 *   pass 1  groupBy(target).agg(hll(shingles))  -> per-bin cardinalities
 *   driver  size (bitsPerBin, numHashes) under the maxFp budget
 *   pass 2  groupBy(target).agg(bloom(shingles)) -> per-bin Bloom bitsets
 *   driver  interleave bins into the broadcastable IBF
 *
 * Both passes are map-side partial-aggregated (sketch merge is
 * associative), so mega-target skew costs no shuffle blowup: each task
 * ships one partial sketch per (target x partition), not one row per hash.
 *
 * Checkpointing: with `checkpointDir`, each pass persists its result
 * parquet and is skipped on re-run (resumability per the north rule;
 * role of ganon's save_state markers, src/ganon/util.py:138-143).
 */
object SketchBuild {

  /** Pass-1 result: (target, n_hashes estimate). */
  def targetCardinalities(df: DataFrame, targetCol: String, contentCol: String,
      p: IbfParams): DataFrame = {
    val base =
      if (p.minContentLen > 0) df.filter(length(col(contentCol)) >= p.minContentLen)
      else df
    base
      .select(col(targetCol).as("target"),
        GraftFunctions.shingles(col(contentCol), p.k, p.w, p.seed).as("hs"))
      .groupBy("target")
      .agg(GraftFunctions.hllCount(col("hs"), p.hllP).as("n_hashes"))
  }

  /** Driver-side sizing: one (m,h) for all bins, sized for the largest bin
    * so every bin's FPR <= maxFp (ganon "max" mode). */
  def plan(cards: Seq[(String, Long)], p: IbfParams): IbfPlan = {
    require(cards.nonEmpty, "no targets to build")
    // 5% headroom over the HLL estimate (its 1.04/sqrt(m) error could
    // otherwise undersize the filter and break the FP budget)
    val maxN = math.max(1L, (cards.map(_._2).max * 1.05).toLong)
    val m = Bloom.optimalBits(maxN, p.maxFp) // next pow2 (masked probing)
    // hash count chosen for the UN-rounded size: fewer probes per hash,
    // and with the larger rounded m the FPR only drops below budget
    val h = math.min(16,
      Bloom.optimalHashes(Bloom.optimalBitsExact(maxN, p.maxFp), maxN))
    IbfPlan(cards.length, m, h, maxN, Bloom.falsePositiveRate(m, h, maxN))
  }

  def build(spark: SparkSession, df: DataFrame, targetCol: String,
      contentCol: String, p: IbfParams = IbfParams(),
      checkpointDir: Option[String] = None): SketchDb = {
    import spark.implicits._

    // ---- pass 1 (or resume) ----
    val cardsDf = checkpointed(spark, checkpointDir, "pass1_cardinalities") {
      targetCardinalities(df, targetCol, contentCol, p)
    }
    val cards = cardsDf.as[(String, Long)].collect().sortBy(_._1).toSeq
    val thePlan = plan(cards, p)

    // ---- pass 2 (or resume) ----
    // Dense Bloom partials are far larger than the raw hash arrays, so the
    // default map-side-partial plan would ship |partitions| x |targets| x m
    // bits through the exchange. Instead: repartition rows by (target, salt)
    // FIRST (shuffles only the cheap hash arrays), so every (target, salt)
    // bin is built by exactly one task and no partial merge ever serializes.
    // Salting splits mega-targets across tasks (the reference splits
    // over-full targets across technical bins the same way,
    // GanonBuild.cpp:619-653); sub-blooms OR-merge on the driver.
    val parts = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val totalHashes = math.max(1L, cards.map(_._2).sum)
    val fairShare = math.max(1L, totalHashes / parts)
    val salts = cards.map { case (t2, n) =>
      (t2, math.min(parts.toLong, math.max(1L, (n + fairShare - 1) / fairShare)).toInt)
    }
    val saltsDf = spark.createDataFrame(salts).toDF("target", "n_salts")
    val binsDf = checkpointed(spark, checkpointDir, "pass2_bloom_bins") {
      val base =
        if (p.minContentLen > 0) df.filter(length(col(contentCol)) >= p.minContentLen)
        else df
      base
        .select(col(targetCol).as("target"), col(contentCol).as("__content"))
        .join(broadcast(saltsDf), Seq("target"))
        .withColumn("salt", pmod(xxhash64(col("__content")), col("n_salts")))
        // repartition the RAW content (compresses ~6x smaller than the hash
        // arrays); shingles are computed after the exchange, in the same
        // stage as the aggregation
        .repartition(parts, col("target"), col("salt"))
        .select(col("target"), col("salt"),
          GraftFunctions.shingles(col("__content"), p.k, p.w, p.seed).as("hs"))
        .groupBy("target", "salt")
        .agg(GraftFunctions.bloomSketch(col("hs"),
          thePlan.bitsPerBin, thePlan.numHashes).as("bloom"))
    }
    assemble(binsDf, cards, p, thePlan)
  }

  /** OR-merge salted sub-blooms per target, then interleave; bin order =
    * sorted target names (deterministic across runs & partitionings). */
  def assemble(binsDf: DataFrame, cards: Seq[(String, Long)], p: IbfParams,
      thePlan: IbfPlan): SketchDb = {
    val targets = cards.map(_._1).toArray
    val index = targets.zipWithIndex.toMap
    val counts = cards.map(_._2).toArray
    val merged = new scala.collection.mutable.HashMap[Int, Bloom]()
    binsDf.select("target", "bloom").collect().foreach { r =>
      val i = index(r.getString(0))
      val b = Bloom.fromBytes(r.getAs[Array[Byte]](1))
      merged.get(i) match {
        case Some(acc) => acc.merge(b)
        case None      => merged.put(i, b)
      }
    }
    val ibf = InterleavedBloom.fromBins(merged.toSeq, targets.length)
    new SketchDb(ibf, targets, counts, p, thePlan)
  }

  /**
   * Two-level build: fine per-target bins grouped `groupSize` at a time
   * under a coarse union-Bloom layer (the HIBF shape, re-derived). One
   * extra aggregation pass over the same repartitioned content computes
   * the coarse bins (their union cardinality needs a larger filter).
   */
  def buildTwoLevel(spark: SparkSession, df: DataFrame, targetCol: String,
      contentCol: String, p: IbfParams = IbfParams(), groupSize: Int = 64,
      checkpointDir: Option[String] = None): TwoLevelSketchDb = {
    import spark.implicits._
    val flat = build(spark, df, targetCol, contentCol, p, checkpointDir)
    val targets = flat.targets
    val nGroups = (targets.length + groupSize - 1) / groupSize
    val groupBins = Array.tabulate(nGroups)(g =>
      (g * groupSize until math.min((g + 1) * groupSize, targets.length)).toArray)
    val groupOfTarget = targets.indices
      .map(i => targets(i) -> (i / groupSize)).toMap

    // coarse sizing: worst-case union = sum of member cardinalities
    val groupN = groupBins.map(_.map(flat.targetHashes).sum)
    val coarseMaxN = math.max(1L, (groupN.max * 1.05).toLong)
    val coarseM = Bloom.optimalBits(coarseMaxN, p.maxFp)
    val coarseH = math.min(16,
      Bloom.optimalHashes(Bloom.optimalBitsExact(coarseMaxN, p.maxFp), coarseMaxN))

    val parts = math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions", "32").toInt)
    val g2 = spark.createDataFrame(groupOfTarget.toSeq).toDF("target", "grp")
    val coarseRows = checkpointed(spark, checkpointDir, "pass3_coarse_bins") {
      df.select(col(targetCol).as("target"), col(contentCol).as("__content"))
        .join(broadcast(g2), Seq("target"))
        .withColumn("salt", pmod(xxhash64(col("__content")), lit(parts.toLong)))
        .repartition(parts, col("grp"), col("salt"))
        .select(col("grp"), col("salt"),
          GraftFunctions.shingles(col("__content"), p.k, p.w, p.seed).as("hs"))
        .groupBy("grp", "salt")
        .agg(GraftFunctions.bloomSketch(col("hs"), coarseM, coarseH).as("bloom"))
    }
    val coarseMerged = new scala.collection.mutable.HashMap[Int, Bloom]()
    coarseRows.select("grp", "bloom").collect().foreach { r =>
      val g = r.getInt(0)
      val b = Bloom.fromBytes(r.getAs[Array[Byte]](1))
      coarseMerged.get(g) match {
        case Some(acc) => acc.merge(b)
        case None      => coarseMerged.put(g, b)
      }
    }
    val coarse = InterleavedBloom.fromBins(coarseMerged.toSeq, nGroups)

    // fine shards: re-slice the flat IBF's source bins per group. We rebuild
    // them from the flat IBF directly: probe layout is identical, so we
    // extract each bin's column back into a Bloom and re-interleave locally.
    val shards = groupBins.map { bins =>
      val local = bins.zipWithIndex.map { case (globalBin, li) =>
        (li, extractBin(flat.ibf, globalBin))
      }
      InterleavedBloom.fromBins(local.toSeq, bins.length)
    }
    new TwoLevelSketchDb(coarse, shards, groupBins, targets,
      flat.targetHashes, p, flat.plan)
  }

  /** Pull one bin's bit-column out of an interleaved filter as a Bloom. */
  private def extractBin(ibf: InterleavedBloom, bin: Int): Bloom = {
    val b = Bloom.empty(ibf.bitsPerBin, ibf.numHashes)
    val word = bin >>> 6
    val bit = 1L << (bin & 63)
    var p = 0L
    while (p < ibf.bitsPerBin) {
      if ((ibf.words((p * ibf.wordsPerRow + word).toInt) & bit) != 0L)
        b.words((p >>> 6).toInt) |= (1L << (p & 63))
      p += 1
    }
    b
  }

  private def checkpointed(spark: SparkSession, dir: Option[String],
      stage: String)(make: => DataFrame): DataFrame = dir match {
    case None => make
    case Some(d) =>
      val path = s"$d/$stage"
      val fs = org.apache.hadoop.fs.FileSystem.get(
        new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
      val ok = new org.apache.hadoop.fs.Path(path + "/_SUCCESS")
      if (!fs.exists(ok)) make.write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
  }
}
