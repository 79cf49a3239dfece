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

/**
 * The broadcastable sketch database: interleaved Bloom + bin metadata
 * (role of ganon's serialized (IBFConfig, hashes_count, bin_map, ibf) —
 * src/ganon-build/GanonBuild.cpp:251-288).
 */
final class SketchDb(
    val ibf: InterleavedBloom,
    val targets: Array[String],       // bin index -> target name
    val targetHashes: Array[Long],    // bin index -> estimated distinct hashes
    val params: IbfParams,
    val plan: IbfPlan) extends Serializable {

  @transient lazy val targetIndex: Map[String, Int] = targets.zipWithIndex.toMap

  /** Per-bin expected single-probe FPR given its load. */
  def binFpr(bin: Int): Double =
    Bloom.falsePositiveRate(plan.bitsPerBin, plan.numHashes, targetHashes(bin))

  def sizeBytes: Long = ibf.sizeBytes
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
    val m = Bloom.optimalBits(maxN, p.maxFp)
    val h = math.min(16, Bloom.optimalHashes(m, maxN))
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
