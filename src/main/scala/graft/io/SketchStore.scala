package graft.io

import org.apache.spark.sql.{Row, SaveMode, SparkSession}

import graft.build.{IbfParams, IbfPlan, ProbeDb, SketchDb, TwoLevelSketchDb}
import graft.core.sketch.InterleavedBloom

/**
 * Versioned persistence of the sketch database (role of the reference's
 * cereal-serialized filter file, ganon src/ganon-build/GanonBuild.cpp:251-288
 * and its load path GanonClassify.cpp:949-986): parquet of per-bin rows plus
 * one manifest row carrying version/layout/params/plan and the serialized
 * coarse structure; two-level layouts add one row per fine shard.
 *
 * Layout under `dir`:
 *   manifest.parquet  (version, layout, k, w, seed, maxFp, bitsPerBin,
 *                      numHashes, maxBinHashes, ibf)
 *   bins.parquet      (bin, target, n_hashes)
 *   shards.parquet    (grp, first_bin, ibf)          [two-level only]
 *
 * Bin metadata stays relational (queryable/joinable); bit-matrices ride as
 * binary cells. At real scale the shards table is exactly what executors
 * load lazily per group.
 */
object SketchStore {

  val FormatVersion = 2

  private def writeManifest(spark: SparkSession, db: ProbeDb, layout: String,
      ibfBytes: Array[Byte], dir: String): Unit = {
    import spark.implicits._
    val bins = db.targets.zipWithIndex.map { case (t, i) =>
      (i, t, db.targetHashes(i))
    }.toSeq.toDF("bin", "target", "n_hashes")
    bins.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/bins.parquet")
    Seq((FormatVersion, layout, db.params.k, db.params.w, db.params.seed,
      db.params.maxFp, db.plan.bitsPerBin, db.plan.numHashes,
      db.plan.maxBinHashes, ibfBytes))
      .toDF("version", "layout", "k", "w", "seed", "max_fp", "bits_per_bin",
        "num_hashes", "max_bin_hashes", "ibf")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/manifest.parquet")
  }

  def save(spark: SparkSession, db: SketchDb, dir: String): Unit =
    writeManifest(spark, db, "flat", db.ibf.toBytes, dir)

  def saveTwoLevel(spark: SparkSession, db: TwoLevelSketchDb, dir: String): Unit = {
    import spark.implicits._
    writeManifest(spark, db, "two", db.coarse.toBytes, dir)
    db.shards.zipWithIndex.map { case (shard, g) =>
      (g, db.groupBins(g).head, shard.toBytes)
    }.toSeq.toDF("grp", "first_bin", "ibf")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/shards.parquet")
  }

  /** Load either layout, dispatching on the manifest. */
  def loadAny(spark: SparkSession, dir: String): ProbeDb = {
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    val version = m.getAs[Int]("version")
    require(version == FormatVersion, s"unsupported version $version")
    val params = IbfParams(k = m.getAs[Int]("k"), w = m.getAs[Int]("w"),
      seed = m.getAs[Long]("seed"), maxFp = m.getAs[Double]("max_fp"))
    val bins = spark.read.parquet(s"$dir/bins.parquet")
      .collect().map(r => (r.getAs[Int]("bin"), r.getAs[String]("target"),
        r.getAs[Long]("n_hashes")))
      .sortBy(_._1)
    val plan = IbfPlan(bins.length, m.getAs[Long]("bits_per_bin"),
      m.getAs[Int]("num_hashes"), m.getAs[Long]("max_bin_hashes"),
      graft.core.sketch.Bloom.falsePositiveRate(m.getAs[Long]("bits_per_bin"),
        m.getAs[Int]("num_hashes"), m.getAs[Long]("max_bin_hashes")))
    val targets = bins.map(_._2)
    val counts = bins.map(_._3)
    val blob = InterleavedBloom.fromBytes(m.getAs[Array[Byte]]("ibf"))
    m.getAs[String]("layout") match {
      case "flat" =>
        new SketchDb(blob, targets, counts, params, plan)
      case "two" =>
        val shardRows = spark.read.parquet(s"$dir/shards.parquet")
          .collect().map(r => (r.getAs[Int]("grp"), r.getAs[Int]("first_bin"),
            InterleavedBloom.fromBytes(r.getAs[Array[Byte]]("ibf"))))
          .sortBy(_._1)
        val groupBins = shardRows.map { case (g, first, shard) =>
          Array.range(first, first + shard.numBins)
        }
        new TwoLevelSketchDb(blob, shardRows.map(_._3), groupBins,
          targets, counts, params, plan)
      case other => throw new IllegalArgumentException(s"unknown layout $other")
    }
  }

  def load(spark: SparkSession, dir: String): SketchDb =
    loadAny(spark, dir).asInstanceOf[SketchDb]
}
