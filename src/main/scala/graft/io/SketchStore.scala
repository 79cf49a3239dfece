package graft.io

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.build.{BinLayout, IbfParams, IbfPlan, LazyTwoLevelDb, ProbeDb, SketchDb, SplitBinDb, TwoLevelSketchDb}
import graft.core.sketch.{Bloom, InterleavedBloom}

/**
 * Versioned persistence of the sketch database (role of the reference's
 * cereal-serialized filter file, ganon src/ganon-build/GanonBuild.cpp:251-288
 * and its load path GanonClassify.cpp:949-986): parquet of per-target rows
 * plus one manifest row carrying version/layout/params/plan and the
 * serialized coarse structure; two-level layouts add one row per fine shard.
 *
 * Layout under `dir`:
 *   manifest.parquet  (version, layout, k, w, seed, maxFp, hllP,
 *                      minContentLen, sizingMode, bitsPerBin, numHashes,
 *                      maxHashesBin, numBins, ibf)
 *   bins.parquet      (target, n_hashes, base, split)  — the bin map
 *   shards.parquet    (grp, ibf)                       [two-level only]
 *
 * Bin metadata stays relational (queryable/joinable); bit-matrices ride as
 * binary cells. At real scale the shards table is exactly what executors
 * load lazily per group.
 */
object SketchStore {

  val FormatVersion = 4

  private def writeManifest(spark: SparkSession, db: SplitBinDb, layout: String,
      ibfBytes: Array[Byte], dir: String): Unit = {
    import spark.implicits._
    val bins = db.targets.indices.map { i =>
      (db.targets(i), db.targetHashes(i), db.layout.base(i), db.layout.split(i))
    }.toDF("target", "n_hashes", "base", "split")
    bins.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/bins.parquet")
    Seq((FormatVersion, layout, db.params.k, db.params.w, db.params.seed,
      db.params.maxFp, db.params.hllP, db.params.minContentLen,
      db.params.sizingMode, db.plan.bitsPerBin, db.plan.numHashes,
      db.plan.maxHashesBin, db.plan.numBins, ibfBytes))
      .toDF("version", "layout", "k", "w", "seed", "max_fp", "hll_p",
        "min_content_len", "sizing_mode", "bits_per_bin",
        "num_hashes", "max_hashes_bin", "num_bins", "ibf")
      .coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/manifest.parquet")
  }

  def save(spark: SparkSession, db: SketchDb, dir: String): Unit =
    writeManifest(spark, db, "flat", db.ibf.toBytes, dir)

  def saveTwoLevel(spark: SparkSession, db: TwoLevelSketchDb, dir: String): Unit = {
    import spark.implicits._
    writeManifest(spark, db, "two", db.coarse.toBytes, dir)
    db.shards.zipWithIndex.map { case (shard, g) => (g, shard.toBytes) }
      .toSeq.toDF("grp", "ibf")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/shards.parquet")
    // raw per-group blobs: the executor-side lazy-load unit (one open+read
    // per group, no parquet machinery inside tasks)
    val conf = spark.sparkContext.hadoopConfiguration
    db.shards.zipWithIndex.foreach { case (shard, g) =>
      val path = new org.apache.hadoop.fs.Path(s"$dir/shards/grp_$g.bin")
      val fs = path.getFileSystem(conf)
      val out = fs.create(path, true)
      try out.write(shard.toBytes) finally out.close()
    }
  }

  /** Two-level load with LAZY shards: ships only coarse + metadata;
    * executors fetch `dir/shards/grp_<g>.bin` on first probe of group g
    * (see [[graft.build.LazyTwoLevelDb]]). */
  def loadTwoLevelLazy(spark: SparkSession, dir: String): LazyTwoLevelDb = {
    val (params, layout, plan, targets, counts, coarseBytes, layoutKind) =
      readManifest(spark, dir)
    require(layoutKind == "two", s"not a two-level store: $layoutKind")
    new LazyTwoLevelDb(InterleavedBloom.fromBytes(coarseBytes), targets,
      counts, layout, params, plan, s"$dir/shards",
      new graft.build.SerializableHadoopConf(
        spark.sparkContext.hadoopConfiguration))
  }

  private def readManifest(spark: SparkSession, dir: String)
      : (IbfParams, BinLayout, IbfPlan, Array[String], Array[Long], Array[Byte], String) = {
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    val version = m.getAs[Int]("version")
    require(version == FormatVersion, s"unsupported version $version")
    // hllP/minContentLen/sizingMode must round-trip too: update() on a
    // loaded db re-runs pass 1 with these params
    val params = IbfParams(k = m.getAs[Int]("k"), w = m.getAs[Int]("w"),
      seed = m.getAs[Long]("seed"), maxFp = m.getAs[Double]("max_fp"),
      hllP = m.getAs[Int]("hll_p"),
      minContentLen = m.getAs[Int]("min_content_len"),
      sizingMode = m.getAs[String]("sizing_mode"))
    val bins = spark.read.parquet(s"$dir/bins.parquet")
      .collect().map(r => (r.getAs[String]("target"), r.getAs[Long]("n_hashes"),
        r.getAs[Int]("base"), r.getAs[Int]("split")))
      .sortBy(_._3)
    val numBins = m.getAs[Int]("num_bins")
    val layout = BinLayout(bins.map(_._3), bins.map(_._4), numBins)
    val plan = IbfPlan(numBins, m.getAs[Long]("bits_per_bin"),
      m.getAs[Int]("num_hashes"), m.getAs[Long]("max_hashes_bin"),
      Sizing2.maxFpOf(bins.map(_._2), m.getAs[Long]("max_hashes_bin"),
        m.getAs[Long]("bits_per_bin"), m.getAs[Int]("num_hashes")))
    (params, layout, plan, bins.map(_._1), bins.map(_._2),
      m.getAs[Array[Byte]]("ibf"), m.getAs[String]("layout"))
  }

  /** Load either layout, dispatching on the manifest. */
  def loadAny(spark: SparkSession, dir: String): ProbeDb = {
    val (params, layout, plan, targets, counts, ibfBytes, layoutKind) =
      readManifest(spark, dir)
    val blob = InterleavedBloom.fromBytes(ibfBytes)
    layoutKind match {
      case "flat" =>
        new SketchDb(blob, targets, counts, layout, params, plan)
      case "two" =>
        val shardRows = spark.read.parquet(s"$dir/shards.parquet")
          .collect().map(r => (r.getAs[Int]("grp"),
            InterleavedBloom.fromBytes(r.getAs[Array[Byte]]("ibf"))))
          .sortBy(_._1)
        new TwoLevelSketchDb(blob, shardRows.map(_._2), targets, counts,
          layout, params, plan)
      case other => throw new IllegalArgumentException(s"unknown layout $other")
    }
  }

  def load(spark: SparkSession, dir: String): SketchDb =
    loadAny(spark, dir).asInstanceOf[SketchDb]

  private object Sizing2 {
    def maxFpOf(counts: Array[Long], maxHashesBin: Long, bits: Long,
        h: Int): Double =
      graft.build.Sizing.trueFalsePositive(counts, maxHashesBin, bits, h)._1
  }
}
