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
 *   shards/grp_<g>.bin  one raw blob per 64-bin group   [two-level only]
 *   bins.parquet        (target, n_hashes, base, split) — the bin map
 *   manifest.parquet    (version, layout, k, w, seed, maxFp, hllP,
 *                        minContentLen, sizingMode, bitsPerBin, numHashes,
 *                        maxHashesBin, numBins, ibf) — written LAST
 *   _IN_PROGRESS        fence marker: created before any mutation of an
 *                        existing store (rebuild-in-place, updateStored's
 *                        in-place blob rewrites), cleared by writeManifest
 *                        (the commit point). Loaders fail fast on it, so
 *                        neither a half-written NEW store nor an old
 *                        manifest over half-mutated blobs is ever loadable
 *
 * Bin metadata stays relational (queryable/joinable); bit-matrices ride as
 * binary cells/blobs. The raw per-group blobs are the single source of
 * shard truth: the executor-side lazy-load unit (one open+read per group,
 * no parquet machinery inside tasks), written straight from executors by
 * `SketchBuild.buildToStore`, and rewritten per touched group by
 * `SketchBuild.updateStored`.
 */
object SketchStore {

  val FormatVersion = 5

  private[graft] def writeManifest(spark: SparkSession, db: SplitBinDb,
      layout: String, ibfBytes: Array[Byte], dir: String): Unit = {
    import spark.implicits._
    // fence readers while bins/manifest are replaced; cleared at the end —
    // the store's single commit point
    markInProgress(spark.sparkContext.hadoopConfiguration, dir)
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
    clearInProgress(spark.sparkContext.hadoopConfiguration, dir)
  }

  def save(spark: SparkSession, db: SketchDb, dir: String): Unit =
    writeManifest(spark, db, "flat", db.ibf.toBytes, dir)

  def saveTwoLevel(spark: SparkSession, db: TwoLevelSketchDb, dir: String): Unit = {
    // fence BEFORE the first blob overwrite (saving over an existing store
    // is a mutation like any other); blobs first, manifest last — which
    // clears the fence (see layout note above)
    val conf = spark.sparkContext.hadoopConfiguration
    markInProgress(conf, dir)
    db.shards.zipWithIndex.foreach { case (shard, g) =>
      writeShardBlob(conf, s"$dir/shards", g, shard.toBytes)
    }
    writeManifest(spark, db, "two", db.coarse.toBytes, dir)
  }

  private[graft] def writeShardBlob(conf: org.apache.hadoop.conf.Configuration,
      shardDir: String, g: Int, bytes: Array[Byte]): Unit = {
    val dest = new org.apache.hadoop.fs.Path(s"$shardDir/grp_$g.bin")
    val fs = dest.getFileSystem(conf)
    // write-then-OVERWRITE-rename (FileContext, atomic on HDFS/posix):
    // concurrent writers of the same group (task retries, speculative
    // attempts) can never interleave bytes in the destination, and there
    // is NO missing-file window — a reader racing the commit sees the old
    // blob or the new one, never nothing. That also makes updateStored's
    // read-modify-write safe under duplicate attempts: an attempt reads
    // either the pre- or post-merge blob and OR is idempotent either way.
    val tmp = new org.apache.hadoop.fs.Path(
      s"$shardDir/.grp_$g.${java.util.UUID.randomUUID()}.tmp")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      org.apache.hadoop.fs.FileContext.getFileContext(dest.toUri, conf)
        .rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    } catch {
      case e: Throwable =>
        fs.delete(tmp, false)
        if (!fs.exists(dest))
          throw new java.io.IOException(s"failed to commit shard blob $dest", e)
    }
  }

  private def marker(dir: String) =
    new org.apache.hadoop.fs.Path(s"$dir/_IN_PROGRESS")

  /** Fence the store while a build/update mutates it: readers fail fast on
    * the marker instead of loading a half-written/half-mutated db (the
    * manifest-last discipline alone cannot protect in-place blob rewrites
    * or a rebuild into a dir that already holds an older manifest). */
  private[graft] def markInProgress(
      conf: org.apache.hadoop.conf.Configuration, dir: String): Unit = {
    val m = marker(dir)
    m.getFileSystem(conf).create(m, true).close()
  }

  /** Cleared by writeManifest — the single commit point. */
  private def clearInProgress(
      conf: org.apache.hadoop.conf.Configuration, dir: String): Unit = {
    val m = marker(dir)
    m.getFileSystem(conf).delete(m, false)
  }

  /** Read one raw shard blob; None if the group has no file (a group whose
    * targets routed zero hashes — never probed thanks to coarse pruning). */
  private[graft] def readShardBlob(conf: org.apache.hadoop.conf.Configuration,
      shardDir: String, g: Int): Option[InterleavedBloom] = {
    val path = new org.apache.hadoop.fs.Path(s"$shardDir/grp_$g.bin")
    val fs = path.getFileSystem(conf)
    if (!fs.exists(path)) None
    else {
      val in = fs.open(path)
      try {
        val len = fs.getFileStatus(path).getLen.toInt
        val buf = new Array[Byte](len)
        in.readFully(0, buf)
        Some(InterleavedBloom.fromBytes(buf))
      } finally in.close()
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
    val mk = marker(dir)
    if (mk.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(mk))
      throw new IllegalStateException(
        s"sketch store $dir has an interrupted build/update (_IN_PROGRESS " +
          "present) — its blobs may be half-mutated; rebuild or restore it")
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
        val conf = spark.sparkContext.hadoopConfiguration
        val shards = Array.tabulate(layout.numGroups) { g =>
          readShardBlob(conf, s"$dir/shards", g).getOrElse {
            val nLocal = math.min(64, layout.numBins - g * 64)
            InterleavedBloom.empty(nLocal, plan.bitsPerBin, plan.numHashes)
          }
        }
        new TwoLevelSketchDb(blob, shards, targets, counts,
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
