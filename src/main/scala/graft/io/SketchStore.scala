package graft.io

import org.apache.spark.sql.{SaveMode, SparkSession}

import graft.build.{IbfParams, IbfPlan, SketchDb}
import graft.core.sketch.InterleavedBloom

/**
 * Versioned persistence of the sketch database (role of the reference's
 * cereal-serialized filter file, ganon src/ganon-build/GanonBuild.cpp:251-288
 * and its load path GanonClassify.cpp:949-986): a parquet of per-bin rows
 * plus one manifest row carrying version/params/plan and the serialized IBF.
 *
 * Layout under `dir`:
 *   manifest.parquet  (version, k, w, seed, maxFp, bitsPerBin, numHashes, ibf)
 *   bins.parquet      (bin, target, n_hashes)
 *
 * Bin metadata stays relational (queryable/joinable); the interleaved
 * bit-matrix rides as one binary cell. Mergeable: two stores with identical
 * params OR-combine (see merge).
 */
object SketchStore {

  val FormatVersion = 1

  def save(spark: SparkSession, db: SketchDb, dir: String): Unit = {
    import spark.implicits._
    val bins = db.targets.zipWithIndex.map { case (t, i) =>
      (i, t, db.targetHashes(i))
    }.toSeq.toDF("bin", "target", "n_hashes")
    bins.coalesce(1).write.mode(SaveMode.Overwrite).parquet(s"$dir/bins.parquet")
    val manifest = Seq((FormatVersion, db.params.k, db.params.w, db.params.seed,
      db.params.maxFp, db.plan.bitsPerBin, db.plan.numHashes,
      db.plan.maxBinHashes, db.ibf.toBytes))
      .toDF("version", "k", "w", "seed", "max_fp", "bits_per_bin",
        "num_hashes", "max_bin_hashes", "ibf")
    manifest.coalesce(1).write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/manifest.parquet")
  }

  def load(spark: SparkSession, dir: String): SketchDb = {
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    require(m.getInt(0) == FormatVersion, s"unsupported version ${m.getInt(0)}")
    val params = IbfParams(k = m.getInt(1), w = m.getInt(2), seed = m.getLong(3),
      maxFp = m.getDouble(4))
    val ibf = InterleavedBloom.fromBytes(m.getAs[Array[Byte]](8))
    val bins = spark.read.parquet(s"$dir/bins.parquet")
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
      .sortBy(_._1)
    val plan = IbfPlan(bins.length, m.getLong(5), m.getInt(6), m.getLong(7),
      graft.core.sketch.Bloom.falsePositiveRate(m.getLong(5), m.getInt(6),
        m.getLong(7)))
    new SketchDb(ibf, bins.map(_._2), bins.map(_._3), params, plan)
  }
}
