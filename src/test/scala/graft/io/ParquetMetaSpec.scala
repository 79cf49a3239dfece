package graft.io

import org.apache.hadoop.fs.Path
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

/** The store control plane moved from df.write/spark.read jobs to direct
  * driver parquet I/O (ParquetMeta) — these tests pin the FORMAT contract
  * both ways: Spark still reads what ParquetMeta writes (same paths, same
  * column names/types), and ParquetMeta still reads directory-shaped
  * metadata written by the old df.coalesce(1).write path. */
class ParquetMetaSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private def conf = spark.sparkContext.hadoopConfiguration

  private val row = ParquetMeta.ManifestRow(
    version = 6, generation = 3, layout = "two", k = 8, w = 12,
    seed = 0x8F3F73B5CF1C9ADEL, maxFp = 0.01, hllP = 14, minContentLen = 0,
    sizingMode = "avg", bitsPerBin = 4096L, numHashes = 3,
    maxHashesBin = 1000L, numBins = 130,
    shardGens = Array(3, -1, 2), ibf = Array[Byte](1, 2, 3, 4, 5))

  private val bins = Seq(("a", 10L, 0, 1), ("b", 2000L, 1, 2), ("c", 5L, 3, 1))

  test("manifest row round-trips through ParquetMeta") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    val p = new Path(s"$dir/manifest.parquet")
    ParquetMeta.writeManifestRow(conf, p, row)
    val r = ParquetMeta.readManifestRow(conf, p)
    assert(r.copy(shardGens = null, ibf = null) ==
      row.copy(shardGens = null, ibf = null))
    assert(r.shardGens.toSeq == row.shardGens.toSeq)
    assert(r.ibf.toSeq == row.ibf.toSeq)
  }

  test("Spark reads ParquetMeta-written manifest and bins (format compat)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    ParquetMeta.writeManifestRow(conf, new Path(s"$dir/manifest.parquet"), row)
    ParquetMeta.writeBins(conf, new Path(s"$dir/bins.parquet"), bins)
    val m = spark.read.parquet(s"$dir/manifest.parquet").head()
    assert(m.getAs[Int]("version") == 6)
    assert(m.getAs[String]("layout") == "two")
    assert(m.getAs[Long]("bits_per_bin") == 4096L)
    assert(m.getAs[scala.collection.Seq[Int]]("shard_gens") == Seq(3, -1, 2))
    assert(m.getAs[Array[Byte]]("ibf").toSeq == Seq[Byte](1, 2, 3, 4, 5))
    val b = spark.read.parquet(s"$dir/bins.parquet")
      .collect().map(r => (r.getAs[String]("target"), r.getAs[Long]("n_hashes"),
        r.getAs[Int]("base"), r.getAs[Int]("split"))).sortBy(_._3)
    assert(b.toSeq == bins)
  }

  test("ParquetMeta reads legacy directory-shaped spark-written metadata") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    Seq((row.version, row.generation, row.layout, row.k, row.w, row.seed,
      row.maxFp, row.hllP, row.minContentLen, row.sizingMode, row.bitsPerBin,
      row.numHashes, row.maxHashesBin, row.numBins, row.shardGens, row.ibf))
      .toDF("version", "generation", "layout", "k", "w", "seed", "max_fp",
        "hll_p", "min_content_len", "sizing_mode", "bits_per_bin",
        "num_hashes", "max_hashes_bin", "num_bins", "shard_gens", "ibf")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/manifest.parquet")
    bins.toDF("target", "n_hashes", "base", "split")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/bins.parquet")
    val r = ParquetMeta.readManifestRow(conf, new Path(s"$dir/manifest.parquet"))
    assert(r.copy(shardGens = null, ibf = null) ==
      row.copy(shardGens = null, ibf = null))
    assert(r.shardGens.toSeq == row.shardGens.toSeq)
    assert(r.ibf.toSeq == row.ibf.toSeq)
    val b = ParquetMeta.readBins(conf, new Path(s"$dir/bins.parquet"))
      .sortBy(_._3)
    assert(b.toSeq == bins)
  }

  test("empty shard_gens (flat layout) round-trips as an empty array") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pm").toString
    val p = new Path(s"$dir/manifest.parquet")
    ParquetMeta.writeManifestRow(conf, p,
      row.copy(layout = "flat", shardGens = Array.empty[Int]))
    assert(ParquetMeta.readManifestRow(conf, p).shardGens.isEmpty)
  }
}
