package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}

/**
 * Store-path throughput evidence: on a ~2k-target corpus (32 64-bin
 * groups), compare (a) in-memory flat build vs buildToStore, and
 * (b) classify against the broadcast flat db vs the LAZY store-backed db
 * (coarse broadcast + on-demand shard fetch). The store path must be
 * throughput-comparable, not merely correct — at real scale it is the
 * ONLY path (the flat build/broadcast stops fitting).
 */
object StoreBench {
  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 2
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // 64 repos x 32 salt buckets = 2048 targets -> 32 interleaved groups
    val corpus = spark.read.parquet("/tmp/graft_bench_corpus_1500000")
      .withColumn("tgt",
        concat(col("repo"), lit("_"), pmod(xxhash64(col("path")), lit(32))))
      .coalesce(128).cache()
    corpus.count()
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)
    val dir = "/tmp/graft_storebench_db"

    def buildMem() = SketchBuild.build(spark, corpus, "tgt", "content", p)
    def buildStore() = SketchBuild.buildToStore(spark, corpus, "tgt",
      "content", dir, p)
    def classifyAt(db: graft.build.ProbeDb, rc: Double): Unit = {
      Classify.classify(spark, corpus, "path", "content", db,
        ClassifyParams(relCutoff = rc))
        .toDF().agg(sum(size(col("matches")))).first()
    }

    // warm
    var flat = buildMem(); var lazyDb = buildStore()
    classifyAt(flat, 0.25); classifyAt(lazyDb, 0.25)
    (1 to reps).foreach { _ =>
      val tMem = time { flat = buildMem() }
      val tStore = time { lazyDb = buildStore() }
      val tCf = time { classifyAt(flat, 0.25) }
      val tCl = time { classifyAt(lazyDb, 0.25) }
      // selective regime: a strict cutoff kills the cross-lang matches, so
      // few bins survive and the probe (not the per-survivor threshold
      // math) is the cost — the case two-level pruning exists for
      val tCf9 = time { classifyAt(flat, 0.9) }
      val tCl9 = time { classifyAt(lazyDb, 0.9) }
      println(f"[store] build mem=$tMem%.2f store=$tStore%.2f s | " +
        f"classify@0.25 flat=$tCf%.2f lazy=$tCl%.2f s | " +
        f"classify@0.9 flat=$tCf9%.2f lazy=$tCl9%.2f s | " +
        f"targets=${flat.targets.length} groups=${lazyDb.layout.numGroups} " +
        f"flatMB=${flat.sizeBytes / 1e6}%.1f coarseMB=${lazyDb.sizeBytes / 1e6}%.1f")
    }

    // LRU-bounded cache sanity at full width: a bound that HOLDS the
    // workload's working set costs nothing (same classify time, resident
    // bytes == store bytes). The opposite misconfiguration — a bound BELOW
    // a saturating workload's working set — degrades to one ~shardMB
    // re-fetch+parse per (read, evicted group) and is measured pathological
    // by construction; the bound exists for SHIFTING working sets (see
    // LazyTwoLevelDb scaladoc), with bounded-ness + answer-neutrality
    // proven in BuildToStoreSpec at tolerable scale.
    // size the bound from the CURRENT generation's per-group blob pointers
    // (the /tmp store persists across runs, so gen 1's blobs may be stale)
    val handle = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    val totalShardBytes = (0 until handle.layout.numGroups).map { g =>
      new java.io.File(
        s"$dir/shards_v${handle.shardGens(g)}/grp_$g.bin").length()
    }.sum
    spark.conf.set("spark.graft.shard.cache.bytes",
      (totalShardBytes + (64 << 20)).toString)
    val lru = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    spark.conf.unset("spark.graft.shard.cache.bytes")
    val tLru = time { classifyAt(lru, 0.25) }
    println(f"[store] LRU bound=${(totalShardBytes + (64 << 20)) / 1e6}%.1f MB " +
      f"(holds the working set): classify ${tLru}%.2f s, " +
      f"resident=${lru.residentBytes / 1e6}%.1f MB " +
      f"loaded=${lru.loadedShards}/${lru.layout.numGroups}")
    spark.stop()
  }
}
