package graft.build

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.classify.{Classify, ClassifyParams}
import graft.spark.SparkTestSession

/** Build-direct-to-store: shard blobs written from executors, driver
  * memory bounded by coarse + metadata, classify-equivalence with the
  * in-memory build, and O(touched-groups) update of the stored db. */
class BuildToStoreSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def matches(db: ProbeDb, docs: org.apache.spark.sql.DataFrame,
      cp: ClassifyParams = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0))
      : Set[(String, String, Int)] =
    Classify.allMatches(Classify.classify(spark, docs, "path", "content",
        db, cp))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  /** grp_<g>.bin blobs only (the Hadoop local FS adds .crc sidecars). */
  private def blobs(dir: String): Array[java.io.File] =
    new java.io.File(s"$dir/shards").listFiles()
      .filter(_.getName.matches("grp_\\d+\\.bin"))

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_b2s_$tag"
    deleteRec(new java.io.File(d))
    d
  }

  test("buildToStore == in-memory build; driver holds only the coarse") {
    val docs = graft.synth.Corpus.df(spark, 800, numRepos = 24, partitions = 8)
      .cache()
    val p = IbfParams(k = 19, w = 31, maxFp = 0.001)
    val dir = freshDir("build")
    val lazyDb = SketchBuild.buildToStore(spark, docs, "repo", "content",
      dir, p)
    val flat = SketchBuild.build(spark, docs, "repo", "content", p)

    // the returned db's broadcast footprint is the coarse filter ALONE
    // (at this toy scale the 64-bin interleave rounding dominates both
    // structures, so byte ratios are meaningless — the load-bearing claims
    // are the coarse-only contract and that no fine shard exists driver-
    // side until a probe demands it)
    assert(lazyDb.sizeBytes == lazyDb.coarse.sizeBytes)
    assert(blobs(dir).length == lazyDb.layout.numGroups)
    assert(lazyDb.loadedShards == 0, "no shard materialized before probing")

    assert(matches(lazyDb, docs) == matches(flat, docs))
    assert(lazyDb.loadedShards > 0, "probing fetched the working set")

    // the store round-trips through both load paths
    val reread = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    assert(matches(reread, docs) == matches(flat, docs))
    val eager = graft.io.SketchStore.loadAny(spark, dir)
    assert(matches(eager, docs) == matches(flat, docs))
    docs.unpersist()
  }

  test("updateStored: growing EXISTING targets routes into their bins") {
    // base store holds half of every repo's rows; the delta adds the other
    // half for the SAME targets (the existingAdds path: delta hashes must
    // OR into the targets' existing bins, not new ones)
    val docs = graft.synth.Corpus.df(spark, 600, numRepos = 12, partitions = 4)
      .withColumn("half", pmod(xxhash64(col("path")), lit(2)) === 0)
      .cache()
    val p = IbfParams(k = 19, w = 31, maxFp = 1e-5)
    val dir = freshDir("grow")
    val base = SketchBuild.buildToStore(spark,
      docs.filter(col("half")), "repo", "content", dir, p)
    val grown = SketchBuild.updateStored(spark, dir,
      docs.filter(!col("half")), "repo", "content",
      persistShingles = true)
    // no new bins were allocated (same targets, frozen plan)...
    assert(grown.layout.numBins == base.layout.numBins)
    // ...and every read now fully contains its own repo bin, matching a
    // fresh full build (FP-immune full-containment check, as in q50)
    val fresh = SketchBuild.build(spark, docs, "repo", "content", p)
    assert(matches(grown, docs) == matches(fresh, docs))
    docs.unpersist()
  }

  test("interrupted build/update fences loaders (_IN_PROGRESS fail-fast)") {
    val docs = graft.synth.Corpus.df(spark, 120, numRepos = 6, partitions = 2)
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)
    val dir = freshDir("fence")
    SketchBuild.buildToStore(spark, docs, "repo", "content", dir, p)
    // loads fine after commit...
    graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    // ...but a crash between mark and manifest leaves the marker: loaders
    // must refuse rather than serve half-mutated blobs
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(s"$dir/_IN_PROGRESS"))
    intercept[IllegalStateException] {
      graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    }
    intercept[IllegalStateException] {
      graft.io.SketchStore.loadAny(spark, dir)
    }
    // an update refuses a fenced store too (it loads the db first)
    intercept[IllegalStateException] {
      SketchBuild.updateStored(spark, dir, null, "repo", "content")
    }
    // after restore (marker removed), a completed update commits cleanly
    java.nio.file.Files.delete(java.nio.file.Paths.get(s"$dir/_IN_PROGRESS"))
    val upd = SketchBuild.updateStored(spark, dir, null, "repo", "content",
      removeTargets = Seq(docs.select("repo").distinct().orderBy("repo")
        .first().getString(0)))
    assert(graft.io.SketchStore.loadTwoLevelLazy(spark, dir).targets.length ==
      upd.targets.length)
  }

  test("persistShingles build: bit-identical to the two-scan build") {
    val docs = graft.synth.Corpus.df(spark, 400, numRepos = 12, partitions = 4)
      .cache()
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)
    val a = SketchBuild.build(spark, docs, "repo", "content", p)
    val b = SketchBuild.build(spark, docs, "repo", "content", p,
      persistShingles = true)
    assert(a.targets.sameElements(b.targets))
    assert(a.plan == b.plan)
    assert(a.ibf.words.sameElements(b.ibf.words))
    docs.unpersist()
  }

  test("updateStored: add+remove rewrites only touched groups, equals fresh") {
    // enough repos for several 64-bin groups, so "untouched group" exists
    val docs = graft.synth.Corpus.df(spark, 1000, numRepos = 150, partitions = 8)
      .cache()
    val repos = docs.select("repo").distinct().orderBy("repo")
      .collect().map(_.getString(0))
    val addRepo = repos.head
    val rmRepo = repos.last
    // tiny maxFp: updated and fresh filters have different bits, so an
    // FP-completed near-containment could otherwise differ between them
    val p = IbfParams(k = 19, w = 31, maxFp = 1e-5)
    val dir = freshDir("update")
    val baseDb = SketchBuild.buildToStore(spark,
      docs.filter(col("repo") =!= addRepo), "repo", "content", dir, p)

    // record blob mtimes; untouched groups must not be rewritten
    val before = blobs(dir).map(f => f.getName -> f.lastModified()).toMap

    val updated = SketchBuild.updateStored(spark, dir,
      docs.filter(col("repo") === addRepo), "repo", "content",
      removeTargets = Seq(rmRepo))
    val fresh = SketchBuild.build(spark,
      docs.filter(col("repo") =!= rmRepo), "repo", "content", p)

    assert(matches(updated, docs) == matches(fresh, docs))
    // reload from the store: the update is durable, not just in-memory
    val reloaded = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    assert(matches(reloaded, docs) == matches(fresh, docs))

    // O(delta) evidence: groups holding neither the added nor the removed
    // target keep their blob mtime — they were never read or rewritten
    val after = blobs(dir).map(f => f.getName -> f.lastModified()).toMap
    def groupsOf(db: ProbeDb, layout: BinLayout, t: String): Set[Int] =
      db.targetIndex.get(t).map { i =>
        val b0 = layout.base(i)
        (b0 / 64 to (b0 + layout.split(i) - 1) / 64).toSet
      }.getOrElse(Set.empty)
    // the removed target's groups come from the PRE-update layout (it no
    // longer exists in the updated index)
    val touched = groupsOf(updated, updated.layout, addRepo) ++
      groupsOf(baseDb, baseDb.layout, rmRepo)
    val untouched = before.keySet.filter { name =>
      !touched.contains(name.stripPrefix("grp_").stripSuffix(".bin").toInt)
    }
    assert(untouched.nonEmpty, "layout left no untouched group to observe")
    untouched.foreach { name =>
      assert(before(name) == after(name), s"untouched blob $name rewritten")
    }
    docs.unpersist()
  }
}
