package graft.io

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}
import graft.spark.SparkTestSession
import graft.streaming.StreamClassify

/** Store operability added for the exactly-once / pin-registry round:
  * the ingest commit log (a crash-replayed micro-batch must be a no-op),
  * the reader pin registry (gc keeps a pinned generation readable no
  * matter how far CURRENT advances), and the orphaned-tmp sweep. */
class StoreOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val P = IbfParams(k = 8, w = 12, maxFp = 1e-4)

  private def freshDir(tag: String): String = {
    val d = s"/tmp/graft_sops_$tag"
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete()
    }
    rec(new java.io.File(d))
    d
  }

  private def conf = spark.sparkContext.hadoopConfiguration

  private def matchesOf(db: graft.build.ProbeDb,
      docs: org.apache.spark.sql.DataFrame): Set[(String, String, Int)] =
    Classify.allMatches(Classify.classify(spark, docs, "path", "content",
        db, ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)))
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet

  private def batchDf(rows: Seq[(String, String, String)]) =
    rows.toDF("path", "repo", "content")

  // deterministic synthetic batches: batch 1 introduces a NEW target
  // ("repoC") — the exact shape a replay used to double-append
  private val b0 = Seq(
    ("p0", "repoA", "alpha beta gamma delta epsilon zeta"),
    ("p1", "repoA", "eta theta iota kappa lambda mu nu xi"),
    ("p2", "repoB", "omicron pi rho sigma tau upsilon phi"))
  private val b1 = Seq(
    ("p3", "repoB", "chi psi omega alef bet gimel dalet he"),
    ("p4", "repoC", "vav zayin het tet yod kaf lamed mem nun"))

  test("ingest exactly-once: a crash-replayed batch is skipped, store " +
      "equals the fresh build over the union") {
    val dir = freshDir("eo")
    assert(StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, batchId = 0L))
    assert(StreamClassify.ingestBatch(spark, batchDf(b1), "repo", "content",
      dir, P, batchId = 1L))
    val genAfter = SketchStore.currentGeneration(conf, dir).get
    assert(SketchStore.lastIngestCommit(conf, dir) === Some(("ingest", 1L)))

    // crash between store commit and checkpoint commit => the stream
    // re-runs batch 1 verbatim; the commit log must make it a no-op
    assert(!StreamClassify.ingestBatch(spark, batchDf(b1), "repo", "content",
      dir, P, batchId = 1L), "replayed batch must be skipped")
    assert(SketchStore.currentGeneration(conf, dir).get == genAfter,
      "a skipped replay must not commit a generation")

    // the store still equals a fresh build over the union of all batches
    // (before the commit log, the replay doubled repoC's bins)
    val probe = batchDf(b0 ++ b1)
    val stored = SketchStore.loadTwoLevelLazy(spark, dir)
    val fresh = SketchBuild.build(spark, probe, "repo", "content", P)
    assert(matchesOf(stored, probe) == matchesOf(fresh, probe))
  }

  test("ingest exactly-once: a DIFFERENT ingestId is a new logical " +
      "stream, not a replay") {
    val dir = freshDir("eoid")
    assert(StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, ingestId = "run1", batchId = 5L))
    // a fresh checkpoint restarts batch numbering at 0: with run1's log
    // entry (5) an id-blind check would call this a replay
    assert(StreamClassify.ingestBatch(spark, batchDf(b1), "repo", "content",
      dir, P, ingestId = "run2", batchId = 0L),
      "new ingestId must commit even with a smaller batchId")
    assert(SketchStore.lastIngestCommit(conf, dir) === Some(("run2", 0L)))
  }

  test("ingest commit log survives an interleaved NON-ingest commit " +
      "(marker carried forward)") {
    val dir = freshDir("eofwd")
    assert(StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, batchId = 0L))
    // a manual update (no tag) commits the next generation
    SketchBuild.updateStored(spark, dir, batchDf(b1), "repo", "content")
    assert(SketchStore.lastIngestCommit(conf, dir) === Some(("ingest", 0L)),
      "non-ingest commits must carry the newest applied batch forward")
    // so the ingest stream's next replay check still works
    assert(!StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, batchId = 0L))
  }

  test("ingest exactly-once: two INTERLEAVED ingest streams keep separate " +
      "progress — a replay of stream A after stream B's commit is still " +
      "skipped") {
    val dir = freshDir("eodual")
    assert(StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, ingestId = "runA", batchId = 0L))
    assert(StreamClassify.ingestBatch(spark, batchDf(b1), "repo", "content",
      dir, P, ingestId = "runB", batchId = 0L))
    // with the old single-slot marker, runB's commit erased runA's entry
    // and this replay double-appended b0's targets
    assert(!StreamClassify.ingestBatch(spark, batchDf(b0), "repo", "content",
      dir, P, ingestId = "runA", batchId = 0L),
      "stream A's replay must stay skipped after stream B's commit")
    assert(SketchStore.ingestCommits(conf, dir) ===
      Map("runA" -> 0L, "runB" -> 0L))
    val probe = batchDf(b0 ++ b1)
    val stored = SketchStore.loadTwoLevelLazy(spark, dir)
    val fresh = SketchBuild.build(spark, probe, "repo", "content", P)
    assert(matchesOf(stored, probe) == matchesOf(fresh, probe))
  }

  test("ingestForeachBatch refuses gcKeepGens < 2 (one-batch reader race)") {
    val e = intercept[IllegalArgumentException] {
      StreamClassify.ingestForeachBatch(spark,
        spark.readStream.format("rate").load(), "repo", "content",
        freshDir("eoreq"), P, gcKeepGens = Some(1))
    }
    assert(e.getMessage.contains("keep >= 2"))
  }

  test("pin registry: a pinned generation survives gc beyond keepGens and " +
      "still classifies identically; unpinning releases it") {
    val dir = freshDir("pin")
    val db1 = SketchBuild.buildToStore(spark, batchDf(b0), "repo", "content",
      dir, P) // gen 1
    val probe = batchDf(b0)
    val before = matchesOf(db1, probe)

    val pinId = SketchStore.pin(conf, dir, db1.generation)
    assert(SketchStore.pinnedGenerations(conf, dir) == Seq(1))

    SketchBuild.updateStored(spark, dir, batchDf(b1), "repo", "content") // 2
    SketchBuild.updateStored(spark, dir,
      batchDf(Seq(("p9", "repoD", "extra content words here ok"))),
      "repo", "content") // gen 3

    val r = SketchStore.gcGenerationsReport(spark, dir, keepGens = 1)
    assert(r.pinnedKept == Seq(1), "gc must report the pinned survivor")
    assert(!new java.io.File(s"$dir/gen_2").exists(), "gen 2 reclaimed")
    assert(new java.io.File(s"$dir/gen_1").exists(), "pinned gen 1 kept")
    // the pinned handle keeps working — metadata AND every blob it refs
    assert(matchesOf(db1, probe) == before)

    SketchStore.unpin(conf, dir, pinId)
    assert(SketchStore.pinnedGenerations(conf, dir).isEmpty)
    val r2 = SketchStore.gcGenerationsReport(spark, dir, keepGens = 1)
    assert(r2.pinnedKept.isEmpty)
    assert(!new java.io.File(s"$dir/gen_1").exists(),
      "unpinned generation reclaimed by the next gc")
  }

  test("gc sweeps orphaned .tmp files in committed shard dirs") {
    val dir = freshDir("tmp")
    SketchBuild.buildToStore(spark, batchDf(b0), "repo", "content", dir, P)
    // residue of an executor attempt that lost the commit rename race
    val orphan = new java.io.File(s"$dir/shards_v1/.grp_0.bin.12345.tmp")
    java.nio.file.Files.write(orphan.toPath, Array[Byte](1, 2, 3))
    // residue of a pin() that crashed between create and rename — but a
    // COMMITTED pin must survive the sweep
    new java.io.File(s"$dir/pins").mkdirs()
    val pinOrphan = new java.io.File(s"$dir/pins/.pin_deadbeef.tmp")
    java.nio.file.Files.write(pinOrphan.toPath, Array[Byte](9))
    // age the orphan past the sweep's grace window (an in-flight pin's
    // fresh tmp must NOT be swept — that's the window's whole point)
    assert(pinOrphan.setLastModified(
      System.currentTimeMillis() - 11 * 60 * 1000L))
    val fresh = new java.io.File(s"$dir/pins/.pin_inflight.tmp")
    java.nio.file.Files.write(fresh.toPath, Array[Byte](8))
    val pinId = SketchStore.pin(conf, dir, 1)
    val r = SketchStore.gcGenerationsReport(spark, dir, keepGens = 2)
    assert(!orphan.exists(), "orphaned tmp must be reclaimed")
    assert(!pinOrphan.exists(), "aged orphaned pin tmp must be reclaimed")
    assert(fresh.exists(), "a fresh pin tmp (possibly in-flight) survives")
    assert(new java.io.File(s"$dir/pins/pin_$pinId").exists(),
      "committed pins survive the sweep")
    assert(r.files >= 2 && r.bytes >= 4)
    // the store is untouched otherwise
    val back = SketchStore.loadTwoLevelLazy(spark, dir)
    assert(matchesOf(back, batchDf(b0)).nonEmpty)
  }
}
