package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}
import graft.spark.SparkTestSession
import graft.synth.Corpus

/** Two-level (HIBF-like) layout: classification must equal the flat IBF's
  * (coarse pruning is exact — union counts upper-bound member counts),
  * mirroring the reference's {ibf, hibf} test parameterization
  * (tests/ganon/integration, SURVEY.md §5). */
class TwoLevelSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // enough distinct repos for >=3 64-bin groups (the zipf-ish repo draw
  // leaves tail repos empty, so oversample), exercising real group
  // boundaries and group-spanning split bins
  private lazy val corpus = Corpus.df(spark, 2000, numRepos = 300, partitions = 4)
    .cache()
  private val p = IbfParams(k = 8, w = 12, maxFp = 0.01)

  test("two-level classify == flat classify (all params)") {
    val flat = SketchBuild.build(spark, corpus, "repo", "content", p)
    val two = SketchBuild.buildTwoLevel(spark, corpus, "repo", "content", p)
    assert(two.shards.length == flat.layout.numGroups)
    assert(two.shards.length >= 3)
    Seq(ClassifyParams(relCutoff = 0.25), ClassifyParams(relCutoff = 0.75))
      .foreach { cp =>
        val reads = corpus.limit(120).withColumn("id", $"path")
        val a = Classify.allMatches(Classify.classify(spark, reads,
          "id", "content", flat, cp)).collect().map(_.toString).sorted
        val b = Classify.allMatches(Classify.classify(spark, reads,
          "id", "content", two, cp)).collect().map(_.toString).sorted
        assert(a.sameElements(b), s"flat=${a.length} two=${b.length} at $cp")
      }
  }

  test("multi-filter level: max count per target across filters") {
    import org.apache.spark.sql.functions._
    // two filters over disjoint target sets + one shared target
    val dfA = Seq(("tA", "aa bb cc dd ee"), ("shared", "xx yy zz ww"))
      .toDF("repo", "content")
    val dfB = Seq(("tB", "ff gg hh ii"), ("shared", "xx yy"))
      .toDF("repo", "content")
    val pp = IbfParams(k = 3, w = 3, maxFp = 0.001)
    val dbA = SketchBuild.build(spark, dfA, "repo", "content", pp)
    val dbB = SketchBuild.build(spark, dfB, "repo", "content", pp)
    val reads = Seq(("r1", "xx yy zz ww")).toDF("id", "content")
    val res = graft.classify.Classify.classifyMultiFilter(spark, reads,
      "id", "content", Seq(dbA, dbB),
      graft.classify.ClassifyParams(relCutoff = 0.2))
    val m = graft.classify.Classify.allMatches(res)
      .collect().map(r => (r.getString(1), r.getInt(2))).toMap
    val n = graft.core.Hashing.shingles("xx yy zz ww", 3, 3).length
    // shared appears in both filters; A's copy holds the full read -> max=n
    assert(m("shared") == n, s"got $m expected shared=$n")
    assert(!m.contains("tB"))
  }

  test("paired shingles == union of mates' shingle sets") {
    import org.apache.spark.sql.functions._
    val df = Seq(("aa bb cc", "cc dd ee")).toDF("c1", "c2")
    val got = df.select(graft.spark.GraftFunctions
      .pairedShingles(col("c1"), col("c2"), 3, 3).as("hs"))
      .head().getAs[scala.collection.Seq[Long]](0).toArray
    val expect = graft.core.Hashing.sortedDistinct(
      graft.core.Hashing.shingles("aa bb cc", 3, 3) ++
        graft.core.Hashing.shingles("cc dd ee", 3, 3))
    assert(got.sameElements(expect))
  }

  test("lazy two-level: store roundtrip, classify == in-memory, shards on demand") {
    val two = SketchBuild.buildTwoLevel(spark, corpus, "repo", "content", p)
    val dir = java.nio.file.Files.createTempDirectory("graft_lazy").toString
    graft.io.SketchStore.saveTwoLevel(spark, two, dir)
    val lazyDb = graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
    assert(lazyDb.loadedShards == 0)
    // broadcast footprint = coarse only
    assert(lazyDb.sizeBytes < two.sizeBytes)
    val reads = corpus.limit(100).withColumn("id", $"path")
    val a = Classify.allMatches(Classify.classify(spark, reads,
      "id", "content", two, ClassifyParams(relCutoff = 0.25)))
      .collect().map(_.toString).sorted
    val b = Classify.allMatches(Classify.classify(spark, reads,
      "id", "content", lazyDb, ClassifyParams(relCutoff = 0.25)))
      .collect().map(_.toString).sorted
    assert(a.sameElements(b))
    // driver-side direct probe loads only the groups it needs
    val row = corpus.select("content").head()
    val hs = graft.core.Hashing.shingles(row.getString(0), p.k, p.w, p.seed)
    val counts = new Array[Int](lazyDb.targets.length)
    lazyDb.probe(hs, counts, math.max(1, hs.length))
    assert(lazyDb.loadedShards >= 1)
  }

  test("two-level probe prunes: zero FN survives group pruning") {
    val two = SketchBuild.buildTwoLevel(spark, corpus, "repo", "content", p)
    val row = corpus.select("content", "repo").head()
    val hs = graft.core.Hashing.shingles(row.getString(0), p.k, p.w, p.seed)
    val counts = new Array[Int](two.targets.length)
    two.probe(hs, counts, hs.length) // cutoff = full coverage
    val ownBin = two.targetIndex(row.getString(1))
    // summed split-bin count >= n (sibling-bin FPs can only add)
    assert(counts(ownBin) >= hs.length)
  }

  test("two-level build survives a whole 64-bin group with zero hashes") {
    // >64 single-bin targets where the name-sorted TAIL (its own group)
    // has content shorter than k: those bins route nothing, the group gets
    // no shard row, and the build must materialize an empty shard instead
    // of leaving a null (crash pre-fix)
    val rows = (0 until 70).map { i =>
      val t = f"t$i%02d"
      val content = if (i >= 64) "" else s"content-of-$t-" * 5
      (t, content)
    }
    val df = rows.toDF("repo", "content")
    val two = SketchBuild.buildTwoLevel(spark, df, "repo", "content", p)
    assert(two.sizeBytes > 0) // walks every shard — NPEs on null
    val res = Classify.allMatches(Classify.classify(spark,
      df.withColumn("id", col("repo")), "id", "content", two,
      ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)))
    val hits = res.collect().map(r => (r.getString(0), r.getString(1)))
    // every non-empty doc still self-hits; empty docs are skipped
    (0 until 64).foreach(i => assert(hits.contains((f"t$i%02d", f"t$i%02d"))))
    assert(!hits.exists(_._2 >= "t64"))
  }
}
