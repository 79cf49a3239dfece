package graft.build

import org.scalatest.funsuite.AnyFunSuite

import graft.classify.{Classify, ClassifyParams}
import graft.io.SketchStore
import graft.spark.SparkTestSession

/** `ganon update` capability (reference src/ganon/build_update.py:157,
  * tests/ganon/integration/test_update.py): incremental add/remove against
  * a built db must classify like a fresh build of the final target set. */
class UpdateSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val p = IbfParams(k = 3, w = 3, maxFp = 0.001)
  private def doc(repo: Int, i: Int) =
    (s"repo-$repo", (0 until 30).map(t => s"w${repo}_${(t * 7 + i) % 40}").mkString(" "))

  private lazy val baseDf = (1 to 8).flatMap(r => (0 until 5).map(i => doc(r, i)))
    .toDF("repo", "content")
  private lazy val addNewDf = (9 to 10).flatMap(r => (0 until 5).map(i => doc(r, i)))
    .toDF("repo", "content")
  private lazy val growDf = (0 until 3).map(i => doc(1, 100 + i))
    .toDF("repo", "content")

  private def matchSets(db: ProbeDb, df: org.apache.spark.sql.DataFrame) =
    Classify.allMatches(Classify.classify(spark, df.withColumn("id",
      org.apache.spark.sql.functions.concat_ws("#", $"repo", $"content")),
      "id", "content", db, ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)))
      .collect().map(r => (r.getString(0), r.getString(1))).toSet

  test("update(add new + grow existing) == fresh build classification") {
    val db = SketchBuild.build(spark, baseDf, "repo", "content", p)
    val updated = SketchBuild.update(spark, db,
      addNewDf.unionByName(growDf), "repo", "content")
    val fresh = SketchBuild.build(spark,
      baseDf.unionByName(addNewDf).unionByName(growDf), "repo", "content", p)
    val all = baseDf.unionByName(addNewDf).unionByName(growDf)
    // full-containment classification (cutoff 1.0) is FP-immune: both dbs
    // must produce exactly the own-target match set
    assert(matchSets(updated, all) == matchSets(fresh, all))
    assert(updated.targets.sorted.sameElements(fresh.targets.sorted))
  }

  test("update(remove) zeroes the target's bins; survivors untouched") {
    val db = SketchBuild.build(spark, baseDf, "repo", "content", p)
    val updated = SketchBuild.update(spark, db, null, "repo", "content",
      removeTargets = Seq("repo-3"))
    assert(!updated.targets.contains("repo-3"))
    val sets = matchSets(updated, baseDf)
    assert(!sets.exists(_._2 == "repo-3"))
    // every surviving repo still self-hits at full containment
    (1 to 8).filterNot(_ == 3).foreach { r =>
      assert(sets.exists(_._2 == s"repo-$r"), s"repo-$r lost")
    }
  }

  test("updated db survives a store roundtrip") {
    val db = SketchBuild.build(spark, baseDf, "repo", "content", p)
    val updated = SketchBuild.update(spark, db, addNewDf, "repo", "content",
      removeTargets = Seq("repo-2"))
    val dir = java.nio.file.Files.createTempDirectory("graft_upd").toString
    SketchStore.save(spark, updated, dir)
    val back = SketchStore.load(spark, dir)
    assert(back.ibf.words.sameElements(updated.ibf.words))
    assert(matchSets(back, baseDf.unionByName(addNewDf)) ==
      matchSets(updated, baseDf.unionByName(addNewDf)))
  }
}
