package graft.api

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IbfParams, TwoLevelSketchDb}
import graft.classify.ClassifyParams
import graft.spark.SparkTestSession
import graft.synth.Corpus

/** End-to-end through the verb facade — the "reference user switches over"
  * workflow: build -> save -> load -> classify -> reassign -> report -> table. */
class GanonApiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val corpus = Corpus.df(spark, 250, numRepos = 10, partitions = 4)
    .cache()
  private val p = IbfParams(k = 8, w = 12, maxFp = 0.01)

  test("full ganon workflow through the facade") {
    // build + persist + reload (flat)
    val db = Ganon.build(spark, corpus, "repo", "content", p)
    val dir = java.nio.file.Files.createTempDirectory("graft_api").toString
    Ganon.save(spark, db, dir)
    val loaded = Ganon.load(spark, dir)
    assert(loaded.targets.sameElements(db.targets))

    // taxonomy for LCA
    val tax = corpus.select($"repo".as("node"), $"lang".as("parent"))
      .distinct()
      .union(corpus.select($"lang".as("node"), lit("root").as("parent")).distinct())
      .withColumn("rank", lit("auto")).withColumn("name", col("node"))
      .withColumn("genome_size", lit(1L))

    // classify
    val out = Ganon.classify(spark, corpus.withColumn("id", $"path"),
      "id", "content", loaded, ClassifyParams(relCutoff = 0.25), Some(tax))
    val n = corpus.count()
    assert(out.one.count() == n) // zero FN -> everything classified
    assert(out.sta.first().getAs[Long]("seqs_classified") == n)
    assert(out.all.count() ==
      out.rep.agg(sum("matches")).first().getLong(0))

    // reassign multi-matches
    val one2 = Ganon.reassign(spark, out.all)
    assert(one2.select("read_id").distinct().count() == n)

    // report over root -> lang -> repo
    val lineage = corpus.select($"repo", $"lang").distinct()
      .select($"repo".as("node"),
        array(lit("root"), $"lang", $"repo").as("lineage"))
      .union(corpus.select($"lang".as("node"),
        array(lit("root"), $"lang").as("lineage")).distinct())
      .union(Seq(("root", Array("root"))).toDF("node", "lineage"))
    val counts = one2.groupBy($"target".as("node"))
      .agg(count(lit(1)).as("direct_count"))
    val tre = Ganon.report(counts, lineage)
    val root = tre.filter($"node" === "root").first()
    assert(root.getAs[Long]("cumulative") == n)

    // table: sample = lang, node = repo
    val rep = corpus.groupBy($"lang".as("sample"), $"repo".as("node"))
      .agg(count(lit(1)).as("count"))
    val nodes = corpus.select("repo").distinct()
      .collect().map(_.getString(0)).sorted.toSeq
    val piv = Ganon.table(rep, nodes)
    assert(piv.count() == corpus.select("lang").distinct().count())
  }

  test("two-level store roundtrip classifies identically") {
    val two = Ganon.build(spark, corpus, "repo", "content", p, twoLevel = true)
    val dir = java.nio.file.Files.createTempDirectory("graft_api2").toString
    Ganon.save(spark, two, dir)
    val loaded = Ganon.load(spark, dir)
    assert(loaded.isInstanceOf[TwoLevelSketchDb])
    val reads = corpus.limit(60).withColumn("id", $"path")
    val a = Ganon.classify(spark, reads, "id", "content", two)
      .all.collect().map(_.toString).sorted
    val b = Ganon.classify(spark, reads, "id", "content", loaded)
      .all.collect().map(_.toString).sorted
    assert(a.sameElements(b))
  }
}
