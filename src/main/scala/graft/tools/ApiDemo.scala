package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api.Ganon
import graft.build.IbfParams
import graft.classify.ClassifyParams
import graft.synth.Corpus

/** Drives the verb facade end-to-end (the "switch from ganon" workflow):
  * build -> save -> load -> classify -> reassign -> report -> table. */
object ApiDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val corpus = Corpus.df(spark, 500, numRepos = 12, partitions = 8).cache()
    val p = IbfParams(k = 8, w = 12, maxFp = 0.01)
    val twoLevel = args.contains("two")

    val db = Ganon.build(spark, corpus, "repo", "content", p, twoLevel)
    val dir = java.nio.file.Files.createTempDirectory("graft_apidemo").toString
    Ganon.save(spark, db, dir)
    val loaded = Ganon.load(spark, dir)
    println(s"[api] layout=${loaded.getClass.getSimpleName} " +
      s"bins=${loaded.targets.length} saved+loaded at $dir")

    val tax = corpus.select($"repo".as("node"), $"lang".as("parent")).distinct()
      .union(corpus.select($"lang".as("node"), lit("root").as("parent")).distinct())
      .withColumn("rank", lit("auto")).withColumn("name", col("node"))
      .withColumn("genome_size", lit(1L))
    val out = Ganon.classify(spark, corpus.withColumn("id", $"path"),
      "id", "content", loaded, ClassifyParams(relCutoff = 0.25), Some(tax))
    out.sta.show(truncate = false)
    // observed metrics ride the next action — no extra pass
    val (obsDf, obs) = graft.classify.Classify.observed(out.results)
    obsDf.count()
    println(s"[api] observed=${obs.get}")
    val one2 = Ganon.reassign(spark, out.all)
    println(s"[api] reassigned=${one2.count()} classified=${out.one.count()} " +
      s"unclassified=${out.unc.count()}")

    // multi-filter level: split the corpus into two filters over disjoint
    // repos; every read must still hit its own repo via one of them
    val even = corpus.filter(xxhash64($"repo") % 2 === 0)
    val odd = corpus.filter(xxhash64($"repo") % 2 =!= 0)
    val dbE = Ganon.build(spark, even, "repo", "content", p)
    val dbO = Ganon.build(spark, odd, "repo", "content", p)
    val mf = graft.classify.Classify.classifyMultiFilter(spark,
      corpus.withColumn("id", concat($"repo", lit("#"), $"path")),
      "id", "content", Seq(dbE, dbO), ClassifyParams(relCutoff = 0.25))
    val mfSelf = graft.classify.Classify.allMatches(mf)
      .filter(expr("substring_index(read_id, '#', 1) = target")).count()
    println(s"[api] multiFilter selfHit=$mfSelf/${corpus.count()}")

    val lineage = corpus.select($"repo", $"lang").distinct()
      .select($"repo".as("node"), array(lit("root"), $"lang", $"repo").as("lineage"))
      .union(corpus.select($"lang".as("node"),
        array(lit("root"), $"lang").as("lineage")).distinct())
      .union(Seq(("root", Array("root"))).toDF("node", "lineage"))
    val counts = one2.groupBy($"target".as("node"))
      .agg(count(lit(1)).as("direct_count"))
    Ganon.report(counts, lineage).show(8, truncate = false)

    val rep = corpus.groupBy($"lang".as("sample"), $"repo".as("node"))
      .agg(count(lit(1)).as("count"))
    val nodes = corpus.select("repo").distinct().collect()
      .map(_.getString(0)).sorted.toSeq
    val piv = Ganon.table(rep, nodes)
    val trimmed = graft.report.Table.trimZeros(piv, nodes)
    val capped = graft.report.Report.maxCountFilter(
      Ganon.report(counts, lineage), 0.5, one2.count())
    println(s"[api] table rows=${piv.count()} trimmedCols=${trimmed.columns.length} " +
      s"maxCountFiltered=${capped.count()}")
    println("[api] OK")
    spark.stop()
  }
}
