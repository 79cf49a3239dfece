package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}

/** Warmed reps of the EXACT Bench corpusJob (build + classify at 1.5M
  * rows), split into build / classify legs — the headline-throughput
  * iteration loop for this optimization round. */
object CorpusAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = spark.read.parquet("/tmp/graft_bench_corpus_1500000")
      .coalesce(128).cache()
    corpus.count()
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)
    val cp = ClassifyParams(relCutoff = 0.25)

    def lap(): (Double, Double) = {
      val t0 = System.nanoTime()
      val db = SketchBuild.build(spark, corpus, "repo", "content", p)
      val t1 = System.nanoTime()
      Classify.classify(spark, corpus, "path", "content", db, cp)
        .toDF().agg(sum(size(col("matches")))).first()
      val t2 = System.nanoTime()
      ((t1 - t0) / 1e9, (t2 - t1) / 1e9)
    }
    // warm on a sample like Bench does
    val s = corpus.sample(withReplacement = false, 0.07, 42)
    val dbw = SketchBuild.build(spark, s, "repo", "content", p)
    Classify.classify(spark, s, "path", "content", dbw, cp)
      .toDF().agg(sum(size(col("matches")))).first()
    (1 to reps).foreach { _ =>
      val (b, c) = lap()
      println(f"[corpus] build=$b%.2f classify=$c%.2f total=${b + c}%.2f s")
    }
    spark.stop()
  }
}
