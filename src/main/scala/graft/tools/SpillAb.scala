package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}

/** A/B of the bench corpus job with and without the persisted shingle
  * projection (the .min-spill analog) — interleaved, min-of-k per arm. */
object SpillAb {
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

    def job(persist: Boolean): Double = {
      val t0 = System.nanoTime()
      val db = SketchBuild.build(spark, corpus, "repo", "content",
        IbfParams(k = 19, w = 31, maxFp = 0.01), persistShingles = persist)
      Classify.classify(spark, corpus, "path", "content", db,
        ClassifyParams(relCutoff = 0.25))
        .toDF().agg(sum(size(col("matches")))).first()
      (System.nanoTime() - t0) / 1e9
    }
    job(false); job(true) // warm both paths
    val pairs = (1 to reps).map(_ => (job(false), job(true)))
    pairs.foreach { case (a, b) => println(f"[ab] off=$a%.2f on=$b%.2f") }
    println(f"[ab] min off=${pairs.map(_._1).min}%.2f  " +
      f"min on=${pairs.map(_._2).min}%.2f")
    spark.stop()
  }
}
