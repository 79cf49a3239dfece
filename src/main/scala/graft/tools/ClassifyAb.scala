package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}

/** Warmed A/B: full classify (ReadResult rows) vs probe-only (no row
  * materialization) — isolates the ReadResult construction+serialization
  * share of the classify stage. */
object ClassifyAb {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val corpus = spark.read.parquet("/tmp/graft_bench_corpus_1500000")
      .coalesce(128).cache()
    corpus.count()
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)
    val db = SketchBuild.build(spark, corpus, "repo", "content", p)
    val dbB = spark.sparkContext.broadcast(db)
    val cp = ClassifyParams(relCutoff = 0.25)

    def full(): Double = {
      val t0 = System.nanoTime()
      Classify.classify(spark, corpus, "path", "content", db, cp)
        .toDF().agg(sum(size(col("matches")))).first()
      (System.nanoTime() - t0) / 1e9
    }
    def probeOnly(): Double = {
      val t0 = System.nanoTime()
      corpus.select(graft.spark.GraftFunctions.shingles(
          col("content"), p.k, p.w, p.seed).as("hs"))
        .as[Array[Long]]
        .mapPartitions { iter =>
          val d = dbB.value
          val counts = new Array[Int](d.targets.length)
          iter.map { hs =>
            val n = hs.length
            if (n == 0 || n > cp.maxHashesPerRead) 0L
            else {
              val cutoff = math.max(1, math.ceil(n * cp.relCutoff).toInt)
              java.util.Arrays.fill(counts, 0)
              d.probe(hs, counts, cutoff)
              var acc = 0L; var b = 0
              while (b < counts.length) {
                if (counts(b) >= cutoff) acc += math.min(counts(b), n)
                b += 1
              }
              acc
            }
          }
        }.reduce(_ + _)
      (System.nanoTime() - t0) / 1e9
    }
    full(); probeOnly() // warm
    val pairs = (1 to reps).map(_ => (full(), probeOnly()))
    pairs.foreach { case (a, b) => println(f"[cab] full=$a%.2f probe=$b%.2f") }
    println(f"[cab] min full=${pairs.map(_._1).min}%.2f  " +
      f"min probe=${pairs.map(_._2).min}%.2f")
    spark.stop()
  }
}
