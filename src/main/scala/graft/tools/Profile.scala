package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}
import graft.spark.GraftFunctions
import graft.synth.Corpus

/** Stage-by-stage wall-time profile of the build+classify pipeline. */
object Profile {
  def time[A](label: String)(f: => A): A = {
    val t0 = System.nanoTime()
    val r = f
    println(f"[profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    r
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.nonEmpty) args(0).toLong else 200000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val p = IbfParams(k = 19, w = 31, maxFp = 0.01)

    val corpus = time("gen+cache+count") {
      val c = Corpus.df(spark, rows, numRepos = 64, partitions = cpus * 4).cache()
      c.count(); c
    }
    time("shingles-only scan") {
      corpus.select(GraftFunctions.shingles(col("content"), p.k, p.w, p.seed).as("hs"))
        .select(sum(size(col("hs")))).first()
    }
    val cards = time("pass1 hll cardinalities") {
      SketchBuild.targetCardinalities(corpus, "repo", "content", p)
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1).toSeq
    }
    println(s"[profile] targets=${cards.length} maxN=${cards.map(_._2).max} " +
      s"totalN=${cards.map(_._2).sum}")
    val db = time("full build (p1+p2+asm)") {
      SketchBuild.build(spark, corpus, "repo", "content", p)
    }
    println(s"[profile] bitsPerBin=${db.plan.bitsPerBin} h=${db.plan.numHashes} " +
      s"ibfMB=${db.sizeBytes / 1e6}")
    time("classify probe") {
      Classify.classify(spark, corpus, "path", "content", db,
        ClassifyParams(relCutoff = 0.25))
        .toDF().agg(sum(size(col("matches")))).first()
    }
    time("probe-only (no ReadResult)") {
      import spark.implicits._
      val dbB = spark.sparkContext.broadcast(db)
      corpus.select(GraftFunctions.shingles(col("content"), p.k, p.w, p.seed).as("hs"))
        .as[Array[Long]]
        .mapPartitions { iter =>
          val d = dbB.value
          val counts = new Array[Int](d.targets.length)
          iter.map { hs =>
            java.util.Arrays.fill(counts, 0)
            d.probe(hs, counts, 1)
            var s = 0L; var i = 0
            while (i < counts.length) { s += counts(i); i += 1 }
            s
          }
        }.reduce(_ + _)
    }
    spark.stop()
  }
}
