package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}

/** Micro-costs of the store control plane on the driver: tiny-parquet
  * write/read jobs (the manifest/bins ops every commit and load pays),
  * plus end-to-end buildToStore / load / updateStored on the sf0.1
  * documents fixture — the evidence base for making store metadata ops
  * O(1) driver I/O instead of scheduled Spark jobs. */
object MetaBench {
  private def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[meta] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .cache()
    docs.count()
    val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
    val dir = "/tmp/graft_metabench_store"
    def rmrf(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rmrf))
      f.delete()
    }

    // warm lap
    rmrf(new java.io.File(dir))
    SketchBuild.buildToStore(spark, docs, "source", "text", dir, p)
    graft.io.SketchStore.loadTwoLevelLazy(spark, dir)

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      rmrf(new java.io.File(dir))
      time("buildToStore (5k docs)") {
        SketchBuild.buildToStore(spark, docs, "source", "text", dir, p)
      }
      time("loadTwoLevelLazy") {
        graft.io.SketchStore.loadTwoLevelLazy(spark, dir)
      }
      time("updateStored remove-1") {
        SketchBuild.updateStored(spark, dir, null, "source", "text",
          removeTargets = Seq("src0"))
      }
      time("tiny parquet WRITE (1 row)") {
        Seq((1, "x")).toDF("a", "b").coalesce(1)
          .write.mode("overwrite").parquet("/tmp/graft_meta_tiny.parquet")
      }
      time("tiny parquet READ (head)") {
        spark.read.parquet("/tmp/graft_meta_tiny.parquet").head()
      }
      time("flat build (5k docs)") {
        SketchBuild.build(spark, docs, "source", "text", p)
      }
      time("pass1 only (HLL agg+collect)") {
        SketchBuild.targetCardinalities(docs, "source", "text", p).collect()
      }
    }
    spark.stop()
  }
}
