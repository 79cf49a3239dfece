package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}
import graft.spark.GraftFunctions

/** Dump formatted physical plans for the engine's key paths — the
  * plan-quality review loop (pushdown, broadcast, codegen spans). */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def show(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      println(s"\n========== $name ==========")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted")))
    }

    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    show("q01 pushdown agg (filter+prune check)",
      li.filter(col("l_shipdate") < lit("1996-01-01"))
        .groupBy("l_returnflag")
        .agg(sum((col("l_quantity") * 100).cast("long"))))

    val docs = spark.read.parquet(s"$dir/documents.parquet")
    show("shingle projection (codegen check)",
      docs.select(GraftFunctions.shingles(col("text"), 8, 12).as("hs"))
        .select(sum(size(col("hs")))))

    show("build pass1 HLL (partial agg check)",
      SketchBuild.targetCardinalities(docs, "lang", "text", IbfParams(k = 8, w = 12)))

    val db = SketchBuild.build(spark, docs, "lang", "text",
      IbfParams(k = 8, w = 12, maxFp = 0.01))
    show("classify probe (map-only check)",
      Classify.allMatches(Classify.classify(spark, docs, "doc_id", "text", db,
        ClassifyParams())))

    val o = spark.read.parquet(s"$dir/orders.parquet")
    val c = spark.read.parquet(s"$dir/customer.parquet")
    show("dim join (broadcast check)",
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("c_mktsegment").count())

    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    show("cosine block-pair join (no corpus collect/broadcast check)",
      graft.ops.Ann.cosineNearDupPairs(spark, emb, "vec_id", "embedding",
        threshold = 0.95))

    show("LSH dedup candidates (band-only shuffle check)",
      graft.ops.Dedup.minhashPairs(spark,
        docs.select(col("doc_id").cast("long").as("id"),
          GraftFunctions.tokenHashes(col("text")).as("hs")),
        numPerms = 128, bands = 8, threshold = 1.0, oph = false))

    spark.stop()
  }
}
