package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Plan check: does the split-free shard-routing fast path evaluate the
  * shingle expression once or twice (filter-pushdown-through-project)? */
object RouteePlan {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val hashed = docs.select(col("source").as("target"),
      graft.spark.GraftFunctions.shingles(col("text"), 8, 8).as("hs"))
    val entries = Seq(("src0", 0, 1), ("src1", 1, 1))
    val layoutDf = broadcast(
      spark.createDataFrame(entries).toDF("target", "base", "split"))
    val routed = hashed.join(layoutDf, Seq("target"))
      .select(shiftright(col("base"), 6).as("grp"), col("base"),
        col("split"), col("hs"))
    val plan = routed.queryExecution.executedPlan.toString
    println(plan)
    val n = "shingles\\(".r.findAllIn(plan).length
    println(s"[routeplan] shingles occurrences in plan: $n")
    spark.stop()
  }
}
