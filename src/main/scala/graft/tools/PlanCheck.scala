package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Prints the physical plans of the LSH candidate-generation paths so the
  * no-sort-exchange claim is checkable (the round-3 minKIds cap). */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0 until 200).map(i => (i.toLong, s"tok${i % 17} tok${i % 5} x$i"))
      .toDF("id", "text")
      .select($"id", graft.spark.GraftFunctions.tokenHashes($"text").as("hs"))
    val plan = graft.ops.Dedup.minhashPairs(spark, df, 64, 8, 0.9)
      .queryExecution.executedPlan.toString
    val sorts = plan.linesIterator.count(l => l.contains("Sort "))
    val windows = plan.linesIterator.count(_.contains("Window"))
    val objAggs = plan.linesIterator.count(_.contains("ObjectHashAggregate"))
    println(s"[plan] minhashPairs: sorts=$sorts windows=$windows objHashAgg=$objAggs")
    // the only acceptable Sort nodes are SortMergeJoin sides (if any);
    // window-based capping would show Window + Sort-within-partition
    println(plan.linesIterator.filter(l =>
      l.contains("Sort ") || l.contains("Window")).mkString("\n"))
    spark.stop()
  }
}
