package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one SparkEntry query at a given SF dir. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = if (args.nonEmpty) args(0) else "q17_minhash_dups"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(name)(spark, dir).count()
    println(f"[timeq] $name rows=$n in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
