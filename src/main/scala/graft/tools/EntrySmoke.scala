package graft.tools

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: SparkEntry.entry(spark) must return >0 rows. */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = graft.SparkEntry.entry(spark).count()
    println(s"[entry-smoke] rows=$n")
    require(n > 0, "entry returned no rows")
    spark.stop()
  }
}
