package graft
import org.apache.spark.sql.SparkSession

/** Dev tool: run ONE SparkEntry query against an SF dir and print its row
  * count plus whether every row's `ok` column (the invariant-oracle
  * convention) holds — the fast inner loop while authoring a driver row,
  * without the full `graft.Verify` sweep.
  * Usage: runMain graft.RunOne /root/testdata/sf0.001 q69_stream_live */
object RunOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, name) = args
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    val rows = df.collect()
    println(s"ROWS=${rows.length}")
    val okIdx = df.schema.fieldNames.indexOf("ok")
    if (okIdx >= 0) println(s"ALL_OK=${rows.forall(_.getBoolean(okIdx))}")
  }
}
