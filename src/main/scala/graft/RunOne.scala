package graft
import org.apache.spark.sql.SparkSession
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
    println(s"ALL_OK=${rows.forall(r => r.getAs[Boolean]("ok"))}")
  }
}
