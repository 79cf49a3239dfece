package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spark.GraftFunctions

/** Candidate-volume probe for the q45 corpus: simhash band-bucket skew
  * (bucket count, max bucket, candidate pairs) on the planted-dup union. */
object Q45Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs0 = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
      .select(col("doc_id").cast("long").as("id"), col("text"))
    val docs = docs0.unionByName(docs0.filter(col("id") % 5 === 0)
      .select((col("id") + 10000000L).as("id"), col("text")))
    val banded = docs
      .select(col("id"), GraftFunctions.simhash(
        GraftFunctions.tokenHashes(col("text"))).as("simhash"))
      .select(col("id"), explode(array((0 until 4).map(i =>
        struct(lit(i).as("band_no"),
          shiftright(col("simhash"), i * 16).bitwiseAND(lit(0xFFFFL))
            .as("band_val"))): _*)).as("b"))
    val stats = banded.groupBy("b").count().agg(
      count(lit(1)).as("buckets"), max("count").as("maxb"),
      sum((col("count") * (col("count") - lit(1)) / lit(2)).cast("long"))
        .as("pairs")).first()
    println(s"[q45diag] buckets=${stats.getLong(0)} " +
      s"maxBucket=${stats.getLong(1)} candPairs=${stats.getLong(2)}")
    spark.stop()
  }
}
