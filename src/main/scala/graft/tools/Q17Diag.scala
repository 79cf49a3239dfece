package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.spark.GraftFunctions

/** LSH candidate-volume probe for the q17 corpus: compares OPH vs
  * k-permutation MinHash band-bucket skew (bucket count, max bucket,
  * candidate pairs). Motivates q17's oph=false: small token sets leave
  * most OPH bins empty, densification correlates band keys, and candidate
  * volume explodes (measured 21M vs 4.2M pairs on sf0.1). */
object Q17Diag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    val sets = docs.select(col("doc_id").cast("long").as("id"),
      GraftFunctions.tokenHashes(col("text")).as("hs")).cache()
    sets.count()
    for (oph <- Seq(true, false)) {
      val sigCol = if (oph) GraftFunctions.minhashSignature(col("hs"), 128)
                   else GraftFunctions.minhashSignatureKPerm(col("hs"), 128)
      val keyed = sets.withColumn("sig", sigCol)
        .withColumn("band", explode(GraftFunctions.lshBandKeys(col("sig"), 8)))
        .select("band", "id")
      val t0 = System.nanoTime()
      val stats = keyed.groupBy("band").count().agg(
        count(lit(1)).as("buckets"), max("count").as("maxb"),
        sum((col("count") * (col("count") - lit(1)) / lit(2)).cast("long"))
          .as("pairs")).first()
      println(s"[diag] oph=$oph buckets=${stats.getLong(0)} " +
        s"maxBucket=${stats.getLong(1)} candPairs=${stats.getLong(2)} " +
        s"time=${(System.nanoTime() - t0) / 1e9}")
    }
    spark.stop()
  }
}
