package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** EM scaling probe: synthesize a multi-match relation at a given target
  * count and time `Em.reassign`'s iterations — the measurement behind the
  * 10^6-target scaling note in [[graft.classify.Em]]. The per-iteration
  * cost must stay flat across iterations (nothing accumulates) and scale
  * ~linearly in |targets|: the count aggregation is a shuffle-free
  * treeAggregate of dense arrays, the argmax a map over grouped reads.
  *
  * Usage: runMain graft.tools.EmScale [nTargets] [nReads] [candsPerRead]
  */
object EmScale {
  def main(args: Array[String]): Unit = {
    val nTargets = if (args.length > 0) args(0).toInt else 1000000
    val nReads = if (args.length > 1) args(1).toInt else 2000000
    val cands = if (args.length > 2) args(2).toInt else 4
    // NOTE: driver heap comes from the launching JVM (sbt/JAVA_OPTS) —
    // spark.driver.memory set here would be inert in an in-process master
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // synthetic .all relation: every read matches `cands` targets drawn
    // deterministically; ~1% of reads are unique-match (seed the priors)
    val all = spark.range(nReads.toLong).select(
        concat(lit("r"), col("id")).as("read_id"),
        explode(sequence(lit(0), lit(cands - 1))).as("j"),
        col("id"))
      .select(col("read_id"),
        concat(lit("t"), pmod(col("id") * 7919 + col("j") * 104729,
          lit(nTargets.toLong))).as("target"),
        (pmod(col("id") + col("j"), lit(7)) + 1).cast("long")
          .as("kmer_count"))
      .where(col("j") === 0 || pmod(xxhash64(col("read_id")), lit(100)) =!= 0)

    val t0 = System.nanoTime()
    val out = graft.classify.Em.reassign(spark, all, maxIter = 3,
      threshold = 0.0) // threshold 0 forces all 3 iterations
    val n = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"EMSCALE targets=$nTargets reads=$nReads cands=$cands " +
      f"assigned_rows=$n wall=$secs%.1f s (3 iterations)")
    spark.stop()
  }
}
