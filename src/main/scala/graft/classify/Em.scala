package graft.classify

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * EM reassignment of multi-match reads (capability of ganon reassign,
 * src/ganon/reassign.py:8-224): initialize target probabilities from
 * unique-match counts, then iterate
 *   argmax-assign each multi-match read -> recount per target -> new probs
 * until the L1 prob change < threshold or maxIter (default 10,
 * src/ganon/config.py:770-776).
 *
 * Driver-looped over a cached matches DataFrame: each iteration is one
 * broadcast join (probs are |targets| rows) + one per-read window argmax +
 * one groupBy count. Tie-break: the reference keeps the FIRST listed match
 * (reassign.py:227-241); Spark rows have no implicit order, so the stable
 * order column is (count desc, target asc).
 */
object Em {

  /**
   * @param all      the `.all` relation (read_id, target, kmer_count)
   * @param unique   read_ids with exactly one match get weight-1 priors
   * @return (read_id, target, kmer_count) final assignment per read
   */
  def reassign(spark: SparkSession, all: DataFrame, maxIter: Int = 10,
      threshold: Double = 0.001): DataFrame = {
    val matches = all.persist()
    val nMatches = matches.groupBy("read_id")
      .agg(count(lit(1)).as("n_m"))
    val withN = matches.join(broadcast(nMatches.filter(col("n_m") === 1)),
      Seq("read_id"), "left")
    val uniques = withN.filter(col("n_m").isNotNull)
      .select("read_id", "target", "kmer_count")
    val multis = withN.filter(col("n_m").isNull)
      .select("read_id", "target", "kmer_count").persist()

    // init probs from unique counts (+1 smoothing so zero-unique targets
    // can still attract reads, as reassign.py's eps does)
    // unique-match counts are loop-invariant: collect once (|targets| rows)
    val uniqueCounts = uniques.groupBy("target").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val allTargets = matches.select("target").distinct()
      .collect().map(_.getString(0))
    var probs = allTargets
      .map(t => t -> (uniqueCounts.getOrElse(t, 0L) + 1.0)).toMap

    var assigned: DataFrame = null
    var iter = 0
    var diff = Double.MaxValue
    while (iter < maxIter && diff > threshold) {
      val pDf = spark.createDataFrame(
        spark.sparkContext.parallelize(probs.toSeq.sortBy(_._1), 1))
        .toDF("target", "p")
      val w = Window.partitionBy("read_id")
        .orderBy(col("score").desc, col("target").asc)
      assigned = multis
        .join(broadcast(pDf), Seq("target"))
        .withColumn("score", col("kmer_count") * col("p"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("read_id", "target", "kmer_count")
      val counts = assigned.groupBy("target").agg(count(lit(1)).as("c"))
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val totals = allTargets.map(t =>
        t -> (counts.getOrElse(t, 0L) + uniqueCounts.getOrElse(t, 0L) + 1.0))
      val z = totals.map(_._2).sum
      val newProbs = totals.map { case (t, c) => t -> c / z }.toMap
      diff = allTargets.map { t =>
        val z0 = probs.values.sum
        math.abs(newProbs(t) - probs(t) / z0)
      }.sum
      probs = newProbs.map { case (t, p) => t -> p * z } // keep unnormalized scale
      iter += 1
    }
    val result = uniques.unionByName(
      if (assigned == null) multis.limit(0) else assigned)
    multis.unpersist(); matches.unpersist()
    result
  }
}
