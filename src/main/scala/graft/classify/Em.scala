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
    // bucket the multi-match relation by read_id ONCE: every iteration's
    // per-read argmax window then reuses this partitioning (sort only,
    // no exchange), instead of re-shuffling the full relation x maxIter
    val multis = withN.filter(col("n_m").isNull)
      .select("read_id", "target", "kmer_count")
      .repartition(col("read_id")).persist()

    // init probs from unique counts (+1 smoothing so zero-unique targets
    // can still attract reads, as reassign.py's eps does)
    // unique-match counts are loop-invariant: collect once (|targets| rows)
    val uniqueCounts = uniques.groupBy("target").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    val allTargets = matches.select("target").distinct()
      .collect().map(_.getString(0))
    def normalized(totals: Seq[(String, Double)]): Map[String, Double] = {
      val z = totals.map(_._2).sum
      totals.map { case (t, c) => t -> c / z }.toMap
    }
    var probs = normalized(allTargets
      .map(t => t -> (uniqueCounts.getOrElse(t, 0L) + 1.0)).toSeq)

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
      val newProbs = normalized(allTargets.map(t =>
        t -> (counts.getOrElse(t, 0L) + uniqueCounts.getOrElse(t, 0L) + 1.0)).toSeq)
      // L1 distance between consecutive normalized prob vectors — one pass
      diff = allTargets.iterator.map(t => math.abs(newProbs(t) - probs(t))).sum
      probs = newProbs
      iter += 1
    }
    val result = uniques.unionByName(
      if (assigned == null) multis.limit(0) else assigned)
    multis.unpersist(); matches.unpersist()
    result
  }

  /** EM `.one` plus the rewritten `.rep` (reference reassign.py:180-224:
    * after EM the report's lca column becomes reassigned − unique). Returns
    * (one, rep) where rep = (target, unique_reads, lca_reads, matches):
    * unique_reads from single-match reads, lca_reads = EM-reassigned multis,
    * matches = total `.all` rows per target. */
  def reassignWithRep(spark: SparkSession, all: DataFrame, maxIter: Int = 10,
      threshold: Double = 0.001): (DataFrame, DataFrame) = {
    val one = reassign(spark, all, maxIter, threshold).persist()
    val nM = all.groupBy("read_id").agg(count(lit(1)).as("n_m"))
    val uniqueReads = all.join(broadcast(nM.filter(col("n_m") === 1)), Seq("read_id"))
      .groupBy("target").agg(count(lit(1)).as("unique_reads"))
    val assignedAll = one.groupBy("target").agg(count(lit(1)).as("assigned"))
    val matches = all.groupBy("target").agg(count(lit(1)).as("matches"))
    val rep = matches
      .join(assignedAll, Seq("target"), "left")
      .join(uniqueReads, Seq("target"), "left")
      .na.fill(0L, Seq("assigned", "unique_reads"))
      .withColumn("lca_reads", col("assigned") - col("unique_reads"))
      .select("target", "unique_reads", "lca_reads", "matches")
    (one, rep)
  }
}
