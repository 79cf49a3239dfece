package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Benchmark DECONTAMINATION for training corpora: flag training documents
 * that share at least `minOverlap` distinct byte n-grams with ANY
 * evaluation document — the standard pre-training hygiene pass that keeps
 * eval data out of the training set (n-gram overlap is the published
 * GPT-3/PaLM-style criterion).
 *
 * Scale shape: the EVAL side is small by nature (benchmarks, not
 * corpora), so its distinct gram-hash set is collected once and
 * broadcast; the TRAINING side — the 100 TB side — is a MAP-ONLY probe
 * (per-row distinct grams via the codegen'd shingle expression, counted
 * against the broadcast set), no shuffle, no join. Grams are the same
 * w==k full-gram hash sets the classify oracles replay as hex
 * substrings, so a SQL oracle can recompute overlap counts exactly.
 */
object Decontaminate {

  /** @return (doc_id, n_overlap, contaminated) for every training row;
    *         n_overlap = |distinct k-grams(train doc) ∩ distinct
    *         k-grams(all eval docs)|.
    * @param maxEvalGrams driver-safety cap on the eval side's distinct
    *        gram count: the eval-side-must-be-small contract made
    *        explicit (same discipline as Ann.cosineNearDupPairs'
    *        maxRows guard) — an accidentally huge "eval" frame (or
    *        swapped train/eval arguments) fails with this message
    *        instead of a driver OOM. 2^27 grams ≈ 1 GiB broadcast. */
  def overlap(spark: SparkSession, train: DataFrame, eval: DataFrame,
      idCol: String, textCol: String, k: Int = 8,
      minOverlap: Int = 8, maxEvalGrams: Long = 1L << 27): DataFrame = {
    import spark.implicits._
    val gramsOf = (t: org.apache.spark.sql.Column) =>
      graft.spark.ShinglesExpr.col(coalesce(t, lit("")), k, k,
        graft.core.Hashing.DefaultSeed)
    // guarded collect in ONE job: pull at most maxEvalGrams+1 rows — the
    // driver never materializes more than the budget either way, and one
    // extra row is enough to prove the contract was violated (a separate
    // pre-count would cost a second job on every call)
    val lim = math.min(maxEvalGrams + 1, (Int.MaxValue - 1).toLong).toInt
    val evalGrams = eval.select(explode(gramsOf(col(textCol))).as("g"))
      .distinct().limit(lim).as[Long].collect().sorted
    require(evalGrams.length <= maxEvalGrams,
      s"Decontaminate.overlap collects the EVAL side's distinct grams to " +
        s"the driver and broadcasts them: more than " +
        s"maxEvalGrams=$maxEvalGrams distinct grams " +
        s"(~${maxEvalGrams * 8 / (1 << 20)}+ MiB). The eval side must be " +
        "the small benchmark set — check the argument order (train/eval " +
        "swapped?), or raise maxEvalGrams if the driver really has the " +
        "memory.")
    val egB = spark.sparkContext.broadcast(evalGrams)
    val countIn = udf((hs: Array[Long]) => {
      val eg = egB.value
      var n = 0
      var i = 0
      while (i < hs.length) {
        if (java.util.Arrays.binarySearch(eg, hs(i)) >= 0) n += 1
        i += 1
      }
      n.toLong
    })
    train.select(col(idCol).cast("long").as("doc_id"),
        countIn(gramsOf(col(textCol))).as("n_overlap"))
      .withColumn("contaminated", col("n_overlap") >= minOverlap)
  }
}
