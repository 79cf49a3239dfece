package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hashing

/**
 * Similarity search over an embedding column (Array[Float]).
 *
 * Baseline: brute-force cosine top-k — broadcast the (small) query set,
 * score every corpus row map-side, take per-query top-k with one window.
 * Scale path: random-hyperplane LSH bucketing (signed projections ->
 * bit signature) so candidate generation touches only same-bucket rows;
 * at 100 TB the corpus side stays partitioned, nothing but (bucket, id,
 * vec) shuffles, and probing multiple signature permutations trades
 * recall for fan-out.
 */
object Ann {

  private def dotNorm(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i); nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }

  /**
   * Exact brute-force cosine top-k of `queries` against `corpus`
   * (both: idCol Long, vecCol Array[Float]). Queries are broadcast.
   * Returns (query_id, rank, neighbor_id, cosine). Self-matches excluded.
   */
  def bruteForceTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val qs = queries.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect()
    val qB = spark.sparkContext.broadcast(qs)
    val scored = corpus.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val queries = qB.value
        iter.flatMap { case (cid, cvec) =>
          queries.iterator.collect {
            case (qid, qvec) if qid != cid => (qid, cid, dotNorm(qvec, cvec))
          }
        }
      }.toDF("query_id", "neighbor_id", "cosine")
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank").cast("long").as("rank"),
        col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /**
   * Embedding-cosine near-duplicate pairs (exact): every pair with
   * cosine >= threshold, id_a < id_b. The corpus broadcasts once and each
   * partition scores its rows against the broadcast half-matrix — map-side
   * n^2/2 flops, zero shuffle before the tiny result. For corpora too big
   * to broadcast, candidate-generate with [[lshTopK]]'s buckets instead.
   */
  def cosineNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, threshold: Double): DataFrame = {
    import spark.implicits._
    val all = df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
    val allB = spark.sparkContext.broadcast(all)
    df.select(col(idCol).cast("long"), col(vecCol))
      .as[(Long, Array[Float])]
      .mapPartitions { iter =>
        val ref = allB.value
        iter.flatMap { case (id, vec) =>
          ref.iterator
            .dropWhile(_._1 <= id)
            .collect { case (oid, ovec)
              if dotNorm(vec, ovec) >= threshold => (id, oid) }
        }
      }.toDF("id_a", "id_b")
  }

  /** Random-hyperplane LSH signature (nBits signed projections). */
  def lshSignature(dim: Int, nBits: Int, seed: Long = 7L): Array[Float] => Long = {
    // deterministic pseudo-gaussian planes from splitmix64
    val planes = Array.tabulate(nBits, dim) { (b, d) =>
      val h = Hashing.mix64(seed + b.toLong * 131071L + d)
      // uniform(-1,1) is fine for sign-projection LSH
      (h.toDouble / Long.MaxValue).toFloat
    }
    (v: Array[Float]) => {
      var sig = 0L
      var b = 0
      while (b < nBits) {
        var dot = 0.0f
        val p = planes(b)
        var d = 0
        while (d < v.length && d < p.length) { dot += p(d) * v(d); d += 1 }
        if (dot >= 0) sig |= (1L << b)
        b += 1
      }
      sig
    }
  }

  /**
   * LSH-bucketed ANN: candidates share a `nBits`-bit hyperplane bucket;
   * exact cosine re-ranks within buckets. Approximate — recall measured
   * against [[bruteForceTopK]] in tests.
   */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 8): DataFrame = {
    import spark.implicits._
    val dim = corpus.select(col(vecCol)).as[Array[Float]].head().length
    val sigFn = lshSignature(dim, nBits)
    val sigUdf = udf((v: Array[Float]) => sigFn(v))
    val cTag = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).as("cvec")).withColumn("bucket", sigUdf(col("cvec")))
    val qTag = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("qvec")).withColumn("bucket", sigUdf(col("qvec")))
    val cos = udf((a: Array[Float], b: Array[Float]) => dotNorm(a, b))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    qTag.join(cTag, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .withColumn("cosine", cos(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("cid").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
