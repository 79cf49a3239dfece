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

  /** Embedding dimensionality = MAX vector length in the frame. A
    * first-row-only read would crash on empty input and silently truncate
    * every projection when later rows are wider. */
  private def vecDim(df: DataFrame, vecCol: String): Int = {
    val r = df.agg(max(size(col(vecCol)))).first()
    require(!r.isNullAt(0), s"cannot derive embedding dim: '$vecCol' is empty")
    r.getInt(0)
  }

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
   * Embedding-cosine near-duplicate pairs (EXACT): every pair with
   * cosine >= threshold, id_a < id_b — as a block-partitioned pair join.
   * Rows are bucketed into B blocks by id; each unordered block pair
   * {i, j} is one join cell evaluated by one task (block-nested-loop),
   * so the full O(n^2) compare distributes over B(B+1)/2 tasks with no
   * corpus collect and no driver broadcast; executor memory is bounded by
   * two blocks. B scales with both parallelism and corpus size.
   *
   * This is the honest exact shape: hyperplane-LSH candidates cannot give
   * deterministic completeness at a threshold where pairs sit epsilon-close
   * to it (the planted pairs here land at cosine 0.501 vs t=0.5 — any
   * bounded table count misses them with nonzero probability). For the
   * high-threshold approximate regime use [[lshNearDupPairs]].
   *
   * The O(n²) compute is a deliberate cost of the exact semantics, so the
   * call REFUSES inputs above `maxRows` (default 1M ≈ 5·10¹¹ compares)
   * unless `force = true` — the guard makes the quadratic footgun explicit
   * instead of letting a casual caller launch a month-long job; the error
   * points at the approximate scale path.
   */
  def cosineNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, blocks: Int = 0,
      maxRows: Long = 1L << 20, force: Boolean = false): DataFrame = {
    val v = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
    val n = v.count()
    require(force || n <= maxRows,
      s"cosineNearDupPairs is EXACT and O(n^2): n=$n rows exceed " +
        s"maxRows=$maxRows (~${n * n / 2} vector compares). Use " +
        "lshNearDupPairs (bucketed LSH + exact verify, the scale path) " +
        "unless you truly need exact epsilon-close-threshold completeness; " +
        "then pass force = true.")
    val parts = spark.sparkContext.defaultParallelism
    val b =
      if (blocks > 0) blocks
      else math.max(math.ceil(math.sqrt(2.0 * parts)).toInt,
        math.min(1024, math.ceil(n / 4096.0).toInt))
    // one grouped row per block (ids + vectors), decoded to primitive
    // arrays ONCE PER CELL — the old row-level cell join re-materialized
    // both vectors from Catalyst arrays through a UDF for every one of the
    // O(n^2) pairs; here a cell's task converts |A|+|B| vectors and then
    // runs the pair sweep as a pure float loop (guide §4.2: batch the
    // boundary crossing, do the heavy lifting in tight native loops)
    val grouped = v
      .groupBy(pmod(col("id"), lit(b)).cast("int").as("blk"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("rows"))
    val cells = spark.range(b).select(col("id").cast("int").as("bi"))
      .join(spark.range(b).select(col("id").cast("int").as("bj")),
        col("bi") <= col("bj"))
    val joined = grouped.join(broadcast(cells), col("blk") === col("bi"))
      .select(col("bi"), col("bj"), col("rows").as("ra"))
      .join(grouped.select(col("blk").as("bj2"), col("rows").as("rb")),
        col("bj") === col("bj2"))
      .select(col("bi"), col("bj"), col("ra"), col("rb"))
    // each unordered pair lands in exactly one cell: distinct blocks ->
    // the (min,max)-block cell with any id order; same block -> the
    // diagonal cell with id order. Output ids canonicalized (a < b).
    import spark.implicits._
    val pairs = joined.rdd.flatMap { r =>
      def decode(s: scala.collection.Seq[org.apache.spark.sql.Row])
          : (Array[Long], Array[Array[Float]]) = {
        val m = s.length
        val ids = new Array[Long](m)
        val vs = new Array[Array[Float]](m)
        var i = 0
        s.foreach { e =>
          ids(i) = e.getLong(0)
          vs(i) = e.getSeq[Float](1).toArray
          i += 1
        }
        (ids, vs)
      }
      val sameBlock = r.getInt(0) == r.getInt(1)
      val (ia, va) = decode(r.getSeq(2))
      val (ib, vb) = decode(r.getSeq(3))
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      var i = 0
      while (i < ia.length) {
        var j = 0
        while (j < ib.length) {
          // same-block (diagonal) cells pair by id order; cross-block
          // cells take every distinct-id pair — identical predicates to
          // the row-level join this replaces
          if (if (sameBlock) ia(i) < ib(j) else ia(i) != ib(j)) {
            if (dotNorm(va(i), vb(j)) >= threshold)
              out += ((math.min(ia(i), ib(j)), math.max(ia(i), ib(j))))
          }
          j += 1
        }
        i += 1
      }
      out
    }
    pairs.toDF("id_a", "id_b")
  }

  /**
   * Approximate near-dup pairs via multi-table hyperplane LSH: candidates
   * share an r-bit signature in at least one of `tables` tables; exact
   * cosine verifies inside the bucket join (same shape as minhashPairs).
   * Recall for a pair at angle theta: 1-(1-p^r)^T with p = 1-theta/pi —
   * sized for the high-threshold regime, measured in OpsSpec.
   */
  def lshNearDupPairs(spark: SparkSession, df: DataFrame, idCol: String,
      vecCol: String, threshold: Double, nBits: Int = 8, tables: Int = 12,
      maxBucket: Int = 10000): DataFrame = {
    val dim = vecDim(df, vecCol)
    val sigs = (0 until tables).map(t2 => lshSignature(dim, nBits, 7L + t2 * 1000003L))
    val keyUdf = udf((v2: Array[Float]) =>
      sigs.zipWithIndex.map { case (f, t2) => t2.toLong << 32 | f(v2) }.toArray)
    val keyed = df.select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("key", explode(keyUdf(col("vec"))))
      .select("key", "id")
    // bucket cap via the minKIds aggregation (no window sort exchange,
    // observable truncation) — same discipline as Dedup.minhashPairs
    val (cappedA, cappedB) =
      Dedup.cappedBuckets(spark, keyed, "key", maxBucket,
        "ann_lsh_dropped_bucket_members")
    val cand = cappedA.as("a").join(cappedB.as("b"),
        col("a.key") === col("b.key") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    val va = df.select(col(idCol).cast("long").as("id_a"), col(vecCol).as("va"))
    val vb = df.select(col(idCol).cast("long").as("id_b"), col(vecCol).as("vb"))
    val cos = udf((a: Array[Float], bv: Array[Float]) => dotNorm(a, bv))
    cand.join(va, Seq("id_a")).join(vb, Seq("id_b"))
      .filter(cos(col("va"), col("vb")) >= threshold)
      .select(col("id_a"), col("id_b"))
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
   * IVF (inverted-file) ANN — the centroid-partitioned scale path next to
   * [[lshTopK]]: a small spherical-k-means codebook is trained on a
   * BOUNDED sample (driver-side Lloyd over ≤ `sampleCap` rows —
   * deterministic seeds, no RNG state), every corpus row is assigned
   * map-side to its nearest centroid (`cell` column — at real scale this
   * is the partitioning/bucketing column, so a probe touches only
   * nProbe/nCells of the data), and each query scans only its `nProbe`
   * nearest cells with the exact cosine re-rank inside the cell join.
   * Returns the same (query_id, rank, neighbor_id, cosine) shape as
   * [[bruteForceTopK]]; recall is measured against it in OpsSpec and
   * bounded in the driver query (q60).
   */
  def ivfTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nCells: Int = 32,
      nProbe: Int = 8, iters: Int = 8, sampleCap: Int = 8192,
      seed: Long = 17L): DataFrame = {
    import spark.implicits._
    val centroids = ivfTrain(spark, corpus, idCol, vecCol, nCells, iters,
      sampleCap, seed)
    val cB = spark.sparkContext.broadcast(centroids)
    def nearestCells(v: Array[Float], n: Int): Array[Int] = {
      val cs = cB.value
      cs.indices.map(i => (i, dotNorm(cs(i), v))).sortBy(-_._2)
        .take(n).map(_._1).toArray
    }
    // corpus-side assignment is THE per-row hot path (the query side is
    // small and keeps the sorted top-n): a linear argmax, no boxed tuple
    // list + sort per row
    val assignUdf = udf((v: Array[Float]) => {
      val cs = cB.value
      var best = 0; var bs = Double.MinValue
      var c = 0
      while (c < cs.length) {
        val s = dotNorm(cs(c), v)
        if (s > bs) { bs = s; best = c }
        c += 1
      }
      best
    })
    val probeUdf = udf((v: Array[Float]) => nearestCells(v, nProbe))
    val cells = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).as("cvec")).withColumn("cell", assignUdf(col("cvec")))
    val qs = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("qvec")).withColumn("cell", explode(probeUdf(col("qvec"))))
    val cos = udf((a: Array[Float], b: Array[Float]) => dotNorm(a, b))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    qs.join(cells, Seq("cell"))
      .filter(col("qid") =!= col("cid"))
      .dropDuplicates("qid", "cid")
      .withColumn("cosine", cos(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("cid").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }

  /** Deterministic spherical k-means codebook from a bounded sample:
    * init = first nCells rows by hashed-id order (seeded), then `iters`
    * Lloyd rounds maximizing cosine; empty cells keep their centroid. */
  def ivfTrain(spark: SparkSession, corpus: DataFrame, idCol: String,
      vecCol: String, nCells: Int, iters: Int = 8, sampleCap: Int = 8192,
      seed: Long = 17L): Array[Array[Float]] = {
    import spark.implicits._
    // deterministic bounded sample: order by a seeded hash of the id —
    // stable across partitionings, no RNG state (resume-safe)
    val sample = corpus
      .select(col(idCol).cast("long").as("id"), col(vecCol).as("vec"))
      .withColumn("h", abs(xxhash64(col("id"), lit(seed))))
      .orderBy("h").limit(sampleCap)
      .select("vec").as[Array[Float]].collect()
    require(sample.length >= nCells,
      s"need >= $nCells sample vectors, got ${sample.length}")
    def norm(v: Array[Float]): Array[Float] = {
      var s2 = 0.0; var i = 0
      while (i < v.length) { s2 += v(i).toDouble * v(i); i += 1 }
      val n = math.sqrt(s2)
      if (n == 0) v else v.map(x => (x / n).toFloat)
    }
    var cents = Array.tabulate(nCells)(i => norm(sample(i)))
    var it = 0
    while (it < iters) {
      val sums = Array.fill(nCells)(new Array[Double](sample(0).length))
      val cnt = new Array[Int](nCells)
      sample.foreach { v =>
        var best = 0; var bs = Double.MinValue
        var c = 0
        while (c < nCells) {
          val s2 = dotNorm(cents(c), v)
          if (s2 > bs) { bs = s2; best = c }
          c += 1
        }
        val acc = sums(best)
        val nv = norm(v)
        var d = 0
        while (d < nv.length) { acc(d) += nv(d); d += 1 }
        cnt(best) += 1
      }
      cents = Array.tabulate(nCells) { c =>
        if (cnt(c) == 0) cents(c)
        else norm(sums(c).map(_.toFloat))
      }
      it += 1
    }
    cents
  }

  /**
   * LSH-bucketed ANN, the 100 TB scale path: `tables` independent
   * hyperplane tables of `nBits` bits; the corpus side carries one key per
   * table, the query side additionally multi-probes all Hamming-1
   * neighbors of its signature (tables x (nBits+1) keys — queries are the
   * small side, so probe fan-out is cheap where it belongs). Candidates
   * dedup before the exact cosine re-rank. Per-neighbor find probability
   * 1-(1-(p^r + r p^(r-1)(1-p)))^T at per-bit agreement p = 1-theta/pi;
   * recall measured against [[bruteForceTopK]] in OpsSpec and bounded in
   * the driver query.
   */
  def lshTopK(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, nBits: Int = 6,
      tables: Int = 12, multiProbe: Boolean = true): DataFrame = {
    import spark.implicits._
    val dim = vecDim(corpus, vecCol)
    val sigs = (0 until tables).map(t => lshSignature(dim, nBits, 7L + t * 1000003L))
    def key(t: Int, sig: Long): Long = t.toLong << 32 | sig
    val cKeys = udf((v: Array[Float]) =>
      sigs.zipWithIndex.map { case (f, t) => key(t, f(v)) }.toArray)
    val qKeys = udf((v: Array[Float]) =>
      sigs.zipWithIndex.flatMap { case (f, t) =>
        val s = f(v)
        val base = key(t, s)
        if (!multiProbe) Seq(base)
        else base +: (0 until nBits).map(b2 => key(t, s ^ (1L << b2)))
      }.distinct.toArray)
    val cTag = corpus.select(col(idCol).cast("long").as("cid"),
      col(vecCol).as("cvec")).withColumn("bucket", explode(cKeys(col("cvec"))))
    val qTag = queries.select(col(idCol).cast("long").as("qid"),
      col(vecCol).as("qvec")).withColumn("bucket", explode(qKeys(col("qvec"))))
    val cos = udf((a: Array[Float], b: Array[Float]) => dotNorm(a, b))
    val w = Window.partitionBy("qid").orderBy(col("cosine").desc, col("cid").asc)
    qTag.join(cTag, Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qvec"), col("cvec"))
      .dropDuplicates("qid", "cid")
      .withColumn("cosine", cos(col("qvec"), col("cvec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid").as("query_id"), col("rank").cast("long").as("rank"),
        col("cid").as("neighbor_id"), round(col("cosine"), 6).as("cosine"))
  }
}
