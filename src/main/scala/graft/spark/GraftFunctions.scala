package graft.spark

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.UserDefinedFunction

import graft.core.{Hashing, MinHash, SimHash}
import graft.spark.udaf.SketchAggs._

/**
 * Column-function surface of the engine. The shingle/token hashing runs as
 * a tight per-row loop (the reference's per-read minimizer hashing,
 * ganon src/ganon-classify/GanonClassify.cpp:646-650) inside a Scala UDF
 * returning `Array[Long]` — arrays are folded directly into sketch
 * aggregation buffers, never exploded row-per-hash.
 */
object GraftFunctions {

  // ---- scalar / array functions ----------------------------------------

  /** Native Catalyst expression (no boxing, codegen) — see [[ShinglesExpr]]. */
  def shingles(content: Column, k: Int, w: Int,
      seed: Long = Hashing.DefaultSeed): Column =
    ShinglesExpr.col(content, k, w, seed)

  /** Native Catalyst expression — see [[TokenHashesExpr]]. */
  def tokenHashes(text: Column, seed: Long = Hashing.DefaultSeed): Column =
    TokenHashesExpr.col(text, seed)

  /** Token MULTISET hashes (no per-row dedup) — feed frequency sketches
    * with this one; the distinct form would undercount repeats. */
  def tokenHashesMultiset(text: Column,
      seed: Long = Hashing.DefaultSeed): Column =
    TokenHashesExpr.col(text, seed, distinct = false)

  val hash64Udf: UserDefinedFunction =
    udf((s: String) => if (s == null) 0L else Hashing.hashString(s))

  def hash64(c: Column): Column = hash64Udf(c)

  /** MinHash signature of a row's shingle set — one-permutation hashing
    * with rotation densification (one mix64 per element, not numPerms). */
  def minhashSignature(hashes: Column, numPerms: Int,
      seed: Long = Hashing.DefaultSeed): Column =
    MinhashSigExpr.col(hashes, numPerms, seed, oph = true)

  /** The k-independent-permutations variant (reference estimator for the
    * OPH fast path in tests). */
  def minhashSignatureKPerm(hashes: Column, numPerms: Int,
      seed: Long = Hashing.DefaultSeed): Column =
    MinhashSigExpr.col(hashes, numPerms, seed, oph = false)

  /** LSH band keys for a MinHash signature. Null-tolerant: a null
    * signature (user-supplied column) yields no band keys, so the row
    * simply never enters a bucket instead of NPE-ing the job. */
  def lshBandKeys(sig: Column, bands: Int): Column = {
    val f = udf((s: Array[Long]) =>
      if (s == null) Array.empty[Long] else MinHash.bandKeys(s, bands))
    f(sig)
  }

  /** Paired-read shingles (GanonClassify.cpp:695-700): union of both mates'
    * minimizer sets, kept in the engine's unsigned-sorted-distinct form. */
  def pairedShingles(c1: Column, c2: Column, k: Int, w: Int,
      seed: Long = Hashing.DefaultSeed): Column = {
    val mergeUdf = udf((a: Array[Long], b: Array[Long]) =>
      Hashing.sortedDistinct(
        (Option(a).getOrElse(Array.emptyLongArray) ++
          Option(b).getOrElse(Array.emptyLongArray))))
    mergeUdf(shingles(c1, k, w, seed), shingles(c2, k, w, seed))
  }

  /** 64-bit SimHash of a row's token-hash set. */
  val simhashUdf: UserDefinedFunction =
    udf((hs: Array[Long]) => if (hs == null) 0L else SimHash.simhash(hs))

  def simhash(tokenHashes: Column): Column = simhashUdf(tokenHashes)

  // ---- sketch aggregations ---------------------------------------------

  def hllCount(hashes: Column, p: Int = 14): Column =
    udaf(new HllCountAgg(p)).apply(hashes)

  def hllSketch(hashes: Column, p: Int = 14): Column =
    udaf(new HllSketchAgg(p)).apply(hashes)

  def bloomSketch(hashes: Column, numBits: Long, numHashes: Int): Column =
    udaf(new BloomSketchAgg(numBits, numHashes)).apply(hashes)

  /** One 64-bin interleaved shard of the sketch db (executor-side IBF
    * assembly) — see [[graft.spark.udaf.SketchAggs.IbfShardAgg]]. */
  def ibfShard(grp: Column, base: Column, split: Column, hashes: Column,
      bitsPerBin: Long, numHashes: Int): Column = {
    val agg = new IbfShardAgg(bitsPerBin, numHashes)
    udaf(agg, agg.inputEncoder).apply(grp, base, split, hashes)
  }

  /** Band-cap primitive: k smallest ids per group + dropped count
    * (struct<ids: array<bigint>, dropped: bigint>) — see
    * [[graft.spark.udaf.SketchAggs.MinKIdsAgg]]. */
  def minKIds(id: Column, k: Int): Column =
    udaf(new MinKIdsAgg(k)).apply(id)

  def cmsSketch(hashes: Column, depth: Int = 7, width: Int = 8192): Column =
    udaf(new CmsSketchAgg(depth, width)).apply(hashes)

  def kllSketch(value: Column, k: Int = 256): Column =
    udaf(new KllSketchAgg(k)).apply(value)

  def kllQuantiles(value: Column, qs: Array[Double], k: Int = 256): Column =
    udaf(new KllQuantilesAgg(k, qs)).apply(value)

  def tdigestSketch(value: Column, compression: Double = 100.0): Column =
    udaf(new TDigestSketchAgg(compression)).apply(value)

  def tdigestQuantiles(value: Column, qs: Array[Double],
      compression: Double = 100.0): Column =
    udaf(new TDigestQuantilesAgg(compression, qs)).apply(value)

  // ---- SQL registration --------------------------------------------------

  // SQL literal args arrive as whatever numeric type the parser chose
  // (42 is Int, 42L is Long): coerce instead of asInstanceOf, which would
  // throw ClassCastException on the "wrong" literal width
  // non-foldable args (a column reference for k/seed) must fail with the
  // intended message, not an obscure unbound-reference exception from eval
  private def evalIntArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Int = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a numeric literal, got non-foldable ${e.sql}")
    e.eval() match {
      case n: java.lang.Number => n.intValue()
      case x => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $x")
    }
  }
  private def evalLongArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Long = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a numeric literal, got non-foldable ${e.sql}")
    e.eval() match {
      case n: java.lang.Number => n.longValue()
      case x => throw new IllegalArgumentException(
        s"$what must be a numeric literal, got $x")
    }
  }
  private def evalBoolArg(e: org.apache.spark.sql.catalyst.expressions.Expression,
      what: String): Boolean = {
    if (!e.foldable) throw new IllegalArgumentException(
      s"$what must be a boolean literal, got non-foldable ${e.sql}")
    e.eval() match {
      case b: java.lang.Boolean => b
      case x => throw new IllegalArgumentException(
        s"$what must be a boolean literal, got $x")
    }
  }

  /** Register the engine's functions for spark.sql use. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_shingles",
      es => ShinglesExpr(es.head,
        evalIntArg(es(1), "k"), evalIntArg(es(2), "w"),
        if (es.length > 3) evalLongArg(es(3), "seed") else Hashing.DefaultSeed),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_token_hashes",
      es => TokenHashesExpr(es.head,
        if (es.length > 1) evalLongArg(es(1), "seed") else Hashing.DefaultSeed,
        distinct = es.length <= 2 || evalBoolArg(es(2), "distinct")),
      "scala_udf")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "graft_minhash_sig",
      es => MinhashSigExpr(es.head, evalIntArg(es(1), "numPerms"),
        if (es.length > 2) evalLongArg(es(2), "seed") else Hashing.DefaultSeed,
        oph = es.length <= 3 || evalBoolArg(es(3), "oph")),
      "scala_udf")
    spark.udf.register("graft_hash64", hash64Udf)
    spark.udf.register("graft_simhash", simhashUdf)
    spark.udf.register("graft_band_keys",
      udf((s: Array[Long], bands: Int) =>
        if (s == null) Array.empty[Long] else MinHash.bandKeys(s, bands)))
    spark.udf.register("graft_hll_count", udaf(new HllCountAgg(14)))
    spark.udf.register("graft_hll_sketch", udaf(new HllSketchAgg(14)))
    spark.udf.register("graft_cms_sketch", udaf(new CmsSketchAgg(7, 8192)))
    spark.udf.register("graft_kll_sketch", udaf(new KllSketchAgg(256)))
    // UDAF registration fixes constructor params at registration time, so
    // the SQL surface carries the library default cap (10000); a different
    // maxBucket needs the Scala API (GraftFunctions.minKIds(col, k)) or a
    // re-registration under another name
    spark.udf.register("graft_min_k_ids", udaf(new MinKIdsAgg(10000)))
  }
}
