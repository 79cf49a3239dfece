package graft.synth

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Hashing

/**
 * Deterministic synthetic source-code corpus with the BASELINE.json
 * input_hint shape: (repo, path, commit, lang, content). Seeded pure
 * function of the row index — no wall clock, no RNG state, so any slice
 * regenerates bit-identically on any number of partitions.
 *
 * Skew by construction: repo 0 ("megarepo-0") receives ~20% of all files,
 * the rest spread zipf-ishly — exercising the salting / split-bin story
 * (the reference splits over-full targets across technical bins,
 * ganon src/ganon-build/GanonBuild.cpp:619-653; our aggregation handles the
 * same skew with map-side partial sketches + optional salted two-level agg).
 */
object Corpus {

  val Langs: Array[String] =
    Array("scala", "java", "py", "c", "go", "js", "rs", "md")

  private val SharedVocabSize = 400
  private val LangVocabSize = 300

  /** Deterministic vocab: per-lang tokens + tokens shared across langs. */
  private def token(lang: String, r: Long): String = {
    val u = (r & Long.MaxValue) % 100
    if (u < 35) s"tok${(r >>> 8) % SharedVocabSize}" // shared across langs
    else s"${lang}_kw${(r >>> 8) % LangVocabSize}"   // lang-specific
  }

  def repoOf(i: Long, numRepos: Int, seed: Long): (String, String) = {
    val h = Hashing.mix64(i ^ seed)
    val u = (h & Long.MaxValue) % 100
    val repoIdx =
      if (u < 20) 0L
      else {
        // zipf-ish: square the uniform to favor low indices
        val x = ((Hashing.mix64(h) & Long.MaxValue).toDouble / Long.MaxValue)
        math.min(numRepos - 1L, 1L + (x * x * (numRepos - 1)).toLong)
      }
    val lang = Langs((repoIdx % Langs.length).toInt)
    (if (repoIdx == 0) "megarepo-0" else s"repo-$repoIdx", lang)
  }

  def contentOf(i: Long, lang: String, seed: Long, meanTokens: Int): String = {
    var s = Hashing.mix64(i * 0x9E3779B97F4A7C15L + seed)
    val nTokens = math.max(8, (meanTokens / 2) + ((s & Long.MaxValue) % meanTokens).toInt)
    val sb = new StringBuilder(nTokens * 8)
    var t = 0
    while (t < nTokens) {
      s = Hashing.mix64(s + t)
      if (t > 0) sb.append(' ')
      sb.append(token(lang, s))
      t += 1
    }
    sb.toString
  }

  final case class Row(repo: String, path: String, commit: String,
      lang: String, content: String)

  def generate(i: Long, numRepos: Int, seed: Long, meanTokens: Int): Row = {
    val (repo, lang) = repoOf(i, numRepos, seed)
    val content = contentOf(i, lang, seed, meanTokens)
    val h = Hashing.mix64(i ^ (seed * 31))
    val commit = f"${h}%016x${Hashing.mix64(h)}%016x${(h >>> 32).toInt}%08x"
    val path = s"src/d${(h & Long.MaxValue) % 64}/f$i.$lang"
    Row(repo, path, commit, lang, content)
  }

  /** The corpus as a DataFrame; generated on executors from spark.range. */
  def df(spark: SparkSession, rows: Long, numRepos: Int = 64,
      seed: Long = 42L, meanTokens: Int = 120, partitions: Int = 32): DataFrame = {
    import spark.implicits._
    spark.range(0, rows, 1, partitions)
      .map(i => generate(i, numRepos, seed, meanTokens))
      .toDF()
      .withColumn("content_sha", sha2(col("content"), 256))
  }
}
