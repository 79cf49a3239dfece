package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for the training-data pipeline: token counting,
 * quality signals, n-gram language ID, rolling-hash fingerprints.
 * All built from codegen'd `org.apache.spark.sql.functions` where possible;
 * only the trigram profile scoring needs a (deterministic) UDF.
 */
object TextStats {

  private val Stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Integer-only per-doc token statistics (exact, oracle-friendly):
    * n_tokens, n_distinct_tokens, n_stopwords, sum_token_len. Tokens split
    * on ANY whitespace run with empties removed, so an empty/whitespace-only
    * doc counts 0 tokens (split(trim, " +") counted it as 1 and never broke
    * on tabs/newlines) — same tokenization as [[Hashing.tokenHashes]]. */
  def tokenStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = filter(split(col(textCol), "\\s+"), t => t =!= "")
    df.select(
      col(idCol).cast("long").as("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_distinct_tokens"),
      size(filter(toks, t => t.isin(Stopwords.map(lit(_)): _*)))
        .cast("long").as("n_stopwords"),
      aggregate(transform(toks, t => length(t).cast("long")),
        lit(0L), (acc, x) => acc + x).as("sum_token_len"))
  }

  /** Quality component counts (integers; ratios are the caller's division):
    * chars, letters, digits, spaces, punct. */
  def qualitySignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    def countMatches(pattern: String) =
      (length(t) - length(regexp_replace(t, pattern, ""))).cast("long")
    df.select(
      col(idCol).cast("long").as("doc_id"),
      length(t).cast("long").as("n_chars"),
      countMatches("[a-zA-Z]").as("n_letters"),
      countMatches("[0-9]").as("n_digits"),
      countMatches(" ").as("n_spaces"))
  }

  /**
   * N-gram language ID: per-language character-trigram profiles are trained
   * from labeled rows (top `profileSize` trigrams by frequency), broadcast,
   * and each doc scores against every profile; prediction = argmax overlap
   * (tie -> lang asc). Deterministic; two jobs (train agg + score map).
   */
  def langId(spark: SparkSession, train: DataFrame, score: DataFrame,
      idCol: String, textCol: String, langCol: String,
      profileSize: Int = 64): DataFrame = {
    import spark.implicits._
    val grams = (d: DataFrame) => d.select(col(idCol), col(textCol))
    // train: explode trigrams, count per (lang, gram), keep top-N per lang
    val tri = udf((s: String) =>
      if (s == null || s.length < 3) Array.empty[String]
      else Array.tabulate(s.length - 2)(i => s.substring(i, i + 3)))
    val counts = train
      .select(col(langCol).as("lang"), explode(tri(col(textCol))).as("g"))
      .groupBy("lang", "g").agg(count(lit(1)).as("c"))
    val w = Window.partitionBy("lang").orderBy(col("c").desc, col("g").asc)
    val profiles = counts.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= profileSize)
      .groupBy("lang").agg(collect_set(col("g")).as("grams"))
      .as[(String, Seq[String])].collect()
      .map { case (l, g) => (l, g.toSet) }.sortBy(_._1)
    require(profiles.nonEmpty,
      "langId: no trainable profiles (training frame empty or all docs < 3 chars)")
    val profB = spark.sparkContext.broadcast(profiles)
    val predict = udf((s: String) => {
      val ps = profB.value
      if (s == null || s.length < 3) ps.head._1
      else {
        val gs = (0 until s.length - 2).map(i => s.substring(i, i + 3)).toSet
        var best = ps.head._1; var bestScore = -1
        ps.foreach { case (l, prof) =>
          val sc = gs.count(prof.contains)
          if (sc > bestScore) { best = l; bestScore = sc }
        }
        best
      }
    })
    score.select(col(idCol).cast("long").as("doc_id"),
      col(langCol).as("lang"), predict(col(textCol)).as("predicted_lang"))
  }

  /** 64-bit rolling-hash document fingerprint (first 8 bytes of content
    * hashing discipline; cheap near-exact identity key). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      graft.spark.GraftFunctions.hash64(col(textCol)).as("fingerprint"))

  /** Markup strip for scraped text: drop `<...>` tags, decode the five
    * ubiquitous HTML entities (amp LAST, so `&amp;lt;` single-decodes to
    * `&lt;` instead of double-decoding to `<`), collapse whitespace runs,
    * trim. Pure codegen'd regexp/replace chain — no UDF — and every
    * construct has the same semantics in DuckDB, so oracles replay it
    * verbatim. */
  def stripMarkup(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      cleanedCol(col(textCol)).as("cleaned"))

  private[ops] def cleanedCol(t: org.apache.spark.sql.Column)
      : org.apache.spark.sql.Column = {
    val noTags = regexp_replace(t, "<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (e, ch)) => replace(c, lit(e), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  private val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private val LongNumRe = "[0-9]{9,}"

  /** PII redaction (the pre-training scrub pass): emails, IPv4 literals
    * and 9+-digit runs (phone/SSN/account shapes) are replaced by typed
    * placeholders, IN THAT ORDER (an email's host digits must not be
    * re-counted as a number). Emits the redacted text plus per-category
    * counts so the drop-rate is observable per corpus slice. Same
    * regex dialect subset in Spark (Java regex) and DuckDB (RE2), so
    * oracles replay it. */
  def redactPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "<EMAIL>")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "<IP>")
    val afterNum = regexp_replace(afterIp, LongNumRe, "<NUM>")
    df.select(
      col(idCol).cast("long").as("doc_id"),
      afterNum.as("redacted"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(LongNumRe)).cast("long").as("n_longnums"))
  }
}
