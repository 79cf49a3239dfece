package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * TSV scan/sink formats of the reference, re-expressed as Spark readers
 * (SURVEY.md §2.1): the `--input-file` manifest (1-5 columns,
 * build_update.py:586-608), the multi-sample batch manifest
 * (GanonClassify.cpp:289-351), the `.tax` taxonomy table
 * (GanonClassify.cpp:988-1005), and the `.rep`/`.tre` sinks.
 */
object Formats {

  /** `--input-file`: file [\t target [\t node [\t specialization [\t name]]]].
    * Missing target defaults to the file basename (reference behavior). */
  def readInputFile(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("file", StringType), StructField("target", StringType),
      StructField("node", StringType), StructField("specialization", StringType),
      StructField("name", StringType)))
    spark.read.option("sep", "\t").schema(schema).csv(path)
      .withColumn("target", coalesce(col("target"),
        element_at(split(col("file"), "/"), -1)))
  }

  /** Batch manifest: prefix \t file1 [\t file2] — prefix becomes the
    * carried `sample` column. */
  def readBatchManifest(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("sample", StringType), StructField("file1", StringType),
      StructField("file2", StringType)))
    spark.read.option("sep", "\t").schema(schema).csv(path)
  }

  /** `.tax`: node \t parent \t rank \t name [\t genome_size]. */
  def readTax(spark: SparkSession, path: String): DataFrame = {
    val schema = StructType(Seq(
      StructField("node", StringType), StructField("parent", StringType),
      StructField("rank", StringType), StructField("name", StringType),
      StructField("genome_size", LongType)))
    spark.read.option("sep", "\t").schema(schema).csv(path)
  }

  /** Taxonomy DataFrame -> parent map for Lca.build; unknown -> root.
    * First-wins on duplicate nodes (tax merge across filters,
    * GanonClassify.cpp:1324-1341). */
  def taxToParents(tax: DataFrame): Map[String, String] =
    tax.select("node", "parent").na.drop()
      .collect().map(r => (r.getString(0), r.getString(1)))
      .foldLeft(Map.empty[String, String]) { case (m, (n, p)) =>
        if (m.contains(n)) m else m + (n -> p)
      }

  /** `.rep`-shaped TSV sink (tab-separated, no header footer rows — totals
    * ride as a second frame from Classify.stats). */
  def writeRepTsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("sep", "\t").option("header", "true").csv(path)

  /** Per-sample `.rep` sink: one TSV directory per sample prefix via a
    * partitioned write — the reference's per-prefix output files
    * (GanonClassify.cpp:834-863) with no per-sample driver loop. */
  def writeRepPerSample(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy("sample")
      .option("sep", "\t").option("header", "true").csv(path)

  /**
   * Materialize a batch manifest (readBatchManifest shape) into ONE tagged
   * reads frame: each row's file1 parquet is read and tagged with its
   * `sample`; a non-null file2 is the paired mate table, LEFT-joined on
   * idCol into a `content2` column (the reference pairs mates positionally
   * from twin FASTQ files, GanonClassify.cpp:289-351 — a keyed join is the
   * relational equivalent). The join is LEFT so a read present in file1
   * but missing its mate in file2 degrades to single-end (content2 null,
   * which classifyBySample handles) instead of silently vanishing from
   * classification. The union feeds Classify.classifyBySample, so a
   * multi-sample run is one Spark job, not a per-prefix rerun.
   */
  def readsFromManifest(spark: SparkSession, manifest: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val rows = manifest.collect() // a dimension: one row per sample file
    require(rows.nonEmpty, "empty batch manifest")
    val frames = rows.map { r =>
      val sample = r.getAs[String]("sample")
      val f1 = spark.read.parquet(r.getAs[String]("file1"))
        .select(col(idCol), col(contentCol))
      val base = Option(r.getAs[String]("file2")) match {
        case Some(f2path) =>
          f1.join(spark.read.parquet(f2path)
            .select(col(idCol), col(contentCol).as("content2")), Seq(idCol),
            "left")
        case None =>
          f1.withColumn("content2", lit(null).cast("string"))
      }
      base.withColumn("sample", lit(sample))
    }
    frames.reduce(_ unionByName _)
  }
}
