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
}
