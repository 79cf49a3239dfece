package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase timing of one streaming query (q52 shape): stage, start,
  * processAllAvailable, stop, read-back — locates the fixed cost. */
object StreamBench {
  private def time(label: String)(f: => Unit): Unit = {
    val t0 = System.nanoTime(); f
    println(f"[stream] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val parts = if (args.nonEmpty) args(0) else "32"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", parts)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      var stream: org.apache.spark.sql.DataFrame = null
      time("stage+plan") {
        val srcDir = java.nio.file.Paths.get(
          s"/tmp/graft_stream_documents_${math.abs(dir.hashCode)}")
        java.nio.file.Files.createDirectories(srcDir)
        val link = srcDir.resolve("documents.parquet")
        if (!java.nio.file.Files.exists(link))
          java.nio.file.Files.createSymbolicLink(link,
            java.nio.file.Paths.get(s"$dir/documents.parquet"))
        val schema = spark.read.parquet(s"$dir/documents.parquet").schema
        stream = spark.readStream.schema(schema).parquet(srcDir.toString)
      }
      var q: org.apache.spark.sql.streaming.StreamingQuery = null
      val qname = s"graft_sb_$rep"
      time("dedup plan + start") {
        val out = graft.streaming.StreamClassify.dedupStream(stream, "text")
          .select(lower(hex(col("digest"))).as("digest"))
        q = out.writeStream.outputMode("append").format("memory")
          .queryName(qname).start()
      }
      time("processAllAvailable") { q.processAllAvailable() }
      time("stop") { q.stop() }
      time("read sink table") { spark.table(qname).count() }
    }
    spark.stop()
  }
}
