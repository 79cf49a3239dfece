package graft.metrics

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/**
 * Per-task lineage + metrics capture (north rule: "per-partition lineage
 * and metrics — rows, bytes, sketch sizes, shuffle spill — written per
 * task"). A SparkListener records every task's IO/spill counters; `dump`
 * writes them as JSON-lines next to the job's checkpoints, mirroring the
 * reference's Stats/StopClock reporting (ganon GanonClassify.cpp:1041-1128).
 */
final class TaskMetricsCollector extends SparkListener {

  final case class TaskRow(stageId: Int, partitionId: Int, durationMs: Long,
      inputRecords: Long, inputBytes: Long, outputRecords: Long,
      outputBytes: Long, shuffleReadBytes: Long, shuffleWriteBytes: Long,
      memorySpilled: Long, diskSpilled: Long, peakExecMemory: Long)

  private val rows = new ConcurrentLinkedQueue[TaskRow]()

  override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
    val m = te.taskMetrics
    if (m != null) rows.add(TaskRow(
      te.stageId, te.taskInfo.partitionId, m.executorRunTime,
      m.inputMetrics.recordsRead, m.inputMetrics.bytesRead,
      m.outputMetrics.recordsWritten, m.outputMetrics.bytesWritten,
      m.shuffleReadMetrics.totalBytesRead,
      m.shuffleWriteMetrics.bytesWritten,
      m.memoryBytesSpilled, m.diskBytesSpilled, m.peakExecutionMemory))
  }

  def snapshot: Seq[TaskRow] = rows.asScala.toSeq

  def totals: Map[String, Long] = {
    val s = snapshot
    Map(
      "tasks" -> s.size.toLong,
      "input_records" -> s.map(_.inputRecords).sum,
      "input_bytes" -> s.map(_.inputBytes).sum,
      "shuffle_read_bytes" -> s.map(_.shuffleReadBytes).sum,
      "shuffle_write_bytes" -> s.map(_.shuffleWriteBytes).sum,
      "memory_spilled" -> s.map(_.memorySpilled).sum,
      "disk_spilled" -> s.map(_.diskSpilled).sum)
  }

  /** JSON-lines dump, one row per task. */
  def dump(path: String): Unit = {
    val w = new java.io.PrintWriter(new java.io.File(path))
    try snapshot.foreach { r =>
      w.println(s"""{"stage":${r.stageId},"partition":${r.partitionId},""" +
        s""""duration_ms":${r.durationMs},"input_records":${r.inputRecords},""" +
        s""""input_bytes":${r.inputBytes},"output_records":${r.outputRecords},""" +
        s""""output_bytes":${r.outputBytes},""" +
        s""""shuffle_read_bytes":${r.shuffleReadBytes},""" +
        s""""shuffle_write_bytes":${r.shuffleWriteBytes},""" +
        s""""memory_spilled":${r.memorySpilled},""" +
        s""""disk_spilled":${r.diskSpilled},""" +
        s""""peak_exec_memory":${r.peakExecMemory}}""")
    } finally w.close()
  }
}

object TaskMetricsCollector {
  /** Attach a fresh collector to the session's listener bus. */
  def attach(spark: SparkSession): TaskMetricsCollector = {
    val c = new TaskMetricsCollector
    spark.sparkContext.addSparkListener(c)
    c
  }
}
