package graft.report

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

class Report2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sizeCorrection: conserves the per-rank total (report.py:649 assert)") {
    val tre = Seq(
      ("a", 1L, 60L), ("b", 1L, 40L),
      ("a/x", 2L, 30L), ("a/y", 2L, 30L), ("b/z", 2L, 40L))
      .toDF("node", "rank_depth", "cumulative")
    val sizes = Seq(("a", 10L), ("b", 40L), ("a/x", 10L), ("a/y", 30L),
      ("b/z", 20L)).toDF("node", "size")
    val out = Report.sizeCorrection(tre, sizes)
    val perRank = out.groupBy("rank_depth")
      .agg(sum("cumulative").as("orig"), sum("corrected").as("corr"))
      .collect()
    perRank.foreach { r =>
      assert(math.abs(r.getLong(1) - r.getDouble(2)) < 1e-6,
        s"rank ${r.get(0)}: ${r.getLong(1)} vs ${r.getDouble(2)}")
    }
    // density reweighting: small-size bin 'a' gains over 'b'
    val corr = out.collect().map(r => (r.getString(0), r.getDouble(4))).toMap
    assert(corr("a") > 60.0 && corr("b") < 40.0)
  }

  test("redistribute: conserves totals, proportional split, stable leftovers") {
    val counts = Seq(("lang", 10L), ("leaf1", 6L), ("leaf2", 3L), ("leaf3", 0L))
      .toDF("node", "direct_count")
    val leafOf = Seq(
      ("lang", "leaf1", 6L), ("lang", "leaf2", 3L), ("lang", "leaf3", 0L),
      ("leaf1", "leaf1", 6L), ("leaf2", "leaf2", 3L), ("leaf3", "leaf3", 0L))
      .toDF("node", "leaf", "leaf_direct")
    val out = Report.redistribute(counts, leafOf)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out.values.sum == 19L) // 10 + 6 + 3 + 0 conserved
    // lang's 10: floor shares 6.66->6, 3.33->3, 0; leftover 1 -> leaf1
    assert(out("leaf1") == 6L + 6L + 1L)
    assert(out("leaf2") == 3L + 3L)
    assert(out("leaf3") == 0L)
  }
}
