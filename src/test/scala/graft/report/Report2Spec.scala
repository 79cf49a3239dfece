package graft.report

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.spark.SparkTestSession

class Report2Spec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("sortTree: modes + root pinning (report.py:808-864)") {
    val tre = Seq(
      ("root", 0L, 0L, 100L, 100.0, 0L),
      ("a", 1L, 10L, 60L, 60.0, 5L),
      ("b", 1L, 5L, 40L, 40.0, 9L),
      ("a/x", 2L, 30L, 30L, 30.0, 2L),
      ("b/z", 2L, 35L, 35L, 35.0, 1L))
      .toDF("node", "rank_depth", "direct", "cumulative", "cum_perc", "unique")
    val lineage = Seq(
      ("root", Seq("root")), ("a", Seq("root", "a")), ("b", Seq("root", "b")),
      ("a/x", Seq("root", "a", "a/x")), ("b/z", Seq("root", "b", "b/z")))
      .toDF("node", "lineage")
    def order(mode: String) =
      Report.sortTree(tre, lineage, mode).select("node").collect().map(_.getString(0))
    assert(order("rank").sameElements(
      Seq("root", "a", "b", "b/z", "a/x")))
    assert(order("lineage").sameElements(
      Seq("root", "a", "a/x", "b", "b/z")))
    assert(order("count").sameElements(
      Seq("root", "a", "b", "b/z", "a/x")))
    assert(order("unique").sameElements(
      Seq("root", "b", "a", "a/x", "b/z")))
    // root pinned first even when it would sort last
    assert(order("unique").head == "root")
  }

  test("genomeSizesWithFallback: leaf average + parent fallback (tax_util.py:161-224)") {
    val lineage = Seq(
      ("root", Seq("root")),
      ("a", Seq("root", "a")), ("b", Seq("root", "b")),
      ("a/x", Seq("root", "a", "a/x")), ("a/y", Seq("root", "a", "a/y")),
      ("b/z", Seq("root", "b", "b/z")))
      .toDF("node", "lineage")
    val leafSizes = Seq(("a/x", 100L), ("a/y", 300L)).toDF("node", "size")
    val out = Report.genomeSizesWithFallback(lineage, leafSizes)
      .collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    assert(out("a/x") == 100.0 && out("a/y") == 300.0)
    assert(out("a") == 200.0)          // mean of sized leaves below
    assert(out("root") == 200.0)       // mean over all sized leaves
    assert(out("b") == 200.0)          // no sized leaves -> parent (root)
    assert(out("b/z") == 200.0)        // fallback walks to deepest sized anc
  }

  test("table: topKGlobal keeps root + top summed-percentage nodes") {
    val rep = Seq(
      ("s1", "root", 100L), ("s1", "a", 60L), ("s1", "b", 30L), ("s1", "c", 10L),
      ("s2", "root", 100L), ("s2", "a", 10L), ("s2", "b", 80L), ("s2", "c", 10L))
      .toDF("sample", "node", "count")
    val kept = Table.topKGlobal(rep, 1).select("node").distinct()
      .collect().map(_.getString(0)).toSet
    // b: 30/200+80/200 sums higher than a; root always kept, free slot
    assert(kept == Set("root", "b"))
  }

  test("table: minMaxCount dual semantics (table.py:199-210)") {
    val rep = Seq(
      ("s1", "a", 60L), ("s1", "b", 30L), ("s1", "c", 10L),
      ("s2", "a", 2L), ("s2", "b", 8L))
      .toDF("sample", "node", "count")
    // absolute: count >= 10
    val abs = Table.minMaxCount(rep, minCount = 10)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(abs == Set(("s1", "a"), ("s1", "b"), ("s1", "c")))
    // fraction: >= 30% of the sample total
    val frac = Table.minMaxCount(rep, minCount = 0.3)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(frac == Set(("s1", "a"), ("s1", "b"), ("s2", "b")))
    // max as fraction: <= 50%
    val mx = Table.minMaxCount(rep, maxCount = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(mx == Set(("s1", "b"), ("s1", "c"), ("s2", "a")))
  }

  test("formatTre: tsv/csv/text/bioboxes variants (report.py:299-425)") {
    val rows = Seq(
      (1L, "root", "root", Seq("root"), "root", 0L, 0L, 10L, 100.0),
      (2L, "a", "lang", Seq("root", "a"), "a", 3L, 2L, 6L, 60.0),
      (3L, "a/x", "src", Seq("root", "a", "a/x"), "a/x", 4L, 0L, 4L, 40.0))
      .toDF("pos", "node", "rank", "lineage", "name", "unique", "shared",
        "cumulative", "cum_perc")
    val tsv = Report.formatTre(rows, "tsv", unclassified = 5, total = 15)
      .collect().map(_.getString(0))
    assert(tsv.head == "unclassified\t-\t-\tunclassified\t0\t0\t0\t5\t33.33333")
    assert(tsv(2) == "lang\ta\troot|a\ta\t3\t2\t1\t6\t60.00000")
    val csv = Report.formatTre(rows, "csv").collect().map(_.getString(0))
    assert(csv(1) == "lang,a,root|a,a,3,2,1,6,60.00000")
    val text = Report.formatTre(rows, "text").collect().map(_.getString(0))
    // padded: every line has the same field widths
    assert(text.map(_.split("\t")(1).length).distinct.length == 1)
    val bio = Report.formatTre(rows, "bioboxes", sampleId = "s1",
      ranks = Seq("lang", "src")).collect().map(_.getString(0))
    assert(bio(0) == "@Version:0.10.0" && bio(2) == "@Ranks:lang|src")
    assert(bio(3).startsWith("@@TAXID"))
    assert(bio(4).startsWith("a\tlang\ta\ta\t")) // root omitted from path
    assert(!bio.exists(_.startsWith("root\t")))  // root row omitted
  }

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
