package graft.pipeline

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams, Em}
import graft.core.Hashing
import graft.spark.SparkTestSession

/** Paired-read classify, per-level cascade params, the multi-sample
  * pipeline, and the EM first-listed tie-break. */
class PairedMultiSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val p = IbfParams(k = 8, w = 8, maxFp = 1e-4)

  test("paired classify: n_hashes is the mates' distinct union; self-hit") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "one two three four five six seven eight"),
      (3L, "red orange yellow green blue indigo violet")
    ).toDF("doc_id", "text")
    val db = SketchBuild.build(spark, docs, "doc_id", "text", p)
    // mates = adjacent halves of the text (their shingles are subsets of
    // the full text's, so the own bin contains every union gram)
    val paired = docs.select(col("doc_id"),
      substring(col("text"), 1, 18).as("t1"),
      substring(col("text"), 19, 1000).as("t2"))
    val res = Classify.classifyPaired(spark, paired, "doc_id", "t1", "t2",
      db, ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)).collect()
    val texts = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    res.foreach { rr =>
      val full = texts(rr.read_id.toLong)
      val (t1, t2) = (full.substring(0, 18), full.substring(18))
      val union = Hashing.sortedDistinct(
        Hashing.shingles(t1, p.k, p.w, p.seed) ++
          Hashing.shingles(t2, p.k, p.w, p.seed))
      assert(rr.n_hashes == union.length, s"read ${rr.read_id}")
      val own = rr.matches.find(_.target == rr.read_id)
      assert(own.exists(_.count == union.length),
        s"read ${rr.read_id}: own-bin full containment")
    }
  }

  test("cascade: per-level params differ; uniform overload unchanged") {
    // 'hard' docs only fully contain their own bin's grams; level 1 runs
    // at an impossible cutoff against a FOREIGN-target db (so nothing
    // classifies), level 2 at a normal cutoff against own bins
    val docs = (0 until 12).map { i =>
      (i.toLong, (0 until 12).map(j => s"w${i}_$j").mkString(" "))
    }.toDF("doc_id", "text")
    val dbSelf = SketchBuild.build(spark, docs, "doc_id", "text", p)
    val foreign = docs.withColumn("tgt",
      concat(lit("x"), col("doc_id") % 2))
    val dbForeign = SketchBuild.build(spark,
      foreign.filter(col("doc_id") < 0 || col("doc_id") >= 6), "tgt", "text", p)
    val strict = ClassifyParams(relCutoff = 1.0, fprQuery = 1e-12)
    val loose = ClassifyParams(relCutoff = 0.5, fprQuery = 1.0)
    val out = Classify.cascadePerLevel(spark, docs, "doc_id", "text",
      Seq(("1_foreign", dbForeign, strict), ("2_self", dbSelf, loose)))
    val byLevel = out.groupBy("hierarchy").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // docs 6..11 classify at level 1 (they ARE in the foreign db with full
    // containment); 0..5 fall through and classify against self at level 2
    assert(byLevel.getOrElse("2_self", 0L) == 6L, byLevel.toString)
    out.unpersist()
    // uniform-params overload still routes through the same code path
    val uni = Classify.cascade(spark, docs, "doc_id", "text",
      Seq(("a", dbSelf)), loose)
    assert(uni.count() == 12)
    uni.unpersist()
  }

  test("multi-sample: one classifyBySample run == per-sample single runs") {
    val docs = (0 until 60).map { i =>
      (i.toLong, s"s${i % 3}", (0 until 10).map(j => s"tok${i % 7}_$j")
        .mkString(" "))
    }.toDF("doc_id", "sample", "text")
    val db = SketchBuild.build(spark,
      docs.withColumn("tgt", concat(lit("t"), col("doc_id") % 7)),
      "tgt", "text", p)
    val cp = ClassifyParams(relCutoff = 0.5, fprQuery = 1.0)
    val multi = Classify.classifyBySample(spark, docs, "sample", "doc_id",
      "text", db, cp)
    val repMulti = Classify.reportBySample(multi)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val repSingles = (0 until 3).flatMap { s =>
      val sub = docs.filter(col("sample") === s"s$s")
      val res = Classify.classify(spark, sub, "doc_id", "text", db, cp)
      Classify.report(res).collect().map(r => (s"s$s", r.getString(0),
        r.getLong(1), r.getLong(2), r.getLong(3)))
    }.toSet
    assert(repMulti == repSingles)
    // per-sample .sta agrees with the per-run .sta
    val staMulti = Classify.staBySample(multi)
      .select("prefix", "seq_processed", "seq_classified")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val staSingles = (0 until 3).map { s =>
      val sub = docs.filter(col("sample") === s"s$s")
      val res = Classify.classify(spark, sub, "doc_id", "text", db, cp)
      val row = Classify.staReport(res, prefix = s"s$s").first()
      (s"s$s", row.getLong(2), row.getLong(4))
    }.toSet
    assert(staMulti == staSingles)
  }

  test("multi-sample: batch manifest wires files -> tagged reads -> rep") {
    val base = "/tmp/graft_manifest_spec"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(base))
    val a = Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("id", "content")
    val b = Seq((1L, "red orange yellow green"), (2L, "alpha beta gamma delta"))
      .toDF("id", "content")
    a.write.parquet(s"$base/a.parquet")
    b.write.parquet(s"$base/b.parquet")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$base/m.tsv"),
      s"sampleA\t$base/a.parquet\nsampleB\t$base/b.parquet\n")
    val manifest = graft.io.Formats.readBatchManifest(spark, s"$base/m.tsv")
    val reads = graft.io.Formats.readsFromManifest(spark, manifest,
      "id", "content")
    assert(reads.columns.toSet == Set("id", "content", "content2", "sample"))
    val db = SketchBuild.build(spark,
      reads.withColumn("tgt", col("sample")), "tgt", "content", p)
    val res = Classify.classifyBySample(spark, reads, "sample", "id",
      "content", db, ClassifyParams(relCutoff = 1.0, fprQuery = 1.0))
    val rep = Classify.reportBySample(res)
    // every read fully contains its own sample's bin grams -> one match
    // per (sample, own target) at least; the duplicated text row in
    // sampleB also hits sampleA's bin
    val m = rep.collect().map(r => (r.getString(0), r.getString(1)) ->
      r.getLong(2)).toMap
    assert(m(("sampleA", "sampleA")) == 2L)
    assert(m(("sampleB", "sampleB")) == 2L)
    assert(m(("sampleB", "sampleA")) == 1L) // the cross-sample duplicate
    graft.io.Formats.writeRepPerSample(rep, s"$base/rep")
    assert(new java.io.File(s"$base/rep/sample=sampleA").exists())
    assert(new java.io.File(s"$base/rep/sample=sampleB").exists())
  }

  test("manifest pairing: a mate-less read degrades to single-end") {
    // file1 has ids {1,2}, file2 only id 1: read 2 must survive with a
    // null content2 (single-end degrade), not vanish from classification
    val base = "/tmp/graft_manifest_mateless"
    def deleteRec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
      f.delete()
    }
    deleteRec(new java.io.File(base))
    Seq((1L, "alpha beta gamma delta"), (2L, "one two three four"))
      .toDF("id", "content").write.parquet(s"$base/r1.parquet")
    Seq((1L, "alpha beta gamma delta"))
      .toDF("id", "content").write.parquet(s"$base/r2.parquet")
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$base/m.tsv"),
      s"sA\t$base/r1.parquet\t$base/r2.parquet\n")
    val manifest = graft.io.Formats.readBatchManifest(spark, s"$base/m.tsv")
    val reads = graft.io.Formats.readsFromManifest(spark, manifest,
      "id", "content")
    val rows = reads.collect().map(r =>
      r.getAs[Long]("id") -> Option(r.getAs[String]("content2"))).toMap
    assert(rows.keySet == Set(1L, 2L), "the mate-less read must survive")
    assert(rows(1L).isDefined && rows(2L).isEmpty)
  }

  test("em: score tie resolves to the FIRST-LISTED match (reference pin)") {
    // reassign.py:227-241 keeps the first max (np.argmax); with uniform
    // initial probs and equal counts, read r1's winner must be its first
    // listed match 'b' even though 'a' sorts first
    val all = Seq(
      ("r1", "b", 2, 0), ("r1", "a", 2, 1),
      ("r2", "a", 3, 0), ("r2", "b", 3, 1)
    ).toDF("read_id", "target", "kmer_count", "match_order")
    val one = Em.reassign(spark, all)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(one("r1") == "b")
    assert(one("r2") == "a")
    // without the order column the deterministic fallback is target asc
    val oneNoOrd = Em.reassign(spark, all.drop("match_order"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(oneNoOrd("r1") == "a" && oneNoOrd("r2") == "a")
  }
}
