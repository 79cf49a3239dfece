package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.build.{IbfParams, SketchBuild}
import graft.classify.{Classify, ClassifyParams}
import graft.core.{Hashing, MinHash}
import graft.ops.{Ann, Dedup, Multimodal, TextStats}
import graft.report.{Report, Table}
import graft.spark.GraftFunctions

/**
 * Driver contract: one `queries` entry per implemented operator
 * (SURVEY.md §2 + the training-data pipeline layer), with DuckDB-runnable
 * `oracleSql` for everything SQL-expressible.
 *
 * Approximate (sketch) operators are still oracle-checked: the query
 * computes BOTH the sketch estimate and the exact answer in Spark,
 * emits the exact value plus `ok = |estimate - exact| within the
 * algorithm's published bound`, and the oracle recomputes the exact value
 * and asserts `true` — so a hash match proves the estimate landed within
 * the bound on exactly the right groups.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  private def cents(c: Column): Column =
    round(c * 100).cast("long")

  private def deleteRec(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(deleteRec))
    f.delete()
  }

  /** Stage `table` for the streaming file source (which wants a
    * DIRECTORY): a /tmp dir holding one symlink to the read-only parquet —
    * zero copy, deterministic path, shared by every streaming query over
    * that table. Idempotent across queries and runs (the link target is
    * the fixture path itself, so regenerated fixtures are seen through
    * the same link). Returns a started streaming DataFrame. */
  private def stageStream(s: SparkSession, dir: String, table: String)
      : DataFrame = {
    val srcDir = java.nio.file.Paths.get(
      s"/tmp/graft_stream_${table}_${math.abs(dir.hashCode)}")
    java.nio.file.Files.createDirectories(srcDir)
    val link = srcDir.resolve(s"$table.parquet")
    if (!java.nio.file.Files.exists(link))
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$dir/$table.parquet"))
    s.readStream.schema(t(s, dir, table).schema).parquet(srcDir.toString)
  }

  // Shared media fixtures for q58/q66/q67/q68: ONE copy of each
  // pixel/sample formula, because the DuckDB oracles replay these
  // formulas arithmetically — a second inline copy drifting from the
  // first would silently desynchronize a query from its oracle.
  /** 16x8 grayscale PNG, pixel i = (i*31 + id*7) % 256. */
  private val mkPngUdf = udf((id: Long) => {
    val px = Array.tabulate(16 * 8)(i => ((i * 31 + id * 7) % 256).toByte)
    graft.ops.Png.encode(16, 8, 1, px)
  })

  /** 16-bit mono WAV, 48 + id%16 samples of (id*13 + i*97) % 4001 - 2000
    * at 8000 + id%8 Hz. */
  private val mkWavUdf = udf((id: Long) => {
    val n = 48 + (id % 16).toInt
    val smp = Array.tabulate(n)(i => ((id * 13 + i * 97) % 4001).toInt - 2000)
    graft.ops.Wav.encode(graft.ops.Wav.Audio(
      8000 + (id % 8).toInt, 1, 16, smp))
  })

  /** 16x16 grayscale baseline JPEG of four constant 8x8 blocks, block b =
    * (id*7 + b*53) % 256, all-ones quant + restart markers: constant
    * blocks have one integral DC coefficient each, so the lossy-format
    * decode is EXACT and the oracle can replay the pixel sum
    * arithmetically (64 * sum of the four block values). */
  private val mkJpegUdf = udf((id: Long) => {
    val px = Array.tabulate(16 * 16) { i =>
      val b = (i / 16 / 8) * 2 + (i % 16) / 8
      ((id * 7 + b * 53) % 256).toByte
    }
    graft.ops.Jpeg.encode(16, 16, 1, px, restartInterval = 1)
  })

  /** 16x12 grayscale INTERLACED GIF, pixel i = (i*29 + id*13) % 256:
    * lossless LZW means the decode is bit-exact, so the oracle replays
    * the pixel sum arithmetically (x3: the gray palette expands to RGB). */
  private val mkGifUdf = udf((id: Long) => {
    val px = Array.tabulate(16 * 12)(i => ((i * 29 + id * 13) % 256).toByte)
    graft.ops.Gif.encode(16, 12, px, interlace = true)
  })

  /** 8x6 mono Y4M at 24 fps, 3 + id%5 frames of
    * (id*11 + f*131 + i*7) % 256 luma. */
  private val mkY4mUdf = udf((id: Long) => {
    val n = 3 + (id % 5).toInt
    val frames = Array.tabulate(n)(f =>
      Array.tabulate(48)(i => ((id * 11 + f * 131 + i * 7) % 256).toByte))
    graft.ops.Y4m.encode(graft.ops.Y4m.Video(8, 6, 24, 1,
      mono = true, frames))
  })

  /** Flagship: ganon-style classification of documents against lang bins
    * at sf0.001 — which lang bins does each doc's shingle set hit. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val docs = t(spark, dir, "documents")
    val db = SketchBuild.build(spark, docs, "lang", "text",
      IbfParams(k = 8, w = 8, maxFp = 0.001))
    val res = Classify.classify(spark, docs, "doc_id", "text", db,
      ClassifyParams(relCutoff = 0.25))
    Classify.allMatches(res)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- exact relational operators --------------------------------------

    "q01_pushdown_agg" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(cents(col("l_quantity"))).as("sum_qty_c"),
          sum(cents(col("l_extendedprice"))).as("sum_price_c"),
          count(lit(1)).as("n_rows"))
    }),

    "q02_join_agg" -> ((s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("n_name"), col("r_name"))
        .agg(count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("total_c"))
    }),

    "q03_window_topk" -> ((s, dir) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_orderpriority"), col("rn").cast("long").as("rn"),
          col("o_orderkey"))
    }),

    "q04_dedup_exact" -> ((s, dir) => {
      Dedup.exact(t(s, dir, "documents"), "doc_id", "text")
        .select(col("id").cast("long").as("doc_id"),
          col("canonical_id").cast("long").as("canonical_id"),
          col("dup_count").cast("long").as("dup_count"))
    }),

    "q05_token_stats" -> ((s, dir) =>
      TextStats.tokenStats(t(s, dir, "documents"), "doc_id", "text")),

    "q06_quality_signals" -> ((s, dir) =>
      TextStats.qualitySignals(t(s, dir, "documents"), "doc_id", "text")),

    "q07_rollup_tree" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val counts = docs
        .groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(count(lit(1)).as("direct_count"))
      val lineage = docs.select("lang", "source").distinct()
        .select(concat(col("lang"), lit("/"), col("source")).as("node"),
          array(lit("root"), col("lang"),
            concat(col("lang"), lit("/"), col("source"))).as("lineage"))
        .union(docs.select(col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage")).distinct())
        .union(s.range(1).select(lit("root").as("node"),
          array(lit("root")).as("lineage")))
      Report.tree(counts, lineage)
        .select(col("node"), col("rank_depth").cast("long").as("rank_depth"),
          col("direct").cast("long").as("direct"),
          col("cumulative").cast("long").as("cumulative"))
    }),

    "q08_pivot" -> ((s, dir) => {
      val rep = t(s, dir, "documents")
        .groupBy(col("source").as("sample"), col("lang").as("node"))
        .agg(count(lit(1)).as("count"))
      Table.pivot(rep, Seq("de", "en", "es", "fr", "zh"))
        .select(col("sample"),
          col("de").cast("long").as("de"), col("en").cast("long").as("en"),
          col("es").cast("long").as("es"), col("fr").cast("long").as("fr"),
          col("zh").cast("long").as("zh"))
    }),

    "q09_anti_join" -> ((s, dir) => {
      // hierarchy-cascade shape: reads (customers) not classified at this
      // level (no 'F' order) flow on — the left_anti of Classify.cascade
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderstatus") === "F")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"))
    }),

    "q10_min_frequency" -> ((s, dir) => {
      val rep = t(s, dir, "documents")
        .groupBy(col("source").as("sample"), col("lang").as("node"))
        .agg(count(lit(1)).as("count"))
      Table.minFrequency(rep, 20)
        .select(col("sample"), col("node"), col("count").cast("long").as("count"))
    }),

    // ---- sketch estimates, bound-checked against exact ------------------

    "q11_hll_tokens" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val hs = docs.select(col("lang"),
        GraftFunctions.tokenHashes(col("text")).as("hs"))
      val est = hs.groupBy("lang")
        .agg(GraftFunctions.hllCount(col("hs"), 14).as("est"))
      val exact = docs
        .select(col("lang"), explode(filter(split(col("text"), "\\s+"),
          t2 => t2 =!= "")).as("tok"))
        .groupBy("lang").agg(countDistinct(col("tok")).as("n_exact"))
      val bound = 3 * 1.04 / math.sqrt((1 << 14).toDouble)
      est.join(exact, Seq("lang"))
        .select(col("lang"), col("n_exact").cast("long").as("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(col("n_exact") * bound, lit(1.0))).as("ok"))
    }),

    "q12_hll_lineitem" -> ((s, dir) => {
      val li = t(s, dir, "lineitem")
      val hashPk = udf((x: Long) => Array(Hashing.hashLong(x)))
      val est = li.select(col("l_returnflag"), hashPk(col("l_partkey")).as("hs"))
        .groupBy("l_returnflag")
        .agg(GraftFunctions.hllCount(col("hs"), 14).as("est"))
      val exact = li.groupBy("l_returnflag")
        .agg(countDistinct(col("l_partkey")).as("n_exact"))
      val bound = 3 * 1.04 / math.sqrt((1 << 14).toDouble)
      est.join(exact, Seq("l_returnflag"))
        .select(col("l_returnflag"), col("n_exact").cast("long").as("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(col("n_exact") * bound, lit(1.0))).as("ok"))
    }),

    "q13_cms_tokens" -> ((s, dir) => {
      import graft.core.sketch.CountMin
      val docs = t(s, dir, "documents").cache()
      val toks = docs.select(explode(filter(split(col("text"), "\\s+"),
        t2 => t2 =!= "")).as("tok"))
      val exact = toks.groupBy("tok").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("tok").asc).limit(20)
      // build the CMS distributively over per-row token MULTISET hashes
      // (codegen expression — byte-exact with Hashing.hashString probes)
      val cmsBytes = docs
        .select(GraftFunctions.tokenHashesMultiset(col("text")).as("hs"))
        .agg(GraftFunctions.cmsSketch(col("hs"), 7, 8192).as("cms"))
        .head().getAs[Array[Byte]](0)
      val cms = CountMin.fromBytes(cmsBytes)
      val epsN = cms.eps * cms.total
      val estOf = udf((tok: String) => cms.estimate(Hashing.hashString(tok)))
      exact.withColumn("est", estOf(col("tok")))
        .select(col("tok"), col("exact_cnt").cast("long").as("exact_cnt"),
          (col("est") >= col("exact_cnt") &&
            col("est") <= col("exact_cnt") + epsN).as("ok"))
    }),

    "q14_kll_quantiles" -> ((s, dir) => {
      import s.implicits._
      val li = t(s, dir, "lineitem").select(col("l_extendedprice")).cache()
      val qs = Array(0.1, 0.25, 0.5, 0.75, 0.9)
      val both = li.agg(
        GraftFunctions.kllQuantiles(col("l_extendedprice"), qs, 256).as("kll"),
        GraftFunctions.tdigestQuantiles(col("l_extendedprice"), qs, 100.0)
          .as("td")).head()
      val kll = both.getAs[scala.collection.Seq[Double]](0)
      val td = both.getAs[scala.collection.Seq[Double]](1)
      // rank-check all estimates in ONE pass (not one count job per rank)
      val rankCols = count(lit(1)).cast("double").as("n") +:
        qs.indices.flatMap(i => Seq(
          sum(when(col("l_extendedprice") <= kll(i), 1L).otherwise(0L))
            .as(s"rk$i"),
          sum(when(col("l_extendedprice") <= td(i), 1L).otherwise(0L))
            .as(s"rt$i")))
      val r = li.agg(rankCols.head, rankCols.tail: _*).head()
      val n = r.getAs[Double]("n")
      val bound = math.max(1.65 * 2.3 / 256, 10.0 / n)
      val tdBound = math.max(graft.core.sketch.TDigest.rankErrorBound(100.0), 10.0 / n)
      val checks = qs.indices.map { i =>
        (qs(i), math.abs(r.getAs[Long](s"rk$i") / n - qs(i)) <= bound,
          math.abs(r.getAs[Long](s"rt$i") / n - qs(i)) <= tdBound)
      }
      s.createDataset(checks).toDF("q", "ok", "ok_td")
    }),

    "q15_bloom_bins" -> ((s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents")
      val p = IbfParams(k = 8, w = 8, maxFp = 0.01)
      val db = SketchBuild.build(s, docs, "lang", "text", p)
      val dbB = s.sparkContext.broadcast(db)
      // zero-FN: every doc's shingles fully hit its own lang bin (summed
      // split-bin count >= n — sibling-bin FPs can only add, never lose);
      // FP: union-membership over the target's technical bins with seeded
      // absent hashes, realized <= 2*maxFp (the budget is per TARGET)
      val perLang = docs.select(col("lang"), col("text")).as[(String, String)]
        .mapPartitions { iter =>
          val d = dbB.value
          val counts = new Array[Int](d.targets.length)
          iter.map { case (lang, text) =>
            val hs = Hashing.shingles(text, p.k, p.w, p.seed)
            java.util.Arrays.fill(counts, 0)
            d.probe(hs, counts, 1)
            (lang, counts(d.targetIndex(lang)) >= hs.length)
          }
        }.toDF("lang", "fn_ok")
        .groupBy("lang").agg(min(col("fn_ok")).as("zero_fn"))
      val probes = Array.tabulate(200000)(i => Hashing.hashLong(i + (1L << 41)))
      val fpOf = udf((lang: String) => {
        val d = dbB.value
        val t2 = d.targetIndex(lang)
        var hits = 0; var i = 0
        while (i < probes.length) {
          if (d.containsTarget(probes(i), t2)) hits += 1
          i += 1
        }
        hits.toDouble / probes.length
      })
      perLang.select(col("lang"), col("zero_fn"),
        (fpOf(col("lang")) <= 2 * p.maxFp).as("fpr_ok"))
    }),

    "q16_classify_selfhit" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val db = SketchBuild.build(s, docs, "lang", "text",
        IbfParams(k = 8, w = 8, maxFp = 0.001))
      val res = Classify.classify(s, docs, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.25))
      val all = Classify.allMatches(res)
      val docLang = docs.select(col("doc_id").cast("string").as("read_id"),
        col("lang"))
      // zero-FN guarantee: own-lang bin contains every shingle -> always
      // survives any cutoff <= 1.0 -> hit_own is deterministically true
      docLang.join(all, Seq("read_id"), "left")
        .groupBy("read_id", "lang")
        .agg(max(when(col("target") === col("lang"), true)
          .otherwise(false)).as("hit_own"))
        .select(col("read_id").cast("long").as("doc_id"), col("hit_own"))
    }),

    "q17_minhash_dups" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val sets = docs.select(col("doc_id").cast("long").as("id"),
        GraftFunctions.tokenHashes(col("text")).as("hs"))
      // J == 1.0 pairs have identical signatures -> found with prob 1;
      // 16-row bands keep saturated-vocab buckets small (r=16: a random
      // pair at J=0.7 collides with prob 0.7^16 ~= 0.003).
      // oph=false is a MEASURED choice for this corpus: with ~50 distinct
      // tokens against k=128 bins, OPH signatures are densification-
      // dominated (most bins empty), which correlates band keys — on sf0.1
      // it yields 21M candidate pairs / max bucket 2693 vs 4.2M / 1095 for
      // k-perm (tools/Q17Diag), tripling the query. OPH stays the library
      // default for shingle sets with |set| >> numPerms, where its one-pass
      // signature wins and bins are dense.
      Dedup.minhashPairs(s, sets, numPerms = 128, bands = 8, threshold = 1.0,
        oph = false)
        .select(col("doc_a"), col("doc_b"))
    }),

    "q18_ann_topk" -> ((s, dir) => {
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      Ann.bruteForceTopK(s, emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("rank"), col("neighbor_id"))
    }),

    "q19_simhash" -> ((s, dir) => {
      // oracle-checkable invariant: simhash is a pure function of the
      // token multiset, so every member of an exact-duplicate text group
      // carries the same fingerprint (min == max within the group)
      val docs = t(s, dir, "documents")
      val sh = docs.select(col("doc_id").cast("long").as("doc_id"),
        sha2(col("text"), 256).as("grp"),
        GraftFunctions.simhash(
          GraftFunctions.tokenHashes(col("text"))).as("simhash"))
      val w = Window.partitionBy("grp")
      sh.select(col("doc_id"),
        (min(col("simhash")).over(w) === max(col("simhash")).over(w)).as("ok"))
    }),

    "q39_fingerprint" -> ((s, dir) => {
      // rolling-hash document fingerprints: within an exact-duplicate text
      // group all fingerprints agree, and distinct texts in this corpus
      // slice produce distinct fingerprints (64-bit collisions at these
      // cardinalities ~ 1e-11) — both sides SQL-expressible
      val docs = t(s, dir, "documents")
      val fp = TextStats.fingerprints(docs, "doc_id", "text")
        .join(docs.select(col("doc_id").cast("long").as("doc_id"),
          sha2(col("text"), 256).as("grp")), Seq("doc_id"))
      val w = Window.partitionBy("grp")
      // one driver action for the global invariant, not one per side
      val gf = fp.agg(countDistinct(col("grp")).as("g"),
        countDistinct(col("fingerprint")).as("f")).first()
      fp.select(col("doc_id"),
        (min(col("fingerprint")).over(w) === max(col("fingerprint")).over(w)
          && lit(gf.getLong(1) == gf.getLong(0))).as("ok"))
    }),

    "q20_stream_window" -> ((s, dir) => {
      val stream = stageStream(s, dir, "events")
      val agg = stream
        .withColumn("ts", col("ts").cast("timestamp")) // NTZ -> event-time type
        .withWatermark("ts", "0 seconds")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(cents(col("value"))).as("sum_value_c"))
        .select(col("window.start").as("window_start"), col("event_type"),
          col("n"), col("sum_value_c"))
      val qname = "graft_stream_" + math.abs(dir.hashCode)
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      q.processAllAvailable(); q.stop()
      s.table(qname)
    }),

    "q21_media_meta" -> ((s, dir) => {
      val media = Multimodal.asMediaTable(t(s, dir, "documents"), "doc_id", "text")
      val feats = Multimodal.extractFeatures(s, media).toDF()
      media.select(col("doc_id"), col("n_bytes"))
        .join(feats.select(col("doc_id"), (col("feature")(0) >= 0.0 &&
          col("feature")(0) <= 1.0).as("feat_ok")), Seq("doc_id"))
    }),

    "q23_redistribute" -> ((s, dir) => {
      // push per-lang (internal-node) counts down to (lang,source) leaves
      // proportional to leaf counts — ganon's shared-read redistribution
      val docs = t(s, dir, "documents")
      val leaves = docs.groupBy(col("lang"),
          concat(col("lang"), lit("/"), col("source")).as("leaf"))
        .agg(count(lit(1)).as("leaf_direct"))
      val counts = docs.groupBy(col("lang").as("node"))
        .agg(count(lit(1)).as("direct_count"))
        .union(leaves.select(col("leaf").as("node"),
          col("leaf_direct").as("direct_count")))
      val leafOf = leaves.select(col("lang").as("node"), col("leaf"),
          col("leaf_direct"))
        .union(leaves.select(col("leaf").as("node"), col("leaf"),
          col("leaf_direct")))
      graft.report.Report.redistribute(counts, leafOf)
        .select(col("leaf"),
          col("redistributed_count").cast("long").as("redistributed_count"))
    }),

    "q24_size_correction" -> ((s, dir) => {
      // size-normalized abundance: per-rank totals must be conserved
      val docs = t(s, dir, "documents")
      val tre = docs.groupBy(col("lang").as("node"))
        .agg(count(lit(1)).as("cumulative"))
        .withColumn("rank_depth", lit(1L))
      val sizes = docs.groupBy(col("lang").as("node"))
        .agg(sum(col("n_chars")).as("size"))
      val corr = graft.report.Report.sizeCorrection(tre, sizes)
      corr.groupBy("rank_depth")
        .agg((abs(sum(col("corrected")) - sum(col("cumulative"))) < 1e-6)
          .as("conserved"))
        .select(col("rank_depth").cast("long").as("rank_depth"),
          col("conserved"))
    }),

    "q25_classify_stats" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val db = SketchBuild.build(s, docs, "lang", "text",
        IbfParams(k = 8, w = 8, maxFp = 0.001))
      val res = Classify.classify(s, docs, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.25))
      Classify.stats(res)
        .select(col("seqs_processed"), col("seqs_classified"),
          col("seqs_skipped"))
    }),

    "q26_ann_lsh" -> ((s, dir) => {
      // LSH-bucketed ANN (scale path): per-query recall@5 vs the in-query
      // brute force must clear the bound -> oracle asserts the boolean
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val lsh = Ann.lshTopK(s, emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val bf = Ann.bruteForceTopK(s, emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      bf.join(lsh, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("found"))
        .join(bf.groupBy("query_id").agg(count(lit(1)).as("total")),
          Seq("query_id"), "right")
        .na.fill(0L, Seq("found"))
        .select(col("query_id"),
          (col("found") >= col("total") * 0.6).as("ok"))
    }),

    "q60_ann_ivf" -> ((s, dir) => {
      // IVF (centroid-partitioned) ANN — the second scale path the brief
      // names next to LSH: bounded-sample spherical-k-means codebook,
      // map-side cell assignment, nProbe-cell probe with exact re-rank.
      // Per-query recall@5 vs the in-query brute force must clear the
      // bound (same oracle shape as q26)
      // these embeddings are near-uniform (no real cluster structure — the
      // adversarial case for IVF), so the honest bounds are per-query
      // recall@5 >= 0.4 AND aggregate recall >= 0.7 at a 12/32-cell probe;
      // everything (codebook, assignment, brute force) is deterministic,
      // so the oracle's `true` asserts exactly these measured floors
      val emb = t(s, dir, "embeddings")
      val queries = emb.filter(col("vec_id") < 10)
      val ivf = Ann.ivfTopK(s, emb, queries, "vec_id", "embedding", 5,
        nCells = 32, nProbe = 12)
        .select(col("query_id"), col("neighbor_id"))
      val bf = Ann.bruteForceTopK(s, emb, queries, "vec_id", "embedding", 5)
        .select(col("query_id"), col("neighbor_id"))
      val per = bf.join(ivf, Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("found"))
        .join(bf.groupBy("query_id").agg(count(lit(1)).as("total")),
          Seq("query_id"), "right")
        .na.fill(0L, Seq("found"))
      val wAll = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
      per.select(col("query_id"),
        (col("found") >= col("total") * 0.4 &&
          sum(col("found")).over(wAll) >= sum(col("total")).over(wAll) * 0.7)
          .as("ok"))
    }),

    "q27_cascade" -> ((s, dir) => {
      // hierarchy cascade with PER-LEVEL params (GanonClassify.cpp:353-401
      // per-hierarchy config): level 1 = source bins from EVEN docs under a
      // STRICT regime (cutoff 0.6, rel-filter 0.1, tight fpr; odd docs may
      // miss), level 2 = lang bins from ALL docs under a LOOSE regime
      // (cutoff 0.25, keep-all filter, fpr off) whose zero-FN own-bin
      // containment guarantees every eligible odd doc classifies.
      // Oracle-checkable invariants: each eligible read appears EXACTLY
      // once across levels with a non-null assignment
      val docs = t(s, dir, "documents")
      val build1 = docs.filter(col("doc_id") % 2 === 0)
      val query = docs.filter(col("doc_id") % 2 === 1)
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val lvl1 = SketchBuild.build(s, build1, "source", "text", p)
      val lvl2 = SketchBuild.build(s, docs, "lang", "text", p)
      val out = Classify.cascadePerLevel(s, query, "doc_id", "text",
        Seq(
          ("1_source", lvl1,
            ClassifyParams(relCutoff = 0.6, relFilter = 0.1, fprQuery = 1e-9)),
          ("2_lang", lvl2,
            ClassifyParams(relCutoff = 0.25, relFilter = 1.0, fprQuery = 1.0))))
      out.groupBy("read_id").agg(
        (count(lit(1)) === 1 &&
          min(col("assignment").isNotNull) === true).as("ok"))
        .select(col("read_id").cast("long").as("read_id"), col("ok"))
    }),

    "q28_hll_events" -> ((s, dir) => {
      // grouped HLL over a second fact table (events): distinct users
      val ev = t(s, dir, "events")
      val hashU = udf((x: Long) => Array(Hashing.hashLong(x)))
      val est = ev.select(col("event_type"), hashU(col("user_id")).as("hs"))
        .groupBy("event_type")
        .agg(GraftFunctions.hllCount(col("hs"), 14).as("est"))
      val exact = ev.groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_exact"))
      val bound = 3 * 1.04 / math.sqrt((1 << 14).toDouble)
      est.join(exact, Seq("event_type"))
        .select(col("event_type"), col("n_exact").cast("long").as("n_exact"),
          (abs(col("est") - col("n_exact")) <=
            greatest(col("n_exact") * bound, lit(1.0))).as("ok"))
    }),

    "q29_kll_grouped" -> ((s, dir) => {
      // grouped quantile sketch: median event value per event_type,
      // rank-checked against the exact per-group rank — the medians join
      // back (broadcast) so all groups verify in ONE pass
      val ev = t(s, dir, "events").select(col("event_type"), col("value")).cache()
      val med = ev.groupBy("event_type")
        .agg(GraftFunctions.kllQuantiles(col("value"), Array(0.5), 256).as("q"))
        .select(col("event_type"), col("q")(0).as("med"))
      ev.join(broadcast(med), Seq("event_type"))
        .groupBy("event_type")
        .agg(count(lit(1)).cast("double").as("n"),
          sum(when(col("value") <= col("med"), 1L).otherwise(0L)).as("rk"))
        .select(col("event_type"),
          (abs(col("rk") / col("n") - 0.5) <=
            greatest(lit(1.65 * 2.3 / 256), lit(10.0) / col("n"))).as("ok"))
    }),

    "q30_cms_events" -> ((s, dir) => {
      import graft.core.sketch.CountMin
      // CMS frequency of events per user: top-20 users bound-checked
      val ev = t(s, dir, "events").cache()
      val exact = ev.groupBy("user_id").agg(count(lit(1)).as("exact_cnt"))
        .orderBy(col("exact_cnt").desc, col("user_id").asc).limit(20)
      val hashU = udf((x: Long) => Array(Hashing.hashLong(x)))
      val cmsBytes = ev.select(hashU(col("user_id")).as("hs"))
        .agg(GraftFunctions.cmsSketch(col("hs"), 7, 8192).as("cms"))
        .head().getAs[Array[Byte]](0)
      val cms = CountMin.fromBytes(cmsBytes)
      val epsN = cms.eps * cms.total
      val estOf = udf((u: Long) => cms.estimate(Hashing.hashLong(u)))
      exact.withColumn("est", estOf(col("user_id")))
        .select(col("user_id"), col("exact_cnt").cast("long").as("exact_cnt"),
          (col("est") >= col("exact_cnt") &&
            col("est") <= col("exact_cnt") + epsN).as("ok"))
    }),

    "q31_embed_neardup" -> ((s, dir) => {
      Ann.cosineNearDupPairs(s, t(s, dir, "embeddings"), "vec_id",
        "embedding", 0.5)
    }),

    "q32_skew_split" -> ((s, dir) => {
      import s.implicits._
      // skewed corpus: 'mega' holds half the docs (~20x any source bin).
      // The split-bin plan must (a) split mega across technical bins,
      // (b) keep zero-FN, (c) keep the per-TARGET union FPR within budget,
      // (d) cost far less than the naive numBins x bits(mega) sizing that
      //     a max-sized layout pays on skew
      // k = 16 crosses token boundaries, so 'mega' (half the corpus) holds
      // ~6-8x the distinct shingles of any source bin — real count skew
      // despite the shared vocabulary
      val docs = t(s, dir, "documents")
        .withColumn("target",
          when(col("doc_id") % 2 === 0, lit("mega")).otherwise(col("source")))
      val p = IbfParams(k = 16, w = 16, maxFp = 0.01)
      val db = SketchBuild.build(s, docs, "target", "text", p)
      val dbB = s.sparkContext.broadcast(db)
      val megaSplit = db.layout.split(db.targetIndex("mega")) > 1
      val budgetOk = db.plan.expectedMaxFp <= p.maxFp
      // ~2x of sum-of-optimal-bins (the envelope = 64-bin rounding + the
      // split multiple-testing correction + HLL headroom) and strictly
      // below the old max-bin sizing; the >=3x naive win on a wider-skew
      // corpus is asserted in SizingSpec
      val naiveBytes = db.targets.length.toLong *
        graft.build.Sizing.binSizeBits(p.maxFp, db.targetHashes.max) / 8
      val sizeVsNaive = naiveBytes.toDouble / db.sizeBytes >= 1.8
      val sumOptimal = db.targetHashes
        .map(graft.build.Sizing.binSizeBits(p.maxFp, _)).sum / 8
      val sizeVsOptimal = db.sizeBytes <= 2.3 * sumOptimal
      val fn = docs.select(col("target"), col("text"))
        .as[(String, String)]
        .mapPartitions { iter =>
          val d = dbB.value
          val counts = new Array[Int](d.targets.length)
          iter.map { case (tg, text) =>
            val hs = Hashing.shingles(text, p.k, p.w, p.seed)
            java.util.Arrays.fill(counts, 0)
            d.probe(hs, counts, 1)
            (tg, hs.isEmpty || counts(d.targetIndex(tg)) >= hs.length)
          }
        }.toDF("target", "fn_ok")
        .groupBy("target").agg(min(col("fn_ok")).as("zero_fn"))
      val probes = Array.tabulate(100000)(i => Hashing.hashLong(i + (1L << 47)))
      val fpOf = udf((tg: String) => {
        val d = dbB.value
        val ti = d.targetIndex(tg)
        var hits = 0; var i = 0
        while (i < probes.length) {
          if (d.containsTarget(probes(i), ti)) hits += 1
          i += 1
        }
        hits.toDouble / probes.length <= 2 * p.maxFp
      })
      fn.select(col("target"), col("zero_fn"), fpOf(col("target")).as("fpr_ok"),
        lit(megaSplit && budgetOk).as("plan_ok"),
        lit(sizeVsNaive && sizeVsOptimal).as("size_ok"))
    }),

    "q33_lca" -> ((s, dir) => {
      // taxonomy root -> lang -> lang/source; multi-match reads resolve by
      // LCA on executors (GanonClassify.cpp:773-800 semantics). Oracle =
      // exact 8-gram-join classification + LCA over the 3-level lineage
      // in SQL (k = w = 8 makes the shingle set exactly the distinct
      // 8-grams, so DuckDB can reproduce the counts)
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val binned = docs.withColumn("target",
        concat(col("lang"), lit("/"), col("source")))
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, binned, "target", "text", p)
      val parents = binned.select("lang", "target").distinct().collect()
        .flatMap(r => Seq(r.getString(1) -> r.getString(0),
          r.getString(0) -> "root")).toMap
      val lca = graft.core.Lca.build(parents, "root")
      val res = Classify.classify(s, binned, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.8, relFilter = 1.0, fprQuery = 1.0),
        lcaOpt = Some(lca))
      res.toDF().filter(col("assignment").isNotNull)
        .select(col("read_id").cast("long").as("doc_id"),
          col("assignment"))
    }),

    "q34_update" -> ((s, dir) => {
      // ganon-update capability: add a target to a built+saved db, remove
      // another; classification must equal a fresh build of the final set
      // (full-containment cutoff makes the check FP-immune)
      val docs = t(s, dir, "documents").cache()
      val sources = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0))
      val addSrc = sources.head
      val rmSrc = sources.last
      // tiny maxFp: the updated and fresh filters have different bits, so
      // an FP-completed near-containment could otherwise differ between them
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val base = SketchBuild.build(s, docs.filter(col("source") =!= addSrc),
        "source", "text", p)
      val dir2 = s"/tmp/graft_q34_${math.abs(dir.hashCode)}"
      graft.io.SketchStore.save(s, base, dir2)
      val loaded = graft.io.SketchStore.load(s, dir2)
      val updated = SketchBuild.update(s, loaded,
        docs.filter(col("source") === addSrc), "source", "text",
        removeTargets = Seq(rmSrc))
      val fresh = SketchBuild.build(s, docs.filter(col("source") =!= rmSrc),
        "source", "text", p)
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      val a = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", updated, cp)).withColumn("u", lit(1))
      val b = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", fresh, cp)).withColumn("f", lit(1))
      val mism = a.join(b, Seq("read_id", "target"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q35_report_sort" -> ((s, dir) => {
      // report sort with root pinning (rank mode): order emitted as an
      // explicit pos column so the oracle checks the ORDER relationally
      val docs = t(s, dir, "documents")
      val counts = docs
        .groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(count(lit(1)).as("direct_count"))
      val lineage = docs.select("lang", "source").distinct()
        .select(concat(col("lang"), lit("/"), col("source")).as("node"),
          array(lit("root"), col("lang"),
            concat(col("lang"), lit("/"), col("source"))).as("lineage"))
        .union(docs.select(col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage")).distinct())
        .union(s.range(1).select(lit("root").as("node"),
          array(lit("root")).as("lineage")))
      val tre = Report.tree(counts, lineage)
      Report.sortTree(tre, lineage, "rank")
        .select(col("node"), col("pos").cast("long").as("pos"),
          col("cumulative").cast("long").as("cumulative"))
    }),

    "q36_table_topk" -> ((s, dir) => {
      // table-side global top-k by summed percentage + min-count filter
      val rep = t(s, dir, "documents")
        .groupBy(col("source").as("sample"), col("lang").as("node"))
        .agg(count(lit(1)).as("count"))
      Table.minMaxCount(Table.topKGlobal(rep, 2), minCount = 3)
        .select(col("sample"), col("node"), col("count").cast("long").as("count"))
    }),

    "q37_relfilter" -> ((s, dir) => {
      // strict rel-filter (reference default 0.1, docs/classification.md:
      // 185-215 worked example): keep count >= maxC - ceil((maxC-minC)*0.1)
      // among the rel-cutoff survivors; oracle reproduces both windows on
      // exact 8-gram counts
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val binned = docs.withColumn("target",
        concat(col("lang"), lit("/"), col("source")))
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, binned, "target", "text", p)
      val res = Classify.classify(s, binned, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.25, relFilter = 0.1, fprQuery = 1.0))
      Classify.allMatches(res)
        .select(col("read_id").cast("long").as("doc_id"), col("target"))
    }),

    "q38_multifilter" -> ((s, dir) => {
      // per-filter rel-cutoff within one hierarchy level
      // (GanonClassify.cpp:353-401): the fused multi-filter pass must equal
      // the max-count merge of per-filter single runs at their own cutoffs
      val docs = t(s, dir, "documents").cache()
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val dbLang = SketchBuild.build(s, docs, "lang", "text", p)
      val dbSource = SketchBuild.build(s, docs, "source", "text", p)
      val cuts = Seq(0.25, 0.9)
      val fused = Classify.allMatches(Classify.classifyMultiFilter(
        s, docs, "doc_id", "text", Seq(dbLang, dbSource),
        ClassifyParams(fprQuery = 1.0), perFilterCutoff = cuts))
      val singles = cuts.zip(Seq(dbLang, dbSource)).map { case (c, d) =>
        Classify.allMatches(Classify.classify(s, docs, "doc_id", "text", d,
          ClassifyParams(relCutoff = c, fprQuery = 1.0)))
      }
      val merged = singles.reduce(_ unionByName _)
        .groupBy("read_id", "target")
        .agg(max(col("kmer_count")).as("kmer_count"))
      val mism = fused.withColumn("a", lit(1))
        .join(merged.withColumn("b", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("a").isNull || col("b").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q40_twolevel" -> ((s, dir) => {
      // the {ibf, hibf} parameterization as a driver check: flat IBF,
      // in-memory two-level, and the LAZY store-backed two-level must
      // classify identically (coarse pruning + shard fetch are lossless)
      val docs = t(s, dir, "documents").cache()
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val cp = ClassifyParams(relCutoff = 0.25)
      val flat = SketchBuild.build(s, docs, "source", "text", p)
      val two = SketchBuild.buildTwoLevel(s, docs, "source", "text", p)
      val dir2 = s"/tmp/graft_q40_${math.abs(dir.hashCode)}"
      graft.io.SketchStore.saveTwoLevel(s, two, dir2)
      val lzy = graft.io.SketchStore.loadTwoLevelLazy(s, dir2)
      val Seq(a, b, c) = Seq[graft.build.ProbeDb](flat, two, lzy).map { db =>
        Classify.allMatches(Classify.classify(s, docs, "doc_id", "text",
          db, cp))
      }
      val mism = a.withColumn("x", lit(1))
        .join(b.withColumn("y", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .join(c.withColumn("z", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("x").isNull || col("y").isNull || col("z").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q22_em_reassign" -> ((s, dir) => {
      // EM reassignment invariants, oracle-checkable per read: exactly one
      // final assignment, and it comes from the read's own match set
      // (count conservation: one row per classified read)
      val docs = t(s, dir, "documents")
      val db = SketchBuild.build(s, docs, "lang", "text",
        IbfParams(k = 8, w = 8, maxFp = 0.001))
      val res = Classify.classify(s, docs, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.25))
      val all = Classify.allMatches(res).cache()
      val one = graft.classify.Em.reassign(s, all)
      val valid = one.join(all.withColumnRenamed("kmer_count", "kc2"),
        Seq("read_id", "target"), "left_semi")
      valid.groupBy("read_id").agg((count(lit(1)) === 1).as("ok"))
        .select(col("read_id").cast("long").as("read_id"), col("ok"))
    }),

    "q41_langid" -> ((s, dir) => {
      // n-gram language-ID as a driver check: plant a deterministic
      // per-lang trigram marker (the corpus text contains no "qz" anywhere)
      // into every doc; profiles trained on even doc_ids then classify the
      // odd half perfectly, so accuracy == 1.0 is the oracle invariant
      val docs = t(s, dir, "documents")
      val marked = docs.withColumn("mtext",
        concat(repeat(concat(lit(" qz"), col("lang"), lit("qz ")), 64),
          coalesce(col("text"), lit(""))))
      val train = marked.filter(col("doc_id") % 2 === 0)
      val score = marked.filter(col("doc_id") % 2 === 1)
      TextStats.langId(s, train, score, "doc_id", "mtext", "lang",
        profileSize = 8)
        .groupBy("lang")
        .agg(count(lit(1)).as("n_scored"),
          sum(when(col("predicted_lang") === col("lang"), 1L)
            .otherwise(0L)).as("n_correct"))
    }),

    "q42_sizes_fallback" -> ((s, dir) => {
      // genome-size averaging with parent fallback (tax_util.py:161-224):
      // only leaves whose source ends in 0/5 carry sizes; every other node
      // takes the deepest sized ancestor's average (lang, then root)
      val docs = t(s, dir, "documents")
      val lineage = docs.select("lang", "source").distinct()
        .select(concat(col("lang"), lit("/"), col("source")).as("node"),
          array(lit("root"), col("lang"),
            concat(col("lang"), lit("/"), col("source"))).as("lineage"))
        .union(docs.select(col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage")).distinct())
        .union(s.range(1).select(lit("root").as("node"),
          array(lit("root")).as("lineage")))
      val leafSizes = docs
        .filter(col("source").endsWith("0") || col("source").endsWith("5"))
        .groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(sum(col("n_chars")).cast("double").as("size"))
      Report.genomeSizesWithFallback(lineage, leafSizes)
        .select(col("node"), floor(col("size") + 0.5).cast("long").as("size"))
    }),

    "q43_em_rep" -> ((s, dir) => {
      // EM .rep rewrite invariants (reassign.py:180-224), per target:
      // unique_reads + lca_reads == that target's rows in .one,
      // lca_reads >= 0, and raw match rows bound the assigned total
      val docs = t(s, dir, "documents")
      val db = SketchBuild.build(s, docs, "lang", "text",
        IbfParams(k = 8, w = 8, maxFp = 0.001))
      val res = Classify.classify(s, docs, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.25))
      val all = Classify.allMatches(res).cache()
      val (one, rep) = graft.classify.Em.reassignWithRep(s, all)
      val assigned = one.groupBy("target").agg(count(lit(1)).as("a"))
      rep.join(assigned, Seq("target"), "left").na.fill(0L, Seq("a"))
        .select(col("target"),
          (col("unique_reads") + col("lca_reads") === col("a"))
            .as("consistent"),
          (col("lca_reads") >= 0 &&
            col("matches") >= col("unique_reads") + col("lca_reads"))
            .as("bounded"))
    }),

    "q44_tre_formats" -> ((s, dir) => {
      // .tre csv output format incl. the leading unclassified row
      // (report.py:299-425): the oracle reconstructs every emitted line
      val docs = t(s, dir, "documents")
      val total = docs.count()
      val rows = docs.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
        .select(
          row_number().over(Window.orderBy(col("lang"))).cast("long").as("pos"),
          lit("lang").as("rank"), col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage"),
          col("lang").as("name"),
          col("cnt").as("unique"), lit(0L).as("shared"),
          col("cnt").as("cumulative"),
          (col("cnt") * 100.0 / (total + 13.0)).as("cum_perc"))
      Report.formatTre(rows, "csv", unclassified = 13, total = total + 13)
    }),

    "q46_stream_state" -> ((s, dir) => {
      // custom streaming state (mapGroupsWithState): per-event-type RUNNING
      // distinct-8-gram HLL over the props stream. Invariants: the final
      // state's n_reads equals the batch per-type row count, and its
      // estimate lands within the published HLL bound of the exact batch
      // answer (merge associativity makes state order-insensitive)
      val stream = stageStream(s, dir, "events")
      val out = graft.streaming.StreamClassify.runningDistinct(
        s, stream, "event_type", "props", k = 8, w = 8)
        .toDF("target", "est", "n_reads")
      val qname = "graft_stream_state_" + math.abs(dir.hashCode)
      val q = out.writeStream.outputMode("update").format("memory")
        .queryName(qname).start()
      q.processAllAvailable(); q.stop()
      val fin = s.table(qname).groupBy("target")
        .agg(max(struct(col("n_reads"), col("est"))).as("f"))
        .select(col("target"), col("f.est").as("est"),
          col("f.n_reads").as("n_reads"))
      val sh = graft.spark.ShinglesExpr.col(
        coalesce(col("props"), lit("")), 8, 8, Hashing.DefaultSeed)
      val ev = t(s, dir, "events")
      val exact = ev.select(col("event_type").as("target"), sh.as("hs"))
        .select(col("target"), explode_outer(col("hs")).as("h"))
        .groupBy("target").agg(countDistinct(col("h")).as("n_hash"))
      val nRows = ev.groupBy(col("event_type").as("target"))
        .agg(count(lit(1)).as("n_rows"))
      val bound = 3 * 1.04 / math.sqrt((1 << 14).toDouble)
      fin.join(exact, Seq("target")).join(nRows, Seq("target"))
        .select(col("target"), col("n_rows"),
          (col("n_reads") === col("n_rows") &&
            abs(col("est") - col("n_hash")) <=
              greatest(col("n_hash") * bound, lit(1.0))).as("ok"))
    }),

    "q71_stream_quantiles" -> ((s, dir) => {
      // streaming KLL state (the quantile twin of q46): per-event-type
      // RUNNING quantiles over the value stream. Invariants: the final
      // state's n equals the batch per-type row count, and each
      // estimate's RANK in the exact batch distribution lands within the
      // sketch's rank-error bound of its target quantile (the KLL
      // guarantee is on rank, not value)
      val stream = stageStream(s, dir, "events")
      val qs = Array(0.1, 0.5, 0.9)
      val kllK = 256
      val out = graft.streaming.StreamClassify.runningQuantiles(
        s, stream, "event_type", "value", qs, kllK)
        .toDF("target", "est", "n")
      val qname = "graft_stream_q_" + math.abs(dir.hashCode)
      val q = out.writeStream.outputMode("update").format("memory")
        .queryName(qname).start()
      q.processAllAvailable(); q.stop()
      val fin = s.table(qname).groupBy("target")
        .agg(max(struct(col("n"), col("est"))).as("f"))
        .select(col("target"), col("f.est").as("est"), col("f.n").as("n"))
      val ev = t(s, dir, "events")
        .select(col("event_type").as("target"), col("value"))
      val ranks = fin
        .select(col("target"), col("n"),
          posexplode(col("est")).as(Seq("qi", "e")))
        .join(ev, Seq("target"))
        .groupBy("target", "qi", "e", "n")
        .agg((sum(when(col("value") <= col("e"), 1).otherwise(0)) /
          count(lit(1))).as("rank"),
          count(lit(1)).as("n_rows"))
      val bound = graft.core.sketch.Kll.empty(kllK).rankErrorBound
      val qArr = array(qs.map(lit(_)): _*)
      ranks
        .withColumn("q", element_at(qArr, col("qi") + 1))
        .groupBy("target")
        .agg(max(col("n_rows")).as("n_rows"),
          (max(abs(col("rank") - col("q"))) <=
            lit(bound) + lit(2.0) / max(col("n_rows")) &&
            min((col("n") === col("n_rows")).cast("int")) === 1).as("ok"))
        .select(col("target"), col("n_rows"), col("ok"))
    }),

    "q72_stream_cms" -> ((s, dir) => {
      // streaming CMS state (the frequency leg of the trio with q46/q71):
      // per-event-type RUNNING token counts over the props stream.
      // Invariants: n equals the exact per-type token total, and every
      // probe token's estimate obeys the CMS guarantee against the exact
      // batch count — overestimate-only, within eps*N
      val ev = t(s, dir, "events")
      val toks = ev.select(col("event_type").as("target"),
        explode(filter(split(coalesce(col("props"), lit("")), "\\s+"),
          t2 => t2 =!= "")).as("tok"))
      // probe the 5 globally most frequent tokens (deterministic)
      val probes = toks.groupBy("tok").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tok").asc).limit(5)
        .collect().map(_.getString(0))
      val eps = 0.0005
      val stream = stageStream(s, dir, "events")
      val out = graft.streaming.StreamClassify.runningFrequency(
        s, stream, "event_type", "props", probes, eps, 0.001)
        .toDF("target", "est", "n")
      val qname = "graft_stream_cms_" + math.abs(dir.hashCode)
      val q = out.writeStream.outputMode("update").format("memory")
        .queryName(qname).start()
      q.processAllAvailable(); q.stop()
      val fin = s.table(qname).groupBy("target")
        .agg(max(struct(col("n"), col("est"))).as("f"))
        .select(col("target"), posexplode(col("f.est")).as(Seq("pi", "e")),
          col("f.n").as("n"))
        .withColumn("tok", element_at(array(probes.map(lit(_)): _*),
          col("pi") + 1))
      val exact = toks.groupBy("target", "tok").agg(count(lit(1)).as("ex"))
      val totals = toks.groupBy("target").agg(count(lit(1)).as("n_toks"))
      fin.join(exact, Seq("target", "tok"), "left")
        .na.fill(0L, Seq("ex"))
        .join(totals, Seq("target"))
        .groupBy("target")
        .agg(max(col("n_toks")).as("n_toks"),
          (min((col("n") === col("n_toks")).cast("int")) === 1 &&
            min((col("e") >= col("ex")).cast("int")) === 1 &&
            max(col("e") - col("ex") - ceil(lit(eps) * col("n_toks")))
              <= 0).as("ok"))
        .select(col("target"), col("n_toks"), col("ok"))
    }),

    "q47_build_store" -> ((s, dir) => {
      // build-direct-to-store: shard blobs written from executors, driver
      // bounded by coarse + metadata; the returned lazy db must classify
      // identically to the in-memory flat build (same plan, same bits)
      val docs = t(s, dir, "documents").cache()
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val cp = ClassifyParams(relCutoff = 0.25)
      val dir2 = s"/tmp/graft_q47_${math.abs(dir.hashCode)}"
      val lazyDb = SketchBuild.buildToStore(s, docs, "source", "text", dir2, p)
      val flat = SketchBuild.build(s, docs, "source", "text", p)
      val a = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", lazyDb, cp)).withColumn("u", lit(1))
      val b = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", flat, cp)).withColumn("f", lit(1))
      val mism = a.join(b, Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q48_embed_lsh_dups" -> ((s, dir) => {
      // the 100 TB embedding-dedup SCALE path (bucketed LSH + exact-cosine
      // verify, never all-pairs): plant an exact duplicate of every vector;
      // identical vectors share every table signature, so each planted pair
      // is a candidate with probability 1 and survives the cosine>=0.95
      // verify at cosine 1.0 — found deterministically (q31 stays the
      // exact-semantics witness for the all-pairs threshold query)
      val emb = t(s, dir, "embeddings")
      val offset = 1000000L
      val base = emb.select(col("vec_id").cast("long").as("vec_id"),
        col("embedding"))
      val corpus = base.unionByName(base.select(
        (col("vec_id") + offset).as("vec_id"), col("embedding")))
      val pairs = Ann.lshNearDupPairs(s, corpus, "vec_id", "embedding", 0.95)
      base.select(col("vec_id"))
        .join(pairs, col("vec_id") === col("id_a") &&
          col("id_b") === col("vec_id") + offset, "left")
        .select(col("vec_id"), col("id_b").isNotNull.as("ok"))
    }),

    "q49_multisample" -> ((s, dir) => {
      // multi-sample pipeline: ONE classify job carries the sample prefix
      // through to per-sample .rep rows (GanonClassify.cpp:289-351,
      // :834-863); full SQL oracle reproduces matches/unique/lca per
      // (sample, target) from exact 8-gram counts
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val binned = docs
        .withColumn("target", concat(col("lang"), lit("/"), col("source")))
        .withColumn("sample", concat(lit("s"), col("doc_id") % 3))
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, binned, "target", "text", p)
      val res = Classify.classifyBySample(s, binned, "sample", "doc_id",
        "text", db,
        ClassifyParams(relCutoff = 0.8, relFilter = 1.0, fprQuery = 1.0))
      Classify.reportBySample(res)
        .select(col("sample"), col("target"), col("matches"),
          col("unique_reads"), col("lca_reads"))
    }),

    "q50_update_twolevel" -> ((s, dir) => {
      // ganon-update on the STORED two-level layout: only touched shard
      // blobs rewritten (O(delta)); classification must equal a fresh
      // build of the final target set (full-containment cutoff + tiny
      // maxFp make the check FP-immune, as in q34)
      val docs = t(s, dir, "documents").cache()
      val sources = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0))
      val addSrc = sources.head
      val rmSrc = sources.last
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val dir2 = s"/tmp/graft_q50_${math.abs(dir.hashCode)}"
      SketchBuild.buildToStore(s, docs.filter(col("source") =!= addSrc),
        "source", "text", dir2, p)
      val updated = SketchBuild.updateStored(s, dir2,
        docs.filter(col("source") === addSrc), "source", "text",
        removeTargets = Seq(rmSrc))
      val fresh = SketchBuild.build(s, docs.filter(col("source") =!= rmSrc),
        "source", "text", p)
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      val a = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", updated, cp)).withColumn("u", lit(1))
      val b = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", fresh, cp)).withColumn("f", lit(1))
      val mism = a.join(b, Seq("read_id", "target"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q51_paired" -> ((s, dir) => {
      // paired-read classify (GanonClassify.cpp:695-700; reference test
      // GanonClassify.test.cpp:319-336): mates = adjacent halves of the
      // text, the read's hash set is their distinct UNION, and the oracle
      // reproduces n_hashes byte-exactly as the union of both halves'
      // 8-gram sets (halves' grams are subsets of the full text's, so the
      // own lang bin contains every union gram -> hit_own iff not skipped)
      val docs = t(s, dir, "documents")
      val paired = docs.select(col("doc_id"), col("lang"),
        expr("substring(text, 1, cast(length(text)/2 as int))").as("t1"),
        expr("substring(text, cast(length(text)/2 as int) + 1, length(text))")
          .as("t2"))
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, docs, "lang", "text", p)
      val res = Classify.classifyPaired(s, paired, "doc_id", "t1", "t2", db,
        ClassifyParams(relCutoff = 1.0, relFilter = 1.0, fprQuery = 1.0))
      val docLang = docs.select(col("doc_id").cast("string").as("read_id"),
        col("lang"))
      res.toDF().join(docLang, Seq("read_id"))
        .select(col("read_id").cast("long").as("doc_id"),
          col("n_hashes").cast("long").as("n_hashes"),
          exists(col("matches"),
            m => m.getField("target") === col("lang")).as("hit_own"))
    }),

    "q52_stream_dedup" -> ((s, dir) => {
      // streaming exact dedup: first occurrence per content digest across
      // micro-batches; the emitted digest SET equals batch distinct texts
      // (which row of a dup group survives is batch-order-dependent, so
      // the oracle checks digests, not ids)
      val stream = stageStream(s, dir, "documents")
      // the state key is the binary digest; project to lowercase hex for
      // the DuckDB sha256 comparison
      val out = graft.streaming.StreamClassify.dedupStream(stream, "text")
        .select(lower(hex(col("digest"))).as("digest"))
      val qname = "graft_stream_dedup_" + math.abs(dir.hashCode)
      val q = out.writeStream.outputMode("append").format("memory")
        .queryName(qname).start()
      q.processAllAvailable(); q.stop()
      s.table(qname)
    }),

    "q55_snapshot_isolation" -> ((s, dir) => {
      // generation-versioned store commits: a lazy handle loaded BEFORE an
      // update keeps serving its pinned snapshot THROUGH the update (every
      // shard read is COLD here — no probe happens until after the commit —
      // and resolves through the handle's per-group generation pointers),
      // while a post-commit load sees the new generation. The reference
      // gets this by atomically swapping whole filter files
      // (GanonBuild.cpp:251-288); this store does it per shard group with
      // per-group pointers so the update stays O(delta).
      val docs = t(s, dir, "documents").cache()
      val sources = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0))
      val rmSrc = sources.last
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val dir2 = s"/tmp/graft_q55_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(dir2))
      SketchBuild.buildToStore(s, docs, "source", "text", dir2, p)
      val pinned = graft.io.SketchStore.loadTwoLevelLazy(s, dir2)
      SketchBuild.updateStored(s, dir2, null, "source", "text",
        removeTargets = Seq(rmSrc))
      val post = graft.io.SketchStore.loadTwoLevelLazy(s, dir2)
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      def all(db: graft.build.ProbeDb) = Classify.allMatches(
        Classify.classify(s, docs, "doc_id", "text", db, cp))
      val freshAll = SketchBuild.build(s, docs, "source", "text", p)
      val freshPost = SketchBuild.build(s,
        docs.filter(col("source") =!= rmSrc), "source", "text", p)
      val mismPre = all(pinned).withColumn("u", lit(1))
        .join(all(freshAll).withColumn("f", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .select(col("read_id"))
      val mismPost = all(post).withColumn("u", lit(1))
        .join(all(freshPost).withColumn("f", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .select(col("read_id"))
      val bad = mismPre.unionByName(mismPost)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(bad, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    }),

    "q56_compact_store" -> ((s, dir) => {
      // store compaction after update cycles (reference rebuilds the layout
      // on update, build_update.py:157): removals leave masked holes and a
      // stale coarse; compactStored re-plans from the manifest cardinalities
      // (ONE content scan, pass 1 skipped) and must equal a fresh build of
      // the surviving set while the layout demonstrably shrinks
      val docs = t(s, dir, "documents").cache()
      val sources = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0))
      val rm1 = sources.last
      val rm2 = sources.head
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val dir2 = s"/tmp/graft_q56_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(dir2))
      SketchBuild.buildToStore(s, docs, "source", "text", dir2, p)
      SketchBuild.updateStored(s, dir2, null, "source", "text",
        removeTargets = Seq(rm1))
      SketchBuild.updateStored(s, dir2, null, "source", "text",
        removeTargets = Seq(rm2))
      val before = graft.io.SketchStore.loadTwoLevelLazy(s, dir2)
      val advised = SketchBuild.compactionAdvised(s, dir2,
        holeFracMax = 0.01).advised
      val keep = docs.filter(col("source") =!= rm1 && col("source") =!= rm2)
      val compacted = SketchBuild.compactStored(s, dir2, keep,
        "source", "text")
      val squeezed = advised &&
        compacted.layout.numBins < before.layout.numBins &&
        SketchBuild.compactionAdvised(s, dir2, 0.01).holeFrac == 0.0
      val fresh = SketchBuild.build(s, keep, "source", "text", p)
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      val a = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", graft.io.SketchStore.loadTwoLevelLazy(s, dir2), cp))
        .withColumn("u", lit(1))
      val b = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", fresh, cp)).withColumn("f", lit(1))
      val mism = a.join(b, Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          (col("bad").isNull && lit(squeezed)).as("ok"))
    }),

    "q57_cascade_tax" -> ((s, dir) => {
      // cascade with PER-LEVEL taxonomy/LCA (GanonClassify.cpp:1470-1515:
      // each hierarchy level loads its own filter tax + LCA): level 1 =
      // lang/source bins from EVEN docs, strict, resolving multi-matches by
      // LCA over root->lang->lang/source; level 2 = lang bins from ALL
      // docs, loose, max-count (no tax). Oracle-checkable invariants: each
      // eligible odd read appears EXACTLY once with a non-null assignment,
      // and every level-1 multi-match resolution is an LCA NODE of the
      // level-1 taxonomy (a lang or root), never an arbitrary leaf
      val docs = t(s, dir, "documents")
      val binned = docs.withColumn("target",
        concat(col("lang"), lit("/"), col("source")))
      val build1 = binned.filter(col("doc_id") % 2 === 0)
      val query = binned.filter(col("doc_id") % 2 === 1)
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val lvl1 = SketchBuild.build(s, build1, "target", "text", p)
      val lvl2 = SketchBuild.build(s, binned, "lang", "text", p)
      val parents = build1.select("lang", "target").distinct().collect()
        .flatMap(r => Seq(r.getString(1) -> r.getString(0),
          r.getString(0) -> "root")).toMap
      val lca1 = graft.core.Lca.build(parents, "root")
      val langs = docs.select("lang").distinct().collect()
        .map(_.getString(0)).toSet + "root"
      val out = Classify.cascadePerLevelTax(s, query, "doc_id", "text",
        Seq(
          ("1_source", lvl1,
            ClassifyParams(relCutoff = 0.6, relFilter = 0.1, fprQuery = 1e-9),
            Some(lca1)),
          ("2_lang", lvl2,
            ClassifyParams(relCutoff = 0.25, relFilter = 1.0, fprQuery = 1.0),
            None)))
      val isLcaNode = udf((a: String) => langs.contains(a))
      out.groupBy("read_id").agg(
        (count(lit(1)) === 1 &&
          min(col("assignment").isNotNull) === true &&
          min(when(col("hierarchy") === "1_source" && !col("unique"),
            isLcaNode(col("assignment")).cast("int")).otherwise(1)) === 1)
          .as("ok"))
        .select(col("read_id").cast("long").as("read_id"), col("ok"))
    }),

    "q53_report_toppct" -> ((s, dir) => {
      // top-percentile per rank (report.py:722-738): within each rank_depth
      // keep the rows at or above the ceil(p*n)-th largest percentage; the
      // oracle replays the window on exact counts
      val docs = t(s, dir, "documents")
      val counts = docs
        .groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(count(lit(1)).as("direct_count"))
      val lineage = docs.select("lang", "source").distinct()
        .select(concat(col("lang"), lit("/"), col("source")).as("node"),
          array(lit("root"), col("lang"),
            concat(col("lang"), lit("/"), col("source"))).as("lineage"))
        .union(docs.select(col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage")).distinct())
        .union(s.range(1).select(lit("root").as("node"),
          array(lit("root")).as("lineage")))
      val tre = Report.tree(counts, lineage)
      Report.topPercentilePerRank(tre, 0.5)
        .select(col("node"), col("rank_depth").cast("long").as("rank_depth"),
          col("cumulative").cast("long").as("cumulative"))
    }),

    "q54_report_minmax" -> ((s, dir) => {
      // report-side min/max-count with ganon's DUAL semantics
      // (report.py:766-780): v < 1 is a fraction of the total, v >= 1 an
      // absolute count — exercised together (fractional lower bound,
      // absolute upper bound) so both branches face the oracle
      val docs = t(s, dir, "documents")
      val counts = docs
        .groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(count(lit(1)).as("direct_count"))
      val lineage = docs.select("lang", "source").distinct()
        .select(concat(col("lang"), lit("/"), col("source")).as("node"),
          array(lit("root"), col("lang"),
            concat(col("lang"), lit("/"), col("source"))).as("lineage"))
        .union(docs.select(col("lang").as("node"),
          array(lit("root"), col("lang")).as("lineage")).distinct())
        .union(s.range(1).select(lit("root").as("node"),
          array(lit("root")).as("lineage")))
      val total = docs.count()
      val tre = Report.tree(counts, lineage)
      Report.maxCountFilter(
        Report.minCountFilter(tre, 0.04, total), total / 5.0, total)
        .select(col("node"), col("cumulative").cast("long").as("cumulative"))
    }),

    "q58_png_decode" -> ((s, dir) => {
      // REAL in-JVM image decode (PNG = DEFLATE + scanline filters; the
      // encoder cycles ALL FIVE filter types, so decode exercises every
      // unfilter path): synthesize a deterministic 16x8 grayscale PNG per
      // doc, decode through the byte-budget multimodal pipeline, emit the
      // pixel sum — a value only a correct inflate+unfilter can produce —
      // and let the oracle recompute it arithmetically from doc_id
      val docs = t(s, dir, "documents")
      val media = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkPngUdf(col("doc_id").cast("long")).as("payload"),
          lit("image/png").as("media_type"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      Multimodal.extractImageMeta(s, media).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("pixel_sum"))
    }),

    "q78_decontaminate" -> ((s, dir) => {
      // benchmark decontamination: every 50th doc is the EVAL set; train
      // docs sharing >= 8 distinct byte-8-grams with it are flagged. The
      // eval gram set is broadcast and the 100 TB train side is a
      // map-only probe (no shuffle). Contamination is PLANTED (train
      // docs with doc_id % 97 == 3 append their floor-50 eval doc's
      // text) so contaminated=true rows exist at every SF; the oracle
      // replays plant + overlap with exact hex-substring grams
      val docs = t(s, dir, "documents")
      val eval_ = docs.filter(col("doc_id") % 50 === 0)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val base = docs.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id").cast("long").as("doc_id"), col("text"))
      val planted = base.as("t").join(
          eval_.select(col("doc_id").as("eid"), col("text").as("etext"))
            .as("e"),
          col("t.doc_id") - col("t.doc_id") % 50 === col("eid"), "left")
        .select(col("t.doc_id").as("doc_id"),
          when(col("t.doc_id") % 97 === 3 && col("etext").isNotNull,
            concat(col("t.text"), lit(" "), col("etext")))
            .otherwise(col("t.text")).as("text"))
      graft.ops.Decontaminate.overlap(s, planted, eval_, "doc_id", "text",
        k = 8, minOverlap = 8)
    }),

    "q77_text_clean" -> ((s, dir) => {
      // the scraped-web cleaning pass: markup strip (tags + entity
      // decode + whitespace collapse) THEN PII redaction (emails, IPv4s,
      // 9+-digit runs -> typed placeholders, counted per category).
      // Markup and PII are PLANTED deterministically around each doc's
      // text (the corpus is clean, and a no-op row asserts nothing —
      // the q45 lesson); the oracle replays the planting, the strip and
      // the redaction with the same regexes in DuckDB
      val docs = t(s, dir, "documents")
      val noisy = docs.select(col("doc_id").cast("long").as("doc_id"),
        concat(lit("<div class=\"a\">"), col("text"),
          lit("</div> <br/> reach user"), col("doc_id"),
          lit("@example.com or 10.0.0."), col("doc_id") % 256,
          lit(" ref 98765432"), col("doc_id") % 10,
          lit(" &amp; <b>fin</b>")).as("text"))
      val cleaned = TextStats.stripMarkup(noisy, "doc_id", "text")
      TextStats.redactPii(cleaned, "doc_id", "cleaned")
    }),

    "q76_dedup_clusters" -> ((s, dir) => {
      // duplicate-CLUSTER resolution: connected components over the pair
      // relation + keep-one survivor per cluster. The pair input is the
      // CONSECUTIVE-copy chain (g - g+1e7, g+1e7 - g+2e7, for every
      // doc_id g % 7 == 0) and deliberately OMITS the g - g+2e7 pair, so
      // the green row proves TRANSITIVE closure itself, with an oracle
      // that stays exact (pair generation has its own rows: q17/q19/q48)
      val off = 10000000L
      val ids = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("id"))
      val dup = ids.filter(col("id") % 7 === 0)
      val corpus = ids
        .unionByName(dup.select((col("id") + off).as("id")))
        .unionByName(dup.select((col("id") + 2 * off).as("id")))
      val pairs = dup.select(col("id").as("doc_a"),
          (col("id") + off).as("doc_b"))
        .unionByName(dup.select((col("id") + off).as("doc_a"),
          (col("id") + 2 * off).as("doc_b")))
      Dedup.keepOnePerCluster(s, corpus, "id", pairs)
        .select(col("id").as("doc_id"), col("rep"), col("kept"))
    }),

    "q75_gif_decode" -> ((s, dir) => {
      // REAL in-JVM GIF decode (variable-width LZW + palette + interlace
      // de-scrambling): synthesize a deterministic INTERLACED 16x12 gray
      // GIF per doc; the format is lossless, so the decoded pixel sum is
      // exactly the synthesis formula (x3 for the gray->RGB palette
      // expansion) — same signature-dispatched verb as PNG/JPEG
      val docs = t(s, dir, "documents")
      val media = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkGifUdf(col("doc_id").cast("long")).as("payload"),
          lit("image/gif").as("media_type"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      Multimodal.extractImageMeta(s, media).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("pixel_sum"))
    }),

    "q74_batch_manifest" -> ((s, dir) => {
      // batch-manifest e2e (the last §2.1 row without a driver query):
      // sample-prefixed parquet FILES ON DISK + a TSV manifest ->
      // readBatchManifest -> readsFromManifest (per-sample tagging; s0's
      // mate table pairs only EVEN doc_ids, so odd s0 reads exercise the
      // single-end left-join degrade) -> ONE classifyBySample job ->
      // per-sample rep. Full SQL oracle replays the rel-cutoff classify
      // on exact 8-gram counts, with paired reads hashing the UNION of
      // both mates' grams (mate = upper(text), SQL-replayable)
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val base = s"/tmp/graft_q74_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(base))
      (0 until 3).foreach { i =>
        docs.filter(col("doc_id") % 3 === i)
          .select(col("doc_id"), col("text"))
          .write.mode("overwrite").parquet(s"$base/s$i.parquet")
      }
      docs.filter(col("doc_id") % 3 === 0 && col("doc_id") % 2 === 0)
        .select(col("doc_id"), upper(col("text")).as("text"))
        .write.mode("overwrite").parquet(s"$base/s0_mate.parquet")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$base/manifest.tsv"),
        s"s0\t$base/s0.parquet\t$base/s0_mate.parquet\n" +
          s"s1\t$base/s1.parquet\n" +
          s"s2\t$base/s2.parquet\n")
      val reads = graft.io.Formats.readsFromManifest(s,
        graft.io.Formats.readBatchManifest(s, s"$base/manifest.tsv"),
        "doc_id", "text")
      val binned = docs.withColumn("target",
        concat(col("lang"), lit("/"), col("source")))
      val db = SketchBuild.build(s, binned, "target", "text",
        IbfParams(k = 8, w = 8, maxFp = 1e-6))
      val res = Classify.classifyBySample(s, reads, "sample", "doc_id",
        "text", db,
        ClassifyParams(relCutoff = 0.25, relFilter = 1.0, fprQuery = 1.0),
        content2Col = Some("content2"))
      Classify.reportBySample(res)
        .select(col("sample"), col("target"), col("matches"),
          col("unique_reads"), col("lca_reads"))
    }),

    "q73_jpeg_decode" -> ((s, dir) => {
      // REAL in-JVM baseline JPEG decode (canonical Huffman + dequantize +
      // IDCT + restart markers): synthesize a deterministic 16x16 gray
      // JPEG of four constant blocks per doc — constant blocks survive
      // the lossy transform EXACTLY at quant=1 (single integral DC
      // coefficient) — decode through the same signature-dispatched
      // multimodal verb as PNG (q58), emit the pixel sum
      val docs = t(s, dir, "documents")
      val media = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkJpegUdf(col("doc_id").cast("long")).as("payload"),
          lit("image/jpeg").as("media_type"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      Multimodal.extractImageMeta(s, media).toDF()
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("channels").cast("long").as("channels"),
          col("pixel_sum"))
    }),

    "q59_stream_cascade" -> ((s, dir) => {
      // streaming hierarchy cascade (foreachBatch running the batch cascade
      // per micro-batch — the reference's level barriers are intra-read, so
      // any prefix of the stream equals the batch answer on the same rows):
      // the streamed (read, hierarchy, assignment) rows must hash-match the
      // batch cascade of the same file, and the q27 invariants hold
      val docs = t(s, dir, "documents")
      // stage a MULTI-FILE copy so maxFilesPerTrigger=1 yields several
      // micro-batches — the equality claim is only meaningful when the
      // stream actually crosses batch boundaries
      // restaged EVERY run: keying reuse on a _SUCCESS marker would serve
      // a stale copy if the fixtures under `dir` were regenerated between
      // runs (dir.hashCode, and so srcDir, would not change)
      val srcDir = s"/tmp/graft_stream_casc_${math.abs(dir.hashCode)}"
      docs.repartition(4).write.mode("overwrite").parquet(srcDir)
      val p = IbfParams(k = 8, w = 8, maxFp = 0.001)
      val build1 = docs.filter(col("doc_id") % 2 === 0)
      val lvl1 = SketchBuild.build(s, build1, "source", "text", p)
      val lvl2 = SketchBuild.build(s, docs, "lang", "text", p)
      val levels = Seq(
        ("1_source", lvl1.asInstanceOf[graft.build.ProbeDb],
          ClassifyParams(relCutoff = 0.6, relFilter = 0.1, fprQuery = 1e-9),
          Option.empty[graft.core.Lca]),
        ("2_lang", lvl2.asInstanceOf[graft.build.ProbeDb],
          ClassifyParams(relCutoff = 0.25, relFilter = 1.0, fprQuery = 1.0),
          Option.empty[graft.core.Lca]))
      val outDir = s"/tmp/graft_q59_out_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(outDir))
      val stream = s.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", "1") // 4 staged files -> 4 batches
        .parquet(srcDir)
        .filter(col("doc_id") % 2 === 1)
      val q = graft.streaming.StreamClassify.cascadeForeachBatch(
        s, stream, "doc_id", "text", levels) { (out, _) =>
        out.select("read_id", "hierarchy", "assignment")
          .write.mode("append").parquet(outDir)
      }.start()
      q.processAllAvailable(); q.stop()
      val streamed = s.read.parquet(outDir)
      val batchOut = Classify.cascadePerLevelTax(s,
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", levels)
      val mism = streamed.withColumn("a", lit(1))
        .join(batchOut.select("read_id", "hierarchy", "assignment")
          .withColumn("b", lit(1)),
          Seq("read_id", "hierarchy", "assignment"), "full_outer")
        .filter(col("a").isNull || col("b").isNull)
        .select("read_id").distinct().withColumn("bad", lit(1))
      batchOut.groupBy("read_id").agg(
        (count(lit(1)) === 1 &&
          min(col("assignment").isNotNull) === true).as("base_ok"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("read_id"),
          (col("base_ok") && col("bad").isNull).as("ok"))
    }),

    "q69_stream_live" -> ((s, dir) => {
      // live-store streaming classify: generation commits land at
      // micro-batch boundaries. Batch 0 classifies on generation 1 (the
      // holdout source absent), generation 2 commits the holdout between
      // batches, batch 1 classifies on generation 2 — each batch must
      // equal batch-mode classify against an equivalent fresh build of
      // ITS generation (never a mix), with the generation observed by the
      // sink carried per row so the oracle join checks the pairing too
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docs = t(s, dir, "documents").cache()
      val holdout = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0)).last
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val storeDir = s"/tmp/graft_q69_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(storeDir))
      SketchBuild.buildToStore(s, docs.filter(col("source") =!= holdout),
        "source", "text", storeDir, p)
      val rows = docs.select(col("doc_id").cast("string"), col("text"))
        .collect().map(r => (r.getString(0), r.getString(1)))
      val (b1, b2) = rows.partition(_._1.toLong % 2 == 0)
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      val outDir = s"/tmp/graft_q69_out_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(outDir))
      val ms = MemoryStream[(String, String)]
      val q = graft.streaming.StreamClassify.classifyLiveStore(s,
          ms.toDF().toDF("id", "text"), "id", "text", storeDir, cp) {
          (out, _, gen) =>
            out.withColumn("gen", lit(gen))
              .write.mode("append").parquet(outDir)
        }.start()
      ms.addData(b1: _*); q.processAllAvailable()
      SketchBuild.updateStored(s, storeDir,
        docs.filter(col("source") === holdout), "source", "text")
      ms.addData(b2: _*); q.processAllAvailable()
      q.stop()
      val streamed = s.read.parquet(outDir)
      def expect(rows: Array[(String, String)], base: DataFrame, gen: Int) =
        Classify.allMatches(Classify.classify(s,
            s.createDataFrame(rows.toSeq).toDF("id", "text"),
            "id", "text",
            SketchBuild.build(s, base, "source", "text", p), cp))
          .withColumn("gen", lit(gen))
      val expected = expect(b1, docs.filter(col("source") =!= holdout), 1)
        .unionByName(expect(b2, docs, 2))
      val mism = streamed.withColumn("a", lit(1))
        .join(expected.withColumn("b", lit(1)),
          Seq("read_id", "target", "kmer_count", "gen"), "full_outer")
        .filter(col("a").isNull || col("b").isNull)
        .select("read_id").distinct().withColumn("bad", lit(1))
      docs.select(col("doc_id").cast("long").as("doc_id"),
          col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("doc_id"), col("bad").isNull.as("ok"))
    }),

    "q70_stream_ingest" -> ((s, dir) => {
      // continuous ingest: the corpus arrives in three micro-batches
      // (create store / grow existing + append new / grow all) committing
      // one O(batch) generation each, gc keeping the last two; the final
      // store must classify EXACTLY like a fresh batch build over the
      // union — the update-equivalence invariant (q34/q50/q56) applied to
      // the streaming write path
      import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
      implicit val sqlCtx: org.apache.spark.sql.SQLContext = s.sqlContext
      import s.implicits._
      val docs = t(s, dir, "documents").cache()
      val rows = docs.select(col("source"), col("doc_id").cast("string"),
          col("text")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      val batches = rows.groupBy(_._2.toLong % 3).toSeq.sortBy(_._1)
        .map(_._2)
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val storeDir = s"/tmp/graft_q70_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(storeDir))
      val ms = MemoryStream[(String, String, String)]
      val q = graft.streaming.StreamClassify.ingestForeachBatch(s,
          ms.toDF().toDF("source", "doc_id", "text"), "source", "text",
          storeDir, p, gcKeepGens = Some(2)).start()
      batches.foreach { b => ms.addData(b: _*); q.processAllAvailable() }
      q.stop()
      // FORCED CRASH-REPLAY: simulate a crash between the last batch's
      // store commit and the stream's checkpoint commit — on restart the
      // batch re-runs verbatim. The store's own commit log must skip it;
      // before exactly-once, this replay double-appended the batch's new
      // targets and the equivalence check below failed
      val replayed = graft.streaming.StreamClassify.ingestBatch(s,
        batches.last.toSeq.toDF("source", "doc_id", "text"), "source",
        "text", storeDir, p, gcKeepGens = Some(2),
        batchId = (batches.length - 1).toLong)
      require(!replayed, "crash-replayed micro-batch must be a no-op")
      val cp = ClassifyParams(relCutoff = 1.0, fprQuery = 1.0)
      def ans(db: graft.build.ProbeDb) = Classify.allMatches(
        Classify.classify(s, docs, "doc_id", "text", db, cp))
      val mism = ans(graft.io.SketchStore.loadAny(s, storeDir))
        .withColumn("a", lit(1))
        .join(ans(SketchBuild.build(s, docs, "source", "text", p))
          .withColumn("b", lit(1)),
          Seq("read_id", "target", "kmer_count"), "full_outer")
        .filter(col("a").isNull || col("b").isNull)
        .select("read_id").distinct().withColumn("bad", lit(1))
      docs.select(col("doc_id").cast("long").as("doc_id"),
          col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("doc_id"), col("bad").isNull.as("ok"))
    }),

    "q45_simhash_pairs" -> ((s, dir) => {
      // simhash banded PAIR generation recall guarantee: an exact-duplicate
      // pair has identical token multisets => identical simhash => hamming 0
      // => shares all four 16-bit blocks, so it MUST be emitted; the output
      // is restricted to exactly those pairs so the oracle can enumerate
      // them with a self-join on text. Exact duplicates are PLANTED (every
      // 5th doc re-appears under id+10^7, as q48 plants embedding dups) so
      // the guarantee is asserted by >0 pairs at EVERY SF — the sf0.1
      // corpus has no natural exact-duplicate texts, and a green row over
      // 0 rows asserts nothing
      val offset = 10000000L
      val docs0 = t(s, dir, "documents")
        .select(col("doc_id").cast("long").as("id"), col("text"))
      val docs = docs0.unionByName(docs0.filter(col("id") % 5 === 0)
        .select((col("id") + offset).as("id"), col("text")))
      val sets = docs.select(col("id"),
        GraftFunctions.tokenHashes(col("text")).as("hs"))
      val pairs = Dedup.simhashPairs(s, sets, maxHamming = 3)
      val byText = docs.select(col("id"), sha2(col("text"), 256).as("h"))
      val exactPairs = byText.as("a").join(byText.as("b"),
          col("a.h") === col("b.h") && col("a.id") < col("b.id"))
        .select(col("a.id").as("doc_a"), col("b.id").as("doc_b"))
      exactPairs.join(pairs, Seq("doc_a", "doc_b"), "left")
        .select(col("doc_a"), col("doc_b"),
          col("hamming").isNotNull.as("found"))
    }),

    "q61_tax_formats" -> ((s, dir) => {
      // .tax TSV scan + FIRST-WINS tax merge + annotation join
      // (GanonClassify.cpp:988-1005, 1324-1341): the lineage is written
      // out as two .tax files — B re-lists every node with a WRONG parent,
      // so only first-wins merge order reproduces the truth — read back
      // through Formats.readTax, merged, and joined onto per-node counts
      val docs = t(s, dir, "documents")
      val leaves = docs.select(col("lang"),
          concat(col("lang"), lit("/"), col("source")).as("node"))
        .distinct().collect().map(r => (r.getString(1), r.getString(0)))
        .sortBy(_._1)
      val taxDir = s"/tmp/graft_q61_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(taxDir))
      new java.io.File(taxDir).mkdirs()
      def writeTsv(name: String, lines: Seq[String]): String = {
        val f = s"$taxDir/$name"
        val w = new java.io.PrintWriter(f, "UTF-8")
        try lines.foreach(w.println) finally w.close()
        f
      }
      val fileA = writeTsv("a.tax",
        leaves.map { case (n, p) => s"$n\t$p\tsequence\tN_$n" } ++
          leaves.map(_._2).distinct.sorted.map(l => s"$l\troot\tlang\tN_$l"))
      val fileB = writeTsv("b.tax",
        leaves.map { case (n, _) => s"$n\tWRONG\tbad\tx" })
      val merged = graft.io.Formats.taxToParents(
        graft.io.Formats.readTax(s, fileA)
          .unionByName(graft.io.Formats.readTax(s, fileB)))
      import s.implicits._
      val parentsDf = merged.toSeq.toDF("node", "parent")
      docs.groupBy(concat(col("lang"), lit("/"), col("source")).as("node"))
        .agg(count(lit(1)).as("cnt"))
        .join(parentsDf, Seq("node"))
        .select(col("node"), col("parent"), col("cnt"))
    }),

    "q62_unc" -> ((s, dir) => {
      // .unc sink (GanonClassify.cpp:1239-1249): db holds only the
      // odd-ranked langs; at FULL containment (the synthetic corpus
      // shares most 8-grams across langs, so any softer cutoff classifies
      // everything) the even-ranked langs' docs land in the unclassified
      // relation except the few whose gram set is wholly contained in a
      // kept lang's union — the oracle computes that set exactly.
      // Skip-rule docs are EXCLUDED from .unc (never entered classification)
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val langs = docs.select("lang").distinct().orderBy("lang")
        .collect().map(_.getString(0))
      val kept = langs.zipWithIndex.collect {
        case (l, i) if i % 2 == 0 => l
      }.toSet
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, docs.filter(col("lang").isin(
        kept.toSeq: _*)), "lang", "text", p)
      val res = Classify.classify(s, docs, "doc_id", "text", db,
        ClassifyParams(relCutoff = 1.0, relFilter = 1.0, fprQuery = 1.0))
      Classify.unclassified(res)
        .select(col("read_id").cast("long").as("doc_id"))
    }),

    "q63_lca_missing_root" -> ((s, dir) => {
      // missing-target -> root patch (GanonClassify.cpp:1343-1362): q33's
      // cascade taxonomy with the lexicographically FIRST lang's subtree
      // omitted from the .tax side — its targets are unknown to the LCA,
      // so any read whose survivors touch them resolves to root
      val docs = t(s, dir, "documents")
        .filter(octet_length(col("text")) >= 8)
      val binned = docs.withColumn("target",
        concat(col("lang"), lit("/"), col("source")))
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-6)
      val db = SketchBuild.build(s, binned, "target", "text", p)
      val missingLang = docs.select("lang").distinct().orderBy("lang")
        .first().getString(0)
      val parents = binned.select("lang", "target").distinct().collect()
        .filter(_.getString(0) != missingLang)
        .flatMap(r => Seq(r.getString(1) -> r.getString(0),
          r.getString(0) -> "root")).toMap
      val lca = graft.core.Lca.build(parents, "root")
      val res = Classify.classify(s, binned, "doc_id", "text", db,
        ClassifyParams(relCutoff = 0.8, relFilter = 1.0, fprQuery = 1.0),
        lcaOpt = Some(lca))
      res.toDF().filter(col("assignment").isNotNull)
        .select(col("read_id").cast("long").as("doc_id"),
          col("assignment"))
    }),

    "q64_input_file" -> ((s, dir) => {
      // --input-file manifest scan (build_update.py:586-608): odd-ranked
      // sources OMIT the target column, which must default to the file
      // basename (reference behavior, encoded in Formats.readInputFile)
      val docs = t(s, dir, "documents")
      val sources = docs.select("source").distinct().orderBy("source")
        .collect().map(_.getString(0))
      val manDir = s"/tmp/graft_q64_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(manDir))
      new java.io.File(manDir).mkdirs()
      val w = new java.io.PrintWriter(s"$manDir/input.tsv", "UTF-8")
      try sources.zipWithIndex.foreach { case (src, i) =>
        if ((i + 1) % 2 == 0) w.println(s"files/$src.fa\tT_$src")
        else w.println(s"files/$src.fa")
      } finally w.close()
      graft.io.Formats.readInputFile(s, s"$manDir/input.tsv")
        .select(col("file"), col("target"))
    }),

    "q66_wav_decode" -> ((s, dir) => {
      // REAL in-JVM audio decode (WAV = RIFF chunk walk + little-endian
      // PCM; the encoder plants an odd-length junk chunk so the
      // unknown-chunk skip and word-padding paths are always exercised):
      // synthesize a deterministic 16-bit mono clip per doc, decode
      // through the byte-budget multimodal pipeline, emit integer sample
      // stats — values only a correct chunk-walk + PCM decode can
      // produce — and let the oracle recompute them from doc_id
      val docs = t(s, dir, "documents")
      val media = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkWavUdf(col("doc_id").cast("long")).as("payload"),
          lit("audio/wav").as("media_type"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      Multimodal.extractAudioMeta(s, media).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("sample_rate"),
          col("channels").cast("long").as("channels"),
          col("n_frames"), col("peak"), col("sum_abs"))
    }),

    "q67_media_transform" -> ((s, dir) => {
      // the transform verbs of the multimodal layer: nearest-neighbor
      // RESIZE (16x8 -> 4x4) over decoded PNGs and stride-4 FRAME-SAMPLE
      // over decoded WAVs — both exact-integer, so the oracle replays the
      // index mapping arithmetically from doc_id
      val docs = t(s, dir, "documents")
      val imgs = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkPngUdf(col("doc_id").cast("long")).as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      val clips = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkWavUdf(col("doc_id").cast("long")).as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      // payloads here are COMPUTED (UDF fixtures), so the byte-budget
      // sizing pass would re-run every encode; 0 keeps input partitioning
      // (q58/q66/q68 still exercise the sized path on the same verbs)
      val r = Multimodal.resizeImages(s, imgs, 4, 4,
        targetPartitionBytes = 0L).toDF()
        .select(col("doc_id"), col("width").cast("long").as("rwidth"),
          col("height").cast("long").as("rheight"),
          col("pixel_sum").as("resized_sum"))
      val f = Multimodal.frameSampleAudio(s, clips, 4,
        targetPartitionBytes = 0L).toDF()
        .select(col("doc_id"),
          col("sample_rate").cast("long").as("s_rate"),
          col("n_frames").as("s_frames"), col("peak").as("s_peak"),
          col("sum_abs").as("s_sum_abs"))
      r.join(f, Seq("doc_id"))
    }),

    "q68_video_frames" -> ((s, dir) => {
      // REAL in-JVM video decode (Y4M = ASCII header grammar + raw
      // planar frames; the encoder plants unknown Xgraft parameters on
      // the stream AND frame headers so the tag-skip path is always
      // exercised) + stride-2 FRAME-SAMPLE: synthesize a deterministic
      // mono clip per doc, decode through the byte-budget multimodal
      // pipeline, emit integer luma stats for the full and decimated
      // clips — values only a correct header walk + plane slicing can
      // produce — and let the oracle recompute them from doc_id
      val docs = t(s, dir, "documents")
      val media = docs.select(col("doc_id").cast("long").as("doc_id"),
          mkY4mUdf(col("doc_id").cast("long")).as("payload"))
        .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      val full = Multimodal.extractVideoMeta(s, media).toDF()
        .select(col("doc_id"), col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("n_frames"), col("y_sum"),
          col("y_peak").cast("long").as("y_peak"))
      val sampled = Multimodal.frameSampleVideo(s, media, 2,
        targetPartitionBytes = 0L).toDF() // computed payloads: skip sizing
        .select(col("doc_id"), col("fps_den").cast("long").as("s_fps_den"),
          col("n_frames").as("s_frames"), col("y_sum").as("s_y_sum"))
      full.join(sampled, Seq("doc_id"))
    }),

    "q65_min_checkpoint" -> ((s, dir) => {
      // .min-spill checkpoint reuse (SURVEY §2.1; ganon-build --input
      // re-runs read the spilled minimizer files): a build that RESUMES
      // from a params-fingerprinted checkpoint must be bit-identical to
      // the build that wrote it, and classify exactly like a fresh
      // uncheckpointed build
      val docs = t(s, dir, "documents")
      val p = IbfParams(k = 8, w = 8, maxFp = 1e-5)
      val ckDir = s"/tmp/graft_q65_${math.abs(dir.hashCode)}"
      deleteRec(new java.io.File(ckDir))
      val db1 = SketchBuild.build(s, docs, "lang", "text", p,
        checkpointDir = Some(ckDir))
      val db2 = SketchBuild.build(s, docs, "lang", "text", p,
        checkpointDir = Some(ckDir)) // second run reads the checkpoint
      require(java.util.Arrays.equals(db1.ibf.toBytes, db2.ibf.toBytes),
        "checkpoint-resumed build must be bit-identical to the writer")
      val fresh = SketchBuild.build(s, docs, "lang", "text", p)
      val cp = ClassifyParams(relCutoff = 0.25)
      val a = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", db2, cp)).withColumn("u", lit(1))
      val b = Classify.allMatches(Classify.classify(s, docs, "doc_id",
        "text", fresh, cp)).withColumn("f", lit(1))
      val mism = a.join(b, Seq("read_id", "target"), "full_outer")
        .filter(col("u").isNull || col("f").isNull)
        .groupBy("read_id").agg(count(lit(1)).as("bad"))
      docs.select(col("doc_id").cast("string").as("read_id"))
        .join(mism, Seq("read_id"), "left")
        .select(col("read_id").cast("long").as("doc_id"),
          col("bad").isNull.as("ok"))
    })
  )

  def oracleSql: Map[String, String] = Map(

    "q01_pushdown_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(round(l_quantity*100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
        |  CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS sum_price_c,
        |  CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY 1, 2""".stripMargin,

    "q02_join_agg" ->
      """SELECT n_name, r_name, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_c
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1, 2""".stripMargin,

    "q03_window_topk" ->
      """SELECT o_orderpriority, CAST(rn AS BIGINT) AS rn, o_orderkey FROM (
        |  SELECT o_orderpriority, o_orderkey,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) WHERE rn <= 3""".stripMargin,

    "q04_dedup_exact" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(MIN(doc_id) OVER (PARTITION BY text) AS BIGINT) AS canonical_id,
        |  CAST(COUNT(*) OVER (PARTITION BY text) AS BIGINT) AS dup_count
        |FROM documents""".stripMargin,

    "q05_token_stats" ->
      """WITH toks AS (SELECT doc_id,
        |  list_filter(regexp_split_to_array(text, '\s+'), t -> t <> '') AS ts
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(len(ts) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(ts)) AS BIGINT) AS n_distinct_tokens,
        |  CAST(len(list_filter(ts,
        |    t -> list_contains(['the','a','of','and','to','in','is','it'], t)))
        |    AS BIGINT) AS n_stopwords,
        |  CAST(COALESCE(list_sum(list_transform(ts, t -> length(t))), 0)
        |    AS BIGINT) AS sum_token_len
        |FROM toks""".stripMargin,

    // length() counts CHARACTERS in both engines (Spark length ==
    // DuckDB length); strlen here would count bytes and diverge on any
    // non-ASCII text
    "q06_quality_signals" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(length(text) AS BIGINT) AS n_chars,
        |  CAST(length(text) - length(regexp_replace(text, '[a-zA-Z]', '', 'g'))
        |    AS BIGINT) AS n_letters,
        |  CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g'))
        |    AS BIGINT) AS n_digits,
        |  CAST(length(text) - length(replace(text, ' ', ''))
        |    AS BIGINT) AS n_spaces
        |FROM documents""".stripMargin,

    "q07_rollup_tree" ->
      """WITH leaf AS (
        |  SELECT lang || '/' || source AS node, lang,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2)
        |SELECT node, CAST(2 AS BIGINT) AS rank_depth, c AS direct,
        |  c AS cumulative FROM leaf
        |UNION ALL
        |SELECT lang AS node, CAST(1 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(SUM(c) AS BIGINT) FROM leaf GROUP BY lang
        |UNION ALL
        |SELECT 'root', CAST(0 AS BIGINT), CAST(0 AS BIGINT),
        |  CAST(SUM(c) AS BIGINT) FROM leaf""".stripMargin,

    "q08_pivot" ->
      """SELECT source AS sample,
        |  CAST(COUNT(*) FILTER (lang = 'de') AS BIGINT) AS de,
        |  CAST(COUNT(*) FILTER (lang = 'en') AS BIGINT) AS en,
        |  CAST(COUNT(*) FILTER (lang = 'es') AS BIGINT) AS es,
        |  CAST(COUNT(*) FILTER (lang = 'fr') AS BIGINT) AS fr,
        |  CAST(COUNT(*) FILTER (lang = 'zh') AS BIGINT) AS zh
        |FROM documents GROUP BY 1""".stripMargin,

    "q09_anti_join" ->
      """SELECT c_custkey FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderstatus = 'F')""".stripMargin,

    "q10_min_frequency" ->
      """WITH rep AS (
        |  SELECT source AS sample, lang AS node, CAST(COUNT(*) AS BIGINT) AS count
        |  FROM documents GROUP BY 1, 2)
        |SELECT sample, node, count FROM rep
        |WHERE node IN (
        |  SELECT node FROM rep GROUP BY node
        |  HAVING COUNT(DISTINCT sample) >= 20)""".stripMargin,

    "q11_hll_tokens" ->
      """SELECT lang,
        |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_exact, true AS ok
        |FROM (SELECT lang, unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok
        |      FROM documents)
        |GROUP BY lang""".stripMargin,

    "q12_hll_lineitem" ->
      """SELECT l_returnflag,
        |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact, true AS ok
        |FROM lineitem GROUP BY 1""".stripMargin,

    "q13_cms_tokens" ->
      """SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt, true AS ok
        |FROM (SELECT unnest(list_filter(
        |    regexp_split_to_array(text, '\s+'), t -> t <> '')) AS tok
        |      FROM documents)
        |GROUP BY tok ORDER BY exact_cnt DESC, tok ASC LIMIT 20""".stripMargin,

    "q14_kll_quantiles" ->
      """SELECT CAST(q AS DOUBLE) AS q, true AS ok, true AS ok_td
        |FROM (VALUES (0.1), (0.25), (0.5), (0.75), (0.9)) AS v(q)""".stripMargin,

    "q15_bloom_bins" ->
      """SELECT DISTINCT lang, true AS zero_fn, true AS fpr_ok
        |FROM documents""".stripMargin,

    // the oracle expresses the engine's skip rule EXACTLY: the read is
    // classified iff its distinct byte-8-gram count nd is in [1, 65535]
    // (nd = 0 <=> fewer than w=8 bytes; nd > 65535 = uint16 overflow
    // skip). A length bound alone would misjudge repetitive docs, whose
    // nd stays tiny at any length.
    "q16_classify_selfhit" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  (len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |   BETWEEN 1 AND 65535) AS hit_own
        |FROM documents""".stripMargin,

    "q17_minhash_dups" ->
      """WITH tok AS (
        |  SELECT doc_id, list_sort(list_distinct(list_filter(
        |    regexp_split_to_array(text, '\s+'), t -> t <> '')))
        |    AS toks
        |  FROM documents)
        |SELECT CAST(a.doc_id AS BIGINT) AS doc_a,
        |  CAST(b.doc_id AS BIGINT) AS doc_b
        |FROM tok a JOIN tok b ON a.toks = b.toks AND a.doc_id < b.doc_id"""
        .stripMargin,

    "q18_ann_topk" ->
      """WITH pairs AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |    list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                     CAST(c.embedding AS DOUBLE[])) /
        |    (sqrt(list_dot_product(CAST(q.embedding AS DOUBLE[]),
        |                           CAST(q.embedding AS DOUBLE[]))) *
        |     sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
        |                           CAST(c.embedding AS DOUBLE[])))) AS cosine
        |  FROM embeddings q JOIN embeddings c ON q.vec_id < 10
        |    AND q.vec_id <> c.vec_id)
        |SELECT query_id, CAST(rn AS BIGINT) AS rank, neighbor_id FROM (
        |  SELECT query_id, neighbor_id,
        |    row_number() OVER (PARTITION BY query_id
        |      ORDER BY cosine DESC, neighbor_id ASC) AS rn
        |  FROM pairs) WHERE rn <= 5""".stripMargin,

    "q23_redistribute" ->
      """WITH leaf AS (
        |  SELECT lang, lang || '/' || source AS leaf, COUNT(*) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT lang, SUM(c) AS t FROM leaf GROUP BY 1),
        |langc AS (SELECT lang, COUNT(*) AS lc FROM documents GROUP BY 1),
        |shares AS (
        |  SELECT l.leaf, l.c, FLOOR(lc * l.c / t) AS share,
        |    row_number() OVER (PARTITION BY l.lang
        |      ORDER BY l.c DESC, l.leaf ASC) AS rn,
        |    lc - SUM(FLOOR(lc * l.c / t)) OVER (PARTITION BY l.lang)
        |      AS leftover
        |  FROM leaf l JOIN tot USING (lang) JOIN langc USING (lang))
        |SELECT leaf, CAST(c + share +
        |  (CASE WHEN rn <= leftover THEN 1 ELSE 0 END) AS BIGINT)
        |  AS redistributed_count
        |FROM shares""".stripMargin,

    "q24_size_correction" ->
      """SELECT CAST(1 AS BIGINT) AS rank_depth, true AS conserved""".stripMargin,

    "q25_classify_stats" ->
      """WITH d AS (SELECT
        |  len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  AS nd FROM documents)
        |SELECT CAST(COUNT(*) AS BIGINT) AS seqs_processed,
        |  CAST(COUNT(*) FILTER (nd BETWEEN 1 AND 65535) AS BIGINT)
        |    AS seqs_classified,
        |  CAST(COUNT(*) FILTER (nd < 1 OR nd > 65535) AS BIGINT)
        |    AS seqs_skipped
        |FROM d""".stripMargin,

    "q20_stream_window" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS sum_value_c
        |FROM events GROUP BY 1, 2""".stripMargin,

    "q28_hll_events" ->
      """SELECT event_type,
        |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_exact, true AS ok
        |FROM events GROUP BY 1""".stripMargin,

    "q29_kll_grouped" ->
      """SELECT DISTINCT event_type, true AS ok FROM events""".stripMargin,

    "q30_cms_events" ->
      """SELECT user_id, CAST(COUNT(*) AS BIGINT) AS exact_cnt, true AS ok
        |FROM events GROUP BY user_id
        |ORDER BY exact_cnt DESC, user_id ASC LIMIT 20""".stripMargin,

    "q31_embed_neardup" ->
      """SELECT a.vec_id AS id_a, b.vec_id AS id_b
        |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
        |WHERE list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                       CAST(b.embedding AS DOUBLE[])) /
        |  (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),
        |                         CAST(a.embedding AS DOUBLE[]))) *
        |   sqrt(list_dot_product(CAST(b.embedding AS DOUBLE[]),
        |                         CAST(b.embedding AS DOUBLE[])))) >= 0.5"""
        .stripMargin,

    "q21_media_meta" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(strlen(text) AS BIGINT) AS n_bytes, true AS feat_ok
        |FROM documents""".stripMargin,

    "q19_simhash" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q32_skew_split" ->
      """SELECT DISTINCT
        |  CASE WHEN doc_id % 2 = 0 THEN 'mega' ELSE source END AS target,
        |  true AS zero_fn, true AS fpr_ok, true AS plan_ok, true AS size_ok
        |FROM documents""".stripMargin,

    "q33_lca" ->
      """WITH grams AS (
        |  SELECT doc_id, lang, source, lang || '/' || source AS target,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents
        |  WHERE len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |    BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (SELECT target AS t2, lang AS l2, g FROM grams GROUP BY ALL),
        |hits AS (
        |  SELECT gr.doc_id, b.t2, b.l2, COUNT(*) AS c
        |  FROM grams gr JOIN binset b ON gr.g = b.g
        |  GROUP BY 1, 2, 3),
        |surv AS (
        |  SELECT h.doc_id, h.t2, h.l2
        |  FROM hits h JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 0.8)))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CASE WHEN COUNT(*) = 1 THEN MIN(t2)
        |       WHEN COUNT(DISTINCT l2) = 1 THEN MIN(l2)
        |       ELSE 'root' END AS assignment
        |FROM surv GROUP BY doc_id""".stripMargin,

    "q34_update" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q35_report_sort" ->
      """WITH leaf AS (
        |  SELECT lang || '/' || source AS node, lang,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |nodes AS (
        |  SELECT node, 2 AS rank_depth, c AS cumulative FROM leaf
        |  UNION ALL
        |  SELECT lang, 1, CAST(SUM(c) AS BIGINT) FROM leaf GROUP BY lang
        |  UNION ALL
        |  SELECT 'root', 0, CAST(SUM(c) AS BIGINT) FROM leaf)
        |SELECT node,
        |  CAST(row_number() OVER (ORDER BY
        |    (CASE WHEN node = 'root' THEN 0 ELSE 1 END),
        |    rank_depth, cumulative DESC, node) AS BIGINT) AS pos,
        |  cumulative
        |FROM nodes""".stripMargin,

    "q36_table_topk" ->
      """WITH rep AS (
        |  SELECT source AS sample, lang AS node, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT sample, SUM(cnt) AS st FROM rep GROUP BY 1),
        |sump AS (
        |  SELECT node, SUM(cnt * 100.0 / st) AS sp
        |  FROM rep JOIN tot USING (sample)
        |  WHERE node <> 'root' GROUP BY node),
        |top AS (SELECT node FROM sump ORDER BY sp DESC, node LIMIT 2)
        |SELECT sample, node, CAST(cnt AS BIGINT) AS count
        |FROM rep
        |WHERE (node IN (SELECT node FROM top) OR node = 'root')
        |  AND cnt >= 3""".stripMargin,

    "q37_relfilter" ->
      """WITH grams AS (
        |  SELECT doc_id, lang || '/' || source AS target,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents
        |  WHERE len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |    BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (SELECT target AS t2, g FROM grams GROUP BY ALL),
        |hits AS (
        |  SELECT gr.doc_id, b.t2, COUNT(*) AS c
        |  FROM grams gr JOIN binset b ON gr.g = b.g
        |  GROUP BY 1, 2),
        |surv AS (
        |  SELECT h.doc_id, h.t2, h.c
        |  FROM hits h JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 0.25))),
        |thr AS (SELECT doc_id, MAX(c) AS mx, MIN(c) AS mn
        |        FROM surv GROUP BY 1)
        |SELECT CAST(s.doc_id AS BIGINT) AS doc_id, s.t2 AS target
        |FROM surv s JOIN thr USING (doc_id)
        |WHERE s.c >= thr.mx - CEIL((thr.mx - thr.mn) * 0.1)""".stripMargin,

    "q38_multifilter" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q39_fingerprint" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q40_twolevel" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q22_em_reassign" ->
      """SELECT CAST(doc_id AS BIGINT) AS read_id, true AS ok
        |FROM documents
        |WHERE len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  BETWEEN 1 AND 65535""".stripMargin,

    "q26_ann_lsh" ->
      """SELECT vec_id AS query_id, true AS ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q60_ann_ivf" ->
      """SELECT vec_id AS query_id, true AS ok
        |FROM embeddings WHERE vec_id < 10""".stripMargin,

    "q27_cascade" ->
      """SELECT CAST(doc_id AS BIGINT) AS read_id, true AS ok
        |FROM documents
        |WHERE doc_id % 2 = 1 AND len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  BETWEEN 1 AND 65535"""
        .stripMargin,

    "q41_langid" ->
      """SELECT lang, COUNT(*) AS n_scored, COUNT(*) AS n_correct
        |FROM documents WHERE doc_id % 2 = 1 GROUP BY lang""".stripMargin,

    "q42_sizes_fallback" ->
      """WITH leafsz AS (
        |  SELECT lang || '/' || source AS node, lang,
        |         CAST(SUM(n_chars) AS DOUBLE) AS size
        |  FROM documents WHERE source LIKE '%0' OR source LIKE '%5'
        |  GROUP BY 1, 2),
        |langavg AS (SELECT lang, AVG(size) AS a FROM leafsz GROUP BY 1),
        |rootavg AS (SELECT AVG(size) AS a FROM leafsz),
        |nodes AS (
        |  SELECT DISTINCT lang || '/' || source AS node, lang FROM documents
        |  UNION ALL SELECT DISTINCT lang, lang FROM documents
        |  UNION ALL SELECT 'root', NULL)
        |SELECT n.node,
        |  CAST(FLOOR(COALESCE(l.size, la.a, ra.a) + 0.5) AS BIGINT) AS size
        |FROM nodes n
        |LEFT JOIN leafsz l ON n.node = l.node
        |LEFT JOIN langavg la ON n.lang = la.lang
        |CROSS JOIN rootavg ra""".stripMargin,

    "q43_em_rep" ->
      """SELECT lang AS target, true AS consistent, true AS bounded
        |FROM documents
        |WHERE len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  BETWEEN 1 AND 65535
        |GROUP BY lang""".stripMargin,

    "q44_tre_formats" ->
      """WITH g AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY 1),
        |tot AS (SELECT SUM(c) + 13 AS t FROM g)
        |SELECT concat_ws(',', 'lang', lang, 'root|' || lang, lang,
        |  CAST(c AS VARCHAR), '0', '0', CAST(c AS VARCHAR),
        |  printf('%.5f', c * 100.0 / t)) AS line
        |FROM g, tot
        |UNION ALL
        |SELECT concat_ws(',', 'unclassified', '-', '-', 'unclassified',
        |  '0', '0', '0', '13', printf('%.5f', 13.0 / t * 100))
        |FROM tot""".stripMargin,

    "q45_simhash_pairs" ->
      """WITH corpus AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id, text FROM documents
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) + 10000000, text FROM documents
        |  WHERE doc_id % 5 = 0)
        |SELECT a.id AS doc_a, b.id AS doc_b, true AS found
        |FROM corpus a
        |JOIN corpus b ON a.text = b.text AND a.id < b.id""".stripMargin,

    "q46_stream_state" ->
      """SELECT event_type AS target, COUNT(*) AS n_rows, true AS ok
        |FROM events GROUP BY event_type""".stripMargin,

    "q47_build_store" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q71_stream_quantiles" ->
      """SELECT event_type AS target, COUNT(*) AS n_rows, true AS ok
        |FROM events GROUP BY event_type""".stripMargin,

    "q72_stream_cms" ->
      """SELECT event_type AS target,
        |  CAST(SUM(len(list_filter(regexp_split_to_array(
        |    coalesce(props, ''), '\s+'), t -> t <> ''))) AS BIGINT)
        |    AS n_toks,
        |  true AS ok
        |FROM events GROUP BY event_type""".stripMargin,

    "q48_embed_lsh_dups" ->
      """SELECT CAST(vec_id AS BIGINT) AS vec_id, true AS ok
        |FROM embeddings""".stripMargin,

    // exact replay of the engine's multi-sample rel-cutoff classify on
    // 8-gram counts: matches = surviving (read, target) rows; unique =
    // reads with exactly one survivor; lca column counts multi-match reads
    // per ASSIGNED target — with no taxonomy the engine assigns
    // maxBy(count, target), i.e. highest count, ties to the LEXICALLY
    // GREATEST target (Scala tuple max), reproduced by the window sort
    "q49_multisample" ->
      """WITH grams AS (
        |  SELECT doc_id, 's' || (doc_id % 3) AS sample,
        |    lang || '/' || source AS target,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents
        |  WHERE len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |    BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (SELECT target AS t2, g FROM grams GROUP BY ALL),
        |hits AS (
        |  SELECT gr.doc_id, ANY_VALUE(gr.sample) AS sample, b.t2,
        |    COUNT(*) AS c
        |  FROM grams gr JOIN binset b ON gr.g = b.g
        |  GROUP BY gr.doc_id, b.t2),
        |surv AS (
        |  SELECT h.doc_id, h.sample, h.t2, h.c
        |  FROM hits h JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 0.8))),
        |nsurv AS (SELECT doc_id, COUNT(*) AS ns FROM surv GROUP BY 1),
        |m AS (SELECT sample, t2, CAST(COUNT(*) AS BIGINT) AS matches
        |      FROM surv GROUP BY 1, 2),
        |uniq AS (
        |  SELECT s.sample, s.t2, CAST(COUNT(*) AS BIGINT) AS unique_reads
        |  FROM surv s JOIN nsurv USING (doc_id) WHERE ns = 1 GROUP BY 1, 2),
        |assigned AS (
        |  SELECT sample, t2 FROM (
        |    SELECT s.sample, s.t2, row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY s.c DESC, s.t2 DESC) AS rn
        |    FROM surv s JOIN nsurv USING (doc_id) WHERE ns > 1)
        |  WHERE rn = 1),
        |lca AS (SELECT sample, t2, CAST(COUNT(*) AS BIGINT) AS lca_reads
        |        FROM assigned GROUP BY 1, 2)
        |SELECT m.sample, m.t2 AS target, m.matches,
        |  COALESCE(u.unique_reads, 0) AS unique_reads,
        |  COALESCE(l.lca_reads, 0) AS lca_reads
        |FROM m
        |LEFT JOIN uniq u ON m.sample = u.sample AND m.t2 = u.t2
        |LEFT JOIN lca l ON m.sample = l.sample AND m.t2 = l.t2""".stripMargin,

    "q50_update_twolevel" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q55_snapshot_isolation" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q56_compact_store" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q69_stream_live" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q70_stream_ingest" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q53_report_toppct" ->
      """WITH leaf AS (
        |  SELECT lang || '/' || source AS node, lang,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |nodes AS (
        |  SELECT node, 2 AS rank_depth, c AS cumulative FROM leaf
        |  UNION ALL
        |  SELECT lang, 1, CAST(SUM(c) AS BIGINT) FROM leaf GROUP BY lang
        |  UNION ALL
        |  SELECT 'root', 0, CAST(SUM(c) AS BIGINT) FROM leaf),
        |rk AS (
        |  SELECT node, rank_depth, cumulative,
        |    row_number() OVER (PARTITION BY rank_depth
        |      ORDER BY cumulative DESC, node) AS rn,
        |    COUNT(*) OVER (PARTITION BY rank_depth) AS cnt
        |  FROM nodes)
        |SELECT node, CAST(rank_depth AS BIGINT) AS rank_depth, cumulative
        |FROM rk WHERE rn <= CEIL(cnt * 0.5)""".stripMargin,

    "q54_report_minmax" ->
      """WITH leaf AS (
        |  SELECT lang || '/' || source AS node, lang,
        |    CAST(COUNT(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |nodes AS (
        |  SELECT node, c AS cumulative FROM leaf
        |  UNION ALL
        |  SELECT lang, CAST(SUM(c) AS BIGINT) FROM leaf GROUP BY lang
        |  UNION ALL
        |  SELECT 'root', CAST(SUM(c) AS BIGINT) FROM leaf),
        |tot AS (SELECT COUNT(*) AS t FROM documents)
        |SELECT node, cumulative
        |FROM nodes, tot
        |WHERE cumulative >= 0.04 * t AND cumulative <= t / 5.0""".stripMargin,

    "q59_stream_cascade" ->
      """SELECT CAST(doc_id AS BIGINT) AS read_id, true AS ok
        |FROM documents
        |WHERE doc_id % 2 = 1
        |  AND len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  BETWEEN 1 AND 65535""".stripMargin,

    "q58_png_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(16 AS BIGINT) AS width, CAST(8 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(list_sum([(i*31 + doc_id*7) % 256
        |    for i in generate_series(0, 127)]) AS BIGINT) AS pixel_sum
        |FROM documents""".stripMargin,

    // exact replay of plant + n-gram overlap via hex-substring grams
    // (the q49/q51 gram convention); counts are per-train-doc DISTINCT
    // shared grams against the union of all eval docs' grams
    "q78_decontaminate" ->
      """WITH ev AS (
        |  SELECT CAST(doc_id AS BIGINT) AS eid, text FROM documents
        |  WHERE doc_id % 50 = 0),
        |tr AS (
        |  SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
        |    CASE WHEN d.doc_id % 97 = 3 AND e.text IS NOT NULL
        |         THEN d.text || ' ' || e.text ELSE d.text END AS text
        |  FROM documents d
        |  LEFT JOIN ev e
        |    ON CAST(d.doc_id AS BIGINT)
        |       - (CAST(d.doc_id AS BIGINT) % 50) = e.eid
        |  WHERE d.doc_id % 50 <> 0),
        |eg AS (
        |  SELECT DISTINCT unnest([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1,
        |      CAST(strlen(text) AS BIGINT) - 7)]) AS g
        |  FROM ev),
        |tg AS (
        |  SELECT doc_id,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM tr),
        |ov AS (SELECT tg.doc_id, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM tg JOIN eg USING (g) GROUP BY 1)
        |SELECT t.doc_id, COALESCE(ov.n, 0) AS n_overlap,
        |  COALESCE(ov.n, 0) >= 8 AS contaminated
        |FROM tr t LEFT JOIN ov ON t.doc_id = ov.doc_id""".stripMargin,

    // replay of plant -> strip -> redact with the same regex subset
    // (Java regex and RE2 agree on it); counts are taken at each stage
    // exactly as the engine takes them (emails on cleaned, ips after
    // email redaction, numbers after ip redaction)
    "q77_text_clean" ->
      """WITH noisy AS (
        |  SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |    '<div class="a">' || text || '</div> <br/> reach user' ||
        |    doc_id || '@example.com or 10.0.0.' || (doc_id % 256) ||
        |    ' ref 98765432' || (doc_id % 10) || ' &amp; <b>fin</b>' AS t
        |  FROM documents),
        |cleaned AS (
        |  SELECT doc_id,
        |    trim(regexp_replace(
        |      replace(replace(replace(replace(replace(
        |        regexp_replace(t, '<[^>]*>', ' ', 'g'),
        |        '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |        '&#39;', ''''), '&amp;', '&'),
        |      '\s+', ' ', 'g')) AS c
        |  FROM noisy),
        |stage AS (
        |  SELECT doc_id, c,
        |    regexp_replace(c,
        |      '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
        |      '<EMAIL>', 'g') AS after_email
        |  FROM cleaned),
        |stage2 AS (
        |  SELECT doc_id, c, after_email,
        |    regexp_replace(after_email,
        |      '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b',
        |      '<IP>', 'g') AS after_ip
        |  FROM stage)
        |SELECT doc_id,
        |  regexp_replace(after_ip, '[0-9]{9,}', '<NUM>', 'g') AS redacted,
        |  CAST(len(regexp_extract_all(c,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
        |    AS n_emails,
        |  CAST(len(regexp_extract_all(after_email,
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
        |    AS BIGINT) AS n_ips,
        |  CAST(len(regexp_extract_all(after_ip, '[0-9]{9,}')) AS BIGINT)
        |    AS n_longnums
        |FROM stage2""".stripMargin,

    // every copy-chain collapses to rep = the group's ORIGINAL id (its
    // minimum); docs outside any pair keep themselves
    "q76_dedup_clusters" ->
      """WITH ids AS (
        |  SELECT CAST(doc_id AS BIGINT) AS id FROM documents
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) + 10000000 FROM documents
        |  WHERE doc_id % 7 = 0
        |  UNION ALL
        |  SELECT CAST(doc_id AS BIGINT) + 20000000 FROM documents
        |  WHERE doc_id % 7 = 0)
        |SELECT id AS doc_id,
        |  CASE WHEN (id % 10000000) % 7 = 0 THEN id % 10000000
        |       ELSE id END AS rep,
        |  (CASE WHEN (id % 10000000) % 7 = 0 THEN id % 10000000
        |        ELSE id END) = id AS kept
        |FROM ids""".stripMargin,

    "q75_gif_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(16 AS BIGINT) AS width, CAST(12 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS channels,
        |  CAST(3 * list_sum([(i*29 + doc_id*13) % 256
        |    for i in generate_series(0, 191)]) AS BIGINT) AS pixel_sum
        |FROM documents""".stripMargin,

    // exact replay of the engine's manifest-fed multi-sample classify:
    // paired s0-even reads hash the UNION of text + upper(text) grams,
    // everything else single-end; cutoff/tie-break as in q49
    "q74_batch_manifest" ->
      """WITH raw AS (
        |  SELECT doc_id, 's' || (doc_id % 3) AS sample, text,
        |    CASE WHEN doc_id % 3 = 0 AND doc_id % 2 = 0
        |      THEN upper(text) END AS mate
        |  FROM documents
        |  WHERE strlen(text) >= 8),
        |gsets AS (
        |  SELECT doc_id, sample, list_distinct(
        |    [substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]
        |    || coalesce([substr(hex(encode(mate)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(mate) AS BIGINT) - 7)], [])) AS gs
        |  FROM raw),
        |grams AS (
        |  SELECT doc_id, sample, unnest(gs) AS g FROM gsets
        |  WHERE len(gs) BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (
        |  SELECT lang || '/' || source AS t2,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents WHERE strlen(text) >= 8),
        |bins AS (SELECT t2, g FROM binset GROUP BY ALL),
        |hits AS (
        |  SELECT gr.doc_id, ANY_VALUE(gr.sample) AS sample, b.t2,
        |    COUNT(*) AS c
        |  FROM grams gr JOIN bins b ON gr.g = b.g
        |  GROUP BY gr.doc_id, b.t2),
        |surv AS (
        |  SELECT h.doc_id, h.sample, h.t2, h.c
        |  FROM hits h JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 0.25))),
        |nsurv AS (SELECT doc_id, COUNT(*) AS ns FROM surv GROUP BY 1),
        |m AS (SELECT sample, t2, CAST(COUNT(*) AS BIGINT) AS matches
        |      FROM surv GROUP BY 1, 2),
        |uniq AS (
        |  SELECT s.sample, s.t2, CAST(COUNT(*) AS BIGINT) AS unique_reads
        |  FROM surv s JOIN nsurv USING (doc_id) WHERE ns = 1 GROUP BY 1, 2),
        |assigned AS (
        |  SELECT sample, t2 FROM (
        |    SELECT s.sample, s.t2, row_number() OVER (PARTITION BY s.doc_id
        |      ORDER BY s.c DESC, s.t2 DESC) AS rn
        |    FROM surv s JOIN nsurv USING (doc_id) WHERE ns > 1)
        |  WHERE rn = 1),
        |lca AS (SELECT sample, t2, CAST(COUNT(*) AS BIGINT) AS lca_reads
        |        FROM assigned GROUP BY 1, 2)
        |SELECT m.sample, m.t2 AS target, m.matches,
        |  COALESCE(u.unique_reads, 0) AS unique_reads,
        |  COALESCE(l.lca_reads, 0) AS lca_reads
        |FROM m
        |LEFT JOIN uniq u ON m.sample = u.sample AND m.t2 = u.t2
        |LEFT JOIN lca l ON m.sample = l.sample AND m.t2 = l.t2""".stripMargin,

    "q73_jpeg_decode" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(16 AS BIGINT) AS width, CAST(16 AS BIGINT) AS height,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(64 * ((doc_id*7) % 256 + (doc_id*7 + 53) % 256 +
        |    (doc_id*7 + 106) % 256 + (doc_id*7 + 159) % 256)
        |    AS BIGINT) AS pixel_sum
        |FROM documents""".stripMargin,

    "q57_cascade_tax" ->
      """SELECT CAST(doc_id AS BIGINT) AS read_id, true AS ok
        |FROM documents
        |WHERE doc_id % 2 = 1
        |  AND len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |    for i in generate_series(1, CAST(strlen(text) AS BIGINT) - 7)]))
        |  BETWEEN 1 AND 65535""".stripMargin,

    "q52_stream_dedup" ->
      """SELECT DISTINCT sha256(text) AS digest FROM documents""".stripMargin,

    // n_hashes must equal the distinct union of BOTH halves' byte-8-grams
    // (boundary-crossing grams of the full text are absent from both);
    // hit_own iff the union is in the classifiable range [1, 65535]
    "q51_paired" ->
      """WITH halves AS (
        |  SELECT doc_id,
        |    substr(text, 1, CAST(floor(length(text)/2) AS INTEGER)) AS t1,
        |    substr(text, CAST(floor(length(text)/2) AS INTEGER) + 1,
        |      length(text)) AS t2
        |  FROM documents),
        |g AS (
        |  SELECT doc_id, len(list_distinct(
        |    [substr(hex(encode(t1)), 2*i - 1, 16)
        |      for i in generate_series(1, CAST(strlen(t1) AS BIGINT) - 7)] ||
        |    [substr(hex(encode(t2)), 2*i - 1, 16)
        |      for i in generate_series(1, CAST(strlen(t2) AS BIGINT) - 7)]))
        |    AS nd
        |  FROM halves)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(nd AS BIGINT) AS n_hashes,
        |  (nd BETWEEN 1 AND 65535) AS hit_own
        |FROM g""".stripMargin,

    "q61_tax_formats" ->
      """SELECT lang || '/' || source AS node, lang AS parent,
        |  CAST(COUNT(*) AS BIGINT) AS cnt
        |FROM documents GROUP BY 1, 2""".stripMargin,

    "q62_unc" ->
      """WITH langs AS (
        |  SELECT lang, row_number() OVER (ORDER BY lang) AS rn
        |  FROM (SELECT DISTINCT lang FROM documents)),
        |grams AS (
        |  SELECT doc_id, lang,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents
        |  WHERE strlen(text) >= 8
        |    AND len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)]))
        |      BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (
        |  SELECT gr.lang AS t2, gr.g FROM grams gr
        |  JOIN langs l ON gr.lang = l.lang
        |  WHERE l.rn % 2 = 1 GROUP BY ALL),
        |surv AS (
        |  SELECT DISTINCT h.doc_id FROM (
        |    SELECT gr.doc_id, b.t2, COUNT(*) AS c
        |    FROM grams gr JOIN binset b ON gr.g = b.g
        |    GROUP BY 1, 2) h
        |  JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 1.0)))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id FROM docn
        |WHERE doc_id NOT IN (SELECT doc_id FROM surv)""".stripMargin,

    "q63_lca_missing_root" ->
      """WITH grams AS (
        |  SELECT doc_id, lang, source, lang || '/' || source AS target,
        |    unnest(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)])) AS g
        |  FROM documents
        |  WHERE strlen(text) >= 8
        |    AND len(list_distinct([substr(hex(encode(text)), 2*i - 1, 16)
        |      for i in generate_series(1,
        |        CAST(strlen(text) AS BIGINT) - 7)]))
        |      BETWEEN 1 AND 65535),
        |docn AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY 1),
        |binset AS (SELECT target AS t2, lang AS l2, g FROM grams GROUP BY ALL),
        |hits AS (
        |  SELECT gr.doc_id, b.t2, b.l2, COUNT(*) AS c
        |  FROM grams gr JOIN binset b ON gr.g = b.g
        |  GROUP BY 1, 2, 3),
        |surv AS (
        |  SELECT h.doc_id, h.t2, h.l2
        |  FROM hits h JOIN docn d USING (doc_id)
        |  WHERE h.c >= GREATEST(1, CEIL(d.n * 0.8)))
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  -- a UNIQUE match never consults the LCA (no root patch);
        |  -- among multi-matches any unknown (excluded-lang) node
        |  -- patches to root, which then dominates the fold
        |  CASE WHEN COUNT(*) = 1 THEN MIN(t2)
        |       WHEN SUM(CASE WHEN l2 = (SELECT MIN(lang) FROM documents)
        |              THEN 1 ELSE 0 END) > 0 THEN 'root'
        |       WHEN COUNT(DISTINCT l2) = 1 THEN MIN(l2)
        |       ELSE 'root' END AS assignment
        |FROM surv GROUP BY doc_id""".stripMargin,

    "q64_input_file" ->
      """WITH r AS (
        |  SELECT source, row_number() OVER (ORDER BY source) AS rn
        |  FROM (SELECT DISTINCT source FROM documents))
        |SELECT 'files/' || source || '.fa' AS file,
        |  CASE WHEN rn % 2 = 0 THEN 'T_' || source
        |       ELSE source || '.fa' END AS target
        |FROM r""".stripMargin,

    "q65_min_checkpoint" ->
      """SELECT CAST(doc_id AS BIGINT) AS doc_id, true AS ok
        |FROM documents""".stripMargin,

    "q66_wav_decode" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    [abs(((doc_id*13 + i*97) % 4001) - 2000)
        |      for i in generate_series(0, 47 + doc_id % 16)] AS a
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(8000 + doc_id % 8 AS BIGINT) AS sample_rate,
        |  CAST(1 AS BIGINT) AS channels,
        |  CAST(48 + doc_id % 16 AS BIGINT) AS n_frames,
        |  CAST(list_max(a) AS BIGINT) AS peak,
        |  CAST(list_sum(a) AS BIGINT) AS sum_abs
        |FROM s""".stripMargin,

    "q67_media_transform" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    [((((i // 4) * 32 + (i % 4) * 4) * 31 + doc_id * 7) % 256)
        |      for i in generate_series(0, 15)] AS rp,
        |    [abs(((doc_id*13 + f*4*97) % 4001) - 2000)
        |      for f in generate_series(0, (48 + doc_id % 16 + 3) // 4 - 1)]
        |      AS sa
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(4 AS BIGINT) AS rwidth, CAST(4 AS BIGINT) AS rheight,
        |  CAST(list_sum(rp) AS BIGINT) AS resized_sum,
        |  CAST((8000 + doc_id % 8) // 4 AS BIGINT) AS s_rate,
        |  CAST(len(sa) AS BIGINT) AS s_frames,
        |  CAST(list_max(sa) AS BIGINT) AS s_peak,
        |  CAST(list_sum(sa) AS BIGINT) AS s_sum_abs
        |FROM s""".stripMargin,

    "q68_video_frames" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    [(doc_id*11 + (k//48)*131 + (k%48)*7) % 256
        |      for k in generate_series(0, (3 + doc_id % 5) * 48 - 1)] AS px,
        |    [(doc_id*11 + (k//48)*2*131 + (k%48)*7) % 256
        |      for k in generate_series(0, ((4 + doc_id % 5) // 2) * 48 - 1)]
        |      AS sp
        |  FROM documents)
        |SELECT CAST(doc_id AS BIGINT) AS doc_id,
        |  CAST(8 AS BIGINT) AS width, CAST(6 AS BIGINT) AS height,
        |  CAST(3 + doc_id % 5 AS BIGINT) AS n_frames,
        |  CAST(list_sum(px) AS BIGINT) AS y_sum,
        |  CAST(list_max(px) AS BIGINT) AS y_peak,
        |  CAST(2 AS BIGINT) AS s_fps_den,
        |  CAST((4 + doc_id % 5) // 2 AS BIGINT) AS s_frames,
        |  CAST(list_sum(sp) AS BIGINT) AS s_y_sum
        |FROM s""".stripMargin
  )
}
