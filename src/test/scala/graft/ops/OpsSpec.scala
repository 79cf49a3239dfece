package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Hashing
import graft.spark.{GraftFunctions, SparkTestSession}

/** Training-data pipeline operators: dedup recall, ANN recall, text stats,
  * language-ID accuracy on a vocab-separable corpus, multimodal plumbing. */
class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("dedup.exact: groups identical content") {
    val df = Seq((1L, "aaa"), (2L, "bbb"), (3L, "aaa"), (4L, "ccc"), (5L, "aaa"))
      .toDF("doc_id", "text")
    val out = Dedup.exact(df, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((1L, 1L, 3L), (3L, 1L, 3L), (5L, 1L, 3L),
      (2L, 2L, 1L), (4L, 4L, 1L)))
  }

  test("dedup.minhash: finds planted near-dups, none across unrelated") {
    val base = (0 until 60).map(i => s"token$i").mkString(" ")
    val nearDup = (0 until 57).map(i => s"token$i").mkString(" ") + " x1 x2 x3"
    val unrelated = (100 until 160).map(i => s"token$i").mkString(" ")
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated), (4L, base))
      .toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.minhashPairs(spark, df, numPerms = 128, bands = 32,
      threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 4L))) // identical -> J=1, always found
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 4L))) // J = 57/63 ≈ 0.90
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("dedup.minhash: threshold 1.0 (degenerate full-signature banding) " +
      "emits exactly the J == 1 pairs — near-dups excluded, dups found") {
    val base = (0 until 60).map(i => s"token$i").mkString(" ")
    val nearDup = (0 until 57).map(i => s"token$i").mkString(" ") + " x1 x2 x3"
    val df = Seq((1L, base), (2L, nearDup), (3L, base), (4L, nearDup))
      .toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.minhashPairs(spark, df, numPerms = 128, bands = 8,
      threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 3L), (2L, 4L))) // J=0.9 cross pairs excluded
  }

  test("dedup.minhash: null hash-set rows dedup together, no crash") {
    // null text -> null token-hash array -> empty-set signature (the old
    // UDF contract the MinhashSigExpr must preserve); the two null rows
    // are mutual exact duplicates (J(empty,empty) = 1)
    val df = Seq((1L, Option("alpha beta gamma")), (2L, None), (3L, None))
      .toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.minhashPairs(spark, df, numPerms = 128, bands = 32,
      threshold = 1.0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((2L, 3L)))
  }

  test("dedup.minhash: mega-bucket capped to the k smallest ids") {
    // 40 identical docs, cap 10: kept members are ids 0..9 (minKIds keeps
    // the smallest, matching the old row_number-over-id semantics); all
    // C(10,2) pairs among them emitted, nothing quadratic beyond the cap
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val df = (0 until 40).map(i => (i.toLong, text)).toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.minhashPairs(spark, df, numPerms = 128, bands = 8,
      threshold = 1.0, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for { a <- 0 until 10; b <- a + 1 until 10 }
      yield (a.toLong, b.toLong)).toSet
    assert(pairs == want, s"got ${pairs.size} expect ${want.size}")
  }

  test("dedup.simhash: mega-bucket capped to the k smallest ids") {
    val text = (0 until 30).map(i => s"w$i").mkString(" ")
    val df = (0 until 40).map(i => (i.toLong, text)).toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.simhashPairs(spark, df, maxHamming = 0, maxBucket = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (for { a <- 0 until 10; b <- a + 1 until 10 }
      yield (a.toLong, b.toLong)).toSet
    assert(pairs == want, s"got ${pairs.size} expect ${want.size}")
  }

  test("dedup.simhash: identical docs collide, unrelated don't pass") {
    val a = (0 until 80).map(i => s"tok$i").mkString(" ")
    val b = (200 until 280).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "text")
      .select($"id", GraftFunctions.tokenHashes($"text").as("hs"))
    val pairs = Dedup.simhashPairs(spark, df, maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ann: lsh recall >= 0.6 of brute-force top-5 on clustered vectors") {
    // 10 clusters of 30 vectors each; neighbors are intra-cluster
    val vecs = (0 until 300).map { i =>
      val c = i % 10
      val v = Array.tabulate(16) { d =>
        val center = if (d % 10 == c) 5.0f else 0.0f
        center + ((Hashing.hashLong(i * 16L + d, 5L) & 0xFF) / 256.0f - 0.5f)
      }
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(spark, vecs, queries, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Ann.lshTopK(spark, vecs, queries, "vec_id", "embedding", 5, nBits = 6)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect approx).size.toDouble / exact.size
    assert(recall >= 0.6, s"LSH recall $recall")
  }

  test("ann: IVF top-k recall vs brute force") {
    val vecs = (0 until 600).map { i =>
      val v = Array.tabulate(16)(d =>
        ((Hashing.hashLong(i * 16L + d, 5L) & 0xFFFF) / 65536.0f - 0.5f))
      (i.toLong, v)
    }.toDF("vec_id", "embedding")
    val queries = vecs.filter($"vec_id" < 10)
    val exact = Ann.bruteForceTopK(spark, vecs, queries, "vec_id",
        "embedding", 5)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ann.ivfTopK(spark, vecs, queries, "vec_id", "embedding", 5,
        nCells = 32, nProbe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact intersect ivf).size.toDouble / exact.size
    assert(recall >= 0.5, s"IVF recall $recall")
    // determinism: same seeds -> identical codebook -> identical answers
    val ivf2 = Ann.ivfTopK(spark, vecs, queries, "vec_id", "embedding", 5,
        nCells = 32, nProbe = 8)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(ivf2 == ivf)
    // full probe (nProbe == nCells) degenerates to exact brute force
    val full = Ann.ivfTopK(spark, vecs, queries, "vec_id", "embedding", 5,
        nCells = 16, nProbe = 16)
      .select("query_id", "neighbor_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(full == exact)
  }

  test("ann: block-pair cosine dups == naive all-pairs, no corpus collect") {
    val vecs = (0 until 120).map { i =>
      val v = Array.tabulate(8)(d =>
        ((Hashing.hashLong(i * 8L + d, 11L) & 0xFFFF) / 65536.0f - 0.5f))
      (i.toLong, v)
    }
    val df = vecs.toDF("vec_id", "embedding").repartition(5)
    val got = Ann.cosineNearDupPairs(spark, df, "vec_id", "embedding", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def cosine(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y }.sum
      val na = math.sqrt(a.map(x => x.toDouble * x).sum)
      val nb = math.sqrt(b.map(x => x.toDouble * x).sum)
      dot / (na * nb)
    }
    val expect = (for {
      (ia, va) <- vecs; (ib, vb) <- vecs
      if ia < ib && cosine(va, vb) >= 0.5
    } yield (ia, ib)).toSet
    assert(got == expect, s"got ${got.size} expect ${expect.size}")
    // different block counts agree (the B parameter is pure partitioning)
    val got3 = Ann.cosineNearDupPairs(spark, df, "vec_id", "embedding", 0.5,
      blocks = 3).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got3 == expect)
  }

  test("ann: exact cosine pairs refuse above maxRows unless forced") {
    val df = (0 until 50).map(i =>
      (i.toLong, Array.tabulate(4)(d => (i * 4 + d).toFloat)))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Ann.cosineNearDupPairs(spark, df, "vec_id", "embedding", 0.9,
        maxRows = 10)
    }
    assert(e.getMessage.contains("lshNearDupPairs"))
    // force = true runs the guarded call (same answer as unguarded)
    val forced = Ann.cosineNearDupPairs(spark, df, "vec_id", "embedding", 0.9,
      maxRows = 10, force = true).count()
    val free = Ann.cosineNearDupPairs(spark, df, "vec_id", "embedding", 0.9)
      .count()
    assert(forced == free)
  }

  test("ann: lsh near-dup pairs find high-cosine plants") {
    // 20 planted near-identical pairs (cosine ~0.99) among 200 random rows
    val base = (0 until 200).map { i =>
      val v = Array.tabulate(16)(d =>
        ((Hashing.hashLong(i * 16L + d, 3L) & 0xFFFF) / 65536.0f - 0.5f))
      (i.toLong, v)
    }
    val plants = (0 until 20).map { i =>
      val (_, v) = base(i)
      val v2 = v.clone(); v2(0) += 0.01f
      (1000L + i, v2)
    }
    val df = (base ++ plants).toDF("vec_id", "embedding")
    val got = Ann.lshNearDupPairs(spark, df, "vec_id", "embedding", 0.95)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = (0 until 20).map(i => (i.toLong, 1000L + i)).toSet
    assert(want.subsetOf(got), s"missed ${(want -- got).size} plants")
  }

  test("ann: brute force is exact (oracle agreement on tiny case)") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.5f, 0.5f))).toDF("vec_id", "embedding")
    val res = Ann.bruteForceTopK(spark, vecs, vecs.filter($"vec_id" === 0),
      "vec_id", "embedding", 3)
      .orderBy("rank").collect().map(_.getLong(2))
    assert(res.toSeq == Seq(1L, 3L, 2L))
  }

  test("langid: near-perfect on vocab-separable synthetic corpus") {
    val docs = graft.synth.Corpus.df(spark, 600, numRepos = 16, partitions = 4)
    val out = TextStats.langId(spark, docs, docs, "path", "content", "lang")
      .withColumn("hit", ($"lang" === $"predicted_lang").cast("int"))
    // path is not long-castable; langId casts idCol to long -> use row count
    val acc = out.agg(avg($"hit")).first().getDouble(0)
    assert(acc >= 0.95, s"langid accuracy $acc")
  }

  test("token stats + quality signals agree with direct computation") {
    val df = Seq((1L, " the quick  brown the ")).toDF("doc_id", "text")
    val ts = TextStats.tokenStats(df, "doc_id", "text").first()
    assert(ts.getLong(1) == 4 && ts.getLong(2) == 3) // tokens, distinct
    assert(ts.getLong(3) == 2) // stopwords ("the" twice)
    assert(ts.getLong(4) == 3 + 5 + 5 + 3)
    val qs = TextStats.qualitySignals(df, "doc_id", "text").first()
    assert(qs.getLong(1) == 22) // chars
    assert(qs.getLong(2) == 16) // letters
  }

  test("connected components: chains merge transitively, isolated docs " +
      "keep themselves, reps are the component minimum") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val docs = Seq(1L, 2L, 3L, 10L, 11L, 99L).toDF("id")
    val out = Dedup.keepOnePerCluster(spark, docs, "id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (10L, 10L, true), (11L, 10L, false), (99L, 99L, true)))
  }

  test("keepOnePerCluster: a docs SLICE missing the cluster's global " +
      "minimum re-roots to the smallest present member (never zero " +
      "survivors)") {
    // pairs were generated on the full corpus; docs is a slice without
    // doc 3 — the cluster {3,5,6} must still keep exactly one of {5,6}
    val pairs = Seq((3L, 5L), (3L, 6L)).toDF("doc_a", "doc_b")
    val docs = Seq(5L, 6L).toDF("id")
    val out = Dedup.keepOnePerCluster(spark, docs, "id", pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((5L, 5L, true), (6L, 5L, false)))
  }

  test("connected components: random graph matches a union-find oracle") {
    val rnd = new scala.util.Random(7)
    val n = 60
    val edges = Seq.fill(70)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      .filter(e => e._1 != e._2)
    // driver-side union-find oracle
    val parent = Array.tabulate(n)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a.toInt), find(b.toInt))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      .map(v => (v, find(v.toInt).toLong))
    val got = Dedup.connectedComponents(spark,
        edges.toDF("doc_a", "doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    assert(got.toSeq == expected)
  }

  test("connected components: a 20-long chain converges (diameter-bound " +
      "iteration, not a fixed small count)") {
    val pairs = (0L until 19L).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val got = Dedup.connectedComponents(spark, pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.length == 20 && got.forall(_._2 == 0L))
  }

  test("stripMarkup: tags dropped, entities single-decoded, whitespace " +
      "collapsed") {
    val df = Seq((1L,
      "<div class='a'>Hello &amp;lt; <b>world</b>&#39;s &quot;x&quot;</div>\n\n tail  "))
      .toDF("doc_id", "text")
    val out = TextStats.stripMarkup(df, "doc_id", "text").first()
    // &amp;lt; must decode ONCE to &lt; (amp decoded last), never to <;
    // tags become a SPACE (so "foo<br>bar" never glues to "foobar"),
    // hence "world 's" — the collapse only merges runs, not tag gaps
    assert(out.getString(1) == "Hello &lt; world 's \"x\" tail")
  }

  test("redactPii: emails, IPv4s, long digit runs typed + counted in order") {
    val df = Seq((1L,
      "mail a.b@x.co or c9@y.org ip 10.0.0.1 acct 123456789 n 12345678 end"))
      .toDF("doc_id", "text")
    val r = TextStats.redactPii(df, "doc_id", "text").first()
    assert(r.getString(1) ==
      "mail <EMAIL> or <EMAIL> ip <IP> acct <NUM> n 12345678 end")
    assert(r.getLong(2) == 2 && r.getLong(3) == 1 && r.getLong(4) == 1)
  }

  test("decontaminate: overlap counts distinct shared grams, flags at " +
      "the threshold, zero for disjoint docs") {
    val eval_ = Seq((100L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val train = Seq(
      (1L, "xx cdefghijklmn yy"), // 12-char substring => 5 shared 8-grams
      (2L, "zzzzzzzzzzzzzzzzzzzz"), // disjoint
      (3L, "abcdefghijklmnop")) // full copy => 9 shared 8-grams
      .toDF("doc_id", "text")
    val out = Decontaminate.overlap(spark, train, eval_, "doc_id", "text",
        k = 8, minOverlap = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
      .sortBy(_._1)
    assert(out.toSeq == Seq((1L, 5L, false), (2L, 0L, false),
      (3L, 9L, true)))
  }

  test("decontaminate: an over-budget eval side refuses with the " +
      "eval-must-be-small contract message, never a driver OOM") {
    val eval_ = Seq((100L, "abcdefghijklmnop")).toDF("doc_id", "text")
    val train = Seq((1L, "abcdefgh")).toDF("doc_id", "text")
    val e = intercept[IllegalArgumentException] {
      Decontaminate.overlap(spark, train, eval_, "doc_id", "text",
        k = 8, minOverlap = 8, maxEvalGrams = 4) // 9 distinct grams > 4
    }
    assert(e.getMessage.contains("eval side must be the small"))
    // at the default budget the same inputs pass (guard is one bounded
    // collect, not a separate count job)
    assert(Decontaminate.overlap(spark, train, eval_, "doc_id", "text",
      k = 8, minOverlap = 8).count() == 1)
  }

  test("multimodal: stub features have the right shape and determinism") {
    val docs = Seq((1L, "hello world"), (2L, "")).toDF("doc_id", "text")
    val media = Multimodal.asMediaTable(docs, "doc_id", "text")
    assert(media.schema("payload").dataType.typeName == "binary")
    val feats = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.doc_id)
    assert(feats.length == 2)
    assert(feats(0).feature.length == 8)
    assert(feats(0).n_bytes == 11 && feats(1).n_bytes == 0)
    val again = Multimodal.extractFeatures(spark, media).collect()
      .sortBy(_.doc_id)
    assert(feats(0).feature.sameElements(again(0).feature))
  }
}
