package graft.core.sketch

import org.scalatest.funsuite.AnyFunSuite

class TDigestSpec extends AnyFunSuite {

  test("tdigest: rank error within bound on uniform and skewed data") {
    val comp = 100.0
    val td = TDigest.empty(comp)
    val rnd = new scala.util.Random(11)
    val data = Array.fill(100000)(math.exp(rnd.nextGaussian())) // log-normal
    data.foreach(td.add(_))
    val sorted = data.sorted
    val bound = TDigest.rankErrorBound(comp)
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val est = td.quantile(q)
      var lo = 0; var hi = sorted.length
      while (lo < hi) { val m = (lo + hi) / 2; if (sorted(m) <= est) lo = m + 1 else hi = m }
      val r = lo.toDouble / sorted.length
      assert(math.abs(r - q) <= bound, s"q=$q est=$est rank=$r err=${math.abs(r - q)}")
    }
    // tails must be tighter than the mid bound
    assert(math.abs(td.quantile(0.0001) - sorted(10)) / sorted(10) < 0.5)
  }

  test("tdigest: merge keeps n and bound across arbitrary splits") {
    val rnd = new scala.util.Random(5)
    val data = Array.fill(30000)(rnd.nextDouble() * 1000)
    (1 to 7).foreach { nChunks =>
      val merged = data.grouped(math.max(1, data.length / nChunks))
        .map { c => val t = TDigest.empty(100); c.foreach(t.add(_)); t }
        .foldLeft(TDigest.empty(100))(_.merge(_))
      assert(merged.n == data.length.toDouble)
      val sorted = data.sorted
      Seq(0.1, 0.5, 0.9).foreach { q =>
        val est = merged.quantile(q)
        val r = sorted.count(_ <= est).toDouble / sorted.length
        assert(math.abs(r - q) <= TDigest.rankErrorBound(100) + 2.0 / 30000,
          s"chunks=$nChunks q=$q r=$r")
      }
    }
  }

  test("tdigest: centroid count stays O(compression); serde roundtrip") {
    val td = TDigest.empty(50)
    (1 to 50000).foreach(i => td.add(i.toDouble))
    // the k0-style weight limit is tail-heavy: singleton centroids at the
    // extremes push the count past Dunning's ~2δ (k1) but it remains
    // O(δ·log n), not O(n)
    assert(td.centroidCount <= 10 * 50, s"centroids=${td.centroidCount}")
    val back = TDigest.fromBytes(td.toBytes)
    assert(back.n == td.n)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(back.quantile(q) - td.quantile(q)) /
        math.max(1.0, td.quantile(q)) < 0.02)
    }
  }

  test("tdigest: cdf is monotone and consistent with quantile") {
    val td = TDigest.empty(100)
    val rnd = new scala.util.Random(2)
    (1 to 20000).foreach(_ => td.add(rnd.nextDouble()))
    val xs = (0 to 10).map(_ / 10.0)
    val cdfs = xs.map(td.cdf)
    assert(cdfs.zip(cdfs.tail).forall { case (a, b) => a <= b + 1e-12 })
    Seq(0.2, 0.5, 0.8).foreach { q =>
      assert(math.abs(td.cdf(td.quantile(q)) - q) <= 0.05)
    }
  }
}
