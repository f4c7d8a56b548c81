package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/**
 * Companion sketches vs published error bounds, with exact computation
 * (and DataSketches where applicable) as independent oracles.
 */
class CompanionSketchSpec extends AnyFunSuite {

  private def key(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("HLL: estimate within 3 standard errors at p=14; merge == whole") {
    val h = Hll.create(14)
    val n = 100000
    (0 until n).foreach(i => h.update(key(s"u$i")))
    val err = math.abs(h.estimate - n).toDouble / n
    assert(err < 3 * h.standardError, s"err=$err bound=${3 * h.standardError}")

    // split/merge gives byte-identical registers
    val a = Hll.create(14); val b = Hll.create(14)
    (0 until n).foreach(i => (if (i % 2 == 0) a else b).update(key(s"u$i")))
    a.merge(b)
    assert(java.util.Arrays.equals(a.registers, h.registers))
    // round trip
    val rt = Hll.deserialize(h.serialize())
    assert(rt.estimate == h.estimate)
  }

  test("HLL tracks DataSketches estimate within combined error") {
    val h = Hll.create(14)
    val ds = new org.apache.datasketches.hll.HllSketch(14)
    val n = 50000
    (0 until n).foreach { i => h.update(key(s"x$i")); ds.update(s"x$i") }
    assert(math.abs(h.estimate - n).toDouble / n < 0.025)
    assert(math.abs(ds.getEstimate - n) / n < 0.025)
  }

  test("HLL small-range linear counting is near-exact") {
    val h = Hll.create(14)
    (0 until 100).foreach(i => h.update(key(s"s$i")))
    assert(math.abs(h.estimate - 100L) <= 2, s"est=${h.estimate}")
  }

  test("CMS: never underestimates; overestimate within eps*N; merge exact") {
    val cms = CountMin.forGuarantee(0.001, 0.01) // w=2719, d=5
    assert(cms.width == math.ceil(math.E / 0.001).toInt && cms.depth == 5)
    val freq = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    val rnd = new java.util.SplittableRandom(42)
    var total = 0L
    (0 until 200000).foreach { _ =>
      val z = math.min(999, math.floor(math.pow(rnd.nextDouble(), 3) * 1000).toInt) // skewed
      val k = s"item$z"
      freq(k) += 1
      cms.update(key(k))
      total += 1
    }
    freq.foreach { case (k, f) =>
      val est = cms.estimate(key(k))
      assert(est >= f, s"underestimate for $k: $est < $f")
      assert(est <= f + (0.001 * total).toLong + 1, s"overestimate for $k: $est vs $f + eps*N")
    }
    assert(cms.estimate(key("never")) <= (0.001 * total).toLong + 1)

    val a = CountMin.forGuarantee(0.001, 0.01)
    val b = CountMin.forGuarantee(0.001, 0.01)
    freq.keys.zipWithIndex.foreach { case (k, i) =>
      val t = if (i % 2 == 0) a else b
      (0L until freq(k)).foreach(_ => t.update(key(k)))
    }
    a.merge(b)
    freq.foreach { case (k, f) => assert(a.estimate(key(k)) >= f) }
    val rt = CountMin.deserialize(a.serialize())
    assert(rt.estimate(key("item0")) == a.estimate(key("item0")))
    assert(rt.total == a.total)
  }

  test("t-digest: quantiles within 1% rank error mid, tighter tails; merge bound holds") {
    val td = TDigest.create(100)
    val n = 100000
    val rnd = new java.util.SplittableRandom(7)
    val vals = Array.fill(n)(rnd.nextDouble())
    vals.foreach(td.update(_))
    val sorted = vals.sorted
    def exactRank(x: Double): Double = {
      val i = java.util.Arrays.binarySearch(sorted, x)
      val pos = if (i >= 0) i else -i - 1
      pos.toDouble / n
    }
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val est = td.quantile(q)
      val err = math.abs(exactRank(est) - q)
      val bound = if (q <= 0.05 || q >= 0.95) 0.005 else 0.01
      assert(err < bound, s"q=$q est=$est rankErr=$err")
    }
    // cdf and quantile agree
    assert(math.abs(td.cdf(td.quantile(0.5)) - 0.5) < 0.01)

    // merge of 4 partials
    val parts = (0 until 4).map { p =>
      val t = TDigest.create(100)
      vals.zipWithIndex.filter(_._2 % 4 == p).foreach(v => t.update(v._1))
      t
    }
    val merged = parts.reduceLeft((x, y) => x.merge(y))
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(exactRank(merged.quantile(q)) - q) < 0.015, s"merged q=$q")
    }
    val rt = TDigest.deserialize(merged.serialize())
    assert(rt.quantile(0.5) == merged.quantile(0.5))
  }

  test("KLL: rank error within 3% envelope; weight conserved; merge bound holds") {
    val klls = Kll.create(200)
    val n = 100000
    val rnd = new java.util.SplittableRandom(11)
    val vals = Array.fill(n)(rnd.nextDouble())
    vals.foreach(klls.update)
    assert(klls.n == n)
    // weight conservation: total weight across levels == n
    val weight = klls.levels.zipWithIndex.map { case (l, i) => l.length.toLong << i }.sum
    assert(weight == n, s"weight=$weight n=$n")
    val sorted = vals.sorted
    def exactRank(x: Double): Double = {
      val i = java.util.Arrays.binarySearch(sorted, x)
      (if (i >= 0) i else -i - 1).toDouble / n
    }
    Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99).foreach { q =>
      val err = math.abs(exactRank(klls.quantile(q)) - q)
      assert(err < 0.03, s"q=$q err=$err")
    }
    // merge of 8 partials
    val parts = (0 until 8).map { p =>
      val t = Kll.create(200)
      vals.zipWithIndex.filter(_._2 % 8 == p).foreach(v => t.update(v._1))
      t
    }
    val merged = parts.reduceLeft((x, y) => x.merge(y))
    assert(merged.n == n)
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(exactRank(merged.quantile(q)) - q) < 0.03, s"merged q=$q")
    }
    val rt = Kll.deserialize(merged.serialize())
    assert(rt.quantile(0.5) == merged.quantile(0.5) && rt.n == merged.n)
  }

  test("KLL tracks DataSketches KLL within combined envelope") {
    val ours = Kll.create(200)
    val ds = org.apache.datasketches.kll.KllDoublesSketch.newHeapInstance(200)
    val rnd = new java.util.SplittableRandom(13)
    (0 until 50000).foreach { _ =>
      val v = rnd.nextDouble()
      ours.update(v); ds.update(v)
    }
    Seq(0.1, 0.5, 0.9).foreach { q =>
      val d = math.abs(ours.quantile(q) - ds.getQuantile(q))
      assert(d < 0.03, s"q=$q ours=${ours.quantile(q)} ds=${ds.getQuantile(q)}")
    }
  }

  test("Misra-Gries: hand trace, exact counts when k >= distinct, vectorized decrement == per-unit") {
    // classic trace at k=2: stream a a b c -> decrement op on c
    val mg = FrequentItems.create(2)
    Seq("a", "a", "b", "c").foreach(mg.update(_))
    assert(mg.estimate("a") == 1L && mg.estimate("b") == 0L && mg.estimate("c") == 0L)
    assert(mg.error == 1L && mg.total == 4L)
    // no truncation possible when k >= number of distinct items: exact
    val exact = FrequentItems.create(3)
    val stream = Seq("x", "y", "x", "z", "x", "y")
    stream.foreach(exact.update(_))
    assert(exact.items() == Seq(("x", 3L), ("y", 2L), ("z", 1L)) && exact.error == 0L)
    // bulk update(inc) must equal inc repeated unit updates
    val bulk = FrequentItems.create(2)
    val unit = FrequentItems.create(2)
    val ops = Seq(("a", 5L), ("b", 3L), ("c", 4L), ("a", 2L), ("d", 7L), ("e", 1L))
    ops.foreach { case (k, n) => bulk.update(k, n) }
    ops.foreach { case (k, n) => (0L until n).foreach(_ => unit.update(k)) }
    assert(bulk.items() == unit.items() && bulk.error == unit.error && bulk.total == unit.total)
  }

  test("Misra-Gries: guarantee holds on a skewed stream; serialize round-trips; DataSketches agrees") {
    val rnd = new scala.util.Random(7)
    val n = 20000
    // zipf-ish: item i chosen with weight ~ 1/(i+1)
    val items = Array.tabulate(n) { _ =>
      val u = rnd.nextDouble()
      ("it" + math.min((math.pow(200.0, u) - 1).toInt, 199)).intern()
    }
    val truth = items.groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
    val mg = FrequentItems.create(16)
    items.foreach(mg.update(_))
    assert(mg.total == n && mg.error * 17 <= n, s"error=${mg.error}")
    truth.foreach { case (k, t) =>
      val e = mg.estimate(k)
      assert(e <= t && t <= e + mg.error, s"$k est=$e true=$t err=${mg.error}")
      if (t > mg.error) assert(e > 0, s"heavy item $k untracked")
    }
    val rt = FrequentItems.deserialize(mg.serialize())
    assert(rt.items() == mg.items() && rt.error == mg.error && rt.total == mg.total && rt.k == mg.k)

    // cross-check the guarantee shape against DataSketches' frequent-items
    val ds = new org.apache.datasketches.frequencies.ItemsSketch[String](64)
    items.foreach(ds.update(_))
    truth.foreach { case (k, t) =>
      assert(ds.getLowerBound(k) <= t && t <= ds.getUpperBound(k))
      val e = mg.estimate(k)
      assert(e <= t && t <= e + mg.error)
    }
  }
}
