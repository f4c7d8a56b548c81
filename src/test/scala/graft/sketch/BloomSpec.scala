package graft.sketch

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8

/** Golden values from the reference test suite (FIXTURES.md §3). */
class BloomSpec extends AnyFunSuite {

  private def key(s: String): Array[Byte] = s.getBytes(UTF_8)

  test("sizing goldens: n=1e6 p=1e-4 -> 2,396,265 bytes, k=13, +512 header") {
    // tests/libbloom/test_bloom.c:81-136
    assert(BloomParams.sizeForCapacityProb(1000000L, 1e-4) == 2396265L)
    assert(BloomParams.idealKNum(2396265L, 1000000L) == 13)
    val p = BloomParams.forCapacity(1000000L, 1e-4)
    assert(p.bytes == 2396265L + 512L && p.kNum == 13)
  }

  test("sizing round-trips: p from (n, bytes); n from (bytes, p)") {
    // tests/libbloom/test_bloom.c:92-113
    val p = BloomParams.fpProbabilityForCapacitySize(2396265L, 1000000L)
    assert(math.abs(p - 1e-4) < 1e-8, s"p=$p")
    val n = BloomParams.capacityForSizeProb(2396265L, 1e-4)
    assert(n == 1000000L, s"n=$n")
  }

  test("partition math: 4096-byte map k=10 -> bitmap_size 28672, offset 2867") {
    // tests/libbloom/test_bloom.c:65-79
    val f = BloomFilter.create(BloomParams(4096L, 10, 0L, 0.0))
    assert(f.bitmapSize == 28672L)
    assert(f.offset == 2867L)
  }

  test("add/contains/no-readd, count semantics") {
    // tests/libbloom/test_bloom.c:267-303
    val f = BloomFilter.create(1000L, 0.01)
    assert(f.addKey(key("hey")))
    assert(f.containsKey(key("hey")))
    assert(!f.addKey(key("hey"))) // already present
    assert(f.count == 1)
    (0 until 100).foreach(i => f.addKey(key(s"test$i")))
    assert((0 until 100).forall(i => f.containsKey(key(s"test$i"))))
    assert(!f.containsKey(key("never-inserted-xyz")))
  }

  test("flat FP bound: <=10 dup-reports per 1100 adds at cap 1000 p=0.01") {
    // tests/libbloom/test_bloom.c:430-453
    val f = BloomFilter.create(1000L, 0.01)
    var wrong = 0
    (0 until 1100).foreach { i =>
      if (!f.addKey(key(s"test$i"))) wrong += 1
    }
    assert(wrong <= 10, s"wrong=$wrong")
  }

  test("serialize/deserialize round-trip preserves layout and membership") {
    val f = BloomFilter.create(1000L, 0.01)
    (0 until 500).foreach(i => f.addKey(key(s"test$i")))
    val bytes = f.serializedCopy()
    // header: magic LE at 0
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(bb.getInt(0) == BloomParams.Magic)
    assert(bb.getInt(4) == f.kNum)
    assert(bb.getLong(8) == f.count)
    val g = BloomFilter.deserialize(bytes)
    assert(g.count == f.count && g.kNum == f.kNum)
    assert((0 until 500).forall(i => g.containsKey(key(s"test$i"))))
  }

  test("OR-merge of split key set equals sequential bit array exactly") {
    val params = BloomParams.forCapacity(10000L, 0.001)
    val seq = BloomFilter.create(params)
    val a = BloomFilter.create(params)
    val b = BloomFilter.create(params)
    (0 until 5000).foreach { i =>
      seq.addKey(key(s"k$i"))
      (if (i % 2 == 0) a else b).addKey(key(s"k$i"))
    }
    a.orInPlace(b)
    assert(java.util.Arrays.equals(a.serialize().drop(512), seq.serialize().drop(512)),
      "merged bits must equal sequential bits")
    assert(a.count == seq.count) // disjoint splits: counts add exactly
  }

  test("fill-ratio estimate within 5% at design load") {
    val f = BloomFilter.create(100000L, 1e-4)
    (0 until 80000).foreach(i => f.addKey(key(s"est$i")))
    val est = f.estimateItems
    assert(math.abs(est - 80000.0) / 80000.0 < 0.05, s"est=$est")
  }

  test("SBF: starts with one layer at initial capacity") {
    // tests/libbloom/test_sbf.c:12-27
    val s = ScalableBloom.create(1000L, 0.01, 4, 0.9)
    s.add(key("seed")) // first touch materializes layer 0
    assert(s.numLayers == 1)
    assert(s.totalCapacity == 1000L)
  }

  test("SBF growth goldens: 2000 adds -> 2 layers cap 5e3 (p=1e-4)") {
    // tests/libbloom/test_sbf.c:29-57
    val s = ScalableBloom.create(1000L, 1e-4, 4, 0.9)
    (0 until 2000).foreach(i => assert(s.add(key(s"foobar$i"))))
    assert(s.size == 2000L)
    assert(s.numLayers == 2, s"layers=${s.numLayers}")
    assert(s.totalCapacity == 5000L, s"cap=${s.totalCapacity}")
    assert((0 until 2000).forall(i => s.contains(key(s"foobar$i"))), "no false negatives")
  }

  test("SBF growth goldens: 10000 adds -> 3 layers cap 21e3, bytes in (1x,2x) flat (p=1e-5)") {
    // tests/libbloom/test_sbf.c:59-94
    val s = ScalableBloom.create(1000L, 1e-5, 4, 0.9)
    (0 until 10000).foreach(i => assert(s.add(key(s"foobar$i"))))
    assert(s.size == 10000L)
    assert(s.numLayers == 3, s"layers=${s.numLayers}")
    assert(s.totalCapacity == 21000L, s"cap=${s.totalCapacity}")
    val flatBytes = BloomParams.forCapacity(21000L, 1e-4).bytes
    assert(s.totalByteSize > flatBytes && s.totalByteSize < 2 * flatBytes)
    assert((0 until 10000).forall(i => s.contains(key(s"foobar$i"))), "no false negatives")
  }

  test("SBF FP bound: 1e5 adds at p=0.01 stays within compound budget") {
    // scaled version of tests/libbloom/test_sbf.c:287-312 (1e6 there)
    val s = ScalableBloom.create(10000L, 0.01, 4, 0.9)
    var falseDups = 0
    (0 until 100000).foreach { i =>
      if (!s.add(key(s"ZibZab__${i.toLong * i}"))) falseDups += 1
    }
    assert(falseDups < 1000, s"falseDups=$falseDups") // < 1% of 1e5
  }

  test("SBF merge: membership preserved, associative at estimate level") {
    val mk = () => ScalableBloom.create(500L, 0.01, 4, 0.9)
    val parts = (0 until 4).map { p =>
      val s = mk()
      (p * 1000 until (p + 1) * 1000).foreach(i => s.add(key(s"m$i")))
      s
    }
    // mergeInPlace consumes its inputs — deep-copy to reuse parts
    val ab = mk().mergeInPlace(parts(0).copySketch()).mergeInPlace(parts(1).copySketch())
    val cd = mk().mergeInPlace(parts(2).copySketch()).mergeInPlace(parts(3).copySketch())
    val left = ab.mergeInPlace(cd)
    val right = parts.foldLeft(mk())((acc, s) => acc.mergeInPlace(s.copySketch()))
    assert((0 until 4000).forall(i => left.contains(key(s"m$i"))), "no false negatives after merge")
    assert((0 until 4000).forall(i => right.contains(key(s"m$i"))))
    assert(left.size == right.size, "size independent of merge tree")
    // round-trip
    val rt = ScalableBloom.deserialize(left.serialize())
    assert((0 until 4000).forall(i => rt.contains(key(s"m$i"))))
    assert(rt.size == left.size)
  }

  test("LBF counting trace: repeated sets return 1,2,3; contains matrix") {
    // src/main.rs:865-872, src/lbf.rs:170-192
    val l = LayeredBloom.create(1000L, 0.01)
    assert(l.add(key("zorro")) == 1)
    assert(l.add(key("zorro")) == 2)
    assert(l.add(key("zorro")) == 3)
    assert(l.count(key("zorro")) == 3)
    // matrix [[1,0,0],[2,1,0],[3,2,1]] over keys a,b,c set 3/2/1 times
    val m = LayeredBloom.create(1000L, 0.01)
    m.add(key("a")); m.add(key("b")); m.add(key("c"))
    m.add(key("a")); m.add(key("b"))
    m.add(key("a"))
    assert(m.count(key("a")) == 3 && m.count(key("b")) == 2 && m.count(key("c")) == 1)
    assert(m.count(key("absent")) == 0)
    assert(m.size == 3) // distinct keys
  }

  test("LBF merge invariant: merged count in [max(parts), total multiplicity]") {
    val a = LayeredBloom.create(1000L, 0.01)
    val b = LayeredBloom.create(1000L, 0.01)
    a.add(key("k")); a.add(key("k")) // 2 in a
    b.add(key("k")) // 1 in b
    b.add(key("only-b"))
    a.mergeInPlace(b)
    val c = a.count(key("k"))
    assert(c >= 2 && c <= 3, s"count=$c")
    assert(a.count(key("only-b")) == 1)
    val rt = LayeredBloom.deserialize(a.serialize())
    assert(rt.count(key("k")) == c)
  }
}
