package graft.hash

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets.UTF_8
import scala.io.Source

/**
 * Bit-exact parity with the reference's hash stack, via golden vectors
 * generated from the reference's own public-domain sources
 * (`deps/murmurhash/MurmurHash3.cpp`, `deps/spookyhash/spooky.cpp`,
 * `csrc/libbloom/bloom.c:288-328`). Guava's murmur3_128 is a second,
 * independent oracle.
 */
class HashSpec extends AnyFunSuite {

  private val vectors: Seq[(String, String, Array[BigInt])] = {
    val src = Source.fromInputStream(getClass.getResourceAsStream("/hash_vectors.txt"), "UTF-8")
    try src.getLines().filter(_.nonEmpty).toList.map { line =>
      val parts = line.split("\\|", -1)
      val vals = parts.drop(2).flatMap(_.split(",")).map(BigInt(_))
      (parts(0), parts(1), vals)
    } finally src.close()
  }

  private def u64(x: Long): BigInt = BigInt(java.lang.Long.toUnsignedString(x))

  test("murmur3 x64_128 matches reference vectors") {
    val mm = vectors.filter(_._2 == "murmur")
    assert(mm.nonEmpty)
    mm.foreach { case (key, _, exp) =>
      val (h0, h1) = Murmur3x64.hash128(key.getBytes(UTF_8))
      assert(u64(h0) == exp(0), s"h0 for '$key'")
      assert(u64(h1) == exp(1), s"h1 for '$key'")
    }
  }

  test("murmur3 x64_128 matches Guava") {
    val keys = Seq("", "a", "graft", "some longer key 0123456789 abcdefghij 0123456789",
      "x" * 200, "éü中文")
    keys.foreach { k =>
      val bytes = k.getBytes(UTF_8)
      val (h0, h1) = Murmur3x64.hash128(bytes)
      val g = com.google.common.hash.Hashing.murmur3_128().hashBytes(bytes).asBytes()
      val bb = java.nio.ByteBuffer.wrap(g).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      assert(h0 == bb.getLong(0) && h1 == bb.getLong(8), s"guava mismatch for '$k'")
    }
  }

  test("spooky v1 128 matches reference vectors (short and long paths)") {
    val sp = vectors.filter(_._2 == "spooky")
    assert(sp.exists(_._1.length >= 192), "need a long-path vector")
    sp.foreach { case (key, _, exp) =>
      val (h0, h1) = Spooky.hash128(key.getBytes(UTF_8))
      assert(u64(h0) == exp(0), s"h0 for '$key' (len ${key.length})")
      assert(u64(h1) == exp(1), s"h1 for '$key' (len ${key.length})")
    }
  }

  test("k-hash derivation matches reference bf_compute_hashes") {
    val km = vectors.filter(_._2 == "kmext")
    km.foreach { case (key, _, exp) =>
      val hs = BloomHash.computeHashes(16, key.getBytes(UTF_8))
      (0 until 16).foreach { i =>
        assert(u64(hs(i)) == exp(i), s"h($i) for '$key'")
      }
    }
  }

  test("hashes are stable and distinct across 1000 sequential keys") {
    // mirrors reference tests/libbloom/test_bloom.c:138-262
    val seen = scala.collection.mutable.Set[(Long, Long, Long, Long)]()
    (0 until 1000).foreach { i =>
      val hs = BloomHash.computeHashes(4, s"test$i".getBytes(UTF_8))
      val t = (hs(0), hs(1), hs(2), hs(3))
      assert(!seen.contains(t))
      seen += t
      val hs2 = BloomHash.computeHashes(4, s"test$i".getBytes(UTF_8))
      assert(hs.take(4).sameElements(hs2.take(4)))
    }
  }
}
