package graft.hash

/**
 * MurmurHash3 x64_128 (Austin Appleby, public domain), the variant the
 * reference daemon uses as its first bloom hash
 * (`csrc/libbloom/bloom.c:288-328`, `deps/murmurhash/MurmurHash3.cpp`).
 *
 * Spark's built-in `hash()` is Murmur3 x86_32 — a different algorithm —
 * so a faithful x64_128 is required for estimate parity with the
 * reference. Verified bit-exact against vectors generated from the
 * reference's own C sources (src/test/resources/hash_vectors.txt) and
 * against Guava's murmur3_128.
 */
object Murmur3x64 {

  @inline private def rotl(x: Long, r: Int): Long = (x << r) | (x >>> (64 - r))

  @inline private def fmix(kIn: Long): Long = {
    var k = kIn
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  @inline private def getLongLE(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) |
      ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) |
      ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) |
      ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  /** 128-bit hash; writes (h1, h2) into `out(0)`, `out(1)`. */
  def hash128(data: Array[Byte], offset: Int, len: Int, seed: Long, out: Array[Long]): Unit = {
    val c1 = 0x87c37b91114253d5L
    val c2 = 0x4cf5ad432745937fL
    var h1 = seed
    var h2 = seed

    val nblocks = len / 16
    var i = 0
    while (i < nblocks) {
      var k1 = getLongLE(data, offset + i * 16)
      var k2 = getLongLE(data, offset + i * 16 + 8)
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
      h1 = rotl(h1, 27); h1 += h2; h1 = h1 * 5 + 0x52dce729L
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
      h2 = rotl(h2, 31); h2 += h1; h2 = h2 * 5 + 0x38495ab5L
      i += 1
    }

    val tail = offset + nblocks * 16
    var k1 = 0L
    var k2 = 0L
    val rem = len & 15
    if (rem >= 9) {
      if (rem >= 15) k2 ^= (data(tail + 14) & 0xffL) << 48
      if (rem >= 14) k2 ^= (data(tail + 13) & 0xffL) << 40
      if (rem >= 13) k2 ^= (data(tail + 12) & 0xffL) << 32
      if (rem >= 12) k2 ^= (data(tail + 11) & 0xffL) << 24
      if (rem >= 11) k2 ^= (data(tail + 10) & 0xffL) << 16
      if (rem >= 10) k2 ^= (data(tail + 9) & 0xffL) << 8
      k2 ^= data(tail + 8) & 0xffL
      k2 *= c2; k2 = rotl(k2, 33); k2 *= c1; h2 ^= k2
    }
    if (rem >= 1) {
      if (rem >= 8) k1 ^= (data(tail + 7) & 0xffL) << 56
      if (rem >= 7) k1 ^= (data(tail + 6) & 0xffL) << 48
      if (rem >= 6) k1 ^= (data(tail + 5) & 0xffL) << 40
      if (rem >= 5) k1 ^= (data(tail + 4) & 0xffL) << 32
      if (rem >= 4) k1 ^= (data(tail + 3) & 0xffL) << 24
      if (rem >= 3) k1 ^= (data(tail + 2) & 0xffL) << 16
      if (rem >= 2) k1 ^= (data(tail + 1) & 0xffL) << 8
      k1 ^= data(tail) & 0xffL
      k1 *= c1; k1 = rotl(k1, 31); k1 *= c2; h1 ^= k1
    }

    h1 ^= len.toLong; h2 ^= len.toLong
    h1 += h2; h2 += h1
    h1 = fmix(h1); h2 = fmix(h2)
    h1 += h2; h2 += h1
    out(0) = h1
    out(1) = h2
  }

  def hash128(data: Array[Byte]): (Long, Long) = {
    val out = new Array[Long](2)
    hash128(data, 0, data.length, 0L, out)
    (out(0), out(1))
  }
}
