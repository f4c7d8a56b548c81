package graft.hash

/**
 * The reference daemon's k-hash derivation (`csrc/libbloom/bloom.c:288-328`):
 * Kirsch–Mitzenmacher "Less Hashing, Same Performance" over two 128-bit
 * hashes —
 *
 *   h0,h1 = Murmur3_x64_128(key, seed=0)
 *   h2,h3 = SpookyHash128(key, seed1=0, seed2=0)
 *   h(i)  = h1 + (i * h3 mod 18446744073709551557)   for i >= 4
 *
 * where the modulus is the largest unsigned 64-bit prime and all
 * arithmetic wraps mod 2^64. Bit-exact parity with the reference keeps
 * our sketch estimates and FP behavior identical for the same key set.
 */
object BloomHash {

  /** 2^64 - 59, the largest u64 prime, as a signed Long. */
  private final val Prime: Long = -59L // == 18446744073709551557 unsigned

  /**
   * Fill `hashes(0 until k)` for the given key bytes.
   * `hashes.length >= k` and `k >= 4` not required — k may be small,
   * in which case the extra base hashes are still computed (cheap).
   */
  def computeHashes(k: Int, key: Array[Byte], offset: Int, len: Int, hashes: Array[Long]): Unit = {
    Murmur3x64.hash128(key, offset, len, 0L, hashes)
    val m0 = hashes(0)
    val m1 = hashes(1)
    Spooky.hash128(key, offset, len, 0L, 0L, hashes)
    val s0 = hashes(0)
    val s1 = hashes(1)
    hashes(0) = m0
    if (k > 1) hashes(1) = m1
    if (k > 2) hashes(2) = s0
    if (k > 3) hashes(3) = s1
    var i = 4
    while (i < k) {
      hashes(i) = m1 + java.lang.Long.remainderUnsigned(i.toLong * s1, Prime)
      i += 1
    }
  }

  def computeHashes(k: Int, key: Array[Byte]): Array[Long] = {
    val out = new Array[Long](math.max(k, 4))
    computeHashes(k, key, 0, key.length, out)
    out
  }
}
