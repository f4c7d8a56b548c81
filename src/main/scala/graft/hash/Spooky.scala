package graft.hash

/**
 * SpookyHash 128 (Bob Jenkins, public domain; the Oct-31-2011 revision —
 * i.e. "V1" — bundled by the reference at `deps/spookyhash/spooky.cpp`
 * and used as the second bloom hash in `csrc/libbloom/bloom.c:310-316`).
 *
 * Note V1 vs V2: in the short path V1 *assigns* `d = len<<56` where V2
 * adds — the reference ships V1, so we match V1. Verified bit-exact
 * against vectors generated from the reference's own sources
 * (src/test/resources/hash_vectors.txt).
 */
object Spooky {

  private final val ScConst = 0xdeadbeefdeadbeefL
  private final val NumVars = 12
  private final val BlockSize = NumVars * 8 // 96
  private final val BufSize = 2 * BlockSize // 192

  @inline private def rot64(x: Long, k: Int): Long = (x << k) | (x >>> (64 - k))

  @inline private def le64(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) |
      ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24) |
      ((d(i + 4) & 0xffL) << 32) |
      ((d(i + 5) & 0xffL) << 40) |
      ((d(i + 6) & 0xffL) << 48) |
      ((d(i + 7) & 0xffL) << 56)

  @inline private def le32(d: Array[Byte], i: Int): Long =
    (d(i) & 0xffL) |
      ((d(i + 1) & 0xffL) << 8) |
      ((d(i + 2) & 0xffL) << 16) |
      ((d(i + 3) & 0xffL) << 24)

  /** 128-bit hash with seeds; writes (h1, h2) into `out`. */
  def hash128(data: Array[Byte], offset: Int, length: Int, seed1: Long, seed2: Long, out: Array[Long]): Unit = {
    if (length < BufSize) shortHash(data, offset, length, seed1, seed2, out)
    else longHash(data, offset, length, seed1, seed2, out)
  }

  def hash128(data: Array[Byte]): (Long, Long) = {
    val out = new Array[Long](2)
    hash128(data, 0, data.length, 0L, 0L, out)
    (out(0), out(1))
  }

  // short path: messages under 192 bytes (spooky.cpp SpookyHash::Short)
  private def shortHash(data: Array[Byte], offset: Int, length: Int, seed1: Long, seed2: Long, out: Array[Long]): Unit = {
    var remainder = length % 32
    var a = seed1
    var b = seed2
    var c = ScConst
    var d = ScConst
    var p = offset

    if (length > 15) {
      val end = offset + (length / 32) * 32
      while (p < end) {
        c += le64(data, p); d += le64(data, p + 8)
        // ShortMix
        c = rot64(c, 50); c += d; a ^= c
        d = rot64(d, 52); d += a; b ^= d
        a = rot64(a, 30); a += b; c ^= a
        b = rot64(b, 41); b += c; d ^= b
        c = rot64(c, 54); c += d; a ^= c
        d = rot64(d, 48); d += a; b ^= d
        a = rot64(a, 38); a += b; c ^= a
        b = rot64(b, 37); b += c; d ^= b
        c = rot64(c, 62); c += d; a ^= c
        d = rot64(d, 34); d += a; b ^= d
        a = rot64(a, 5); a += b; c ^= a
        b = rot64(b, 36); b += c; d ^= b
        a += le64(data, p + 16); b += le64(data, p + 24)
        p += 32
      }
      if (remainder >= 16) {
        c += le64(data, p); d += le64(data, p + 8)
        c = rot64(c, 50); c += d; a ^= c
        d = rot64(d, 52); d += a; b ^= d
        a = rot64(a, 30); a += b; c ^= a
        b = rot64(b, 41); b += c; d ^= b
        c = rot64(c, 54); c += d; a ^= c
        d = rot64(d, 48); d += a; b ^= d
        a = rot64(a, 38); a += b; c ^= a
        b = rot64(b, 37); b += c; d ^= b
        c = rot64(c, 62); c += d; a ^= c
        d = rot64(d, 34); d += a; b ^= d
        a = rot64(a, 5); a += b; c ^= a
        b = rot64(b, 36); b += c; d ^= b
        p += 16
        remainder -= 16
      }
    }

    // last 0..15 bytes and the length (V1: assignment, not +=)
    d = length.toLong << 56
    // replicate the C switch fallthrough on `remainder`
    if (remainder >= 12) {
      if (remainder == 15) d += (data(p + 14) & 0xffL) << 48
      if (remainder >= 14) d += (data(p + 13) & 0xffL) << 40
      if (remainder >= 13) d += (data(p + 12) & 0xffL) << 32
      d += le32(data, p + 8)
      c += le64(data, p)
    } else if (remainder >= 8) {
      if (remainder == 11) d += (data(p + 10) & 0xffL) << 16
      if (remainder >= 10) d += (data(p + 9) & 0xffL) << 8
      if (remainder >= 9) d += data(p + 8) & 0xffL
      c += le64(data, p)
    } else if (remainder >= 4) {
      if (remainder == 7) c += (data(p + 6) & 0xffL) << 48
      if (remainder >= 6) c += (data(p + 5) & 0xffL) << 40
      if (remainder >= 5) c += (data(p + 4) & 0xffL) << 32
      c += le32(data, p)
    } else if (remainder >= 1) {
      if (remainder == 3) c += (data(p + 2) & 0xffL) << 16
      if (remainder >= 2) c += (data(p + 1) & 0xffL) << 8
      c += data(p) & 0xffL
    } else {
      c += ScConst
      d += ScConst
    }

    // ShortEnd
    d ^= c; c = rot64(c, 15); d += c
    a ^= d; d = rot64(d, 52); a += d
    b ^= a; a = rot64(a, 26); b += a
    c ^= b; b = rot64(b, 51); c += b
    d ^= c; c = rot64(c, 28); d += c
    a ^= d; d = rot64(d, 9); a += d
    b ^= a; a = rot64(a, 47); b += a
    c ^= b; b = rot64(b, 54); c += b
    d ^= c; c = rot64(c, 32); d += c
    a ^= d; d = rot64(d, 25); a += d
    b ^= a; a = rot64(a, 63); b += a

    out(0) = a
    out(1) = b
  }

  // long path: >= 192 bytes (spooky.cpp SpookyHash::Hash128)
  private def longHash(data: Array[Byte], offset: Int, length: Int, seed1: Long, seed2: Long, out: Array[Long]): Unit = {
    val h = new Array[Long](12)
    h(0) = seed1; h(3) = seed1; h(6) = seed1; h(9) = seed1
    h(1) = seed2; h(4) = seed2; h(7) = seed2; h(10) = seed2
    h(2) = ScConst; h(5) = ScConst; h(8) = ScConst; h(11) = ScConst

    var p = offset
    val end = offset + (length / BlockSize) * BlockSize
    while (p < end) {
      mix(data, p, h)
      p += BlockSize
    }

    val remainder = length - (end - offset)
    val buf = new Array[Byte](BlockSize)
    System.arraycopy(data, end, buf, 0, remainder)
    buf(BlockSize - 1) = remainder.toByte
    mix(buf, 0, h)

    var i = 0
    while (i < 3) { // End = 3x EndPartial
      h(11) += h(1); h(2) ^= h(11); h(1) = rot64(h(1), 44)
      h(0) += h(2); h(3) ^= h(0); h(2) = rot64(h(2), 15)
      h(1) += h(3); h(4) ^= h(1); h(3) = rot64(h(3), 34)
      h(2) += h(4); h(5) ^= h(2); h(4) = rot64(h(4), 21)
      h(3) += h(5); h(6) ^= h(3); h(5) = rot64(h(5), 38)
      h(4) += h(6); h(7) ^= h(4); h(6) = rot64(h(6), 33)
      h(5) += h(7); h(8) ^= h(5); h(7) = rot64(h(7), 10)
      h(6) += h(8); h(9) ^= h(6); h(8) = rot64(h(8), 13)
      h(7) += h(9); h(10) ^= h(7); h(9) = rot64(h(9), 38)
      h(8) += h(10); h(11) ^= h(8); h(10) = rot64(h(10), 53)
      h(9) += h(11); h(0) ^= h(9); h(11) = rot64(h(11), 42)
      h(10) += h(0); h(1) ^= h(10); h(0) = rot64(h(0), 54)
      i += 1
    }
    out(0) = h(0)
    out(1) = h(1)
  }

  @inline private def mix(d: Array[Byte], p: Int, s: Array[Long]): Unit = {
    s(0) += le64(d, p); s(2) ^= s(10); s(11) ^= s(0); s(0) = rot64(s(0), 11); s(11) += s(1)
    s(1) += le64(d, p + 8); s(3) ^= s(11); s(0) ^= s(1); s(1) = rot64(s(1), 32); s(0) += s(2)
    s(2) += le64(d, p + 16); s(4) ^= s(0); s(1) ^= s(2); s(2) = rot64(s(2), 43); s(1) += s(3)
    s(3) += le64(d, p + 24); s(5) ^= s(1); s(2) ^= s(3); s(3) = rot64(s(3), 31); s(2) += s(4)
    s(4) += le64(d, p + 32); s(6) ^= s(2); s(3) ^= s(4); s(4) = rot64(s(4), 17); s(3) += s(5)
    s(5) += le64(d, p + 40); s(7) ^= s(3); s(4) ^= s(5); s(5) = rot64(s(5), 28); s(4) += s(6)
    s(6) += le64(d, p + 48); s(8) ^= s(4); s(5) ^= s(6); s(6) = rot64(s(6), 39); s(5) += s(7)
    s(7) += le64(d, p + 56); s(9) ^= s(5); s(6) ^= s(7); s(7) = rot64(s(7), 57); s(6) += s(8)
    s(8) += le64(d, p + 64); s(10) ^= s(6); s(7) ^= s(8); s(8) = rot64(s(8), 55); s(7) += s(9)
    s(9) += le64(d, p + 72); s(11) ^= s(7); s(8) ^= s(9); s(9) = rot64(s(9), 54); s(8) += s(10)
    s(10) += le64(d, p + 80); s(0) ^= s(8); s(9) ^= s(10); s(10) = rot64(s(10), 22); s(9) += s(11)
    s(11) += le64(d, p + 88); s(1) ^= s(9); s(10) ^= s(11); s(11) = rot64(s(11), 46); s(10) += s(0)
  }
}
