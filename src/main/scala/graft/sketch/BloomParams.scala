package graft.sketch

/**
 * Bloom filter sizing math, matching the reference bit-for-bit
 * (`csrc/libbloom/bloom.c:207-285`). Golden values asserted in tests:
 * n=1e6, p=1e-4 -> 2,396,265 bytes (+512 header), k=13
 * (`tests/libbloom/test_bloom.c:81-136`).
 *
 * `bytes` INCLUDES the 512-byte header (as after
 * `bf_params_for_capacity`); the bit array spans `(bytes-512)*8` bits.
 */
final case class BloomParams(bytes: Long, kNum: Int, capacity: Long, fpProbability: Double)

object BloomParams {

  /** Reference header: {magic:u32, k:u32, count:u64, pad[496]} = 512 bytes
    * (`csrc/libbloom/bloom.h:12-18`). */
  final val HeaderSize = 512
  final val Magic = 0xCB1005DD

  private val Ln2Sq = math.log(2) * math.log(2)

  /** `bf_size_for_capacity_prob` — bytes WITHOUT header. */
  def sizeForCapacityProb(capacity: Long, fpProb: Double): Long = {
    require(capacity > 0 && fpProb > 0, "capacity and probability must be positive")
    val bits = -(capacity.toDouble * math.log(fpProb) / Ln2Sq)
    val wholeBits = math.ceil(bits)
    math.ceil(wholeBits / 8.0).toLong
  }

  /** `bf_fp_probability_for_capacity_size` */
  def fpProbabilityForCapacitySize(bytes: Long, capacity: Long): Double = {
    require(bytes > 0 && capacity > 0)
    math.pow(math.E, -(bytes * 8.0 / capacity.toDouble) * Ln2Sq)
  }

  /** `bf_capacity_for_size_prob` */
  def capacityForSizeProb(bytes: Long, fpProb: Double): Long = {
    require(bytes > 0 && fpProb > 0)
    (-(bytes * 8.0 / math.log(fpProb) * Ln2Sq)).toLong
  }

  /** `bf_ideal_k_num` — bytes WITHOUT header. */
  def idealKNum(bytes: Long, capacity: Long): Int = {
    require(bytes > 0 && capacity > 0)
    math.round(math.log(2) * (bytes * 8.0) / capacity.toDouble).toInt
  }

  /** `bf_params_for_capacity`: size + ideal k, then add the header. */
  def forCapacity(capacity: Long, fpProb: Double): BloomParams = {
    val raw = sizeForCapacityProb(capacity, fpProb)
    val k = idealKNum(raw, capacity)
    BloomParams(raw + HeaderSize, math.max(k, 1), capacity, fpProb)
  }
}
