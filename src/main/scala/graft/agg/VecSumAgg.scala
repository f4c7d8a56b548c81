package graft.agg

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/**
 * Element-wise sum of array<double> vectors as a mergeable aggregate:
 * the centroid-update primitive for IVF/k-means (sum per cell, divide
 * by count driver-side). Replaces the posexplode(v) -> groupBy(dim)
 * shape, which blows each row up by the dimensionality (64x) and
 * shuffles O(rows * dims) — this buffer is O(dims) per group and the
 * shuffle carries one vector per (partition, group).
 */
case class VecSumAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Double]] with UnaryLike[Expression] {

  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): Array[Double] = Array.emptyDoubleArray

  private def addInto(buf: Array[Double], arr: ArrayData): Array[Double] = {
    val n = arr.numElements()
    val acc = if (buf.length >= n) buf else java.util.Arrays.copyOf(buf, n)
    var i = 0
    while (i < n) { acc(i) += arr.getDouble(i); i += 1 }
    acc
  }

  override def update(buffer: Array[Double], input: InternalRow): Array[Double] = {
    val v = child.eval(input)
    if (v == null) buffer else addInto(buffer, v.asInstanceOf[ArrayData])
  }

  override def merge(a: Array[Double], b: Array[Double]): Array[Double] = {
    val (big, small) = if (a.length >= b.length) (a, b) else (b, a)
    var i = 0
    while (i < small.length) { big(i) += small(i); i += 1 }
    big
  }

  override def eval(buf: Array[Double]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Double]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.foreach(bb.putDouble)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Double] = {
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getDouble(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(n: Int): VecSumAgg = copy(mutableAggBufferOffset = n)
  override def withNewInputAggBufferOffset(n: Int): VecSumAgg = copy(inputAggBufferOffset = n)
  override protected def withNewChildInternal(c: Expression): VecSumAgg = copy(child = c)
  override def prettyName: String = "vec_sum_agg"
}
