package graft.agg

import graft.sketch._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/**
 * Scalar probe/inspect expressions over serialized sketches — the
 * reference's `check`/`multi` (`csrc/bloomd/conn_handler.c:135-228`)
 * and `info` fields, as Catalyst expressions.
 *
 * Deserialization of our blobs is a header parse that WRAPS the byte
 * array (no bitmap copy), so per-row probe cost is hashing + k bit
 * reads. A same-reference memo still short-circuits the wrap when the
 * engine hands us the identical array object (literals, cached rows).
 */
trait SketchMemo[S <: AnyRef] {
  @transient private var lastRef: AnyRef = _
  @transient private var lastSketch: S = _

  protected def parse(bytes: Array[Byte]): S

  protected final def sketchOf(raw: Any): S = {
    val bytes = raw.asInstanceOf[Array[Byte]]
    if (bytes ne lastRef) {
      lastSketch = parse(bytes)
      lastRef = bytes
    }
    lastSketch
  }
}

abstract class SketchProbe[S <: AnyRef] extends BinaryExpression
    with CodegenFallback with SketchMemo[S] {
  override def left: Expression // sketch binary
  override def right: Expression // key string
}

/** `check <filter> <key>` -> Yes/No (`sbf.c:89-97`, `bloom.c:141-150`) */
case class BloomContains(left: Expression, right: Expression)
    extends SketchProbe[BloomFilter] {
  override def dataType: DataType = BooleanType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    sketchOf(sketch).containsKey(key.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "bloom_contains"
}

case class SbfContains(left: Expression, right: Expression)
    extends SketchProbe[ScalableBloom] {
  override def dataType: DataType = BooleanType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    sketchOf(sketch).contains(key.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "sbf_contains"
}

/** Rust-server `check` -> multiplicity count (`src/lbf.rs:74-89`) */
case class LbfCount(left: Expression, right: Expression)
    extends SketchProbe[LayeredBloom] {
  override def dataType: DataType = IntegerType
  override protected def parse(bytes: Array[Byte]): LayeredBloom = LayeredBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    sketchOf(sketch).count(key.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "lbf_count"
}

abstract class SketchInspect[S <: AnyRef] extends UnaryExpression
    with CodegenFallback with SketchMemo[S]

/** header count — the reference's `size` info field */
case class BloomCount(child: Expression) extends SketchInspect[BloomFilter] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).count
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "bloom_count"
}

/** order-independent fill-ratio cardinality estimate */
case class BloomEstimate(child: Expression) extends SketchInspect[BloomFilter] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).estimateItems
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "bloom_estimate"
}

case class SbfSize(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).size
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_size"
}

case class SbfNumLayers(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = IntegerType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).numLayers
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_num_layers"
}

case class SbfTotalCapacity(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).totalCapacity
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_total_capacity"
}

/** distinct-key count = layer-0 count (`src/lbf.rs:91-98`) */
case class LbfSize(child: Expression) extends SketchInspect[LayeredBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): LayeredBloom = LayeredBloom.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).size
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "lbf_size"
}
