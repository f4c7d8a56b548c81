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

/**
 * Probes generate code (not CodegenFallback): a fallback expression
 * forces the WHOLE probe stage out of whole-stage codegen — the stage
 * that filters billions of rows in a batch `multi`/`check`. The
 * generated code calls back into this instance via a reference object
 * (standard Spark pattern), keeping the parse memo and a reusable key
 * buffer so the per-row cost is hash + k bit reads, zero allocation.
 */
abstract class SketchProbe[S <: AnyRef] extends BinaryExpression with SketchMemo[S] {
  override def left: Expression // sketch binary
  override def right: Expression // key string

  /** typed probe over (sketch, key bytes [off, off+len)) */
  protected def probe(sketch: S, key: Array[Byte], off: Int, len: Int): Any

  @transient private var keyBuf: Array[Byte] = _

  final def probeAny(sketchBytes: AnyRef, key: UTF8String): Any = {
    val len = key.numBytes()
    if (keyBuf == null || keyBuf.length < len)
      keyBuf = new Array[Byte](math.max(64, java.lang.Integer.highestOneBit(len) * 2))
    key.writeToMemory(keyBuf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET)
    probe(sketchOf(sketchBytes), keyBuf, 0, len)
  }

  final override protected def nullSafeEval(sketch: Any, key: Any): Any =
    probeAny(sketch.asInstanceOf[AnyRef], key.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("probe", this, classOf[SketchProbe[_]].getName)
    val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, (s, k) =>
      s"${ev.value} = ($boxed) $ref.probeAny($s, $k);")
  }
}

/** `check <filter> <key>` -> Yes/No (`sbf.c:89-97`, `bloom.c:141-150`) */
case class BloomContains(left: Expression, right: Expression)
    extends SketchProbe[BloomFilter] {
  override def dataType: DataType = BooleanType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def probe(s: BloomFilter, key: Array[Byte], off: Int, len: Int): Any =
    s.containsKey(key, off, len)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "bloom_contains"
}

case class SbfContains(left: Expression, right: Expression)
    extends SketchProbe[ScalableBloom] {
  override def dataType: DataType = BooleanType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def probe(s: ScalableBloom, key: Array[Byte], off: Int, len: Int): Any =
    s.contains(key, off, len)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "sbf_contains"
}

/** Rust-server `check` -> multiplicity count (`src/lbf.rs:74-89`) */
case class LbfCount(left: Expression, right: Expression)
    extends SketchProbe[LayeredBloom] {
  override def dataType: DataType = IntegerType
  override protected def parse(bytes: Array[Byte]): LayeredBloom = LayeredBloom.deserialize(bytes)
  override protected def probe(s: LayeredBloom, key: Array[Byte], off: Int, len: Int): Any =
    s.count(key, off, len)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "lbf_count"
}

abstract class SketchInspect[S <: AnyRef] extends UnaryExpression with SketchMemo[S] {
  protected def inspect(sketch: S): Any

  final def inspectAny(sketchBytes: AnyRef): Any = inspect(sketchOf(sketchBytes))

  final override protected def nullSafeEval(sketch: Any): Any =
    inspectAny(sketch.asInstanceOf[AnyRef])

  override protected def doGenCode(ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
                                   ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode) = {
    val ref = ctx.addReferenceObj("inspect", this, classOf[SketchInspect[_]].getName)
    val boxed = org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator.boxedType(dataType)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = ($boxed) $ref.inspectAny($s);")
  }
}

/** header count — the reference's `size` info field */
case class BloomCount(child: Expression) extends SketchInspect[BloomFilter] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def inspect(s: BloomFilter): Any = s.count
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "bloom_count"
}

/** order-independent fill-ratio cardinality estimate */
case class BloomEstimate(child: Expression) extends SketchInspect[BloomFilter] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): BloomFilter = BloomFilter.deserialize(bytes)
  override protected def inspect(s: BloomFilter): Any = s.estimateItems
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "bloom_estimate"
}

case class SbfSize(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def inspect(s: ScalableBloom): Any = s.size
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_size"
}

case class SbfNumLayers(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = IntegerType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def inspect(s: ScalableBloom): Any = s.numLayers
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_num_layers"
}

case class SbfTotalCapacity(child: Expression) extends SketchInspect[ScalableBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): ScalableBloom = ScalableBloom.deserialize(bytes)
  override protected def inspect(s: ScalableBloom): Any = s.totalCapacity
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "sbf_total_capacity"
}

/** distinct-key count = layer-0 count (`src/lbf.rs:91-98`) */
case class LbfSize(child: Expression) extends SketchInspect[LayeredBloom] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): LayeredBloom = LayeredBloom.deserialize(bytes)
  override protected def inspect(s: LayeredBloom): Any = s.size
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "lbf_size"
}
