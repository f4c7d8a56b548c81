package graft.agg

import graft.sketch._
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** distinct-count estimate from a serialized HLL */
case class HllEstimate(child: Expression) extends SketchInspect[Hll] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): Hll = Hll.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).estimate
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "hll_estimate"
}

/** frequency upper-estimate from a serialized CMS */
case class CmsEstimate(left: Expression, right: Expression)
    extends SketchProbe[CountMin] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): CountMin = CountMin.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, key: Any): Any =
    sketchOf(sketch).estimate(key.asInstanceOf[UTF8String].getBytes)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "cms_estimate"
}

case class CmsTotal(child: Expression) extends SketchInspect[CountMin] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): CountMin = CountMin.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).total
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "cms_total"
}

abstract class DoubleArgSketchExpr[S <: AnyRef] extends BinaryExpression
    with CodegenFallback with SketchMemo[S]

case class TDigestQuantile(left: Expression, right: Expression)
    extends DoubleArgSketchExpr[TDigest] {
  override def dataType: DataType = DoubleType
  override protected def parse(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    sketchOf(sketch).quantile(q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "tdigest_quantile"
}

case class TDigestCdf(left: Expression, right: Expression)
    extends DoubleArgSketchExpr[TDigest] {
  override def dataType: DataType = DoubleType
  override protected def parse(bytes: Array[Byte]): TDigest = TDigest.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, x: Any): Any =
    sketchOf(sketch).cdf(x.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "tdigest_cdf"
}

case class KllQuantile(left: Expression, right: Expression)
    extends DoubleArgSketchExpr[Kll] {
  override def dataType: DataType = DoubleType
  override protected def parse(bytes: Array[Byte]): Kll = Kll.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, q: Any): Any =
    sketchOf(sketch).quantile(q.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "kll_quantile"
}

case class KllRank(left: Expression, right: Expression)
    extends DoubleArgSketchExpr[Kll] {
  override def dataType: DataType = DoubleType
  override protected def parse(bytes: Array[Byte]): Kll = Kll.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any, x: Any): Any =
    sketchOf(sketch).rank(x.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
  override def prettyName: String = "kll_rank"
}

case class KllN(child: Expression) extends SketchInspect[Kll] {
  override def dataType: DataType = LongType
  override protected def parse(bytes: Array[Byte]): Kll = Kll.deserialize(bytes)
  override protected def nullSafeEval(sketch: Any): Any = sketchOf(sketch).n
  override protected def withNewChildInternal(c: Expression) = copy(c)
  override def prettyName: String = "kll_n"
}
