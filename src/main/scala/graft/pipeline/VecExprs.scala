package graft.pipeline

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/**
 * Native dot product over two array<double> columns, with codegen.
 *
 * Bit-identical to `aggregate(zip_with(a, b, (x, y) -> x * y), 0.0,
 * (acc, z) -> acc + z)` — a sequential left fold of products from
 * 0.0 — but runs as a tight primitive loop inside WholeStageCodegen
 * instead of interpreted Catalyst higher-order lambdas (which
 * allocate a closure frame per element). On the pairwise-cosine path
 * this is the difference between the similarity join being
 * compute-bound on FMA-speed arithmetic vs. lambda interpretation
 * overhead (~20x at 64 dims).
 */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |${ev.value} = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getDouble($i) * $y.getDouble($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDot = copy(l, r)
  override def prettyName: String = "vec_dot"
}

/**
 * All `tables` sign-LSH bucket keys of a vector in ONE array pass:
 * bucket key of table t = the packed sign bits of the dot products
 * with planes t*bitsPerTable .. (t+1)*bitsPerTable-1. Semantically
 * identical to composing `tables * bitsPerTable` separate
 * aggregate(zip_with(...)) sign columns (same plane components from
 * [[graft.pipeline.Ann.planeComponent]], same left-fold add order per
 * plane), but one traversal instead of L*b — the bucketing projection
 * was the dominant cost of the LSH ANN query. Plane matrix is built
 * lazily at first eval for the observed dimensionality.
 */
case class SignLshBuckets(child: Expression, tables: Int, bitsPerTable: Int)
    extends UnaryExpression with graft.pipeline.UnaryRefCodegen {
  require(tables > 0 && bitsPerTable > 0 && bitsPerTable <= 63, "bad LSH shape")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  @transient private var planes: Array[Array[Double]] = _
  @transient private var planeDims: Int = -1

  private def planesFor(nDims: Int): Array[Array[Double]] = {
    if (planes == null || planeDims != nDims) {
      val nPlanes = tables * bitsPerTable
      val m = Array.ofDim[Double](nPlanes, nDims)
      var p = 0
      while (p < nPlanes) {
        var d = 0
        while (d < nDims) { m(p)(d) = Ann.planeComponent(p, d); d += 1 }
        p += 1
      }
      planes = m
      planeDims = nDims
    }
    planes
  }

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = planesFor(n)
    val keys = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var key = 0L
      var b = 0
      while (b < bitsPerTable) {
        val plane = m(t * bitsPerTable + b)
        var s = 0.0
        var d = 0
        while (d < n) { s += arr.getDouble(d) * plane(d); d += 1 }
        if (s > 0.0) key |= (1L << b)
        b += 1
      }
      keys(t) = key
      t += 1
    }
    new GenericArrayData(keys)
  }

  override protected def withNewChildInternal(c: Expression): SignLshBuckets = copy(child = c)
  override def prettyName: String = "sign_lsh_buckets"
}

object VecFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  def lsh_buckets(v: Column, tables: Int, bitsPerTable: Int): Column =
    ColumnShim.column(SignLshBuckets(ColumnShim.expression(v), tables, bitsPerTable))

  def vec_sum_agg(v: Column): Column =
    ColumnShim.column(graft.agg.VecSumAgg(ColumnShim.expression(v))
      .toAggregateExpression(isDistinct = false))
}
