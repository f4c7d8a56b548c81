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

/**
 * One-pass nearest-cell assignment against a centroid matrix:
 * score_i = dot(v, c_i) * mult + bias_i, returns
 * struct(cell = arg-best index (first index wins ties), score = best).
 *
 * Replaces the literal-per-centroid `array(dot(v, lit(c0))/.., ...)`
 * assignment expression, whose codegen grows with cells x dims (the
 * ~256-cell ceiling noted in [[Dedup.cosinePairs]]): here the matrix
 * is ONE reference object, codegen size is constant, and cost is a
 * tight cells x dims primitive loop — so cell counts can track corpus
 * size (cells ~ sqrt(N)) into the 10^7-vector regime.
 *
 * Arithmetic parity with the literal form: per-cell dot is the same
 * left fold [[VecDot]] performs; L2 mode (mult = -2, bias_i = |c_i|^2,
 * findMax = false) reproduces `-2*dot + sqNorm` term for term;
 * first-index tie-breaking matches `array_position(.., array_min(..))`.
 */
case class NearestCell(child: Expression, centroids: Seq[Seq[Double]],
                       mult: Double, biases: Seq[Double], findMax: Boolean)
    extends UnaryExpression with UnaryRefCodegen {
  require(centroids.nonEmpty && centroids.length == biases.length, "bad centroid matrix")

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("cell", org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("score", DoubleType, nullable = false)))

  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  @transient private lazy val matrix: Array[Array[Double]] = centroids.map(_.toArray).toArray
  @transient private lazy val biasArr: Array[Double] = biases.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val m = matrix
    val nc = m.length
    var best = 0
    var bestScore = Double.NaN
    var c = 0
    while (c < nc) {
      val cent = m(c)
      val n = math.min(arr.numElements(), cent.length)
      var s = 0.0
      var d = 0
      while (d < n) { s += arr.getDouble(d) * cent(d); d += 1 }
      val score = s * mult + biasArr(c)
      // first index wins ties (strict comparison); a NaN score never
      // displaces a real one, and an initial NaN is displaced by any
      // real score (parity with array_position semantics)
      val better =
        if (java.lang.Double.isNaN(bestScore)) !java.lang.Double.isNaN(score)
        else if (findMax) score > bestScore else score < bestScore
      if (c == 0 || better) { best = c; bestScore = score }
      c += 1
    }
    org.apache.spark.sql.catalyst.InternalRow(best, bestScore)
  }

  override protected def withNewChildInternal(c: Expression): NearestCell = copy(child = c)
  override def prettyName: String = "nearest_cell"
}

/**
 * One-pass symmetric int8 quantization of an array<double> vector:
 * struct(amax = max_i |v_i|, qv = array<long> of
 * floor(v_i * 127.0 / amax + 0.5), all-zero when amax = 0).
 *
 * Bit-identical to the builtin higher-order form
 * `aggregate(v, 0.0, (a,x) -> greatest(a, abs(x)))` +
 * `transform(v, x -> floor(x * 127.0 / amax + 0.5))` — max is exact
 * and the per-component multiply/divide/add/floor are the same
 * correctly-rounded IEEE ops in the same order — but runs as a tight
 * primitive loop inside WholeStageCodegen instead of interpreted
 * lambda frames, because quantization is a full-corpus projection
 * (the only plan shape that reads all 100 TB of embeddings).
 */
case class QuantizeInt8(child: Expression)
    extends UnaryExpression with UnaryRefCodegen {

  override def dataType: DataType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("amax", DoubleType, nullable = false),
    org.apache.spark.sql.types.StructField("qv",
      ArrayType(LongType, containsNull = false), nullable = false)))

  override def evalRef(input: AnyRef): AnyRef = nullSafeEval(input).asInstanceOf[AnyRef]

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var amax = 0.0
    var i = 0
    while (i < n) {
      val a = math.abs(arr.getDouble(i))
      if (a > amax) amax = a
      i += 1
    }
    val q = new Array[Long](n)
    if (amax != 0.0) {
      i = 0
      while (i < n) {
        q(i) = math.floor(arr.getDouble(i) * 127.0 / amax + 0.5).toLong
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.InternalRow(amax, new GenericArrayData(q))
  }

  override protected def withNewChildInternal(c: Expression): QuantizeInt8 = copy(child = c)
  override def prettyName: String = "quantize_int8"
}

/**
 * Exact integer dot product over two array<long> columns — the
 * int8-code scoring primitive. Same tight-loop codegen rationale as
 * [[VecDot]]; bit-identical to the aggregate(zip_with) fold for
 * equal-length arrays (quantized codes always are — both sides come
 * from the same quantizer).
 */
case class VecDotLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var s = 0L
    var i = 0
    while (i < n) {
      s += x.getLong(i) * y.getLong(i)
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
         |${ev.value} = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  ${ev.value} += $x.getLong($i) * $y.getLong($i);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecDotLong = copy(l, r)
  override def prettyName: String = "vec_dot_long"
}

object VecFunctions {
  def vec_dot(a: Column, b: Column): Column =
    ColumnShim.column(VecDot(ColumnShim.expression(a), ColumnShim.expression(b)))

  def vec_dot_long(a: Column, b: Column): Column =
    ColumnShim.column(VecDotLong(ColumnShim.expression(a), ColumnShim.expression(b)))

  def lsh_buckets(v: Column, tables: Int, bitsPerTable: Int): Column =
    ColumnShim.column(SignLshBuckets(ColumnShim.expression(v), tables, bitsPerTable))

  def vec_sum_agg(v: Column): Column =
    ColumnShim.column(graft.agg.VecSumAgg(ColumnShim.expression(v))
      .toAggregateExpression(isDistinct = false))

  /** struct(amax, qv): one-pass symmetric int8 quantization */
  def quantize_int8(v: Column): Column =
    ColumnShim.column(QuantizeInt8(ColumnShim.expression(v)))

  /** struct(cell, score): nearest centroid by L2 (`-2*dot + |c|^2`, argmin) */
  def nearest_cell_l2(v: Column, cents: Seq[Array[Double]]): Column =
    ColumnShim.column(NearestCell(ColumnShim.expression(v),
      cents.map(_.toSeq), mult = -2.0,
      biases = cents.map(c => c.foldLeft(0.0)((a, x) => a + x * x)),
      findMax = false))

  /** struct(cell, score): max dot product (argmax cosine for pre-normalized centroids) */
  def nearest_cell_dot(v: Column, cents: Seq[Array[Double]]): Column =
    ColumnShim.column(NearestCell(ColumnShim.expression(v),
      cents.map(_.toSeq), mult = 1.0,
      biases = cents.map(_ => 0.0), findMax = true))
}
