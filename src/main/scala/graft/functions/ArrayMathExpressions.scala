package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for embedding math.
  *
  * The higher-order-function formulation (`zip_with` + `aggregate`)
  * evaluates interpreted lambdas per element; these expressions emit a
  * tight Java loop via `doGenCode`, keeping the whole similarity
  * kernel inside whole-stage codegen. Summation is sequential in
  * element order with per-element double widening — bit-identical to
  * both the HOF version and the DuckDB oracle's evaluation order.
  *
  * (Preference order per the build charter: compose built-ins → custom
  * Expression → custom physical operator. Cosine over array<float> is
  * exactly the "custom Expression" case: semantics are expressible with
  * built-ins but not at scan throughput.)
  */
abstract class ArrayPairFold extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  protected def elemIsFloat: Boolean = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"expects array<float|double> inputs, got ${left.dataType}, ${right.dataType}")
  }

  protected def getter(arr: String, i: String, isFloat: Boolean): String =
    if (isFloat) s"(double)$arr.getFloat($i)" else s"$arr.getDouble($i)"

  @inline protected final def elem(a: ArrayData, i: Int, isFloat: Boolean): Double =
    if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
}

/** dot(a, b): sequential sum of pairwise products. */
case class DotProduct(left: Expression, right: Expression) extends ArrayPairFold {
  private lazy val lFloat = elemIsFloat
  private lazy val rFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var i = 0
    while (i < n) { dot += elem(a, i, lFloat) * elem(b, i, rFloat); i += 1 }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $dot += ${getter(a, i, lFloat)} * ${getter(b, i, rFloat)};
         |}
         |${ev.value} = $dot;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** cosine(a, b) = dot/(||a||*||b||), one fused loop. Returns null for
  * null inputs; NaN when either norm is zero (matches x/0.0 = NaN
  * double semantics of the HOF formulation).
  */
case class CosineSimilarity(left: Expression, right: Expression) extends ArrayPairFold {
  private lazy val lFloat = elemIsFloat
  private lazy val rFloat = right.dataType match {
    case ArrayType(FloatType, _) => true; case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]; val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < n) {
      val x = elem(a, i, lFloat); val y = elem(b, i, rFloat)
      dot += x * y; na += x * x; nb += y * y; i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val dot = ctx.freshName("dot"); val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${getter(a, i, lFloat)};
         |  double $y = ${getter(b, i, rFloat)};
         |  $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** int8 quantize-then-dequantize in ONE pass: per-vector scale
  * `max|v| / 127`, code `floor(v/scale + 0.5)`, output `code * scale`
  * as array<double> — value-identical to
  * `Similarity.dequantize(Similarity.quantizeInt8(emb))`, whose
  * HOF formulation re-evaluates the array_max subtree per element
  * under CollapseProject (O(d²) per row). Zero vectors pass through as
  * all-zero.
  */
case class QuantizeDequantizeExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullable: Boolean = child.nullable

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    ArrayMathKernels.quantizeDequantize(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayMathKernels.quantizeDequantize($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Upper-triangle Gram terms of one vector:
  * array<struct<i:int, j:int, v:double>> with v = x_i·x_j for i ≤ j —
  * the per-row generator of the PCA moment relation
  * (Similarity.pcaMoments). Replaces the interpreted
  * `explode(flatten(transform(sequence…)))` HOF chain, which built the
  * d(d+1)/2 structs through nested interpreted lambdas (~1.5 ms/vector
  * at d=64 — VERDICT r15 #4); this emits them in one tight loop and
  * stays inside whole-stage codegen. The consuming hash-agg is
  * unchanged, so moment sums (and the streaming twin's cuts) remain
  * bit-identical.
  */
case class GramUpperExpr(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("j",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("v", DoubleType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"expects array<float|double>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    ArrayMathKernels.gramUpper(a.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ArrayMathKernels.gramUpper($c, $isFloat);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ArrayMathKernels {
  /** See [[GramUpperExpr]]. Element order matches the HOF reference:
    * i-major, j ascending from i.
    */
  def gramUpper(a: ArrayData, isFloat: Boolean): ArrayData = {
    val d = a.numElements()
    val xs = new Array[Double](d)
    var i = 0
    while (i < d) {
      xs(i) = if (isFloat) a.getFloat(i).toDouble else a.getDouble(i)
      i += 1
    }
    val out = new Array[Any](d * (d + 1) / 2)
    var p = 0
    i = 0
    while (i < d) {
      var j = i
      while (j < d) {
        out(p) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, j, xs(i) * xs(j)))
        p += 1
        j += 1
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Mirrors the HOF composition's corner semantics (spec- and
    * oracle-parity on NaN-free data): Spark's array_max SKIPS null
    * elements (they pass through as null in the output, as transform
    * would emit) and treats NaN as the LARGEST value — so any NaN
    * element poisons the scale and every non-null output is NaN
    * (a Java `>` scan would silently skip it; the HOF form would
    * instead die on ANSI NaN→long cast, so NaN-poisoning is the
    * defined behavior here).
    */
  def quantizeDequantize(a: ArrayData, isFloat: Boolean): ArrayData = {
    val n = a.numElements()
    var mx = 0.0
    var hasNaN = false
    var hasNull = false
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) hasNull = true
      else {
        val v = math.abs(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        if (v.isNaN) hasNaN = true else if (v > mx) mx = v
      }
      i += 1
    }
    val scale =
      if (hasNaN) Double.NaN
      else if (mx > 0) mx / 127.0
      else 0.0
    def quant(v: Double): Double =
      if (scale == 0.0) 0.0 else math.floor(v / scale + 0.5) * scale
    if (!hasNull) {
      val out = new Array[Double](n)
      i = 0
      while (i < n) {
        out(i) = quant(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(out)
    } else {
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        if (!a.isNullAt(i))
          out(i) = quant(if (isFloat) a.getFloat(i).toDouble else a.getDouble(i))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    }
  }
}

object ArrayMath {
  /** Column-API entry points (codegen'd). */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosineSimilarity(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantizeDequantize(a: Column): Column =
    ColumnBridge.column(QuantizeDequantizeExpr(ColumnBridge.expression(a)))

  def gramUpper(a: Column): Column =
    ColumnBridge.column(GramUpperExpr(ColumnBridge.expression(a)))
}
