package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Native Catalyst expressions for the vector hot path (SURVEY.md §7.5's
 * "optional codegen Expression", delivered because the bench demanded
 * it): `zip_with`+`aggregate` higher-order folds evaluate their lambda
 * per element through the interpreter, which dominates every similarity
 * query; these expressions compile the same left-to-right double
 * accumulation into the whole-stage-codegen loop.
 *
 * Arithmetic parity contract (oracle-critical): element i is widened to
 * double, products are accumulated in index order starting from 0.0 —
 * bit-identical to the previous fold implementation AND to the DuckDB
 * `list_reduce(list_prepend(0.0, list_transform(...)))` mirrors in
 * [[graft.ops.Similarity]]. Length-mismatched or null-element inputs
 * return NULL, matching `zip_with`'s null padding through the fold.
 */
trait VectorBinaryExpression extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments, got $other")
  }

  protected def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  protected def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemType(e) == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)

  protected def getElemCode(e: Expression, arr: String, i: String): String =
    if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  /** (ab, aa, bb) accumulators → final double. */
  protected def finish(ab: Double, aa: Double, bb: Double): Double
  protected def finishCode(ab: String, aa: String, bb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0.0; var aa = 0.0; var bb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val va = getElem(left, x, i)
      val vb = getElem(right, y, i)
      ab += va * vb; aa += va * va; bb += vb * vb
      i += 1
    }
    finish(ab, aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      val (ab, aa, bb) = (ctx.freshName("ab"), ctx.freshName("aa"), ctx.freshName("bb"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $ab = 0.0; double $aa = 0.0; double $bb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double va = ${getElemCode(left, a, i)};
         |    final double vb = ${getElemCode(right, b, i)};
         |    $ab += va * vb; $aa += va * va; $bb += vb * vb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ${finishCode(ab, aa, bb)}; }
         |}
       """.stripMargin
    })
}

/** dot(a, b) = Σ aᵢ·bᵢ in index order. */
case class DotProduct(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_dot"
  override protected def finish(ab: Double, aa: Double, bb: Double): Double = ab
  override protected def finishCode(ab: String, aa: String, bb: String): String = ab
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** cosine(a, b) = dot / (‖a‖·‖b‖); NaN for zero vectors (0/0), exactly
  * like the fold formulation. */
case class CosineSimilarity(left: Expression, right: Expression) extends VectorBinaryExpression {
  override def prettyName: String = "graft_cosine"
  override protected def finish(ab: Double, aa: Double, bb: Double): Double =
    ab / (math.sqrt(aa) * math.sqrt(bb))
  override protected def finishCode(ab: String, aa: String, bb: String): String =
    s"$ab / (java.lang.Math.sqrt($aa) * java.lang.Math.sqrt($bb))"
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * dist²(a, b) = Σ (aᵢ−bᵢ)² accumulated in index order from 0.0 —
 * bit-identical to the `zip_with`+`aggregate` fold it replaces (NOT the
 * algebraically-equal `aa − 2ab + bb`, whose different rounding would
 * break the DuckDB mirrors). Its own accumulator loop because the
 * [[VectorBinaryExpression]] (ab, aa, bb) triple can't express the
 * differenced square without changing the fold order.
 */
case class DistanceSquared(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "graft_dist_sq"
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(lt, _), ArrayType(rt, _))
      if Seq(lt, rt).forall(t => t == FloatType || t == DoubleType) =>
      TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<FLOAT|DOUBLE> arguments, got $other")
  }

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType
  private def getElem(e: Expression, arr: ArrayData, i: Int): Double =
    if (elemType(e) == FloatType) arr.getFloat(i).toDouble else arr.getDouble(i)
  private def getElemCode(e: Expression, arr: String, i: String): String =
    if (elemType(e) == FloatType) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = getElem(left, x, i) - getElem(right, y, i)
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n, acc) = (ctx.freshName("i"), ctx.freshName("n"), ctx.freshName("acc"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double d = ${getElemCode(left, a, i)} - ${getElemCode(right, b, i)};
         |    $acc += d * d;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Integer sibling of [[VectorBinaryExpression]] for int8-quantized code
 * vectors (`ARRAY<BIGINT>`, every element in [-127, 127]): the dot and
 * both squared norms accumulate in EXACT int64 arithmetic inside the
 * whole-stage-codegen loop — no per-element interpreted lambda, no
 * floating point until [[finish]]. Overflow-safe by construction:
 * |code·code| ≤ 127² = 16129, so the accumulator supports >5·10¹⁴
 * elements. NULL on length mismatch or null elements, like the float
 * trait.
 */
trait Int8VectorBinaryExpression extends BinaryExpression {

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case other =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName expects two ARRAY<BIGINT> arguments, got $other")
  }

  /** (ab, aa, bb) int64 accumulators → result. */
  protected def finish(ab: Long, aa: Long, bb: Long): Any
  protected def finishCode(ab: String, aa: String, bb: String): String

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val n = x.numElements()
    if (n != y.numElements()) return null
    var ab = 0L; var aa = 0L; var bb = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val va = x.getLong(i)
      val vb = y.getLong(i)
      ab += va * vb; aa += va * va; bb += vb * vb
      i += 1
    }
    finish(ab, aa, bb)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val (i, n) = (ctx.freshName("i"), ctx.freshName("n"))
      val (ab, aa, bb) = (ctx.freshName("ab"), ctx.freshName("aa"), ctx.freshName("bb"))
      s"""
         |final int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $ab = 0L; long $aa = 0L; long $bb = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long va = $a.getLong($i);
         |    final long vb = $b.getLong($i);
         |    $ab += va * vb; $aa += va * va; $bb += vb * vb;
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = ${finishCode(ab, aa, bb)}; }
         |}
       """.stripMargin
    })
}

/**
 * Static kernels shared by interpreted eval and generated code — the
 * loop body lives in ONE compiled JVM method, so codegen emits a single
 * static call per row (stays inside the whole-stage loop) instead of
 * per-element interpreted lambdas.
 */
object VectorKernels {
  import org.apache.spark.sql.catalyst.util.GenericArrayData
  import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData

  /** Identical arithmetic to Spark's `Round(e, 0)` on DoubleType
    * (BigDecimal HALF_UP — `Math.floor(x + 0.5)` is NOT the same for
    * e.g. 0.49999999999999994, where binary addition crosses 1.0). */
  private def roundHalfUp(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /**
   * Fused int8 quantization: scale = max(|xᵢ|)/127 over non-null
   * elements, code_i = round(xᵢ/scale) — one pass for the scale, one
   * for the codes, bit-identical to the
   * `quantizeInt8(vec, quantScale(vec))` HOF composition (null
   * elements stay null, all-zero vectors emit all-zero codes, empty
   * arrays stay empty, all-null arrays emit all nulls).
   */
  def int8Encode(arr: ArrayData, isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    def elem(i: Int): Double = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
    var maxAbs = java.lang.Double.NEGATIVE_INFINITY
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else { val a = math.abs(elem(i)); if (a > maxAbs) maxAbs = a }
      i += 1
    }
    val scaleDefined = maxAbs != java.lang.Double.NEGATIVE_INFINITY
    val scale = maxAbs / 127.0
    if (!hasNull && scaleDefined) {
      val out = new Array[Long](n)
      if (scale != 0.0) {
        i = 0
        while (i < n) { out(i) = roundHalfUp(elem(i) / scale).toLong; i += 1 }
      }
      UnsafeArrayData.fromPrimitiveArray(out)
    } else {
      // null elements (or an all-null array, where the scale itself is
      // NULL) propagate per-element, like transform over the null scale
      val out = new Array[Any](n)
      i = 0
      while (i < n) {
        out(i) =
          if (arr.isNullAt(i) || !scaleDefined) null
          else if (scale == 0.0) 0L
          else roundHalfUp(elem(i) / scale).toLong
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

/**
 * Fused scale+quantize ([[VectorKernels.int8Encode]]): replaces the
 * interpreted `transform(array_max(transform(...)))` composition with
 * one compiled two-pass loop — this projection runs over the ENTIRE
 * corpus in every quantized-similarity query, so it must not be the
 * interpreted part.
 */
case class Int8Encode(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def prettyName: String = "graft_int8_encode"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(t, _) if t == FloatType || t == DoubleType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got $other")
  }

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(v: Any): Any =
    VectorKernels.int8Encode(v.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.int8Encode($c, $isFloat)")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Exact int64 dot of two quantized code vectors: Σ aᵢ·bᵢ. */
case class Int8DotProduct(left: Expression, right: Expression) extends Int8VectorBinaryExpression {
  override def prettyName: String = "graft_int8_dot"
  override def dataType: DataType = LongType
  override protected def finish(ab: Long, aa: Long, bb: Long): Any = ab
  override protected def finishCode(ab: String, aa: String, bb: String): String = ab
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/**
 * Cosine over quantized codes: intdot / (√Σaᵢ² · √Σbᵢ²). The
 * per-vector quantization scales cancel algebraically
 * ((ab·sa·sb) / ((√aa·sa)·(√bb·sb)) = ab / (√aa·√bb)), so codes alone
 * suffice. The integer sums are exact; each is exactly representable as
 * a double up to 2⁵³, so the result is bit-reproducible across engines.
 * Zero-norm vectors (all-zero codes) return 0.0 — quantized scoring
 * treats "no signal" as orthogonal rather than NaN.
 */
case class Int8CosineSimilarity(left: Expression, right: Expression)
  extends Int8VectorBinaryExpression {
  override def prettyName: String = "graft_int8_cosine"
  override def dataType: DataType = DoubleType
  override protected def finish(ab: Long, aa: Long, bb: Long): Any =
    if (aa == 0L || bb == 0L) 0.0
    else ab.toDouble / (math.sqrt(aa.toDouble) * math.sqrt(bb.toDouble))
  override protected def finishCode(ab: String, aa: String, bb: String): String =
    s"""($aa == 0L || $bb == 0L) ? 0.0
       |  : (double) $ab / (java.lang.Math.sqrt((double) $aa) * java.lang.Math.sqrt((double) $bb))"""
      .stripMargin
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}
