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
