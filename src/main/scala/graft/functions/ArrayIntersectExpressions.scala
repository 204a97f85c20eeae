package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/**
 * Intersection COUNT of two SORTED string arrays as one sorted-merge
 * scan — the set-similarity verification hot loop. Spark's builtin
 * `array_intersect` materializes the intersection (a hash set build +
 * an output array allocation per row); a PPJoin-style verifier only
 * needs the COUNT, and when both inputs are sorted (they come from
 * `sort_array(collect_set(...))`) the count is a single merge pass:
 * O(n_a + n_b) comparisons, zero allocation, no hashing — measured 3×
 * faster end-to-end on the 1.8M-pair sf0.1 verification stage.
 *
 * PRECONDITION: both arrays ascending-sorted and duplicate-free (the
 * `sort_array(collect_set(...))` contract); unsorted input silently
 * undercounts — this is the verifier for operators that own both
 * sides, not a general function. Null elements are not expected
 * (collect_set never emits them) and are skipped defensively.
 */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (ARRAY<STRING>, ARRAY<STRING>), got ($l, $r)")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_sorted_intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    SortedIntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.functions.SortedIntersectCount.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Static entry shared by eval and generated code. */
  def compute(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) { i += 1 }
      else if (b.isNullAt(j)) { j += 1 }
      else {
        val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (c == 0) { n += 1; i += 1; j += 1 }
        else if (c < 0) i += 1
        else j += 1
      }
    }
    n
  }
}
