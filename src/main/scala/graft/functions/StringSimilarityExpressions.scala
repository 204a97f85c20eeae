package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Jaro-Winkler similarity as a native codegen expression — the
 * fuzzy-name comparator entity-resolution blocking passes score with
 * (Spark ships levenshtein/soundex but no Jaro family). Semantics are
 * pinned to the de-facto standard implementation (RapidFuzz, which
 * DuckDB vendors, supplying the independent oracle):
 *
 *  - match window `max(l1,l2)/2 - 1` (floor, min 0), left-to-right
 *    greedy matching, transpositions halved;
 *  - `jaro = (m/l1 + m/l2 + (m-t)/m) / 3` in exactly that association
 *    order — bit-identical doubles, the oracle compares UNROUNDED;
 *  - Winkler prefix boost `+ p·0.1·(1-jaro)` (common prefix capped at
 *    4) only when `jaro > 0.7` (strict);
 *  - either side empty ⇒ 0.0 — including BOTH empty, where the
 *    textbook says 1.0 but RapidFuzz/DuckDB say 0.0.
 *
 * Comparison is per UTF-16 char (identical to byte-wise for ASCII;
 * supplementary-plane text would pair surrogates — fine for the
 * similarity's blocking use). O(l1·window) time, two small boolean
 * scratch arrays, no allocation beyond them; the codegen path is one
 * static call so the expression stays inside whole-stage codegen.
 */
case class JaroWinkler(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (STRING, STRING), got (${left.dataType}, ${right.dataType})")

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(a: Any, b: Any): Any =
    JaroWinkler.compute(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.JaroWinkler.compute($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {

  /** Static entry shared by eval and generated code. */
  def compute(a: UTF8String, b: UTF8String): Double = {
    val s1 = a.toString
    val s2 = b.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val window = math.max(math.max(l1, l2) / 2 - 1, 0)
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val hi = math.min(l2 - 1, i + window)
      var j = math.max(0, i - window)
      var found = false
      while (j <= hi && !found) {
        if (!m2(j) && s1.charAt(i) == s2.charAt(j)) {
          m1(i) = true; m2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var jaro = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (jaro > 0.7) {
      val maxP = math.min(4, math.min(l1, l2))
      var p = 0
      while (p < maxP && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro = jaro + p * 0.1 * (1.0 - jaro)
    }
    jaro
  }
}
