package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Word n-gram shingle hashes as ONE compiled pass: tokenize on spaces
 * (empties dropped — same token set as `TextOps.tokens` /
 * `list_filter(string_split(..))`), form the n-word shingles, and emit
 * each shingle's `xxhash64` (seed 42 — identical to Spark's builtin
 * over the joined shingle string). `distinctShingles=true` keeps first
 * occurrences only (the Jaccard/MinHash input); `false` emits every
 * occurrence (n=1 ⇒ per-token hashes, the SimHash vote stream).
 *
 * Replaces a 4-deep interpreted higher-order pipeline
 * (split → filter → transform(slice+array_join) → array_distinct) with
 * a single tight loop over the string — no intermediate token/shingle
 * string arrays are ever materialized per row. Docs with fewer than n
 * tokens yield an empty array (explode then emits nothing, mirroring
 * the old `where(size(toks) >= n)` guard).
 */
case class WordShingleHashes(child: Expression, n: Int, distinctShingles: Boolean)
  extends UnaryExpression {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    WordShingleHashes.compute(input.asInstanceOf[UTF8String], n, distinctShingles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      // one static call — the loop itself is compiled JVM code either
      // way; routing through codegen keeps the expression inside the
      // surrounding whole-stage-codegen span (no fallback barrier)
      s"${ev.value} = graft.functions.WordShingleHashes.compute($input, $n, $distinctShingles);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingleHashes {

  /** Static entry shared by eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val s = text.toString
    val len = s.length
    // whitespace-split tokens, empties dropped (== TextOps.tokens)
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val out = new java.util.ArrayList[java.lang.Long](m - n + 1)
    val seen = if (distinct) new java.util.HashSet[java.lang.Long]() else null
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks.get(j + k))
        k += 1
      }
      // same bytes + seed as Spark's builtin xxhash64 on the string
      val h = XxHash64Function.hash(
        UTF8String.fromString(sb.toString), StringType, 42L)
      if (seen == null || seen.add(h)) out.add(h)
      j += 1
    }
    val arr = new Array[Long](out.size())
    var p = 0
    while (p < arr.length) { arr(p) = out.get(p); p += 1 }
    new GenericArrayData(arr)
  }
}
