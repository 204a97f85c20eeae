package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Karp–Rabin rolling hash as a native codegen'd expression:
 * `acc = (acc * 31 + codeUnit) mod 1e9+7` over the string's UTF-16
 * code units. Bit-identical to the higher-order fold formulation in
 * [[graft.ops.TextOps]] (split-by-"" + `ascii()` visits the same code
 * units with the same values on BMP text) and to the DuckDB
 * `list_reduce(string_split(...))` mirror on ASCII corpora, but runs
 * as a compiled loop instead of two array materializations and an
 * interpreted lambda per character — the difference between O(bytes)
 * and O(bytes × interpreter-dispatch) on a 100 TB text scan.
 */
case class RollingHash(child: Expression) extends UnaryExpression {

  final val Mod = 1000000007L

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    var acc = 0L
    var i = 0
    while (i < s.length) {
      acc = (acc * 31L + s.charAt(i).toLong) % Mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val (s, i, acc) = (ctx.freshName("s"), ctx.freshName("i"), ctx.freshName("acc"))
      s"""
         |final String $s = $input.toString();
         |long $acc = 0L;
         |for (int $i = 0; $i < $s.length(); $i++) {
         |  $acc = ($acc * 31L + (long) $s.charAt($i)) % ${Mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Unicode NFC normalization as a native codegen'd expression — the
 * canonical-composition pass every multilingual training corpus runs
 * before tokenization/dedup (decomposed "a"+U+0301 and precomposed "á"
 * must fingerprint identically). Spark has no built-in normalizer;
 * `java.text.Normalizer` implements the same Unicode canonical
 * composition ICU does, so results match DuckDB's `nfc_normalize`
 * (asserted by the t_normalize oracle). The already-normalized fast
 * path (`isNormalized`) makes the common ASCII scan a no-op check
 * instead of a rebuild.
 */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    if (java.text.Normalizer.isNormalized(s, java.text.Normalizer.Form.NFC)) input
    else UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input => {
      val s = ctx.freshName("s")
      s"""
         |final String $s = $input.toString();
         |${ev.value} = java.text.Normalizer.isNormalized($s, java.text.Normalizer.Form.NFC)
         |  ? $input
         |  : org.apache.spark.unsafe.types.UTF8String.fromString(
         |      java.text.Normalizer.normalize($s, java.text.Normalizer.Form.NFC));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * Histogram of a bucket-id array: `graft_bucket_counts(arr, dim)` →
 * ARRAY<BIGINT> of length `dim` where slot j counts elements equal to
 * j (null elements and out-of-range ids are ignored; a null array is
 * null). One compiled pass over the array — the codegen'd replacement
 * for `dim` higher-order `filter` lambdas, which run INTERPRETED in
 * Spark (every HigherOrderFunction is CodegenFallback) and were
 * measured at ~Dim× this expression's cost in the hashed-feature
 * pipeline (Classifier.withFeatureCol).
 */
case class BucketCounts(child: Expression, dim: Int) extends UnaryExpression {
  require(dim >= 1 && dim <= (1 << 20), s"graft_bucket_counts: bad dim $dim")

  override def prettyName: String = "graft_bucket_counts"
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.ArrayType(LongType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<BIGINT>, got $other")
  }

  override def nullSafeEval(v: Any): Any =
    TextKernels.bucketCounts(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bucketCounts($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {
  /** One-pass bucket histogram (see [[BucketCounts]]). */
  def bucketCounts(arr: org.apache.spark.sql.catalyst.util.ArrayData,
                   dim: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val out = new Array[Long](dim)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val b = arr.getLong(i)
        if (b >= 0 && b < dim) out(b.toInt) += 1L
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }
}
