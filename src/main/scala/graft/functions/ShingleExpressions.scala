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

  /** Whitespace-split tokens, empties dropped (== TextOps.tokens). */
  private[functions] def tokenize(s: String): java.util.ArrayList[String] = {
    val len = s.length
    val toks = new java.util.ArrayList[String]()
    var i = 0
    while (i < len) {
      while (i < len && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < len && s.charAt(i) != ' ') i += 1
      if (i > start) toks.add(s.substring(start, i))
    }
    toks
  }

  /** Static entry shared by eval and generated code. */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    val toks = tokenize(text.toString)
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

/**
 * Full k-slot MinHash signature per document in ONE compiled pass —
 * slot i = min over the doc's n-word shingles of the chained
 * `xxhash64(i, xxhash64(shingle))` (bit-identical to Spark's builtin
 * `min(xxhash64(lit(i), shingleHash))` aggregate: same seed-42 chain).
 *
 * Structurally this removes the explode + k-MIN hash-aggregate SHUFFLE
 * from signature building: the signature becomes a narrow projection,
 * so MinHash/LSH's first exchange is the band-bucket join itself. The
 * per-slot seed `xxhash64(i)` is hoisted out of the shingle loop, so
 * cost is one hashLong per (shingle, slot). Docs with fewer than n
 * tokens yield an EMPTY array (they have no signature — filter on
 * size, mirroring the old aggregate's absent-group behavior).
 */
case class MinHashSignature(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash"

  override def nullSafeEval(input: Any): Any =
    MinHashSignature.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.MinHashSignature.compute($input, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/**
 * 64-bit SimHash sketch per document in ONE compiled pass: every
 * token's xxhash64 (seed 42, == the builtin over the token string)
 * votes ±1 on each of the 64 bit positions; bit b of the sketch is set
 * iff its vote total is positive. Bit-identical to the aggregate
 * formulation (explode + 64 conditional SUMs + bit packing) that
 * [[graft.ops.Dedup.simhashAgg]] keeps as the executable spec — but as
 * a narrow projection: no explode, no aggregate shuffle, and zero-token
 * docs get sketch 0 naturally (no vote ever fires) without the
 * re-join the aggregate needed for its absent groups.
 */
case class SimHashSketch(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any =
    SimHashSketch.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.SimHashSketch.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHashSketch {

  def compute(text: UTF8String): Long = {
    val toks = WordShingleHashes.tokenize(text.toString)
    val votes = new Array[Int](64)
    var t = 0
    while (t < toks.size()) {
      val h = XxHash64Function.hash(UTF8String.fromString(toks.get(t)), StringType, 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}

object MinHashSignature {
  import org.apache.spark.sql.catalyst.expressions.XXH64

  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = WordShingleHashes.tokenize(text.toString)
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    // chained-seed prefix per slot: xxhash64 of the slot index under
    // seed 42 — constant across shingles, hoisted out of the loop
    val slotSeed = new Array[Long](k)
    var i = 0
    while (i < k) { slotSeed(i) = XXH64.hashInt(i, 42L); i += 1 }
    val sig = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(j + t))
        t += 1
      }
      val h = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, 42L)
      i = 0
      while (i < k) {
        val slotted = XXH64.hashLong(h, slotSeed(i))
        if (slotted < sig(i)) sig(i) = slotted
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/**
 * Engine-PORTABLE k-slot MinHash signature in ONE compiled pass — the
 * fast form of [[graft.ops.Dedup.minhashSignaturesMd5Spec]]'s
 * higher-order-function plan (DedupSpec asserts bit-parity; the spec
 * is also exactly what the DuckDB oracle runs): base hash = first 48
 * bits of `md5(shingle)` reduced mod p = 2^31−1, slot i =
 * min over shingles of `((2i+1)·h + 1000003·(i+1)) mod p`
 * (Carter-Wegman). Same single-projection shape as [[MinHashSignature]]
 * (no explode, no aggregate shuffle) but every value is reproducible
 * from any engine's md5 — which is what lets the LSH pair list be
 * oracle-HASHED instead of rows-only checked. Shingle distinctness is
 * irrelevant under min, so no dedup set is kept. Docs with fewer than
 * n tokens yield an EMPTY array (filter on size).
 */
case class Md5MinHashSignature(child: Expression, n: Int, k: Int)
  extends UnaryExpression {

  require(n >= 1 && k >= 1, s"need n >= 1 and k >= 1, got n=$n k=$k")

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_md5"

  override def nullSafeEval(input: Any): Any =
    Md5MinHashSignature.compute(input.asInstanceOf[UTF8String], n, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.Md5MinHashSignature.compute($input, $n, $k);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5MinHashSignature {

  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)

  def compute(text: UTF8String, n: Int, k: Int): ArrayData = {
    val toks = WordShingleHashes.tokenize(text.toString)
    val m = toks.size()
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sig = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder()
    var j = 0
    while (j <= m - n) {
      sb.setLength(0)
      var t = 0
      while (t < n) {
        if (t > 0) sb.append(' ')
        sb.append(toks.get(j + t))
        t += 1
      }
      // first 48 bits of the digest == parse of the first 12 hex chars
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h = 0L
      var b = 0
      while (b < 6) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h %= P
      var i = 0
      while (i < k) {
        val v = (h * (2L * i + 1) + 1000003L * (i + 1)) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      j += 1
    }
    new GenericArrayData(sig)
  }
}

/**
 * Engine-PORTABLE 60-bit SimHash sketch in ONE compiled pass — the
 * fast form of [[graft.ops.Dedup.simhashMd5Spec]]'s higher-order plan
 * (DedupSpec asserts bit-parity; the spec mirrors the DuckDB oracle):
 * each token's hash is the first 60 bits of its md5 (15 hex chars),
 * voting ±1 per bit position; bit b is set iff its vote total is
 * positive. 60 bits (not 64) because 15 hex chars is the widest md5
 * prefix that parses into a signed BIGINT in every engine; the pair
 * search bands 4 × 15 bits, preserving the Hamming-≤3 pigeonhole
 * guarantee. Zero-token docs sketch to 0.
 */
case class Md5SimHashSketch(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash_md5"

  override def nullSafeEval(input: Any): Any =
    Md5SimHashSketch.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, input =>
      s"${ev.value} = graft.functions.Md5SimHashSketch.compute($input);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Md5SimHashSketch {

  def compute(text: UTF8String): Long = {
    val toks = WordShingleHashes.tokenize(text.toString)
    val md = java.security.MessageDigest.getInstance("MD5")
    val votes = new Array[Int](60)
    var t = 0
    while (t < toks.size()) {
      val d = md.digest(toks.get(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 60 bits == parse of the first 15 hex chars: 7 whole
      // bytes then the HIGH nibble of byte 7
      var h = 0L
      var i = 0
      while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      h = (h << 4) | ((d(7) & 0xf0L) >>> 4)
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sketch = 0L
    var b = 0
    while (b < 60) {
      if (votes(b) > 0) sketch |= (1L << b)
      b += 1
    }
    sketch
  }
}
