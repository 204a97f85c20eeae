package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Space-filling-curve data layout (the OPTIMIZE ZORDER BY of table
 * formats, re-expressed as plain Spark): interleave the bits of bounded
 * integer dimensions into one Morton z-value and cluster the data by
 * it. Files written in z-order have NARROW min/max ranges in EVERY
 * participating dimension simultaneously — so parquet zone-map /
 * file-skipping predicates on x OR y both prune, where a plain 1-D sort
 * only prunes its own leading column.
 *
 * Scale shape: the z-value is a pure projection (shift/AND/OR columns —
 * whole-stage codegen, no UDF); clustering is one
 * `repartitionByRange(zv)` + `sortWithinPartitions(zv)`, i.e. exactly
 * one range-exchange regardless of dimension count. At 100 TB that is
 * the same cost as any global sort, paid once at write time, and every
 * subsequent multi-dimensional scan benefits.
 */
object Layout {

  /** Morton/Z-value of two non-negative dimensions using `bits` bits
    * each: output bit 2i is bit i of `x`, bit 2i+1 is bit i of `y`.
    * Composed from shift/AND/OR so it stays inside whole-stage codegen;
    * inputs must fit in `bits` bits (mask-reduce them first). */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftleft(shiftrightunsigned(x, i).bitwiseAND(lit(1L)), 2 * i),
        shiftleft(shiftrightunsigned(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** N-dimensional Morton/Z-value: output bit `n·i + d` is bit i of
    * dimension d — the round-robin bit interleave for ANY dimension
    * count, so 3- and 4-column clusterings are first-class (zValue2 is
    * the n=2 special case, kept for its hot-path arity). Total output
    * bits n·bits must fit a signed long; still a pure shift/AND/OR
    * projection inside whole-stage codegen. */
  def zValueN(dims: Seq[Column], bits: Int): Column = {
    require(dims.size >= 2, s"zValueN: need >= 2 dimensions, got ${dims.size}")
    require(bits >= 1 && dims.size * bits <= 63,
      s"zValueN: ${dims.size} dims x $bits bits must be <= 63 total")
    val n = dims.size
    val terms = (0 until bits).flatMap { i =>
      dims.zipWithIndex.map { case (d, j) =>
        shiftleft(shiftrightunsigned(d, i).bitwiseAND(lit(1L)), n * i + j)
      }
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** Cluster `df` in z-order of two bounded int columns: one range
    * exchange on the z-value, rows sorted by it within partitions.
    * Write the result with `partitionBy`-free parquet and each file's
    * min/max footer is tight in BOTH dimensions. */
  def zorder2(df: DataFrame, xCol: String, yCol: String, bits: Int,
              numPartitions: Int): DataFrame =
    zorderN(df, Seq(xCol, yCol), bits, numPartitions)

  /** N-column z-order clustering — each written file covers a compact
    * n-dimensional tile, so conjunctive stats pruning
    * ([[graft.engine.SnapshotStore.readWhere]]) prunes on EVERY
    * participating dimension multiplicatively. One range exchange
    * regardless of dimension count. */
  def zorderN(df: DataFrame, cols: Seq[String], bits: Int,
              numPartitions: Int): DataFrame = {
    // pick a helper-column name the input provably doesn't use, so an
    // existing user column is never silently replaced then dropped
    val zvName = Iterator.from(0).map(i => if (i == 0) "__zv" else s"__zv$i")
      .find(n => !df.columns.contains(n)).get
    val zv =
      if (cols.size == 2) zValue2(col(cols.head), col(cols(1)), bits)
      else zValueN(cols.map(col), bits)
    df.withColumn(zvName, zv)
      .repartitionByRange(numPartitions, col(zvName))
      .sortWithinPartitions(zvName)
      .drop(zvName)
  }

  /** Hilbert-curve index of two `bits`-bit dimensions, appended as
    * `outCol` — the standard per-level xy→d transform (quadrant digit
    * joins d, then (x, y) reflect/swap into the sub-square's frame).
    * Unlike Morton order, the Hilbert curve is CONTINUOUS: consecutive
    * indexes are always spatially adjacent cells, so an arbitrary
    * index range (a file's worth of rows) covers a compact region —
    * Morton ranges that straddle a quadrant seam jump across the
    * domain and blow the file's min/max extents wide. Same write cost
    * as z-order (one range exchange over the value), tighter skipping
    * on file-sized chunks.
    *
    * Everything is integer CASE/+/× arithmetic — the quadrant digit
    * `(3·rx) XOR ry` is folded to `rx·(3−ry) + (1−rx)·ry` so no
    * engine-specific bitwise XOR appears — and each level lands in its
    * OWN projection (a `select` per level keeps the expression tree
    * linear in `bits`; the chain still fuses into one codegen stage).
    * [[hilbertSql]] emits the same arithmetic as chained SQL CTEs for
    * engine-independent replay. */
  def hilbertIndexed(df: DataFrame, xCol: String, yCol: String, bits: Int,
                     outCol: String): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1L << bits
    val keep = df.columns.toSeq
    var cur = df
      .withColumn("__hx", col(xCol).cast("long"))
      .withColumn("__hy", col(yCol).cast("long"))
      .withColumn(outCol, lit(0L))
    for (lvl <- (bits - 1) to 0 by -1) {
      val s = 1L << lvl
      def bit(c: String) =
        when(col(c).bitwiseAND(lit(s)) =!= 0L, lit(1L)).otherwise(lit(0L))
      val (rx, ry) = (bit("__hx"), bit("__hy"))
      cur = cur.select(
        keep.map(col) ++ Seq(
          when(ry === 1L, col("__hx"))
            .when(rx === 1L, lit(n - 1) - col("__hy"))
            .otherwise(col("__hy")).as("__hx"),
          when(ry === 1L, col("__hy"))
            .when(rx === 1L, lit(n - 1) - col("__hx"))
            .otherwise(col("__hx")).as("__hy"),
          (col(outCol) + lit(s * s) *
            (rx * (lit(3L) - ry) + (lit(1L) - rx) * ry)).as(outCol)): _*)
    }
    cur.select((keep :+ outCol).map(col): _*)
  }

  /** Hilbert clustering: the [[hilbertIndexed]] analogue of
    * [[zorderN]] — one range exchange on the curve value. */
  def hilbertCluster(df: DataFrame, xCol: String, yCol: String, bits: Int,
                     numPartitions: Int): DataFrame = {
    val hv = Iterator.from(0).map(i => if (i == 0) "__hv" else s"__hv$i")
      .find(n => !df.columns.contains(n)).get
    hilbertIndexed(df, xCol, yCol, bits, hv)
      .repartitionByRange(numPartitions, col(hv))
      .sortWithinPartitions(hv)
      .drop(hv)
  }

  /** The same per-level Hilbert arithmetic as chained SQL CTEs:
    * `hilbertSql("src", "x", "y", bits, "hv")` yields
    * `WITH h0 AS (...), …, hB AS (...)` whose last CTE exposes
    * (src.*, hv) — integer-exact in any ANSI engine. */
  def hilbertSql(src: String, x: String, y: String, bits: Int,
                 out: String): (String, String) = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val n = 1L << bits
    val base = s"h0 AS (SELECT *, CAST($x AS BIGINT) AS __hx, " +
      s"CAST($y AS BIGINT) AS __hy, CAST(0 AS BIGINT) AS __hd FROM $src)"
    val levels = ((bits - 1) to 0 by -1).zipWithIndex.map { case (lvl, i) =>
      val s = 1L << lvl
      val rx = s"(CASE WHEN (__hx & $s) <> 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (__hy & $s) <> 0 THEN 1 ELSE 0 END)"
      s"""h${i + 1} AS (SELECT * EXCLUDE (__hx, __hy, __hd),
         |  CASE WHEN $ry = 1 THEN __hx
         |       WHEN $rx = 1 THEN ${n - 1} - __hy ELSE __hy END AS __hx,
         |  CASE WHEN $ry = 1 THEN __hy
         |       WHEN $rx = 1 THEN ${n - 1} - __hx ELSE __hx END AS __hy,
         |  __hd + ${s * s} * ($rx * (3 - $ry) + (1 - $rx) * $ry) AS __hd
         |  FROM h$i)""".stripMargin
    }
    ((base +: levels).mkString(",\n"),
      s"SELECT * EXCLUDE (__hx, __hy, __hd), __hd AS $out FROM h$bits")
  }
}
