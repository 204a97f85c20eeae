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
}
