package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/**
 * Determinism helpers for oracle-verified queries.
 *
 * Floating-point SUM/AVG are order-dependent, and Spark's partial
 * aggregation order differs run-to-run and engine-to-engine, so any
 * query whose output is hash-compared against DuckDB must make its
 * additions exact: cast the addends to DECIMAL (exact, associative),
 * sum, then cast the final scalar back to DOUBLE (a single correctly-
 * rounded conversion, identical in both engines).
 *
 * MIN/MAX/COUNT over doubles are already exact; plain scalar double
 * arithmetic (`a*(1-b)`) is IEEE-deterministic and needs no help.
 */
object Det {

  /** Exact SUM of a double column: `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)`. */
  def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(DecimalType(18, scale))).cast(DoubleType)

  /** Exact-sum mean: decimal-sum divided by count, in double. */
  def davg(c: Column, scale: Int = 6): Column =
    dsum(c, scale) / count(lit(1))

  /**
   * Fast exact SUM, value-identical to [[dsum]] but ~3× cheaper in the
   * aggregate hot loop: the per-row decimal cast (a Decimal allocation
   * per row per aggregate) becomes pure codegen double arithmetic
   * `floor(x·10^s + 0.5)` → BIGINT, the sum runs on primitive longs,
   * and the exact rational `S/10^s` is recovered once at the end via
   * decimal division (exact: result scale ≥ s) before the single
   * correctly-rounded cast to double.
   *
   * PRECONDITION (why floor(+0.5) is safe here despite the round-3
   * lesson): the input must be an s-decimal rational stored in double
   * (prices, quantities, their small products), so x·10^s sits within
   * ~1e-6 of an integer — never at a .5 boundary — and |x|·10^s must
   * stay under 2^51 so that distance survives the multiply. Under the
   * same precondition the decimal cast in [[dsum]] recovers the same
   * integer, which is why the results are bit-identical and the DuckDB
   * mirror remains [[dsumSql]]. For arbitrary doubles use [[dsum]].
   *
   * The per-row long is widened to DECIMAL(38,0) BEFORE the sum, so the
   * aggregate total is exact at any cardinality — only the per-row
   * magnitude is bounded (2^51), never the running sum. (Summing raw
   * BIGINT would wrap silently past 2^63 with ANSI off: for Q1-style
   * scale-6 charges that cliff sits near sf~100.) The double→long
   * conversion stays codegen'd; the Decimal add is the same kernel
   * [[dsum]] pays, minus its per-row double→Decimal rescale.
   */
  def fsum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale) // integral powers ≤ 10^15 are exact doubles
    (sum(floor(c * lit(f) + lit(0.5)).cast(org.apache.spark.sql.types.LongType)
      .cast(DecimalType(38, 0))) / lit(f).cast(DecimalType(16, 0)))
      .cast(DoubleType)
  }

  /** [[fsum]]-based mean, value-identical to [[davg]]. */
  def favg(c: Column, scale: Int = 6): Column =
    fsum(c, scale) / count(lit(1))

  /** Computed timestamps (session-TZ TimestampType) written to parquet
    * carry isAdjustedToUTC=true and read back tz-aware in DuckDB, while
    * the test tables and oracle results are tz-naive. Cast outputs to
    * TIMESTAMP_NTZ (wall-time-preserving under the UTC session) so both
    * sides compare naive-to-naive. */
  def ntz(c: Column): Column = c.cast(org.apache.spark.sql.types.TimestampNTZType)

  /**
   * DuckDB SQL: correctly-rounded integer→DOUBLE for values past 2^53.
   * DuckDB's HUGEINT→DOUBLE cast is NOT round-to-nearest (probed: it
   * double-rounds via 64-bit halves — a 76-bit value landed 1 ulp high)
   * while Spark's Decimal→Double is correctly rounded, so any mirror
   * casting an exact statistic that can exceed 2^53 must go through an
   * exact hi/lo 2^32 split: hi·2^32 is exact in double for |v| < 2^85,
   * lo (< 2^32) is exact, and their single addition rounds once — the
   * round-to-nearest value, engine-independent. Holds for negatives:
   * DuckDB `%` keeps the dividend's sign, so hi·2^32 + lo = v under
   * truncating `//`. `expr` must be a HUGEINT (or cast-to-HUGEINT)
   * expression; it is interpolated twice, so keep it a column or CTE
   * field, not a side-effecting subquery.
   */
  def hiLoDoubleSql(expr: String): String =
    s"(CAST(($expr) // 4294967296 AS DOUBLE) * 4294967296.0 + " +
      s"CAST(($expr) % 4294967296 AS DOUBLE))"

  /** DuckDB SQL mirroring [[dsum]]. */
  def dsumSql(col: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($col AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** DuckDB SQL mirroring [[davg]]. */
  def davgSql(col: String, scale: Int = 6): String =
    s"${dsumSql(col, scale)} / COUNT(*)"
}
