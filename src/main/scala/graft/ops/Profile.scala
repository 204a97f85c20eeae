package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Table profiling (the engine's `ANALYZE TABLE` / dbt-docs column-stats
 * surface): one output row per profiled column with null count, exact
 * distinct count, and numeric min/max. The reference's dbt models carry
 * schema tests but no profiling; this is the data-quality
 * reconnaissance pass every curation pipeline runs before writing
 * filter thresholds.
 *
 * Scale shape: one aggregate leg per column, unioned. Deliberately NOT
 * one mixed multi-DISTINCT aggregate — Spark plans that as an Expand
 * that multiplies every scan row by the number of distinct aggregates
 * (the round-4 `agg_stats_by_flag` lesson). As separate legs each scan
 * is a one-column parquet read (column pruning), so total IO across all
 * legs equals ONE full-table pass, with no row multiplication and
 * per-leg map-side partial aggregation. At 100 TB swap the exact
 * distinct for `approx_count_distinct` per leg — same plan, bounded
 * state (documented rather than defaulted, because the oracle contract
 * here is exact).
 */
object Profile {

  /** Profile `cols` of `df`. Numeric columns report min/max cast to
    * double; non-numeric report NULL (casting a min through a string
    * would not be engine-portable — numeric-to-string formats differ).
    * `n_distinct` counts distinct NON-NULL values (SQL COUNT DISTINCT). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val legs = cols.map { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      val (mn, mx) =
        if (numeric) (min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      df.agg(
        count(lit(1)).minus(count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        mn.as("min_value"), mx.as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }
    legs.reduce(_ unionByName _)
  }

  /** The 100 TB profile: identical leg plan to [[profile]] but the
    * distinct count is `approx_count_distinct` (HLL++, `rsd` relative
    * error) — bounded aggregation state per leg instead of an exact
    * distinct's full key set. The estimate is not oracle-computable
    * (DuckDB's HLL differs), so alongside the EXACT count each leg
    * emits `approx_ok`: the estimate bound-checked against 5× the
    * configured rsd, the same contract as `agg_approx_distinct` — a
    * broken sketch hash-mismatches instead of sliding through. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileApprox: no columns given")
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val legs = cols.map { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      val (mn, mx) =
        if (numeric) (min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      df.agg(
        count(lit(1)).minus(count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        approx_count_distinct(col(c), rsd).as("n_distinct_approx"),
        mn.as("min_value"), mx.as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          // all-NULL column: both counts are 0 and the bound is vacuous
          (col("n_distinct") === 0 && col("n_distinct_approx") === 0 ||
            abs(col("n_distinct_approx") - col("n_distinct")).cast(DoubleType) /
              col("n_distinct") <= rsd * 5).cast(IntegerType).as("approx_ok"),
          col("min_value"), col("max_value"))
    }
    legs.reduce(_ unionByName _)
  }

  /** DuckDB SQL mirror of one [[profileApprox]] leg (asserts the flag). */
  def profileApproxLegSql(table: String, c: String, numeric: Boolean): String = {
    val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(1 AS INTEGER) AS approx_ok,
       |  $mn AS min_value, $mx AS max_value FROM $table""".stripMargin
  }

  /** DuckDB SQL mirror of one [[profile]] leg. */
  def profileLegSql(table: String, c: String, numeric: Boolean): String = {
    val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  $mn AS min_value, $mx AS max_value FROM $table""".stripMargin
  }
}
