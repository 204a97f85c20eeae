package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal joins Spark has no native operator for — composed from
 * union + window (as-of) and bin-bucketed equi-joins (range), per the
 * "compose existing ops if semantics allow" preference ladder. DuckDB
 * has both natively (`ASOF JOIN`, inequality joins), which supplies an
 * independent oracle for the compositions.
 *
 * Scale notes:
 *  - [[asofJoin]] is one shuffle (the union sorts by key,ts inside the
 *    window) — same cost shape as a sort-merge join, no point-in-time
 *    subquery per row. The classic alternative (theta-join on
 *    `l.ts >= r.ts` + argmax) is a broadcast-nested-loop at best.
 *  - [[pointIntervalJoin]] turns an inequality join (nested-loop in
 *    Spark) into explode-to-bins + equi-join: cost is
 *    O(intervals × span/binSize + points), the standard range-join
 *    binning trick; pick binSize near the median interval span.
 */
object TemporalJoins {

  /**
   * As-of join: for every left row, the single latest right row with
   * `rightTs <= leftTs` for the same key (the point-in-time lookup of
   * financial data: "the price in effect when the order was placed").
   * Right side must be unique per (key, ts) — dedupe upstream.
   * Left rows with no prior right row get NULLs.
   */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, valueCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumns(valueCols.map(v => v -> lit(null).cast(right.schema(v).dataType)).toMap)
    val rTagged = right.select(
      (col(key) +: col(rightTs).as("__ts") +: valueCols.map(col)): _*)
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal ts → `<=`
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__ts", "__side")
  }

  /**
   * Point-in-interval range join via binning: intervals explode into
   * the fixed-size bins they cover; points equi-join their single bin;
   * the residual predicate keeps exact containment
   * (`start <= point < end`). Each (point, interval) match surfaces
   * exactly once (the point's bin is unique).
   */
  def pointIntervalJoin(points: DataFrame, intervals: DataFrame,
                        pointCol: String, startCol: String, endCol: String,
                        binSize: Long): DataFrame = {
    val binnedPoints = points.withColumn("__bin", floor(col(pointCol) / binSize))
    val binnedIntervals = intervals.withColumn("__bin",
      explode(sequence(floor(col(startCol) / binSize), floor((col(endCol) - 1) / binSize))))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
