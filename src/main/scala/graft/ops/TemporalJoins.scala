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
    // values ride in ONE nullable struct: null marks "no right row yet",
    // while a right row whose value fields are NULL still counts as the
    // latest snapshot (matching DuckDB ASOF) — last(value, ignoreNulls)
    // per column would skip it and resurface a stale older value.
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(1))
      .withColumn("__vals",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          valueCols.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))))
    val rTagged = right.select(
      col(key), col(rightTs).as("__ts"),
      struct(valueCols.map(col): _*).as("__vals"))
      .withColumn("__side", lit(0))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // right rows (__side=0) sort before left rows at equal ts → `<=`
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = unioned.withColumn("__latest", last(col("__vals"), ignoreNulls = true).over(w))
    val out = valueCols.foldLeft(filled) { (df, v) =>
      df.withColumn(v, col(s"__latest.$v"))
    }
    out.filter(col("__side") === 1).drop("__ts", "__side", "__vals", "__latest")
  }

  /**
   * As-of join with a staleness tolerance: like [[asofJoin]], but a
   * matched right row older than `toleranceExpr` (e.g. `expr("INTERVAL
   * 7 DAYS")` for timestamps, or a numeric bound for numeric ts) is
   * discarded — the left row gets NULLs instead of an arbitrarily
   * stale snapshot. The standard quote-staleness guard in market-data
   * joins (pandas `merge_asof(tolerance=...)`). Same single
   * union+window shuffle as [[asofJoin]]: the matched right timestamp
   * rides inside the value struct and the tolerance check is a post
   * projection, not a second join.
   */
  def asofJoinTolerance(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String, valueCols: Seq[String],
                        tolerance: Column): DataFrame = {
    val withTs = right.withColumn("__rts", col(rightTs))
    val joined = asofJoin(left, withTs, key, leftTs, rightTs, valueCols :+ "__rts")
    val fresh = col("__rts").isNotNull && col(leftTs) - tolerance <= col("__rts")
    valueCols.foldLeft(joined) { (df, v) =>
      df.withColumn(v, when(fresh, col(v)))
    }.drop("__rts")
  }

  /** FORWARD as-of join — the mirror of [[asofJoin]]: each left row
    * takes the EARLIEST right row with `rightTs >= leftTs` (inclusive)
    * per key. The "next scheduled event / next snapshot" direction:
    * next price revision, next maintenance window, the settlement date
    * after a trade. Same union + one window shuffle; at equal ts the
    * left row sorts first so a simultaneous right row matches. */
  def asofJoinForward(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      valueCols: Seq[String]): DataFrame = {
    val lTagged = left
      .withColumn("__ts", col(leftTs))
      .withColumn("__side", lit(0))
      .withColumn("__vals",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          valueCols.map(v => org.apache.spark.sql.types.StructField(v, right.schema(v).dataType)))))
    val rTagged = right.select(
      col(key), col(rightTs).as("__ts"),
      struct(valueCols.map(col): _*).as("__vals"))
      .withColumn("__side", lit(1))
    val unioned = lTagged.unionByName(rTagged, allowMissingColumns = true)
    // left rows (__side=0) sort before right rows at equal ts → `>=`
    val w = Window.partitionBy(col(key)).orderBy(col("__ts"), col("__side"))
      .rowsBetween(0, Window.unboundedFollowing)
    val filled = unioned.withColumn("__next",
      first(col("__vals"), ignoreNulls = true).over(w))
    val out = valueCols.foldLeft(filled) { (df, v) =>
      df.withColumn(v, col(s"__next.$v"))
    }
    out.filter(col("__side") === 0).drop("__ts", "__side", "__vals", "__next")
  }

  /**
   * NEAREST as-of join — pandas `merge_asof(direction='nearest')`,
   * completing the direction family (backward [[asofJoin]], forward
   * [[asofJoinForward]], staleness [[asofJoinTolerance]]): each left
   * row takes whichever adjacent right row is CLOSER in time, ties
   * to the backward match (the pandas tie rule). Composed as the
   * backward pass then the forward pass — two union+window shuffles
   * on the same key, no theta-join — with both candidate timestamps
   * riding in the value structs and one fixed projection picking the
   * winner per value column. Left timestamps must be date or
   * timestamp (distance compares in epoch seconds).
   */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      leftTs: String, rightTs: String,
                      valueCols: Seq[String]): DataFrame = {
    def secs(c: Column) = c.cast("timestamp").cast("long")
    val rb = right.select(col(key) +: col(rightTs) +:
      valueCols.map(v => col(v).as(s"__b_$v")): _*)
      .withColumn("__bts", col(rightTs))
    val rf = right.select(col(key) +: col(rightTs) +:
      valueCols.map(v => col(v).as(s"__f_$v")): _*)
      .withColumn("__fts", col(rightTs))
    val bwd = asofJoin(left, rb, key, leftTs, rightTs,
      valueCols.map(v => s"__b_$v") :+ "__bts")
    val both = asofJoinForward(bwd, rf, key, leftTs, rightTs,
      valueCols.map(v => s"__f_$v") :+ "__fts")
    val backWins = col("__fts").isNull || (col("__bts").isNotNull &&
      secs(col(leftTs)) - secs(col("__bts")) <= secs(col("__fts")) - secs(col(leftTs)))
    val out = valueCols.foldLeft(both) { (df, v) =>
      df.withColumn(v, when(backWins, col(s"__b_$v")).otherwise(col(s"__f_$v")))
    }
    out.drop(valueCols.flatMap(v => Seq(s"__b_$v", s"__f_$v")) ++
      Seq("__bts", "__fts"): _*)
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
    // last covered bin for the half-open [start, end): ceil(end/bin) - 1
    // handles fractional bounds (floor((end-1)/bin) silently loses
    // matches when end isn't an integer); empty intervals are filtered
    // before sequence() can produce a descending (wraparound) range.
    val binnedIntervals = intervals
      .filter(col(startCol) < col(endCol))
      .withColumn("__bin",
        explode(sequence(floor(col(startCol) / binSize), ceil(col(endCol) / binSize) - 1)))
    binnedPoints.join(binnedIntervals, Seq("__bin"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }

  /**
   * Interval-interval OVERLAP join via the same binning trick — the
   * general range join (Allen "overlaps ∪ contains ∪ equals") that a
   * naive formulation makes a cartesian with a residual predicate:
   * both sides explode into the fixed-size bins they cover, pairs meet
   * by bin equi-join, the residual keeps exact CLOSED-interval overlap
   * (`ls <= re AND rs <= le`). A pair sharing several bins would
   * surface once per shared bin, so each match is kept only in the
   * FIRST shared bin (`max(floor(ls/bin), floor(rs/bin))`) — dedup by
   * arithmetic, not a distinct shuffle. Choose `binSize` near the
   * typical interval span: per-row bin fan-out is span/binSize + 1
   * (the usual binning trade; a huge outlier interval multiplies its
   * own rows only). Column names must be disjoint between the sides
   * (enforced) — alias before calling.
   */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          binSize: Long): DataFrame = {
    val clash = left.columns.toSet.intersect(right.columns.toSet)
    require(clash.isEmpty,
      s"intervalOverlapJoin: column(s) ${clash.mkString(", ")} exist on both sides — " +
        "alias them first (the overlap predicate needs unambiguous names)")
    def binned(df: DataFrame, s: String, e: String) = df
      .filter(col(s) <= col(e)) // closed intervals: empty = start > end
      .withColumn("__bin", explode(sequence(
        floor(col(s) / binSize), floor(col(e) / binSize))))
    binned(left, lStart, lEnd).join(binned(right, rStart, rEnd), Seq("__bin"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      // keep each pair in its first SHARED bin only: bins are truncated
      // starts, so the first shared bin is the larger of the two
      .filter(col("__bin") === greatest(floor(col(lStart) / binSize),
        floor(col(rStart) / binSize)))
      .drop("__bin")
  }
}
