package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.types.{DoubleType, LongType}

/** DataFrame surface for the bounded-state top-k aggregate
  * ([[graft.functions.TopKByAgg]] — see its scaladoc for why this
  * beats a rank window at scale: k pairs of state per group and
  * MERGEABLE map-side partials, where `row_number() OVER (...)` sorts
  * every group's full row set and ships every row to one partition). */
object Ranking {
  import org.apache.spark.sql.graftbridge.Bridge.{column, expression}

  /** `array<struct<score double, id bigint>>` of the k best rows per
    * group: highest score first, ties to the smaller id — a total
    * order, so results are deterministic and oracle-hashable. NULL
    * scores/ids are ignored; NaN ranks above +Inf (filter upstream). */
  def topKBy(score: Column, id: Column, k: Int): Column =
    column(graft.functions.TopKByAgg(
      expression(score.cast(DoubleType)), expression(id.cast(LongType)), k)
      .toAggregateExpression())

  /** Misra-Gries heavy-hitter sketch over a string column
    * ([[graft.functions.MisraGriesAgg]]): ≤ k (item, lower-bound)
    * counters whatever the item domain's cardinality, mergeable so
    * map-side partials apply. Counters are partition-order-dependent —
    * use [[heavyHitters]] for a deterministic exact answer. */
  def misraGries(item: Column, k: Int): Column =
    column(graft.functions.MisraGriesAgg(expression(item), k)
      .toAggregateExpression())

  /** EXACT heavy hitters with BOUNDED memory — the two-pass pattern
    * for "items above φ·n frequency over a domain too large to
    * groupBy-count exactly in one shot" (top URLs/tokens at 100 TB):
    * pass 1 runs the mergeable Misra-Gries sketch (state ≤ k counters
    * per partition; with k ≥ 1/φ − 1, EVERY item above the threshold
    * is guaranteed among the ≤ k candidates); pass 2 exactly counts
    * the candidates only (a broadcast-friendly IN filter) and keeps
    * those truly above φ·n. The sketch's partition-dependence cancels:
    * ANY valid candidate superset yields the same verified output, so
    * the result is deterministic and oracle-hashable against a plain
    * GROUP BY … HAVING. The candidate read is ≤ k driver scalars (the
    * watermark-read pattern). Returns `(itemCol, n)`, the exact counts
    * of the true heavy hitters. */
  def heavyHitters(df: org.apache.spark.sql.DataFrame, itemCol: String,
                   phi: Double, k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    require(phi > 0 && phi < 1, s"heavyHitters: phi must be in (0,1), got $phi")
    require(k + 1 >= math.ceil(1.0 / phi).toInt,
      s"heavyHitters: k=$k too small for phi=$phi — the Misra-Gries guarantee " +
        s"needs k >= 1/phi - 1 = ${math.ceil(1.0 / phi).toInt - 1} or candidates may be missed")
    // n counts NON-NULL items, like the sketch and the exact pass
    val row = df.agg(misraGries(col(itemCol), k).as("__mg"),
      count(col(itemCol)).as("__n")).head()
    val n = row.getLong(1)
    val cands = row.getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    val thr = math.floor(phi * n).toLong
    if (cands.isEmpty) return df.sparkSession.emptyDataFrame
      .select(lit("").as(itemCol), lit(0L).as("n")).limit(0)
    df.filter(col(itemCol).isin(cands: _*))
      .groupBy(col(itemCol)).agg(count(lit(1)).as("n"))
      .filter(col("n") > thr)
  }

  /** DETERMINISTIC per-group MODE of an integral column (most frequent
    * value; ties to the SMALLEST value — native `mode()` leaves ties
    * engine/plan-dependent, which disqualifies it from any verified
    * pipeline): two keyed aggregates — value counts, then the k=1
    * [[topKBy]] heap over (count, value) — both map-side combined,
    * state O(distinct values) then O(1). Returns `(keys…, mode, n)`.
    * NULL values are ignored (SQL aggregate convention). */
  def modeBy(df: org.apache.spark.sql.DataFrame, keys: Seq[String],
             valueCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    val counts = df.filter(col(valueCol).isNotNull)
      .groupBy((keys :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("__n"))
    counts.groupBy(keys.map(col): _*)
      .agg(topKBy(col("__n"), col(valueCol), 1).as("__top"))
      .select(keys.map(col) :+ element_at(col("__top"), 1).as("__m"): _*)
      .select(keys.map(col) :+ col("__m.id").as("mode")
        :+ col("__m.score").cast("bigint").as("n"): _*)
  }

  /** 2-D Pareto SKYLINE (maximize `upCol`, minimize `downCol`): the
    * points no other point dominates — q dominates p iff q.up ≥ p.up ∧
    * q.down ≤ p.down with one strict. The frontier computes at the
    * DISTINCT-`upCol` level: one keyed agg takes min(down) per up
    * value (map-side combined — the only pass over the data), then a
    * window over up DESC takes the running strictly-above min; a
    * frontier point is a (up, min-down) pair that beats every
    * strictly-larger up's best. State and window size are bounded by
    * `upCol`'s distinct cardinality, never row count — the 100 TB
    * shape. Value-identical duplicates are all reported via `n_rows`
    * (mutual non-strict domination keeps them, per the classical
    * definition). Integral columns only: every comparison is exact.
    * Returns `(up, down, n_rows)` — `orderBy(up)` is also down DESC,
    * a total order. */
  def skyline2d(df: org.apache.spark.sql.DataFrame,
                upCol: String, downCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.expressions.Window
    val perUp = df.filter(col(upCol).isNotNull && col(downCol).isNotNull)
      .groupBy(col(upCol).cast("long").as("up"))
      .agg(min(col(downCol).cast("long")).as("down"), count(lit(1)).as("__n_at_up"))
    // min(down) among STRICTLY larger up: shift the running min by one
    val w = Window.orderBy(col("up").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = perUp
      .withColumn("__best_above", min("down").over(w))
      .filter(col("__best_above").isNull || col("down") < col("__best_above"))
    // recover the duplicate count at the exact frontier point
    df.select(col(upCol).cast("long").as("up"), col(downCol).cast("long").as("down"))
      .join(broadcast(frontier.select("up", "down")), Seq("up", "down"))
      .groupBy("up", "down").agg(count(lit(1)).as("n_rows"))
  }

  /** DuckDB mirror of [[skyline2d]] — same per-up min, same shifted
    * running min over up DESC, same duplicate-count join-back. */
  def skyline2dSql(rel: String, upCol: String, downCol: String): String =
    s"""WITH pts AS (SELECT CAST($upCol AS BIGINT) AS up, CAST($downCol AS BIGINT) AS down
       |  FROM $rel WHERE $upCol IS NOT NULL AND $downCol IS NOT NULL),
       |per_up AS (SELECT up, MIN(down) AS down FROM pts GROUP BY 1),
       |fr AS (SELECT up, down,
       |    MIN(down) OVER (ORDER BY up DESC
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS best_above
       |  FROM per_up)
       |SELECT pts.up, pts.down, CAST(count(*) AS BIGINT) AS n_rows
       |FROM pts JOIN (SELECT up, down FROM fr
       |               WHERE best_above IS NULL OR down < best_above) f
       |  ON pts.up = f.up AND pts.down = f.down
       |GROUP BY 1, 2""".stripMargin
}
