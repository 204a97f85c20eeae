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

  /** Integer DCG discount table: D(r) = ⌊10⁹ / log₂(r+1)⌋ for
    * r = 1..k. Computed ONCE on the driver (a build-time constant —
    * query-time libm is banned for cross-engine determinism, the
    * bigramLmScore/naiveBayes discipline) and inlined as literals into
    * BOTH engines, so every data-dependent NDCG step is exact-integer. */
  def dcgDiscountUnits(k: Int): Seq[Long] =
    (1 to k).map(r =>
      math.floor(1e9 / (math.log(r + 1.0) / math.log(2.0))).toLong)

  /**
   * NDCG@k over a scored candidate table — the graded-relevance
   * retrieval metric next to search_mrr's binary reciprocal rank:
   * DCG = Σ_{r≤k} (2^rel − 1)·D(r) over the SYSTEM ranking
   * (`scoreCol` DESC, `tieCol` ASC — a total order), IDCG the same sum
   * over the IDEAL ranking (`relCol` DESC — tie order cannot change the
   * sum, equal rels contribute equal gains), ndcg_ppm =
   * ⌊10⁶·DCG/IDCG⌋. With the inlined integer discounts the whole
   * metric is exact BIGINT arithmetic — hash-stable with zero
   * tolerance (rel ≤ 30 keeps gain·D(1)·k·10⁶ far inside 2⁶³).
   *
   * Input: one row per (query, candidate) with the system score and an
   * INTEGER relevance grade. Output: one row per query
   * `(qCol, dcg_units, idcg_units, ndcg_ppm)`; a query whose candidates
   * are all rel = 0 reports NULL ndcg (0/0 — no ideal to normalize by)
   * in both engines.
   *
   * Scale shape: two per-query rank windows (keyed by query — never
   * global) + one keyed aggregate; candidate generation upstream is
   * the expensive part, the metric itself is per-query top-k state.
   */
  def ndcgAtK(scored: org.apache.spark.sql.DataFrame, qCol: String,
              scoreCol: String, tieCol: String, relCol: String,
              k: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val disc = dcgDiscountUnits(k)
    def dOf(rank: Column): Column = disc.zipWithIndex.foldLeft(lit(0L)) {
      case (acc, (d, i)) => when(rank === (i + 1), lit(d)).otherwise(acc)
    }
    val gain =
      expr(s"shiftleft(CAST(1 AS BIGINT), CAST($relCol AS INT)) - 1")
    val sysW = Window.partitionBy(qCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    val idealW = Window.partitionBy(qCol)
      .orderBy(col(relCol).desc, col(tieCol).asc)
    scored
      .withColumn("__g", gain.cast(LongType))
      .withColumn("__sr", row_number().over(sysW))
      .withColumn("__ir", row_number().over(idealW))
      .groupBy(col(qCol))
      .agg(
        sum(when(col("__sr") <= k, col("__g") * dOf(col("__sr")))
          .otherwise(lit(0L))).as("dcg_units"),
        sum(when(col("__ir") <= k, col("__g") * dOf(col("__ir")))
          .otherwise(lit(0L))).as("idcg_units"))
      .withColumn("ndcg_ppm",
        org.apache.spark.sql.functions
          .expr("(dcg_units * 1000000) div nullif(idcg_units, 0)"))
  }

  /** DuckDB mirror of [[ndcgAtK]]: same two rank windows, the SAME
    * inlined discount literals as a VALUES spine, same integer floor.
    * `rel` must expose columns (q, score, tie, rel). */
  def ndcgAtKSql(rel: String, qCol: String, scoreCol: String,
                 tieCol: String, relCol: String, k: Int): String = {
    val discRows = dcgDiscountUnits(k).zipWithIndex
      .map { case (d, i) => s"(${i + 1}, ${d})" }.mkString(", ")
    s"""WITH nd_in AS (SELECT $qCol AS q, $scoreCol AS score, $tieCol AS tie,
       |    CAST($relCol AS BIGINT) AS rel FROM $rel),
       |nd_disc AS (SELECT * FROM (VALUES $discRows) d(rnk, d_units)),
       |nd_rk AS (SELECT q, rel,
       |    row_number() OVER (PARTITION BY q ORDER BY score DESC, tie) AS sr,
       |    row_number() OVER (PARTITION BY q ORDER BY rel DESC, tie) AS ir
       |  FROM nd_in),
       |nd_agg AS (SELECT q,
       |    CAST(SUM(CASE WHEN sr <= $k
       |      THEN ((CAST(1 AS BIGINT) << rel) - 1)
       |           * (SELECT d_units FROM nd_disc WHERE rnk = sr)
       |      ELSE 0 END) AS BIGINT) AS dcg_units,
       |    CAST(SUM(CASE WHEN ir <= $k
       |      THEN ((CAST(1 AS BIGINT) << rel) - 1)
       |           * (SELECT d_units FROM nd_disc WHERE rnk = ir)
       |      ELSE 0 END) AS BIGINT) AS idcg_units
       |  FROM nd_rk GROUP BY q)
       |SELECT q, dcg_units, idcg_units,
       |  (dcg_units * 1000000) // NULLIF(idcg_units, 0) AS ndcg_ppm
       |FROM nd_agg""".stripMargin
  }
}
