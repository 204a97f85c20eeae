package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Calendar densification and gap filling for keyed time series — the
 * operation every daily-grain lakehouse table eventually needs (the
 * reference's stock series has per-ticker trading-day gaps: weekends
 * and holidays simply have no row, ingest_stocks.py:52-63; downstream
 * consumers want a continuous daily axis with carried-forward values).
 *
 * Scale shape (100 TB): both fill operators are ONE pass — a single
 * shuffle on the key (the per-key window), then each observation
 * EXPLODES its own gap days (`sequence(d, next_d − 1)` via `lead`):
 *   - no spine join: the previous spine-then-left-join plan shuffled
 *     the DENSE calendar (bigger than the input) through a compound-key
 *     join and scanned `observed` three times (grain probe, span
 *     aggregate, join leg); this plan reads it once and shuffles it
 *     once;
 *   - grain guards (NULL date, duplicate (key, day)) are per-row
 *     `raise_error` branches inside the plan — distributed, zero extra
 *     jobs (the zscore cent-guard pattern), not an eager probe pass;
 *   - fill/interp anchors (`last`/`first` IGNORE NULLS, `lead`) share
 *     one window spec, so Spark evaluates every frame in a single
 *     WindowExec over a single sort; per-key partition size is the
 *     observation count, and the exploded output is bounded by
 *     keys × calendar days exactly as a spine would be.
 * Nothing is collected to the driver and no step is quadratic.
 *
 * Precondition (both fill operators): `observed` has AT MOST ONE row
 * per (keys, dateCol) — duplicate observations would make the filled
 * value order-dependent — and `dateCol` is non-NULL (a NULL date has no
 * place on a calendar axis). Both are enforced in-plan: the sorted
 * window makes equal dates adjacent, so `lead(d) = d` detects every
 * duplicate with no extra pass. Pre-aggregate (e.g. latest-wins or
 * mean per day) upstream if the raw feed can double-report.
 */
object TimeSeries {

  import org.apache.spark.sql.Column
  import org.apache.spark.sql.types.DateType

  /** The calendar axis column with the grain guards embedded: evaluating
    * a NULL date or a date equal to its successor (a duplicate — the
    * window sort makes equal dates adjacent) raises instead of silently
    * producing an order-dependent fill. A per-row branch, not a probe
    * job: the guard costs zero extra scans at any table size. */
  private def guardedDay(dateCol: String, keys: Seq[String], nextD: Column): Column = {
    val d = col(dateCol)
    when(d.isNull,
      raise_error(lit(s"gap fill: observed has NULL $dateCol rows — they have no " +
        "place on a calendar axis; filter or repair them upstream")).cast(DateType))
      .when(nextD === d,
        raise_error(concat(
          lit(s"gap fill: duplicate row per (${(keys :+ dateCol).mkString(", ")}) at "),
          d.cast("string"),
          lit(" — daily-grain uniqueness is required; pre-aggregate " +
            "(latest-wins/mean) upstream"))).cast(DateType))
      .otherwise(d)
  }

  /** One row per (key, calendar day) between each key's own first and
    * last observed date. `dateCol` must be a DateType column. */
  def dailySpine(observed: DataFrame, keys: Seq[String], dateCol: String): DataFrame = {
    val spans = observed.groupBy(keys.map(col): _*)
      .agg(min(col(dateCol)).as("__mn"), max(col(dateCol)).as("__mx"))
    spans.select(
      keys.map(col) :+ explode(sequence(col("__mn"), col("__mx"))).as(dateCol): _*)
  }

  /**
   * Densify `observed` onto its per-key daily calendar and forward-fill
   * each of `valueCols`: missing days get the most recent earlier
   * value (classic as-of carry-forward). For every value column `v` the
   * output keeps the raw (NULL on gap days) column `v` and adds
   * `v_filled`; other non-key columns of `observed` pass through (NULL
   * on gap days), exactly as a spine left-join would surface them. Days
   * before a key's first observation never exist (the axis starts at
   * the key's min date), so filled columns are total.
   *
   * Plan: one window (lead + cumulative last-non-NULL in a single
   * WindowExec), then each observation explodes its own gap days
   * `[d, next_d)` — every generated day's carried value IS the
   * generating row's cumulative fill, so no join and no second scan.
   */
  def gapFillForward(observed: DataFrame, keys: Seq[String], dateCol: String,
                     valueCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val d = col(dateCol)
    val others = observed.columns.filterNot(c => keys.contains(c) || c == dateCol)
    val withW = valueCols.foldLeft(observed.withColumn("__next_d", lead(d, 1).over(w))) {
      (df, v) => df.withColumn(s"__${v}_filled", last(col(v), ignoreNulls = true).over(cum))
    }
    val exploded = withW.withColumn("__day",
      explode(sequence(guardedDay(dateCol, keys, col("__next_d")),
        coalesce(date_sub(col("__next_d"), 1), d))))
    val obsDay = col("__day") === d
    exploded.select(
      keys.map(col) ++
        Seq(col("__day").as(dateCol)) ++
        others.map(c => when(obsDay, col(c)).as(c)) ++
        valueCols.map(v => col(s"__${v}_filled").as(s"${v}_filled")): _*)
  }

  /**
   * Linear interpolation between observations (the other standard gap
   * policy, e.g. for slowly-varying metrics): a gap day's value is the
   * straight line between the previous and next observed values; gaps
   * after the last observation carry the last value forward. Same
   * one-pass plan as [[gapFillForward]]: the four interpolation anchors
   * (previous/next non-NULL value and their dates) are frames of the
   * same window, and each observation explodes its own gap days with
   * those anchors already attached.
   */
  def gapFillInterpolate(observed: DataFrame, keys: Seq[String], dateCol: String,
                         valueCol: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(dateCol))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // strictly-after frame: a gap day sits AFTER its generating
    // observation, so its "next" anchor skips the generating row; on the
    // observed day itself the distinction is moot (a non-NULL value
    // short-circuits to itself, a NULL one is invisible to IGNORE NULLS)
    val fol = w.rowsBetween(1, Window.unboundedFollowing)
    val v = col(valueCol)
    val d = col(dateCol)
    val others = observed.columns.filterNot(c => keys.contains(c) || c == dateCol)
    val withW = observed
      .withColumn("__next_d", lead(d, 1).over(w))
      .withColumn("__prev_v", last(v, ignoreNulls = true).over(cum))
      .withColumn("__prev_vd", last(when(v.isNotNull, d), ignoreNulls = true).over(cum))
      .withColumn("__next_v", first(v, ignoreNulls = true).over(fol))
      .withColumn("__next_vd", first(when(v.isNotNull, d), ignoreNulls = true).over(fol))
    val exploded = withW.withColumn("__day",
      explode(sequence(guardedDay(dateCol, keys, col("__next_d")),
        coalesce(date_sub(col("__next_d"), 1), d))))
    val g = col("__day")
    val vAtDay = when(g === d, v)
    val frac = datediff(g, col("__prev_vd")).cast("double") /
      datediff(col("__next_vd"), col("__prev_vd")).cast("double")
    exploded.select(
      keys.map(col) ++
        Seq(g.as(dateCol)) ++
        others.map(c => when(g === d, col(c)).as(c)) ++
        Seq(when(vAtDay.isNotNull, vAtDay)
          .when(col("__next_v").isNull, col("__prev_v")) // after last observation: carry forward
          .otherwise(col("__prev_v") + (col("__next_v") - col("__prev_v")) * frac)
          .as(s"${valueCol}_interp")): _*)
  }

  /** Per-key z-score anomaly flags: standardize `valueCol` against its
    * key's mean/stddev and flag |z| > `threshold` — the classic
    * outlier screen over metric series (and over document-quality
    * scores when curating a corpus).
    *
    * Determinism contract: the value is re-anchored to integer CENTS
    * (`BIGINT(value·100)` via an exact DECIMAL(18,2) hop — 2-decimal
    * values round-trip double↔decimal losslessly below 2^53/100), so
    * the windowed sums Σx and Σx² are EXACT integer arithmetic —
    * order-independent, no Expand, engine-identical. NOT decimal sums:
    * a decimal→double cast rounds TWICE in engines that store decimals
    * as scaled int128 (int→double, then ÷10^s) vs once through
    * BigDecimal, and Σx² is big enough to expose the ulp; BIGINT→double
    * is a single correctly-rounded conversion everywhere. The float
    * epilogue (mean = S/n, var = Q/n − mean², σ = √max(var,0),
    * z = (x−mean)/σ, all in cent space — z is scale-invariant) is a
    * fixed chain of correctly-rounded IEEE ops (÷, ×, −, √ — unlike
    * ln/exp, which are libm-dependent and banned from oracle paths).
    * σ = 0 with x = mean (constant series) yields z = 0; σ = 0 with
    * x ≠ mean (only reachable when scoring against an external
    * baseline) yields ±∞ so the deviation FLAGS instead of hiding; a
    * NULL x yields NULL z in every branch.
    *
    * Magnitude precondition: Σ(100·v)² per key must fit a BIGINT, i.e.
    * |v|·100·√(rows per key) < 2^63 — holds for any currency-grain
    * series by ~9 orders of magnitude.
    *
    * Scale shape: one window pass per key — no join, no second scan;
    * per-key partition size is the series length. */
  /** The cent re-anchoring shared by every z-score entry point, with a
    * RUNTIME range guard: a value whose DECIMAL(18,2) hop overflows
    * (|v| ≥ ~10^16) would silently become NULL — excluded from mean/σ
    * and scored NULL instead of FLAGGED, the worst failure for an
    * anomaly screen. The guard is a per-row branch inside the existing
    * expression (`raise_error` when the cast NULLs a non-NULL value):
    * distributed, zero extra scans — unlike an eager probe job (the
    * requireDailyGrain lesson), and loud like Graph.prepare's
    * NULL-weight check. Values with >2 decimals round (documented). */
  private def cents(valueCol: String): org.apache.spark.sql.Column = {
    val vc = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast("bigint") // integral by construction → truncate == round
    when(col(valueCol).isNotNull && vc.isNull,
      raise_error(concat(
        lit(s"zscore: $valueCol out of DECIMAL(18,2) cent range (|v| < ~10^16 required): "),
        col(valueCol).cast("string"))).cast("bigint"))
      .otherwise(vc)
  }

  def zscoreAnomalies(series: DataFrame, keys: Seq[String],
                      valueCol: String, threshold: Double = 2.0): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
    val vc = cents(valueCol)
    // n counts NON-NULL values (like the sums): a NULL observation gets
    // a NULL z-score and does not bias its key's mean/σ
    val s = sum(vc).over(w).cast("double")
    val q = sum(vc * vc).over(w).cast("double")
    val n = count(vc).over(w).cast("double")
    val mean = s / n
    val variance = q / n - mean * mean
    val sd = sqrt(greatest(variance, lit(0.0)))
    series
      .withColumn("zscore", zEpilogue(vc.cast("double"), mean, sd))
      .withColumn("is_anomaly", abs(col("zscore")) > threshold)
  }

  /** The shared scoring epilogue (see [[zscoreAnomalies]] scaladoc for
    * the σ=0 and NULL semantics). `signum(x−mean)·∞` in the σ=0 branch
    * keeps NULL propagation for free (signum(NULL) is NULL) while any
    * real deviation from a zero-variance baseline scores ±∞ — the
    * previous blanket z=0 there silently passed the most extreme
    * possible anomalies when the baseline was external. */
  private def zEpilogue(xd: org.apache.spark.sql.Column,
                        mean: org.apache.spark.sql.Column,
                        sd: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(sd === 0.0,
      when(xd === mean, lit(0.0))
        .otherwise(signum(xd - mean) * lit(Double.PositiveInfinity)))
      .otherwise((xd - mean) / sd)

  /** Per-key baseline statistics `(keys…, mean_c, sd_c)` in CENT space,
    * computed with the identical exact-integer chain as
    * [[zscoreAnomalies]] (groupBy instead of window) — the static side
    * of a stream-static anomaly screen
    * ([[graft.streaming.StreamOps.anomalyStream]]): train the baseline
    * on history once, broadcast it onto live events. */
  def zscoreBaseline(series: DataFrame, keys: Seq[String],
                     valueCol: String): DataFrame = {
    val vc = cents(valueCol)
    series.groupBy(keys.map(col): _*)
      .agg(sum(vc).cast("double").as("__s"), sum(vc * vc).cast("double").as("__q"),
        count(vc).cast("double").as("__n"))
      .select(keys.map(col) :+
        (col("__s") / col("__n")).as("mean_c") :+
        sqrt(greatest(col("__q") / col("__n")
          - (col("__s") / col("__n")) * (col("__s") / col("__n")), lit(0.0))).as("sd_c"): _*)
  }

  /** Score `valueCol` against a [[zscoreBaseline]]'s cent-space
    * `mean_c`/`sd_c` columns — the identical epilogue zscoreAnomalies
    * applies, exposed so stream and batch share one definition. Rows
    * with no baseline (NULL stats) get NULL scores; a value deviating
    * from a ZERO-VARIANCE baseline scores ±∞ and flags (the most
    * extreme anomaly there is — a blanket z=0 would hide it). */
  def zscoreAgainst(df: DataFrame, valueCol: String,
                    threshold: Double = 2.0): DataFrame = {
    val vc = cents(valueCol)
    df.withColumn("zscore", zEpilogue(vc.cast("double"), col("mean_c"), col("sd_c")))
      .withColumn("is_anomaly", abs(col("zscore")) > threshold)
  }

  /** DuckDB SQL mirror of [[zscoreAnomalies]]'s arithmetic over a
    * window alias `w` — keep the op chain in lockstep with the Scala. */
  def zscoreSql(valueCol: String): (String, String) = {
    val vc = s"CAST(CAST($valueCol AS DECIMAL(18,2)) * 100 AS BIGINT)"
    val s = s"CAST(SUM($vc) OVER w AS DOUBLE)"
    val q = s"CAST(SUM($vc * $vc) OVER w AS DOUBLE)"
    val n = s"CAST(COUNT($vc) OVER w AS DOUBLE)"
    val mean = s"(($s) / ($n))"
    val variance = s"(($q) / ($n) - $mean * $mean)"
    val sd = s"sqrt(GREATEST($variance, 0.0))"
    val xd = s"CAST($vc AS DOUBLE)"
    // mirror of zEpilogue: within one window sd = 0 implies every
    // non-NULL x equals mean, so the ±∞ branch is unreachable here —
    // but the CASE shape stays in lockstep with the Scala
    val z = s"""CASE WHEN $sd = 0.0 THEN
               |  CASE WHEN $xd = $mean THEN 0.0
               |       ELSE sign($xd - $mean) * CAST('infinity' AS DOUBLE) END
               |ELSE ($xd - $mean) / $sd END""".stripMargin
    (z, sd)
  }

  /** RANGE-frame ordering column for the trailing-feature family, with
    * the NULL-date guard in-plan (the gap-fill pattern): a NULL
    * ordering value would silently group with other NULLs into a
    * nonsense frame instead of failing. */
  private def guardedEpochDay(dateCol: String): Column = {
    val d = datediff(col(dateCol), lit(java.sql.Date.valueOf("1970-01-01")))
    when(col(dateCol).isNull,
      raise_error(lit(s"trailing features: NULL $dateCol — a calendar frame " +
        "needs a date; filter or repair upstream")).cast("int"))
      .otherwise(d)
  }

  /**
   * Trailing distinct-count features — "distinct parts ordered in the
   * last 7/30 calendar days as of each transaction": the companion of
   * [[trailingFeatures]] for breadth-of-activity signals (distinct
   * counterparties, SKUs, source domains), which sums cannot express.
   * Emits `<valueCol>_nd_<h>d` per horizon. Input is transaction-grain
   * (no daily-uniqueness requirement); RANGE frames include same-day
   * peers in both engines.
   *
   * Shape: same single-WindowExec pattern as [[trailingFeatures]] (all
   * horizons in one select over one epoch-day window). Exact windowed
   * COUNT DISTINCT inherently carries the frame's value set per key
   * (`collect_set` over the RANGE frame) — state is bounded by a key's
   * distinct values inside the widest horizon, which is the operator's
   * honest cost; for horizons where that set no longer fits, swap the
   * set for an HLL sketch and accept the estimate (the
   * [[Profile.profileApprox]] trade, documented not silently made).
   */
  def trailingDistinct(tx: DataFrame, keys: Seq[String], dateCol: String,
                       valueCol: String, horizons: Seq[Int]): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 1),
      s"trailingDistinct: horizons must be >= 1 days, got $horizons")
    val ord = "__td_epoch_day"
    val withOrd = tx.withColumn(ord, guardedEpochDay(dateCol))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord))
    val feats = horizons.map { h =>
      size(collect_set(col(valueCol)).over(w.rangeBetween(-(h - 1L), Window.currentRow)))
        .as(s"${valueCol}_nd_${h}d")
    }
    withOrd.select(tx.columns.map(col) ++ feats: _*)
  }

  /**
   * OHLC bar resampling — the financial-series downsample the
   * reference's domain implies but its gold model approximates
   * (monthly_stock_summary.sql:12-18 keeps avg/max/min and loses true
   * open/close semantics): per key and calendar bucket, `open` is the
   * value at the EARLIEST observation in the bucket, `close` at the
   * LATEST, high/low/volume as plain extreme/sum aggregates, plus the
   * bar count. ONE keyed aggregate — `min_by`/`max_by` carry the
   * (order, value) pair through map-side partials, so there is no
   * window over the raw series, no self-join, no second scan; state
   * per group is O(1) and output cardinality is keys × buckets at any
   * input size. Volume sums via [[graft.Det.dsum]] (exact decimal
   * addition — order-independent for double inputs too).
   *
   * Grain contract: at most one bar per (keys, dateCol) — the daily-
   * bar invariant silverDaily guarantees by construction; with
   * duplicate timestamps `min_by`/`max_by` ties would be
   * plan-dependent. Output: `(keys…, bucket_start, open, high, low,
   * close, volume, n_bars)`.
   */
  def resampleOhlc(bars: DataFrame, keys: Seq[String], dateCol: String,
                   openCol: String, highCol: String, lowCol: String,
                   closeCol: String, volumeCol: String,
                   unit: String = "month"): DataFrame = {
    require(Seq("week", "month", "quarter", "year").contains(unit),
      s"resampleOhlc: unit must be week/month/quarter/year, got $unit")
    import org.apache.spark.sql.types.DateType
    bars.groupBy(keys.map(col) :+
        date_trunc(unit, col(dateCol)).cast(DateType).as("bucket_start"): _*)
      .agg(
        min_by(col(openCol), col(dateCol)).as("open"),
        max(col(highCol)).as("high"),
        min(col(lowCol)).as("low"),
        max_by(col(closeCol), col(dateCol)).as("close"),
        graft.Det.dsum(col(volumeCol)).as("volume"),
        count(lit(1)).as("n_bars"))
  }

  /**
   * Per-key Pearson correlation between two metric columns, exact and
   * engine-identical — `corr()` itself is banned from oracle paths
   * because both engines fold it with order-dependent floating-point
   * partials. Here every sufficient statistic (n, Σx, Σy, Σx², Σy²,
   * Σxy) is EXACT in cent space (same DECIMAL(18,2) hop and loud
   * range guard as [[zscoreAnomalies]]): the products and sums run as
   * DECIMAL(38,0) — integer arithmetic, order-independent, and wide
   * enough that cent values near the 10^18 guard ceiling cannot wrap
   * (a BIGINT accumulator would: 10^18² = 10^36 ≫ 2^63; decimal
   * overflow past 10^38 NULLs loudly under the epilogue's NULL
   * propagation instead of silently wrapping). One keyed aggregate
   * with map-side decimal partials; the epilogue
   * `r = (n·Σxy − ΣxΣy) / (√(n·Σx² − Σx²)·√(n·Σy² − Σy²))`
   * is a fixed chain of correctly-rounded IEEE ops on those exact
   * integers (the decimal→double conversion is the same
   * round-to-nearest in every engine; the cent scale cancels
   * algebraically). Rows where either side is NULL drop out of every
   * statistic. Constant series (zero variance) and empty keys yield
   * NULL, never NaN/±Inf. Output: `(keys…, n_pairs, corr)`.
   */
  def pearsonByKey(df: DataFrame, keys: Seq[String],
                   xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val vx = when(both, cents(xCol)).cast(dec)
    val vy = when(both, cents(yCol)).cast(dec)
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(when(both, lit(1))).as("n_pairs"),
      sum(vx).as("__sx"), sum(vy).as("__sy"),
      sum(vx * vy).as("__sxy"),
      sum(vx * vx).as("__sxx"), sum(vy * vy).as("__syy"))
    val n = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val varx = n * d("__sxx") - d("__sx") * d("__sx")
    val vary = n * d("__syy") - d("__sy") * d("__sy")
    val den = sqrt(greatest(varx, lit(0.0))) * sqrt(greatest(vary, lit(0.0)))
    agg.withColumn("corr",
      when(col("n_pairs") === 0 || den === 0.0, lit(null).cast("double"))
        .otherwise(num / den))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** DuckDB mirror of [[pearsonByKey]]'s statistic + epilogue for two
    * pre-centified BIGINT columns `cx`, `cy` (rows already pair-
    * filtered): SELECT-list fragments for the aggregate CTE. */
  def pearsonSql(cx: String, cy: String): String =
    s"""CAST(COUNT(*) AS BIGINT) AS n_pairs,
       |CAST(SUM($cx) AS BIGINT) AS sx, CAST(SUM($cy) AS BIGINT) AS sy,
       |CAST(SUM($cx * $cx) AS BIGINT) AS sxx,
       |CAST(SUM($cy * $cy) AS BIGINT) AS syy,
       |CAST(SUM($cx * $cy) AS BIGINT) AS sxy""".stripMargin

  /**
   * Multi-horizon trailing features — the standard ML feature-
   * engineering sweep ("trailing 7/30/90-day spend, count, mean per
   * entity as of each activity date"): for every row of the daily-grain
   * input and every horizon `h`, the SUM and COUNT of `valueCol` over
   * the trailing `h`-day CALENDAR window (current day inclusive), as
   * `<valueCol>_sum_<h>d` / `<valueCol>_cnt_<h>d` / `<valueCol>_avg_<h>d`.
   *
   * Calendar semantics, not row counts: the frame is a RANGE over epoch
   * days, so a key with gaps still gets "last 7 calendar days", not
   * "last 7 observations" — the distinction that makes backfilled
   * features match what a point-in-time serving store would return.
   *
   * Scale shape: ALL horizons share one window spec (same partition
   * keys, same epoch-day ordering) and differ only in frame bounds, so
   * Spark evaluates every horizon in a SINGLE WindowExec over a single
   * shuffle+sort of the input — K horizons cost one pass, not K. Each
   * trailing RANGE frame advances two pointers monotonically per
   * partition (no per-row rescan). Per-key partition size is the key's
   * observation count; nothing is collected or joined.
   *
   * Determinism: sums run in DECIMAL(18,2) (exact, order-independent)
   * and surface as one correctly-rounded DOUBLE; the mean is a single
   * IEEE division — both engines agree bit-for-bit.
   */
  def trailingFeatures(daily: DataFrame, keys: Seq[String], dateCol: String,
                       valueCol: String, horizons: Seq[Int]): DataFrame = {
    require(horizons.nonEmpty && horizons.forall(_ >= 1),
      s"trailingFeatures: horizons must be >= 1 days, got $horizons")
    // every window expression lands in ONE select over a pre-computed
    // ordering column — chained withColumns would stack one Window node
    // (plus a re-sort) per call and defeat CollapseWindow; this shape
    // plan-collapses to a single WindowExec (spec-asserted)
    val ord = "__tf_epoch_day"
    val withOrd = daily.withColumn(ord, guardedEpochDay(dateCol))
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(ord))
    val dec = col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2))
    val feats = horizons.flatMap { h =>
      val frame = w.rangeBetween(-(h - 1L), Window.currentRow)
      Seq(sum(dec).over(frame).cast("double").as(s"${valueCol}_sum_${h}d"),
        count(col(valueCol)).over(frame).as(s"${valueCol}_cnt_${h}d"))
    }
    val base = withOrd.select(daily.columns.map(col) ++ feats: _*)
    // means divide the two already-computed columns — a pure projection,
    // not a third window function per horizon
    horizons.foldLeft(base) { (df, h) =>
      df.withColumn(s"${valueCol}_avg_${h}d",
        col(s"${valueCol}_sum_${h}d") / col(s"${valueCol}_cnt_${h}d"))
    }
  }

  /** ROBUST (median/MAD) anomaly flags — the outlier screen that
    * survives its own outliers: [[zscoreAnomalies]]'s mean and σ are
    * dragged by the very extremes being hunted, while the median and
    * the median-absolute-deviation have a 50% breakdown point. Score =
    * 0.6745·(v − median)/MAD (the Iglewicz–Hoaglin modified z-score;
    * flag |rz| > threshold, conventionally 3.5). Both the median and
    * the MAD come from [[Profile.binnedQuantiles]] — bounded state
    * (keys × bins) at any input size, never a per-key sort — so the
    * whole screen is two keyed bin aggregates + two joins of the tiny
    * per-key band tables. MAD = 0 (over half the values identical)
    * scores 0 at the median and ±∞ off it, so deviations FLAG instead
    * of hiding; values must be non-negative at the given cent grain
    * (binnedQuantiles' contract). */
  def robustZscoreAnomalies(series: DataFrame, keys: Seq[String], valueCol: String,
                            binWidthCents: Long, threshold: Double = 3.5): DataFrame = {
    val p50 = Profile.quantileColName(0.5)
    val med = Profile.binnedQuantiles(series, keys, valueCol, binWidthCents, Seq(0.5))
      .withColumnRenamed(p50, "med")
    val vD = col(valueCol).cast("double")
    val dev = series.join(med, keys)
      .withColumn("__adev", abs(vD - col("med")))
    val mad = Profile.binnedQuantiles(dev, keys, "__adev", binWidthCents, Seq(0.5))
      .withColumnRenamed(p50, "mad")
    val rz = when(col("mad") === 0.0,
      when(vD === col("med"), lit(0.0))
        .otherwise(signum(vD - col("med")) * lit(Double.PositiveInfinity)))
      .otherwise(lit(0.6745) * (vD - col("med")) / col("mad"))
    dev.join(mad, keys)
      .withColumn("rz", rz)
      .withColumn("is_anomaly", abs(col("rz")) > threshold)
      .drop("__adev")
  }

  /** Day-of-week seasonal baseline + anomaly flags over a per-key daily
    * series: each observation is compared to the mean of its key's SAME
    * WEEKDAY — the screen that catches "this Tuesday is broken" where a
    * flat [[zscoreAnomalies]] mean would hide it under the weekly cycle
    * (weekend troughs would flag every Saturday instead).
    *
    * `season` is `(epoch_days mod 7)` — pure date arithmetic, not the
    * engine-varying DAYOFWEEK() (Spark counts Sunday=1, DuckDB
    * Sunday=0). Determinism: `valueCol` must be an exact DECIMAL (the
    * caller's aggregate makes it so via [[graft.Det.dsum]]); the
    * seasonal sum stays decimal (order-independent exact), and the
    * float epilogue (baseline = Σ/n, dev = v − baseline, flag =
    * 2·|dev| > baseline) is a fixed chain of correctly-rounded IEEE
    * ops. Scale shape: ONE window pass partitioned by (key, season) —
    * no join, no second scan; at 100 TB the partition count is
    * |keys|·7, each holding one value per calendar day. */
  def seasonalAnomalies(daily: DataFrame, keys: Seq[String], dateCol: String,
                        valueCol: String): DataFrame = {
    val season = pmod(
      datediff(col(dateCol), lit("1970-01-01").cast(org.apache.spark.sql.types.DateType)),
      lit(7)).cast("bigint")
    val withS = daily.withColumn("season", season)
    val w = Window.partitionBy((keys.map(col) :+ col("season")): _*)
    val vD = col(valueCol).cast("double")
    val baseline = sum(col(valueCol)).over(w).cast("double") /
      count(col(valueCol)).over(w).cast("double")
    withS
      .withColumn("baseline", baseline)
      .withColumn("deviation", vD - col("baseline"))
      .withColumn("is_anomaly", abs(col("deviation")) * 2.0 > col("baseline"))
  }

  /** DuckDB mirror of [[seasonalAnomalies]]'s derived columns, given a
    * relation with `$keys, $dateCol, $valueCol` (decimal). Returns the
    * SELECT-list fragment after the caller's key/date/value columns. */
  def seasonalSql(dateCol: String, valueCol: String, partitionKeys: String): String =
    s"""((datediff('day', DATE '1970-01-01', $dateCol) % 7 + 7) % 7) AS season,
       |CAST(SUM($valueCol) OVER (PARTITION BY $partitionKeys,
       |       ((datediff('day', DATE '1970-01-01', $dateCol) % 7 + 7) % 7)) AS DOUBLE)
       |  / CAST(COUNT($valueCol) OVER (PARTITION BY $partitionKeys,
       |       ((datediff('day', DATE '1970-01-01', $dateCol) % 7 + 7) % 7)) AS DOUBLE) AS baseline""".stripMargin

  /**
   * Exponentially-weighted moving average at α = 1/2, engine-EXACT:
   * each step is `s ← (x + s)/2` — one correctly-rounded IEEE addition
   * and one exact halving — so any engine folding the same ordered
   * series produces bit-identical doubles, where a general-α EWMA
   * multiplies by non-dyadic weights and drifts ulps between libms.
   * Evaluated at `checkpoints` evenly-spaced prefix lengths per key
   * (each an O(prefix) left fold over the key's time-sorted series);
   * the per-key collected array is the operator's state — the same
   * bounded-series contract as the trailing-feature frames, with the
   * documented chunked-fold escape when a key's history outgrows one
   * task. Output: `(keys…, idx, ewma)`, deduped where short series
   * collapse checkpoints.
   */
  def ewmaHalf(df: DataFrame, keys: Seq[String], orderCol: String,
               valueCol: String, checkpoints: Int): DataFrame = {
    require(checkpoints >= 1, s"ewmaHalf: checkpoints must be >= 1, got $checkpoints")
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__s"))
      .select(keys.map(col) :+ transform(col("__s"), s => s("v")).as("__v"): _*)
    val cps = transform(sequence(lit(1), lit(checkpoints)), c => {
      val idx = greatest(
        floor(size(col("__v")) * c / lit(checkpoints)).cast("int"), lit(1))
      struct(idx.cast("long").as("idx"),
        aggregate(slice(col("__v"), lit(2), idx - 1),
          element_at(col("__v"), 1),
          (acc, x) => (x + acc) / lit(2.0)).as("ewma"))
    })
    sorted.filter(size(col("__v")) > 0)
      .select(keys.map(col) :+ explode(cps).as("__c"): _*)
      .select(keys.map(col) :+ col("__c.idx").as("idx") :+ col("__c.ewma").as("ewma"): _*)
      .dropDuplicates(keys :+ "idx")
  }

  /** Holt's linear (double-exponential) smoothing with α = β = 1/2 —
    * the trend-aware forecaster one step up from [[ewmaHalf]]:
    * `l_t = (x_t + (l + b))/2`, `b_t = ((l_t − l) + b)/2`, initialized
    * `l₁ = x₁, b₁ = 0`. The ½ coefficients keep every update to
    * adds/subtracts and one exact halving (correctly-rounded IEEE ops,
    * bit-identical in any engine) — the same determinism argument as
    * ewmaHalf, extended to a two-component state carried as a struct
    * through the ordered fold (Spark `aggregate` with a named_struct
    * accumulator ↔ DuckDB `list_reduce` over struct_pack elements).
    *
    * Scale shape: one groupBy collects each key's series (bounded by
    * series length, the same contract as every per-key fold here);
    * the recurrence is inherently sequential per key, so a fold IS the
    * minimal computation — no window tricks buy parallelism inside one
    * key. Returns `(keys..., n, level, trend, forecast)` where
    * forecast = level + trend (the one-step-ahead prediction). */
  def holtHalf(df: DataFrame, keys: Seq[String], orderCol: String,
               valueCol: String): DataFrame = {
    val sorted = df
      .filter(col(valueCol).isNotNull)
      .groupBy(keys.map(col): _*)
      .agg(array_sort(collect_list(struct(col(orderCol).as("o"),
        col(valueCol).cast("double").as("v")))).as("__s"))
      .select(keys.map(col) :+ transform(col("__s"), s => s("v")).as("__v"): _*)
    sorted.filter(size(col("__v")) > 0)
      .withColumn("__st", expr(
        """aggregate(
          |  slice(__v, 2, size(__v) - 1),
          |  named_struct('l', CAST(element_at(__v, 1) AS DOUBLE),
          |               'b', CAST(0.0 AS DOUBLE)),
          |  (a, x) -> named_struct(
          |    'l', (x + (a.l + a.b)) / 2.0D,
          |    'b', (((x + (a.l + a.b)) / 2.0D - a.l) + a.b) / 2.0D))""".stripMargin))
      .select(keys.map(col)
        :+ size(col("__v")).cast("long").as("n")
        :+ col("__st.l").as("level")
        :+ col("__st.b").as("trend")
        :+ (col("__st.l") + col("__st.b")).as("forecast"): _*)
  }

  /** Single change-point detection per key via the cumulative-deviation
    * statistic (CUSUM / binary-segmentation level one): on the ordered
    * series x_1..x_n, the candidate split after t scores
    * `S_t = n·Σ_{i≤t} x_i − t·Σ x_i` — n·count-scaled cumulative
    * deviation from the global mean, i.e. the classic Σ(x_i − x̄)
    * statistic cleared of division. The change point is the argmax of
    * |S_t| (earliest date on ties, never the last row — a split after
    * x_n is no split). The mean shift itself is reported as the exact
    * sufficient statistics (n/Σ before and after) rather than the two
    * means, so every output column is exact integer arithmetic
    * (DECIMAL(38,0) — n·cum products overflow BIGINT once
    * n·Σ|cents| > 2^63, which a 100 TB series reaches).
    *
    * Input must be an aggregated series (one row per (key, order))
    * with an exact integer value column (cents). Scale shape: ONE
    * shuffle on the key; the per-key cumsum/count/total all ride a
    * single WindowExec (unbounded frames over the same partition
    * order), and the argmax is a second frame over the same
    * partitioning — no joins, no collect. */
  def changePoint(series: DataFrame, keys: Seq[String], orderCol: String,
                  valueCentsCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(orderCol))
    val whole = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val scored = series
      .withColumn("__t", row_number().over(w).cast(dec))
      .withColumn("__cum", sum(col(valueCentsCol)).over(w).cast(dec))
      .withColumn("__n", count(lit(1)).over(whole).cast(dec))
      .withColumn("__tot", sum(col(valueCentsCol)).over(whole).cast(dec))
      .withColumn("__s", col("__n") * col("__cum") - col("__t") * col("__tot"))
      .filter(col("__t") < col("__n")) // a split after the last row is no split
    val best = Window.partitionBy(keys.map(col): _*)
      .orderBy(abs(col("__s")).desc, col(orderCol))
    scored
      .withColumn("__rn", row_number().over(best))
      .filter(col("__rn") === 1)
      .select(keys.map(col) ++ Seq(
        col(orderCol).as("cp_at"),
        // exact decimal internally; ONE correctly-rounded conversion out
        // (a DECIMAL(38,0) output column would hash engine-differently)
        abs(col("__s")).cast("double").as("cusum_abs"),
        col("__t").cast("bigint").as("n_before"),
        col("__cum").cast("bigint").as("sum_before_cents"),
        (col("__n") - col("__t")).cast("bigint").as("n_after"),
        (col("__tot") - col("__cum")).cast("bigint").as("sum_after_cents")): _*)
  }

  /**
   * Autocorrelation function (ACF) of an ordered series at lags
   * 1..maxLag: Pearson correlation between the series and its own
   * k-step-lagged copy, one row per lag — the standard seasonality /
   * momentum probe before fitting any forecasting model.
   *
   * The input is an already-aggregated series (e.g. one row per day),
   * so the single-partition window over `orderCol` is bounded by the
   * date span, not the fact-table size — same posture as the other
   * series epilogues here ([[changePoint]], gap-fill): the heavy
   * reduction happened upstream in a keyed aggregate. All lags come
   * from ONE WindowExec (one sort), stacked to rows, and the per-lag
   * statistics ride [[pearsonByKey]]'s exact integer accumulators.
   */
  def autocorr(series: DataFrame, orderCol: String, valueCol: String,
               maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"autocorr: maxLag must be >= 1, got $maxLag")
    val w = Window.orderBy(col(orderCol))
    val lagged = series.select(
      col(orderCol) +: col(valueCol).as("__x") +:
        (1 to maxLag).map(k => lag(col(valueCol), k).over(w).as(s"__y$k")): _*)
    val stacked = lagged.select(expr(
      s"stack($maxLag, ${(1 to maxLag).map(k => s"$k, __x, __y$k").mkString(", ")}) AS (lag, x, y)"))
    pearsonByKey(stacked, Seq("lag"), "x", "y")
  }

  /**
   * MAD robust outlier flagging per key: flags series points where
   * |v − median| > k·MAD, with median = lower median of v and MAD =
   * lower median of |v − median| (median absolute deviation — 50%
   * breakdown where mean±3σ moves with the very outliers it hunts).
   * Input is a PRE-AGGREGATED series with integral `valueCol` (the
   * [[autocorr]]/[[theilSenSlope]] posture: per-key length is a
   * bounded span, so the two per-key rank windows sort bounded
   * series, never the fact table).
   *
   * Every quantity is an exact integer — lower medians are REAL
   * elements, deviations are |int − int|, and the flag compares
   * `|v−med| > k·MAD` in integers. No doubles anywhere: the result is
   * bit-free of FP, deterministic in any engine. A zero-MAD key
   * (>50% of points share one value) flags every deviating point —
   * the standard MAD caveat, inherited deliberately.
   */
  def madOutliers(series: DataFrame, keys: Seq[String], orderCol: String,
                  valueCol: String, k: Int): DataFrame = {
    val kcols = keys.map(col)
    val x = series.select(kcols :+ col(orderCol).cast("long").as("t") :+
      col(valueCol).cast("long").as("v"): _*)
    def lowerMedian(df: DataFrame, vCol: String, out: String) = {
      val w = Window.partitionBy(kcols: _*).orderBy(col(vCol), col("t"))
      df.withColumn("__rn", row_number().over(w))
        .withColumn("__n", count(lit(1)).over(Window.partitionBy(kcols: _*)))
        .filter(col("__rn") === expr("(__n + 1) div 2"))
        .select(kcols :+ col(vCol).as(out): _*)
    }
    val med = lowerMedian(x, "v", "med")
    val dev = x.join(med, keys).withColumn("absdev", abs(col("v") - col("med")))
    val mad = lowerMedian(dev.withColumnRenamed("absdev", "ad"), "ad", "mad")
    dev.join(mad, keys)
      .filter(col("absdev") > lit(k) * col("mad"))
      .select(kcols ++ Seq(col("t"), col("v"), col("med"), col("mad"),
        col("absdev")): _*)
  }

  /**
   * Theil–Sen robust trend per key: the LOWER MEDIAN of all pairwise
   * slopes `(y_j − y_i)/(t_j − t_i)`, the rank-based slope estimator
   * with 29% breakdown where OLS ([[linregByKey]]) breaks on one wild
   * outlier. Input must be a PRE-AGGREGATED series (one row per
   * (keys, `orderCol`), integral `valueCol`) — the pair enumeration is
   * O(len²) per key in the SERIES length (date span), never the fact
   * table, the same bounded-span posture as [[autocorr]]; callers
   * bound the span (e.g. one year) explicitly.
   *
   * Determinism: each slope is ONE correctly-rounded division of exact
   * integers — engine-identical doubles; the estimator is the lower
   * median (the element at index ⌊(n+1)/2⌋ of the total order
   * (slope, t_i, t_j)), a REAL pair's slope — never an interpolated
   * midpoint, whose `(a+b)/2` vs `0.5a+0.5b` arities differ across
   * engines by one ulp. Returned with the anchor pair that produced
   * it, so the answer is auditable.
   */
  /**
   * ROLLING MEDIAN filter per key — the median of the trailing
   * `window` points at each step: the standard despiking filter (a
   * rolling MEAN drags toward the very spike it should reject; the
   * median ignores up to half the window). Lower-median convention so
   * every output is a REAL series element, exact in integers: Spark
   * sorts the trailing `collect_list` (bounded by `window`, ≤ 64
   * enforced) and picks element ⌈n/2⌉; DuckDB's windowed
   * `quantile_disc(v, 0.5)` picks the identical element (probed:
   * floor(0.5·(n−1)) 0-based = ⌈n/2⌉ 1-based). Partial head windows
   * compute over the rows available — same in both engines. Input is
   * the PRE-AGGREGATED series ([[madOutliers]] posture).
   */
  def rollingMedian(series: DataFrame, keys: Seq[String], orderCol: String,
                    valueCol: String, window: Int): DataFrame = {
    require(window >= 2 && window <= 64,
      s"rollingMedian: window in [2, 64], got $window")
    val kcols = keys.map(col)
    val w = Window.partitionBy(kcols: _*).orderBy(orderCol)
      .rowsBetween(-(window - 1), Window.currentRow)
    series.select(kcols :+ col(orderCol).cast("long").as("t") :+
        col(valueCol).cast("long").as("v"): _*)
      .withColumn("__arr", sort_array(collect_list("v").over(
        Window.partitionBy(kcols: _*).orderBy("t")
          .rowsBetween(-(window - 1), Window.currentRow))))
      .select(kcols ++ Seq(col("t"), col("v"),
        element_at(col("__arr"), ((size(col("__arr")) + 1) / 2)
          .cast("int")).as("roll_median")): _*)
  }

  /** DuckDB mirror of [[rollingMedian]] — windowed quantile_disc. */
  def rollingMedianSql(rel: String, keys: Seq[String], orderCol: String,
                       valueCol: String, window: Int): String = {
    val ks = keys.mkString(", ")
    s"""SELECT $ks, CAST($orderCol AS BIGINT) AS t, CAST($valueCol AS BIGINT) AS v,
       |  quantile_disc(CAST($valueCol AS BIGINT), 0.5) OVER (
       |    PARTITION BY $ks ORDER BY $orderCol
       |    ROWS BETWEEN ${window - 1} PRECEDING AND CURRENT ROW) AS roll_median
       |FROM $rel""".stripMargin
  }

  /**
   * Business days (Mon–Fri) in the half-open span [d1, d2) — the SLA /
   * lead-time calendar arithmetic every ops dashboard needs, as a pure
   * closed-form integer expression (no calendar table, no explode, no
   * UDF: stays inside whole-stage codegen). With anchor Monday
   * 1970-01-05 and e = days(d) − days(anchor):
   * B(e) = (e div 7)·5 + least(e mod 7, 5) counts business days in
   * [anchor, d); the span is B(e2) − B(e1). Weekend-start spans and
   * multi-week spans fall out of the same formula — no cases.
   *
   * PRECONDITION: both dates ≥ 1970-01-05 (truncating div/mod equal
   * floor semantics only for non-negative e; TPC-H-era data is 1992+).
   * d2 < d1 yields the negative of the reversed span — well-defined.
   */
  def busdays(d1: org.apache.spark.sql.Column,
              d2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    def b(d: org.apache.spark.sql.Column) = {
      val e = datediff(d, to_date(lit("1970-01-05")))
      // floor(e/7) in double is exact for e ≤ 2^52 (correctly-rounded
      // division can't cross an integer boundary); `/` on longs would
      // be true division and `div` needs expr-string plumbing
      floor(e / lit(7.0)).cast("long") * 5 + least(e % 7, lit(5)).cast("long")
    }
    b(d2) - b(d1)
  }

  /** DuckDB mirror of [[busdays]] — an expression fragment over date
    * expressions `d1`/`d2`, same anchor and closed form. */
  def busdaysSql(d1: String, d2: String): String = {
    def b(d: String) =
      s"((date_diff('day', DATE '1970-01-05', $d) // 7) * 5 + " +
        s"LEAST(date_diff('day', DATE '1970-01-05', $d) % 7, 5))"
    s"(${b(d2)} - ${b(d1)})"
  }

  def theilSenSlope(series: DataFrame, keys: Seq[String],
                    orderCol: String, valueCol: String): DataFrame = {
    val kcols = keys.map(col)
    val x = series.select(kcols :+ col(orderCol).cast("long").as("__t") :+
      col(valueCol).cast("long").as("__v"): _*)
    val y = x.select(kcols :+ col("__t").as("__t2") :+ col("__v").as("__v2"): _*)
    val pairs = x.join(y, keys).filter(col("__t") < col("__t2"))
      .select(kcols :+ col("__t") :+ col("__t2") :+
        ((col("__v2") - col("__v")).cast("double") /
          (col("__t2") - col("__t")).cast("double")).as("slope"): _*)
    val w = Window.partitionBy(kcols: _*)
      .orderBy(col("slope"), col("__t"), col("__t2"))
    pairs
      .withColumn("__rn", row_number().over(w))
      .withColumn("n_pairs", count(lit(1)).over(Window.partitionBy(kcols: _*)))
      .filter(col("__rn") === expr("(n_pairs + 1) div 2"))
      .select(kcols ++ Seq(col("n_pairs"), col("slope").as("ts_slope"),
        col("__t").as("anchor_t1"), col("__t2").as("anchor_t2")): _*)
  }

  /**
   * Ordinary-least-squares simple regression per key — slope and
   * intercept of `y ~ x` from the SAME exact integer sufficient
   * statistics as [[pearsonByKey]] (cent-anchored DECIMAL(38,0)
   * accumulators): `slope = (nΣxy−ΣxΣy)/(nΣxx−(Σx)²)`, intercept from
   * the means. The cent scale cancels in the slope (cents/cents); the
   * intercept converts back to value units with one literal /100.
   * Degenerate x (zero variance) or empty keys yield NULL, never
   * NaN/∞. One keyed aggregate; epilogue is a fixed chain of
   * correctly-rounded IEEE ops mirrored in [[pearsonSql]]-style SQL.
   */
  def linregByKey(df: DataFrame, keys: Seq[String],
                  xCol: String, yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val both = col(xCol).isNotNull && col(yCol).isNotNull
    val vx = when(both, cents(xCol)).cast(dec)
    val vy = when(both, cents(yCol)).cast(dec)
    val agg = df.groupBy(keys.map(col): _*).agg(
      count(when(both, lit(1))).as("n_pairs"),
      sum(vx).as("__sx"), sum(vy).as("__sy"),
      sum(vx * vy).as("__sxy"), sum(vx * vx).as("__sxx"))
    val n = col("n_pairs").cast("double")
    def d(c: String) = col(c).cast("double")
    val num = n * d("__sxy") - d("__sx") * d("__sy")
    val varx = n * d("__sxx") - d("__sx") * d("__sx")
    agg
      .withColumn("slope",
        when(col("n_pairs") === 0 || varx === 0.0, lit(null).cast("double"))
          .otherwise(num / varx))
      .withColumn("intercept",
        (d("__sy") - col("slope") * d("__sx")) / n / 100.0)
      .drop("__sx", "__sy", "__sxy", "__sxx")
  }

  /**
   * Classical additive decomposition of a daily series with weekly
   * seasonality: `value = trend + season(weekday) + residual`, where
   * trend is the 7-row centered moving average and season is the mean
   * detrended value per weekday — the pre-model decomposition every
   * forecasting pipeline starts from.
   *
   * Exactness: `value` must be integral (counts, integer quantities).
   * The detrended numerator `7·v − Σ₇` stays in BIGINT, so the weekday
   * season means are single correctly-rounded divisions of exact
   * integer sums — partition- and engine-invariant (no mean-of-doubles
   * order dependence). Weekday = epoch-days mod 7 (engine-neutral —
   * DAYOFWEEK numbers Sunday differently per engine, the ts_seasonal
   * lesson). The ±3-ROW window runs over OBSERVED days in date order
   * (index-based; calendar gaps are the caller's concern), is bounded
   * by the date span like [[autocorr]], and edge rows (incomplete
   * window) emit NULL trend/residual rather than a biased average.
   */
  def decomposeWeekly(daily: DataFrame, dateCol: String, valueCol: String): DataFrame = {
    val w = Window.orderBy(col(dateCol)).rowsBetween(-3, 3)
    val base = daily
      .select(col(dateCol).as("d"), col(valueCol).cast("long").as("value"))
      .withColumn("weekday",
        (datediff(col("d"), lit(java.sql.Date.valueOf("1970-01-01"))) % 7).cast("int"))
      .withColumn("__sum7", sum(col("value")).over(w))
      .withColumn("__cnt7", count(lit(1)).over(w))
      .withColumn("__det_num",
        when(col("__cnt7") === 7, lit(7) * col("value") - col("__sum7")))
    val season = base.filter(col("__cnt7") === 7)
      .groupBy(col("weekday"))
      .agg(sum(col("__det_num")).as("__s_num"), count(lit(1)).as("__s_cnt"))
      .select(col("weekday"),
        (col("__s_num").cast("double") / (lit(7) * col("__s_cnt")).cast("double"))
          .as("season"))
    base.join(broadcast(season), Seq("weekday"), "left")
      .select(col("d"), col("value"), col("weekday"),
        when(col("__cnt7") === 7, col("__sum7").cast("double") / 7.0).as("trend"),
        col("season"),
        when(col("__cnt7") === 7,
          col("__det_num").cast("double") / 7.0 - col("season")).as("residual"))
  }
}
