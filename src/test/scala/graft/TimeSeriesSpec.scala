package graft

import graft.ops.TimeSeries
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** Calendar densification + gap fill: spine bounds, forward-fill
  * semantics, and linear interpolation against hand-computed values. */
class TimeSeriesSpec extends SparkSpec {

  private def observed = {
    import spark.implicits._
    Seq(
      ("A", "2024-01-01", 10.0),
      ("A", "2024-01-04", 40.0), // 2-day gap before this
      ("A", "2024-01-05", 50.0),
      ("B", "2024-02-10", 7.0)) // single-observation key
      .toDF("k", "d", "v")
      .withColumn("d", col("d").cast(DateType))
  }

  test("dailySpine emits every calendar day inside each key's own span") {
    val spine = TimeSeries.dailySpine(observed, Seq("k"), "d")
      .orderBy("k", "d").collect().map(r => (r.getString(0), r.getDate(1).toString))
    assert(spine.toSeq == Seq(
      ("A", "2024-01-01"), ("A", "2024-01-02"), ("A", "2024-01-03"),
      ("A", "2024-01-04"), ("A", "2024-01-05"),
      ("B", "2024-02-10")))
  }

  test("gapFillForward carries the last observed value across gaps") {
    val out = TimeSeries.gapFillForward(observed, Seq("k"), "d", Seq("v"))
      .orderBy("k", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        Option(r.get(2)), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "2024-01-01", Some(10.0), 10.0),
      ("A", "2024-01-02", None, 10.0), // gap: carried forward
      ("A", "2024-01-03", None, 10.0),
      ("A", "2024-01-04", Some(40.0), 40.0),
      ("A", "2024-01-05", Some(50.0), 50.0),
      ("B", "2024-02-10", Some(7.0), 7.0)))
  }

  test("gap fill rejects duplicate (key, date) rows and NULL dates") {
    import spark.implicits._
    val dup = observed.unionByName(
      Seq(("A", "2024-01-01", 11.0)).toDF("k", "d", "v")
        .withColumn("d", col("d").cast(DateType)))
    // in-plan raise_error guards (no eager probe job): the failure
    // surfaces at action time, wrapped by Spark — walk the cause chain
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e1 = intercept[Exception] {
      TimeSeries.gapFillForward(dup, Seq("k"), "d", Seq("v")).collect()
    }
    assert(chain(e1).exists(_.contains("duplicate")), chain(e1).mkString(" | "))
    val withNull = observed.unionByName(
      Seq(("C", null.asInstanceOf[String], 1.0)).toDF("k", "d", "v")
        .withColumn("d", col("d").cast(DateType)))
    val e2 = intercept[Exception] {
      TimeSeries.gapFillInterpolate(withNull, Seq("k"), "d", "v").collect()
    }
    assert(chain(e2).exists(_.contains("NULL")), chain(e2).mkString(" | "))
  }

  test("zscore fails loudly on values beyond the DECIMAL(18,2) cent range") {
    import spark.implicits._
    // under ANSI (Spark 4 default) the decimal hop itself throws
    // NUMERIC_VALUE_OUT_OF_RANGE; with ANSI off it would silently NULL —
    // excluded from mean/σ and scored NULL instead of FLAGGED — which
    // the in-expression raise_error guard turns into the same loud
    // failure. Either way: an out-of-range value must never score NULL.
    val bad = Seq(("a", 1.0), ("a", 2.0), ("a", 1.0e17)).toDF("k", "v")
    val e = intercept[Exception] {
      TimeSeries.zscoreAnomalies(bad, Seq("k"), "v").collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(m =>
      m.contains("cent range") || m.contains("NUMERIC_VALUE_OUT_OF_RANGE")),
      chain(e).mkString(" | "))
    val ok = Seq(("a", 1.0), ("a", 2.0)).toDF("k", "v")
    assert(TimeSeries.zscoreAnomalies(ok, Seq("k"), "v").collect().length == 2)
  }

  test("zscoreAnomalies flags the outlier, constant series score 0") {
    import spark.implicits._
    val series = Seq(
      ("A", 1, 10.0), ("A", 2, 10.0), ("A", 3, 10.0), ("A", 4, 10.0), ("A", 5, 110.0),
      ("C", 1, 5.0), ("C", 2, 5.0)) // constant: sd = 0 → z = 0, not NULL
      .toDF("k", "t", "v")
    // threshold 1.5: with n=5 a single outlier maxes out at z = √(n−1) = 2,
    // so the default >2 strict threshold can never fire at this length
    val out = TimeSeries.zscoreAnomalies(series, Seq("k"), "v", threshold = 1.5)
      .orderBy("k", "t").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getDouble(3), r.getBoolean(4)))
    val a = out.filter(_._1 == "A")
    // mean 30, sd 40: the four 10s are at z = -0.5, the 110 at z = +2.0
    assert(a.count(_._4) == 1 && a.last._4, "only the spike is anomalous")
    assert(a.take(4).forall(p => math.abs(p._3 + 0.5) < 1e-12))
    val c = out.filter(_._1 == "C")
    assert(c.forall(p => p._3 == 0.0 && !p._4))
  }

  test("trailingDistinct: calendar-range distinct counts, same-day peers included") {
    import spark.implicits._
    val tx = Seq(
      ("A", "2024-01-01", "p1"), ("A", "2024-01-01", "p2"), // same-day peers
      ("A", "2024-01-02", "p1"),                            // repeat → not new
      ("A", "2024-01-10", "p3"))                            // 7d window forgot p1/p2
      .toDF("k", "d", "p").withColumn("d", col("d").cast(DateType))
    val out = TimeSeries.trailingDistinct(tx, Seq("k"), "d", "p", Seq(7, 30))
      .orderBy("d", "p").collect()
      .map(r => (r.getDate(1).toString, r.getString(2), r.getInt(3), r.getInt(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", "p1", 2, 2), // RANGE frame sees both same-day rows
      ("2024-01-01", "p2", 2, 2),
      ("2024-01-02", "p1", 2, 2),
      ("2024-01-10", "p3", 1, 3)))
    // NULL dates fail loudly — they'd otherwise form a nonsense frame
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val withNull = tx.unionByName(
      Seq(("A", null.asInstanceOf[String], "p9")).toDF("k", "d", "p")
        .withColumn("d", col("d").cast(DateType)))
    val e = intercept[Exception] {
      TimeSeries.trailingDistinct(withNull, Seq("k"), "d", "p", Seq(7)).collect()
    }
    assert(chain(e).exists(_.contains("NULL")), chain(e).mkString(" | "))
  }

  test("pearsonByKey: exact r, NULL-pair exclusion, constant series -> NULL") {
    import spark.implicits._
    val df = Seq(
      // key A: y = 2x exactly → r = 1
      ("A", Some(1.0), Some(2.0)), ("A", Some(2.0), Some(4.0)), ("A", Some(3.0), Some(6.0)),
      // key B: y = -x → r = -1; one NULL-sided pair must drop out
      ("B", Some(1.0), Some(-1.0)), ("B", Some(2.0), Some(-2.0)),
      ("B", Some(9.0), None),
      // key C: constant x → undefined
      ("C", Some(5.0), Some(1.0)), ("C", Some(5.0), Some(2.0)))
      .toDF("k", "x", "y")
    val byKey = TimeSeries.pearsonByKey(df, Seq("k"), "x", "y").collect()
      .map(row => row.getString(0) -> (row.getLong(1), Option(row.get(2)))).toMap
    // √a·√b ≠ √(ab) in the last ulp, so perfect correlation is 1−ε —
    // deterministically (the oracle hash-matches the same 1−ε)
    assert(byKey("A")._1 == 3L && math.abs(byKey("A")._2.get.asInstanceOf[Double] - 1.0) < 1e-12)
    assert(byKey("B")._1 == 2L && math.abs(byKey("B")._2.get.asInstanceOf[Double] + 1.0) < 1e-12)
    assert(byKey("C")._2.isEmpty, "zero variance is NULL, not NaN")
    // anti-correlated with noise: known closed form n=3, x=1,2,3 y=3,1,2
    val m = TimeSeries.pearsonByKey(
      Seq(("M", 1.0, 3.0), ("M", 2.0, 1.0), ("M", 3.0, 2.0)).toDF("k", "x", "y"),
      Seq("k"), "x", "y").collect().head
    assert(math.abs(m.getDouble(2) - (-0.5)) < 1e-12)
  }

  test("trailingFeatures: calendar-range semantics, one WindowExec for all horizons") {
    import spark.implicits._
    // key A: days 1, 2, 10 — the 7d window on day 10 must NOT see days
    // 1-2 (calendar range, not last-N-rows); the 30d window must.
    val daily = Seq(
      ("A", "2024-01-01", 10.0), ("A", "2024-01-02", 20.0), ("A", "2024-01-10", 5.0),
      ("B", "2024-03-01", 100.0))
      .toDF("k", "d", "v").withColumn("d", col("d").cast(DateType))
    // columns: k, d, v, sum_7d, cnt_7d, sum_30d, cnt_30d, avg_7d, avg_30d
    val out = TimeSeries.trailingFeatures(daily, Seq("k"), "d", "v", Seq(7, 30))
      .orderBy("k", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3), r.getLong(4),
        r.getDouble(5), r.getLong(6), r.getDouble(8)))
    assert(out.toSeq == Seq(
      ("A", "2024-01-01", 10.0, 1L, 10.0, 1L, 10.0),
      ("A", "2024-01-02", 30.0, 2L, 30.0, 2L, 15.0),
      ("A", "2024-01-10", 5.0, 1L, 35.0, 3L, 35.0 / 3.0), // 7d forgot days 1-2
      ("B", "2024-03-01", 100.0, 1L, 100.0, 1L, 100.0)))
    // all horizons must share ONE WindowExec — no stacked re-sorts
    val plan = TimeSeries.trailingFeatures(daily, Seq("k"), "d", "v", Seq(7, 30, 90))
      .queryExecution.executedPlan.toString
    assert("(?s)Window".r.findAllIn(plan).size == 1, plan)
  }

  test("gapFillInterpolate draws the straight line between observations") {
    val out = TimeSeries.gapFillInterpolate(observed, Seq("k"), "d", "v")
      .orderBy("k", "d").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "2024-01-01", 10.0),
      ("A", "2024-01-02", 20.0), // 10 + (40-10) * 1/3
      ("A", "2024-01-03", 30.0), // 10 + (40-10) * 2/3
      ("A", "2024-01-04", 40.0),
      ("A", "2024-01-05", 50.0),
      ("B", "2024-02-10", 7.0)))
  }

  test("robustZscoreAnomalies flags the outlier, not the bulk, and is partition-invariant") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    val vals = (1 to 40).map(i => ("k", i, 100.0 + (i % 5))) :+ (("k", 99, 5000.0))
    val df = vals.toDF("k", "i", "v")
      .select($"k", $"i", $"v".cast(DecimalType(18, 2)).as("v"))
    def run(parts: Int) = TimeSeries
      .robustZscoreAnomalies(df.repartition(parts), Seq("k"), "v", binWidthCents = 100L)
      .orderBy("i").collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Double]("rz"), r.getAs[Boolean]("is_anomaly")))
    val out = run(3)
    // exactly the 5000.0 row flags; the bulk stays under threshold
    assert(out.count(_._3) == 1 && out.find(_._1 == 99).exists(_._3),
      s"expected only the outlier flagged: ${out.filter(_._3).mkString(", ")}")
    assert(out.filter(_._1 != 99).forall(r => math.abs(r._2) < 3.5))
    // deterministic under any partitioning
    assert(run(1).toSeq == out.toSeq && run(7).toSeq == out.toSeq)
  }

  test("seasonalAnomalies compares each day to its own weekday's mean") {
    import spark.implicits._
    import org.apache.spark.sql.types.DecimalType
    // 2024-01-01 is a Monday = epoch day 19723, season 19723 % 7 = 4.
    // Mondays: 10, 10, 40 (spike); the Tuesday stands alone.
    val daily = Seq(
      ("k", "2024-01-01", 10.0), ("k", "2024-01-08", 10.0),
      ("k", "2024-01-15", 40.0), ("k", "2024-01-02", 99.0))
      .toDF("k", "d", "v")
      .select($"k", $"d".cast("date").as("d"), $"v".cast(DecimalType(18, 2)).as("v"))
    val out = TimeSeries.seasonalAnomalies(daily, Seq("k"), "d", "v")
      .orderBy("d").collect()
      .map(r => (r.getDate(1).toString, r.getAs[Long]("season"),
        r.getAs[Double]("baseline"), r.getAs[Boolean]("is_anomaly")))
    assert(out.toSeq == Seq(
      ("2024-01-01", 4L, 20.0, false), // |10-20|*2 = 20 ≯ 20 (boundary)
      ("2024-01-02", 5L, 99.0, false), // lone Tuesday is its own baseline
      ("2024-01-08", 4L, 20.0, false),
      ("2024-01-15", 4L, 20.0, true))) // |40-20|*2 = 40 > 20
  }

  test("changePoint lands on the level shift with exact sufficient statistics") {
    import spark.implicits._
    // 0,0,0 then 600,600,600: S_t = 6·cum_t − t·1800 peaks in magnitude
    // at t=3 (|S|=5400) — the true regime boundary
    val daily = Seq(
      ("k", 1L, 0L), ("k", 2L, 0L), ("k", 3L, 0L),
      ("k", 4L, 600L), ("k", 5L, 600L), ("k", 6L, 600L))
      .toDF("key", "d", "cents")
    val r = TimeSeries.changePoint(daily, Seq("key"), "d", "cents").collect().head
    assert(r.getLong(1) == 3L)            // cp_at
    assert(r.getDouble(2) == 5400.0)      // cusum_abs
    assert((r.getLong(3), r.getLong(4)) == ((3L, 0L)))     // before: n, sum
    assert((r.getLong(5), r.getLong(6)) == ((3L, 1800L)))  // after: n, sum
  }

  test("changePoint: constant series scores 0 at the earliest split; keys independent") {
    import spark.implicits._
    val daily = Seq(
      ("flat", 1L, 5L), ("flat", 2L, 5L), ("flat", 3L, 5L),
      ("step", 1L, 0L), ("step", 2L, 100L))
      .toDF("key", "d", "cents")
    val out = TimeSeries.changePoint(daily, Seq("key"), "d", "cents")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    // flat: every S_t = 0 → tie broken to the EARLIEST candidate split;
    // step: the only candidate split t=1 has |S| = |2·0 − 1·100| = 100
    assert(out.toSeq == Seq(("flat", 1L, 0.0), ("step", 1L, 100.0)))
  }

  test("changePoint never splits after the last row (n-1 candidates only)") {
    import spark.implicits._
    // monotone ramp: S_t < 0 strictly for all t < n; t = n would score 0
    // and win on |S| if it were (wrongly) admitted as a candidate
    val daily = Seq(("k", 1L, 0L), ("k", 2L, 10L), ("k", 3L, 20L)).toDF("key", "d", "cents")
    val r = TimeSeries.changePoint(daily, Seq("key"), "d", "cents").collect().head
    assert(r.getLong(1) < 3L && r.getDouble(2) > 0.0)
  }

  test("holtHalf matches a driver-side replay of the recurrence exactly") {
    import spark.implicits._
    val xs = Seq(10.0, 12.0, 14.0, 13.0, 18.0, 17.0, 21.0)
    val df = xs.zipWithIndex.map { case (v, i) => ("k", i.toLong, v) }
      .toDF("key", "t", "v")
    val r = TimeSeries.holtHalf(df, Seq("key"), "t", "v").collect().head
    var (l, b) = (xs.head, 0.0)
    xs.tail.foreach { x =>
      val nl = (x + (l + b)) / 2.0
      b = ((nl - l) + b) / 2.0
      l = nl
    }
    assert(r.getAs[Long]("n") == xs.length)
    assert(r.getAs[Double]("level") == l, s"level ${r.getAs[Double]("level")} != $l")
    assert(r.getAs[Double]("trend") == b)
    assert(r.getAs[Double]("forecast") == l + b)
    // a rising series must carry positive trend; 1-point series degrades
    // to (level = x1, trend = 0)
    assert(b > 0.0)
    val one = TimeSeries.holtHalf(Seq(("k", 1L, 5.0)).toDF("key", "t", "v"),
      Seq("key"), "t", "v").collect().head
    assert(one.getAs[Double]("level") == 5.0 && one.getAs[Double]("trend") == 0.0)
  }

  test("theilSenSlope: lower median of pairwise slopes shrugs off one wild outlier") {
    import spark.implicits._
    // y = 2t except a wild y(4)=100; 6 of 10 pairwise slopes are exactly 2,
    // so the lower median (element 5 of the (slope, t1, t2) order) is 2 and
    // its anchor is the 5th slope-2 pair, (1, 3).
    val df = Seq(("k", 0L, 0L), ("k", 1L, 2L), ("k", 2L, 4L), ("k", 3L, 6L),
      ("k", 4L, 100L)).toDF("key", "t", "v")
    val r = TimeSeries.theilSenSlope(df, Seq("key"), "t", "v").collect().head
    assert(r.getAs[Long]("n_pairs") == 10L)
    assert(r.getAs[Double]("ts_slope") == 2.0)
    assert(r.getAs[Long]("anchor_t1") == 1L && r.getAs[Long]("anchor_t2") == 3L)
  }

  test("madOutliers: integer medians, outlier flagged, zero-MAD key flags all deviants") {
    import spark.implicits._
    // v = (10,11,12,13,100): med=12, absdevs=(2,1,0,1,88), MAD=1 -> only 100 flags
    val df = Seq(("k", 1L, 10L), ("k", 2L, 11L), ("k", 3L, 12L), ("k", 4L, 13L),
      ("k", 5L, 100L)).toDF("key", "t", "v")
    val out = TimeSeries.madOutliers(df, Seq("key"), "t", "v", k = 3).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("t") == 5L && r.getAs[Long]("v") == 100L)
    assert(r.getAs[Long]("med") == 12L && r.getAs[Long]("mad") == 1L
      && r.getAs[Long]("absdev") == 88L)
    // majority-constant key: MAD=0, every deviating point flags
    val z = Seq(("z", 1L, 5L), ("z", 2L, 5L), ("z", 3L, 5L), ("z", 4L, 6L))
      .toDF("key", "t", "v")
    val outZ = TimeSeries.madOutliers(z, Seq("key"), "t", "v", k = 3).collect()
    assert(outZ.map(_.getAs[Long]("t")).toSeq == Seq(4L))
  }

  test("rollingMedian: despikes, partial head windows, lower-median convention") {
    import spark.implicits._
    // window 3 over (1, 9, 2, 3): medians 1 (partial), 1 (lower of {1,9}), 2, 3
    val df = Seq(("k", 1L, 1L), ("k", 2L, 9L), ("k", 3L, 2L), ("k", 4L, 3L))
      .toDF("key", "t", "v")
    val out = TimeSeries.rollingMedian(df, Seq("key"), "t", "v", window = 3)
      .orderBy("t").collect().map(_.getAs[Long]("roll_median"))
    assert(out.toSeq == Seq(1L, 1L, 2L, 3L))
    intercept[IllegalArgumentException] {
      TimeSeries.rollingMedian(df, Seq("key"), "t", "v", window = 1)
    }
  }

  test("busdays: closed form matches the calendar on known spans") {
    import spark.implicits._
    // 2024-01-01 is a Monday
    val cases = Seq(
      ("2024-01-01", "2024-01-08", 5L),  // Mon -> next Mon: one full week
      ("2024-01-06", "2024-01-08", 0L),  // Sat -> Mon: pure weekend
      ("2024-01-05", "2024-01-06", 1L),  // Fri -> Sat: just Friday
      ("2024-01-01", "2024-01-16", 11L), // two weeks + Mon
      ("2024-01-03", "2024-01-03", 0L),  // empty span
      ("2024-01-08", "2024-01-01", -5L)) // reversed = negative
    val out = cases.toDF("d1", "d2", "want")
      .select(col("want"),
        TimeSeries.busdays(col("d1").cast(DateType), col("d2").cast(DateType))
          .as("got"))
      .collect()
    out.foreach(r => assert(r.getLong(0) == r.getLong(1),
      s"want ${r.getLong(0)} got ${r.getLong(1)}"))
  }
}
