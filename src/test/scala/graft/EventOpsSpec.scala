package graft

import graft.ops.EventOps
import org.apache.spark.sql.functions._

class EventOpsSpec extends SparkSpec {

  private def ev(rows: (Long, String, Long, String, Double, String)*) = {
    import spark.implicits._
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
  }

  test("jsonPropsQuarantine: valid rows parse, junk quarantines with raw preserved") {
    import spark.implicits._
    import graft.ops.EventOps.jsonPropsQuarantine
    val rows = Seq(
      (1L, """{"k": 7}"""),
      (2L, """{"k":"""),      // truncated → quarantine
      (3L, """{"x": 1}"""),   // valid JSON, no k → k NULL but NOT quarantined
      (4L, """not json"""))
      .toDF("event_id", "payload")
    val out = jsonPropsQuarantine(rows, "payload").orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.get(2)), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, Some(7), false),
      (2L, None, true),
      (3L, None, false),
      (4L, None, true)))
  }

  test("linearAttribution: equal split in window, unattributed bucket, credit conserved") {
    import graft.ops.EventOps.linearAttribution
    val e = ev(
      // user 1: click + view inside the hour before purchase → 1/2 each
      (1L, "2024-01-01 09:30:00", 1L, "click", 0.0, "{}"),
      (2L, "2024-01-01 09:45:00", 1L, "view", 0.0, "{}"),
      (3L, "2024-01-01 10:00:00", 1L, "purchase", 0.0, "{}"),
      // user 2: touch outside the window → unattributed
      (4L, "2024-01-02 08:00:00", 2L, "click", 0.0, "{}"),
      (5L, "2024-01-02 10:00:00", 2L, "purchase", 0.0, "{}"),
      // user 3: two clicks in window → click gets 2 × 1/2 = 1.0
      (6L, "2024-01-03 09:10:00", 3L, "click", 0.0, "{}"),
      (7L, "2024-01-03 09:20:00", 3L, "click", 0.0, "{}"),
      (8L, "2024-01-03 10:00:00", 3L, "purchase", 0.0, "{}"))
    val out = linearAttribution(e, "user_id", "event_type", "ts", "event_id",
      Seq("click", "view"), "purchase", expr("INTERVAL 1 HOUR"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(out == Map(
      "click" -> ((3L, 1.5)), // 0.5 (user 1) + 1.0 (user 3)
      "view" -> ((1L, 0.5)),
      "(unattributed)" -> ((1L, 1.0))))
    // credit conservation to the DECIMAL(18,9) anchor: each conversion
    // contributes n·trunc(1/n) ∈ (1 − 1e-9·n, 1] — exact here (n ∈ {1,2})
    assert(math.abs(out.values.map(_._2).sum - 3.0) < 3e-9)
  }

  test("transitionMatrix: per-user lag pairs, tie-broken by event id, row-normalized") {
    import graft.ops.EventOps.transitionMatrix
    // user 1: view → click → click; user 2: view → buy
    // same-ts tie for user 1's first two events broken by event_id
    val e = ev(
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0, "{}"),
      (2L, "2024-01-01 10:00:00", 1L, "click", 0.0, "{}"),
      (3L, "2024-01-01 11:00:00", 1L, "click", 0.0, "{}"),
      (4L, "2024-01-02 10:00:00", 2L, "view", 0.0, "{}"),
      (5L, "2024-01-02 11:00:00", 2L, "buy", 0.0, "{}"))
    val out = transitionMatrix(e, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => ((r.getString(0), r.getString(1)), (r.getLong(2), r.getDouble(3))))
      .toMap
    assert(out == Map(
      ("view", "click") -> ((1L, 0.5)),
      ("view", "buy") -> ((1L, 0.5)),
      ("click", "click") -> ((1L, 1.0))))
  }

  test("mergeIntervals: overlap and touch merge, gaps split, guards raise") {
    import spark.implicits._
    import graft.ops.EventOps.mergeIntervals
    def iv(rows: (String, String, String)*) =
      rows.toDF("k", "s", "e")
        .withColumn("s", col("s").cast("date")).withColumn("e", col("e").cast("date"))
    val merged = mergeIntervals(iv(
      ("A", "2024-01-01", "2024-01-05"),
      ("A", "2024-01-03", "2024-01-08"), // overlaps the first
      ("A", "2024-01-08", "2024-01-09"), // touches (start = prev end) → merges
      ("A", "2024-01-15", "2024-01-16"), // gap → new island
      ("B", "2024-02-01", "2024-02-01")), // zero-length singleton
      Seq("k"), "s", "e")
      .orderBy("k", "island_start").collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString, r.getLong(3)))
    assert(merged.toSeq == Seq(
      ("A", "2024-01-01", "2024-01-09", 3L),
      ("A", "2024-01-15", "2024-01-16", 1L),
      ("B", "2024-02-01", "2024-02-01", 1L)))
    // a later interval fully INSIDE an earlier one must not split the island
    val nested = mergeIntervals(iv(
      ("A", "2024-01-01", "2024-01-10"),
      ("A", "2024-01-02", "2024-01-03"),
      ("A", "2024-01-09", "2024-01-12")), Seq("k"), "s", "e").collect()
    assert(nested.length == 1 && nested.head.getLong(3) == 3L)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e1 = intercept[Exception] {
      mergeIntervals(iv(("A", "2024-01-05", "2024-01-01")), Seq("k"), "s", "e").collect()
    }
    assert(chain(e1).exists(_.contains("inverted")), chain(e1).mkString(" | "))
    val e2 = intercept[Exception] {
      mergeIntervals(iv(("A", null, "2024-01-01")), Seq("k"), "s", "e").collect()
    }
    assert(chain(e2).exists(_.contains("NULL")), chain(e2).mkString(" | "))
  }

  test("jsonProps extracts k with explicit schema; malformed → null") {
    val out = EventOps.jsonProps(ev(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, """{"k": 7}"""),
      (2L, "2024-01-01 00:00:00", 1L, "click", 1.0, "not json")))
      .orderBy("event_id").collect()
    assert(out(0).getAs[Int]("k") == 7)
    assert(out(1).isNullAt(out(1).fieldIndex("k")))
  }

  test("tumblingHourly buckets on the hour with exact sums") {
    val out = EventOps.tumblingHourly(ev(
      (1L, "2024-01-01 10:05:00", 1L, "click", 1.5, "{}"),
      (2L, "2024-01-01 10:59:59", 2L, "click", 2.5, "{}"),
      (3L, "2024-01-01 11:00:00", 1L, "click", 4.0, "{}")))
      .orderBy("window_start").collect()
      .map(r => (r.getAs[java.time.LocalDateTime]("window_start").getHour,
        r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq((10, 2L, 4.0), (11, 1L, 4.0)))
  }

  test("windowed funnel drops conversions slower than the step gap") {
    val events = ev(
      // user 1: signup → view 2h later → click 30m later (all inside 1 day)
      (1L, "2024-01-01 00:00:00", 1L, "signup", 0.0, "{}"),
      (2L, "2024-01-01 02:00:00", 1L, "view", 0.0, "{}"),
      (3L, "2024-01-01 02:30:00", 1L, "click", 0.0, "{}"),
      // user 2: signup → view 3 DAYS later (outside the window)
      (4L, "2024-01-01 00:00:00", 2L, "signup", 0.0, "{}"),
      (5L, "2024-01-04 00:00:00", 2L, "view", 0.0, "{}"),
      // user 2 clicks right after the late view — must NOT count either,
      // because the view itself never qualified
      (6L, "2024-01-04 00:10:00", 2L, "click", 0.0, "{}"))
    val stages = Seq("signup", "view", "click")
    val bounded = EventOps.funnelWindowed(events, "user_id", "event_type", "ts",
      stages, expr("INTERVAL 1 DAY"))
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(bounded.toSeq == Seq(2L, 1L, 1L)) // both signup; only user 1 converts
    val unbounded = EventOps.funnel(events, "user_id", "event_type", "ts", stages)
      .orderBy("stage_idx").collect().map(_.getLong(2))
    assert(unbounded.toSeq == Seq(2L, 2L, 2L)) // no window: user 2 counts too
  }

  test("sessions split at >= gap, merge at < gap, end = last + gap") {
    val out = EventOps.sessions(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:29:59", 1L, "click", 1.0, "{}"), // < 30m after #1 → same session
      (3L, "2024-01-01 10:59:59", 1L, "click", 1.0, "{}"), // < 30m after #2 → extends
      (4L, "2024-01-01 11:29:59", 2L, "click", 1.0, "{}")), // other user
      "30 minutes")
      .orderBy("user_id", "session_start").collect()
      .map(r => (r.getLong(0), r.getAs[java.time.LocalDateTime]("session_end").toString, r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "2024-01-01T11:29:59", 3L),  // 10:59:59 + 30m
      (2L, "2024-01-01T11:59:59", 1L)))
    // exactly-at-gap boundary MERGES (next.start <= prev_end); a new
    // session needs quiet time strictly greater than the gap
    val boundary = EventOps.sessions(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:30:00", 1L, "click", 1.0, "{}")), "30 minutes")
    assert(boundary.count() == 1)
    val split = EventOps.sessions(ev(
      (1L, "2024-01-01 10:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 10:30:01", 1L, "click", 1.0, "{}")), "30 minutes")
    assert(split.count() == 2)
  }

  test("pivotByType produces fixed columns with zero fill") {
    val out = EventOps.pivotByType(ev(
      (1L, "2024-01-01 00:00:00", 1L, "click", 1.0, "{}"),
      (2L, "2024-01-01 00:00:00", 1L, "purchase", 1.0, "{}")))
    assert(out.columns.toSeq == Seq("user_id", "n_click", "n_error", "n_purchase", "n_signup", "n_view"))
    val r = out.collect().head
    assert(r.getLong(1) == 1L && r.getLong(2) == 0L && r.getLong(3) == 1L)
  }

  test("journeyMatch: deterministic journey order, regex classification") {
    // user 1: signup → error → purchase (converted, NOT clean);
    // user 2: signup → view → purchase (clean); user 3: views only.
    // Same-ts events order by event_id (10 before 11).
    val out = EventOps.journeyMatch(ev(
      (1L, "2024-01-01 00:00:00", 1L, "signup", 0.0, "{}"),
      (2L, "2024-01-01 01:00:00", 1L, "error", 0.0, "{}"),
      (3L, "2024-01-01 02:00:00", 1L, "purchase", 1.0, "{}"),
      (10L, "2024-01-02 00:00:00", 2L, "signup", 0.0, "{}"),
      (11L, "2024-01-02 00:00:00", 2L, "view", 0.0, "{}"),
      (12L, "2024-01-02 01:00:00", 2L, "purchase", 1.0, "{}"),
      (20L, "2024-01-03 00:00:00", 3L, "view", 0.0, "{}")),
      "user_id", "event_type", "ts", "event_id",
      Seq("converted" -> "s.*p", "clean" -> "s[^e]*p"))
      .orderBy("user_id").collect()
      .map(r => (r.getAs[String]("journey"), r.getAs[Boolean]("converted"),
        r.getAs[Boolean]("clean")))
    assert(out.toSeq == Seq(("sep", true, false), ("svp", true, true),
      ("v", false, false)))
  }

  test("mergeSessions: bridge at the exact boundary, pass-through otherwise") {
    def sess(rows: (Long, String)*) = {
      import spark.implicits._
      EventOps.sessions(rows.toDF("user_id", "ts")
        .withColumn("ts", col("ts").cast("timestamp")), "30 minutes")
    }
    // user 1: old session ends 10:30 (last event 10:00) — new event at
    // EXACTLY 10:30 bridges (boundary-inclusive, the batch rule);
    // user 2: new event 1s past the old end starts a fresh session;
    // user 3: only old; user 4: only new
    val existing = sess((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"),
      (3L, "2024-01-01 09:00:00"))
    val batch = Seq((1L, "2024-01-01 10:30:00"), (2L, "2024-01-01 10:30:01"),
      (4L, "2024-01-01 11:00:00"))
    import spark.implicits._
    val batchDf = batch.toDF("user_id", "ts").withColumn("ts", col("ts").cast("timestamp"))
    val got = EventOps.mergeSessions(existing, batchDf, "30 minutes")
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.get(1).toString,
        r.get(2).toString, r.getLong(3))).toSeq
    // oracle: full-rebuild sessionization over the union
    val full = sess((Seq((1L, "2024-01-01 10:00:00"), (2L, "2024-01-01 10:00:00"),
      (3L, "2024-01-01 09:00:00")) ++ batch): _*)
      .orderBy("user_id", "session_start")
      .collect().map(r => (r.getLong(0), r.get(1).toString,
        r.get(2).toString, r.getLong(3))).toSeq
    assert(got == full)
    // the bridge actually merged: user 1 has ONE session of 2 events
    assert(got.count(_._1 == 1L) == 1 && got.find(_._1 == 1L).get._4 == 2L)
    // the 1s-late event did NOT merge: user 2 has two sessions
    assert(got.count(_._1 == 2L) == 2)
  }

  private def purchases(rows: (Long, String, Double)*) = {
    import spark.implicits._
    rows.toDF("user_id", "ts", "value")
      .withColumn("ts", to_timestamp(col("ts")))
  }

  test("rfmSegments: distinct metric values land in their own quintiles") {
    // five users whose recency/frequency/monetary are all co-monotone:
    // user u has u purchases of $100 on day (5-u)..  — so every score
    // axis must come out r = 6-u ↔ day recency, f = u, m = u
    val evs = (1 to 5).flatMap { u =>
      (1 to u).map(i => (u.toLong, f"2024-01-${u}%02d 0$i:00:00", 100.0))
    }
    val out = EventOps.rfmSegments(purchases(evs: _*), "user_id", "ts", "value",
        monetaryBinCents = 10000L)
      .orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))
    // user 5 bought last (day 5 = anchor, recency 0) and most
    assert(out.toSeq == Seq(
      (1L, 4L, 1L, 10000L, 5, 1, 1),
      (2L, 3L, 2L, 20000L, 4, 2, 2),
      (3L, 2L, 3L, 30000L, 3, 3, 3),
      (4L, 1L, 4L, 40000L, 2, 4, 4),
      (5L, 0L, 5L, 50000L, 1, 5, 5)))
  }

  test("rfmSegments: thresholds are value-count quintiles, ties share a score") {
    // four identical users + one whale: the four tie on every axis and
    // must share one (r,f,m) cell; the whale sits strictly above on m
    val evs = (1 to 4).map(u => (u.toLong, "2024-01-01 01:00:00", 10.0)) :+
      ((9L, "2024-01-01 02:00:00", 990.0))
    val out = EventOps.rfmSegments(purchases(evs: _*), "user_id", "ts", "value")
      .collect().map(r => (r.getLong(0), r.getInt(4), r.getInt(5), r.getInt(6))).toSeq
    val (whale, rest) = out.partition(_._1 == 9L)
    assert(rest.map(t => (t._2, t._3, t._4)).distinct.size == 1)
    assert(whale.head._4 > rest.head._4)
  }

  test("rfmSegments fails loudly on negative purchase values") {
    intercept[Exception] {
      EventOps.rfmSegments(purchases((1L, "2024-01-01 00:00:00", -5.0)),
        "user_id", "ts", "value").collect()
    }
  }

  test("cohortLtv: per-cohort cumulative cents across day offsets") {
    val evs = purchases(
      (1L, "2024-01-01 08:00:00", 10.0),  // cohort d0
      (1L, "2024-01-03 08:00:00", 5.0),   //   offset 2
      (2L, "2024-01-03 09:00:00", 1.0),   // cohort d2
      (3L, "2024-01-01 10:00:00", 2.0))   // cohort d0, same cell as user 1
    val out = EventOps.cohortLtv(evs, "user_id", "ts", "value")
      .orderBy("cohort_d", "day_offset").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.toSeq == Seq(
      ("2024-01-01", 0L, 2L, 1200L, 1200L),
      ("2024-01-01", 2L, 1L, 500L, 1700L),
      ("2024-01-03", 0L, 1L, 100L, 100L)))
  }

  test("peakConcurrency: sweep-line max, half-open ends, inverted fails") {
    import spark.implicits._
    def d(day: Int) = java.sql.Date.valueOf(f"2024-01-$day%02d")
    // [1,5) [2,4) [3,6): all three open on day 3 and 3..4 window
    val iv = Seq(("k", d(1), d(5)), ("k", d(2), d(4)), ("k", d(3), d(6)),
      // half-open: [1,3) and [3,5) never overlap
      ("h", d(1), d(3)), ("h", d(3), d(5)))
      .toDF("key", "s", "e")
    val out = EventOps.peakConcurrency(iv, Seq("key"), "s", "e")
      .orderBy("key").collect()
      .map(r => (r.getString(0), r.getAs[Long]("peak"), r.getDate(2).toString))
    assert(out.toSeq == Seq(("h", 1L, "2024-01-01"), ("k", 3L, "2024-01-03")))
    val bad = Seq(("k", d(5), d(1))).toDF("key", "s", "e")
    val ex = intercept[Exception] {
      EventOps.peakConcurrency(bad, Seq("key"), "s", "e").collect()
    }
    assert(ex.getMessage.contains("inverted"))
  }

  test("firstLastTouch: window-bounded endpoints, empty window reports NULLs") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-01 $s")
    val ev = Seq(
      (1L, 7L, "click", ts("10:00:00")),
      (2L, 7L, "view", ts("10:30:00")),
      (3L, 7L, "purchase", ts("10:45:00")), // window: both touches -> first 1, last 2
      (4L, 7L, "purchase", ts("12:00:00")), // both touches older than 1h -> NULLs
      (5L, 8L, "click", ts("09:00:00")),
      (6L, 8L, "purchase", ts("09:30:00"))  // one touch -> first = last = 5
    ).toDF("event_id", "user_id", "event_type", "ts")
    val out = EventOps.firstLastTouch(ev, "user_id", "event_type", "ts",
      "event_id", "purchase", lookbackUs = 3600L * 1000000L)
      .orderBy("conv_id").collect()
      .map(r => (r.getAs[Long]("conv_id"), r.getAs[Long]("n_touches"),
        Option(r.get(r.fieldIndex("first_touch_id"))),
        Option(r.get(r.fieldIndex("last_touch_id")))))
    assert(out.toSeq == Seq(
      (3L, 2L, Some(1L), Some(2L)),
      (4L, 0L, None, None),
      (6L, 1L, Some(5L), Some(5L))))
  }

  test("periodChurn: retained/churned/new per week, last week NULL not 100%") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    // u1 active both weeks, u2 week1 only, u3 week2 only (2024-01-01 is a Monday)
    val ev = Seq((1L, ts("2024-01-02")), (1L, ts("2024-01-09")),
      (2L, ts("2024-01-03")), (3L, ts("2024-01-10")))
      .toDF("user_id", "ts")
    val out = EventOps.periodChurn(ev, "user_id", "ts", period = "week")
      .orderBy("m").collect()
    assert(out.length == 2)
    val w1 = out(0)
    assert(w1.getAs[Long]("n_active") == 2L && w1.getAs[Long]("n_new") == 2L)
    assert(w1.getAs[Long]("n_retained") == 1L && w1.getAs[Long]("n_churned") == 1L)
    assert(w1.getAs[Double]("churn_rate") == 0.5)
    val w2 = out(1)
    assert(w2.getAs[Long]("n_active") == 2L && w2.getAs[Long]("n_new") == 1L)
    assert(w2.isNullAt(w2.fieldIndex("n_churned")), "last week churn must be NULL")
  }

  test("dauMau: mean daily actives over observed days vs period actives") {
    import spark.implicits._
    def ts(d: String) = java.sql.Timestamp.valueOf(s"$d 10:00:00")
    val ev = Seq((1L, ts("2024-01-01")), (1L, ts("2024-01-01")), // dup: one (u, d)
      (1L, ts("2024-01-02")), (2L, ts("2024-01-01")))
      .toDF("user_id", "ts")
    val r = EventOps.dauMau(ev, "user_id", "ts", period = "week").collect().head
    assert(r.getAs[Long]("n_days") == 2L && r.getAs[Long]("mau") == 2L)
    assert(r.getAs[Double]("avg_dau") == 1.5 && r.getAs[Double]("stickiness") == 0.75)
  }

  test("cooccurrence: actor-grain dedup, unordered pairs, exact Jaccard") {
    import spark.implicits._
    // u2 repeats B: must not inflate n_both; B-C never co-occur -> absent
    val ev = Seq((1L, "A"), (1L, "B"), (2L, "A"), (2L, "B"), (2L, "B"),
      (3L, "A"), (3L, "C")).toDF("user_id", "event_type")
    val out = EventOps.cooccurrence(ev, "user_id", "event_type")
      .orderBy("cat_a", "cat_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n_a"),
        r.getAs[Long]("n_b"), r.getAs[Long]("n_both"),
        r.getAs[Double]("jaccard")))
    assert(out.toSeq == Seq(
      ("A", "B", 3L, 2L, 2L, 2.0 / 3.0),
      ("A", "C", 3L, 1L, 1L, 1.0 / 3.0)))
  }
  test("markovSteady: converges to the analytic stationary distribution") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // chain: A->A x3, A->B x1, B->A x1 => P=[[3/4,1/4],[1,0]],
    // stationary pi = (4/5, 1/5); |lambda2| = 1/4 so 6 rounds from
    // uniform land within (1/4)^6 of it
    // user journey emitting exactly those transition counts:
    // A A A A B A  -> A->A x3, A->B x1, B->A x1
    val seq = Seq("A", "A", "A", "A", "B", "A")
    val events = seq.zipWithIndex.map { case (t, i) =>
      (i.toLong, s"2024-01-01 10:0$i:00", 1L, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = EventOps.markovSteady(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(out("A") - 0.8) < 0.002, s"pi(A): $out")
    assert(math.abs(out("B") - 0.2) < 0.002, s"pi(B): $out")
    // mass conserved up to integer truncation
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
  }
  test("abTestExposure: window-scoped conversions, exact counts, hand-computed z, NULL on zero variance") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // arm assignment is the opaque md5 hash — recover it with the same
    // expression so the expected counts are arm-exact, not approximate
    val users = (1L to 40L)
    val arms = users.toDF("u").select(col("u"),
        expr("CAST(conv(substring(md5(CONCAT('ab:', CAST(u AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2").as("arm"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every user: view at 10:00. Conversion schedule: u%4==0 purchases
    // INSIDE the window (+1h); u%4==1 purchases BEFORE exposure
    // (09:00 — must not count); u%4==2 purchases AFTER the window
    // (+30h — must not count); u%4==3 never purchases.
    def ts(h: Int, m: Int = 0) = f"2024-01-0${1 + h / 24}%d ${h % 24}%02d:$m%02d:00"
    val rows = users.flatMap { u =>
      val view = (u * 10, ts(10), u, "view")
      val p = u % 4 match {
        case 0 => Seq((u * 10 + 1, ts(11), u, "purchase"))
        case 1 => Seq((u * 10 + 1, ts(9), u, "purchase"))
        case 2 => Seq((u * 10 + 1, ts(40), u, "purchase"))
        case _ => Seq.empty
      }
      view +: p
    }
    val events = rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val out = EventOps.abTestExposure(events, "user_id", "event_type", "ts",
      "view", "purchase", window = expr("INTERVAL 24 HOURS")).collect().head
    val expNa = users.count(u => arms(u) == 0)
    val expNb = users.count(u => arms(u) == 1)
    val expCa = users.count(u => arms(u) == 0 && u % 4 == 0)
    val expCb = users.count(u => arms(u) == 1 && u % 4 == 0)
    assert((out.getLong(0), out.getLong(1), out.getLong(2), out.getLong(3)) ==
      ((expNa.toLong, expCa.toLong, expNb.toLong, expCb.toLong)), s"counts: $out")
    val (ra, rb) = (expCa.toDouble / expNa, expCb.toDouble / expNb)
    val pool = (expCa + expCb).toDouble / (expNa + expNb)
    val se = math.sqrt(pool * (1.0 - pool) * (1.0 / expNa + 1.0 / expNb))
    assert(out.getDouble(4) == ra && out.getDouble(5) == rb)
    assert(out.getDouble(7) == (rb - ra) / se, s"z: $out")
    // zero variance (every exposed user converts) -> z is NULL, not 0/0
    val allConv = users.flatMap { u =>
      Seq((u * 10, ts(10), u, "view"), (u * 10 + 1, ts(11), u, "purchase"))
    }.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val degenerate = EventOps.abTestExposure(allConv, "user_id", "event_type", "ts",
      "view", "purchase", window = expr("INTERVAL 24 HOURS")).collect().head
    assert(degenerate.isNullAt(degenerate.fieldIndex("z_pooled")))
    // conversion EXACTLY at t0 + window is INSIDE (<= boundary, both
    // engines); one microsecond later is outside
    val atBoundary = Seq(
      (1L, "2024-01-01 10:00:00.000000", 5L, "view"),
      (2L, "2024-01-02 10:00:00.000000", 5L, "purchase"),
      (3L, "2024-01-01 10:00:00.000000", 6L, "view"),
      (4L, "2024-01-02 10:00:00.000001", 6L, "purchase"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val bOut = EventOps.abTestExposure(atBoundary, "user_id", "event_type", "ts",
      "view", "purchase", window = expr("INTERVAL 24 HOURS")).collect().head
    assert(bOut.getLong(1) + bOut.getLong(3) == 1L,
      s"exactly-at-boundary must convert, one µs later must not: $bOut")
    // EMPTY ARM: a single exposed user leaves the other arm empty —
    // its rate, the lift, and z must be NULL (not NaN/inf; Spark's
    // 0-division NULL vs DuckDB's inf would diverge without the guard)
    val solo = Seq((1L, "2024-01-01 10:00:00", 7L, "view"))
      .toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("value", lit(0.0)).withColumn("props", lit("{}"))
    val sOut = EventOps.abTestExposure(solo, "user_id", "event_type", "ts",
      "view", "purchase", window = expr("INTERVAL 24 HOURS")).collect().head
    assert(sOut.getLong(0) + sOut.getLong(2) == 1L)
    val emptyRate = if (sOut.getLong(0) == 0L) "rate_a" else "rate_b"
    assert(sOut.isNullAt(sOut.fieldIndex(emptyRate)), s"empty arm's rate: $sOut")
    assert(sOut.isNullAt(sOut.fieldIndex("lift")) &&
      sOut.isNullAt(sOut.fieldIndex("z_pooled")), s"lift/z on empty arm: $sOut")
  }

  test("markovSteady: recurrent closure drops multi-hop drains, conserves mass") {
    import spark.implicits._
    import org.apache.spark.sql.types.TimestampType
    // A<->B is the recurrent cycle; X emits ONLY into the sink S
    // (S never emits), so X survives one naive closure pass (it has
    // an out-row) but its mass drains — the fixed point must drop
    // both X and S and leave the A/B stationary (1/2, 1/2) intact.
    // journeys: u1: A B A B A ; u2: X S
    val rows =
      Seq((1L, "A"), (1L, "B"), (1L, "A"), (1L, "B"), (1L, "A"),
        (2L, "X"), (2L, "S"))
    val events = rows.zipWithIndex.map { case ((u, t), i) =>
      (i.toLong, f"2024-01-01 10:$i%02d:00", u, t, 0.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampType))
    val out = EventOps.markovSteady(events, "user_id", "event_type", "ts", "event_id")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(out.keySet == Set("A", "B"), s"closure: $out")
    assert(math.abs(out("A") - 0.5) < 1e-9 && math.abs(out("B") - 0.5) < 1e-9, s"$out")
    assert(math.abs(out.values.sum - 1.0) < 1e-9)
    // pure DAG of types (no cycle anywhere) must fail loudly, not
    // return a draining distribution
    val dag = Seq((0L, "2024-01-01 10:00:00", 9L, "V", 0.0, "{}"),
      (1L, "2024-01-01 10:01:00", 9L, "P", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast(TimestampType))
    val e = intercept[IllegalArgumentException] {
      EventOps.markovSteady(dag, "user_id", "event_type", "ts", "event_id").collect()
    }
    assert(e.getMessage.contains("no recurrent class"))
  }

  test("ev_cuped equals a BigInt/Double replay of the CUPED formulas") {
    val dir = "/root/testdata/sf0.001"
    val ev = graft.Tables.events(spark, dir)
      .selectExpr("user_id", "unix_micros(ts) AS us",
        "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val cut = (ev.map(_._2).min + ev.map(_._2).max) / 2
    val per = ev.groupBy(_._1).map { case (u, rows) =>
      (u, rows.filter(_._2 < cut).map(_._3).sum, rows.filter(_._2 >= cut).map(_._3).sum)
    }.toSeq
    val n = per.size.toLong
    val (sx, sy) = (per.map(_._2).sum, per.map(_._3).sum)
    def big(f: ((Long, Long, Long)) => BigInt) = per.map(f).sum
    val sxx = big(p => BigInt(p._2) * p._2)
    val sxy = big(p => BigInt(p._2) * p._3)
    val syy = big(p => BigInt(p._3) * p._3)
    val vx = (BigInt(n) * sxx - BigInt(sx) * sx).toDouble
    val vy = (BigInt(n) * syy - BigInt(sy) * sy).toDouble
    val cxy = (BigInt(n) * sxy - BigInt(sx) * sy).toDouble
    val theta = cxy / vx
    val varRatio = 1.0 - cxy * cxy / vx / vy
    def armStats(v: Long) = {
      val a = per.filter(_._1 % 2 == v)
      (a.size.toLong, a.map(_._2).sum, a.map(_._3).sum)
    }
    val (na, sxa, sya) = armStats(0); val (nb, sxb, syb) = armStats(1)
    val (mxa, mxb) = (sxa.toDouble / na / 100.0, sxb.toDouble / nb / 100.0)
    val (mya, myb) = (sya.toDouble / na / 100.0, syb.toDouble / nb / 100.0)
    val row = graft.SparkEntry.queries("ev_cuped")(spark, dir).collect().head
    assert(row.getLong(0) == n && row.getLong(1) == na && row.getLong(2) == nb)
    assert(math.abs(row.getDouble(3) - theta) < 1e-12 * math.abs(theta), "theta")
    assert(math.abs(row.getDouble(6) - (myb - mya)) < 1e-9, "lift")
    assert(math.abs(row.getDouble(7) - (myb - mya - theta * (mxb - mxa))) < 1e-9, "lift_adj")
    assert(math.abs(row.getDouble(8) - varRatio) < 1e-12, "var_ratio")
  }

  test("didLift: hand-computed micro panel; an empty arm NULL-gates the estimate") {
    import spark.implicits._
    // arm 0 = users 2, 4: pre means 15.00, post 18.00 → delta 3.00
    // arm 1 = users 1, 3: pre means 10.00, post 22.00 → delta 12.00
    // did = 12 − 3 = 9.00
    val rows = Seq(
      (1L, "2024-01-01 00:00:00", 10.0), (1L, "2024-01-02 00:00:00", 20.0),
      (2L, "2024-01-01 00:00:00", 10.0), (2L, "2024-01-02 00:00:00", 12.0),
      (3L, "2024-01-01 00:00:00", 10.0), (3L, "2024-01-02 00:00:00", 24.0),
      (4L, "2024-01-01 00:00:00", 20.0), (4L, "2024-01-02 00:00:00", 24.0))
    val ev = rows.toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = EventOps.didLift(ev, "user_id", "ts", "value",
      pmod(col("user_id"), lit(2))).collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 15.0) < 1e-12, "pre_a")
    assert(math.abs(r.getDouble(5) - 22.0) < 1e-12, "post_b")
    assert(math.abs(r.getDouble(6) - 3.0) < 1e-12, "delta_a")
    assert(math.abs(r.getDouble(7) - 12.0) < 1e-12, "delta_b")
    assert(math.abs(r.getDouble(8) - 9.0) < 1e-12, "did")
    // an empty treatment arm makes the estimate undefined, not 0/Inf
    val oneArm = EventOps.didLift(ev.filter(col("user_id") % 2 === 0),
      "user_id", "ts", "value", pmod(col("user_id"), lit(2))).collect().head
    assert(oneArm.getLong(1) == 0L)
    assert(oneArm.isNullAt(4) && oneArm.isNullAt(7) && oneArm.isNullAt(8),
      "empty arm must NULL-gate pre_b/delta_b/did")
  }

  test("cupedLift NULL-gates a zero-variance covariate (the x/0 hazard class)") {
    import spark.implicits._
    // every user has the SAME pre-period spend: var(X) = 0, so theta,
    // lift_adj, and var_ratio are undefined — they must surface NULL
    // (Spark x/0 → NULL vs DuckDB → ±inf is the audit-proven class),
    // while the unadjusted lift stays defined
    val rows = (1L to 4L).flatMap { u =>
      Seq((u, "2024-01-01 00:00:00", 5.00),      // pre: identical spend
        (u, "2024-01-02 00:00:00", u * 10.0))    // post: varies by user
    }
    val ev = rows.toDF("user_id", "ts", "value")
      .withColumn("ts", col("ts").cast("timestamp"))
    val r = EventOps.cupedLift(ev, "user_id", "ts", "value",
      pmod(col("user_id"), lit(2))).collect().head
    assert(r.getLong(0) == 4L)
    assert(r.isNullAt(3), "theta must be NULL at var(X) = 0")
    assert(r.isNullAt(7), "lift_adj must be NULL at var(X) = 0")
    assert(r.isNullAt(8), "var_ratio must be NULL at var(X) = 0")
    assert(!r.isNullAt(6), "plain lift stays defined")
  }
}
