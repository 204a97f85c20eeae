package graft

import graft.ops.TemporalJoins
import org.apache.spark.sql.functions._

class TemporalJoinsSpec extends SparkSpec {

  test("asofJoin picks the latest right row at-or-before each left ts") {
    import spark.implicits._
    val left = Seq(
      ("c1", 10L, "o1"), ("c1", 20L, "o2"), ("c1", 25L, "o3"),
      ("c2", 5L, "o4"))
      .toDF("k", "ts", "oid")
    val right = Seq(
      ("c1", 10L, 1.0),   // exactly at o1's ts → matched (<=)
      ("c1", 15L, 2.0),   // latest before o2 and o3
      ("c2", 9L, 9.0))    // after o4 → o4 unmatched
      .toDF("k", "ts", "price")
    val out = TemporalJoins.asofJoin(left, right, "k", "ts", "ts", Seq("price"))
      .orderBy("oid").collect()
      .map(r => (r.getAs[String]("oid"), Option(r.getAs[java.lang.Double]("price"))))
    assert(out.toSeq == Seq(
      ("o1", Some(1.0)), ("o2", Some(2.0)), ("o3", Some(2.0)), ("o4", None)))
  }

  test("pointIntervalJoin matches exact containment, start-inclusive") {
    import spark.implicits._
    val points = Seq(0L, 99L, 100L, 250L).toDF("p")
    val intervals = Seq((0L, 100L), (100L, 200L), (0L, 300L)).toDF("s", "e")
    val out = TemporalJoins.pointIntervalJoin(points, intervals, "p", "s", "e", binSize = 64L)
      .orderBy("p", "s", "e").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq(
      (0L, 0L, 100L), (0L, 0L, 300L),
      (99L, 0L, 100L), (99L, 0L, 300L),
      (100L, 0L, 300L), (100L, 100L, 200L),
      (250L, 0L, 300L)))
  }

  test("asofJoin honors a NULL value on the latest snapshot (no stale resurrection)") {
    import spark.implicits._
    val left = Seq(("k", 25L, "o1")).toDF("k", "ts", "oid")
    val right = Seq(
      ("k", 10L, Some(5.0)),
      ("k", 20L, None: Option[Double]))   // latest snapshot has NULL value
      .toDF("k", "ts", "price")
    val r = TemporalJoins.asofJoin(left, right, "k", "ts", "ts", Seq("price"))
      .collect().head
    assert(r.isNullAt(r.fieldIndex("price")), "ts=20 NULL must win over ts=10's 5.0")
  }

  test("pointIntervalJoin handles fractional bounds and empty intervals") {
    import spark.implicits._
    val points = Seq(128.0, 0.5).toDF("p")
    val intervals = Seq((0.0, 128.5), (10.0, 10.0), (12.0, 3.0)).toDF("s", "e")
    val out = TemporalJoins.pointIntervalJoin(points, intervals, "p", "s", "e", binSize = 64L)
      .orderBy("p").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // both points fall only in [0, 128.5); degenerate intervals match nothing
    assert(out.toSeq == Seq((0.5, 0.0), (128.0, 0.0)))
  }

  test("pointIntervalJoin emits each match exactly once across bin sizes") {
    import spark.implicits._
    val points = (0L to 500L by 7).toDF("p")
    val intervals = Seq((0L, 100L), (50L, 450L), (449L, 450L)).toDF("s", "e")
    val expected = points.crossJoin(intervals)
      .filter(col("s") <= col("p") && col("p") < col("e"))
      .count()
    Seq(1L, 13L, 100L, 1000L).foreach { bin =>
      val n = TemporalJoins.pointIntervalJoin(points, intervals, "p", "s", "e", bin).count()
      assert(n == expected, s"binSize $bin: $n != $expected")
    }
  }

  test("intervalOverlapJoin: each overlapping pair exactly once, any bin size") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val left = (1 to 120).map { i =>
      val s = rnd.nextInt(400).toLong; (i.toLong, s, s + rnd.nextInt(60))
    }.toDF("lid", "ls", "le")
    val right = (1 to 80).map { i =>
      val s = rnd.nextInt(400).toLong; (i.toLong, s, s + rnd.nextInt(90))
    }.toDF("rid", "rs", "re")
    val expected = left.crossJoin(right)
      .filter(col("ls") <= col("re") && col("rs") <= col("le"))
      .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
    // multi-bin-spanning pairs must NOT duplicate, zero-width intervals count
    Seq(1L, 7L, 64L, 1000L).foreach { bin =>
      val got = TemporalJoins.intervalOverlapJoin(left, right, "ls", "le", "rs", "re", bin)
        .select("lid", "rid").as[(Long, Long)].collect().sorted.toSeq
      assert(got == expected, s"binSize $bin: ${got.size} pairs != ${expected.size}")
    }
    // shared column names refuse loudly
    intercept[IllegalArgumentException] {
      TemporalJoins.intervalOverlapJoin(left, left, "ls", "le", "ls", "le", 10L)
    }
  }

  test("asofJoinTolerance NULLs a match older than the tolerance, keeps fresh ones") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val left = Seq(
      (1L, 100L, ts("2024-01-10 00:00:00")), // snap at 01-08: 2 days old → fresh
      (2L, 100L, ts("2024-01-20 00:00:00")), // latest snap 01-08: 12 days → stale
      (3L, 200L, ts("2024-01-05 00:00:00"))  // no snap at all → NULL
    ).toDF("id", "k", "lts")
    val right = Seq(
      (100L, ts("2024-01-08 00:00:00"), 8.0)
    ).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoinTolerance(left, right, "k", "lts", "rts",
        Seq("v"), tolerance = org.apache.spark.sql.functions.expr("INTERVAL 5 DAYS"))
      .orderBy("id").select("id", "v")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSeq
    assert(out == Seq((1L, Some(8.0)), (2L, None), (3L, None)))
  }

  test("asofJoinNearest picks the closer side, ties backward, one-sided falls through") {
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s"2024-01-$s 00:00:00")
    val left = Seq(
      (1L, 9L, ts("10")),  // back 08 (2d), fwd 11 (1d) -> forward
      (2L, 9L, ts("09")),  // back 08 (1d), fwd 11 (2d) -> backward
      (3L, 9L, ts("13")),  // back 11 (2d), fwd 15 (2d) -> TIE -> backward
      (4L, 9L, ts("01")),  // nothing before -> forward only
      (5L, 9L, ts("25"))   // nothing after -> backward only
    ).toDF("id", "k", "lts")
    val right = Seq((9L, ts("08"), 80.0), (9L, ts("11"), 110.0),
      (9L, ts("15"), 150.0)).toDF("k", "rts", "v")
    val out = TemporalJoins.asofJoinNearest(left, right, "k", "lts", "rts", Seq("v"))
      .orderBy("id").select("id", "v")
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(out == Seq((1L, 110.0), (2L, 80.0), (3L, 110.0),
      (4L, 80.0), (5L, 150.0)))
  }
}
