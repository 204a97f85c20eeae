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
    val e1 = intercept[IllegalArgumentException] {
      TimeSeries.gapFillForward(dup, Seq("k"), "d", Seq("v"))
    }
    assert(e1.getMessage.contains("duplicate"))
    val withNull = observed.unionByName(
      Seq(("C", null.asInstanceOf[String], 1.0)).toDF("k", "d", "v")
        .withColumn("d", col("d").cast(DateType)))
    val e2 = intercept[IllegalArgumentException] {
      TimeSeries.gapFillInterpolate(withNull, Seq("k"), "d", "v")
    }
    assert(e2.getMessage.contains("NULL"))
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
}
