package graft

import graft.ops.Quality
import org.apache.spark.sql.functions._

class QualitySpec extends SparkSpec {

  private def df = {
    import spark.implicits._
    Seq(
      (1L, Some("A"), "ok"),
      (1L, Some("B"), "ok"),      // duplicate key 1
      (2L, None, "ok"),           // null col
      (3L, Some("C"), "bad"))     // not accepted
      .toDF("k", "v", "status")
  }

  private def one(d: org.apache.spark.sql.DataFrame): Long =
    d.collect().head.getLong(0)

  test("duplicateKeyCount counts keys occurring more than once") {
    assert(one(Quality.duplicateKeyCount(df, Seq("k"))) == 1L)
  }

  test("nullCount counts nulls") {
    assert(one(Quality.nullCount(df, "v")) == 1L)
  }

  test("notAcceptedCount counts out-of-set and null values") {
    assert(one(Quality.notAcceptedCount(df, "status", Seq("ok"))) == 1L)
    assert(one(Quality.notAcceptedCount(df, "v", Seq("A", "B", "C"))) == 1L) // the null
  }

  test("orphanCount counts children without parents") {
    import spark.implicits._
    val parent = Seq(1L, 2L).toDF("pk")
    assert(one(Quality.orphanCount(df, "k", parent, "pk")) == 1L) // key 3
  }

  test("all checks return 0 (not NULL) on an empty table") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Option[String], String)].toDF("k", "v", "status")
    assert(one(Quality.duplicateKeyCount(empty, Seq("k"))) == 0L)
    assert(one(Quality.nullCount(empty, "v")) == 0L)
    assert(one(Quality.notAcceptedCount(empty, "status", Seq("ok"))) == 0L)
  }

  test("suite unions all checks into one frame") {
    import spark.implicits._
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val out = Quality.suite(Seq(
      "uniq" -> Quality.duplicateKeyCount(df, Seq("k")),
      "nn" -> Quality.nullCount(df, "v"),
      "orph" -> Quality.orphanCount(df, "k", parent, "pk")))
      .orderBy("check_name").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq == Seq(("nn", 1L), ("orph", 0L), ("uniq", 1L)))
  }

  test("tableDiff: all four statuses, null transitions are changes, NULL=NULL is not") {
    import spark.implicits._
    val a = Seq((1L, Some(10.0), "x"), (2L, Some(20.0), "y"),
      (3L, None: Option[Double], "z"), (4L, Some(40.0), "w"))
      .toDF("k", "p", "q")
    val b = Seq((1L, Some(10.0), "x"),   // unchanged
      (2L, None: Option[Double], "y"),   // p: value -> NULL = changed
      (3L, None: Option[Double], "z2"),  // q changed; p NULL=NULL not flagged
      (5L, Some(50.0), "v"))             // added; 4 removed
      .toDF("k", "p", "q")
    val out = Quality.tableDiff(a, b, "k", Seq("p", "q"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(2))))
    assert(out.toSeq == Seq(
      (1L, "unchanged", None), (2L, "changed", Some("p")),
      (3L, "changed", Some("q")), (4L, "removed", None),
      (5L, "added", None)))
  }

  test("kAnonymity: flags small classes and homogeneous classes, passes the rest") {
    import spark.implicits._
    // class (a): 3 rows, 3 distinct sensitive -> k-violation only (k=4, l=2)
    // class (b): 5 rows, 1 distinct -> l-violation only
    // class (c): 2 rows, 1 distinct -> both
    // class (d): 4 rows, 2 distinct -> clean, absent from the report
    val df = (Seq(("a", 1L), ("a", 2L), ("a", 3L)) ++
      (1 to 5).map(_ => ("b", 9L)) ++ Seq(("c", 7L), ("c", 7L)) ++
      Seq(("d", 1L), ("d", 1L), ("d", 2L), ("d", 2L))).toDF("q", "s")
    val out = Quality.kAnonymity(df, Seq("q"), "s", k = 4, l = 2)
      .orderBy("q").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_rows"),
        r.getAs[Long]("n_sensitive"), r.getString(3)))
    assert(out.toSeq == Seq(
      ("a", 3L, 3L, "k_anonymity"), ("b", 5L, 1L, "l_diversity"),
      ("c", 2L, 1L, "both")))
  }
}
