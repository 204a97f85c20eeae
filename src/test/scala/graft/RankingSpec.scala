package graft

import graft.ops.Ranking
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Bounded-state top-k aggregate: matches the rank window exactly,
  * merges across partitions, ignores NULLs, and never plans a
  * WindowExec. */
class RankingSpec extends SparkSpec {
  import spark.implicits._

  private def viaWindow(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy("g").orderBy(col("s").desc, col("id"))
    df.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("g", "rank", "s", "id")
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet
  }

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy("g").agg(Ranking.topKBy(col("s"), col("id"), k).as("top"))
      .select(col("g"), posexplode(col("top")).as(Seq("idx", "e")))
      .select(col("g"), (col("idx") + 1).as("rank"), col("e.score"), col("e.id"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getDouble(2), r.getLong(3))).toSet

  test("topKBy == rank window on seeded data, under any partitioning") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 500).map { i =>
      (s"g${i % 7}", math.floor(rnd.nextDouble() * 50) / 10.0, i.toLong) // deliberate score ties
    }
    val df = rows.toDF("g", "s", "id")
    assert(viaAgg(df, 5) == viaWindow(df, 5))
    // merge correctness: partial buffers from many partitions combine
    assert(viaAgg(df.repartition(17), 5) == viaWindow(df, 5))
    assert(viaAgg(df.repartition(1), 5) == viaWindow(df, 5))
  }

  test("k exceeding the group size returns the whole group, ordered") {
    val df = Seq(("a", 1.0, 1L), ("a", 3.0, 2L), ("b", 2.0, 3L)).toDF("g", "s", "id")
    val out = df.groupBy("g").agg(Ranking.topKBy(col("s"), col("id"), 10).as("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") == Seq((3.0, 2L), (1.0, 1L)))
    assert(out("b") == Seq((2.0, 3L)))
  }

  test("NULL scores and ids are ignored; all-NULL group yields an empty array") {
    val df = Seq(("a", Some(2.0), Some(1L)), ("a", None, Some(2L)),
      ("a", Some(9.0), None), ("b", None, None))
      .toDF("g", "s", "id")
    val out = df.groupBy("g").agg(Ranking.topKBy(col("s"), col("id"), 3).as("top"))
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") == Seq((2.0, 1L)))
    assert(out("b") == Seq.empty)
  }

  test("plans as a partial-merge aggregate, not a window sort") {
    val df = Seq(("a", 1.0, 1L)).toDF("g", "s", "id")
    val plan = df.groupBy("g").agg(Ranking.topKBy(col("s"), col("id"), 3).as("top"))
      .queryExecution.executedPlan.toString()
    assert(!plan.contains("Window"), s"top-k must not plan a window:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected an imperative aggregate:\n$plan")
    assert(plan.contains("partial_"), s"map-side partial aggregation missing:\n$plan")
  }

  test("SQL registration: graft_top_k_by works in spark.sql") {
    graft.functions.GraftFunctions.register(spark)
    Seq(("a", 5.0, 1L), ("a", 7.0, 2L)).toDF("g", "s", "id")
      .createOrReplaceTempView("tk")
    val out = spark.sql(
      "SELECT g, graft_top_k_by(s, id, 1) AS top FROM tk GROUP BY g")
      .as[(String, Seq[(Double, Long)])].collect().toMap
    assert(out("a") == Seq((7.0, 2L)))
  }

  test("heavyHitters: exact answer, partition-count-invariant, guarantee holds") {
    import org.apache.spark.sql.functions._
    // 1000 rows: "hot" 400×, "warm" 120×, 480 distinct singletons
    val rows = Seq.fill(400)("hot") ++ Seq.fill(120)("warm") ++
      (1 to 480).map(i => s"cold_$i")
    val expected = Map("hot" -> 400L, "warm" -> 120L) // phi=0.1 → thr=100
    Seq(1, 4, 13).foreach { parts =>
      val df = spark.createDataset(rows)(org.apache.spark.sql.Encoders.STRING)
        .toDF("w").repartition(parts)
      val out = Ranking.heavyHitters(df, "w", phi = 0.1, k = 16)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(out == expected, s"parts=$parts: $out")
    }
    // k below the guarantee bound refuses loudly
    intercept[IllegalArgumentException] {
      Ranking.heavyHitters(Seq("x").toDF("w"), "w", phi = 0.01, k = 10)
    }
    // the raw sketch keeps at most k counters and always contains the
    // guaranteed-frequent items
    val sk = Seq.fill(300)("hot").++((1 to 700).map(i => s"c$i")).toDF("w")
      .agg(Ranking.misraGries(col("w"), 8)).head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(sk.size <= 8)
    assert(sk.exists(_.getString(0) == "hot"), "freq > n/(k+1) item must survive")
  }

  test("graft_misra_gries is SQL-registered") {
    graft.functions.GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("w").createOrReplaceTempView("mg_t")
    val out = spark.sql("SELECT graft_misra_gries(w, 4) FROM mg_t").head()
      .getSeq[org.apache.spark.sql.Row](0)
    assert(out.map(r => (r.getString(0), r.getLong(1))) == Seq(("a", 2L), ("b", 1L)))
  }

  test("skyline2d: dominated points drop, frontier duplicates counted, ties kept") {
    import spark.implicits._
    // (size, price): frontier is (3,10) and (5,30); (4,40) is dominated by
    // (5,30); (3,50) dominated within its own size; (5,30) appears twice.
    val pts = Seq((3L, 10L), (3L, 50L), (4L, 40L), (5L, 30L), (5L, 30L))
      .toDF("size", "price")
    val out = Ranking.skyline2d(pts, "size", "price")
      .orderBy("up").collect()
      .map(r => (r.getAs[Long]("up"), r.getAs[Long]("down"), r.getAs[Long]("n_rows")))
    assert(out.toSeq == Seq((3L, 10L, 1L), (5L, 30L, 2L)))
    // a point equal in one dim and better in the other still dominates
    val eq = Seq((2L, 10L), (2L, 20L)).toDF("size", "price")
    val out2 = Ranking.skyline2d(eq, "size", "price").collect()
      .map(r => (r.getAs[Long]("up"), r.getAs[Long]("down")))
    assert(out2.toSeq == Seq((2L, 10L)))
  }

  test("ndcgAtK: hand-graded example; perfect ranking = 1e6 ppm; all-zero rel NULLs") {
    import spark.implicits._
    val rows = Seq(
      // q1: system order by score = rels (3, 0, 2), rel-1 doc at rank 4 (outside k)
      (1L, 1L, 9.0, 3L), (1L, 2L, 8.0, 0L), (1L, 3L, 7.0, 2L), (1L, 4L, 6.0, 1L),
      // q2: system order == ideal order
      (2L, 1L, 9.0, 2L), (2L, 2L, 8.0, 1L), (2L, 3L, 7.0, 0L),
      // q3: nothing relevant
      (3L, 1L, 9.0, 0L), (3L, 2L, 8.0, 0L))
      .toDF("q", "cand", "score", "rel")
    val out = Ranking.ndcgAtK(rows, "q", "score", "cand", "rel", k = 3)
      .orderBy("q").collect()
    val d = Ranking.dcgDiscountUnits(3)
    def g(r: Long) = (1L << r) - 1
    val dcg1 = g(3) * d(0) + g(0) * d(1) + g(2) * d(2)
    val idcg1 = g(3) * d(0) + g(2) * d(1) + g(1) * d(2)
    assert(out(0).getLong(1) == dcg1 && out(0).getLong(2) == idcg1)
    assert(out(0).getLong(3) == dcg1 * 1000000L / idcg1)
    assert(out(0).getLong(3) < 1000000L, "imperfect ranking scores below 1")
    assert(out(1).getLong(3) == 1000000L, "system == ideal scores exactly 1e6")
    assert(out(2).getLong(1) == 0L && out(2).getLong(2) == 0L && out(2).isNullAt(3),
      "no relevant docs: 0/0 NULL-gates, never divides")
  }

  test("ndcgAtK discounts are the inlined log2 literals, monotone decreasing") {
    val d = Ranking.dcgDiscountUnits(10)
    assert(d.head == 1000000000L, "rank 1: 1/log2(2) = 1")
    assert(d == d.sorted.reverse && d.distinct == d, "strictly decreasing")
    assert(d(9) == math.floor(1e9 / (math.log(11.0) / math.log(2.0))).toLong)
  }
}
