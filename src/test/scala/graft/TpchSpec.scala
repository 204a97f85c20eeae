package graft

import org.apache.spark.sql.functions._

/** Invariants over the TPC-H family (sf0.001) that the row-hash oracle
  * can't express: plan shapes (broadcast joins where a dim is small,
  * no distinct-aggregate Expand in Q21's rewrite) and cross-column
  * semantic relations inside one result. */
class TpchSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def run(name: String) = SparkEntry.queries(name)(spark, dir)
  private def plan(name: String) =
    run(name).queryExecution.executedPlan.toString

  test("q1: discounted price never exceeds base price, groups partition the scan") {
    val rows = run("j_tpch_q1").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val base = r.getAs[Double]("sum_base_price")
      val disc = r.getAs[Double]("sum_disc_price")
      val charge = r.getAs[Double]("sum_charge")
      assert(disc <= base, s"discounting raised revenue: $disc > $base")
      assert(charge >= disc, s"tax lowered the charge: $charge < $disc")
    }
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val expected = Tables.lineitem(spark, dir)
      .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("2001-09-01 00:00:00")))
      .count()
    assert(total == expected, "Q1 groups must partition the filtered scan")
  }

  test("q4: semi-join counts bound by the window's order count") {
    val counted = run("j_tpch_q4").agg(sum("order_count")).head.getLong(0)
    val window = Tables.orders(spark, dir)
      .filter(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-07-01 00:00:00"))
        && col("o_orderdate") < lit(java.sql.Timestamp.valueOf("1996-10-01 00:00:00")))
      .count()
    assert(counted > 0 && counted <= window)
  }

  test("q8: market share is a proper fraction") {
    val rows = run("j_tpch_q8").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Double]("mkt_share")
      assert(s >= 0.0 && s <= 1.0, s"share $s outside [0,1]")
    }
  }

  test("q13: the count distribution partitions all customers") {
    val total = run("j_tpch_q13").agg(sum("custdist")).head.getLong(0)
    assert(total == Tables.customer(spark, dir).count())
  }

  test("q15: every returned supplier ties at the same max revenue") {
    val revs = run("j_tpch_q15").collect().map(_.getAs[Double]("total_revenue"))
    assert(revs.nonEmpty)
    assert(revs.distinct.length == 1, s"non-max rows leaked: ${revs.toSeq}")
  }

  test("q18: every surviving order really exceeds the quantity threshold") {
    val rows = run("j_tpch_q18").collect()
    assert(rows.nonEmpty)
    rows.foreach(r =>
      assert(r.getAs[Double]("sum_qty") > 300.0,
        s"order ${r.getAs[Long]("o_orderkey")} under threshold"))
  }

  test("q21 rewrite plans without a distinct-aggregate Expand") {
    // the EXISTS/NOT-EXISTS correlation is rewritten as two-level
    // aggregates precisely to avoid Expand's row doubling at scale
    assert(!plan("j_tpch_q21").contains("Expand"),
      "Q21 regressed to a distinct-aggregate Expand")
  }

  test("dimension joins broadcast (q7, q14, q19)") {
    Seq("j_tpch_q7", "j_tpch_q14", "j_tpch_q19").foreach { q =>
      assert(plan(q).contains("BroadcastHashJoin"),
        s"$q lost its broadcast dimension join")
    }
  }

  test("q21 agrees with the literal EXISTS/NOT-EXISTS formulation") {
    // independent model: correlated semi/anti joins straight off the
    // spec text, no shared code with the two-level-aggregate rewrite
    val l = Tables.lineitem(spark, dir).select("l_orderkey", "l_suppkey", "l_shipdate")
    val o = Tables.orders(spark, dir).filter(col("o_orderstatus") === "F")
      .select("o_orderkey", "o_orderdate")
    val l1 = l.join(o, col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
    val l2 = l.select(col("l_orderkey").as("e_okey"), col("l_suppkey").as("e_skey"))
    val withExists = l1.join(l2,
      col("l_orderkey") === col("e_okey") && col("l_suppkey") =!= col("e_skey"),
      "left_semi")
    val l3 = l1.select(col("l_orderkey").as("n_okey"), col("l_suppkey").as("n_skey"))
    val model = withExists.join(l3,
      col("l_orderkey") === col("n_okey") && col("l_suppkey") =!= col("n_skey"),
      "left_anti")
      .join(Tables.supplier(spark, dir), col("l_suppkey") === col("s_suppkey"))
      .groupBy("s_name").agg(count(lit(1)).as("numwait"))
    val got = run("j_tpch_q21").select("s_name", "numwait")
    assert(got.exceptAll(model).isEmpty && model.exceptAll(got).isEmpty,
      "two-level-aggregate rewrite diverges from the EXISTS model")
  }
}
