package graft

/** Contract-level checks over the whole query inventory (sf0.001). */
class QueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows (driver smoke check)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    val orphans = SparkEntry.oracleSql.keySet -- qs
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("approx_count_distinct stays within the Spark-side HLL bound") {
    // the query itself bound-checks the estimate (approx_ok, also
    // asserted by the oracle); here we just require the flag holds
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getInt(2) == 1, s"flag ${r.getString(0)}: HLL estimate out of bound")
    }
  }

  test("rows-only queries are non-empty (driver records row counts)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    rowsOnly.foreach { name =>
      assert(SparkEntry.queries(name)(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }
}
