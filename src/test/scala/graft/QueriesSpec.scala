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

  test("approx_count_distinct tracks the exact count within 5%") {
    val rows = SparkEntry.queries("agg_approx_distinct")(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (approx, exact) = (r.getLong(1).toDouble, r.getLong(2).toDouble)
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag ${r.getString(0)}: approx=$approx exact=$exact")
    }
  }

  test("rows-only queries are non-empty (driver records row counts)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    rowsOnly.foreach { name =>
      assert(SparkEntry.queries(name)(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }
}
