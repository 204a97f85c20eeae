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

  test("query names are unique across the contributing inventories") {
    // SparkEntry merges four Maps with ++; a name collision silently
    // drops the earlier query (found live: two distinct p_string_funcs).
    import graft.queries._
    val all = RefQueries.queries.map(_.name) ++ TpchQueries.queries.map(_.name) ++
      AnalyticsQueries.queries.map(_.name) ++ ExtQueries.queries.map(_.name)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names (later map shadows earlier): $dups")
    assert(SparkEntry.queries.size == all.size)
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

  test("sim_ivf_recall: recall@5 is non-decreasing in nprobe") {
    // nprobe=2's candidate cells are a superset of nprobe=1's, so hits
    // against the exact top-5 can only grow (any displacing item must
    // outrank the displaced one and is therefore itself a true hit)
    val rows = SparkEntry.queries("sim_ivf_recall")(spark, dir)
      .orderBy("nprobe").collect()
    assert(rows.length == 2)
    val (r1, r2) = (rows(0).getDouble(2), rows(1).getDouble(2))
    assert(r1 > 0.0, "nprobe=1 probe found nothing")
    assert(r2 >= r1, s"recall regressed with a larger probe: $r1 -> $r2")
  }

  test("stream_retention_final equals the batch retention triangle") {
    val streamed = SparkEntry.queries("stream_retention_final")(spark, dir).collect().toSeq
    val batch = SparkEntry.queries("ev_retention")(spark, dir).collect().toSeq
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("rows-only queries are non-empty (driver records row counts)") {
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    rowsOnly.foreach { name =>
      assert(SparkEntry.queries(name)(spark, dir).count() > 0, s"$name returned 0 rows")
    }
  }
}
