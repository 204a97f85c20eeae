package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Physical-plan assertions: the scale properties the engine claims
  * (pushdown, pruning, broadcast, bucketed shuffle elimination,
  * whole-stage codegen) verified against actual plans, so a regression
  * that silently de-optimizes a query fails CI, not a 100 TB run. */
class PlanSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan.toString

  test("s4: filters reach the parquet scan; only needed columns are read") {
    val plan = planOf("s4_pushdown_scan")
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_quantity), LessThan(l_shipdate"),
      s"filter not pushed:\n$plan")
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double,l_shipdate"),
      s"column pruning lost:\n$plan")
    assert(!plan.contains("l_extendedprice"), "scan reads columns the query never uses")
  }

  test("star joins broadcast the small dimensions") {
    val plan = planOf("j_inner_3way")
    assert(plan.split("BroadcastHashJoin").length - 1 == 2, s"expected 2 broadcast joins:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "dimension join degraded to sort-merge")
  }

  test("grouped aggregation is partial+final around a single shuffle") {
    val plan = planOf("agg_stats_by_flag")
    assert(plan.contains("partial_count") || plan.contains("partial_sum"),
      s"no map-side partial aggregation:\n$plan")
  }

  /** Final-plan section only (AQE's toString repeats the initial plan). */
  private def finalPlanOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, dir)
    df.collect() // finalize the adaptive plan
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
  }

  test("text stats are one narrow projection over the scan — no UDFs, no extra shuffle") {
    val plan = finalPlanOf("t_text_stats")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      "a UDF barrier appeared in the text pipeline")
    // the presentation sort is the ONLY exchange; the stats themselves are narrow
    assert(plan.split("Exchange").length - 1 <= 1, s"unexpected shuffle:\n$plan")
  }

  test("pii redaction and rule gate stay narrow: presentation sort is the only exchange") {
    for (q <- Seq("t_pii_redact", "t_gopher_rules")) {
      val plan = finalPlanOf(q)
      assert(plan.split("Exchange").length - 1 <= 1, s"$q grew a shuffle:\n$plan")
      assert(!plan.contains("ScalaUDF"), s"$q uses a UDF barrier")
    }
  }

  test("ivf search never plans a cartesian product") {
    val plan = finalPlanOf("sim_ivf_search")
    assert(!plan.contains("CartesianProduct"),
      s"IVF probe degraded to an all-pairs cross join:\n$plan")
  }

  test("silver projection executes inside whole-stage codegen") {
    // codegen'd stages render as `*(n)` prefixes in the executed plan
    assert(finalPlanOf("p_silver_projection").contains("*(1) Project"))
  }

  test("watermark-derived predicates prune hive partitions (SURVEY §4)") {
    import graft.engine.Incremental
    val root = Files.createTempDirectory("graft_part").toString
    val silver = graft.ops.StockOps.silverDaily(
      graft.ops.StockOps.bronzeFromLineitem(Tables.lineitem(spark, dir)))
      .withColumn("year", year(col("data_pregao")))
      .withColumn("month", month(col("data_pregao")))
    silver.write.mode("overwrite").partitionBy("year", "month").parquet(root)
    val wm = java.sql.Date.valueOf("1997-06-15")
    val pruned = Incremental.partitionPrunedAtOrAfter(
      spark.read.parquet(root), col("data_pregao"), wm)
    val plan = pruned.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("year"),
      s"no partition pruning:\n$plan")
    // exactness: pruned read == plain row filter on the same data
    val plain = spark.read.parquet(root).filter(col("data_pregao") >= lit(wm))
    assert(pruned.count() == plain.count() && pruned.count() > 0)
  }

  test("native sketches: no shuffle or aggregate below the band-bucket join") {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    for ((q, native) <- Seq("dd_minhash_lsh" -> "graft_minhash",
                            "dd_simhash" -> "graft_simhash")) {
      val plan = SparkEntry.queries(q)(spark, dir).queryExecution.sparkPlan
      assert(plan.toString.contains(native), s"$q lost the native sketch expression")
      // signature building must be a pure projection: any Exchange or
      // aggregate in the plan may only implement pair-distinct/sort
      // ABOVE the join, never signature construction below it
      plan.foreach {
        case e: ShuffleExchangeLike =>
          assert(e.find(_.isInstanceOf[BaseJoinExec]).isDefined,
            s"$q shuffles below the band join:\n$plan")
        case a: BaseAggregateExec =>
          assert(a.find(_.isInstanceOf[BaseJoinExec]).isDefined,
            s"$q aggregates below the band join:\n$plan")
        case _ => ()
      }
    }
  }

  test("pipeline's incremental silver read is partition-pruned") {
    import graft.engine.{Incremental, Warehouse}
    import graft.queries.MedallionPipeline
    val whRoot = Files.createTempDirectory("graft_mpipe").toString
    MedallionPipeline.run(spark, dir, whRoot) // builds bronze + runs DAG twice
    val wh = new Warehouse(spark, whRoot)
    val wm = Incremental.maxWatermark(wh.read("silver", "daily_stocks"), "data_pregao")
    assert(wm.isDefined)
    // the EXACT source read the silver model performs on an incremental run
    val src = MedallionPipeline.silverSource(wh.read("bronze", "stocks"), wm)
    val plan = src.queryExecution.sparkPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("year"),
      s"silver incremental read does not prune bronze partitions:\n$plan")
  }

  test("bucketed tables co-locate the join: zero shuffle exchanges") {
    val s2 = spark.newSession()
    s2.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the SMJ path
    val whRoot = Files.createTempDirectory("graft_bkt").toString
    val wh = new graft.engine.Warehouse(s2, whRoot)
    val orders = Tables.orders(s2, dir)
    wh.writeBucketed(orders, "bkt", "orders_a", Seq("o_custkey"), 4, Seq("o_custkey"))
    wh.writeBucketed(orders.groupBy("o_custkey").agg(count(lit(1)).as("n")),
      "bkt", "orders_n", Seq("o_custkey"), 4, Seq("o_custkey"))
    // data files land under THIS warehouse's root, not the global dir
    assert(new java.io.File(s"$whRoot/bkt/orders_a").exists())
    val joined = wh.readBucketed("bkt", "orders_a").join(wh.readBucketed("bkt", "orders_n"), "o_custkey")
    val plan = joined.queryExecution.sparkPlan.toString
    assert(plan.contains("SortMergeJoin"), s"expected sort-merge join:\n$plan")
    assert(!plan.contains("Exchange"), s"bucketing failed to remove the shuffle:\n$plan")
    assert(joined.count() == orders.count())
    s2.sql(s"DROP TABLE IF EXISTS ${wh.bucketedTableName("bkt", "orders_a")}")
    s2.sql(s"DROP TABLE IF EXISTS ${wh.bucketedTableName("bkt", "orders_n")}")
  }

  test("zorder2 clusters with exactly one range exchange, no UDF") {
    val df = Tables.lineitem(spark, dir).select(
      (col("l_orderkey") % 1024).cast("long").as("x"),
      (col("l_partkey") % 1024).cast("long").as("y"))
    val plan = graft.ops.Layout.zorder2(df, "x", "y", 10, 8)
      .queryExecution.sparkPlan.toString
    assert(plan.split("Exchange").length - 1 == 1,
      s"z-order clustering should cost exactly one exchange:\n$plan")
    assert(plan.contains("rangepartitioning"), s"expected a range exchange:\n$plan")
    assert(!plan.contains("ScalaUDF"), "z-value left whole-stage codegen")
  }

  test("scd2 merge broadcasts the staged increment; never a cartesian product") {
    val plan = finalPlanOf("j3_scd2_merge")
    assert(!plan.contains("CartesianProduct"),
      s"SCD2 change detection degraded to a cross join:\n$plan")
    assert(plan.contains("BroadcastHashJoin"),
      s"small staged increment did not broadcast:\n$plan")
  }

  test("semantic dedup joins only within cells — no cartesian product") {
    // the only nested-loop is the broadcast centroid scoring; the pair
    // discovery itself must be a centroid_id equi-join
    val plan = finalPlanOf("dd_semantic")
    assert(!plan.contains("CartesianProduct"),
      s"semantic dedup degraded to all-pairs:\n$plan")
  }

  test("salted join broadcasts the exploded dim; big side never shuffles for the join") {
    val plan = finalPlanOf("skew_salted_join")
    assert(plan.contains("BroadcastHashJoin"),
      s"salted small side did not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"),
      s"salted join degraded:\n$plan")
    // shuffle exchanges: the post-join aggregate + presentation sort
    // only (BroadcastExchange is the point, not a shuffle) — the join
    // itself moves no big-side rows
    val shuffles = plan.split("Exchange hashpartitioning").length - 1 +
      (plan.split("Exchange rangepartitioning").length - 1)
    assert(shuffles <= 2, s"join shuffled the big side:\n$plan")
  }

  test("pageRank round: rank/degree broadcast onto dst-partitioned edges, gather has no exchange") {
    import spark.implicits._
    // the exact per-round shape Graph.pageRank builds: broadcast joins
    // onto the dst-pre-partitioned cached edge table, then groupBy(dst).
    // The one up-front repartition must be the ONLY hash exchange —
    // the aliasing projection preserves the partitioning into the
    // aggregate, so iterations never re-shuffle the edge table.
    val e = (1 to 1000).map(i => (i.toLong % 97, i.toLong % 89)).toDF("src", "dst")
      .repartition(col("dst")).cache()
    try {
      val ranks = (0L to 96L).map((_, 100L)).toDF("src", "rank")
      val deg = (0L to 96L).map((_, 3L)).toDF("src", "out_deg")
      val round = e.join(broadcast(ranks), Seq("src")).join(broadcast(deg), Seq("src"))
        .selectExpr("dst AS node", "rank div out_deg AS contrib")
        .groupBy(col("node")).agg(sum(col("contrib")).as("in_rank"))
      round.collect()
      val plan = round.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
      assert(plan.split("BroadcastHashJoin").length - 1 == 2,
        s"rank/degree tables did not broadcast:\n$plan")
      // the one hash exchange lives INSIDE the cached relation (the
      // up-front repartition); everything above the cache scan — joins,
      // projection, both aggregate halves — must be exchange-free
      val aboveCache = plan.split("InMemoryTableScan").head
      assert(aboveCache.split("Exchange hashpartitioning").length - 1 == 0,
        s"gather aggregate re-shuffled the edges:\n$plan")
    } finally e.unpersist()
  }

  test("URL canonicalization dedup: codegen expressions only, one narrow-key shuffle") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    val qe = SparkEntry.queries("dd_url_dedup")(spark, dir).queryExecution
    val plan = qe.executedPlan
    assert(!plan.toString.contains("ScalaUDF") && !plan.toString.contains("BatchEval"),
      s"canonicalizer must be expression-composed, no UDF:\n$plan")
    // one hash-aggregate shuffle on the ~60-byte canonical key plus the
    // presentation sort — nothing else may move data
    val shuffles = plan.collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.size <= 2, s"expected agg+sort shuffles only, got:\n$plan")
  }

  test("naive Bayes: vocabulary-keyed joins only — no cartesian, broadcast model legs") {
    val plan = SparkEntry.queries("ml_naive_bayes")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"NB must never go cartesian:\n$plan")
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"the model/scalar legs should broadcast:\n$plan")
  }

  test("systematic PPS never serializes the corpus through one partition") {
    // the scale claim behind Sampling.ppsSystematic: the global prefix
    // sum is range-partitioned + per-partition windows + broadcast
    // offsets — a global-ORDER-BY window would plan Exchange
    // SinglePartition and cap the operator at one task
    val plan = SparkEntry.queries("samp_pps_systematic")(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global-window smell:\n$plan")
  }
}
