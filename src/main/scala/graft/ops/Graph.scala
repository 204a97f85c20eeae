package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Iterative graph analytics over edge DataFrames — the second graph
 * operator family next to [[Dedup.connectedComponents]] (which powers
 * corpus dedup). The reference has no graph surface; this is north-star
 * extension territory: entity-importance ranking over interaction
 * graphs (customer↔supplier, doc↔doc similarity edges) is a standard
 * curation signal for training-data pipelines (e.g. graph-based page
 * quality in web-corpus cleaning).
 *
 * Scale shape: rank iteration is one keyed join + one keyed aggregate
 * per round over the edge table — the classic distributed PageRank
 * plan. Edges are the big side and are never collected, never
 * broadcast; each iteration's rank table (one row per NODE, orders of
 * magnitude smaller than edges) is cached and materialized per round,
 * same discipline as connectedComponents.
 *
 * Determinism: rank mass is carried in FIXED-POINT BIGINTs (units of
 * 1e-15), so every per-round operation — integer division for the
 * out-degree split and the damping ratio, integer SUM for the gather —
 * is exact and order-independent. Floating-point sums are
 * order-dependent and Spark's partial-aggregation order is not
 * reproducible, and a `CAST(double AS DECIMAL(38,18))` detour is NOT
 * engine-portable either (conversion precision differs in the low
 * digits); integer arithmetic is the only representation every engine
 * agrees on bit-for-bit. The ≤1e-15-per-op truncation is far below any
 * ranking-relevant difference.
 */
object Graph {

  /** Fixed-point unit: ranks are stored as BIGINT multiples of 1e-15.
    * Total mass is SCALE (< 2^53, so the final `rank/SCALE` double
    * conversion is exact-then-correctly-rounded in every engine). */
  val SCALE: Long = 1000000000000000L

  /** PageRank over a DIRECTED edge list `(src, dst)` for a fixed
    * iteration count (fixed-point iteration with explicit rounds — the
    * form every distributed implementation uses; convergence-threshold
    * variants just wrap this loop).
    *
    * `rank_0(v) = 1/N`;
    * `rank_i(v) = (1-d)/N + d * Σ_{(u,v)∈E} rank_{i-1}(u) / outdeg(u)`,
    * with `d = dampingPerMille/1000` evaluated in integer arithmetic.
    *
    * Nodes = src ∪ dst. Dangling nodes (no out-edges) leak their mass,
    * the simple-and-standard treatment; pass a symmetrized edge list
    * (both directions per undirected edge) to avoid dangling nodes
    * entirely. `N` is one scalar count — the same bounded driver read
    * as a watermark. Output: `(node, rank: Double)`, one row per node.
    *
    * `weightCol`: optional positive integer edge weights — rank splits
    * proportionally, `contrib = rank·w div strength(u)` with
    * `strength = Σw` per source (weight 1 everywhere reduces to the
    * unweighted arithmetic exactly). Weights must satisfy
    * `max(w) ≤ 2^63/SCALE ≈ 9220` so `rank·w` cannot overflow —
    * enforced with one scalar read; pre-bucket heavier weights.
    */
  def pageRank(edges: DataFrame, iterations: Int,
               dampingPerMille: Int = 850,
               materializeEvery: Int = 4,
               weightCol: Option[String] = None): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    require(dampingPerMille > 0 && dampingPerMille < 1000,
      s"pageRank: dampingPerMille must be in (0, 1000), got $dampingPerMille")
    require(materializeEvery >= 1, "pageRank: materializeEvery must be >= 1")
    // the edge table is read every round (plus nodes + outdeg below) —
    // cache it once instead of re-deriving the upstream pipeline 5×;
    // DataFrame cache is MEMORY_AND_DISK, so an edge set bigger than
    // cluster memory degrades to local-disk reads, not recompute.
    // Pre-partitioned by dst: the per-round gather joins broadcast the
    // (tiny) rank/degree tables onto the edges, which preserves this
    // partitioning through the aliasing projection, so the groupBy(dst)
    // aggregate needs NO exchange — zero per-round edge shuffles. One
    // shuffle up front buys them all.
    // NULL endpoints can't participate in an equi-join gather and would
    // silently hold a base-rank-only row — drop them up front
    val w = weightCol.map(col).getOrElse(lit(1L)).cast("bigint").as("w")
    val e = edges.select(col("src"), col("dst"), w)
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    nodes.cache()
    val n = nodes.count() // materializes the node cache too
    require(n > 0, "pageRank: empty edge list")
    if (weightCol.isDefined) {
      val wStats = e.agg(min(col("w")), max(col("w"))).head
      require(wStats.getLong(0) >= 1, "pageRank: weights must be positive integers")
      require(wStats.getLong(1) <= Long.MaxValue / SCALE,
        s"pageRank: max weight ${wStats.getLong(1)} would overflow rank*w " +
          s"(cap is ${Long.MaxValue / SCALE}); pre-bucket weights")
    }
    val outDeg = e.groupBy(col("src")).agg(sum(col("w")).as("strength"))
    outDeg.cache()
    // (1-d)/N in fixed point; Long division truncates identically to
    // the SQL `div`/`//` the per-round arithmetic uses
    val baseInt = (1000L - dampingPerMille) * SCALE / (1000L * n)
    var ranks = nodes.withColumn("rank", lit(SCALE / n))
    for (round <- 1 to iterations) {
      val contribs = e
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(broadcast(outDeg), Seq("src"))
        .selectExpr("dst AS node", "(rank * w) div strength AS contrib")
      val updated = nodes
        .join(contribs.groupBy(col("node")).agg(sum(col("contrib")).as("in_rank")),
          Seq("node"), "left")
        .selectExpr("node",
          s"$baseInt + ($dampingPerMille * coalesce(in_rank, 0)) div 1000 AS rank")
      // cut the lineage every few rounds so deep iteration keeps plans
      // bounded, without paying a job barrier per round when shallow.
      // localCheckpoint (not cache): a chain of cached generations
      // NESTS each prior InMemoryRelation's plan inside the next — plan
      // strings grow superlinearly and a deep run OOMs just RENDERING
      // them; the checkpoint truncates to a constant-size leaf. (On a
      // cluster where executor loss matters, swap for reliable
      // `checkpoint()` against the checkpoint dir — same call shape.)
      ranks =
        if (round % materializeEvery == 0 && round < iterations)
          updated.localCheckpoint()
        else updated
    }
    val result = ranks.select(col("node"),
      (col("rank").cast(DoubleType) / lit(SCALE.toDouble)).as("rank"))
      .cache()
    result.count() // materialize before dropping the inputs it reads
    e.unpersist()
    nodes.unpersist()
    outDeg.unpersist()
    result
  }

  /** PageRank iterated to a FIXED POINT: stops when no node's rank
    * moved more than `tolUnits` fixed-point units (1e-15 each) in a
    * round, or at `maxIter`. Returns `(ranks, roundsRun)`.
    *
    * The convergence probe is `max(|rank − prev|)` — a keyed join on
    * the two one-row-per-node rank tables plus a scalar aggregate, the
    * same bounded driver read as [[Dedup.connectedComponents]]'s
    * changed-label count; the edge table is untouched by the probe.
    * Because the arithmetic is exact integer fixed-point, the round
    * count at a given tolerance is DETERMINISTIC — identical on every
    * cluster layout, which makes convergence-stopped runs reproducible
    * (a floating-point loop cannot promise that: its termination round
    * can flip with summation order). Non-convergence at maxIter fails
    * loudly rather than returning silently-unconverged ranks. */
  def pageRankConverged(edges: DataFrame, maxIter: Int = 50,
                        tolUnits: Long = 1000L, // 1e-12 rank units
                        dampingPerMille: Int = 850): (DataFrame, Int) = {
    require(maxIter >= 1 && tolUnits >= 0, "pageRankConverged: bad maxIter/tolUnits")
    require(dampingPerMille > 0 && dampingPerMille < 1000,
      s"pageRankConverged: dampingPerMille must be in (0, 1000), got $dampingPerMille")
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("dst")).cache()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    nodes.cache()
    val n = nodes.count()
    require(n > 0, "pageRankConverged: empty edge list")
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("out_deg"))
    outDeg.cache()
    val baseInt = (1000L - dampingPerMille) * SCALE / (1000L * n)
    // every round is materialized by the convergence probe anyway, so
    // localCheckpoint each generation — constant-size plans (see the
    // cache-nesting note in pageRank) at no extra job cost
    var ranks = nodes.withColumn("rank", lit(SCALE / n)).localCheckpoint()
    var round = 0
    var moved = Long.MaxValue
    while (round < maxIter && moved > tolUnits) {
      val contribs = e
        .join(broadcast(ranks.withColumnRenamed("node", "src")), Seq("src"))
        .join(broadcast(outDeg), Seq("src"))
        .selectExpr("dst AS node", "rank div out_deg AS contrib")
      val updated = nodes
        .join(contribs.groupBy(col("node")).agg(sum(col("contrib")).as("in_rank")),
          Seq("node"), "left")
        .selectExpr("node",
          s"$baseInt + ($dampingPerMille * coalesce(in_rank, 0)) div 1000 AS rank")
        .localCheckpoint()
      moved = updated.join(ranks.withColumnRenamed("rank", "prev_rank"), Seq("node"))
        .agg(max(abs(col("rank") - col("prev_rank")))).head.getLong(0)
      ranks = updated
      round += 1
    }
    require(moved <= tolUnits,
      s"pageRankConverged: still moving $moved units after $maxIter rounds " +
        "(raise maxIter or tolUnits)")
    val result = ranks.select(col("node"),
      (col("rank").cast(DoubleType) / lit(SCALE.toDouble)).as("rank"))
    e.unpersist()
    nodes.unpersist()
    outDeg.unpersist()
    (result, round)
  }
}
