package graft

/** Structural sweep over EVERY registered query's physical plan at
  * sf0.001: no accidental CartesianProduct may ever appear. A cartesian
  * at 100 TB is a non-starter, and a refactor that silently downgrades
  * a broadcast-hinted cross join (BroadcastNestedLoopJoin — fine, the
  * small side is bounded) into a real CartesianProduct would otherwise
  * only be caught by a human reading .explain. j_cross is the one
  * declared exception: its PURPOSE is cross-join semantics over two
  * 5-25-row dimension tables, where the cartesian IS the operator.
  *
  * Building a plan does not execute it, but some builders materialize
  * bounded state (scalar watermark reads, checkpointed graph rounds,
  * warehouse fixtures) — that's why this runs at the tiny SF. */
class PlanShapeSpec extends SparkSpec {

  private val allowedCartesian = Set("j_cross")

  test("no query plan contains an undeclared CartesianProduct") {
    val dir = "/root/testdata/sf0.001"
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan.toString
      if (plan.contains("CartesianProduct") && !allowedCartesian.contains(name))
        Some(name)
      else None
    }
    assert(offenders.isEmpty, s"cartesian products in: ${offenders.mkString(", ")}")
  }

  test("eps/kNN hot paths run the codegen'd distance kernel, not the interpreted fold") {
    // the r15 lesson: the HOF fold costs ~µs per pair through the
    // interpreter (sim_dbscan read 57 s at sf0.1 before the kernel) —
    // pin graft_dist_sq into the candidate-verify plans so a refactor
    // can't silently reintroduce the fold. Asserted on the op-level
    // frames: the registered queries localCheckpoint the eps-graph, so
    // their FINAL plans start from checkpointed RDDs and the verify
    // stage isn't visible there.
    import spark.implicits._
    import graft.ops.Similarity
    val emb = (0 until 8).map(i => (i.toLong, Array(i * 1.0, i * 2.0)))
      .toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(0.0, 0.0))).toDF("c_id", "c_vec")
    val rs = Similarity.rangeSearch(emb, emb.select("vec_id"), "embedding",
        "vec_id", cents, "c_vec", "c_id", maxDist = 3.0)
      .queryExecution.executedPlan.toString
    assert(rs.contains("graft_dist_sq"),
      "rangeSearch must verify candidates with the native DistanceSquared kernel")
    // dbscan routes its eps-graph through rangeSearch, so this plan is
    // the assertable spot; dbscanLsh builds the same distSq verify
    // directly but checkpoints right after it (its kernel use is pinned
    // by the code path + the planted-recovery spec instead).
  }
}
