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
}
