package graft

import graft.engine.{Constraints, Warehouse}
import org.apache.spark.sql.functions._

/** Write-time constraint enforcement: valid data passes through
  * bit-identical, violations abort BEFORE the table mutates (atomic
  * with the tmp-swap overwrite), and SQL CHECK NULL semantics hold. */
class ConstraintsSpec extends SparkSpec {
  import spark.implicits._

  private def chain(t: Throwable): Seq[String] =
    if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)

  private def rows = Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "name", "v")

  test("valid data passes through unchanged; NULL CHECK predicate passes") {
    val out = Constraints.enforce(rows, notNull = Seq("id", "name"),
      checks = Map("v_positive" -> (col("v") > 0)))
    // identical names/types/values; guard branches relax nullability metadata
    assert(out.schema.map(f => (f.name, f.dataType)) ==
      rows.schema.map(f => (f.name, f.dataType)))
    assert(out.orderBy("id").collect().toSeq == rows.orderBy("id").collect().toSeq)
    // NULL predicate = pass (SQL CHECK): v NULL does not trip v > 0
    val withNullV = Seq((3L, "c", Option.empty[Double])).toDF("id", "name", "v")
    assert(Constraints.enforce(withNullV, checks = Map("v_positive" -> (col("v") > 0)))
      .collect().length == 1)
  }

  test("NOT NULL and CHECK violations fail loudly, naming the constraint") {
    val nullName = Seq((1L, Option.empty[String], 1.0)).toDF("id", "name", "v")
    val e1 = intercept[Exception] {
      Constraints.enforce(nullName, notNull = Seq("name")).collect()
    }
    assert(chain(e1).exists(m => m.contains("NOT NULL") && m.contains("name")),
      chain(e1).mkString(" | "))
    val negative = Seq((1L, "a", -5.0)).toDF("id", "name", "v")
    val e2 = intercept[Exception] {
      Constraints.enforce(negative, checks = Map("v_positive" -> (col("v") > 0))).collect()
    }
    assert(chain(e2).exists(_.contains("v_positive")), chain(e2).mkString(" | "))
    // unknown NOT NULL column fails at build time, not run time
    intercept[IllegalArgumentException] {
      Constraints.enforce(rows, notNull = Seq("nope"))
    }
  }

  test("CHECK guards survive projections that keep any referenced column") {
    val negative = Seq((1L, "a", -5.0)).toDF("id", "name", "v")
    val enforced = Constraints.enforce(negative,
      checks = Map("v_positive" -> (col("v") > 0)))
    // the guard rides v (the referenced column), so selecting v alone —
    // pruning the old first-column carrier `id` — still enforces
    val e = intercept[Exception] { enforced.select("v").collect() }
    assert(chain(e).exists(_.contains("v_positive")), chain(e).mkString(" | "))
    // a multi-column predicate rides every referenced column
    val bad = Seq((5L, "x", 1.0)).toDF("id", "name", "v")
    val multi = Constraints.enforce(bad,
      checks = Map("id_lt_v" -> (col("id") < col("v"))))
    val e2 = intercept[Exception] { multi.select("name", "id").collect() }
    assert(chain(e2).exists(_.contains("id_lt_v")), chain(e2).mkString(" | "))
    // (pruning EVERY referenced column is the documented residual: the
    // guard MAY be skipped then — plan-dependent, so not asserted)
  }

  test("a tripped constraint aborts an atomicOverwrite; previous generation intact") {
    val wh = new Warehouse(spark,
      java.nio.file.Files.createTempDirectory("graft_cons_wh").toString)
    wh.atomicOverwrite(rows, "silver", "t")
    val bad = Seq((9L, "x", -1.0)).toDF("id", "name", "v")
    intercept[Exception] {
      wh.atomicOverwrite(
        Constraints.enforce(rows.unionByName(bad),
          checks = Map("v_positive" -> (col("v") > 0))),
        "silver", "t")
    }
    // the failed write never swapped in: table still holds the 2 valid rows
    assert(wh.read("silver", "t").count() == 2)
  }
}
