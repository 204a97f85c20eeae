package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Delta-style table constraints (`ALTER TABLE ... ADD CONSTRAINT ...
 * CHECK`, `NOT NULL`) enforced ON WRITE: wrap the outgoing DataFrame so
 * any violating row aborts the job before a byte lands in the table.
 * Combined with [[Warehouse.atomicOverwrite]]'s tmp-swap (or
 * [[SnapshotStore]]'s manifest commit), a tripped constraint leaves the
 * previous generation fully readable — write-abort atomicity, exactly
 * the Delta contract (reference counterpart: the dbt `not_null` /
 * `accepted_values` schema tests, dbt/lakehouse_models/models/
 * schema.yml, which VALIDATE after materialization; enforcement at
 * write time is the engine-grade upgrade).
 *
 * Enforcement is IN-PLAN (`raise_error` branches riding the output
 * columns — the zscore/gap-fill guard pattern): distributed, evaluated
 * for every row, zero extra scans or probe jobs at any table size.
 * CHECK semantics follow SQL: a NULL predicate PASSES (violation is
 * `pred IS FALSE`), so range checks don't double as NULL checks —
 * declare NOT NULL explicitly.
 */
object Constraints {

  /** `df` with every row validated: NOT NULL over `notNull` columns,
    * and each named CHECK predicate. The returned frame is otherwise
    * IDENTICAL (column names, types, and values; guarded columns relax
    * the nullable flag — a CASE branch is nullable as far as the
    * analyzer knows, parquet round-trips it back) — validation rides
    * the existing columns, so it composes with any writer. Unknown
    * columns fail fast at build time.
    *
    * Pruning survival: each CHECK rides EVERY column its predicate
    * references (falling back to the first output column for
    * column-free predicates), and NOT NULL rides its own column — so a
    * downstream projection keeps enforcement for as long as it keeps
    * any column the constraint is ABOUT. The residual caveat: a
    * consumer that prunes every referenced column (a bare `count()`,
    * a projection of only unrelated columns) skips those guards —
    * enforcement is a property of the columns flowing to the sink, so
    * compose `enforce` with full-row writers (as every in-repo caller
    * does), not with column-pruning readers. Predicates should be
    * deterministic: a multi-carrier CHECK evaluates once per carrier. */
  def enforce(df: DataFrame, notNull: Seq[String] = Nil,
              checks: Map[String, Column] = Map.empty): DataFrame = {
    val missing = notNull.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Constraints.enforce: NOT NULL column(s) not in schema: ${missing.mkString(", ")}")
    require(df.columns.nonEmpty, "Constraints.enforce: empty schema")
    val guarded = scala.collection.mutable.LinkedHashMap(df.columns.map { c =>
      val base = col(c)
      c -> (if (notNull.contains(c))
        when(base.isNull,
          raise_error(lit(s"NOT NULL constraint violated: column $c"))
            .cast(df.schema(c).dataType))
          .otherwise(base)
      else base)
    }: _*)
    checks.toSeq.sortBy(_._1).foreach { case (name, pred) =>
      // the columns the predicate is ABOUT, read off a throwaway
      // analyzed projection (build-time only; Column.expr is gone in
      // Spark 4's Column API)
      val refs = df.select(pred.as("__check")).queryExecution.analyzed
        .expressions.flatMap(_.references.map(_.name))
        .distinct.filter(df.columns.contains(_)).toSeq
      val carriers = if (refs.nonEmpty) refs else Seq(df.columns.head)
      carriers.foreach { c =>
        // SQL CHECK: NULL predicate passes; only a provably-false row violates
        guarded(c) = when(coalesce(pred, lit(true)) === false,
          raise_error(lit(s"CHECK constraint '$name' violated"))
            .cast(df.schema(c).dataType))
          .otherwise(guarded(c))
      }
    }
    df.select(df.columns.map(c => guarded(c).as(c)): _*)
  }
}
