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
    * columns fail fast at build time. */
  def enforce(df: DataFrame, notNull: Seq[String] = Nil,
              checks: Map[String, Column] = Map.empty): DataFrame = {
    val missing = notNull.filterNot(df.columns.contains)
    require(missing.isEmpty,
      s"Constraints.enforce: NOT NULL column(s) not in schema: ${missing.mkString(", ")}")
    require(df.columns.nonEmpty, "Constraints.enforce: empty schema")
    val guarded = df.columns.map { c =>
      val base = col(c)
      if (notNull.contains(c))
        when(base.isNull,
          raise_error(lit(s"NOT NULL constraint violated: column $c"))
            .cast(df.schema(c).dataType))
          .otherwise(base)
      else base
    }
    // CHECK guards fold onto the first column — one designated carrier
    // is enough: every output row evaluates every output column
    val head = df.columns.head
    val withChecks = checks.toSeq.sortBy(_._1).foldLeft(guarded(0)) {
      case (acc, (name, pred)) =>
        // SQL CHECK: NULL predicate passes; only a provably-false row violates
        when(coalesce(pred, lit(true)) === false,
          raise_error(lit(s"CHECK constraint '$name' violated"))
            .cast(df.schema(head).dataType))
          .otherwise(acc)
    }
    df.select((withChecks.as(head) +: guarded.tail.zip(df.columns.tail).map {
      case (g, c) => g.as(c)
    }): _*)
  }
}
