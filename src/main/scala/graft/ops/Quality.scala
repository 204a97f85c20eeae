package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-quality checks — the dbt test surface (`unique`, `not_null`,
 * `accepted_values`, `relationships`) as engine operators. The
 * reference ships an empty dbt tests/ scaffold and instructs
 * `dbt test` (reference: README.md:89, dbt/lakehouse_models/tests/);
 * its only enforced contracts are runtime ones (unique_key MERGEs,
 * on_schema_change='fail', quality WHERE-filters — SURVEY.md §5). This
 * module gives those contracts a declarative, verifiable form: each
 * check is an aggregate returning its violation count, so a suite is
 * one union-all job — no driver loops, one pass per table.
 */
object Quality {

  /** dbt `unique`: number of key tuples occurring more than once. */
  def duplicateKeyCount(df: DataFrame, keys: Seq[String]): DataFrame =
    df.groupBy(keys.map(col): _*).count()
      .filter(col("count") > 1)
      .agg(count(lit(1)).as("n_violations"))

  /** dbt `not_null`: null count for a column (0 on an empty table —
    * SUM alone yields NULL there). */
  def nullCount(df: DataFrame, c: String): DataFrame =
    df.agg(coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L)).as("n_violations"))

  /** dbt `accepted_values`: rows whose column is outside the set. */
  def notAcceptedCount(df: DataFrame, c: String, allowed: Seq[String]): DataFrame =
    df.agg(coalesce(sum(when(!col(c).isInCollection(allowed) || col(c).isNull, 1L)
      .otherwise(0L)), lit(0L)).as("n_violations"))

  /** dbt `relationships`: child keys with no parent (referential
    * integrity) — a left-anti join count. */
  def orphanCount(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String): DataFrame =
    child.select(col(childKey))
      .join(parent.select(col(parentKey).as(childKey)), Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("n_violations"))

  /** Run a named suite of checks as ONE unioned job:
    * (check_name, n_violations) per check. */
  def suite(checks: Seq[(String, DataFrame)]): DataFrame =
    checks.map { case (name, c) =>
      c.select(lit(name).as("check_name"),
        coalesce(col("n_violations"), lit(0L)).cast("long").as("n_violations"))
    }.reduce(_ unionByName _)

  /**
   * K-ANONYMITY / L-DIVERSITY audit — the privacy gate a dataset passes
   * before release: every quasi-identifier combination must describe at
   * least `k` rows (else its members are re-identifiable) AND carry at
   * least `l` distinct values of the sensitive column (else membership
   * reveals the sensitive value even in a big group — the homogeneity
   * attack k-anonymity alone misses). Returns the VIOLATING equivalence
   * classes only: `(quasi..., n_rows, n_sensitive, violation)` with
   * violation ∈ {k_anonymity, l_diversity, both}.
   *
   * One keyed aggregate over the quasi columns (map-side combined;
   * count distinct of one column per group — bounded by the sensitive
   * domain). Exact integers; the suppression list this emits is the
   * deterministic input to a masking/generalization pass.
   */
  def kAnonymity(df: DataFrame, quasiCols: Seq[String], sensitiveCol: String,
                 k: Int, l: Int): DataFrame = {
    require(quasiCols.nonEmpty, "kAnonymity: quasi-identifier columns required")
    require(k >= 2 && l >= 1, s"kAnonymity: need k >= 2, l >= 1 (got $k, $l)")
    df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col(sensitiveCol)).as("n_sensitive"))
      .withColumn("violation",
        when(col("n_rows") < k && col("n_sensitive") < l, lit("both"))
          .when(col("n_rows") < k, lit("k_anonymity"))
          .when(col("n_sensitive") < l, lit("l_diversity")))
      .filter(col("violation").isNotNull)
  }

  /**
   * Keyed TABLE DIFF — the datacompy/reconciliation primitive: full
   * outer join two versions on the key and classify every row as
   * added / removed / changed / unchanged, with `changed_cols` naming
   * exactly the differing columns (null-safe comparison — NULL→value
   * and value→NULL are changes, NULL→NULL is not). One co-partitioned
   * full-outer shuffle; the classification is pure projection. The
   * audit answer "what exactly did this rewrite touch" that row
   * counts and checksums can't give.
   */
  def tableDiff(a: DataFrame, b: DataFrame, key: String,
                compareCols: Seq[String]): DataFrame = {
    require(compareCols.nonEmpty, "tableDiff: compare columns required")
    val aP = a.select(col(key) +: compareCols.map(c => col(c).as(s"a_$c")): _*)
      .withColumn("__in_a", lit(1))
    val bP = b.select(col(key) +: compareCols.map(c => col(c).as(s"b_$c")): _*)
      .withColumn("__in_b", lit(1))
    val j = aP.join(bP, Seq(key), "full_outer")
    val changed = concat_ws(",",
      compareCols.map(c =>
        when(!(col(s"a_$c") <=> col(s"b_$c")), lit(c))): _*)
    j.withColumn("status",
        when(col("__in_a").isNull, lit("added"))
          .when(col("__in_b").isNull, lit("removed"))
          .when(changed =!= "", lit("changed"))
          .otherwise(lit("unchanged")))
      .withColumn("changed_cols", when(col("status") === "changed", changed))
      .select(col(key), col("status"), col("changed_cols"))
  }

  /** DuckDB mirror of [[tableDiff]] over relations `aRel`/`bRel`. */
  def tableDiffSql(aRel: String, bRel: String, key: String,
                   compareCols: Seq[String]): String = {
    val aCols = compareCols.map(c => s"a.$c AS a_$c").mkString(", ")
    val bCols = compareCols.map(c => s"b.$c AS b_$c").mkString(", ")
    val changed = "concat_ws(',', " + compareCols.map(c =>
      s"CASE WHEN a_$c IS DISTINCT FROM b_$c THEN '$c' END").mkString(", ") + ")"
    s"""WITH j AS (SELECT COALESCE(a.$key, b.$key) AS $key,
       |    $aCols, $bCols,
       |    (a.$key IS NOT NULL) AS in_a, (b.$key IS NOT NULL) AS in_b
       |  FROM $aRel a FULL OUTER JOIN $bRel b ON a.$key = b.$key)
       |SELECT $key,
       |  CASE WHEN NOT in_a THEN 'added' WHEN NOT in_b THEN 'removed'
       |       WHEN $changed <> '' THEN 'changed' ELSE 'unchanged' END AS status,
       |  CASE WHEN in_a AND in_b AND $changed <> '' THEN $changed END AS changed_cols
       |FROM j""".stripMargin
  }

  /** DuckDB mirror of [[kAnonymity]]. */
  def kAnonymitySql(rel: String, quasiCols: Seq[String], sensitiveCol: String,
                    k: Int, l: Int): String = {
    val qs = quasiCols.mkString(", ")
    s"""SELECT $qs, CAST(count(*) AS BIGINT) AS n_rows,
       |  CAST(COUNT(DISTINCT $sensitiveCol) AS BIGINT) AS n_sensitive,
       |  CASE WHEN count(*) < $k AND COUNT(DISTINCT $sensitiveCol) < $l THEN 'both'
       |       WHEN count(*) < $k THEN 'k_anonymity'
       |       WHEN COUNT(DISTINCT $sensitiveCol) < $l THEN 'l_diversity' END AS violation
       |FROM $rel GROUP BY $qs
       |HAVING count(*) < $k OR COUNT(DISTINCT $sensitiveCol) < $l""".stripMargin
  }
}
