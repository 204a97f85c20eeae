package graft.engine

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/**
 * Keyed merge semantics — the reference's most distinctive operators,
 * re-expressed as declarative anti-joins so Catalyst picks the physical
 * strategy (broadcast-hash when one side is small, sort-merge otherwise,
 * AQE skew-split at runtime).
 *
 *   - insert-only merge: Delta `whenNotMatchedInsertAll`
 *     (reference: pipelines/stock_api/ingest_stocks.py:87-100)
 *   - keyed upsert (staged wins): dbt `unique_key` incremental MERGE
 *     (reference: dbt/lakehouse_models/models/silver/daily_stocks.sql:1-6,
 *      models/gold/monthly_stock_summary.sql:1-5)
 *   - schema guard: dbt `on_schema_change='fail'` (daily_stocks.sql:5)
 *
 * Scale notes:
 *   - `freshRows` anti-joins the *incoming* batch against only the key
 *     columns of the existing table — column pruning means the big
 *     existing table is scanned for its key columns only, and when the
 *     incoming batch is small Catalyst broadcasts it.
 *   - For a 100 TB existing table the right long-term structure is
 *     partition-aligned merges (bucket both sides by key) or a real
 *     table format with file-level pruning; the logical semantics here
 *     stay identical, only the physical plan changes.
 */
object Merge {

  /** Rows of `incoming` whose key is absent from `existing` (J1/W2). */
  def freshRows(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    incoming.join(existing.select(keys.map(existing(_)): _*), keys, "left_anti")

  /** Insert-only merge: existing rows are never updated; duplicate-keyed
    * incoming rows are discarded (ingest_stocks.py:87-100 intent). */
  def insertOnlyMerge(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(freshRows(existing, incoming, keys))

  /**
   * Insert-only merge with a BLOOM prefilter on the incoming side — the
   * 100 TB shape of [[insertOnlyMerge]]. A Bloom filter of the existing
   * keys (built with Spark's own runtime-filter machinery,
   * `BloomFilterAggregate`, over `xxhash64(keys)`) is collected once
   * (the sketch is MBs for billions of keys, data never moves) and
   * tested as a compiled predicate (`BloomFilterMightContain`, the same
   * expression AQE injects for runtime join filters). Rows the filter
   * rejects are DEFINITELY new (Bloom filters have no false negatives)
   * and skip the anti-join entirely; only `mightContain` rows — true
   * duplicates plus the fpp share of false positives — pay the precise
   * anti-join shuffle. In the steady state where most of a batch is new
   * (ingest), the merge's join shrinks from |incoming| to
   * ~|dups| + fpp·|incoming|. Result is EXACTLY [[insertOnlyMerge]]
   * (a 64-bit key-hash collision only routes a row to the precise join).
   */
  def insertOnlyMergeBloom(existing: DataFrame, incoming: DataFrame, keys: Seq[String],
                           expectedItems: Long = 1000000L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.functions.{col, lit, not, xxhash64}
    import org.apache.spark.sql.graftbridge.Bridge
    val existingHash = xxhash64(keys.map(existing(_)): _*)
    val bloomAgg = Bridge.column(
      new BloomFilterAggregate(Bridge.expression(existingHash), expectedItems)
        .toAggregateExpression())
    // one partial+final aggregate; a few-MB sketch is the ONLY driver data
    val sketch = existing.agg(bloomAgg.as("bf")).head().getAs[Array[Byte]](0)
    val mightContain = Bridge.column(BloomFilterMightContain(
      Bridge.expression(lit(sketch)),
      Bridge.expression(xxhash64(keys.map(col): _*))))
    val definitelyNew = incoming.filter(not(mightContain))
    val needsCheck = incoming.filter(mightContain)
    existing.unionByName(definitelyNew)
      .unionByName(freshRows(existing, needsCheck, keys))
  }

  /** Keyed upsert where staged rows win (dbt incremental MERGE, W7). */
  def upsert(existing: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(staged.select(keys.map(staged(_)): _*), keys, "left_anti")
      .unionByName(staged)

  /** Upsert hinting that the staged increment is small enough to
    * broadcast — the steady-state shape of the reference's daily runs
    * (~3 rows/day vs an ever-growing target, BASELINE.md). */
  def upsertSmallStaged(existing: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(broadcast(staged.select(keys.map(staged(_)): _*)), keys, "left_anti")
      .unionByName(staged)

  /** Schema-evolving union (the reference's `mergeSchema` write option,
    * W4, transforme_stock_silver.py:146): columns missing on either
    * side surface as NULL instead of failing. */
  def unionEvolving(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b, allowMissingColumns = true)

  /** Insert-only merge under schema evolution: new columns in the
    * incoming batch widen the table; historical rows read NULL there
    * (`overwriteSchema`/`mergeSchema` intent, ingest_stocks.py:109). */
  def insertOnlyMergeEvolving(existing: DataFrame, incoming: DataFrame,
                              keys: Seq[String]): DataFrame =
    unionEvolving(existing, freshRows(existing, incoming, keys))

  /** dbt `on_schema_change='fail'` (W8): abort when the staged schema
    * drifts from the existing table's (names + types, order-insensitive,
    * nullability ignored — BigQuery's comparison semantics). */
  def schemaGuard(existing: DataFrame, staged: DataFrame): Unit = {
    def shape(df: DataFrame) =
      df.schema.fields.map(f => (f.name.toLowerCase, f.dataType)).sortBy(_._1).toSeq
    val (e, s) = (shape(existing), shape(staged))
    require(e == s,
      s"schema drift detected (on_schema_change=fail): existing=$e staged=$s")
  }
}
