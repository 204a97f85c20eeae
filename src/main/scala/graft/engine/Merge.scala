package graft.engine

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.{broadcast, coalesce, col, lit, sum}

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

  /** The FULL three-clause MERGE (Delta `MERGE INTO` with
    * `WHEN MATCHED AND cond THEN DELETE / WHEN MATCHED THEN UPDATE SET * /
    * WHEN NOT MATCHED THEN INSERT *`), `cond` evaluated on the staged
    * row: a matched staged row with `cond` removes the target row and
    * inserts nothing; a matched row without it replaces; an unmatched
    * row without it inserts; an unmatched row WITH it is a no-op
    * (DELETE never inserts — the Delta rule). Algebra: the anti-join
    * drops every matched target row (updated or deleted alike), and
    * the union re-adds exactly the staged survivors — one anti-join +
    * one union, the same two-operator shape as [[upsert]], so the
    * delete clause costs nothing extra at any scale. NULL `cond`
    * counts as not-delete (SQL WHEN ... AND semantics). */
  def upsertWithDelete(existing: DataFrame, staged: DataFrame, keys: Seq[String],
                       deleteCond: org.apache.spark.sql.Column): DataFrame = {
    schemaGuard(existing, staged)
    val survivors = staged.filter(!coalesce(deleteCond, lit(false)))
    existing.join(staged.select(keys.map(staged(_)): _*), keys, "left_anti")
      .unionByName(survivors)
  }

  /** Upsert hinting that the staged increment is small enough to
    * broadcast — the steady-state shape of the reference's daily runs
    * (~3 rows/day vs an ever-growing target, BASELINE.md). */
  def upsertSmallStaged(existing: DataFrame, staged: DataFrame, keys: Seq[String]): DataFrame =
    existing.join(broadcast(staged.select(keys.map(staged(_)): _*)), keys, "left_anti")
      .unionByName(staged)

  /** Self-maintainable ADDITIVE rollup merge — incremental
    * materialized-view refresh for SUM/COUNT aggregates (the
    * generalization of the reference's dbt incremental monthly model,
    * monthly_stock_summary.sql:26-31, which re-aggregates a watermarked
    * slice): the maintained rollup and a new increment's PARTIAL
    * aggregates combine by union + re-sum on the group keys, so a
    * refresh costs the DELTA's volume plus a keys-cardinality
    * aggregate — the table of raw history is never rescanned. Only
    * ADDITIVE measures compose this way (SUM, COUNT; AVG = maintained
    * SUM/COUNT pair, MIN/MAX only under insert-only streams); keep
    * sums in exact types (DECIMAL/BIGINT) — double partials would make
    * the refresh order-visible. */
  def mergeAdditive(rollup: DataFrame, delta: DataFrame, keys: Seq[String],
                    addCols: Seq[String]): DataFrame = {
    require(addCols.nonEmpty, "mergeAdditive: no additive columns given")
    val cols = keys ++ addCols
    Seq(rollup, delta).foreach { df =>
      val missing = cols.filterNot(df.columns.contains)
      require(missing.isEmpty, s"mergeAdditive: missing column(s): ${missing.mkString(", ")}")
    }
    rollup.select(cols.map(col): _*).unionByName(delta.select(cols.map(col): _*))
      .groupBy(keys.map(col): _*)
      .agg(sum(col(addCols.head)).as(addCols.head),
        addCols.tail.map(c => sum(col(c)).as(c)): _*)
  }

  /** Incremental JOIN-view maintenance (the delta-join rule every
    * incremental-view-maintenance engine applies; generalizes
    * [[mergeAdditive]] from aggregates to joins): given insert-only
    * deltas ΔA, ΔB against base tables A, B and the previously
    * materialized view V = A ⋈ B, the new view is
    *
    *   V ∪ (ΔA ⋈ (B ∪ ΔB)) ∪ (A ⋈ ΔB)
    *
    * — ΔA joins the FULL new B (catches ΔA⋈ΔB once), old A joins only
    * ΔB. Cost scales with |Δ|·|matches|, not |A|·|B|: at 100 TB the
    * two delta joins broadcast the (small) delta side and prune the
    * base-table scan to the delta's key range (partition/bucket
    * pruning), where a full recompute rescans both bases. Insert-only
    * deltas are REQUIRED (updates/deletes need retraction rows —
    * out of scope, as in the reference's append-only ingest). Both
    * join legs project through unionByName, so V's column order need
    * not match the join output's. */
  def joinViewDelta(viewOld: DataFrame, aOld: DataFrame, aDelta: DataFrame,
                    bOld: DataFrame, bDelta: DataFrame, keys: Seq[String]): DataFrame =
    viewOld
      .unionByName(aDelta.join(bOld.unionByName(bDelta), keys))
      .unionByName(aOld.join(bDelta, keys))

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

  /**
   * SCD Type-2 dimension merge — the history-keeping upsert every
   * warehouse dimension eventually needs (dbt snapshot semantics /
   * Delta `MERGE` with `whenMatchedUpdate` + insert; generalizes the
   * reference's keyed upsert W7 from "staged wins" to "staged opens a
   * new version").
   *
   * `existing` carries `keys ++ track ++ (validFrom, validTo,
   * isCurrent)`; `staged` carries `keys ++ track`. Semantics:
   *   - history rows (`isCurrent = false`) pass through untouched;
   *   - current rows with no staged match, or whose tracked attributes
   *     are unchanged (null-safe compare), pass through untouched —
   *     re-stating an identical row is a no-op, not a new version;
   *   - current rows whose tracked attributes differ are CLOSED:
   *     `validTo = effective`, `isCurrent = false`;
   *   - staged rows that are new keys or changed attributes open a new
   *     version: `validFrom = effective`, `validTo = null`,
   *     `isCurrent = true`.
   *
   * Preconditions (enforced): `staged` must have AT MOST ONE row per
   * key — Delta MERGE and dbt snapshots raise on multiple source
   * matches, and the left joins below would otherwise multiply current
   * rows into duplicated kept/closed output and several simultaneously
   * "current" versions per key. The check is one aggregate over the
   * staged side, which is the small daily increment — negligible even
   * when the dimension is 100 TB. Dedupe upstream (e.g. latest-wins
   * `row_number` per key) before calling. Existing rows with NULL
   * `isCurrent` are treated as history (`coalesce(_, false)`) so no
   * input row is silently dropped.
   *
   * Scale shape: both change-detection joins are keyed on `keys` only
   * and the staged side is the small daily increment, so Catalyst
   * broadcasts it — the 100 TB dimension never shuffles. Partitioning
   * the stored dimension by `isCurrent` (or clustering history by
   * `validTo`) keeps the pass-through branches pure scans; the logical
   * plan here is unchanged by that layout choice.
   */
  def scd2Merge(existing: DataFrame, staged: DataFrame, keys: Seq[String],
                track: Seq[String], effective: Column,
                validFrom: String = "valid_from", validTo: String = "valid_to",
                isCurrent: String = "is_current"): DataFrame = {
    import org.apache.spark.sql.functions.{coalesce, col, count, lit, not}
    // collision-proof aggregate alias: .count() would name the column
    // "count", ambiguous if a merge key is itself named "count"
    val dupStaged = staged.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__dup_cnt"))
      .filter(col("__dup_cnt") > 1).limit(1).count()
    require(dupStaged == 0L,
      s"scd2Merge: staged batch has duplicate rows per key (${keys.mkString(", ")}) — " +
        "MERGE semantics require at most one source match per key; dedupe upstream " +
        "(e.g. latest-wins row_number) before merging")
    val validToType = existing.schema(validTo).dataType
    val outCols = existing.columns.toSeq
    val curFlag = coalesce(col(isCurrent), lit(false))
    val hist = existing.filter(not(curFlag))
    val cur = existing.filter(curFlag)

    // current side annotated with the staged attributes (left join keeps
    // dimension rows whose key never appears in the increment)
    val stagedTagged = staged.select(
      keys.map(col) ++ track.map(c => col(c).as(s"__s_$c")) :+ lit(true).as("__staged"): _*)
    val j = cur.join(stagedTagged, keys, "left")
    val differs = track.map(c => not(col(c) <=> col(s"__s_$c"))).reduce(_ || _)
    val changed = coalesce(col("__staged"), lit(false)) && differs
    val keptCur = j.filter(not(changed)).select(outCols.map(col): _*)
    val closed = j.filter(changed).select(outCols.map {
      case c if c == validTo => effective.cast(validToType).as(validTo)
      case c if c == isCurrent => lit(false).as(isCurrent)
      case c => col(c)
    }: _*)

    // staged side annotated with the current attributes: new key OR
    // changed attributes opens a version
    val curTagged = cur.select(
      keys.map(col) ++ track.map(c => col(c).as(s"__e_$c")) :+ lit(true).as("__cur"): _*)
    val sj = staged.join(curTagged, keys, "left")
    val sDiffers = track.map(c => not(col(c) <=> col(s"__e_$c"))).reduce(_ || _)
    val opened = sj.filter(col("__cur").isNull || sDiffers).select(outCols.map {
      case c if c == validFrom => effective.cast(existing.schema(validFrom).dataType).as(validFrom)
      case c if c == validTo => lit(null).cast(validToType).as(validTo)
      case c if c == isCurrent => lit(true).as(isCurrent)
      case c => col(c)
    }: _*)

    hist.unionByName(keptCur).unionByName(closed).unionByName(opened)
  }

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
