package graft.engine

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Incremental (watermark + keyed-upsert) model execution — the engine
 * equivalent of the reference's dbt incremental materialization plus its
 * hand-rolled PySpark watermark loop:
 *
 *   - watermark read: `SELECT MAX(<col>) FROM <target>` collected to the
 *     driver as a scalar (transforme_stock_silver.py:41-69; the reference
 *     holds incremental state as a driver-side scalar between jobs, and
 *     so do we — this is the ONLY driver-side collect in the engine)
 *   - watermark filter: `>= watermark` (daily_stocks.sql:29-32) — the
 *     boundary day is reprocessed and the keyed upsert makes that
 *     idempotent; `>` (transforme_stock_silver.py:83) is also offered
 *   - model DAG: dbt `source()`/`ref()` becomes a registry + topo order
 *     (daily_stocks.sql:23, monthly_stock_summary.sql:23)
 *
 * Scale notes: the watermark collect moves one row to the driver, never
 * data. The watermark filter lands directly above the source scan so
 * Catalyst pushes it into the Parquet reader (row-group pruning); when
 * the source is partitioned by a date-derived column, callers should add
 * the derived predicate too (SURVEY.md §4) so partition pruning kicks in.
 */
object Incremental {

  /** MAX(col) over the target table, as a driver-held scalar
    * (A1, transforme_stock_silver.py:41-69). None when table is empty. */
  def maxWatermark(target: DataFrame, col: String): Option[Any] = {
    val row: Row = target.agg(max(target(col))).head()
    if (row.isNullAt(0)) None else Some(row.get(0))
  }

  /** Rows of `source` strictly newer than the watermark (F1). */
  def newerThan(source: DataFrame, col: String, watermark: Option[Any]): DataFrame =
    watermark.map(w => source.filter(source(col) > lit(w))).getOrElse(source)

  /** Rows at-or-after the watermark (F3/F4 `>=` boundary reprocessing). */
  def atOrAfter(source: DataFrame, col: Column, watermark: Option[Any]): DataFrame =
    watermark.map(w => source.filter(col >= lit(w))).getOrElse(source)

  /**
   * Watermark filter WITH derived partition predicates for a source
   * laid out hive-style by `year=`/`month=` (the reference's bronze
   * layout, ingest_stocks.py:79). The reference filters only on the
   * date column (transforme_stock_silver.py:83), so its scan touches
   * every partition and relies on row-group stats alone; deriving the
   * equivalent year/month predicate turns the incremental read into a
   * partition-pruned scan — `PartitionFilters` in the physical plan,
   * entire directories skipped. The row-level `>=` filter still applies
   * for exactness within the boundary month.
   */
  def partitionPrunedAtOrAfter(source: DataFrame, dateCol: Column,
                               wm: java.sql.Date): DataFrame = {
    val d = wm.toLocalDate
    source
      .filter(col("year") > d.getYear ||
        (col("year") === d.getYear && col("month") >= d.getMonthValue))
      .filter(dateCol >= lit(wm))
  }

  /**
   * One incremental model: named transform with a unique key and a
   * watermark expression evaluated against the *target* table. Mirrors
   * dbt's `{{ config(materialized='incremental', unique_key=[...]) }}`.
   *
   * @param name          target table name (written to `layer`)
   * @param layer         warehouse layer ("silver"/"gold")
   * @param deps          upstream model names (ref()) — drives topo order
   * @param uniqueKey     upsert key columns
   * @param watermarkCol  column of the TARGET holding the high-water mark
   * @param transform     full-refresh logic: inputs by name → staged rows;
   *                      receives `isIncremental` + watermark so it can
   *                      apply the F3/F4 source-side filter like
   *                      `is_incremental()` Jinja guards do
   * @param partitionBy   optional hive partition columns of the TARGET
   *                      (dbt `insert_overwrite` / Delta MERGE under a
   *                      partition predicate). When set, an incremental
   *                      run merges into ONLY the partitions the staged
   *                      batch touches: the existing side reads those
   *                      partitions (partition-pruned scan) and the
   *                      write swaps just their directories — the run
   *                      costs the delta's partitions, never the table,
   *                      which is the difference between a daily job
   *                      that scales and one that rewrites 100 TB.
   *                      CONTRACT: each partition column must appear in
   *                      the transform's output, be NON-NULL (the
   *                      touched-partition semi-join is an equi-join,
   *                      so a null partition value would silently miss
   *                      its existing directory), and be a
   *                      DETERMINISTIC FUNCTION of the uniqueKey
   *                      columns (e.g. a month derived from a key
   *                      date) — otherwise a key could "move"
   *                      partitions between runs and the pruned merge
   *                      would leave a stale twin in an untouched
   *                      partition.
   */
  final case class Model(
      name: String,
      layer: String,
      deps: Seq[String],
      uniqueKey: Seq[String],
      watermarkCol: String,
      transform: (Map[String, DataFrame], Option[Any]) => DataFrame,
      partitionBy: Seq[String] = Nil)

  /** Registry with dbt-style topological execution order. */
  final class Registry(models: Seq[Model]) {
    private val byName = models.map(m => m.name -> m).toMap

    def topoOrder: Seq[Model] = {
      val seen = scala.collection.mutable.LinkedHashSet[String]()
      def visit(n: String, stack: Set[String]): Unit = {
        require(!stack(n), s"model cycle at $n")
        if (!seen(n)) byName.get(n).foreach { m =>
          m.deps.foreach(visit(_, stack + n)); seen += n
        }
      }
      models.foreach(m => visit(m.name, Set.empty))
      seen.toSeq.map(byName)
    }

    /** Run every model in dependency order against `wh`. Sources not
      * produced by any model must be present in `externalSources`.
      * `fullRefresh` drops each target first and rebuilds from scratch —
      * dbt's `--full-refresh` (reference: README.md:88). `onModelDone`
      * receives (model name, wall seconds) after each model completes —
      * the per-stage attribution hook Bench uses. */
    def runAll(wh: Warehouse, externalSources: Map[String, DataFrame],
               fullRefresh: Boolean = false,
               onModelDone: (String, Double) => Unit = (_, _) => ()): Unit = {
      val produced = scala.collection.mutable.Map[String, DataFrame]() ++ externalSources
      topoOrder.foreach { m =>
        if (fullRefresh) wh.dropTable(m.layer, m.name)
        val t0 = System.nanoTime()
        runModel(wh, m, produced.toMap)
        onModelDone(m.name, (System.nanoTime() - t0) / 1e9)
        produced(m.name) = wh.read(m.layer, m.name)
      }
    }

    private def runModel(wh: Warehouse, m: Model, inputs: Map[String, DataFrame]): Unit = {
      val exists = wh.tableExists(m.layer, m.name)
      val wm = if (exists) maxWatermark(wh.read(m.layer, m.name), m.watermarkCol) else None
      val staged = m.transform(inputs, wm)
      if (exists && m.partitionBy.nonEmpty) {
        // PARTITION-SCOPED merge (dbt insert_overwrite shape): merge
        // into only the partitions the staged batch touches and swap
        // just those directories — the incremental run costs the
        // delta's partitions at any table size. Soundness rests on the
        // Model contract: partition cols are functions of the key, so a
        // staged key's existing row provably lives in a touched
        // partition. The touched-partition restriction is a broadcast
        // SEMI-JOIN on the partition columns, not a driver collect:
        // dynamic partition pruning turns it into a runtime partition
        // filter on the existing scan, zero extra jobs, and the
        // touched set never routes through the driver.
        import org.apache.spark.sql.functions.{broadcast, col}
        val stagedParts = staged.select(m.partitionBy.map(col): _*).distinct()
        val existingTouched = wh.read(m.layer, m.name)
          .join(broadcast(stagedParts), m.partitionBy, "left_semi")
        Merge.schemaGuard(existingTouched, staged)
        // no repartition: the write fans into only the touched
        // directories, and the merge's task layout (pruned scan +
        // broadcast anti-join) stays shuffle-free
        wh.overwritePartitions(Merge.upsert(existingTouched, staged, m.uniqueKey),
          m.layer, m.name, m.partitionBy)
      } else if (exists) {
        val existing = wh.read(m.layer, m.name)
        Merge.schemaGuard(existing, staged)
        // Write to a swap dir, not in place: the plan reads `existing`
        // from the same path it would overwrite.
        wh.atomicOverwrite(Merge.upsert(existing, staged, m.uniqueKey), m.layer, m.name)
      } else {
        val arranged =
          if (m.partitionBy.nonEmpty)
            staged.repartition(m.partitionBy.map(staged(_)): _*)
          else staged
        wh.atomicOverwrite(arranged, m.layer, m.name, m.partitionBy)
      }
    }
  }
}
