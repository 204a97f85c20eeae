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
      // watermark: the sidecar recorded by the PREVIOUS run (zero IO —
      // Delta answers MAX from per-commit stats the same way) with the
      // full-table scan as the fallback for tables this runner didn't
      // write or whose sidecar an out-of-band mutation cleared
      val wm: Option[Any] =
        if (!exists) None
        else wh.readMeta(m.layer, m.name, wmKey(m)).flatMap(wmDeser)
          .orElse(maxWatermark(wh.read(m.layer, m.name), m.watermarkCol))
      val staged0 = m.transform(inputs, wm)
      // the staged delta feeds the merge plan in several places (the
      // touched-partition broadcast build, the anti-join probe, the
      // union side) — cache it for the duration of the merge so the
      // source-side incremental read + transform runs ONCE, not once
      // per consumer. The cached set is the DELTA, bounded at any
      // table size; the initial full build has one consumer and skips
      // the cache.
      val staged = if (exists)
        staged0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      else staged0
      try {
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
        val (merged, obs) = observed(Merge.upsert(existingTouched, staged, m.uniqueKey), m)
        wh.overwritePartitions(merged, m.layer, m.name, m.partitionBy)
        // the write covered only the touched partitions, so the new
        // high-water mark is the max of the prior one and what the
        // write observed (watermarks only advance)
        record(wh, m, obs, prior = wm)
      } else if (exists) {
        val existing = wh.read(m.layer, m.name)
        Merge.schemaGuard(existing, staged)
        // Write to a swap dir, not in place: the plan reads `existing`
        // from the same path it would overwrite.
        val (merged, obs) = observed(Merge.upsert(existing, staged, m.uniqueKey), m)
        wh.atomicOverwrite(merged, m.layer, m.name)
        record(wh, m, obs, prior = None) // merged output IS the whole table
      } else {
        val arranged =
          if (m.partitionBy.nonEmpty)
            staged.repartition(m.partitionBy.map(staged(_)): _*)
          else staged
        val (out, obs) = observed(arranged, m)
        wh.atomicOverwrite(out, m.layer, m.name, m.partitionBy)
        record(wh, m, obs, prior = None)
      }
      } finally if (exists) staged.unpersist(blocking = false)
    }

    private def wmKey(m: Model): String =
      s"wm_${m.watermarkCol.replaceAll("[^A-Za-z0-9_-]", "_")}"

    /** Attach a MAX(watermarkCol) observation to the frame about to be
      * written: CollectMetrics rides the write job itself — the new
      * watermark costs ZERO extra jobs and zero IO, where the scan
      * fallback re-reads the whole target (at 100 TB, the difference
      * between free and a full-table pass per model per run). */
    private def observed(df: DataFrame, m: Model): (DataFrame, org.apache.spark.sql.Observation) = {
      val obs = org.apache.spark.sql.Observation()
      (df.observe(obs, max(col(m.watermarkCol)).as("wm")), obs)
    }

    private def record(wh: Warehouse, m: Model,
                       obs: org.apache.spark.sql.Observation,
                       prior: Option[Any]): Unit = {
      val seen = obs.get.get("wm").flatMap(Option(_)) // null on an empty write
      val next = (seen, prior) match {
        case (Some(a), Some(b)) => Some(wmMax(a, b))
        case (a, b) => a.orElse(b)
      }
      // an unserializable watermark type records nothing — the next
      // run falls back to the scan, never to a wrong value
      next.flatMap(wmSer).foreach(wh.writeMeta(m.layer, m.name, wmKey(m), _))
    }
  }

  private def wmMax(a: Any, b: Any): Any =
    if (a.asInstanceOf[Comparable[Any]].compareTo(b) >= 0) a else b

  /** Sidecar text form of a watermark scalar, tagged with enough type
    * to reconstruct the SAME JVM type the scan fallback would return —
    * the `Some(d: java.sql.Date)` matches in model transforms (the
    * partition-pruning path) must fire identically either way. */
  private[graft] def wmSer(v: Any): Option[String] = v match {
    case d: java.sql.Date => Some(s"date:$d")
    case t: java.sql.Timestamp => Some(s"ts:$t")
    case d: java.time.LocalDate => Some(s"ldate:$d")
    case t: java.time.Instant => Some(s"inst:$t")
    case i: java.lang.Integer => Some(s"int:$i")
    case l: java.lang.Long => Some(s"long:$l")
    case d: java.lang.Double => Some(s"double:$d")
    case d: java.math.BigDecimal => Some(s"dec:$d")
    case d: scala.math.BigDecimal => Some(s"dec:$d")
    case s: String => Some(s"str:$s")
    case _ => None
  }

  private[graft] def wmDeser(s: String): Option[Any] = {
    val i = s.indexOf(':')
    if (i < 0) return None
    val (tag, v) = (s.take(i), s.drop(i + 1))
    try Some(tag match {
      case "date" => java.sql.Date.valueOf(v)
      case "ts" => java.sql.Timestamp.valueOf(v)
      case "ldate" => java.time.LocalDate.parse(v)
      case "inst" => java.time.Instant.parse(v)
      case "int" => Integer.valueOf(v)
      case "long" => java.lang.Long.valueOf(v)
      case "double" => java.lang.Double.valueOf(v)
      case "dec" => new java.math.BigDecimal(v)
      case "str" => v
      case _ => return None
    }) catch { case _: IllegalArgumentException | _: java.time.format.DateTimeParseException => None }
  }
}
