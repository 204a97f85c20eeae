package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Managed hive-partitioned-Parquet "catalog": the engine's stand-in for
 * the reference's Delta-on-GCS + BigQuery table store
 * (reference: pipelines/stock_api/ingest_stocks.py:102-111 partitioned
 * Delta writes; transforme_stock_silver.py:136-173 overwrite/append).
 *
 * Layout: `<root>/<layer>/<table>/` with optional hive partition dirs.
 * No Delta jar is available in this environment, so transactional
 * semantics are emulated:
 *
 *   - `append`       — plain partitioned append (ingest_stocks.py:105-111)
 *   - `atomicOverwrite` — write to a temp dir, then swap via two renames.
 *     On HDFS/local-FS renames are atomic per rename; readers racing the
 *     swap can observe a missing table for an instant, which is the same
 *     guarantee dbt's view-less table swap gives. On object stores this
 *     becomes copy+delete; a manifest/table format (Delta/Iceberg) is the
 *     production answer and this class is the seam where it would plug in.
 *   - versioned snapshots — each `atomicOverwrite` ARCHIVES the replaced
 *     table generation instead of deleting it (Delta `_delta_log` time
 *     travel, ingest_stocks.py:102-111 gets this for free from Delta);
 *     [[readVersion]] reads N generations back, [[versions]] lists what
 *     is retained, and retention keeps the newest `keepVersions`
 *     archived generations (older ones are dropped at swap time, like
 *     `VACUUM`). Archiving is one rename — no data copy, no extra IO at
 *     any scale. `append` mutates the current generation in place
 *     (appends are not snapshotted — matching Delta, where time travel
 *     is per-commit, a snapshot here is per-overwrite).
 *
 * Scale note: all writes go through the DataFrame writer, so at cluster
 * scale the data never routes through the driver; partition columns
 * should be low-cardinality (the reference uses ticker/year/month,
 * ingest_stocks.py:79) to avoid small-file explosion.
 */
final class Warehouse(val spark: SparkSession, val root: String,
                      val keepVersions: Int = 2) {

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def path(layer: String, table: String): String = s"$root/$layer/$table"

  /** Existence probe — the reference gates create-vs-merge on this
    * (DeltaTable.isDeltaTable, ingest_stocks.py:82). */
  def tableExists(layer: String, table: String): Boolean = {
    val p = new Path(path(layer, table))
    fs.exists(p) && fs.listStatus(p).nonEmpty
  }

  def read(layer: String, table: String): DataFrame =
    spark.read.parquet(path(layer, table))

  /** Append, optionally hive-partitioned (W1, ingest_stocks.py:102-111). */
  def append(df: DataFrame, layer: String, table: String,
             partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(path(layer, table))
  }

  /** Overwrite via tmp-dir swap so readers never see a half-written
    * table (emulates Delta's atomic overwrite, W4,
    * transforme_stock_silver.py:136-154). The replaced generation is
    * archived for [[readVersion]] time travel; generations beyond
    * `keepVersions` are dropped (VACUUM analogue). */
  def atomicOverwrite(df: DataFrame, layer: String, table: String,
                      partitionBy: Seq[String] = Nil): Unit = {
    val target = new Path(path(layer, table))
    val tmp = new Path(s"$root/.tmp/$layer-$table-${System.nanoTime()}")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(tmp.toString)
    fs.mkdirs(target.getParent)
    if (fs.exists(target)) {
      val gen = versions(layer, table).lastOption.getOrElse(0L) + 1
      val vdir = versionsRoot(layer, table)
      fs.mkdirs(vdir)
      fs.rename(target, new Path(vdir, f"v$gen%012d"))
      versions(layer, table).dropRight(keepVersions).foreach { old =>
        fs.delete(new Path(vdir, f"v$old%012d"), true)
      }
    }
    fs.rename(tmp, target)
    ()
  }

  /** Archived-generation directory. Nested `<layer>/<table>` (not a
    * joined name) so (a, b_c) and (a_b, c) can never collide. */
  private def versionsRoot(layer: String, table: String): Path =
    new Path(s"$root/.versions/$layer/$table")

  /** Retained archived generation numbers, oldest first. The current
    * table is generation `last + 1` conceptually; it is not listed. */
  def versions(layer: String, table: String): Seq[Long] = {
    val vdir = versionsRoot(layer, table)
    if (!fs.exists(vdir)) Nil
    else fs.listStatus(vdir).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("v")).map(_.drop(1).toLong).sorted
  }

  /** Time travel: `back = 0` reads the current table, `back = 1` the
    * generation replaced by the latest [[atomicOverwrite]], and so on.
    * Fails fast (with what IS retained) past the retention horizon. */
  def readVersion(layer: String, table: String, back: Int): DataFrame = {
    require(back >= 0, s"readVersion: back must be >= 0, got $back")
    if (back == 0) read(layer, table)
    else {
      val vs = versions(layer, table)
      require(back <= vs.length,
        s"readVersion($layer, $table, $back): only ${vs.length} archived generation(s) " +
          s"retained (keepVersions=$keepVersions)")
      val gen = vs(vs.length - back)
      spark.read.parquet(new Path(versionsRoot(layer, table), f"v$gen%012d").toString)
    }
  }

  /** Bucketed catalog-table write: hash-partition rows on `bucketCols`
    * into `numBuckets` files (optionally sorted within each bucket).
    * Bucket layout metadata lives in the session catalog, so this goes
    * through `saveAsTable`, not a path write. Two tables bucketed the
    * same way sort-merge-join with ZERO shuffle — the 100 TB answer for
    * repeatedly-joined fact tables (the join cost collapses to a
    * per-bucket merge; PlanSpec asserts the Exchange-free plan). The
    * reference never pre-co-locates its joins (its MERGE rewrites
    * shuffle both sides every run, ingest_stocks.py:87-100). */
  def writeBucketed(df: DataFrame, layer: String, table: String, bucketCols: Seq[String],
                    numBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    // external table: catalog entry carries the bucket spec, data files
    // live under THIS warehouse's root like every other table here
    val w = df.write.mode(SaveMode.Overwrite).format("parquet")
      .option("path", path(layer, table))
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(bucketedTableName(layer, table))
  }

  /** Catalog name of a bucketed table. The session catalog is global,
    * so the name is namespaced by a hash of THIS warehouse's root —
    * two warehouses with different roots (or layer/table pairs like
    * (a,b_c) vs (a_b,c)) must not collide and silently repoint each
    * other's catalog entries. */
  def bucketedTableName(layer: String, table: String): String = {
    val rootTag = Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(root))
    s"g${rootTag}__${layer}__$table"
  }

  def readBucketed(layer: String, table: String): DataFrame =
    spark.table(bucketedTableName(layer, table))

  /** Drops the table AND its archived generations (dropping a Delta
    * table removes its log; a re-created table starts fresh history). */
  def dropTable(layer: String, table: String): Unit = {
    fs.delete(new Path(path(layer, table)), true)
    fs.delete(versionsRoot(layer, table), true)
    ()
  }

  /** Compaction (Delta OPTIMIZE / Iceberg rewrite_data_files analogue):
    * rewrite the table into `numFiles` files (per partition when
    * `partitionBy` is set — pass it for hive-partitioned tables or the
    * rewrite flattens the layout), optionally clustered by sort keys for
    * row-group skipping. The reference's daily partitioned appends
    * (~3 rows/run, ingest_stocks.py:105-111) produce exactly the
    * small-file accumulation this fixes; at cluster scale run it per
    * partition on a schedule. Atomic via the same tmp-dir swap. */
  def compact(layer: String, table: String, numFiles: Int,
              sortCols: Seq[String] = Nil,
              partitionBy: Seq[String] = Nil): Unit = {
    val df = read(layer, table)
    val repartitioned =
      if (partitionBy.nonEmpty)
        df.repartition(numFiles, partitionBy.map(df(_)): _*)
      else df.repartition(numFiles)
    val arranged =
      if (sortCols.nonEmpty)
        repartitioned.sortWithinPartitions(sortCols.map(df(_)): _*)
      else repartitioned
    atomicOverwrite(arranged, layer, table, partitionBy)
  }

  /** Data files of a table, recursing into hive partition directories
    * (for compaction assertions/monitoring). */
  def dataFiles(layer: String, table: String): Seq[String] = {
    val root = new Path(path(layer, table))
    if (!fs.exists(root)) return Nil
    def walk(p: Path): Seq[Path] = {
      val (dirs, files) = fs.listStatus(p).toSeq.partition(_.isDirectory)
      files.map(_.getPath) ++ dirs.flatMap(d => walk(d.getPath))
    }
    walk(root).map(_.getName).filter(_.endsWith(".parquet"))
  }
}
