package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

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
    // any mutation that bypasses the writer that recorded them makes
    // sidecar metadata stale — clearing is what makes staleness
    // impossible (the reader falls back to a scan, never to a lie)
    clearMeta(layer, table)
  }

  /** Sidecar table metadata (`_meta_<key>` files inside the table
    * directory — the `_` prefix keeps Spark's file index from reading
    * them as data). This is the Warehouse analogue of Delta's
    * per-commit column stats: writers record derived scalars (e.g. the
    * incremental watermark, observed for free during the write job)
    * and the next run reads them without scanning the table. The
    * sidecar travels with the generation on archive renames, and every
    * mutating operation that does NOT re-record it ([[append]],
    * [[overwritePartitions]]) clears it, so a present sidecar is
    * always truthful. Keys must be simple names (`[A-Za-z0-9_-]`). */
  def writeMeta(layer: String, table: String, key: String, value: String): Unit = {
    require(key.matches("[A-Za-z0-9_-]+"), s"writeMeta: bad key $key")
    val p = new Path(path(layer, table), s"_meta_$key")
    val out = fs.create(p, true)
    try out.write(value.getBytes("UTF-8")) finally out.close()
  }

  /** Read sidecar metadata recorded by [[writeMeta]]; None when absent
    * (never written, or cleared by an out-of-band mutation). */
  def readMeta(layer: String, table: String, key: String): Option[String] = {
    val p = new Path(path(layer, table), s"_meta_$key")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
      finally in.close()
    }
  }

  private def clearMeta(layer: String, table: String): Unit = {
    val dir = new Path(path(layer, table))
    if (fs.exists(dir))
      fs.listStatus(dir).filter(_.getPath.getName.startsWith("_meta_"))
        .foreach(st => fs.delete(st.getPath, false))
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

  /** DYNAMIC PARTITION OVERWRITE (Spark's `partitionOverwriteMode=
    * dynamic` / Delta `replaceWhere` by partition): replace ONLY the
    * hive partition directories `df` carries rows for; every other
    * partition keeps its files untouched. The write lands in a tmp dir
    * first, then each touched LEAF partition directory swaps in via
    * one rename — so at 100 TB a daily merge commits the day's
    * partitions, never the table. Like [[append]] (and unlike
    * [[atomicOverwrite]]), this does not archive a generation: the
    * unit of versioning here is the whole-table swap, and a partial
    * write has no whole-table "before" to archive cheaply.
    *
    * The swap is atomic PER PARTITION (rename), not across partitions —
    * a reader racing a multi-partition overwrite can see partition A
    * new and partition B old, the same visibility gap dbt's
    * insert_overwrite has on hive tables. [[graft.engine.SnapshotStore
    * .overwritePartitions]] is the manifest-committed answer when
    * cross-partition atomicity matters. */
  def overwritePartitions(df: DataFrame, layer: String, table: String,
                          partitionBy: Seq[String]): Unit = {
    require(partitionBy.nonEmpty,
      "overwritePartitions: partitionBy is required (use atomicOverwrite for flat tables)")
    val target = new Path(path(layer, table))
    val tmp = new Path(s"$root/.tmp/$layer-$table-${System.nanoTime()}")
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionBy: _*)
      .parquet(tmp.toString)
    // the touched partitions are exactly the leaf k=v chains the write
    // produced — read from the tmp dir's structure, no extra job on df
    def leaves(p: Path, depth: Int): Seq[Path] =
      if (depth == partitionBy.length) Seq(p)
      else fs.listStatus(p).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
        .flatMap(st => leaves(st.getPath, depth + 1))
    val rootUri = tmp.toUri.getPath
    leaves(tmp, 0).foreach { leaf =>
      val rel = leaf.toUri.getPath.stripPrefix(rootUri).stripPrefix("/")
      val dst = new Path(target, rel)
      fs.mkdirs(dst.getParent)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.rename(leaf, dst)
    }
    fs.delete(tmp, true)
    clearMeta(layer, table) // partial mutation: recorded scalars now stale
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

  /** Directory of generation `back` (0 = current table, 1 = the
    * generation the latest [[atomicOverwrite]] replaced, …). Fails fast
    * (with what IS retained) past the retention horizon. */
  private def generationPath(layer: String, table: String, back: Int): Path = {
    require(back >= 0, s"readVersion: back must be >= 0, got $back")
    if (back == 0) new Path(path(layer, table))
    else {
      val vs = versions(layer, table)
      require(back <= vs.length,
        s"readVersion($layer, $table, $back): only ${vs.length} archived generation(s) " +
          s"retained (keepVersions=$keepVersions)")
      val gen = vs(vs.length - back)
      new Path(versionsRoot(layer, table), f"v$gen%012d")
    }
  }

  /** Time travel: `back = 0` reads the current table, `back = 1` the
    * generation replaced by the latest [[atomicOverwrite]], and so on. */
  def readVersion(layer: String, table: String, back: Int): DataFrame =
    spark.read.parquet(generationPath(layer, table, back).toString)

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
    // merged-schema read for the same full-rewrite reason as
    // [[deleteWhere]]; compacting an evolved table also MATERIALIZES
    // the evolution (every surviving file carries the union schema).
    // Omitted partitionBy inherits the table's existing hive layout —
    // same never-silently-flatten contract as [[deleteWhere]].
    val layout = if (partitionBy.nonEmpty) partitionBy else partitionLayout(layer, table)
    val df = readEvolved(layer, table)
    val repartitioned =
      if (layout.nonEmpty)
        df.repartition(numFiles, layout.map(df(_)): _*)
      else df.repartition(numFiles)
    val arranged =
      if (sortCols.nonEmpty)
        repartitioned.sortWithinPartitions(sortCols.map(df(_)): _*)
      else repartitioned
    atomicOverwrite(arranged, layer, table, layout)
  }

  /** The table's hive partition column chain, inferred from its
    * directory structure (empty for a flat table) — a driver-side
    * metadata walk down ONE branch, no data IO at any table size. */
  def partitionLayout(layer: String, table: String): Seq[String] = {
    @scala.annotation.tailrec
    def descend(p: Path, acc: Vector[String]): Seq[String] = {
      val sub = fs.listStatus(p).filter(st =>
        st.isDirectory && st.getPath.getName.contains("="))
      if (sub.isEmpty) acc
      else descend(sub.head.getPath, acc :+ sub.head.getPath.getName.split("=", 2)(0))
    }
    val root = new Path(path(layer, table))
    if (!fs.exists(root)) Nil else descend(root, Vector.empty)
  }

  /** Row-level DELETE (Delta `DELETE FROM ... WHERE`): rewrite the table
    * without the rows matching `predicate`. SQL DELETE semantics — rows
    * where the predicate is NULL are KEPT (only provably-true rows go).
    * The rewrite routes through [[atomicOverwrite]], so the pre-delete
    * generation is archived: `readVersion(_, _, 1)` is the undo, exactly
    * as `RESTORE TABLE ... VERSION AS OF` recovers a bad Delta delete.
    * At cluster scale this is a full-table rewrite (like Delta without
    * deletion vectors); pair the predicate with the partition layout so
    * file pruning bounds what is actually rewritten. */
  def deleteWhere(layer: String, table: String, predicate: Column,
                  partitionBy: Seq[String] = Nil): Unit = {
    // readEvolved, NOT read: a full-table rewrite through a plain read
    // would take one sampled footer's schema — on a schema-evolved
    // table that silently and PERMANENTLY drops the evolved columns
    // from every row; the merged read keeps them (older rows NULL).
    // Omitted partitionBy defaults to the table's EXISTING layout
    // (inferred from the hive directory structure): a delete must never
    // silently flatten a partitioned table and lose pruning.
    val layout = if (partitionBy.nonEmpty) partitionBy else partitionLayout(layer, table)
    val remaining = readEvolved(layer, table).filter(coalesce(!predicate, lit(true)))
    atomicOverwrite(remaining, layer, table, layout)
  }

  /** Schema-evolving append (Delta `mergeSchema=true` append,
    * ingest_stocks.py relies on Delta's implicit evolution): the batch
    * may carry columns the table lacks and vice versa — parquet files
    * each carry their own schema, so the append is just an append; the
    * union view materializes at read time via [[readEvolved]]. Fails
    * fast if a SHARED column changed type (that is corruption, not
    * evolution — same contract as [[Merge.schemaGuard]]). */
  def appendEvolve(df: DataFrame, layer: String, table: String,
                   partitionBy: Seq[String] = Nil): Unit = {
    if (tableExists(layer, table)) {
      // guard against the MERGED schema: a plain read samples one
      // footer and could miss a column that only newer files carry
      val existing = readEvolved(layer, table).schema.map(f => f.name -> f.dataType).toMap
      val clash = df.schema.filter(f => existing.get(f.name).exists(_ != f.dataType))
      require(clash.isEmpty,
        s"appendEvolve($layer, $table): type change on shared column(s) " +
          clash.map(f => s"${f.name}: ${existing(f.name)} -> ${f.dataType}").mkString(", "))
    }
    append(df, layer, table, partitionBy)
  }

  /** Read with schema merged across all file generations: columns absent
    * from older files surface as NULL (Delta post-evolution reads). The
    * footer merge is a driver-side metadata pass over file schemas, not
    * data — cheap even at 100k files. */
  def readEvolved(layer: String, table: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path(layer, table))

  /** Change-data-capture between two retained generations (Delta CDF
    * `table_changes(...)`): full-outer join the snapshots on `keys` and
    * classify every row as `insert`, `delete`, or an
    * `update_preimage`/`update_postimage` pair; unchanged rows vanish.
    * Single keyed shuffle join + one narrow explode — no second pass
    * over the join, no driver involvement, so the cost at 100 TB is the
    * one join (which AQE/bucketing can co-locate). Value comparison is
    * null-safe per column. `keys` must be unique per snapshot (same
    * precondition as Delta MERGE; violations surface as multiplied join
    * rows, so callers with doubt should dedupe first).
    *
    * Partition pruning (the Delta-CDF "read only changed files"
    * behavior): when both generations are hive-partitioned the same
    * way, a driver-side metadata diff (same walk as [[dataFiles]])
    * finds the partitions whose FILE LISTS (name + length) differ, and
    * each side reads only those partition directories — a partition
    * carried unchanged across generations (archive renames preserve
    * file identity) is never scanned, so CDC cost tracks the CHANGE
    * volume, not the table size. File (name, length) identity is
    * treated as content identity — sound here because every write
    * produces fresh randomized file names; only a metadata-preserving
    * rename can make the lists match. */
  def changesBetween(layer: String, table: String, keys: Seq[String],
                     fromBack: Int, toBack: Int = 0): DataFrame = {
    require(fromBack > toBack,
      s"changesBetween: fromBack ($fromBack) must be older than toBack ($toBack)")
    val beforeDir = generationPath(layer, table, fromBack)
    val afterDir = generationPath(layer, table, toBack)
    val (before, after) = prunedSnapshots(beforeDir, afterDir).getOrElse(
      (spark.read.parquet(beforeDir.toString), spark.read.parquet(afterDir.toString)))
    ChangeFeed.classify(before, after, keys, s"changesBetween($layer, $table)")
  }

  /** Both snapshots restricted to the hive partitions whose file lists
    * differ — `None` when either side is unpartitioned or the partition
    * column chains disagree (caller falls back to full scans). The walk
    * is driver-side file METADATA only (listStatus), no data IO. */
  private def prunedSnapshots(beforeDir: Path, afterDir: Path): Option[(DataFrame, DataFrame)] =
    for {
      bm <- partitionFileMap(beforeDir)
      am <- partitionFileMap(afterDir)
      // partition col chain of a map key: "year=1995/month=3" → (year, month)
      chain = (m: Map[String, Set[(String, Long)]]) =>
        m.keysIterator.next().split('/').toSeq.map(_.split("=", 2)(0))
      if chain(bm) == chain(am)
    } yield {
      val changed = (bm.keySet ++ am.keySet).filter(p => bm.get(p) != am.get(p))
      def side(dir: Path, m: Map[String, Set[(String, Long)]]): DataFrame = {
        val dirs = changed.toSeq.sorted.filter(m.contains).map(p => s"$dir/$p")
        // a side with no changed partitions: empty frame with the full
        // schema (the literal-false filter folds to an empty relation —
        // no scan runs)
        if (dirs.isEmpty) spark.read.parquet(dir.toString).filter(lit(false))
        else spark.read.option("basePath", dir.toString).parquet(dirs: _*)
      }
      (side(beforeDir, bm), side(afterDir, am))
    }

  /** Per-partition file lists `relativePartitionPath -> {(name, len)}`
    * of a hive-partitioned directory; `None` for a flat layout. */
  private def partitionFileMap(dir: Path): Option[Map[String, Set[(String, Long)]]] = {
    if (!fs.exists(dir)) return None
    val out = scala.collection.mutable.Map[String, Set[(String, Long)]]()
    var flat = false
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (st.isDirectory) {
          if (name.contains("=")) walk(st.getPath, if (rel.isEmpty) name else s"$rel/$name")
        } else if (name.endsWith(".parquet")) {
          if (rel.isEmpty) flat = true
          else out(rel) = out.getOrElse(rel, Set.empty[(String, Long)]) + ((name, st.getLen))
        }
      }
    walk(dir, "")
    if (flat || out.isEmpty) None else Some(out.toMap)
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

/** The CDC classification shared by [[Warehouse.changesBetween]] and
  * [[SnapshotStore.changesBetween]]: full-outer join two snapshots on
  * `keys`, tag every row `insert` / `delete` /
  * `update_preimage`+`update_postimage`; unchanged rows vanish. One
  * keyed shuffle join + one narrow explode — no second pass, no driver
  * involvement. Value comparison is null-safe per column. */
private[engine] object ChangeFeed {
  def classify(before: DataFrame, after: DataFrame, keys: Seq[String],
               label: String): DataFrame = {
    require(before.columns.sorted.sameElements(after.columns.sorted),
      s"$label: snapshot schemas differ " +
        s"(${before.columns.mkString(",")} vs ${after.columns.mkString(",")}); " +
        "read evolved snapshots through a projection first")
    val cols = before.columns.toSeq
    require(!cols.contains("_change_type"),
      s"$label: the table already has a _change_type column " +
        "— the CDC tag would collide; rename it first")
    val valueCols = cols.filterNot(keys.contains)
    val b = before.select(struct(cols.map(col): _*).as("b"))
    val a = after.select(struct(cols.map(col): _*).as("a"))
    val joined = b.join(a, keys.map(k => col(s"b.$k") <=> col(s"a.$k")).reduce(_ && _), "full_outer")
    val differs = valueCols.map(c => !(col(s"b.$c") <=> col(s"a.$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    def tagged(tag: String, side: String) =
      struct(lit(tag).as("_change_type") +: cols.map(c => col(s"$side.$c")): _*)
    joined
      .select(explode( // no-change rows fall to NULL, which explode drops
        when(col("b").isNull, array(tagged("insert", "a")))
          .when(col("a").isNull, array(tagged("delete", "b")))
          .when(differs, array(tagged("update_preimage", "b"), tagged("update_postimage", "a"))))
        .as("ch"))
      .select(col("ch._change_type") +: cols.map(c => col(s"ch.$c")): _*)
  }
}
