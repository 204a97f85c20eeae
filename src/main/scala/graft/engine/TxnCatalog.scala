package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame

/**
 * Cross-table ATOMIC commits over a [[SnapshotStore]] — the catalog-
 * pointer mechanism (Nessie/'git-for-data' shape, also how a metastore
 * pins table versions): a catalog version is one tiny file mapping
 * every governed table to a pinned snapshot id, and a multi-table
 * commit stages each table's snapshot first, then flips ONE catalog
 * file via tmp+rename. Readers that resolve through the catalog see
 * all of a group's tables move together or none — the guarantee
 * single-table log formats (Delta/Iceberg) cannot give, and exactly
 * what a medallion pipeline wants when silver and gold must stay
 * mutually consistent (the reference's dbt run materializes
 * daily_stocks and monthly_summary as separate non-atomic steps;
 * daily_lakehouse_pipeline.py:88 just sequences them).
 *
 * Crash safety: a failure while staging (data/manifest writes) leaves
 * the catalog untouched — staged snapshots exist in the store but no
 * catalog version references them, so catalog readers still see the
 * previous consistent group (spec-asserted with a mid-group failure).
 * The rename itself is the only commit point.
 *
 * Contracts: the CATALOG pointer is optimistically concurrent —
 * racing `commitGroup`s over DISJOINT table sets both land (the loser
 * detects the moved pointer via the rename result, merges the
 * winner's pins and retries at the next id; see the commit loop).
 * Concurrent groups touching the SAME table remain single-writer:
 * they contend at the store's per-table manifest rename first.
 * Transactional visibility holds for CATALOG reads (`read`) — direct
 * `SnapshotStore.read` bypasses the catalog by design, seeing the
 * latest per-table snapshot. Size `keepSnapshots` to cover at least
 * `keepVersions` catalog generations' worth of per-table commits, or
 * a retained catalog version could point past the store's retention.
 */
final class TxnCatalog(val st: SnapshotStore, val keepVersions: Int = 10) {
  require(keepVersions >= 1, "TxnCatalog: keepVersions must be >= 1")

  private def fs = new Path(st.root)
    .getFileSystem(st.spark.sparkContext.hadoopConfiguration)
  private def dir = new Path(s"${st.root}/_catalog")

  /** Test seam: runs between tmp-write and rename on every attempt —
    * the only way to deterministically interleave a racing winner into
    * the rename window (TxnCatalogSpec's lost-race test). No-op in
    * production. */
  private[graft] var preCommitHook: () => Unit = () => ()

  /** Delete every catalog version (test/fixture reset — the governed
    * tables' snapshots are untouched; pair with `st.dropTable`). */
  def reset(): Unit = {
    if (fs.exists(dir)) fs.delete(dir, true)
    ()
  }

  /** Retained catalog versions, oldest first. A concurrent writer's
    * retention delete can race the listing (listStatus throws on an
    * entry vanishing between readdir and stat) — re-list, bounded. */
  def versions: Seq[Long] = {
    def attempt(n: Int): Seq[Long] =
      try fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("c")).map(_.drop(1).toLong).sorted
      catch { case _: java.io.FileNotFoundException if n > 0 => attempt(n - 1) }
    if (!fs.exists(dir)) Nil else attempt(3)
  }

  /** The pinned (layer, table) → snapshot id map of catalog version
    * `v` (latest when omitted); empty before the first commit. */
  def tableVersions(v: Option[Long] = None): Map[(String, String), Long] = {
    val vv = v.orElse(versions.lastOption)
    vv.map { id =>
      val in = fs.open(new Path(dir, f"c$id%012d"))
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      text.split("\n").filter(_.nonEmpty).map { line =>
        val Array(layer, table, snap) = line.split("\t")
        (layer, table) -> snap.toLong
      }.toMap
    }.getOrElse(Map.empty)
  }

  /**
   * Atomically commit a group of table overwrites: stage every table's
   * snapshot in the store, then flip the catalog to a version pinning
   * the new ids (tables outside the group keep their previous pins).
   * Returns the new catalog version.
   */
  def commitGroup(writes: Seq[(DataFrame, String, String)],
                  partitionBy: Map[(String, String), Seq[String]] = Map.empty): Long = {
    require(writes.nonEmpty, "commitGroup: empty write group")
    writes.foreach { case (_, layer, table) =>
      require(!s"$layer$table".exists(c => c == '\t' || c == '\n'),
        s"commitGroup: layer/table names must not contain tab/newline: $layer/$table")
    }
    // the same table twice in one group is almost certainly a caller
    // bug (the later write would silently win) — fail fast instead
    val dups = writes.map(w => (w._2, w._3)).groupBy(identity).filter(_._2.size > 1).keys
    require(dups.isEmpty,
      s"commitGroup: table(s) appear more than once in the group: " +
        dups.map { case (l, t) => s"$l/$t" }.mkString(", "))
    // stage everything FIRST — any failure here aborts with the catalog
    // (and therefore every catalog reader) untouched
    val staged = writes.map { case (df, layer, table) =>
      (layer, table) ->
        st.overwrite(df, layer, table, partitionBy.getOrElse((layer, table), Nil))
    }
    // optimistic concurrency at the catalog pointer (the Delta commit
    // protocol's shape): the claim is the sole commit point —
    // [[AtomicClaim]] guarantees exactly one racer wins (HDFS rename
    // refuses an existing destination; local POSIX rename would
    // silently REPLACE it, so file:// claims via hard link instead).
    // A loser re-reads the winner's catalog version (picking up its
    // pins), re-targets the next id, and retries. The winner's group
    // is never dropped; the staged snapshots need no re-staging (they
    // are already durable in the store). Bounded attempts keep a
    // pathological stampede loud.
    fs.mkdirs(dir)
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val next = versions.lastOption.getOrElse(0L) + 1
      val mapping = tableVersions() ++ staged
      val body = mapping.toSeq.sortBy { case ((l, t), _) => (l, t) }
        .map { case ((l, t), id) => s"$l\t$t\t$id" }.mkString("\n")
      // tmp lives OUTSIDE the listed _catalog dir: a transient entry
      // inside it could vanish between a concurrent reader's readdir
      // and stat (listStatus throws FNFE on vanishing entries — a real
      // flake caught by the 4-thread race spec), turning a benign race
      // into a spurious failure
      val tmp = new Path(s"${st.root}/.cat-tmp-c$next-${System.nanoTime()}")
      val out = fs.create(tmp, true)
      try out.write((body + "\n").getBytes("UTF-8")) finally out.close()
      preCommitHook()
      if (AtomicClaim.claim(fs, tmp, new Path(dir, f"c$next%012d"))) committed = next // THE commit point
      else {
        fs.delete(tmp, false)
        attempt += 1
        require(attempt < 10,
          s"TxnCatalog: lost the commit race $attempt times in a row " +
            s"(last contended version: c$next) — giving up; staged snapshots remain " +
            "in the store and no catalog version references them")
      }
    }
    versions.dropRight(keepVersions).foreach { old =>
      fs.delete(new Path(dir, f"c$old%012d"), false)
    }
    committed
  }

  /** Catalog-resolved read: the snapshot the LATEST catalog version
    * pins for this table — transactionally consistent with every other
    * table committed in the same group. */
  def read(layer: String, table: String): DataFrame =
    readAt(layer, table, versions.lastOption.getOrElse(
      throw new IllegalArgumentException("TxnCatalog: no catalog version committed yet")))

  /** Catalog time travel: the table as catalog version `v` pinned it —
    * cross-table-consistent historical reads. */
  def readAt(layer: String, table: String, v: Long): DataFrame = {
    val pins = tableVersions(Some(v))
    val id = pins.getOrElse((layer, table),
      throw new IllegalArgumentException(
        s"TxnCatalog: catalog c$v does not govern $layer/$table " +
          s"(governs: ${pins.keys.map { case (l, t) => s"$l/$t" }.mkString(", ")})"))
    st.readSnapshot(layer, table, id)
  }
}
