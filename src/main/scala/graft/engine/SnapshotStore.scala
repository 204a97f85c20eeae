package graft.engine

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.{DataType, StructType}

/**
 * Manifest-versioned table store — the production table-format shape
 * ([[Warehouse]]'s scaladoc calls a manifest format "the production
 * answer and this class is the seam where it would plug in"; this is
 * that seam, filled). The reference gets these semantics for free from
 * Delta's `_delta_log` (ingest_stocks.py:102-111,
 * transforme_stock_silver.py:136-154); with no Delta jar in this
 * environment, the mechanism is re-implemented the way Delta/Iceberg
 * actually do it: an immutable DATA FILE POOL plus a tiny per-snapshot
 * MANIFEST listing which pool files are visible.
 *
 * Layout: `<root>/<layer>/<table>/data/<hive partition dirs>/part-*`
 * (files only ever added, never mutated) and
 * `<root>/<layer>/<table>/_manifests/m<id>` (line 1 = schema JSON,
 * following lines = pool-relative file paths). A snapshot IS its
 * manifest — a few KB at any table size.
 *
 * What the manifest mechanism buys over directory-swap versioning:
 *
 *   - **Zero-copy snapshots**: generations SHARE unchanged files; a
 *     commit's cost is the new data plus one small manifest write,
 *     never a table rewrite or rename fan-out.
 *   - **Dynamic partition overwrite** ([[overwritePartitions]]): only
 *     touched partitions' files are replaced in the manifest; untouched
 *     partitions keep their physical files — the daily-load shape at
 *     100 TB, where a day's commit touches a handful of partitions.
 *   - **File-granular CDC** ([[changesBetween]]): diffing two manifests
 *     is a driver-side set difference; files SHARED by both snapshots
 *     are provably identical (pool files are immutable) and are never
 *     scanned — CDC cost tracks the change volume, not the table size.
 *   - **Snapshot-isolated reads**: visibility is the committed
 *     manifest, not a directory listing, so readers never observe a
 *     half-written commit (the manifest lands via tmp+rename AFTER its
 *     data files) and never lose the table mid-swap (the
 *     directory-swap emulation's one caveat).
 *   - **VACUUM** ([[vacuum]]): pool files referenced by no retained
 *     manifest are deleted — storage reclamation is decoupled from
 *     commits, exactly like Delta's VACUUM.
 *
 * Concurrency contract — OPTIMISTIC, the Delta commit protocol's
 * shape. Two mechanisms compose:
 *
 *   1. Pool writes stage in a private `.stage-<uuid>` directory and
 *      MOVE into the pool, so a commit's files are identified exactly
 *      (a before/after pool listing would misattribute a concurrent
 *      writer's in-flight files).
 *   2. The manifest rename is the sole commit point; Hadoop reports a
 *      lost race by returning false, and the loser re-reads the
 *      winner's manifest and retries at the next id (bounded).
 *
 * Semantics under races: concurrent APPENDs all land (each retry
 * merges onto the winner's file list — nothing is dropped); blind
 * OVERWRITEs serialize to last-writer-wins; read-modify-write MERGE
 * ([[upsertPartitions]]) detects a concurrent change to its touched
 * partitions and ABORTS loudly instead of silently losing the other
 * writer's update — Delta's ConcurrentAppendException contract.
 * Readers are always safe (a manifest is immutable once renamed).
 * [[vacuum]] is a maintenance-window operation: don't run it while a
 * write is in flight (it reclaims unreferenced pool files and
 * abandoned staging directories).
 */
final class SnapshotStore(val spark: SparkSession, val root: String,
                          val keepSnapshots: Int = 10,
                          val statsFor: Seq[String] = Nil,
                          val bloomFor: Seq[String] = Nil) {
  require(keepSnapshots >= 1, "SnapshotStore: keepSnapshots must be >= 1")

  private def fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def dataDir(layer: String, table: String): String = s"$root/$layer/$table/data"
  private def manifestDir(layer: String, table: String): Path =
    new Path(s"$root/$layer/$table/_manifests")

  /** Committed snapshot ids, oldest first. A concurrent writer's
    * retention delete can race the listing (listStatus throws on an
    * entry vanishing between readdir and stat) — re-list, bounded. */
  def snapshots(layer: String, table: String): Seq[Long] = {
    val dir = manifestDir(layer, table)
    def attempt(n: Int): Seq[Long] =
      try fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filter(_.startsWith("m")).map(_.drop(1).toLong).sorted
      catch { case _: java.io.FileNotFoundException if n > 0 => attempt(n - 1) }
    if (!fs.exists(dir)) Nil else attempt(3)
  }

  def tableExists(layer: String, table: String): Boolean =
    snapshots(layer, table).nonEmpty

  /** Per-file column statistics: `path -> (col -> (min, max))`, min/max
    * as Spark string casts (ISO dates/timestamps sort lexicographically;
    * numerics compare via BigDecimal in [[readBetween]]). */
  private type FileStats = Map[String, Map[String, (String, String)]]

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))
  private def unb64(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), "UTF-8")

  /** One equality-delete file: pool path + the key columns its rows
    * name + the SEQUENCE at which the delete committed. Readers
    * anti-join the data on exactly these columns — but only rows from
    * data files with a STRICTLY LOWER sequence (Iceberg's
    * equality-delete scoping): a row appended AFTER the delete carries
    * a higher sequence and is never swallowed by it. */
  private[engine] case class DeleteEntry(file: String, keyCols: Seq[String],
                                         seq: Long)

  /** A fully parsed manifest. `seqs` records, per data file, the
    * commit sequence at which the file entered the table (missing →
    * 0, i.e. before every delete — the conservative reading). */
  private case class Mf(schema: StructType, props: Map[String, String],
                        files: Seq[String], stats: FileStats,
                        deletes: Seq[DeleteEntry],
                        seqs: Map[String, Long])

  /** The sequence a NEW commit's files (or a new delete) should carry:
    * strictly greater than every sequence the previous manifest
    * mentions. Derived from manifest CONTENT, not the snapshot id, so
    * it stays consistent across [[restore]] / [[shallowClone]] /
    * [[mergeBranch]], whose file lists carry sequences from another
    * point in history. */
  private def nextSeq(prev: Option[Mf]): Long =
    prev.map(m => ((m.seqs.values ++ m.deletes.map(_.seq)) ++ Seq(0L)).max + 1)
      .getOrElse(1L)

  /** Manifest format, one record per line:
    *   line 1       — schema JSON
    *   `#key=value` — properties (e.g. the txn id of an exactly-once append)
    *   `@` lines    — per-file stats: `@<b64 path>\t<col>\u0001<b64 min>\u0001<b64 max>…`
    *   `-` lines    — equality-delete files: `-<b64 path>\t<b64 keycols-csv>\t<seq>`
    *   `~` lines    — per-file commit sequence: `~<b64 path>\t<seq>`
    *   other lines  — pool-relative data file paths
    * Base64 keeps arbitrary string min/max (and `=`-bearing hive paths)
    * out of the delimiter space. Data paths never start with `-` (pool
    * entries start with a partition dir or `part-`, clone references
    * with `/`). */
  private def readMf(layer: String, table: String, id: Long): Mf = {
    val p = new Path(manifestDir(layer, table), f"m$id%012d")
    val in = fs.open(p)
    val lines = try scala.io.Source.fromInputStream(in, "UTF-8").getLines().toVector
    finally in.close()
    require(lines.nonEmpty, s"SnapshotStore: corrupt manifest $p")
    val (propLines, rest) = lines.tail.partition(_.startsWith("#"))
    val (statLines, rest2) = rest.partition(_.startsWith("@"))
    val (seqLines, rest3) = rest2.partition(_.startsWith("~"))
    val (delLines, fileLines) = rest3.partition(_.startsWith("-"))
    val props = propLines.map { l =>
      val kv = l.drop(1).split("=", 2); kv(0) -> kv.lift(1).getOrElse("")
    }.toMap
    val stats: FileStats = statLines.map { l =>
      val parts = l.drop(1).split("\t")
      val cols = parts.tail.map { c =>
        val f = c.split("\u0001"); f(0) -> (unb64(f(1)), unb64(f(2)))
      }.toMap
      unb64(parts.head) -> cols
    }.toMap
    val deletes = delLines.map { l =>
      val parts = l.drop(1).split("\t")
      // a delete line without a recorded sequence (pre-sequencing
      // manifest) conservatively applies to EVERY data file — the old
      // global-anti-join semantics
      DeleteEntry(unb64(parts(0)), unb64(parts(1)).split(",").toSeq,
        parts.lift(2).map(_.toLong).getOrElse(Long.MaxValue))
    }
    val seqs = seqLines.map { l =>
      val parts = l.drop(1).split("\t")
      unb64(parts(0)) -> parts(1).toLong
    }.toMap
    Mf(DataType.fromJson(lines.head).asInstanceOf[StructType], props,
      fileLines, stats, deletes, seqs)
  }

  private def readManifestFull(layer: String, table: String,
                               id: Long): (StructType, Map[String, String], Seq[String], FileStats) = {
    val m = readMf(layer, table, id)
    (m.schema, m.props, m.files, m.stats)
  }

  private def readManifest(layer: String, table: String, id: Long): (StructType, Seq[String]) = {
    val (schema, _, files, _) = readManifestFull(layer, table, id)
    (schema, files)
  }

  /** Commit protocol: write to a tmp name, then CLAIM the manifest
    * name ([[AtomicClaim]] — hard-link on file://, where POSIX rename
    * would silently replace a racing winner's manifest; plain rename
    * on HDFS-likes, which refuse an existing destination) — the
    * manifest (hence the snapshot) appears atomically, AFTER every
    * data file it references exists. Returns false when the claim
    * loses a race (the id is already committed by another writer) —
    * the optimistic-retry paths re-read and retry; [[writeManifest]]
    * is the fail-loud form for paths that must not retry. */
  private def tryWriteManifest(layer: String, table: String, id: Long,
                               schema: StructType, files: Seq[String],
                               props: Map[String, String] = Map.empty,
                               stats: FileStats = Map.empty,
                               deletes: Seq[DeleteEntry] = Nil,
                               seqs: Map[String, Long] = Map.empty): Boolean = {
    require(props.keys.forall(k => !k.contains("=") && !k.contains("\n"))
      && props.values.forall(!_.contains("\n")),
      s"SnapshotStore: malformed manifest properties $props")
    val dir = manifestDir(layer, table)
    fs.mkdirs(dir)
    // unique tmp name, OUTSIDE the listed _manifests dir: a transient
    // entry inside it could vanish between a concurrent reader's
    // readdir and stat ([[snapshots]]'s listStatus throws FNFE on
    // vanishing entries), turning a benign lost race into a spurious
    // failure; the table dir itself is never listStatus'd on the read
    // path
    val tmp = new Path(s"$root/$layer/$table", f".m$id%012d-${System.nanoTime()}.tmp")
    val out = fs.create(tmp, false)
    val propLines = props.toSeq.sortBy(_._1).map { case (k, v) => s"#$k=$v" }
    val fileSet = files.toSet
    val statLines = stats.toSeq.filter(s => fileSet.contains(s._1)).sortBy(_._1)
      .map { case (f, cols) =>
        "@" + b64(f) + cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
          s"\t$c\u0001${b64(mn)}\u0001${b64(mx)}"
        }.mkString
      }
    val delLines = deletes.map(d =>
      "-" + b64(d.file) + "\t" + b64(d.keyCols.mkString(",")) + "\t" + d.seq)
    // sequence lines only matter while deletes are pending (they scope
    // which deletes touch which files); writing them unconditionally
    // keeps appends after a delete correctly sequenced
    val seqLines = seqs.toSeq.filter(s => fileSet.contains(s._1)).sortBy(_._1)
      .map { case (f, sq) => "~" + b64(f) + "\t" + sq }
    try out.write(((schema.json +: propLines) ++ statLines ++ seqLines ++ delLines ++ files)
      .mkString("\n").getBytes("UTF-8"))
    finally out.close()
    if (!AtomicClaim.claim(fs, tmp, new Path(dir, f"m$id%012d"))) {
      fs.delete(tmp, false)
      return false
    }
    // retention: drop manifests beyond keepSnapshots (data files stay
    // until vacuum — reclamation is decoupled from commits)
    snapshots(layer, table).dropRight(keepSnapshots).foreach { old =>
      fs.delete(new Path(dir, f"m$old%012d"), true)
    }
    true
  }

  private def writeManifest(layer: String, table: String, id: Long,
                            schema: StructType, files: Seq[String],
                            props: Map[String, String] = Map.empty,
                            stats: FileStats = Map.empty,
                            deletes: Seq[DeleteEntry] = Nil,
                            seqs: Map[String, Long] = Map.empty): Unit =
    require(tryWriteManifest(layer, table, id, schema, files, props, stats, deletes, seqs),
      s"SnapshotStore: concurrent commit detected for $layer/$table snapshot $id")

  /** Optimistic commit loop: `attempt` reads the CURRENT latest
    * snapshot and tries to commit at the next id; a lost rename race
    * yields None and the loop re-reads and retries — the winner's
    * commit is never dropped. Bounded so a stampede stays loud. */
  private def commitRetry(layer: String, table: String)(attempt: () => Option[Long]): Long = {
    var n = 0
    while (n < 10) {
      attempt() match {
        case Some(id) => return id
        case None => n += 1
      }
    }
    throw new IllegalStateException(
      s"SnapshotStore: lost the commit race 10 times in a row for $layer/$table — " +
        "giving up; this attempt's pool files remain unreferenced (vacuum reclaims them)")
  }

  /** Pool-relative paths of the parquet files under `dataDir`. */
  private def listPool(layer: String, table: String): Set[String] = {
    val base = new Path(dataDir(layer, table))
    if (!fs.exists(base)) return Set.empty
    val baseUri = base.toUri.getPath
    def walk(p: Path): Seq[Path] = {
      val (dirs, files) = fs.listStatus(p).toSeq.partition(_.isDirectory)
      files.map(_.getPath) ++ dirs.flatMap(d => walk(d.getPath))
    }
    walk(base).map(_.toUri.getPath.stripPrefix(baseUri).stripPrefix("/"))
      .filter(_.endsWith(".parquet")).toSet
  }

  /** Append `df`'s rows as new pool files and return their relative
    * paths. The write lands in a private `.stage-<uuid>` directory
    * first and the files MOVE into the pool (same-FS renames) — this
    * commit's files are identified EXACTLY, never by a before/after
    * pool listing, which would misattribute a concurrent writer's
    * in-flight files. Spark part-file names carry a per-job UUID, so
    * moved files cannot collide with other writers'. A crash between
    * move and manifest commit leaves unreferenced pool files (and a
    * crash before the move, an abandoned stage dir) — [[vacuum]]
    * reclaims both. */
  private def writeIntoPool(df: DataFrame, layer: String, table: String,
                            partitionBy: Seq[String]): Seq[String] = {
    val stage = new Path(s"$root/$layer/$table/.stage-${java.util.UUID.randomUUID()}")
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w)
      .parquet(stage.toString)
    def walk(p: Path): Seq[Path] = {
      val (dirs, fls) = fs.listStatus(p).toSeq.partition(_.isDirectory)
      fls.map(_.getPath) ++ dirs.flatMap(d => walk(d.getPath))
    }
    val stageUri = stage.toUri.getPath
    val rels = walk(stage).map(_.toUri.getPath.stripPrefix(stageUri).stripPrefix("/"))
      .filter(_.endsWith(".parquet")).sorted
    val base = new Path(dataDir(layer, table))
    rels.map(new Path(base, _).getParent).distinct.foreach(fs.mkdirs)
    rels.foreach { rel =>
      require(fs.rename(new Path(stage, rel), new Path(base, rel)),
        s"SnapshotStore: failed to move staged file $rel into the pool of $layer/$table")
    }
    fs.delete(stage, true)
    rels
  }

  /** Manifest file entries are pool-relative for this table's own
    * commits and ABSOLUTE (leading `/`) when they reference another
    * table's pool — the shallow-clone mechanism ([[shallowClone]]),
    * exactly how Delta's shallow clone records source-table paths. */
  private def absFile(layer: String, table: String, f: String): String =
    if (f.startsWith("/")) f else s"${dataDir(layer, table)}/$f"

  /** Min/max of the `statsFor` columns per NEW file — Delta/Iceberg
    * file statistics, gathered by ONE aggregate job over just this
    * commit's files (grouped by `input_file_name`; the driver receives
    * one row per new file, never data). Only atomic-typed columns are
    * recorded; an all-NULL file records nothing for that column and is
    * conservatively read by [[readBetween]]. */
  private def statsOf(layer: String, table: String, added: Seq[String]): FileStats = {
    if ((statsFor.isEmpty && bloomFor.isEmpty) || added.isEmpty) return Map.empty
    import org.apache.spark.sql.functions.{col, input_file_name, max, min}
    val base = dataDir(layer, table)
    val df = spark.read.option("basePath", base).parquet(added.map(f => s"$base/$f"): _*)
    val atomic = df.schema.filter(f => f.dataType match {
      case _: org.apache.spark.sql.types.NumericType | _: org.apache.spark.sql.types.StringType
           | _: org.apache.spark.sql.types.DateType | _: org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }).map(_.name).toSet
    val present = statsFor.filter(atomic.contains)
    val baseUriPath = new Path(base).toUri.getPath
    def relOf(fileUri: String): String =
      new Path(new java.net.URI(fileUri)).toUri.getPath
        .stripPrefix(baseUriPath).stripPrefix("/")
    val minmax: FileStats = if (present.isEmpty) Map.empty else {
      // the per-file ROW COUNT rides the same aggregate — zero extra
      // jobs — and makes COUNT(*) a metadata-only query ([[countRows]])
      import org.apache.spark.sql.functions.{count, lit}
      val aggs = present.flatMap(c => Seq(
        min(col(c)).cast("string").as(s"__mn_$c"), max(col(c)).cast("string").as(s"__mx_$c"))) :+
        count(lit(1)).cast("string").as("__rows")
      val rows = df.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*).collect()
      val withRows = rows.map { r =>
        val colStats = present.flatMap { c =>
          (Option(r.getAs[String](s"__mn_$c")), Option(r.getAs[String](s"__mx_$c"))) match {
            case (Some(mn), Some(mx)) => Some(c -> (mn, mx))
            case _ => None
          }
        }.toMap
        val n = r.getAs[String]("__rows")
        relOf(r.getString(0)) -> (colStats + (RowCountStat -> (n, n)))
      }.toMap
      // a ZERO-ROW file yields no input_file_name group, but its row
      // count is KNOWN (0) — record it, or one empty task output would
      // silently disable the metadata COUNT path for the whole table
      withRows ++ added.filterNot(withRows.contains)
        .map(f => f -> Map(RowCountStat -> ("0", "0")))
    }
    val bloomPresent = bloomFor.filter(atomic.contains)
    val blooms: FileStats = if (bloomPresent.isEmpty) Map.empty else {
      import org.apache.spark.sql.functions.{collect_set, when}
      // one aggregate job over just this commit's files: per (column,
      // hash seed) the SET of bloom bit positions its values touch —
      // bounded by min(rows, BloomBits) ints per file, never data
      val aggs = bloomPresent.flatMap(c => bloomPositions(col(c)).zipWithIndex.map {
        case (p, i) => collect_set(when(col(c).isNotNull, p)).as(s"__bp_${i}_$c")
      })
      val rows = df.groupBy(input_file_name().as("__f")).agg(aggs.head, aggs.tail: _*).collect()
      rows.map { r =>
        relOf(r.getString(0)) -> bloomPresent.map { c =>
          val bits = new java.util.BitSet(BloomBits)
          (0 until BloomHashes).foreach { i =>
            r.getSeq[Int](r.fieldIndex(s"__bp_${i}_$c")).foreach(bits.set)
          }
          (BloomStatPrefix + c) ->
            (java.util.Base64.getEncoder.encodeToString(bits.toByteArray),
              s"$BloomBits:$BloomHashes")
        }.toMap
      }.toMap
    }
    (minmax.keySet ++ blooms.keySet).map { f =>
      f -> (minmax.getOrElse(f, Map.empty) ++ blooms.getOrElse(f, Map.empty))
    }.toMap
  }

  /** Reserved per-file stats key carrying the file's row count (stored
    * as an ordinary (min, max) pair with min == max == count). */
  val RowCountStat = "__rows"

  /** Per-file bloom filter sizing: 32768 bits (4 KB per file per
    * indexed column in the manifest) × 2 hash functions keeps the
    * false-positive rate ≈ (1 − e^(−2n/m))² — under 1% at n ≈ 1000
    * distinct keys per file, i.e. a point probe opens ~1 file out of
    * any number. Delta's per-column bloom index / Iceberg's
    * bloom-filter content stats use the same commit-time mechanism. */
  val BloomBits = 32768
  val BloomHashes = 2
  private val BloomStatPrefix = "__bf_"

  /** The bloom bit positions a value lights up — the SAME column
    * expressions serve commit-time indexing and probe-time hashing, so
    * the two sides can never drift. Values hash through their string
    * form (after a cast to the column's type at probe time), making
    * the positions type-width-independent. */
  private def bloomPositions(c: org.apache.spark.sql.Column): Seq[org.apache.spark.sql.Column] = {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    (0 until BloomHashes).map(i =>
      pmod(xxhash64(lit(i), c.cast("string")), lit(BloomBits.toLong)).cast("int"))
  }

  /** Point lookup with bloom-filter file skipping (Delta
    * `bloomFilterIndex`, Iceberg bloom content stats): files whose
    * per-file bloom (recorded at commit time for `bloomFor` columns)
    * provably lacks every probed key are dropped DRIVER-SIDE, before
    * any file opens. This prunes where min/max cannot: a hash- or
    * arrival-distributed key overlaps every file's [min, max] range,
    * but each file's bloom knows its actual key SET (to ~1% false
    * positives), so a point probe on a 100 TB table opens the one file
    * holding the key plus ~fpp × files false positives — versus every
    * file under range stats. Files without a recorded bloom (committed
    * before the index, or the column wasn't in `bloomFor`) are
    * conservatively read; the exact row filter always applies, so
    * false positives cost IO, never correctness. Probes are given in
    * the column's natural text form (like [[readBetween]]); equality
    * deletes still apply through [[readMerged]]. */
  def readPoint(layer: String, table: String, column: String,
                values: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(values.nonEmpty, "readPoint: no probe values given")
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val mf = readMf(layer, table, id)
    val t = mf.schema.find(_.name == column).map(_.dataType).getOrElse(
      throw new IllegalArgumentException(s"readPoint: $layer/$table has no column $column"))
    // probe-side positions via the SAME expressions as commit-side
    // indexing, evaluated in one driver-local job over literals — the
    // text probe casts through the column's type so "007" and "7"
    // hash identically
    val posExprs = values.zipWithIndex.flatMap { case (v, vi) =>
      bloomPositions(lit(v).cast(t)).zipWithIndex.map {
        case (p, i) => p.as(s"__p_${vi}_$i")
      }
    }
    val posRow = spark.range(1).select(posExprs: _*).head()
    val probePos: Seq[Seq[Int]] = values.indices.map(vi =>
      (0 until BloomHashes).map(i => posRow.getAs[Int](s"__p_${vi}_$i")))
    val keep = mf.files.filter { f =>
      mf.stats.get(f).flatMap(_.get(BloomStatPrefix + column)) match {
        case Some((bitsB64, _)) =>
          val bits = java.util.BitSet.valueOf(
            java.util.Base64.getDecoder.decode(bitsB64))
          probePos.exists(_.forall(bits.get))
        case None => true // no bloom recorded: must read
      }
    }
    readMerged(layer, table, mf, keep)
      .filter(col(column).isin(values.map(v => lit(v).cast(t)): _*))
  }

  /** COUNT(*) as a METADATA-ONLY query (Delta/Iceberg answer counts
    * from the log the same way): sum the manifest's per-file row
    * counts — a driver-side walk over a few KB, zero data IO at any
    * table size. `None` when any retained file predates row-count
    * stats (or the store collects no stats) — the caller falls back to
    * a scan; correctness is never silently approximated. */
  def countRows(layer: String, table: String, id: Option[Long] = None): Option[Long] = {
    val snap = id.orElse(snapshots(layer, table).lastOption)
      .getOrElse(return None)
    val m = readMf(layer, table, snap)
    // pending equality deletes remove an unknown number of rows —
    // metadata counts would overcount; fall back to the scan path
    if (m.deletes.nonEmpty) return None
    val (files, stats) = (m.files, m.stats)
    if (files.isEmpty) return Some(0L)
    val counts = files.map(f => stats.get(f).flatMap(_.get(RowCountStat)).map(_._1.toLong))
    if (counts.forall(_.isDefined)) Some(counts.flatten.sum) else None
  }

  /** COUNT(*) as a one-row DataFrame, routed through the metadata path
    * ([[countRows]]) whenever the manifest's per-file row counts are
    * complete — the plan is then a LITERAL over driver-walked KB of
    * manifest, opens ZERO data files (`inputFiles` is empty), and costs
    * the same at 100 TB as at 1 MB. Falls back to a full-scan count
    * when any retained file predates row-count stats, so the answer is
    * never approximated — only the access path changes. This is how
    * Delta/Iceberg serve `SELECT COUNT(*)`: from the log, not the data. */
  def countDF(layer: String, table: String, alias: String = "n"): DataFrame =
    countRows(layer, table) match {
      case Some(n) =>
        import org.apache.spark.sql.functions.lit
        spark.range(1).select(lit(n).as(alias))
      case None =>
        import org.apache.spark.sql.functions.{count, lit}
        read(layer, table).agg(count(lit(1)).as(alias))
    }

  /** Iceberg's `partitions` METADATA TABLE: per-partition file and row
    * counts derived entirely from the manifest — partition values are
    * parsed from the file paths' `k=v` dir chains and row counts come
    * from the per-file stats recorded at commit time, so the answer is
    * a driver walk over KB of metadata that opens ZERO data files at
    * any table size (the per-partition generalization of [[countDF]];
    * callers can assert `.inputFiles.isEmpty`). Flat files report
    * partition `""` — a mixed-layout table (partition evolution) lists
    * each era's partitions side by side. Fails loudly when row-count
    * stats are incomplete or equality deletes are pending (metadata
    * counts would lie); the caller falls back to a data-side GROUP BY
    * in those states, never to a wrong answer. */
  def partitionsDF(layer: String, table: String): DataFrame = {
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val m = readMf(layer, table, id)
    require(m.deletes.isEmpty,
      s"SnapshotStore: $layer/$table has pending equality deletes — metadata " +
        "partition counts would overcount; compact first or GROUP BY the data")
    val rows = m.files.groupBy(partOf).toSeq.map { case (part, fs) =>
      val counts = fs.map(f =>
        m.stats.get(f).flatMap(_.get(RowCountStat)).map(_._1.toLong).getOrElse(
          throw new IllegalStateException(
            s"SnapshotStore: $layer/$table file $f has no row-count stats — " +
              "the metadata partitions table needs statsFor-enabled commits")))
      (part, fs.size.toLong, counts.sum)
    }.sortBy(_._1)
    import spark.implicits._
    rows.toDF("partition", "n_files", "n_rows")
  }

  /** Schema including hive partition columns (the pool write moves
    * `partitionBy` cols into directory names; the manifest records the
    * LOGICAL schema so empty snapshots stay readable). */
  /** Optimistic commit: `build` maps the CURRENT latest snapshot (None
    * for an empty table) to what to commit; on a lost rename race the
    * latest is re-read and `build` runs again against the winner's
    * state — how append-like commits compose with concurrent writers
    * instead of dropping them. */
  private def commitBuild(layer: String, table: String)(
      build: Option[Long] => (StructType, Seq[String], Map[String, String], FileStats)): Long =
    commitBuildD(layer, table) { latest =>
      val (schema, files, props, stats) = build(latest)
      // delete-free commit: carried-over files keep their recorded
      // sequence, new files take the next one — so a LATER delete
      // correctly covers everything this commit made visible
      val prev = latest.map(readMf(layer, table, _))
      val prevSeqs = prev.map(_.seqs).getOrElse(Map.empty[String, Long])
      val sq = nextSeq(prev)
      (schema, files, props, stats, Nil,
        files.map(f => f -> prevSeqs.getOrElse(f, sq)).toMap)
    }

  /** [[commitBuild]] whose builder also decides the snapshot's
    * equality-delete entries and per-file sequences (append-like
    * commits carry the previous snapshot's deletes and sequences
    * forward; overwrites reset them). */
  private def commitBuildD(layer: String, table: String)(
      build: Option[Long] => (StructType, Seq[String], Map[String, String], FileStats, Seq[DeleteEntry], Map[String, Long])): Long =
    commitRetry(layer, table) { () =>
      val latest = snapshots(layer, table).lastOption
      val (schema, files, props, stats, deletes, seqs) = build(latest)
      val id = latest.getOrElse(0L) + 1
      if (tryWriteManifest(layer, table, id, schema, files, props, stats, deletes, seqs)) Some(id)
      else None
    }

  /** Full overwrite: the new snapshot sees only this commit's files.
    * Zero data is copied or deleted — prior snapshots keep reading
    * their own files. Returns the snapshot id. */
  def overwrite(df: DataFrame, layer: String, table: String,
                partitionBy: Seq[String] = Nil,
                txnId: Option[String] = None,
                op: String = "overwrite"): Long =
    txnSeen(layer, table, txnId).getOrElse {
      val added = writeIntoPool(df, layer, table, partitionBy)
      val st = statsOf(layer, table, added)
      // blind overwrite: content is independent of the previous
      // snapshot, so racing overwrites serialize to last-writer-wins
      commitBuild(layer, table)(_ =>
        (df.schema, added, txnProps(txnId) + ("op" -> op), st))
    }

  /** The retained snapshot already carrying `txnId`, if any — the
    * idempotence probe every txn-tagged commit path runs first. */
  private def txnSeen(layer: String, table: String, txnId: Option[String]): Option[Long] =
    txnId.flatMap(t => snapshots(layer, table).reverse.find(id =>
      readManifestFull(layer, table, id)._2.get("txn").contains(t)))

  private def txnProps(txnId: Option[String]): Map[String, String] =
    txnId.map("txn" -> _).toMap

  /** Append: the new snapshot sees the previous snapshot's files plus
    * this commit's. Concurrent appends ALL land: a loser re-reads the
    * winner's file list and retries on top of it. */
  def append(df: DataFrame, layer: String, table: String,
             partitionBy: Seq[String] = Nil): Long = {
    val added = writeIntoPool(df, layer, table, partitionBy)
    val st = statsOf(layer, table, added)
    commitBuildD(layer, table) { latest =>
      val pm = latest.map(readMf(layer, table, _))
      val (prev, prevSt, prevDel) = pm
        .map(m => (m.files, m.stats, m.deletes))
        .getOrElse((Nil, Map.empty: FileStats, Nil))
      (df.schema, (prev ++ added).sorted, Map("op" -> "append"), prevSt ++ st, prevDel,
        pm.map(_.seqs).getOrElse(Map.empty) ++ added.map(_ -> nextSeq(pm)))
    }
  }

  /** Exactly-once append: skip the commit entirely when a retained
    * manifest already carries `txnId` — Delta's `txnAppId`/`txnVersion`
    * idempotent-writer pattern, the contract a streaming `foreachBatch`
    * sink needs so a replayed micro-batch (checkpoint recovery) cannot
    * double-append. Transaction memory is bounded by manifest retention
    * (`keepSnapshots`), exactly as Delta's txn retention is bounded by
    * log retention — size retention to cover the maximum replay window.
    * Returns the snapshot id that carries the txn (new or existing). */
  def appendIfAbsent(df: DataFrame, layer: String, table: String, txnId: String,
                     partitionBy: Seq[String] = Nil): Long =
    txnSeen(layer, table, Some(txnId)).getOrElse {
      val added = writeIntoPool(df, layer, table, partitionBy)
      val st = statsOf(layer, table, added)
      commitBuildD(layer, table) { latest =>
        val pm = latest.map(readMf(layer, table, _))
        val (prev, prevSt, prevDel) = pm
          .map(m => (m.files, m.stats, m.deletes))
          .getOrElse((Nil, Map.empty: FileStats, Nil))
        (df.schema, (prev ++ added).sorted,
          Map("txn" -> txnId, "op" -> "append"), prevSt ++ st, prevDel,
          pm.map(_.seqs).getOrElse(Map.empty) ++ added.map(_ -> nextSeq(pm)))
      }
    }

  /** Delta's `replaceWhere` with an ARBITRARY predicate, as ONE atomic
    * commit: rows matching `predicate` leave via a position-delete
    * file (zero data rewriting) and `df`'s files land in the SAME
    * snapshot — a reader sees the table before or after the swap,
    * never the deleted-but-not-yet-reinserted middle a
    * deleteWherePositions + append pair would expose. Position deletes
    * address (file, row) coordinates, so the replacement files are
    * untouched even where they match the predicate. Matched positions
    * come from the pre-commit snapshot; a txnId makes the whole swap
    * idempotent (the foreachBatch sink contract). */
  def replaceWhere(df: DataFrame, layer: String, table: String,
                   predicate: org.apache.spark.sql.Column,
                   txnId: Option[String] = None): Long =
    txnSeen(layer, table, txnId).getOrElse {
      import org.apache.spark.sql.functions.col
      val matched = readPositions(layer, table).filter(predicate)
        .select(col(PosFileCol), col(PosIdxCol))
        .dropDuplicates(PosFileCol, PosIdxCol)
      val delFiles = writeIntoPool(matched, layer, table, Nil)
      val added = writeIntoPool(df, layer, table, Nil)
      val st = statsOf(layer, table, added)
      commitBuildD(layer, table) { latest =>
        val pm = latest.map(readMf(layer, table, _))
        val (prev, prevSt, prevDel) = pm.map(m => (m.files, m.stats, m.deletes))
          .getOrElse((Nil, Map.empty: FileStats, Nil))
        val sq = nextSeq(pm)
        (df.schema, (prev ++ added).sorted,
          txnProps(txnId) + ("op" -> "replace_where"), prevSt ++ st,
          prevDel ++ delFiles.map(DeleteEntry(_, Seq(PosDeleteMarker), sq)),
          pm.map(_.seqs).getOrElse(Map.empty) ++ added.map(_ -> sq))
      }
    }

  /** Schema-EVOLVING append (Delta `mergeSchema=true`, the reference's
    * own write option at transforme_stock_silver.py:146): `df` may carry
    * columns the table has never seen — the commit records the MERGED
    * logical schema (existing fields first, in their original order and
    * types, then the new fields, forced nullable), and because every
    * read serves the manifest's recorded schema ([[readFiles]]),
    * pre-evolution files surface the new columns as NULL with zero
    * rewriting — the merge-read. `df` may also OMIT existing columns
    * (its files read back NULL for them). Shared columns must keep
    * their exact type — a silent cast is how lakes corrupt data, so
    * type changes fail loudly here. Pre-evolution snapshots keep their
    * own manifests' narrower schema: time travel is schema-faithful. */
  def appendEvolve(df: DataFrame, layer: String, table: String,
                   partitionBy: Seq[String] = Nil): Long = {
    if (!tableExists(layer, table)) return append(df, layer, table, partitionBy)
    val added = writeIntoPool(df, layer, table, partitionBy)
    val st = statsOf(layer, table, added)
    val dfNames = df.schema.fieldNames.toSet
    // the schema merge recomputes per attempt: a racing writer may have
    // evolved the table too, and the loser must merge onto ITS schema
    commitBuildD(layer, table) { latest =>
      val pm = latest.map(readMf(layer, table, _))
      val (prevSchema, prev, prevSt, prevDel) = pm
        .map(m => (m.schema, m.files, m.stats, m.deletes))
        .getOrElse((df.schema, Nil, Map.empty: FileStats, Nil))
      val prevNames = prevSchema.fieldNames.toSet
      df.schema.foreach { f =>
        prevSchema.find(_.name == f.name).foreach { p =>
          require(p.dataType == f.dataType,
            s"appendEvolve: column ${f.name} is ${p.dataType.simpleString} in $layer/$table " +
              s"but ${f.dataType.simpleString} in the incoming batch — evolution adds columns, " +
              "never retypes them; cast explicitly if a retype is intended")
        }
      }
      val merged = StructType(
        // an existing column the batch omits reads NULL from the new
        // files, so it must become nullable in the merged schema too
        prevSchema.fields.map(f => if (dfNames(f.name)) f else f.copy(nullable = true)) ++
          df.schema.fields.filterNot(f => prevNames(f.name)).map(_.copy(nullable = true)))
      (merged, (prev ++ added).sorted, Map("op" -> "append_evolve"), prevSt ++ st, prevDel,
        pm.map(_.seqs).getOrElse(Map.empty) ++ added.map(_ -> nextSeq(pm)))
    }
  }

  /** EQUALITY DELETE, merge-on-read (Iceberg equality-delete files /
    * the role Delta's deletion vectors play): commit the KEYS of the
    * rows to remove as a small delete file — the snapshot's DATA files
    * are untouched (zero rewriting at any table size; deleting 100 rows
    * from a 100 TB table costs one key-file write + a manifest commit).
    * Readers anti-join on the key columns ([[readMerged]] — the
    * delete set broadcasts), scoped by SEQUENCE to the data files
    * visible when the delete committed: rows appended afterwards
    * (even with a deleted key) stay visible, matching Iceberg
    * equality deletes and SQL DELETE-then-INSERT. Prior snapshots
    * still time-travel to the undeleted content, and [[compact]]
    * materializes pending deletes
    * physically (its read applies them; its overwrite commit resets the
    * delete list). `countRows` falls back to a scan while deletes are
    * pending (metadata counts would overcount); partial-overwrite /
    * pruned-merge commits refuse until a compact (they cannot reconcile
    * replaced partitions against global key deletes). Deduplicated
    * keys; concurrent appends compose (the delete names keys, not
    * files). Returns the new snapshot id. */
  def deleteKeys(keys: DataFrame, layer: String, table: String,
                 keyCols: Seq[String]): Long = {
    import org.apache.spark.sql.functions.col
    require(keyCols.nonEmpty, "deleteKeys: keyCols must be non-empty")
    val latest = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val schema = readMf(layer, table, latest).schema
    keyCols.foreach(c => require(schema.fieldNames.contains(c),
      s"deleteKeys: $layer/$table has no column $c"))
    require(keyCols.forall(c => !c.contains(",")),
      s"deleteKeys: key column names must not contain ',' (manifest delimiter): $keyCols")
    // persist the delete file with the TABLE's physical key types, not
    // the caller's (an INT keys frame against a BIGINT column would
    // otherwise fail far away, at read time, when readMerged re-reads
    // the delete file with the table schema)
    val typedKeys = keyCols.map { c =>
      col(c).cast(schema(schema.fieldIndex(c)).dataType).as(c)
    }
    val added = writeIntoPool(
      keys.select(typedKeys: _*).dropDuplicates(keyCols),
      layer, table, Nil)
    commitBuildD(layer, table) { l =>
      val m = l.map(readMf(layer, table, _)).getOrElse(
        throw new IllegalStateException(
          s"SnapshotStore: $layer/$table vanished during deleteKeys"))
      // the delete's sequence scopes it to the files visible NOW —
      // data files appended later carry a higher sequence and are
      // untouched by it (Iceberg equality-delete scoping; a
      // delete-then-reinsert round-trip behaves like SQL
      // DELETE-then-INSERT)
      (m.schema, m.files, Map("op" -> "delete"), m.stats,
        m.deletes ++ added.map(DeleteEntry(_, keyCols, nextSeq(Some(m)))), m.seqs)
    }
  }

  /** [[deleteKeys]] from a predicate: `DELETE FROM t WHERE p`, with the
    * matched keys computed from the current snapshot. */
  def deleteWhere(layer: String, table: String, keyCols: Seq[String],
                  predicate: org.apache.spark.sql.Column): Long =
    deleteKeys(read(layer, table).filter(predicate), layer, table, keyCols)

  // ── Position deletes (Iceberg's second delete-file type) ──────────

  /** Reserved keyCols marker distinguishing a POSITION-delete file
    * from an equality-delete file in the manifest's `-` lines. */
  private val PosDeleteMarker = "__pos_delete__"
  val PosFileCol = "__file"
  val PosIdxCol = "__pos"

  /** The latest snapshot WITH each row's physical address: pool-
    * relative file path + parquet row index (`_metadata.row_index`) —
    * the coordinates a position delete names. Rows already removed by
    * pending deletes are excluded (addresses must reflect what a
    * reader sees). */
  def readPositions(layer: String, table: String): DataFrame = {
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val m = readMf(layer, table, id)
    // pending deletes apply with the SAME sequence scoping read() uses
    // (readMerged): an equality delete removes keys only from files
    // older than it, so a delete-then-reinsert round-trip lists the
    // re-appended row — address listings never diverge from contents.
    readMerged(layer, table, m, m.files, withPos = true)
  }

  /** Commit a POSITION DELETE: `positions` names rows by
    * ([[PosFileCol]], [[PosIdxCol]]) — normally a filtered
    * [[readPositions]]. This is the delete equality files cannot
    * express: it removes ONE specific physical row, so one of two
    * value-identical duplicates can be deleted. Zero data rewriting —
    * the commit adds one small address file; readers anti-join on the
    * address; [[compact]] materializes. */
  def deletePositions(positions: DataFrame, layer: String, table: String): Long = {
    import org.apache.spark.sql.functions.col
    val added = writeIntoPool(
      positions.select(col(PosFileCol), col(PosIdxCol))
        .dropDuplicates(PosFileCol, PosIdxCol),
      layer, table, Nil)
    commitBuildD(layer, table) { l =>
      val m = l.map(readMf(layer, table, _)).getOrElse(
        throw new IllegalStateException(
          s"SnapshotStore: $layer/$table vanished during deletePositions"))
      (m.schema, m.files, Map("op" -> "delete_positions"), m.stats,
        m.deletes ++ added.map(DeleteEntry(_, Seq(PosDeleteMarker), nextSeq(Some(m)))),
        m.seqs)
    }
  }

  /** `DELETE FROM t WHERE p` as a position delete. */
  def deleteWherePositions(layer: String, table: String,
                           predicate: org.apache.spark.sql.Column): Long =
    deletePositions(readPositions(layer, table).filter(predicate), layer, table)

  /** [[readFiles]] with each row's physical address attached — the
    * same layout-era grouping, plus `_metadata` projection and the
    * after-`/data/` relative-path extraction [[readLineage]] uses. */
  private def readFilesWithPos(layer: String, table: String,
                               schema: StructType, files: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions.{col, regexp_extract}
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(schema
          :+ org.apache.spark.sql.types.StructField(PosFileCol,
            org.apache.spark.sql.types.StringType)
          :+ org.apache.spark.sql.types.StructField(PosIdxCol,
            org.apache.spark.sql.types.LongType)))
    def baseOf(p: String): String = {
      val dirChain = p.split('/').dropRight(1)
      val cut = dirChain.indexWhere(_.contains("="))
      (if (cut >= 0) dirChain.take(cut) else dirChain).mkString("/")
    }
    def specOf(p: String): String =
      p.split('/').dropRight(1).filter(_.contains("="))
        .map(_.takeWhile(_ != '=')).mkString("/")
    val logical = schema.fieldNames.map(col)
    files.map(absFile(layer, table, _))
      .groupBy(p => (baseOf(p), specOf(p))).toSeq.sortBy(_._1.toString)
      .map { case ((base, _), fls) =>
        spark.read.schema(schema).option("basePath", base).parquet(fls.sorted: _*)
          .select(logical :+
            regexp_extract(col("_metadata.file_path"), "^.*/data/(.*)$", 1)
              .as(PosFileCol) :+
            col("_metadata.row_index").as(PosIdxCol): _*)
      }.reduce(_.unionByName(_))
  }

  /** Anti-join rows against position-delete files on the physical
    * address. Delete files are commit-sized → Catalyst broadcasts. */
  private def antiJoinPositions(df: DataFrame, layer: String, table: String,
                                deletes: Seq[DeleteEntry]): DataFrame = {
    import org.apache.spark.sql.functions.col
    if (deletes.isEmpty) return df
    val posSchema = StructType(Seq(
      org.apache.spark.sql.types.StructField(PosFileCol,
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField(PosIdxCol,
        org.apache.spark.sql.types.LongType)))
    val addrs = readFiles(layer, table, posSchema, deletes.map(_.file).sorted)
    df.join(addrs.dropDuplicates(PosFileCol, PosIdxCol),
      Seq(PosFileCol, PosIdxCol), "left_anti")
  }

  /** Dynamic partition overwrite (Spark's `partitionOverwriteMode=
    * dynamic`, Delta `replaceWhere` by partition): replace ONLY the
    * partitions `df` carries rows for; every other partition keeps its
    * physical files, carried into the new manifest by reference. The
    * touched-partition set is read from the NEW files' own paths — no
    * extra job over `df` and no driver collect of data. */
  def overwritePartitions(df: DataFrame, layer: String, table: String,
                          partitionBy: Seq[String],
                          txnId: Option[String] = None,
                          op: String = "overwrite_partitions"): Long =
    overwritePartitionsChecked(df, layer, table, partitionBy, txnId, op, mergeBase = None)

  /** Partition dir chain of a manifest entry: "year=1996/part-x" →
    * "year=1996". Entries may be pool-relative (partition dirs lead) or
    * absolute shallow-clone references (pool base leads) — the `k=v`
    * segments of the DIR chain are the partition spec either way. */
  private def partOf(rel: String): String =
    rel.split('/').dropRight(1).filter(_.contains("=")).mkString("/")

  /** [[overwritePartitions]] plus Delta-style WRITE-CONFLICT DETECTION
    * for read-modify-write callers: when `mergeBase` carries the
    * snapshot id the caller's merge READ, and a racing writer has since
    * changed any of the partitions this commit replaces, the commit
    * ABORTS (ConcurrentModificationException) instead of silently
    * overwriting the racer's rows with a merge that never saw them —
    * Delta's ConcurrentAppendException contract. Races on DISJOINT
    * partitions retry and land. Blind callers (mergeBase = None) keep
    * last-writer-wins semantics per partition. */
  private[graft] def overwritePartitionsChecked(df: DataFrame, layer: String, table: String,
                                         partitionBy: Seq[String],
                                         txnId: Option[String], op: String,
                                         mergeBase: Option[Long],
                                         forceTouched: Set[String] = Set.empty): Long = {
    require(partitionBy.nonEmpty,
      "overwritePartitions: partitionBy is required (use overwrite for flat tables)")
    txnSeen(layer, table, txnId).foreach(return _)
    val added = writeIntoPool(df, layer, table, partitionBy)
    val st = statsOf(layer, table, added)
    // forceTouched (explicit partition-dir strings, caller-escaped with
    // the same hive escaping this write path uses) widens the replaced
    // set beyond the partitions df wrote files for — the CDC-apply
    // case, where a batch of pure deletes EMPTIES a partition and must
    // still drop its files even though the merged frame carries no row
    // (and thus no file) for it. The subset require is the encoding
    // tripwire: every dir the write actually produced must be one the
    // caller declared, or the caller's escaping diverged from the
    // write path's and the replace would silently leave stale twins.
    if (forceTouched.nonEmpty) {
      val written = added.map(partOf).toSet
      require(written.subsetOf(forceTouched),
        s"overwritePartitionsChecked: written partition dirs ${written.diff(forceTouched).mkString(", ")} " +
          s"are not in the declared touched set [${forceTouched.mkString(", ")}] — " +
          "partition-path escaping diverged between caller and write path")
    }
    val touched = added.map(partOf).toSet ++ forceTouched
    // lazy: the no-race fast path (latest == mergeBase) never pays the
    // extra manifest read the comparison needs
    lazy val baseTouchedFiles = mergeBase.map { id =>
      readManifestFull(layer, table, id)._3.filter(f => touched.contains(partOf(f))).toSet
    }
    commitBuild(layer, table) { latest =>
      val (prev, prevSt) = latest
        .map { id =>
          val m = readMf(layer, table, id)
          require(m.deletes.isEmpty,
            s"SnapshotStore: $layer/$table has pending equality deletes — a partial " +
              "overwrite cannot reconcile them with replaced partitions; run compact " +
              "(materializes deletes) first")
          (m.files, m.stats)
        }
        .getOrElse((Nil, Map.empty: FileStats))
      if (mergeBase.isDefined && latest != mergeBase) baseTouchedFiles.foreach { base =>
        val nowTouched = prev.filter(f => touched.contains(partOf(f))).toSet
        if (nowTouched != base)
          throw new java.util.ConcurrentModificationException(
            s"SnapshotStore: $layer/$table partitions ${touched.mkString(", ")} changed " +
              s"since the merge read snapshot ${mergeBase.get} — committing would silently " +
              "drop a concurrent writer's rows; re-run the merge against the new snapshot")
      }
      // PARTITION EVOLUTION fence: files written under an older layout
      // (flat, or a different column chain) don't carry this spec's
      // `k=v` dirs, so the partition-scoped replace below could not see
      // rows of the touched partitions living inside them — it would
      // keep stale twins silently. Plain append/overwrite/read work
      // fine on a mixed-spec table (reads union the layouts); only
      // partition-SCOPED mutation demands a uniform layout, which
      // [[compact]] under the current spec restores.
      prev.foreach { f =>
        val specCols = partOf(f).split('/').filter(_.nonEmpty).map(_.takeWhile(_ != '='))
        require(specCols.sameElements(partitionBy),
          s"SnapshotStore: $layer/$table file $f carries partition layout " +
            s"[${specCols.mkString(",")}] != this write's [${partitionBy.mkString(",")}] — " +
            "a partition-scoped overwrite/merge on a mixed-layout table would miss rows " +
            "in old-layout files; compact under the current spec first")
      }
      val kept = prev.filterNot(f => touched.contains(partOf(f)))
      // dropped partitions' stats fall away in the manifest's file filter
      (df.schema, (kept ++ added).sorted, txnProps(txnId) + ("op" -> op), prevSt ++ st)
    }
  }

  /** Keyed MERGE with file pruning (Delta MERGE under a partition
    * predicate): upsert `staged` into ONLY the partitions it touches —
    * the existing side reads just those partitions (partition filter
    * over the manifest's file relation; PartitionFilters in the plan),
    * the merge is [[Merge.upsert]] (staged wins per key), and the write
    * is a [[overwritePartitions]] commit, so untouched partitions are
    * never read OR rewritten. At 100 TB a daily upsert costs the
    * touched partitions' volume, not the table's.
    *
    * Precondition (enforced): `partitionBy ⊆ keys` — the partition is
    * then functionally determined by the key, so a staged key's
    * existing row provably lives in a touched partition and the
    * partition-scoped merge sees every row it must reconcile. (Without
    * it, a key could "move" partitions and leave a stale twin behind —
    * the same reason Delta MERGE only prunes under an explicit
    * partition predicate.)
    *
    * The touched-partition values are one bounded driver read (distinct
    * over the partition columns — low-cardinality by design, same
    * pattern as the pivot key domain), guarded against degenerate
    * layouts. */
  def upsertPartitions(staged: DataFrame, layer: String, table: String,
                       keys: Seq[String], partitionBy: Seq[String],
                       txnId: Option[String] = None): Long = {
    require(partitionBy.nonEmpty,
      "upsertPartitions: partitionBy is required (flat tables: merge + overwrite)")
    txnSeen(layer, table, txnId).foreach(return _)
    require(partitionBy.forall(keys.contains),
      s"upsertPartitions: partition columns (${partitionBy.mkString(",")}) must be a " +
        s"subset of the merge keys (${keys.mkString(",")}) — otherwise a key can move " +
        "partitions and the pruned merge would leave a stale twin behind")
    if (!tableExists(layer, table))
      return overwrite(staged, layer, table, partitionBy, txnId)
    import org.apache.spark.sql.functions.{col, lit}
    val touched = staged.select(partitionBy.map(col): _*).distinct().collect()
    require(touched.length <= 10000,
      s"upsertPartitions: staged batch touches ${touched.length} partitions — " +
        "that is a full-table rewrite; use overwrite, or coarsen the partition layout")
    val pred = touched.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        val v = r.get(i)
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(lit(false))
    // PIN the merge's read to a snapshot id: the commit then detects a
    // concurrent change to the touched partitions (vs this exact base)
    // and aborts rather than silently dropping the racer's rows
    val baseId = snapshots(layer, table).last
    val existingTouched = readSnapshot(layer, table, baseId).filter(pred)
    Merge.schemaGuard(existingTouched, staged)
    overwritePartitionsChecked(Merge.upsert(existingTouched, staged, keys),
      layer, table, partitionBy, txnId, op = "upsert_partitions", mergeBase = Some(baseId))
  }

  /** Partition-pruned CDC APPLY (upserts + deletes in one commit):
    * apply a collapsed change batch — `ups` (full payload rows, staged
    * wins per key) and `delKeys` (key tuples to remove) — touching ONLY
    * the partitions the batch's keys land in. The existing side reads
    * just those partitions off a pinned snapshot, deletes leave via an
    * anti-join, upserts via [[Merge.upsert]], and the commit is one
    * partition-scoped replace with write-conflict detection — so at
    * 100 TB a CDC batch costs its touched partitions' volume, never the
    * maintained table's (the full-table fallback is
    * [[graft.streaming.StreamOps.cdcApplySink]]).
    *
    * Same precondition as [[upsertPartitions]] (`partitionBy ⊆ keys`:
    * keys cannot move partitions, so every row a change must reconcile
    * provably lives in a touched partition). A batch of pure deletes
    * that EMPTIES a partition still drops that partition's files: the
    * touched set is declared explicitly from the batch's key values
    * (hive-escaped exactly as the write path escapes them, with a loud
    * tripwire on divergence), not inferred from the merged frame's
    * written files. */
  def cdcApplyPartitions(ups: DataFrame, delKeys: DataFrame, layer: String,
                         table: String, keys: Seq[String], partitionBy: Seq[String],
                         txnId: Option[String] = None): Long = {
    require(partitionBy.nonEmpty,
      "cdcApplyPartitions: partitionBy is required (flat tables: cdcApplySink)")
    txnSeen(layer, table, txnId).foreach(return _)
    require(partitionBy.forall(keys.contains),
      s"cdcApplyPartitions: partition columns (${partitionBy.mkString(",")}) must be a " +
        s"subset of the keys (${keys.mkString(",")}) — otherwise a key can move " +
        "partitions and the pruned apply would leave a stale twin behind")
    import org.apache.spark.sql.functions.{col, lit}
    if (!tableExists(layer, table))
      return overwrite(ups, layer, table, partitionBy, txnId)
    // touched partitions from BOTH change kinds; raw values drive the
    // pruned read predicate, string casts (Spark's own cast = the
    // dynamic-partition writer's value rendering) drive the dir names
    val batchKeys = ups.select(keys.map(col): _*)
      .unionByName(delKeys.select(keys.map(col): _*))
    val touched = batchKeys
      .select(partitionBy.map(col) ++
        partitionBy.map(c => col(c).cast("string").as(s"__s_$c")): _*)
      .distinct().limit(10001).collect()
    require(touched.length <= 10000,
      s"cdcApplyPartitions: batch touches ${touched.length} partitions — " +
        "that is a full-table apply; use cdcApplySink, or coarsen the layout")
    if (touched.isEmpty) return snapshots(layer, table).last
    val pred = touched.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        val v = r.get(i)
        if (v == null) col(c).isNull else col(c) === lit(v)
      }.reduce(_ && _)
    }.reduce(_ || _)
    val n = partitionBy.length
    val dirs = touched.map { r =>
      partitionBy.zipWithIndex.map { case (c, i) =>
        org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .getPartitionPathString(c, if (r.isNullAt(n + i)) null else r.getString(n + i))
      }.mkString("/")
    }.toSet
    val baseId = snapshots(layer, table).last
    val existingTouched = readSnapshot(layer, table, baseId).filter(pred)
    val kept = existingTouched.join(delKeys, keys, "left_anti")
    Merge.schemaGuard(kept, ups)
    overwritePartitionsChecked(Merge.upsert(kept, ups, keys),
      layer, table, partitionBy, txnId, op = "cdc_apply_partitions",
      mergeBase = Some(baseId), forceTouched = dirs)
  }

  /** Read a manifest's file list. Files are grouped by their pool base
    * (the directory chain above any `k=v` partition segment) and each
    * group gets its own `basePath`, so a manifest that mixes this
    * table's own pool with an absolute-path source pool (a
    * [[shallowClone]] that has since been appended to) reads correctly —
    * hive partition columns resolve per group, then the groups union by
    * name. One group is the common case.
    *
    * The read carries the manifest's RECORDED logical schema (not footer
    * inference): a snapshot's schema is exactly what was committed —
    * stable column order, and files written BEFORE a schema evolution
    * ([[appendEvolve]]) surface the later columns as NULL, which is the
    * Delta/Iceberg merge-read. A pre-evolution snapshot keeps its own
    * manifest's narrower schema, so time travel is schema-faithful. */
  private def readFiles(layer: String, table: String, schema: StructType,
                        files: Seq[String]): DataFrame = {
    if (files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    def baseOf(p: String): String = {
      val dirChain = p.split('/').dropRight(1)
      val cut = dirChain.indexWhere(_.contains("="))
      (if (cut >= 0) dirChain.take(cut) else dirChain).mkString("/")
    }
    // group by (base, partition-column chain): files of DIFFERENT
    // layout eras (partition evolution) must read in separate groups —
    // one mixed-depth listing makes Spark's partition discovery drop
    // the flat files' rows silently. Each group reads under its own
    // layout; hive reads surface partition columns LAST, so the select
    // restores the manifest's logical order before the union.
    def specOf(p: String): String =
      p.split('/').dropRight(1).filter(_.contains("="))
        .map(_.takeWhile(_ != '=')).mkString("/")
    files.map(absFile(layer, table, _))
      .groupBy(p => (baseOf(p), specOf(p))).toSeq.sortBy(_._1.toString)
      .map { case ((base, _), fs) =>
        spark.read.schema(schema).option("basePath", base).parquet(fs.sorted: _*)
          .select(schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
      }.reduce(_.unionByName(_))
  }

  /** Read the latest snapshot. */
  def read(layer: String, table: String): DataFrame =
    readSnapshot(layer, table,
      snapshots(layer, table).lastOption.getOrElse(
        throw new IllegalArgumentException(
          s"SnapshotStore: no committed snapshot for $layer/$table")))

  /** Time travel: read snapshot `id` exactly as committed. Reads go
    * through the manifest's explicit file list (basePath keeps hive
    * partition columns), so a snapshot is reproducible even after later
    * commits add files to the same partition directories. */
  def readSnapshot(layer: String, table: String, id: Long): DataFrame = {
    val ids = snapshots(layer, table)
    require(ids.contains(id),
      s"SnapshotStore: snapshot $id of $layer/$table not retained (have: ${ids.mkString(",")})")
    val m = readMf(layer, table, id)
    readMerged(layer, table, m, m.files)
  }

  /** Merge-on-read with SEQUENCE SCOPING (Iceberg equality-delete
    * semantics): a delete committed at sequence D removes matching
    * keys only from data files whose recorded sequence is < D — rows
    * appended after the delete are never swallowed. Files bucket by
    * their applicable delete set (at most #deletes + 1 buckets, each
    * the deletes whose sequence exceeds the file's); each bucket
    * anti-joins its deletes and the buckets union. Delete sets are
    * commit-sized (small), so Catalyst broadcasts them — a delete
    * costs broadcast anti-joins at read time and ZERO data rewriting
    * at commit time, until [[compact]] materializes it. */
  private def readMerged(layer: String, table: String, m: Mf,
                         files: Seq[String], withPos: Boolean = false): DataFrame = {
    if (m.deletes.isEmpty || files.isEmpty)
      return if (withPos) readFilesWithPos(layer, table, m.schema, files)
             else readFiles(layer, table, m.schema, files)
    files.groupBy(f => m.deletes.filter(_.seq > m.seqs.getOrElse(f, 0L)))
      .toSeq.sortBy(_._2.min) // deterministic plan order
      .map { case (dels, bucket) =>
        val (pos, eq) = dels.partition(_.keyCols == Seq(PosDeleteMarker))
        val base =
          if (pos.isEmpty && !withPos) readFiles(layer, table, m.schema, bucket.sorted)
          else { // metadata-addressed read ONLY where addresses are needed
            val addressed = antiJoinPositions(
              readFilesWithPos(layer, table, m.schema, bucket.sorted),
              layer, table, pos)
            if (withPos) addressed
            else addressed.select(
              m.schema.fieldNames.map(org.apache.spark.sql.functions.col): _*)
          }
        antiJoinDeletes(base, layer, table, m.schema, eq)
      }.reduce(_.unionByName(_))
  }

  private def antiJoinDeletes(df: DataFrame, layer: String, table: String,
                              schema: StructType,
                              deletes: Seq[DeleteEntry]): DataFrame = {
    if (deletes.isEmpty) return df
    deletes.groupBy(_.keyCols).toSeq.sortBy(_._1.mkString(","))
      .foldLeft(df) { case (acc, (cols, entries)) =>
        cols.foreach(c => require(schema.fieldNames.contains(c),
          s"SnapshotStore: delete key column $c missing from $layer/$table schema"))
        val keySchema = StructType(schema.fields.filter(f => cols.contains(f.name)))
        val keys = readFiles(layer, table, keySchema, entries.map(_.file).sorted)
        acc.join(keys.dropDuplicates(cols), cols, "left_anti")
      }
  }

  /** Stats-pruned range scan (Delta/Iceberg data skipping): read only
    * the files whose recorded [min, max] for `column` overlaps
    * [lo, hi], then apply the exact row-level BETWEEN on what remains.
    * The pruning is a driver-side walk over the manifest's stats — no
    * file is opened to decide, so a range query over a range-clustered
    * table (sort or [[graft.ops.Layout]] z-order before commit) touches
    * the matching files only, at any table size. Files without recorded
    * stats (all-NULL, or the column wasn't in `statsFor` at commit) are
    * conservatively read. `lo`/`hi` are strings in the column's natural
    * text form (ISO for dates/timestamps); numeric columns compare via
    * BigDecimal, everything else lexicographically — the same order
    * Spark's string cast preserves for those types. */
  def readBetween(layer: String, table: String, column: String,
                  lo: String, hi: String): DataFrame =
    readWhere(layer, table, Map(column -> (lo, hi)))

  /** Multi-column form of [[readBetween]]: a file survives only if its
    * stats overlap EVERY range (conjunction) — over a z-ordered layout
    * ([[graft.ops.Layout]]) both dimensions prune multiplicatively,
    * which is the point of interleaving the bits. */
  def readWhere(layer: String, table: String,
                ranges: Map[String, (String, String)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    require(ranges.nonEmpty, "readWhere: no ranges given")
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val mf = readMf(layer, table, id)
    val (schema, files, stats) = (mf.schema, mf.files, mf.stats)
    val typed = ranges.map { case (c, lohi) =>
      val t = schema.find(_.name == c).map(_.dataType).getOrElse(
        throw new IllegalArgumentException(s"readWhere: $layer/$table has no column $c"))
      (c, lohi, t)
    }.toSeq
    def le(numeric: Boolean)(a: String, b: String): Boolean =
      if (numeric) BigDecimal(a) <= BigDecimal(b) else a <= b
    val keep = files.filter { f =>
      typed.forall { case (c, (lo, hi), t) =>
        val cmp = le(t.isInstanceOf[org.apache.spark.sql.types.NumericType]) _
        stats.get(f).flatMap(_.get(c)) match {
          case Some((mn, mx)) => cmp(mn, hi) && cmp(lo, mx)
          case None => true // no stats recorded: must read
        }
      }
    }
    val pruned = readMerged(layer, table, mf, keep)
    typed.foldLeft(pruned) { case (df, (c, (lo, hi), t)) =>
      df.filter(col(c) >= lit(lo).cast(t) && col(c) <= lit(hi).cast(t))
    }
  }

  /** Compaction (Delta OPTIMIZE): rewrite the CURRENT snapshot into
    * `numFiles` files (per partition-key hash when `partitionBy` is
    * set), optionally sort-clustered for stats tightness, and commit.
    * Prior snapshots still time-travel — their manifests keep
    * referencing the old files until [[vacuum]]; nothing is deleted by
    * compaction itself. Stats are re-collected for the new files, so a
    * sort by the range key directly tightens [[readWhere]] pruning. */
  def compact(layer: String, table: String, numFiles: Int,
              sortCols: Seq[String] = Nil,
              partitionBy: Seq[String] = Nil): Long = {
    val df = read(layer, table)
    val repartitioned =
      if (partitionBy.nonEmpty) df.repartition(numFiles, partitionBy.map(df(_)): _*)
      else df.repartition(numFiles)
    val arranged =
      if (sortCols.nonEmpty) repartitioned.sortWithinPartitions(sortCols.map(df(_)): _*)
      else repartitioned
    overwrite(arranged, layer, table, partitionBy, op = "compact")
  }

  /** INCREMENTAL compaction (Delta OPTIMIZE's real shape): rewrite
    * ONLY the files smaller than `thresholdBytes` into `numFiles` new
    * files; every file already at target size is carried into the new
    * manifest BY REFERENCE — at 100 TB a daily run touches the day's
    * small-append debris, never the compacted bulk. File sizes come
    * from a driver-side status walk over the manifest's file list (KB
    * of metadata, no data IO to decide). Aborts on a concurrent commit
    * (the rewrite read a specific snapshot; retrying on top of a racer
    * would drop its rows) and refuses while equality deletes are
    * pending (a partial rewrite cannot apply key deletes to the files
    * it does not touch). No-op (returns the current id) when fewer
    * than two small files exist. */
  def compactSmall(layer: String, table: String, thresholdBytes: Long,
                   numFiles: Int = 1, partitionBy: Seq[String] = Nil): Long = {
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val m = readMf(layer, table, id)
    require(m.deletes.isEmpty,
      s"SnapshotStore: $layer/$table has pending equality deletes — compactSmall " +
        "cannot apply key deletes to the files it leaves in place; run compact first")
    val sized = m.files.map(f =>
      f -> fs.getFileStatus(new Path(absFile(layer, table, f))).getLen)
    val (small, big) = sized.partition(_._2 < thresholdBytes)
    if (small.size <= 1) return id
    val df = readFiles(layer, table, m.schema, small.map(_._1))
    import org.apache.spark.sql.functions.col
    val rearranged =
      if (partitionBy.nonEmpty) df.repartition(numFiles, partitionBy.map(col): _*)
      else df.repartition(numFiles)
    val added = writeIntoPool(rearranged, layer, table, partitionBy)
    // commit abort (a concurrent commit raced this rewrite) must not
    // strand the staged rewrite in the pool: delete this attempt's
    // files before rethrowing — they are referenced by no manifest, so
    // the delete can break no reader
    discardOnAbort(layer, table, added) {
      val st = statsOf(layer, table, added)
      commitRetry(layer, table) { () =>
        val latest = snapshots(layer, table).lastOption
        if (latest != Some(id))
          throw new java.util.ConcurrentModificationException(
            s"SnapshotStore: $layer/$table advanced past snapshot $id during " +
              "compactSmall — the rewrite no longer reflects the table; re-run")
        val files = (big.map(_._1) ++ added).sorted
        // stats/seqs explicitly pruned to the surviving file list (the
        // manifest writer also filters to it — belt and braces)
        if (tryWriteManifest(layer, table, id + 1, m.schema, files,
          Map("op" -> "compact_small"), (m.stats -- small.map(_._1)) ++ st,
          seqs = (m.seqs -- small.map(_._1)) ++ added.map(_ -> nextSeq(Some(m))))) Some(id + 1)
        else None
      }
    }
  }

  /** Run `body`; on ANY failure delete this attempt's staged pool
    * files (referenced by no manifest — the delete can break no
    * reader) before rethrowing, so an aborted compaction leaves no
    * orphans for [[vacuum]] to chase. */
  private[graft] def discardOnAbort[T](layer: String, table: String,
                                       added: => Seq[String])(body: => T): T =
    try body
    catch {
      case e: Throwable =>
        try added.foreach(f => fs.delete(new Path(absFile(layer, table, f)), false))
        catch { case _: Throwable => () } // best-effort; vacuum remains the backstop
        throw e
    }

  /** Partition-evolution-aware OPTIMIZE — [[compactSmall]] per
    * PARTITION DIRECTORY (Delta OPTIMIZE's bin-packing unit, which
    * carries its layout era implicitly): on an evolved table, small
    * files are grouped by the partition dir their paths carry
    * ("year=1996", "year=1996/region=eu", or flat "") and each dir's
    * debris is rewritten UNDER ITS OWN LAYOUT — so routine compaction
    * neither forces the full-table rewrite [[compact]] needs to UNIFY
    * layouts nor converts old-era files to the new spec behind the
    * reader's back (the Iceberg rewrite-data-files behavior on
    * spec-evolved tables). At 100 TB an evolved table's old eras are
    * the compacted bulk: a daily run touches only the dirs holding
    * that day's small-append debris, and the one commit carries every
    * untouched file by reference. Same guards as [[compactSmall]]:
    * refuses pending equality deletes, aborts on a concurrent commit;
    * dirs with fewer than two small files are left untouched (so the
    * steady state — one file per dir — is a no-op, same snapshot). */
  def compactSmallEras(layer: String, table: String, thresholdBytes: Long,
                       numFilesPerEra: Int = 1): Long = {
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val m = readMf(layer, table, id)
    require(m.deletes.isEmpty,
      s"SnapshotStore: $layer/$table has pending equality deletes — compactSmallEras " +
        "cannot apply key deletes to the files it leaves in place; run compact first")
    val sized = m.files.map(f =>
      f -> fs.getFileStatus(new Path(absFile(layer, table, f))).getLen)
    val small = sized.filter(_._2 < thresholdBytes).map(_._1)
    // the compaction unit is the PARTITION DIRECTORY (Delta OPTIMIZE's
    // bin-packing unit), which carries its era implicitly: grouping by
    // the mere column CHAIN would see an era's steady state (one file
    // per partition dir) as ≥2 smalls and re-compact it forever, and
    // would shuffle a whole era when only one dir has debris. A dir's
    // rows all share its partition values, so the rewrite under the
    // dir's own spec columns regenerates exactly that dir.
    val byDir = small.groupBy(f => partOf(f)).filter(_._2.size >= 2)
    if (byDir.isEmpty) return id
    // ONE write job per ERA, not per dir: debris dirs sharing a spec
    // chain read together (same depth/columns — hive partition values
    // recover from the paths) and one repartition-by-spec-cols write
    // fans out per dir via partitionBy, so a table with thousands of
    // debris dirs costs #eras jobs instead of #dirs driver-side loops.
    // Hash partitioning puts ALL of a dir's rows in one task, and
    // partitionBy splits colliding dirs back into their own files —
    // so each dir still folds to exactly numFilesPerEra file(s)
    // (numFilesPerEra > 1 adds a deterministic content-hash salt to
    // split within dirs). Flat tables are the one-dir, empty-spec era.
    import org.apache.spark.sql.functions.{col, hash, lit, pmod}
    val byEra = byDir.toSeq.sortBy(_._1).groupBy { case (dir, _) =>
      dir.split('/').filter(_.nonEmpty).map(_.takeWhile(_ != '=')).toSeq
    }
    val addedAcc = Seq.newBuilder[String]
    discardOnAbort(layer, table, addedAcc.result()) {
      val rewritten = byEra.toSeq.sortBy(_._1.mkString("/")).map { case (specCols, dirs) =>
        val fls = dirs.flatMap(_._2)
        val df = readFiles(layer, table, m.schema, fls)
        val arranged =
          if (specCols.isEmpty) df.repartition(numFilesPerEra)
          else if (numFilesPerEra == 1)
            df.repartition(dirs.size, specCols.map(col): _*)
          else {
            val salt = pmod(hash(df.columns.map(col).toIndexedSeq: _*),
              lit(numFilesPerEra))
            df.repartition(dirs.size * numFilesPerEra,
              specCols.map(col) :+ salt: _*)
          }
        val a = writeIntoPool(arranged, layer, table, specCols)
        addedAcc ++= a
        (fls, a)
      }
      val dropped = rewritten.flatMap(_._1)
      val added = rewritten.flatMap(_._2)
      // stats per ERA, not one call over all added files: a mixed-depth
      // listing (flat + k=v files under one basePath) breaks Spark's
      // partition discovery — the same hazard readFiles' era grouping
      // guards against on the read side
      val st = rewritten.map { case (_, a) => statsOf(layer, table, a) }
        .foldLeft(Map.empty: FileStats)(_ ++ _)
      commitRetry(layer, table) { () =>
        val latest = snapshots(layer, table).lastOption
        if (latest != Some(id))
          throw new java.util.ConcurrentModificationException(
            s"SnapshotStore: $layer/$table advanced past snapshot $id during " +
              "compactSmallEras — the rewrite no longer reflects the table; re-run")
        val files = (m.files.diff(dropped) ++ added).sorted
        if (tryWriteManifest(layer, table, id + 1, m.schema, files,
          Map("op" -> "compact_small_eras"), (m.stats -- dropped) ++ st,
          seqs = (m.seqs -- dropped) ++ added.map(_ -> nextSeq(Some(m))))) Some(id + 1)
        else None
      }
    }
  }

  // ── Row lineage (Iceberg v3 row-id mechanism) ─────────────────────

  /** Reserved per-file stats key carrying row lineage: for an
    * appendLineage file, `(firstRowId, firstRowId)`; for a
    * compactLineage file, `("phys", nextRowIdExclusive)` — the file
    * carries a PHYSICAL `_row_id` column and the second slot preserves
    * the id high-water mark across compactions. */
  val FirstRowIdStat = "__frid"
  val RowIdCol = "_row_id"
  private val PhysMarker = "phys"

  /** The next unassigned row id — derived from manifest CONTENT (the
    * [[nextSeq]] design), so restore/clone/branch keep ids monotone. */
  private def nextRowIdOf(m: Option[Mf]): Long = m match {
    case None => 0L
    case Some(mf) =>
      val ends = mf.files.flatMap(f =>
        mf.stats.get(f).flatMap(_.get(FirstRowIdStat)).map {
          case (PhysMarker, end) => end.toLong
          case (frid, _) => frid.toLong + mf.stats(f)(RowCountStat)._1.toLong
        })
      if (ends.isEmpty) 0L else ends.max
  }

  /**
   * Append with ROW LINEAGE: every row of this table carries a stable
   * `_row_id`, assigned once at commit time and preserved for the
   * row's whole life — the Iceberg v3 row-lineage mechanism that makes
   * row-level audit, incremental consumers, and CDC joins possible
   * without a natural key.
   *
   * The ids cost NOTHING at write time: the commit records one
   * `firstRowId` per new file (from the manifest's content-derived
   * high-water mark, advanced by the per-file row counts the stats
   * pass already gathers), and [[readLineage]] synthesizes
   * `_row_id = firstRowId + _metadata.row_index` from the parquet
   * row position — no global sort, no per-row write amplification,
   * distributed-safe at any file count. [[compactLineage]] is the one
   * place ids materialize physically (a rewrite reorders rows, so
   * position-derived ids would change — exactly why Iceberg stamps
   * row ids into rewritten files).
   */
  def appendLineage(df: DataFrame, layer: String, table: String,
                    partitionBy: Seq[String] = Nil): Long = {
    val added = writeIntoPool(df, layer, table, partitionBy)
    val st = statsOf(layer, table, added)
    val counts: Map[String, Long] =
      if (added.forall(f => st.get(f).exists(_.contains(RowCountStat))))
        added.map(f => f -> st(f)(RowCountStat)._1.toLong).toMap
      else {
        import org.apache.spark.sql.functions.input_file_name
        val base = dataDir(layer, table)
        val baseUriPath = new Path(base).toUri.getPath
        val counted = spark.read.option("basePath", base)
          .parquet(added.map(f => s"$base/$f"): _*)
          .groupBy(input_file_name().as("__f")).count().collect()
          .map(r => new Path(new java.net.URI(r.getString(0))).toUri.getPath
            .stripPrefix(baseUriPath).stripPrefix("/") -> r.getLong(1)).toMap
        added.map(f => f -> counted.getOrElse(f, 0L)).toMap // zero-row files
      }
    commitBuildD(layer, table) { latest =>
      val pm = latest.map(readMf(layer, table, _))
      val (prev, prevSt, prevDel) = pm
        .map(m => (m.files, m.stats, m.deletes))
        .getOrElse((Nil, Map.empty: FileStats, Nil))
      require(pm.forall(m => m.files.forall(f =>
        m.stats.get(f).exists(_.contains(FirstRowIdStat)))),
        s"SnapshotStore: $layer/$table has files without row lineage — " +
          "a lineage table must be written by appendLineage/compactLineage only")
      var next = nextRowIdOf(pm)
      val frids = added.sorted.map { f =>
        val assigned = f -> next; next += counts(f); assigned
      }.toMap
      val stL = added.map { f =>
        f -> (st.getOrElse(f, Map.empty[String, (String, String)]) +
          (RowCountStat -> (counts(f).toString, counts(f).toString)) +
          (FirstRowIdStat -> (frids(f).toString, frids(f).toString)))
      }.toMap
      (df.schema, (prev ++ added).sorted, Map("op" -> "append_lineage"),
        prevSt ++ stL, prevDel,
        pm.map(_.seqs).getOrElse(Map.empty) ++ added.map(_ -> nextSeq(pm)))
    }
  }

  /** Read the latest snapshot WITH its `_row_id` column: files from
    * [[compactLineage]] serve their physical column; append files get
    * `firstRowId + _metadata.row_index` (parquet row order is stable,
    * so the id is a pure metadata projection). Files group by layout
    * era like every manifest read (the partition-evolution fence).
    * Refuses loudly on non-lineage files and under pending equality
    * deletes (a positional id must not silently renumber around
    * filtered rows). */
  def readLineage(layer: String, table: String,
                  snapshot: Option[Long] = None): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, col, lit, regexp_extract}
    val id = snapshot.getOrElse(snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table")))
    require(snapshots(layer, table).contains(id),
      s"SnapshotStore: snapshot $id of $layer/$table not retained")
    val m = readMf(layer, table, id)
    require(m.deletes.isEmpty,
      s"SnapshotStore: $layer/$table has pending deletes (equality or " +
        "position) — compact before readLineage; ids must not be served " +
        "for deleted rows")
    val frids = m.files.map { f =>
      f -> m.stats.getOrElse(f, Map.empty).getOrElse(FirstRowIdStat,
        throw new IllegalStateException(
          s"SnapshotStore: file $f of $layer/$table carries no row lineage — " +
            "only appendLineage/compactLineage commits support readLineage"))
    }.toMap
    if (m.files.isEmpty)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(m.schema :+ org.apache.spark.sql.types.StructField(RowIdCol,
          org.apache.spark.sql.types.LongType)))
    val logical = m.schema.fieldNames.map(col)
    def baseOf(p: String): String = {
      val dirChain = p.split('/').dropRight(1)
      val cut = dirChain.indexWhere(_.contains("="))
      (if (cut >= 0) dirChain.take(cut) else dirChain).mkString("/")
    }
    def specOf(p: String): String =
      p.split('/').dropRight(1).filter(_.contains("="))
        .map(_.takeWhile(_ != '=')).mkString("/")
    val (phys, derived) = m.files.partition(f => frids(f)._1 == PhysMarker)
    val physParts = phys.map(absFile(layer, table, _))
      .groupBy(p => (baseOf(p), specOf(p))).toSeq.sortBy(_._1.toString)
      .map { case ((base, _), fls) =>
        spark.read
          .schema(StructType(m.schema :+ org.apache.spark.sql.types.StructField(
            RowIdCol, org.apache.spark.sql.types.LongType)))
          .option("basePath", base).parquet(fls.sorted: _*)
          .select(logical :+ col(RowIdCol): _*)
      }
    val derivedParts =
      if (derived.isEmpty) Nil
      else {
        // keyed by the full pool-relative path (basenames REPEAT across
        // partition dirs of one write — a task writes the same
        // part-NNNNN-uuid name into every partition dir it touches);
        // every pool lives under a `/data/` dir, so the relative path
        // is the suffix after the LAST `/data/`. The map is
        // file-count-sized (driver metadata, like manifests).
        import spark.implicits._
        // clone references are recorded absolute — normalize them to
        // the same after-/data/ suffix the read side extracts; write
        // UUIDs keep suffixes unique, and the require makes a
        // collision loud instead of a silent row duplication
        def keyOf(f: String): String =
          if (f.startsWith("/")) f.split("/data/").last else f
        val entries = derived.map(f => (keyOf(f), frids(f)._1.toLong))
        require(entries.map(_._1).distinct.size == entries.size,
          s"SnapshotStore: colliding relative file paths in lineage read of $layer/$table")
        val baseMap = broadcast(entries.toDF("__frel", "__frid"))
        derived.map(absFile(layer, table, _))
          .groupBy(p => (baseOf(p), specOf(p))).toSeq.sortBy(_._1.toString)
          .map { case ((base, _), fls) =>
            spark.read.schema(m.schema).option("basePath", base)
              .parquet(fls.sorted: _*)
              .select(logical :+
                col("_metadata.row_index").as("__ri") :+
                regexp_extract(col("_metadata.file_path"), "^.*/data/(.*)$", 1)
                  .as("__frel"): _*)
              .join(baseMap, "__frel")
              .select(logical :+ (col("__frid") + col("__ri")).as(RowIdCol): _*)
          }
      }
    (physParts ++ derivedParts).reduce(_.unionByName(_))
  }

  /** Rewrite the table into `numFiles` files, MATERIALIZING `_row_id`
    * physically — compaction reorders rows, so the position-derived
    * ids of [[appendLineage]] files are stamped into the rewritten
    * parquet (Iceberg v3's rewrite rule). The id high-water mark rides
    * the new files' stats, so later appends continue the sequence.
    * Aborts on a concurrent commit like [[compactSmall]]. */
  def compactLineage(layer: String, table: String, numFiles: Int = 1): Long = {
    val id = snapshots(layer, table).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $layer/$table"))
    val m = readMf(layer, table, id)
    val nextId = nextRowIdOf(Some(m))
    val df = readLineage(layer, table)
    val added = writeIntoPool(df.repartition(numFiles), layer, table, Nil)
    val st = statsOf(layer, table, added)
    commitRetry(layer, table) { () =>
      val latest = snapshots(layer, table).lastOption
      if (latest != Some(id))
        throw new java.util.ConcurrentModificationException(
          s"SnapshotStore: $layer/$table advanced past snapshot $id during " +
            "compactLineage — the rewrite no longer reflects the table; re-run")
      val stL = added.map { f =>
        f -> (st.getOrElse(f, Map.empty[String, (String, String)]) +
          (FirstRowIdStat -> (PhysMarker, nextId.toString)))
      }.toMap
      if (tryWriteManifest(layer, table, id + 1, m.schema, added.sorted,
        Map("op" -> "compact_lineage"), stL,
        seqs = added.map(_ -> nextSeq(Some(m))).toMap)) Some(id + 1)
      else None
    }
  }

  /** CDC between two snapshots, pruned at FILE granularity: pool files
    * are immutable, so files present in both manifests hold identical
    * rows and are never scanned — each side reads only its exclusive
    * files. A dynamic-partition commit that touched 1 of 10k partitions
    * scans ~2 partitions' worth of data regardless of table size. */
  def changesBetween(layer: String, table: String, keys: Seq[String],
                     fromId: Long, toId: Long): DataFrame = {
    require(fromId < toId, s"changesBetween: fromId ($fromId) must precede toId ($toId)")
    val (fromMf, toMf) = (readMf(layer, table, fromId), readMf(layer, table, toId))
    require(fromMf.deletes.toSet == toMf.deletes.toSet,
      s"changesBetween: equality deletes changed between snapshots $fromId and $toId " +
        "of " + s"$layer/$table — file-granular CDC cannot classify merge-on-read " +
        "deletes; compact (materialize) before diffing across a delete")
    val (fromSchema, fromFiles) = (fromMf.schema, fromMf.files)
    val (toSchema, toFiles) = (toMf.schema, toMf.files)
    def side(own: Seq[String], other: Seq[String], schema: StructType): DataFrame =
      readFiles(layer, table, schema, (own.toSet -- other.toSet).toSeq.sorted)
    ChangeFeed.classify(
      side(fromFiles, toFiles, fromSchema), side(toFiles, fromFiles, toSchema),
      keys, s"changesBetween($layer, $table)")
  }

  /** Delta RESTORE: make snapshot `id`'s content CURRENT again by
    * committing its exact file list (and per-file stats) as a NEW
    * snapshot — zero data movement, a manifest write only. History is
    * preserved: the restore is itself a snapshot, so the "bad" commits
    * it rolls back remain time-travelable (and the restore can itself
    * be restored away), exactly Delta's RESTORE semantics. The one-line
    * disaster-recovery answer after a bad overwrite or merge at any
    * table size. Returns the new snapshot id. */
  def restore(layer: String, table: String, id: Long): Long = {
    val ids = snapshots(layer, table)
    require(ids.contains(id),
      s"SnapshotStore: snapshot $id of $layer/$table not retained (have: ${ids.mkString(",")})")
    val m = readMf(layer, table, id)
    // restore re-points to an immutable snapshot's files — content is
    // independent of the latest, so a lost race just retries (a racing
    // writer's commit stays time-travelable behind the restore)
    commitBuildD(layer, table)(_ =>
      (m.schema, m.files, Map("op" -> "restore", "restored_from" -> id.toString),
        m.stats, m.deletes, m.seqs))
  }

  /** Zero-copy SHALLOW CLONE (Delta `CREATE TABLE ... SHALLOW CLONE`):
    * create `dstLayer/dstTable` whose first snapshot references the
    * source table's CURRENT data files by absolute path — no data is
    * copied, the clone costs one manifest write at any source size. The
    * clone is a first-class table from then on: appends/overwrites/
    * merges write into its OWN pool (the manifest mixes absolute source
    * references with the clone's relative files — [[readFiles]] resolves
    * both), and CDC, time travel, stats pruning, compaction all work;
    * compacting the clone rewrites its content into its own pool,
    * severing the source dependency. The sandbox-experiment shape:
    * clone production, mutate the clone, diff, drop.
    *
    * Caveat (exactly Delta's): [[vacuum]] on the SOURCE table does not
    * know about clones and can delete files a clone still references —
    * a clone must not outlive its source's retention unless compacted.
    * Vacuum on the CLONE only ever touches the clone's own pool. */
  def shallowClone(srcLayer: String, srcTable: String,
                   dstLayer: String, dstTable: String): Long = {
    val srcId = snapshots(srcLayer, srcTable).lastOption.getOrElse(
      throw new IllegalArgumentException(
        s"SnapshotStore: no committed snapshot for $srcLayer/$srcTable"))
    require(!tableExists(dstLayer, dstTable),
      s"SnapshotStore: clone target $dstLayer/$dstTable already exists")
    val m = readMf(srcLayer, srcTable, srcId)
    val absFiles = m.files.map(absFile(srcLayer, srcTable, _)).sorted
    val absStats = m.stats.map { case (f, s) => absFile(srcLayer, srcTable, f) -> s }
    val absDel = m.deletes.map(d => d.copy(file = absFile(srcLayer, srcTable, d.file)))
    writeManifest(dstLayer, dstTable, 1L, m.schema, absFiles,
      Map("op" -> "clone", "cloned_from" -> s"$srcLayer/$srcTable@m$srcId"),
      stats = absStats, deletes = absDel,
      seqs = m.seqs.map { case (f, sq) => absFile(srcLayer, srcTable, f) -> sq })
    1L
  }

  /** FAST-FORWARD BRANCH MERGE (the Nessie/Iceberg-branch workflow,
    * built on [[shallowClone]]): a "branch" is a shallow clone —
    * zero-copy, its own commit chain, experiments land in its own
    * pool. Merging publishes the branch head back onto the SOURCE
    * table as one new snapshot, by file reference (no data copied:
    * source-pool files return to relative form, branch-pool files ride
    * as absolute references — compact afterwards to localize them).
    *
    * Only fast-forward merges are allowed: if the source advanced past
    * the branch point (read from the clone's provenance), the merge
    * ABORTS loudly — divergent histories need a real three-way merge,
    * and silently clobbering the source's new commits is the one
    * unacceptable outcome. The check re-runs inside the commit loop,
    * so a writer racing the merge itself also aborts it. Returns the
    * new source snapshot id. */
  def mergeBranch(branchLayer: String, branchTable: String): Long = {
    val ids = snapshots(branchLayer, branchTable)
    require(ids.nonEmpty, s"SnapshotStore: no snapshots on $branchLayer/$branchTable")
    val prov = readMf(branchLayer, branchTable, ids.head).props.getOrElse("cloned_from",
      throw new IllegalArgumentException(
        s"SnapshotStore: $branchLayer/$branchTable is not a branch (no clone provenance " +
          "in its oldest retained manifest — branches must not outlive manifest retention)"))
    val Array(srcPath, baseTag) = prov.split("@m")
    val Array(srcLayer, srcTable) = srcPath.split("/")
    val base = baseTag.toLong
    val head = readMf(branchLayer, branchTable, ids.last)
    val srcData = dataDir(srcLayer, srcTable)
    def toSrc(f: String): String = {
      val abs = absFile(branchLayer, branchTable, f)
      if (abs.startsWith(srcData + "/")) abs.stripPrefix(srcData + "/") else abs
    }
    commitBuildD(srcLayer, srcTable) { latest =>
      require(latest.contains(base),
        s"SnapshotStore: cannot fast-forward $branchLayer/$branchTable onto " +
          s"$srcLayer/$srcTable — source advanced from snapshot $base to " +
          s"${latest.getOrElse(0L)} since the branch was cut; rebase (re-clone " +
          "and replay) instead of clobbering the source's commits")
      (head.schema, head.files.map(toSrc).sorted,
        Map("op" -> "merge_branch",
          "merged_from" -> s"$branchLayer/$branchTable@m${ids.last}"),
        head.stats.map { case (f, st) => toSrc(f) -> st },
        head.deletes.map(d => d.copy(file = toSrc(d.file))),
        head.seqs.map { case (f, sq) => toSrc(f) -> sq })
    }
  }

  /** DESCRIBE HISTORY analogue: one row per RETAINED snapshot, oldest
    * first — `(snapshot_id, op, n_files, txn, detail)` from the
    * manifests' recorded properties (a driver-side walk over a few-KB
    * files, no data IO at any table size). Snapshots written before op
    * recording read as op "unknown"; `detail` carries restore/clone
    * provenance. The audit surface a governed pipeline needs: what
    * operation produced each generation, and which streaming txn (if
    * any) it belongs to. */
  def history(layer: String, table: String): DataFrame = {
    val rows = snapshots(layer, table).map { id =>
      val (_, props, files, _) = readManifestFull(layer, table, id)
      (id, props.getOrElse("op", "unknown"), files.size.toLong,
        props.getOrElse("txn", null), props.get("restored_from")
          .map("restored_from=" + _)
          .orElse(props.get("cloned_from").map("cloned_from=" + _)).orNull)
    }
    val s2 = spark
    import s2.implicits._
    rows.toDF("snapshot_id", "op", "n_files", "txn", "detail")
  }

  /** Commit wall-clock time of a snapshot: the manifest file's
    * modification time (the manifest is written once and renamed into
    * place, so its mtime IS the commit instant — exactly how Delta
    * resolves `TIMESTAMP AS OF` from its log files). Epoch millis. */
  def commitTimeMs(layer: String, table: String, id: Long): Long =
    fs.getFileStatus(new Path(manifestDir(layer, table),
      f"m$id%012d")).getModificationTime

  /** `TIMESTAMP AS OF` time travel: the latest snapshot committed at
    * or before `tsMs` — resolved from manifest mtimes, a driver
    * metadata walk over the retained snapshot list (no data IO).
    * Fails loudly when `tsMs` predates every retained snapshot, like
    * Delta's timestamp-before-earliest error — never silently returns
    * newer data than the caller asked for. */
  def snapshotAsOf(layer: String, table: String, tsMs: Long): Long = {
    val ids = snapshots(layer, table)
    require(ids.nonEmpty,
      s"SnapshotStore: no committed snapshot for $layer/$table")
    val at = ids.filter(commitTimeMs(layer, table, _) <= tsMs)
    require(at.nonEmpty,
      s"SnapshotStore: no snapshot of $layer/$table at or before $tsMs " +
        s"(earliest retained commit: ${commitTimeMs(layer, table, ids.head)})")
    at.max
  }

  /** Read the table as of a wall-clock instant ([[snapshotAsOf]]). */
  def readAsOf(layer: String, table: String, tsMs: Long): DataFrame =
    readSnapshot(layer, table, snapshotAsOf(layer, table, tsMs))

  /** Delete pool files referenced by NO retained manifest (Delta
    * VACUUM): a driver-side set difference over file paths, then
    * deletes. Safe at any time — retained snapshots keep every file
    * they reference. Returns how many files were removed. */
  /** VACUUM DRY-RUN (Delta's `VACUUM ... DRY RUN`): the orphan report
    * — pool files no retained manifest references, with their sizes —
    * WITHOUT deleting anything. A driver-side metadata walk (the same
    * sets [[vacuum]] computes); lets operators audit reclaimable bytes
    * before committing to the irreversible sweep. */
  def orphanReport(layer: String, table: String): DataFrame = {
    import spark.implicits._
    val referenced = snapshots(layer, table)
      .flatMap { id =>
        val m = readMf(layer, table, id)
        m.files ++ m.deletes.map(_.file)
      }.toSet
    val orphans = (listPool(layer, table) -- referenced).toSeq.sorted
    orphans.map { f =>
      (f, fs.getFileStatus(new Path(s"${dataDir(layer, table)}/$f")).getLen)
    }.toDF("file", "bytes")
  }

  def vacuum(layer: String, table: String): Int = {
    val referenced = snapshots(layer, table)
      .flatMap { id =>
        val m = readMf(layer, table, id)
        m.files ++ m.deletes.map(_.file) // delete files are live too
      }.toSet
    val orphans = listPool(layer, table) -- referenced
    orphans.foreach(f => fs.delete(new Path(s"${dataDir(layer, table)}/$f"), false))
    // abandoned staging dirs and manifest tmp files from crashed
    // writers (vacuum is a maintenance-window op: no write may be in
    // flight — class scaladoc)
    val tableRoot = new Path(s"$root/$layer/$table")
    if (fs.exists(tableRoot))
      fs.listStatus(tableRoot).toSeq
        .filter { s =>
          (s.isDirectory && s.getPath.getName.startsWith(".stage-")) ||
            (!s.isDirectory && s.getPath.getName.startsWith(".m") &&
              s.getPath.getName.endsWith(".tmp"))
        }
        .foreach(s => fs.delete(s.getPath, true))
    orphans.size
  }

  def dropTable(layer: String, table: String): Unit = {
    fs.delete(new Path(s"$root/$layer/$table"), true)
    ()
  }
}
