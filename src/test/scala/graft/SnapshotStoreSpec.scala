package graft

import graft.engine.SnapshotStore
import org.apache.spark.sql.functions._

/** Manifest-versioned store: zero-copy snapshots, dynamic partition
  * overwrite, file-granular CDC pruning, vacuum, snapshot isolation. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(tag: String, keep: Int = 10) = new SnapshotStore(
    spark, java.nio.file.Files.createTempDirectory(s"graft_ss_$tag").toString, keep)

  test("overwrite/append round-trip; prior snapshots stay readable (isolation)") {
    val st = newStore("rt")
    val v1 = st.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "silver", "t")
    val v2 = st.append(Seq((3L, "c")).toDF("id", "v"), "silver", "t")
    val v3 = st.overwrite(Seq((9L, "z")).toDF("id", "v"), "silver", "t")
    assert(st.readSnapshot("silver", "t", v1).count() == 2)
    assert(st.readSnapshot("silver", "t", v2).orderBy("id")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b"), (3L, "c")))
    assert(st.read("silver", "t").as[(Long, String)].collect().toSeq == Seq((9L, "z")))
    assert(st.snapshots("silver", "t") == Seq(v1, v2, v3))
  }

  test("dynamic partition overwrite: untouched partitions share PHYSICAL files") {
    val st = newStore("dyn")
    st.overwrite(
      Seq((1L, "old", 2024), (2L, "old", 2024), (3L, "old", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val filesV1 = st.read("gold", "t").inputFiles.toSet
    st.overwritePartitions(
      Seq((3L, "new", 2025), (4L, "new", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val out = st.read("gold", "t")
    assert(out.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "old"), (2L, "old"), (3L, "new"), (4L, "new")))
    // the 2024 partition's files in snapshot 2 ARE snapshot 1's files —
    // carried by manifest reference, not rewritten or copied
    val filesV2 = out.inputFiles.toSet
    val shared = filesV1.intersect(filesV2)
    assert(shared.nonEmpty && shared.forall(_.contains("year=2024")),
      s"expected 2024 files shared by reference, got: $shared")
    assert(filesV2.filter(_.contains("year=2025")).forall(!filesV1.contains(_)),
      "2025 files must be the NEW commit's files")
  }

  test("changesBetween scans only each side's exclusive files and classifies") {
    val st = newStore("cdc")
    val v1 = st.overwrite(
      Seq((1L, "same", 2024), (3L, "old", 2025), (5L, "gone", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val v2 = st.overwritePartitions(
      Seq((3L, "new", 2025), (6L, "born", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val ch = st.changesBetween("gold", "t", Seq("id"), v1, v2)
    // the shared 2024 partition never enters the scan — file-granular CDC
    assert(ch.inputFiles.nonEmpty && ch.inputFiles.forall(!_.contains("year=2024")),
      s"shared files leaked into the CDC scan: ${ch.inputFiles.mkString(", ")}")
    val rows = ch.select("_change_type", "id", "v").as[(String, Long, String)]
      .collect().toSeq.sorted
    assert(rows == Seq(
      ("delete", 5L, "gone"), ("insert", 6L, "born"),
      ("update_postimage", 3L, "new"), ("update_preimage", 3L, "old")))
  }

  test("append-only CDC: empty exclusive before-side, all rows are inserts") {
    val st = newStore("app")
    val v1 = st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    val v2 = st.append(Seq((2L, "b")).toDF("id", "v"), "silver", "t")
    val ch = st.changesBetween("silver", "t", Seq("id"), v1, v2)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq
    assert(ch == Seq(("insert", 2L))) // the shared v1 file is skipped entirely
  }

  test("vacuum deletes only files no retained manifest references") {
    val st = newStore("vac", keep = 1) // retention: latest manifest only
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    st.overwrite(Seq((2L, "b")).toDF("id", "v"), "silver", "t")
    // snapshot 1's manifest is beyond retention; its files are orphans
    assert(st.snapshots("silver", "t").size == 1)
    val removed = st.vacuum("silver", "t")
    assert(removed >= 1, "expected snapshot 1's files reclaimed")
    assert(st.read("silver", "t").as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    assert(st.vacuum("silver", "t") == 0) // idempotent
  }

  test("upsertPartitions merges only touched partitions, others share files") {
    val st = newStore("ups")
    st.overwrite(
      Seq((1L, "keep", 2024), (2L, "old", 2025), (3L, "keep", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val filesV1 = st.read("gold", "t").inputFiles.toSet
    // staged: update id=2, insert id=4 — both in year=2025
    st.upsertPartitions(
      Seq((2L, "new", 2025), (4L, "born", 2025)).toDF("id", "v", "year"),
      "gold", "t", keys = Seq("id", "year"), partitionBy = Seq("year"))
    val out = st.read("gold", "t")
    assert(out.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep"), (2L, "new"), (3L, "keep"), (4L, "born")))
    // the untouched 2024 partition carried its physical files by reference
    val shared = filesV1.intersect(out.inputFiles.toSet)
    assert(shared.nonEmpty && shared.forall(_.contains("year=2024")), s"shared: $shared")
    // partition columns outside the merge keys are refused (a key could
    // move partitions and leave a stale twin)
    intercept[IllegalArgumentException] {
      st.upsertPartitions(Seq((9L, "x", 2025)).toDF("id", "v", "year"),
        "gold", "t", keys = Seq("id"), partitionBy = Seq("year"))
    }
    // first commit on a missing table degrades to a plain overwrite
    val st2 = newStore("ups2")
    st2.upsertPartitions(Seq((1L, "a", 2024)).toDF("id", "v", "year"),
      "gold", "t", keys = Seq("id", "year"), partitionBy = Seq("year"))
    assert(st2.read("gold", "t").count() == 1)
  }

  test("cdcApplyPartitions: pruned upsert+delete, emptied partition drops files") {
    val st = newStore("cdcp")
    st.overwrite(
      Seq((1L, "keep", 2024), (2L, "old", 2025), (3L, "bye", 2026), (4L, "bye2", 2026))
        .toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val filesV1 = st.read("gold", "t").inputFiles.toSet
    // one batch: upsert id=2 + insert id=5 (year=2025), delete BOTH
    // 2026 rows — 2026 is emptied, so its files must leave the
    // manifest even though the merged frame writes nothing there
    st.cdcApplyPartitions(
      ups = Seq((2L, "new", 2025), (5L, "born", 2025)).toDF("id", "v", "year"),
      delKeys = Seq((3L, 2026), (4L, 2026)).toDF("id", "year"),
      "gold", "t", keys = Seq("id", "year"), partitionBy = Seq("year"),
      txnId = Some("b-0"))
    val out = st.read("gold", "t")
    assert(out.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "keep"), (2L, "new"), (5L, "born")))
    val files = out.inputFiles.toSet
    assert(!files.exists(_.contains("year=2026")), s"emptied partition files remain: $files")
    // the untouched 2024 partition rides through by physical reference
    val shared = filesV1.intersect(files)
    assert(shared.nonEmpty && shared.forall(_.contains("year=2024")), s"shared: $shared")
    // checkpoint replay of the same txn is a no-op
    val snapBefore = st.snapshots("gold", "t").last
    st.cdcApplyPartitions(
      ups = Seq((9L, "evil", 2025)).toDF("id", "v", "year"),
      delKeys = Seq.empty[(Long, Int)].toDF("id", "year"),
      "gold", "t", keys = Seq("id", "year"), partitionBy = Seq("year"),
      txnId = Some("b-0"))
    assert(st.snapshots("gold", "t").last == snapBefore)
    assert(st.read("gold", "t").count() == 3)
    // partition columns outside the keys are refused
    intercept[IllegalArgumentException] {
      st.cdcApplyPartitions(
        Seq((9L, "x", 2025)).toDF("id", "v", "year"),
        Seq((9L, 2025)).toDF("id", "year"),
        "gold", "t", keys = Seq("id"), partitionBy = Seq("year"))
    }
  }

  test("countRows answers COUNT(*) from manifest metadata alone") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cnt").toString,
      statsFor = Seq("id"))
    st.overwrite((1L to 100L).map(i => (i, s"v$i")).toDF("id", "v"), "silver", "t")
    st.append((101L to 130L).map(i => (i, s"v$i")).toDF("id", "v"), "silver", "t")
    assert(st.countRows("silver", "t").contains(130L))
    assert(st.countRows("silver", "t").get == st.read("silver", "t").count())
    // snapshot-pinned count matches the snapshot's own rows
    val first = st.snapshots("silver", "t").head
    assert(st.countRows("silver", "t", Some(first)).contains(100L))
    // a store collecting no stats cannot answer — explicit None, no guess
    val bare = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cnt0").toString)
    bare.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    assert(bare.countRows("silver", "t").isEmpty)
  }

  test("zero-row task files do not disable the metadata COUNT path") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cnt_z").toString,
      statsFor = Seq("id"))
    // repartition(4) over 2 rows leaves empty tasks, which write
    // zero-row files on some plans — their count is known (0)
    st.overwrite((1L to 2L).map(i => (i, s"v$i")).toDF("id", "v").repartition(4),
      "silver", "t")
    st.append(spark.range(0).selectExpr("id", "CAST(id AS STRING) AS v"), "silver", "t")
    assert(st.countRows("silver", "t").contains(2L),
      s"metadata count must survive empty files, got ${st.countRows("silver", "t")}")
    assert(st.countDF("silver", "t").inputFiles.isEmpty)
  }

  test("countDF takes the metadata path when stats are complete, scans otherwise") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cdf").toString,
      statsFor = Seq("id"))
    st.overwrite((1L to 50L).map(i => (i, s"v$i")).toDF("id", "v"), "silver", "t")
    st.append((51L to 70L).map(i => (i, s"v$i")).toDF("id", "v"), "silver", "t")
    val meta = st.countDF("silver", "t")
    assert(meta.inputFiles.isEmpty, "stats-complete COUNT must open zero data files")
    assert(meta.head.getLong(0) == 70L)
    // stats-less store: same answer via the scan path — never a guess
    val bare = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cdf0").toString)
    bare.overwrite((1L to 9L).map(i => (i, s"v$i")).toDF("id", "v"), "silver", "t")
    val scan = bare.countDF("silver", "t")
    assert(scan.inputFiles.nonEmpty, "fallback must be the real scan")
    assert(scan.head.getLong(0) == 9L)
  }

  test("appendEvolve merge-reads old+new files; time travel keeps the old schema") {
    val st = newStore("evo")
    st.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "silver", "t")
    // evolving batch: new column `score`, and it OMITS `v`
    st.appendEvolve(Seq((3L, 0.5)).toDF("id", "score"), "silver", "t")
    val out = st.read("silver", "t")
    assert(out.schema.fieldNames.toSeq == Seq("id", "v", "score"))
    val rows = out.orderBy("id").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), Option(r.get(2)))).toSeq
    assert(rows == Seq((1L, Some("a"), None), (2L, Some("b"), None),
      (3L, None, Some(0.5))), s"merge-read mismatch: $rows")
    // pre-evolution snapshot: original narrow schema, original rows
    val v1 = st.snapshots("silver", "t").head
    val old = st.readSnapshot("silver", "t", v1)
    assert(old.schema.fieldNames.toSeq == Seq("id", "v"))
    assert(old.count() == 2)
    // retype attempts fail loudly — evolution never silently casts
    intercept[IllegalArgumentException] {
      st.appendEvolve(Seq((4, "x")).toDF("id", "v"), "silver", "t") // id INT, was BIGINT
    }
    // and a second evolution stacks on the first
    st.appendEvolve(Seq((5L, "e", 9L)).toDF("id", "v", "rank"), "silver", "t")
    assert(st.read("silver", "t").schema.fieldNames.toSeq == Seq("id", "v", "score", "rank"))
    assert(st.read("silver", "t").count() == 4)
  }

  test("history records the operation, txn, and provenance of every snapshot") {
    val st = newStore("hist")
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    st.append(Seq((2L, "b")).toDF("id", "v"), "silver", "t")
    st.appendIfAbsent(Seq((3L, "c")).toDF("id", "v"), "silver", "t", txnId = "batch-7")
    st.compact("silver", "t", numFiles = 1)
    val restoredFrom = st.snapshots("silver", "t").head
    st.restore("silver", "t", restoredFrom)
    st.shallowClone("silver", "t", "dev", "t_clone")
    val h = st.history("silver", "t").collect()
      .map(r => (r.getLong(0), r.getString(1), Option(r.getString(3)), Option(r.getString(4))))
    assert(h.map(_._2).toSeq ==
      Seq("overwrite", "append", "append", "compact", "restore"))
    assert(h(2)._3.contains("batch-7"), "txn id surfaces in history")
    assert(h(4)._4.contains(s"restored_from=$restoredFrom"))
    val hc = st.history("dev", "t_clone").collect()
    assert(hc.length == 1 && hc.head.getString(1) == "clone"
      && hc.head.getString(4).startsWith("cloned_from=silver/t@m"))
  }

  test("appendIfAbsent: a replayed transaction commits nothing (exactly-once)") {
    val st = newStore("txn")
    val v1 = st.appendIfAbsent(Seq((1L, "a")).toDF("id", "v"), "silver", "t", "stream-0")
    val v2 = st.appendIfAbsent(Seq((2L, "b")).toDF("id", "v"), "silver", "t", "stream-1")
    // checkpoint-recovery replay of batch 1: same txn id → same snapshot,
    // no duplicate rows, no new commit
    val replay = st.appendIfAbsent(Seq((2L, "b")).toDF("id", "v"), "silver", "t", "stream-1")
    assert(replay == v2 && v2 == v1 + 1)
    assert(st.snapshots("silver", "t") == Seq(v1, v2))
    assert(st.read("silver", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
  }

  test("appendOnlySink streams micro-batches into snapshots exactly once") {
    import graft.streaming.StreamOps
    val st = newStore("sink")
    val in = java.nio.file.Files.createTempDirectory("graft_ss_sink_in").toString
    Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")).toDF("id", "v")
      .repartition(4).write.mode("overwrite").parquet(in)
    val ck = java.nio.file.Files.createTempDirectory("graft_ss_sink_ck").toString
    val stream = StreamOps.eventStream(spark, in, spark.read.parquet(in).schema,
      maxFilesPerTrigger = Some(2))
    StreamOps.appendOnlySink(stream, st, "bronze", "t", ck).awaitTermination()
    assert(st.snapshots("bronze", "t").size == 2) // 4 files / 2 per trigger
    assert(st.read("bronze", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))
    // re-running the drained stream (same checkpoint) appends nothing
    val stream2 = StreamOps.eventStream(spark, in, spark.read.parquet(in).schema)
    StreamOps.appendOnlySink(stream2, st, "bronze", "t", ck).awaitTermination()
    assert(st.snapshots("bronze", "t").size == 2)
    assert(st.read("bronze", "t").count() == 4)
  }

  test("upsertPartitionsSink: per-batch pruned merge, replay merges nothing") {
    import graft.streaming.StreamOps
    val st = newStore("upsink")
    // seeded table: two day-partitions
    st.overwrite(
      Seq((1L, "old", 1), (2L, "old", 1), (5L, "old", 2)).toDF("id", "v", "day"),
      "silver", "t", Seq("day"))
    // two micro-batches: batch A updates day 1, batch B inserts into day 2
    val in = java.nio.file.Files.createTempDirectory("graft_ss_upsink_in").toString
    Seq((1L, "new", 1)).toDF("id", "v", "day").write.mode("append").parquet(in)
    Seq((6L, "new", 2)).toDF("id", "v", "day").write.mode("append").parquet(in)
    val ck = java.nio.file.Files.createTempDirectory("graft_ss_upsink_ck").toString
    val stream = StreamOps.eventStream(spark, in, spark.read.parquet(in).schema,
      maxFilesPerTrigger = Some(1))
    StreamOps.upsertPartitionsSink(stream, st, "silver", "t",
      keys = Seq("id", "day"), partitionBy = Seq("day"), ck).awaitTermination()
    assert(st.read("silver", "t").orderBy("id").select("id", "v")
      .as[(Long, String)].collect().toSeq ==
      Seq((1L, "new"), (2L, "old"), (5L, "old"), (6L, "new")))
    val committed = st.snapshots("silver", "t")
    // drained-stream rerun (same checkpoint): txn tags make it a no-op
    val stream2 = StreamOps.eventStream(spark, in, spark.read.parquet(in).schema)
    StreamOps.upsertPartitionsSink(stream2, st, "silver", "t",
      keys = Seq("id", "day"), partitionBy = Seq("day"), ck).awaitTermination()
    assert(st.snapshots("silver", "t") == committed)
    // direct replay of a batch txn also merges nothing (the sink's txn
    // tag is namespaced by the query's checkpoint — mirror it here)
    val tag0 = "stream-" +
      Integer.toHexString(scala.util.hashing.MurmurHash3.stringHash(ck)) + "-0"
    val again = st.upsertPartitions(Seq((1L, "evil", 1)).toDF("id", "v", "day"),
      "silver", "t", Seq("id", "day"), Seq("day"), txnId = Some(tag0))
    assert(committed.contains(again))
    assert(st.read("silver", "t").filter(col("id") === 1L)
      .select("v").as[String].head() == "new")
  }

  test("readBetween prunes by manifest file stats and returns exact rows") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_stats").toString,
      statsFor = Seq("id"))
    val df = spark.range(1, 101).toDF("id").withColumn("v", col("id") * 2)
    // range-clustered commit: each file covers a disjoint id slice
    st.overwrite(df.repartitionByRange(5, col("id")), "silver", "t")
    val total = st.read("silver", "t").inputFiles.length
    assert(total >= 4)
    // [2, 30]: also the lexicographic trap — "2" <= "20" is FALSE as
    // strings, so a string-compare pruner would skip the file holding
    // ids 2..20 and silently lose rows; numeric stats must compare
    // numerically
    val r = st.readBetween("silver", "t", "id", "2", "30")
    assert(r.inputFiles.length < total,
      s"no pruning: ${r.inputFiles.length} of $total files scanned")
    assert(r.select("id").as[Long].collect().sorted.toSeq == (2L to 30L))
    // stats survive append commits; unknown column is refused
    st.append(spark.range(200, 202).toDF("id").withColumn("v", col("id") * 2),
      "silver", "t")
    assert(st.readBetween("silver", "t", "id", "200", "300").count() == 2)
    intercept[IllegalArgumentException] {
      st.readBetween("silver", "t", "nope", "0", "1")
    }
  }

  test("compact collapses files, keeps rows, and prior snapshots still time-travel") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_cmp").toString,
      statsFor = Seq("id"))
    val v1 = st.overwrite(spark.range(1, 51).toDF("id").repartition(8), "silver", "t")
    assert(st.read("silver", "t").inputFiles.length >= 4)
    val v2 = st.compact("silver", "t", numFiles = 1, sortCols = Seq("id"))
    assert(st.read("silver", "t").inputFiles.length == 1)
    assert(st.read("silver", "t").count() == 50)
    // compaction is just another snapshot: v1 still reads its own files
    assert(st.readSnapshot("silver", "t", v1).count() == 50)
    // stats were re-collected for the compacted file
    assert(st.readBetween("silver", "t", "id", "10", "20").count() == 11)
    assert(v2 == v1 + 1)
  }

  test("readWhere prunes on a conjunction of ranges over z-ordered files") {
    import graft.ops.Layout
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_zw").toString,
      statsFor = Seq("x", "y"))
    // 32x32 grid, z-order-clustered into 16 files: each file covers a
    // compact (x, y) tile, so BOTH dimensions' stats are tight
    val grid = spark.range(0, 1024).toDF("i")
      .withColumn("x", col("i") % 32).withColumn("y", expr("i div 32"))
    st.overwrite(Layout.zorder2(grid, "x", "y", bits = 5, numPartitions = 16),
      "silver", "grid")
    val total = st.read("silver", "grid").inputFiles.length
    val r = st.readWhere("silver", "grid",
      Map("x" -> ("3", "6"), "y" -> ("3", "6")))
    assert(r.inputFiles.length < total,
      s"z-order + stats pruned nothing: ${r.inputFiles.length} of $total")
    assert(r.count() == 16) // the 4x4 tile
  }

  test("restore rolls back to an old snapshot with zero data movement") {
    val st = newStore("rst")
    val v1 = st.overwrite(Seq((1L, "good"), (2L, "good")).toDF("id", "v"), "silver", "t")
    val filesV1 = st.readSnapshot("silver", "t", v1).inputFiles.toSet
    val v2 = st.overwrite(Seq((9L, "bad")).toDF("id", "v"), "silver", "t")
    val v3 = st.restore("silver", "t", v1)
    assert(v3 == v2 + 1)
    // current content is v1's, served by v1's PHYSICAL files — the
    // restore was a manifest write, not a data write
    assert(st.read("silver", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "good"), (2L, "good")))
    assert(st.read("silver", "t").inputFiles.toSet == filesV1)
    // history preserved: the bad commit still time-travels
    assert(st.readSnapshot("silver", "t", v2).as[(Long, String)].collect().toSeq ==
      Seq((9L, "bad")))
    intercept[IllegalArgumentException] { st.restore("silver", "t", 99L) }
  }

  test("shallowClone references source files; clone writes stay in clone pool") {
    val st = newStore("cln")
    st.overwrite(
      Seq((1L, "a", 2024), (2L, "b", 2025)).toDF("id", "v", "year"),
      "gold", "t", Seq("year"))
    val srcFiles = st.read("gold", "t").inputFiles.toSet
    st.shallowClone("gold", "t", "sandbox", "t")
    // the clone reads the SOURCE table's physical files — nothing copied
    val clone0 = st.read("sandbox", "t")
    assert(clone0.inputFiles.toSet == srcFiles)
    assert(clone0.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // mutating the clone (partition-pruned merge) leaves the source
    // untouched; untouched partitions still serve from the source pool
    st.upsertPartitions(Seq((2L, "B2", 2025), (3L, "c", 2025)).toDF("id", "v", "year"),
      "sandbox", "t", keys = Seq("id", "year"), partitionBy = Seq("year"))
    val clone1 = st.read("sandbox", "t")
    assert(clone1.orderBy("id").select("id", "v").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "B2"), (3L, "c")))
    assert(st.read("gold", "t").orderBy("id").select("id", "v")
      .as[(Long, String)].collect().toSeq == Seq((1L, "a"), (2L, "b")))
    val cloneFiles = clone1.inputFiles.toSet
    assert(cloneFiles.intersect(srcFiles).forall(_.contains("year=2024")),
      "untouched partition must still be a source-pool reference")
    assert(cloneFiles.exists(f => !srcFiles.contains(f)), "merged partition must be clone-pool")
    // CDC across the clone's own history prunes to the changed files
    val ch = st.changesBetween("sandbox", "t", Seq("id", "year"), 1L, 2L)
      .select("_change_type", "id").as[(String, Long)].collect().toSeq.sorted
    assert(ch == Seq(("insert", 3L), ("update_postimage", 2L), ("update_preimage", 2L)))
    // compacting the clone severs the source dependency entirely
    st.compact("sandbox", "t", numFiles = 1)
    assert(st.read("sandbox", "t").inputFiles.toSet.intersect(srcFiles).isEmpty)
    assert(st.read("sandbox", "t").count() == 3)
    // cloning onto an existing table is refused
    intercept[IllegalArgumentException] { st.shallowClone("gold", "t", "sandbox", "t") }
  }

  test("reading a missing table or unretained snapshot fails loudly") {
    val st = newStore("err")
    intercept[IllegalArgumentException] { st.read("silver", "nope") }
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    intercept[IllegalArgumentException] { st.readSnapshot("silver", "t", 99L) }
    intercept[IllegalArgumentException] {
      st.changesBetween("silver", "t", Seq("id"), 2L, 1L)
    }
  }

  test("compactSmall rewrites only sub-threshold files; refuses under pending deletes") {
    val st = newStore("cs")
    st.overwrite(spark.range(5000).toDF("id").repartition(1), "s", "t")
    val big = st.read("s", "t").inputFiles.toSet
    st.append(spark.range(5000, 5010).toDF("id").repartition(1), "s", "t")
    st.append(spark.range(5010, 5020).toDF("id").repartition(1), "s", "t")
    def sz(f: String) = new java.io.File(new java.net.URI(f).getPath).length
    val appends = st.read("s", "t").inputFiles.toSet -- big
    val thr = (appends.map(sz).max + big.map(sz).min) / 2
    val v = st.compactSmall("s", "t", thr, numFiles = 1)
    val post = st.read("s", "t")
    assert(big.subsetOf(post.inputFiles.toSet), "big file must ride by reference")
    assert(post.inputFiles.toSet.size == big.size + 1)
    assert(post.count() == 5020)
    // idempotent: one small file left → no-op, same snapshot id
    assert(st.compactSmall("s", "t", thr, numFiles = 1) == v)
    // pending equality deletes block the partial rewrite
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    intercept[IllegalArgumentException] { st.compactSmall("s", "t", thr) }
  }

  test("compactSmallEras folds each layout era under its own spec; guards match compactSmall") {
    import spark.implicits._
    val st = newStore("cse")
    def rows(a: Long, b: Long) = spark.range(a, b)
      .select(col("id"), (col("id") % 3).cast("string").as("k"))
    // flat era: two small appends
    st.overwrite(rows(0, 10).repartition(1), "s", "t")
    st.append(rows(10, 20).repartition(1), "s", "t")
    // evolved era: two small appends under k-partitioning
    st.append(rows(20, 30).repartition(1), "s", "t", partitionBy = Seq("k"))
    st.append(rows(30, 40).repartition(1), "s", "t", partitionBy = Seq("k"))
    val v = st.compactSmallEras("s", "t", thresholdBytes = Long.MaxValue / 2)
    val post = st.read("s", "t")
    val (flagged, flat) = post.inputFiles.toSet.partition(_.contains("k="))
    assert(flat.size == 1, s"flat era must fold to ONE file, got ${flat.size}")
    assert(flagged.size == 3, s"evolved era must fold to one file per k dir, got ${flagged.size}")
    assert(post.count() == 40)
    assert(post.select(sum("id")).head.getLong(0) == (0L until 40L).sum)
    // one small file per era left → no-op, same snapshot id
    assert(st.compactSmallEras("s", "t", Long.MaxValue / 2) == v)
    // pending equality deletes block the partial rewrite
    st.append(rows(40, 50).repartition(1), "s", "t")
    st.append(rows(50, 60).repartition(1), "s", "t")
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    intercept[IllegalArgumentException] {
      st.compactSmallEras("s", "t", Long.MaxValue / 2)
    }
  }

  test("compactSmallEras folds MANY debris dirs with one job per era") {
    import spark.implicits._
    // 40 debris-bearing dirs in one era: the rewrite must be ONE
    // read + ONE repartition-by-spec write that fans out per dir
    // (not 40 driver-side loops), and each dir must still fold to
    // exactly one file with content preserved
    val st = newStore("csem")
    def rows(a: Long, b: Long) = spark.range(a, b)
      .select(col("id"), (col("id") % 40).cast("string").as("k"))
    st.overwrite(rows(0, 400).repartition(1), "s", "t", partitionBy = Seq("k"))
    st.append(rows(400, 800).repartition(1), "s", "t", partitionBy = Seq("k"))
    val v = st.compactSmallEras("s", "t", thresholdBytes = Long.MaxValue / 2)
    val post = st.read("s", "t")
    val perDir = post.inputFiles.toSeq
      .groupBy(f => f.split('/').reverse.dropWhile(!_.contains("=")).head)
    assert(perDir.size == 40, s"expected 40 k= dirs, got ${perDir.size}")
    perDir.foreach { case (d, fs) =>
      assert(fs.size == 1, s"dir $d must fold to ONE file, got ${fs.size}")
    }
    assert(post.count() == 800)
    assert(post.select(sum("id")).head.getLong(0) == (0L until 800L).sum)
    // steady state (one file per dir) is a no-op
    assert(st.compactSmallEras("s", "t", Long.MaxValue / 2) == v)
    // numFilesPerEra > 1: the content-hash salt splits WITHIN dirs —
    // at most the target count per dir, content still exact
    val st2 = newStore("csem2")
    st2.overwrite(rows(0, 400).repartition(1), "s", "t", partitionBy = Seq("k"))
    st2.append(rows(400, 800).repartition(1), "s", "t", partitionBy = Seq("k"))
    st2.compactSmallEras("s", "t", Long.MaxValue / 2, numFilesPerEra = 2)
    val post2 = st2.read("s", "t")
    post2.inputFiles.toSeq
      .groupBy(f => f.split('/').reverse.dropWhile(!_.contains("=")).head)
      .foreach { case (d, fs) =>
        assert(fs.size <= 2, s"dir $d exceeded the 2-file target: ${fs.size}")
      }
    assert(post2.count() == 800)
    assert(post2.select(sum("id")).head.getLong(0) == (0L until 800L).sum)
  }

  test("an aborted compaction deletes its staged pool files (no orphans)") {
    import spark.implicits._
    val st = newStore("csab")
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "s", "t")
    // stage a file the way a rewrite would, then abort the commit —
    // the staged file must be deleted, not left for vacuum to chase
    val staged = new java.io.File(st.dataDir("s", "t"), "part-test-staged.parquet")
    java.nio.file.Files.write(staged.toPath, Array[Byte](1, 2, 3))
    assert(staged.exists)
    val boom = intercept[RuntimeException] {
      st.discardOnAbort("s", "t", Seq("part-test-staged.parquet")) {
        throw new RuntimeException("boom")
      }
    }
    assert(boom.getMessage == "boom", "the original failure must propagate")
    assert(!staged.exists, "the aborted attempt's pool file must be deleted")
    // the committed table is untouched
    assert(st.read("s", "t").count() == 1)
  }

  test("mergeBranch fast-forwards; a diverged source aborts the merge") {
    val st = newStore("br")
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "prod", "t")
    st.shallowClone("prod", "t", "exp", "t")
    st.append(Seq((2L, "b")).toDF("id", "v"), "exp", "t")
    st.mergeBranch("exp", "t")
    assert(st.read("prod", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (2L, "b")))
    // second branch; source then advances → merge must abort
    st.shallowClone("prod", "t", "exp2", "t")
    st.append(Seq((3L, "c")).toDF("id", "v"), "exp2", "t")
    st.append(Seq((9L, "z")).toDF("id", "v"), "prod", "t")
    intercept[IllegalArgumentException] { st.mergeBranch("exp2", "t") }
    // the source's racing commit survives untouched
    assert(st.read("prod", "t").orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L, 9L))
    // a non-branch table refuses
    intercept[IllegalArgumentException] { st.mergeBranch("prod", "t") }
  }

  test("equality delete is zero-copy, snapshot-isolated, and compact materializes it") {
    val st = newStore("del")
    val v1 = st.overwrite(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "b", 40.0))
        .toDF("id", "seg", "v"), "silver", "t")
    val preFiles = st.read("silver", "t").inputFiles.toSet
    val vDel = st.deleteWhere("silver", "t", Seq("id"), col("seg") === "a")
    val post = st.read("silver", "t")
    // merge-on-read: rows gone, but every pre-delete DATA file still serves
    assert(post.orderBy("id").select("id").as[Long].collect().toSeq == Seq(2L, 4L))
    assert(preFiles.subsetOf(post.inputFiles.toSet),
      "delete must not rewrite or drop data files")
    // snapshot isolation: the pre-delete snapshot still sees all rows
    assert(st.readSnapshot("silver", "t", v1).count() == 4)
    // vacuum must NOT reclaim the delete key file the live snapshot needs
    assert(st.vacuum("silver", "t") == 0)
    assert(st.read("silver", "t").count() == 2)
    // compact applies the delete physically and clears the entries
    st.compact("silver", "t", numFiles = 1)
    val compacted = st.read("silver", "t")
    assert(compacted.orderBy("id").select("id").as[Long].collect().toSeq == Seq(2L, 4L))
    assert(compacted.inputFiles.toSet.intersect(preFiles).isEmpty,
      "compact must rewrite into fresh files")
    assert(vDel > v1)
  }

  test("deletes accumulate across commits and compose with appends") {
    val st = newStore("del2")
    st.overwrite(Seq((1L, 1.0), (2L, 2.0)).toDF("id", "v"), "s", "t")
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    st.append(Seq((3L, 3.0), (4L, 4.0)).toDF("id", "v"), "s", "t")
    st.deleteKeys(Seq(Tuple1(3L)).toDF("id"), "s", "t", Seq("id"))
    assert(st.read("s", "t").orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(2L, 4L))
    // a fresh overwrite resets pending deletes: new content, key 1 reusable
    st.overwrite(Seq((1L, 9.0)).toDF("id", "v"), "s", "t")
    assert(st.read("s", "t").select("id").as[Long].collect().toSeq == Seq(1L))
  }

  test("pending deletes: metadata COUNT falls back; partial overwrite refuses until compact") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_del3").toString,
      statsFor = Seq("id"))
    st.overwrite(Seq((1L, 2024), (2L, 2024), (3L, 2025)).toDF("id", "year"),
      "g", "t", Seq("year"))
    assert(st.countRows("g", "t").contains(3L))
    st.deleteKeys(Seq(Tuple1(2L)).toDF("id"), "g", "t", Seq("id"))
    assert(st.countRows("g", "t").isEmpty,
      "metadata count would overcount past a pending delete")
    assert(st.countDF("g", "t").head().getLong(0) == 2L) // scan fallback is exact
    intercept[IllegalArgumentException] {
      st.overwritePartitions(Seq((5L, 2025)).toDF("id", "year"), "g", "t", Seq("year"))
    }
    st.compact("g", "t", numFiles = 1, partitionBy = Seq("year"))
    assert(st.countRows("g", "t").contains(2L)) // materialized: metadata path back
    st.overwritePartitions(Seq((5L, 2025)).toDF("id", "year"), "g", "t", Seq("year"))
    assert(st.read("g", "t").orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 5L))
  }

  test("equality deletes are sequence-scoped: delete-then-reinsert shows the new row") {
    val st = newStore("delseq")
    st.overwrite(Seq((1L, "old"), (2L, "keep")).toDF("id", "v"), "s", "t")
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    // REINSERT of a deleted key: the append carries a higher sequence
    // than the delete, so the new row must be visible (Iceberg
    // equality-delete scoping / SQL DELETE-then-INSERT), not silently
    // swallowed by the older delete entry
    st.append(Seq((1L, "new")).toDF("id", "v"), "s", "t")
    assert(st.read("s", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "new"), (2L, "keep")))
    // a LATER delete of the same key removes the reinserted row too
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    assert(st.read("s", "t").as[(Long, String)].collect().toSeq == Seq((2L, "keep")))
    // and a second reinsert after that is again visible; compact then
    // materializes the merged state and clears the pending entries
    st.append(Seq((1L, "newer")).toDF("id", "v"), "s", "t")
    st.compact("s", "t", numFiles = 1)
    assert(st.read("s", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "newer"), (2L, "keep")))
    // compact cleared the pending entries: compactSmall no longer
    // refuses on pending deletes (no-op here — just one file)
    st.compactSmall("s", "t", 1L)
  }

  test("sequence scoping survives restore, clone, and branch merge") {
    val st = newStore("delseq2")
    st.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "s", "t")
    st.deleteKeys(Seq(Tuple1(1L)).toDF("id"), "s", "t", Seq("id"))
    val vDel = st.snapshots("s", "t").last
    st.append(Seq((1L, "re")).toDF("id", "v"), "s", "t")
    // restore to the post-delete snapshot: key 1 hidden again
    st.restore("s", "t", vDel)
    assert(st.read("s", "t").select("id").as[Long].collect().toSeq == Seq(2L))
    // append onto the restored head: the reinsert is visible again
    st.append(Seq((1L, "re2")).toDF("id", "v"), "s", "t")
    assert(st.read("s", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "re2"), (2L, "b")))
    // clone carries pending deletes AND their scoping; a branch append
    // of a deleted key is visible on the branch and after the merge
    val st2 = newStore("delseq3")
    st2.overwrite(Seq((1L, "x"), (2L, "y")).toDF("id", "v"), "prod", "t")
    st2.deleteKeys(Seq(Tuple1(2L)).toDF("id"), "prod", "t", Seq("id"))
    st2.shallowClone("prod", "t", "exp", "t")
    assert(st2.read("exp", "t").select("id").as[Long].collect().toSeq == Seq(1L))
    st2.append(Seq((2L, "back")).toDF("id", "v"), "exp", "t")
    assert(st2.read("exp", "t").orderBy("id").select("id").as[Long].collect().toSeq ==
      Seq(1L, 2L))
    st2.mergeBranch("exp", "t")
    assert(st2.read("prod", "t").orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "x"), (2L, "back")))
  }

  test("deleteKeys casts caller key types to the table schema's types") {
    val st = newStore("delcast")
    st.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "s", "t")
    // caller passes INT keys against a BIGINT column — the delete file
    // must persist with the table's type, so the read-side anti-join
    // resolves instead of failing at a distance
    st.deleteKeys(Seq(Tuple1(1)).toDF("id"), "s", "t", Seq("id"))
    assert(st.read("s", "t").select("id").as[Long].collect().toSeq == Seq(2L))
  }

  test("bloom point lookup opens only the file holding the key") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_bloom").toString,
      statsFor = Seq("id"), bloomFor = Seq("id"))
    // three single-file appends with fully OVERLAPPING [min, max] id
    // ranges but disjoint key sets — range stats cannot prune here
    st.overwrite(Seq((1L, "a"), (100L, "b")).toDF("id", "v").coalesce(1), "s", "t")
    st.append(Seq((2L, "c"), (99L, "d")).toDF("id", "v").coalesce(1), "s", "t")
    st.append(Seq((3L, "e"), (98L, "f")).toDF("id", "v").coalesce(1), "s", "t")
    assert(st.read("s", "t").inputFiles.length == 3)
    val hit = st.readPoint("s", "t", "id", Seq("99"))
    assert(hit.inputFiles.length == 1, "bloom should prune to the one holding file")
    assert(hit.as[(Long, String)].collect().toSeq == Seq((99L, "d")))
    // text probes normalize through the column type: "099" == 99
    assert(st.readPoint("s", "t", "id", Seq("099")).as[(Long, String)]
      .collect().toSeq == Seq((99L, "d")))
    // a missing key reads zero or fp-few files and returns nothing
    assert(st.readPoint("s", "t", "id", Seq("12345")).count() == 0)
    // multi-probe: union of per-value candidates
    val multi = st.readPoint("s", "t", "id", Seq("1", "3"))
    assert(multi.inputFiles.length == 2)
    assert(multi.orderBy("id").as[(Long, String)].collect().toSeq ==
      Seq((1L, "a"), (3L, "e")))
  }

  test("TIMESTAMP AS OF resolves commits by wall-clock, refuses pre-history") {
    val st = newStore("asof")
    val v1 = st.overwrite(Seq((1L, "a")).toDF("id", "v"), "s", "t")
    Thread.sleep(50) // mtime granularity guard
    val mid = System.currentTimeMillis
    Thread.sleep(50)
    val v2 = st.append(Seq((2L, "b")).toDF("id", "v"), "s", "t")
    assert(st.snapshotAsOf("s", "t", mid) == v1)
    assert(st.snapshotAsOf("s", "t", System.currentTimeMillis) == v2)
    assert(st.readAsOf("s", "t", mid).select("id").as[Long].collect().toSeq == Seq(1L))
    // a timestamp before every retained commit fails loudly (Delta's
    // timestamp-before-earliest contract) — never newer data than asked
    intercept[IllegalArgumentException] { st.snapshotAsOf("s", "t", 0L) }
  }

  test("partition evolution: old-layout files stay readable, scoped ops fence") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_pevo").toString,
      statsFor = Seq("y"))
    // era 1: flat files (y is a data column)
    st.overwrite(Seq((1996, 1L, "a"), (1997, 2L, "b")).toDF("y", "id", "v")
      .coalesce(1), "s", "t")
    // era 2: the table evolves to hive-partitioning by y — WITHOUT
    // rewriting era-1 files (Iceberg partition evolution)
    st.append(Seq((1997, 3L, "c"), (1998, 4L, "d")).toDF("y", "id", "v"),
      "s", "t", partitionBy = Seq("y"))
    // both layouts read as one table
    assert(st.read("s", "t").orderBy("id").as[(Int, Long, String)].collect().toSeq ==
      Seq((1996, 1L, "a"), (1997, 2L, "b"), (1997, 3L, "c"), (1998, 4L, "d")))
    // stats prune across BOTH layouts (y min/max recorded either way)
    val pruned = st.readBetween("s", "t", "y", "1998", "1998")
    assert(pruned.inputFiles.length < st.read("s", "t").inputFiles.length)
    assert(pruned.as[(Int, Long, String)].collect().toSeq == Seq((1998, 4L, "d")))
    // partition-SCOPED mutation on a mixed-layout table fences loudly:
    // it could not see the 1997 row living in the flat era-1 file
    intercept[IllegalArgumentException] {
      st.overwritePartitions(Seq((1997, 9L, "x")).toDF("y", "id", "v"), "s", "t", Seq("y"))
    }
    // compact under the current spec restores layout uniformity...
    st.compact("s", "t", numFiles = 2, partitionBy = Seq("y"))
    // ...and the scoped overwrite now replaces ALL of 1997 (both eras')
    st.overwritePartitions(Seq((1997, 9L, "x")).toDF("y", "id", "v"), "s", "t", Seq("y"))
    assert(st.read("s", "t").orderBy("id").as[(Int, Long, String)].collect().toSeq ==
      Seq((1996, 1L, "a"), (1998, 4L, "d"), (1997, 9L, "x")))
  }

  test("partitionsDF lists mixed-layout eras and refuses incomplete stats") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_pmeta").toString,
      statsFor = Seq("y"))
    st.overwrite(Seq((1996, 1L), (1996, 2L)).toDF("y", "id").coalesce(1), "s", "t")
    st.append(Seq((1997, 3L)).toDF("y", "id"), "s", "t", partitionBy = Seq("y"))
    val parts = st.partitionsDF("s", "t").orderBy("partition")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // the flat era lists as partition "" next to the hive era
    assert(parts == Seq(("", 1L, 2L), ("y=1997", 1L, 1L)))
    assert(st.partitionsDF("s", "t").inputFiles.isEmpty)
    // a store that never collected row counts fails loudly, not wrong
    val bare = newStore("pmeta_bare")
    bare.overwrite(Seq((1, 1L)).toDF("y", "id"), "s", "t")
    intercept[IllegalStateException] { bare.partitionsDF("s", "t") }
    // pending equality deletes: metadata counts would lie — refuse
    st.deleteKeys(Seq(Tuple1(2L)).toDF("id"), "s", "t", Seq("id"))
    intercept[IllegalArgumentException] { st.partitionsDF("s", "t") }
  }

  test("bloom lookup stays correct without an index and under deletes") {
    // files committed WITHOUT a bloom are conservatively read
    val plain = newStore("bloom_none")
    plain.overwrite(Seq((1L, "a")).toDF("id", "v").coalesce(1), "s", "t")
    plain.append(Seq((2L, "b")).toDF("id", "v").coalesce(1), "s", "t")
    val all = plain.readPoint("s", "t", "id", Seq("2"))
    assert(all.inputFiles.length == 2) // no bloom recorded: must read both
    assert(all.as[(Long, String)].collect().toSeq == Seq((2L, "b")))
    // equality deletes still apply through the pruned read
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_ss_bloom_del").toString,
      statsFor = Seq("id"), bloomFor = Seq("id"))
    st.overwrite(Seq((1L, "a"), (2L, "b")).toDF("id", "v").coalesce(1), "s", "t")
    st.deleteKeys(Seq(Tuple1(2L)).toDF("id"), "s", "t", Seq("id"))
    assert(st.readPoint("s", "t", "id", Seq("2")).count() == 0)
    assert(st.readPoint("s", "t", "id", Seq("1")).as[(Long, String)]
      .collect().toSeq == Seq((1L, "a")))
  }

  test("replaceWhere: one commit, replacement rows survive their own predicate") {
    val st = newStore("rw")
    st.overwrite(Seq((1L, "keep", 10L), (2L, "swap", 20L), (3L, "swap", 30L))
      .toDF("id", "tag", "v"), "s", "t")
    val n0 = st.snapshots("s", "t").size
    // replacement rows MATCH the predicate — position deletes address
    // the old files only, so they must survive
    st.replaceWhere(Seq((2L, "swap", 200L), (3L, "swap", 300L)).toDF("id", "tag", "v"),
      "s", "t", col("tag") === "swap")
    assert(st.snapshots("s", "t").size == n0 + 1, "must be exactly one commit")
    assert(st.read("s", "t").as[(Long, String, Long)].collect().sortBy(_._1).toSeq
      == Seq((1L, "keep", 10L), (2L, "swap", 200L), (3L, "swap", 300L)))
    // time travel still serves the pre-swap content
    assert(st.readSnapshot("s", "t", n0).count() == 3)
    assert(st.readSnapshot("s", "t", n0).filter(col("v") === 20L).count() == 1)
  }

  test("replaceWhere with a txnId is idempotent (foreachBatch replay)") {
    val st = newStore("rwtxn")
    st.overwrite(Seq((1L, 10L), (2L, 20L)).toDF("id", "v"), "s", "t")
    st.replaceWhere(Seq((2L, 99L)).toDF("id", "v"), "s", "t",
      col("id") === 2L, txnId = Some("batch-7"))
    val afterFirst = st.snapshots("s", "t")
    st.replaceWhere(Seq((2L, 99L)).toDF("id", "v"), "s", "t",
      col("id") === 2L, txnId = Some("batch-7"))
    assert(st.snapshots("s", "t") == afterFirst, "replayed txn must not commit")
    assert(st.read("s", "t").as[(Long, Long)].collect().sortBy(_._1).toSeq
      == Seq((1L, 10L), (2L, 99L)))
  }
}
