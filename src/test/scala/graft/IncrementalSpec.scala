package graft

import graft.engine.{Incremental, Merge, Warehouse}
import org.apache.spark.sql.functions._

/** Watermark semantics + the model registry's incremental upsert loop
  * (F1/F3/F4, A1, dbt-style DAG), including rerun idempotence. */
class IncrementalSpec extends SparkSpec {

  test("maxWatermark returns None on empty, Some(max) otherwise") {
    import spark.implicits._
    val df = Seq("2025-01-01", "2025-03-01").toDF("d").withColumn("d", col("d").cast("date"))
    assert(Incremental.maxWatermark(df.filter(lit(false)), "d").isEmpty)
    assert(Incremental.maxWatermark(df, "d").map(_.toString).contains("2025-03-01"))
  }

  test("newerThan is strict >, atOrAfter reprocesses the boundary") {
    import spark.implicits._
    val df = Seq(1, 2, 3).toDF("x")
    val wm = Some(2: Any)
    assert(Incremental.newerThan(df, "x", wm).collect().map(_.getInt(0)).toSeq == Seq(3))
    assert(Incremental.atOrAfter(df, col("x"), wm).orderBy("x")
      .collect().map(_.getInt(0)).toSeq == Seq(2, 3))
    // no watermark → full refresh
    assert(Incremental.newerThan(df, "x", None).count() == 3)
  }

  test("registry topo-orders deps and rejects cycles") {
    def m(name: String, deps: Seq[String]) = Incremental.Model(
      name, "silver", deps, Seq("k"), "w", (in, _) => in.values.head)
    val r = new Incremental.Registry(Seq(m("gold", Seq("silver")), m("silver", Seq())))
    assert(r.topoOrder.map(_.name) == Seq("silver", "gold"))
    val cyc = new Incremental.Registry(Seq(m("a", Seq("b")), m("b", Seq("a"))))
    assertThrows[IllegalArgumentException](cyc.topoOrder)
  }

  test("incremental rerun is a no-op and new data upserts by key") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_inc_test").toString
    val wh = new Warehouse(spark, root)

    def model = Incremental.Model(
      "t", "silver", Seq(), Seq("k"), "d",
      (in, wm) => {
        val src = in("src")
        wm.map(w => src.filter(col("d") >= lit(w))).getOrElse(src)
      })

    val v1 = Seq(("a", "2025-01-01", 1.0), ("b", "2025-01-02", 2.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val reg = new Incremental.Registry(Seq(model))
    reg.runAll(wh, Map("src" -> v1))
    val after1 = wh.read("silver", "t").orderBy("k").collect().toSeq
    reg.runAll(wh, Map("src" -> v1)) // identical rerun → identical table
    assert(wh.read("silver", "t").orderBy("k").collect().toSeq == after1)

    // boundary-day restatement (same key, new value) + a fresh row
    val v2 = v1.unionByName(
      Seq(("b", "2025-01-02", 99.0), ("c", "2025-01-03", 3.0)).toDF("k", "d", "v")
        .withColumn("d", col("d").cast("date")))
      .groupBy("k", "d").agg(max("v").as("v")).select("k", "d", "v")
    reg.runAll(wh, Map("src" -> v2))
    val out = wh.read("silver", "t").orderBy("k")
      .collect().map(r => (r.getString(0), r.getDouble(2))).toSeq
    assert(out == Seq(("a", 1.0), ("b", 99.0), ("c", 3.0)))
  }

  test("full refresh rebuilds from scratch, discarding stale rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_fr").toString
    val wh = new Warehouse(spark, root)
    val model = Incremental.Model("t", "silver", Seq(), Seq("k"), "d",
      (in, wm) => wm.map(w => in("src").filter(col("d") >= lit(w))).getOrElse(in("src")))
    def src(rows: Seq[(String, String, Double)]) =
      rows.toDF("k", "d", "v").withColumn("d", col("d").cast("date"))
    val reg = new Incremental.Registry(Seq(model))
    reg.runAll(wh, Map("src" -> src(Seq(("a", "2025-01-01", 1.0), ("b", "2025-01-02", 2.0)))))
    // source shrank (row b deleted upstream): incremental run keeps b...
    val shrunk = src(Seq(("a", "2025-01-01", 1.0)))
    reg.runAll(wh, Map("src" -> shrunk))
    assert(wh.read("silver", "t").count() == 2)
    // ...full refresh drops it
    reg.runAll(wh, Map("src" -> shrunk), fullRefresh = true)
    assert(wh.read("silver", "t").count() == 1)
  }

  test("compact rewrites many small files into few, preserving rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact").toString
    val wh = new Warehouse(spark, root)
    (1 to 5).foreach { i =>   // five tiny appends → ≥5 files
      wh.append(Seq((i.toLong, s"row$i")).toDF("id", "v"), "bronze", "t")
    }
    assert(wh.dataFiles("bronze", "t").size >= 5)
    val before = wh.read("bronze", "t").orderBy("id").collect().toSeq
    wh.compact("bronze", "t", numFiles = 1, sortCols = Seq("id"))
    assert(wh.dataFiles("bronze", "t").size == 1)
    assert(wh.read("bronze", "t").orderBy("id").collect().toSeq == before)
  }

  test("compact preserves hive partition layout when told about it") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_compact_p").toString
    val wh = new Warehouse(spark, root)
    val df = Seq((1L, 2024, "a"), (2L, 2024, "b"), (3L, 2025, "c")).toDF("id", "year", "v")
    (1 to 3).foreach(_ => wh.append(df, "bronze", "t", partitionBy = Seq("year")))
    assert(wh.dataFiles("bronze", "t").size >= 6) // recursive listing sees partition files
    wh.compact("bronze", "t", numFiles = 1, partitionBy = Seq("year"))
    val out = wh.read("bronze", "t")
    assert(out.count() == 9)
    assert(out.schema.fieldNames.contains("year")) // partition column survives
    val dirs = new java.io.File(s"$root/bronze/t").listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.toSet == Set("year=2024", "year=2025")) // layout preserved
  }

  test("evolving insert-only merge widens schema, old rows read NULL") {
    import spark.implicits._
    val existing = Seq(("IBM", "2025-11-14", 1.0)).toDF("t", "d", "v")
    val incoming = Seq(("IBM", "2025-11-14", 9.0, "dup"), ("NVDA", "2025-11-17", 2.0, "new"))
      .toDF("t", "d", "v", "src")
    val out = Merge.insertOnlyMergeEvolving(existing, incoming, Seq("t", "d"))
      .orderBy("t").collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "IBM" && out(0).getDouble(2) == 1.0
      && out(0).isNullAt(out(0).fieldIndex("src")))       // old row, new col → NULL
    assert(out(1).getString(0) == "NVDA" && out(1).getString(3) == "new")
  }

  test("warehouse atomicOverwrite replaces content and survives self-read plans") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_test").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(Seq(1, 2).toDF("x"), "bronze", "t")
    assert(wh.tableExists("bronze", "t"))
    // plan reads the same path it overwrites — the tmp-swap makes it safe
    val doubled = wh.read("bronze", "t").withColumn("x", col("x") * 2)
    wh.atomicOverwrite(doubled, "bronze", "t")
    assert(wh.read("bronze", "t").orderBy("x").collect().map(_.getInt(0)).toSeq == Seq(2, 4))
  }

  test("warehouse time travel: readVersion walks generations, retention prunes") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_tt").toString
    val wh = new Warehouse(spark, root, keepVersions = 2)
    def write(v: Int): Unit = wh.atomicOverwrite(Seq(v).toDF("x"), "gold", "t")
    def readBack(back: Int): Int =
      wh.readVersion("gold", "t", back).collect().head.getInt(0)

    write(1)                              // gen 1 (current), no archive yet
    assert(wh.versions("gold", "t").isEmpty)
    write(2)                              // archives 1
    write(3)                              // archives 2
    assert(wh.versions("gold", "t") == Seq(1L, 2L))
    assert(readBack(0) == 3 && readBack(1) == 2 && readBack(2) == 1)

    write(4)                              // archives 3; retention drops gen 1
    assert(wh.versions("gold", "t") == Seq(2L, 3L))
    assert(readBack(0) == 4 && readBack(1) == 3 && readBack(2) == 2)
    val e = intercept[IllegalArgumentException] { readBack(3) }
    assert(e.getMessage.contains("retained"))

    // drop removes history too: a re-created table starts fresh
    wh.dropTable("gold", "t")
    assert(wh.versions("gold", "t").isEmpty)
    write(9)
    assert(wh.versions("gold", "t").isEmpty && readBack(0) == 9)
  }

  test("deleteWhere removes matching rows, keeps NULL-predicate rows, archives undo") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_del").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((1L, Some(10)), (2L, Some(99)), (3L, None)).toDF("id", "v"),
      "silver", "t")
    wh.deleteWhere("silver", "t", col("v") > 50)
    // row 2 deleted; row 3's predicate is NULL → kept (SQL DELETE semantics)
    assert(wh.read("silver", "t").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
    // the pre-delete generation is the undo
    assert(wh.readVersion("silver", "t", 1).count() == 3)
  }

  test("appendEvolve widens schema; readEvolved surfaces NULLs; type clash rejected") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_evo").toString
    val wh = new Warehouse(spark, root)
    wh.appendEvolve(Seq((1L, "a")).toDF("id", "v"), "bronze", "t")
    wh.appendEvolve(Seq((2L, "b", 7.5)).toDF("id", "v", "score"), "bronze", "t")
    val out = wh.readEvolved("bronze", "t").orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).isNullAt(out(0).fieldIndex("score"))) // v1 row, evolved col
    assert(out(1).getDouble(out(1).fieldIndex("score")) == 7.5)
    // a TYPE change on a shared column is corruption, not evolution
    val e = intercept[IllegalArgumentException] {
      wh.appendEvolve(Seq((3L, 42)).toDF("id", "v"), "bronze", "t")
    }
    assert(e.getMessage.contains("type change"))
  }

  test("changesBetween classifies insert/delete/update and drops unchanged rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_cdc").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((1L, "same"), (2L, "old"), (3L, "gone")).toDF("id", "v"), "gold", "t")
    wh.atomicOverwrite(
      Seq((1L, "same"), (2L, "new"), (4L, "born")).toDF("id", "v"), "gold", "t")
    val ch = wh.changesBetween("gold", "t", Seq("id"), fromBack = 1)
      .orderBy("id", "_change_type")
      .select("_change_type", "id", "v").as[(String, Long, String)].collect().toSeq
    assert(ch == Seq(
      ("update_postimage", 2L, "new"), ("update_preimage", 2L, "old"),
      ("delete", 3L, "gone"), ("insert", 4L, "born")))
  }

  test("deleteWhere and compact on an evolved table keep the evolved column") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_del_evo").toString
    val wh = new Warehouse(spark, root)
    wh.appendEvolve(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), "bronze", "t")
    wh.appendEvolve(Seq((3L, "c", 7.5)).toDF("id", "v", "score"), "bronze", "t")
    // the rewrite must go through the MERGED schema — a sampled-footer
    // read could silently drop `score` from every surviving row
    wh.deleteWhere("bronze", "t", col("id") === 2L)
    val afterDelete = wh.readEvolved("bronze", "t").orderBy("id").collect()
    assert(afterDelete.map(_.getLong(0)).toSeq == Seq(1L, 3L))
    assert(afterDelete(1).getDouble(afterDelete(1).fieldIndex("score")) == 7.5)
    wh.compact("bronze", "t", numFiles = 1)
    val afterCompact = wh.read("bronze", "t").orderBy("id").collect()
    assert(afterCompact.length == 2
      && afterCompact(1).getDouble(afterCompact(1).fieldIndex("score")) == 7.5)
  }

  test("changesBetween refuses a table that already has a _change_type column") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_cdc_clash").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(Seq((1L, "x")).toDF("id", "_change_type"), "gold", "t")
    wh.atomicOverwrite(Seq((1L, "y")).toDF("id", "_change_type"), "gold", "t")
    val e = intercept[IllegalArgumentException] {
      wh.changesBetween("gold", "t", Seq("id"), fromBack = 1)
    }
    assert(e.getMessage.contains("_change_type"))
  }

  test("deleteWhere preserves hive partition layout when partitionBy is omitted") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_del_part").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((1L, 2024, "a"), (2L, 2024, "b"), (3L, 2025, "c")).toDF("id", "year", "v"),
      "silver", "t", partitionBy = Seq("year"))
    assert(wh.partitionLayout("silver", "t") == Seq("year"))
    // no partitionBy passed — the rewrite must NOT flatten the layout
    wh.deleteWhere("silver", "t", col("id") === 2L)
    assert(wh.partitionLayout("silver", "t") == Seq("year"))
    assert(wh.read("silver", "t").select("id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("changesBetween prunes partitions whose file lists are unchanged") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_cdc_prune").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((1L, "a", 1), (2L, "b", 2)).toDF("id", "v", "k"),
      "gold", "t", partitionBy = Seq("k"))
    // fabricate an archived generation whose k=1 files are IDENTICAL to
    // the current table's (what any metadata-preserving archive — a
    // rename, a dynamic partition overwrite leaving k=1 alone — yields):
    // copy the table dir wholesale, then mutate ONLY partition k=2
    val conf = spark.sparkContext.hadoopConfiguration
    val src = new org.apache.hadoop.fs.Path(s"$root/gold/t")
    val dst = new org.apache.hadoop.fs.Path(s"$root/.versions/gold/t/v000000000001")
    val fs = src.getFileSystem(conf)
    fs.mkdirs(dst.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, conf)
    wh.append(Seq((3L, "c", 2)).toDF("id", "v", "k"), "gold", "t", Seq("k"))

    val ch = wh.changesBetween("gold", "t", Seq("id"), fromBack = 1)
    // the unchanged partition's files are never scanned — the Delta-CDF
    // "read only changed files" behavior
    assert(ch.inputFiles.nonEmpty && ch.inputFiles.forall(!_.contains("k=1")),
      s"k=1 leaked into the scan: ${ch.inputFiles.mkString(", ")}")
    val rows = ch.select("_change_type", "id", "v").as[(String, Long, String)]
      .collect().toSeq
    assert(rows == Seq(("insert", 3L, "c"))) // id=2 unchanged inside k=2 → dropped by the join
  }

  test("changesBetween is null-safe on keys and values") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_cdc_null").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((Some(1L), Option("x")), (None, Option("k_null"))).toDF("id", "v"), "gold", "t")
    wh.atomicOverwrite(
      Seq((Some(1L), Option.empty[String]), (None, Option("k_null"))).toDF("id", "v"), "gold", "t")
    val ch = wh.changesBetween("gold", "t", Seq("id"), fromBack = 1)
      .select("_change_type", "v").collect()
    // NULL-keyed row matched itself (unchanged → dropped); value x→NULL is an update
    assert(ch.map(_.getString(0)).sorted.toSeq ==
      Seq("update_postimage", "update_preimage"))
  }

  test("overwritePartitions swaps only touched partition directories") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_op").toString
    val wh = new Warehouse(spark, root)
    wh.atomicOverwrite(
      Seq((1L, "a", 2024), (2L, "b", 2024), (3L, "c", 2025)).toDF("id", "v", "y"),
      "silver", "t", Seq("y"))
    // inputFiles lists the whole table (no partition pruning applies
    // to it) — classify by directory instead
    def files(y: Int) = wh.read("silver", "t").inputFiles.filter(_.contains(s"y=$y")).toSet
    val (before2024, before2025) = (files(2024), files(2025))
    // replace ONLY y=2025; y=2024's physical files must be untouched
    wh.overwritePartitions(Seq((9L, "z", 2025)).toDF("id", "v", "y"),
      "silver", "t", Seq("y"))
    val after = wh.read("silver", "t")
    assert(after.orderBy("id").select("id").as[Long].collect().toSeq == Seq(1L, 2L, 9L))
    assert(files(2024) == before2024, "untouched partition must keep its physical files")
    assert(files(2025).intersect(before2025).isEmpty, "touched partition must be replaced")
    // a brand-new partition value lands as a new directory
    wh.overwritePartitions(Seq((7L, "n", 2026)).toDF("id", "v", "y"),
      "silver", "t", Seq("y"))
    assert(wh.read("silver", "t").count() == 4)
  }

  test("partitioned incremental model merges into touched partitions only") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_pinc").toString
    val wh = new Warehouse(spark, root)
    var source = Seq((1L, "2024-03-01", 10.0), (2L, "2024-03-02", 20.0),
      (3L, "2025-01-05", 30.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val model = Incremental.Model(
      "t", "silver", Seq(), Seq("k", "d"), "d",
      (in, wm) => {
        val src = wm.map(w => in("src").filter(col("d") >= lit(w))).getOrElse(in("src"))
        src.withColumn("y", year(col("d")))
      },
      partitionBy = Seq("y"))
    val reg = new Incremental.Registry(Seq(model))
    reg.runAll(wh, Map("src" -> source))
    def files2024 = wh.read("silver", "t").inputFiles.filter(_.contains("y=2024")).toSet
    val oldFiles2024 = files2024
    // new batch: a changed row at the 2025 watermark boundary + a new key
    source = Seq((1L, "2024-03-01", 10.0), (2L, "2024-03-02", 20.0),
      (3L, "2025-01-05", 99.0), (4L, "2025-02-01", 40.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    reg.runAll(wh, Map("src" -> source))
    val t = wh.read("silver", "t")
    // staged wins per key; 2024 rows intact; 2024's files never rewritten
    assert(t.orderBy("k", "v").select("k", "v").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 10.0), (2L, 20.0), (3L, 99.0), (4L, 40.0)))
    assert(files2024 == oldFiles2024,
      "incremental partitioned merge must not rewrite untouched partitions")
  }

  test("warehouse keepVersions=0 keeps no history (old swap semantics)") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wh_tt0").toString
    val wh = new Warehouse(spark, root, keepVersions = 0)
    wh.atomicOverwrite(Seq(1).toDF("x"), "gold", "t")
    wh.atomicOverwrite(Seq(2).toDF("x"), "gold", "t")
    assert(wh.versions("gold", "t").isEmpty)
    assert(wh.read("gold", "t").collect().head.getInt(0) == 2)
    intercept[IllegalArgumentException] { wh.readVersion("gold", "t", 1) }
  }

  test("watermark sidecar: recorded at write time, typed, cleared by out-of-band mutation") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_wm_side").toString
    val wh = new Warehouse(spark, root)
    def model = Incremental.Model(
      "t", "silver", Seq(), Seq("k"), "d",
      (in, wm) => {
        val src = in("src")
        wm.map(w => src.filter(col("d") >= lit(w))).getOrElse(src)
      })
    val v1 = Seq(("a", "2025-01-01", 1.0), ("b", "2025-01-02", 2.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    val reg = new Incremental.Registry(Seq(model))
    reg.runAll(wh, Map("src" -> v1))
    // the write job recorded MAX(d) without a target scan, typed as the
    // same java.sql.Date the scan fallback would return
    assert(wh.readMeta("silver", "t", "wm_d").contains("date:2025-01-02"))
    // the sidecar round-trips to the scan's JVM type exactly
    assert(wh.readMeta("silver", "t", "wm_d").flatMap(Incremental.wmDeser)
      == Incremental.maxWatermark(wh.read("silver", "t"), "d"))
    // a merge run advances it
    val v2 = Seq(("c", "2025-02-01", 3.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date"))
    reg.runAll(wh, Map("src" -> v1.unionByName(v2)))
    assert(wh.readMeta("silver", "t", "wm_d").contains("date:2025-02-01"))
    // an out-of-band append CLEARS the sidecar (never stale), and the
    // next run falls back to the scan and re-records correctly
    wh.append(Seq(("z", "2025-03-01", 9.0)).toDF("k", "d", "v")
      .withColumn("d", col("d").cast("date")), "silver", "t")
    assert(wh.readMeta("silver", "t", "wm_d").isEmpty)
    reg.runAll(wh, Map("src" -> v1.unionByName(v2)))
    assert(wh.readMeta("silver", "t", "wm_d").contains("date:2025-03-01"))
    assert(wh.read("silver", "t").filter(col("k") === "z").count() == 1)
  }

  test("wmSer/wmDeser round-trip every supported watermark type") {
    val vals: Seq[Any] = Seq(
      java.sql.Date.valueOf("2025-06-30"),
      java.sql.Timestamp.valueOf("2025-06-30 12:34:56.789"),
      java.time.LocalDate.parse("2025-06-30"),
      Integer.valueOf(42), java.lang.Long.valueOf(1234567890123L),
      java.lang.Double.valueOf(3.5), new java.math.BigDecimal("12345.6789"),
      "2025-06-30T00:00:00")
    vals.foreach { v =>
      val ser = Incremental.wmSer(v)
      assert(ser.isDefined, s"wmSer failed for ${v.getClass}")
      assert(Incremental.wmDeser(ser.get).contains(v), s"round-trip failed for $v")
    }
    // unknown types refuse (scan fallback), never mis-serialize
    assert(Incremental.wmSer(new Object).isEmpty)
    assert(Incremental.wmDeser("garbage").isEmpty)
    assert(Incremental.wmDeser("date:not-a-date").isEmpty)
  }
}
