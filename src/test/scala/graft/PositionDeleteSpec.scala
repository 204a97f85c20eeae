package graft

import graft.engine.SnapshotStore
import org.apache.spark.sql.functions._

/** Position deletes (Iceberg's second delete-file type): rows named by
  * physical address (file, row index), so ONE of two value-identical
  * duplicates can be removed — the delete equality files cannot
  * express. Zero-copy commits; compact materializes. */
class PositionDeleteSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String) = {
    val st = new SnapshotStore(spark, s"/tmp/graft_posdel_spec_$name")
    st.dropTable("l", "t")
    st
  }

  test("deleteWherePositions removes matching rows with zero data rewriting") {
    val st = freshStore("basic")
    st.overwrite(Seq(1, 2, 3, 4, 5, 6).toDF("k").repartition(2), "l", "t")
    val filesBefore = st.read("l", "t").inputFiles.sorted.toSeq
    st.deleteWherePositions("l", "t", col("k") % 2 === 0)
    assert(st.read("l", "t").select("k").as[Int].collect().sorted.toSeq == Seq(1, 3, 5))
    // the data files are untouched — the read still serves the SAME
    // physical files, plus exactly one new address file the anti-join
    // consumes
    val after = st.read("l", "t").inputFiles.sorted.toSeq
    assert(filesBefore.forall(after.contains), "a data file was rewritten")
    assert(after.size == filesBefore.size + 1,
      s"expected one address file on top of ${filesBefore.size}, got $after")
  }

  test("one of two IDENTICAL rows can be deleted — the equality-delete gap") {
    val st = freshStore("dup")
    st.overwrite(Seq(7, 7, 8).toDF("k").coalesce(1), "l", "t")
    val dups = st.readPositions("l", "t").filter(col("k") === 7)
    assert(dups.count() == 2)
    // name exactly ONE physical row
    val one = dups.orderBy(st.PosIdxCol).limit(1)
    st.deletePositions(one, "l", "t")
    val left = st.read("l", "t").select("k").as[Int].collect().sorted.toSeq
    assert(left == Seq(7, 8), s"expected one 7 to survive, got $left")
  }

  test("rows appended after a position delete are untouched, even identical ones") {
    val st = freshStore("append")
    st.overwrite(Seq(1, 2, 3).toDF("k").coalesce(1), "l", "t")
    st.deleteWherePositions("l", "t", col("k") === 2)
    st.append(Seq(2).toDF("k").coalesce(1), "l", "t")
    assert(st.read("l", "t").select("k").as[Int].collect().sorted.toSeq == Seq(1, 2, 3))
  }

  test("compact materializes position deletes; readPositions reflects pending ones") {
    val st = freshStore("compact")
    st.overwrite(Seq(1, 2, 3, 4).toDF("k").coalesce(1), "l", "t")
    st.deleteWherePositions("l", "t", col("k") > 2)
    // addresses visible to a new delete exclude already-deleted rows
    assert(st.readPositions("l", "t").count() == 2)
    st.compact("l", "t", numFiles = 1)
    assert(st.read("l", "t").select("k").as[Int].collect().sorted.toSeq == Seq(1, 2))
    // post-compact: count path works again (no pending deletes)
    assert(st.countRows("l", "t").isEmpty || st.countRows("l", "t").contains(2L))
  }

  test("readPositions sequence-scopes equality deletes like read does") {
    // delete key K, re-append K: read() shows the re-appended row, and
    // readPositions must list its address too — same scoping as
    // readMerged, so deleteWherePositions can target re-inserted rows
    val st = freshStore("rescope")
    st.overwrite(Seq((1, "old"), (2, "keep")).toDF("k", "v").coalesce(1), "l", "t")
    st.deleteKeys(Seq(1).toDF("k"), "l", "t", Seq("k"))
    st.append(Seq((1, "new")).toDF("k", "v").coalesce(1), "l", "t")
    assert(st.read("l", "t").select("v").as[String].collect().sorted.toSeq
      == Seq("keep", "new"))
    val addrs = st.readPositions("l", "t")
    assert(addrs.count() == 2, "readPositions hides the re-appended row")
    assert(addrs.filter(col("v") === "new").count() == 1)
    // and the re-inserted row is now position-deletable
    st.deleteWherePositions("l", "t", col("v") === "new")
    assert(st.read("l", "t").select("v").as[String].collect().toSeq == Seq("keep"))
  }

  test("position and equality deletes compose on one table") {
    val st = freshStore("mixed")
    st.overwrite(Seq((1, "a"), (2, "b"), (3, "c"), (4, "d")).toDF("k", "v")
      .coalesce(1), "l", "t")
    st.deleteWherePositions("l", "t", col("k") === 1)
    st.deleteKeys(Seq(3).toDF("k"), "l", "t", Seq("k"))
    assert(st.read("l", "t").select("k").as[Int].collect().sorted.toSeq == Seq(2, 4))
  }
}
