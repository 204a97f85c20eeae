package graft

import graft.engine.SnapshotStore
import org.apache.spark.sql.functions._

/** Row lineage (Iceberg v3 mechanism): ids assigned once at commit,
  * derived from file position on append files, materialized physically
  * by compaction, stable across the row's life. */
class LineageSpec extends SparkSpec {
  import spark.implicits._

  private def freshStore(name: String) = {
    val st = new SnapshotStore(spark,
      s"/tmp/graft_lineage_spec_$name", statsFor = Seq("k"))
    st.dropTable("l", "t")
    st
  }

  test("appendLineage assigns dense unique ids across commits") {
    val st = freshStore("dense")
    st.appendLineage(Seq(10, 11, 12).toDF("k").coalesce(1), "l", "t")
    st.appendLineage(Seq(20, 21).toDF("k").coalesce(1), "l", "t")
    val got = st.readLineage("l", "t").collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("_row_id")).toMap
    assert(got.values.toSeq.sorted == (0L to 4L))
    // batch 2's ids all follow batch 1's
    assert(Seq(20, 21).map(got).forall(_ >= 3L))
  }

  test("compactLineage preserves every id; appends continue the sequence") {
    val st = freshStore("compact")
    st.appendLineage(Seq(1, 2, 3).toDF("k").coalesce(1), "l", "t")
    st.appendLineage(Seq(4, 5).toDF("k").coalesce(1), "l", "t")
    val before = st.readLineage("l", "t").collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("_row_id")).toMap
    st.compactLineage("l", "t")
    val after = st.readLineage("l", "t").collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("_row_id")).toMap
    assert(after == before, s"compaction renumbered rows: $before -> $after")
    // one physical file now
    assert(st.read("l", "t").inputFiles.length == 1)
    // the plain read serves the logical schema only (no _row_id leak)
    assert(!st.read("l", "t").columns.contains("_row_id"))
    st.appendLineage(Seq(6).toDF("k").coalesce(1), "l", "t")
    val withNew = st.readLineage("l", "t").collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("_row_id")).toMap
    assert(withNew(6) == 5L, s"post-compact append id: ${withNew(6)}")
    assert(withNew.filter(_._1 != 6) == before)
  }

  test("double compaction keeps ids and the high-water mark") {
    val st = freshStore("twice")
    st.appendLineage(Seq(1, 2).toDF("k").coalesce(1), "l", "t")
    st.compactLineage("l", "t")
    st.compactLineage("l", "t")
    st.appendLineage(Seq(3).toDF("k").coalesce(1), "l", "t")
    val got = st.readLineage("l", "t").collect()
      .map(r => r.getAs[Int]("k") -> r.getAs[Long]("_row_id")).toMap
    assert(got(3) == 2L && got.values.toSeq.sorted == (0L to 2L))
  }

  test("readLineage refuses a table with non-lineage commits") {
    val st = freshStore("refuse")
    st.append(Seq(1).toDF("k"), "l", "t")
    val e = intercept[IllegalStateException](st.readLineage("l", "t"))
    assert(e.getMessage.contains("no row lineage"))
    // and appendLineage refuses to continue on top of it
    val e2 = intercept[IllegalArgumentException](
      st.appendLineage(Seq(2).toDF("k").coalesce(1), "l", "t"))
    assert(e2.getMessage.contains("without row lineage"))
  }

  test("lineage works under hive partitioning (ids from per-file position)") {
    val st = freshStore("hive")
    val df = Seq((1, "a"), (2, "a"), (3, "b")).toDF("k", "p")
    st.appendLineage(df.repartition(col("p")), "l", "t", partitionBy = Seq("p"))
    val got = st.readLineage("l", "t")
    assert(got.select("_row_id").as[Long].collect().sorted.toSeq == Seq(0L, 1L, 2L))
    assert(got.columns.toSeq == Seq("k", "p", "_row_id"))
  }
}
