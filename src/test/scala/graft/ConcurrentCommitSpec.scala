package graft

import graft.engine.SnapshotStore
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

/** Safety at the edge of the single-writer contract: if a foreign
  * manifest appears at the id the store would commit next (what losing
  * a race to a concurrent winner looks like on disk), the late commit
  * must fail LOUDLY — never silently clobber or silently build on
  * garbage — and the existing manifest's bytes must survive. */
class ConcurrentCommitSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent appends all land: no dropped rows, distinct versions") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cc_app").toString)
    st.overwrite(Seq((0L, "seed")).toDF("id", "v"), "silver", "t")
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val versions = Await.result(Future.sequence((1 to 4).map { i =>
      Future(st.append(Seq((i.toLong, s"w$i")).toDF("id", "v"), "silver", "t"))
    }), 120.seconds)
    assert(versions.distinct.size == 4, s"clobbered versions: $versions")
    // every appended row present exactly once — a lost race that dropped
    // the winner's file list would lose rows
    val ids = st.read("silver", "t").select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(0L, 1L, 2L, 3L, 4L), s"rows dropped or duplicated: $ids")
    assert(st.snapshots("silver", "t").size == 5)
  }

  test("concurrent dynamic overwrites of DISJOINT partitions both land") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cc_dyn").toString)
    st.overwrite(Seq((1L, "a", 2024), (2L, "b", 2025)).toDF("id", "v", "year"),
      "silver", "t", Seq("year"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    Await.result(Future.sequence(Seq(
      Future(st.overwritePartitions(Seq((10L, "a2", 2024)).toDF("id", "v", "year"),
        "silver", "t", Seq("year"))),
      Future(st.overwritePartitions(Seq((20L, "b2", 2025)).toDF("id", "v", "year"),
        "silver", "t", Seq("year"))))), 120.seconds)
    val rows = st.read("silver", "t").select("id").as[Long].collect().sorted.toSeq
    assert(rows == Seq(10L, 20L), s"a disjoint-partition race dropped a write: $rows")
  }

  test("merge conflict detection: a changed touched partition aborts the commit") {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cc_mrg").toString)
    val base = st.overwrite(Seq((1L, "a", 2024), (2L, "b", 2025)).toDF("id", "v", "year"),
      "silver", "t", Seq("year"))
    // racer changes partition 2024 AFTER the merge (conceptually) read `base`
    st.overwritePartitions(Seq((9L, "raced", 2024)).toDF("id", "v", "year"),
      "silver", "t", Seq("year"))
    // commit pinned to the stale base and touching 2024 must ABORT...
    intercept[java.util.ConcurrentModificationException] {
      st.overwritePartitionsChecked(Seq((10L, "mine", 2024)).toDF("id", "v", "year"),
        "silver", "t", Seq("year"), txnId = None, op = "upsert_partitions",
        mergeBase = Some(base))
    }
    // ...the racer's row survives...
    assert(st.read("silver", "t").filter(col("year") === 2024)
      .select("id").as[Long].collect().toSeq == Seq(9L))
    // ...and the SAME stale base touching only the UNCHANGED partition lands
    st.overwritePartitionsChecked(Seq((20L, "fine", 2025)).toDF("id", "v", "year"),
      "silver", "t", Seq("year"), txnId = None, op = "upsert_partitions",
      mergeBase = Some(base))
    assert(st.read("silver", "t").select("id").as[Long].collect().sorted.toSeq
      == Seq(9L, 20L))
  }

  test("a commit arriving after a foreign manifest fails loudly and clobbers nothing") {
    val root = java.nio.file.Files.createTempDirectory("graft_cas").toString
    val st = new SnapshotStore(spark, root)
    st.overwrite(Seq((1L, "a")).toDF("id", "v"), "silver", "t")
    val winner = new Path(s"$root/silver/t/_manifests/m${"%012d".format(2L)}")
    val fs = winner.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(winner, false)
    out.write("WINNER".getBytes("UTF-8")); out.close()
    // the late writer must observe the foreign manifest and fail — it
    // tries to BUILD ON it (append reads the latest manifest), and a
    // manifest it cannot parse is a loud stop, not a silent overwrite
    intercept[Exception] {
      st.append(Seq((2L, "b")).toDF("id", "v"), "silver", "t")
    }
    val in = fs.open(winner)
    val content = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    assert(content == "WINNER", "late commit clobbered the existing manifest")
    // and the committed snapshot 1 is still perfectly readable
    assert(st.readSnapshot("silver", "t", 1L).count() == 1)
  }
}
