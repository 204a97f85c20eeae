package graft

import graft.engine.{Constraints, SnapshotStore, TxnCatalog}
import org.apache.spark.sql.functions._

/** Cross-table atomic commits: a group's tables become visible
  * together or not at all, catalog time travel is cross-table
  * consistent, and a mid-group failure leaves every catalog reader on
  * the previous consistent version. */
class TxnCatalogSpec extends SparkSpec {
  import spark.implicits._

  private def fixture() = {
    val st = new SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_txn").toString)
    (st, new TxnCatalog(st))
  }

  test("commitGroup flips both tables atomically; time travel is group-consistent") {
    val (_, cat) = fixture()
    val v1 = cat.commitGroup(Seq(
      (Seq((1L, 10.0)).toDF("k", "v"), "silver", "daily"),
      (Seq((1L, 10.0)).toDF("k", "total"), "gold", "monthly")))
    val v2 = cat.commitGroup(Seq(
      (Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "silver", "daily"),
      (Seq((1L, 10.0), (2L, 20.0)).toDF("k", "total"), "gold", "monthly")))
    assert(v1 == 1L && v2 == 2L)
    // latest: both tables at generation 2
    assert(cat.read("silver", "daily").count() == 2)
    assert(cat.read("gold", "monthly").count() == 2)
    // catalog v1: BOTH tables as of group 1 — never a mixed state
    assert(cat.readAt("silver", "daily", v1).count() == 1)
    assert(cat.readAt("gold", "monthly", v1).count() == 1)
  }

  test("a failure while staging leaves every catalog reader on the old group") {
    val (_, cat) = fixture()
    cat.commitGroup(Seq(
      (Seq((1L, 10.0)).toDF("k", "v"), "silver", "daily"),
      (Seq((1L, 10.0)).toDF("k", "total"), "gold", "monthly")))
    // second table's write trips a constraint AFTER the first staged
    intercept[Exception] {
      cat.commitGroup(Seq(
        (Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), "silver", "daily"),
        (Constraints.enforce(Seq((2L, -1.0)).toDF("k", "total"),
          checks = Map("total_positive" -> (col("total") > 0))), "gold", "monthly")))
    }
    // catalog untouched: BOTH tables still read as the old group, even
    // though silver/daily has a newer staged (unreferenced) snapshot
    assert(cat.versions.size == 1)
    assert(cat.read("silver", "daily").count() == 1)
    assert(cat.read("gold", "monthly").count() == 1)
  }

  test("a lost catalog race retries past the winner and drops neither group") {
    val (_, cat) = fixture()
    cat.commitGroup(Seq((Seq((1L, 1.0)).toDF("k", "v"), "silver", "a")))
    // interleave a racing winner INSIDE the rename window (the test
    // seam fires after the loser wrote its tmp file, targeting c2):
    // the winner commits table b at c2 through its own catalog handle,
    // so the loser's rename onto c2 must return false → retry → c3
    val winnerFired = new java.util.concurrent.atomic.AtomicBoolean(false)
    cat.preCommitHook = () => if (winnerFired.compareAndSet(false, true)) {
      val (_, winner) = (cat.st, new TxnCatalog(cat.st))
      winner.commitGroup(Seq((Seq((9L, 9.0)).toDF("k", "v"), "silver", "b")))
      ()
    }
    val v = cat.commitGroup(Seq((Seq((2L, 2.0)).toDF("k", "v"), "silver", "c")))
    cat.preCommitHook = () => ()
    assert(v == 3L, s"loser must land past the winner's c2, got c$v")
    // nothing dropped: the winner's pin (b) AND the loser's (c) are both
    // in the latest catalog version, and a's pin survived throughout
    val pins = cat.tableVersions()
    assert(pins.contains(("silver", "a")) && pins.contains(("silver", "b"))
      && pins.contains(("silver", "c")),
      s"latest catalog must pin all three tables, got ${pins.keys}")
    assert(cat.read("silver", "b").count() == 1)
    assert(cat.read("silver", "c").count() == 1)
    // catalog never references an orphaned snapshot: every pinned id is
    // a retained store snapshot
    pins.foreach { case ((l, t), id) =>
      assert(cat.st.snapshots(l, t).contains(id), s"orphan pin $l/$t@$id")
    }
  }

  test("truly concurrent commitGroups over disjoint tables all land") {
    val (_, cat) = fixture()
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val futures = (0 until 4).map { i =>
      Future {
        val c = new TxnCatalog(cat.st)
        c.commitGroup(Seq((Seq((i.toLong, i.toDouble)).toDF("k", "v"), "silver", s"t$i")))
      }
    }
    val versions = Await.result(Future.sequence(futures), 120.seconds)
    // every commit got a distinct catalog version (no silent clobbers)
    assert(versions.distinct.size == 4, s"duplicate catalog versions: $versions")
    // and the FINAL catalog pins all four tables — no group was dropped
    val pins = cat.tableVersions()
    (0 until 4).foreach { i =>
      assert(pins.contains(("silver", s"t$i")), s"table t$i dropped from catalog: ${pins.keys}")
      assert(cat.read("silver", s"t$i").count() == 1)
    }
  }

  test("tables outside a group keep their pins; ungoverned reads fail fast") {
    val (_, cat) = fixture()
    cat.commitGroup(Seq((Seq((1L, 1.0)).toDF("k", "v"), "silver", "a")))
    cat.commitGroup(Seq((Seq((9L, 9.0)).toDF("k", "v"), "silver", "b")))
    // a's pin survived b's commit
    assert(cat.read("silver", "a").as[(Long, Double)].collect().toSeq == Seq((1L, 1.0)))
    assert(cat.read("silver", "b").count() == 1)
    intercept[IllegalArgumentException] { cat.read("silver", "nope") }
    intercept[IllegalArgumentException] { cat.readAt("silver", "b", 1L) }
  }
}
