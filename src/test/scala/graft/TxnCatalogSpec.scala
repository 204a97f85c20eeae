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
