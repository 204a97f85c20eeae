package graft

import graft.engine.Merge

/** Keyed merge semantics (J1/W2, J2/W7, W8) on tiny frames. */
class MergeSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  private def existing = {
    import spark.implicits._
    Seq(("IBM", "2025-11-14", 1.0), ("MSFT", "2025-11-14", 2.0)).toDF("t", "d", "v")
  }

  test("insertOnlyMerge discards duplicate-keyed incoming rows") {
    import spark.implicits._
    val incoming = Seq(("IBM", "2025-11-14", 99.0), ("IBM", "2025-11-17", 3.0)).toDF("t", "d", "v")
    val out = Merge.insertOnlyMerge(existing, incoming, Seq("t", "d"))
      .orderBy("t", "d").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("IBM", "2025-11-14", 1.0),   // existing wins — NOT 99.0
      ("IBM", "2025-11-17", 3.0),   // fresh key inserted
      ("MSFT", "2025-11-14", 2.0)))
  }

  test("upsert lets staged rows win") {
    import spark.implicits._
    val staged = Seq(("IBM", "2025-11-14", 99.0), ("NVDA", "2025-11-14", 4.0)).toDF("t", "d", "v")
    val out = Merge.upsert(existing, staged, Seq("t", "d"))
      .orderBy("t", "d").collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2)))
    assert(out.toSeq == Seq(
      ("IBM", "2025-11-14", 99.0),  // staged wins
      ("MSFT", "2025-11-14", 2.0),
      ("NVDA", "2025-11-14", 4.0)))
  }

  test("upsert is idempotent: run(run(x)) == run(x)") {
    import spark.implicits._
    val staged = Seq(("IBM", "2025-11-14", 99.0)).toDF("t", "d", "v")
    val once = Merge.upsert(existing, staged, Seq("t", "d"))
    val twice = Merge.upsert(once, staged, Seq("t", "d"))
    assert(once.orderBy("t", "d").collect().toSeq ==
      twice.orderBy("t", "d").collect().toSeq)
  }

  test("insert-only merge commutes on disjoint keys") {
    import spark.implicits._
    val a = Seq(("NVDA", "2025-11-14", 4.0)).toDF("t", "d", "v")
    val b = Seq(("GOOG", "2025-11-14", 5.0)).toDF("t", "d", "v")
    val ab = Merge.insertOnlyMerge(Merge.insertOnlyMerge(existing, a, Seq("t", "d")), b, Seq("t", "d"))
    val ba = Merge.insertOnlyMerge(Merge.insertOnlyMerge(existing, b, Seq("t", "d")), a, Seq("t", "d"))
    assert(ab.orderBy("t", "d").collect().toSeq == ba.orderBy("t", "d").collect().toSeq)
  }

  test("upsertSmallStaged (broadcast hint) equals plain upsert") {
    import spark.implicits._
    val staged = Seq(("IBM", "2025-11-14", 99.0), ("NVDA", "2025-11-14", 4.0)).toDF("t", "d", "v")
    val plain = Merge.upsert(existing, staged, Seq("t", "d")).orderBy("t", "d").collect()
    val hinted = Merge.upsertSmallStaged(existing, staged, Seq("t", "d")).orderBy("t", "d").collect()
    assert(plain.toSeq == hinted.toSeq)
  }

  test("evolving merge on identical schemas equals the strict merge") {
    import spark.implicits._
    val incoming = Seq(("IBM", "2025-11-17", 3.0)).toDF("t", "d", "v")
    val strict = Merge.insertOnlyMerge(existing, incoming, Seq("t", "d")).orderBy("t", "d").collect()
    val evolving = Merge.insertOnlyMergeEvolving(existing, incoming, Seq("t", "d")).orderBy("t", "d").collect()
    assert(strict.toSeq == evolving.toSeq)
  }

  test("schemaGuard passes on reordered columns, fails on drift") {
    import spark.implicits._
    val reordered = existing.select(col("v"), col("d"), col("t"))
    Merge.schemaGuard(existing, reordered) // must not throw
    val drifted = existing.withColumn("extra", lit(1))
    assertThrows[IllegalArgumentException](Merge.schemaGuard(existing, drifted))
    val retyped = existing.withColumn("v", col("v").cast("int"))
    assertThrows[IllegalArgumentException](Merge.schemaGuard(existing, retyped))
  }

  test("bloom-prefiltered insert-only merge equals the plain merge exactly") {
    import spark.implicits._
    val existing = (1L to 500L).map(i => (i, s"old$i")).toDF("k", "v")
    val incoming = (400L to 900L).map(i => (i, s"new$i")).toDF("k", "v")
    val plain = Merge.insertOnlyMerge(existing, incoming, Seq("k"))
      .orderBy("k", "v").collect().toSeq
    val bloom = Merge.insertOnlyMergeBloom(existing, incoming, Seq("k"), expectedItems = 1000L)
      .orderBy("k", "v").collect().toSeq
    assert(bloom == plain)
    assert(bloom.size == 500 + 400) // 500 existing + fresh keys 501..900
  }

  test("bloom merge with a tiny (high-fpp) sketch is still exact") {
    import spark.implicits._
    val existing = (1L to 2000L).map(i => (i, i * 2)).toDF("k", "v")
    val incoming = (1500L to 2500L).map(i => (i, i * 3)).toDF("k", "v")
    // expectedItems deliberately 100x under-sized: many false positives,
    // all routed to the precise anti-join -> result unchanged
    val plain = Merge.insertOnlyMerge(existing, incoming, Seq("k"))
      .orderBy("k", "v").collect().toSeq
    val bloom = Merge.insertOnlyMergeBloom(existing, incoming, Seq("k"), expectedItems = 20L)
      .orderBy("k", "v").collect().toSeq
    assert(bloom == plain)
  }

  private def scd2Existing = {
    import spark.implicits._
    Seq(
      ("A", "x", 1.0, "2024-01-01", Some("2025-01-01"), false), // history row
      ("A", "x", 2.0, "2025-01-01", None, true), // current, will change
      ("B", "y", 3.0, "2025-01-01", None, true), // current, restated identically
      ("C", "z", 4.0, "2025-01-01", None, true)) // current, absent from staged
      .toDF("k", "seg", "bal", "valid_from", "valid_to", "is_current")
  }

  private def scd2Staged = {
    import spark.implicits._
    Seq(
      ("A", "x", 9.0), // changed attribute -> close + open
      ("B", "y", 3.0), // identical restatement -> no-op
      ("D", "w", 5.0)) // brand-new key -> open only
      .toDF("k", "seg", "bal")
  }

  test("scd2Merge covers all four staged cases") {
    val out = Merge.scd2Merge(scd2Existing, scd2Staged, Seq("k"), Seq("seg", "bal"),
      lit("2025-06-01"))
      .orderBy("k", "valid_from")
      .collect()
      .map(r => (r.getString(0), r.getDouble(2), r.getString(3),
        Option(r.getString(4)), r.getBoolean(5)))
    assert(out.toSeq == Seq(
      ("A", 1.0, "2024-01-01", Some("2025-01-01"), false), // history untouched
      ("A", 2.0, "2025-01-01", Some("2025-06-01"), false), // closed by the change
      ("A", 9.0, "2025-06-01", None, true), // new version opened
      ("B", 3.0, "2025-01-01", None, true), // identical restatement: no-op
      ("C", 4.0, "2025-01-01", None, true), // untouched
      ("D", 5.0, "2025-06-01", None, true))) // new key opened
  }

  test("scd2Merge is idempotent under the same increment") {
    val once = Merge.scd2Merge(scd2Existing, scd2Staged, Seq("k"), Seq("seg", "bal"),
      lit("2025-06-01"))
    // every staged row now matches the current version it produced, so a
    // later re-statement of the same increment must change nothing
    val twice = Merge.scd2Merge(once, scd2Staged, Seq("k"), Seq("seg", "bal"),
      lit("2025-07-01"))
    assert(twice.count() == once.count())
    assert(twice.except(once).count() == 0 && once.except(twice).count() == 0)
  }

  test("scd2Merge rejects a staged batch with duplicate keys") {
    import spark.implicits._
    val dupStaged = scd2Staged.unionByName(Seq(("A", "x", 7.0)).toDF("k", "seg", "bal"))
    val e = intercept[IllegalArgumentException] {
      Merge.scd2Merge(scd2Existing, dupStaged, Seq("k"), Seq("seg", "bal"),
        lit("2025-06-01"))
    }
    assert(e.getMessage.contains("duplicate"))
  }

  test("scd2Merge works when a merge key column is named 'count'") {
    import spark.implicits._
    val existing = Seq(("A", "x", "2025-01-01", Option.empty[String], true))
      .toDF("count", "seg", "valid_from", "valid_to", "is_current")
    val staged = Seq(("A", "y")).toDF("count", "seg")
    val out = Merge.scd2Merge(existing, staged, Seq("count"), Seq("seg"),
      lit("2025-06-01"))
    assert(out.count() == 2) // closed old version + opened new one
  }

  test("scd2Merge keeps rows whose is_current is NULL (treated as history)") {
    import spark.implicits._
    val withNull = scd2Existing.unionByName(
      Seq(("E", "q", 6.0, "2023-01-01", Some("2024-01-01")))
        .toDF("k", "seg", "bal", "valid_from", "valid_to")
        .withColumn("is_current", lit(null).cast("boolean")))
    val out = Merge.scd2Merge(withNull, scd2Staged, Seq("k"), Seq("seg", "bal"),
      lit("2025-06-01"))
    // the malformed row must not vanish: it rides along as history
    assert(out.filter($"k" === "E").count() == 1)
    assert(out.count() ==
      Merge.scd2Merge(scd2Existing, scd2Staged, Seq("k"), Seq("seg", "bal"),
        lit("2025-06-01")).count() + 1)
  }

  test("joinViewDelta equals the full recompute for ANY insert-only split") {
    import spark.implicits._
    val a = Seq((1, "a1"), (2, "a2"), (3, "a3"), (3, "a3b")).toDF("k", "av")
    val b = Seq((1, "b1"), (2, "b2"), (2, "b2b"), (4, "b4")).toDF("k", "bv")
    val full = a.join(b, Seq("k")).orderBy("k", "av", "bv")
      .collect().map(_.toSeq).toSeq
    // every way to split each table into (old, delta) must converge
    for (cutA <- Seq("a1", "a2", "a3z"); cutB <- Seq("b1", "b2b", "b9")) {
      val (aOld, aDelta) = (a.filter($"av" <= cutA), a.filter($"av" > cutA))
      val (bOld, bDelta) = (b.filter($"bv" <= cutB), b.filter($"bv" > cutB))
      val vOld = aOld.join(bOld, Seq("k"))
      val v = Merge.joinViewDelta(vOld, aOld, aDelta, bOld, bDelta, Seq("k"))
        .orderBy("k", "av", "bv").collect().map(_.toSeq).toSeq
      assert(v == full, s"split ($cutA, $cutB) diverged from the recompute")
    }
  }

  test("joinViewDelta with empty deltas is exactly the old view") {
    import spark.implicits._
    val a = Seq((1, "a1")).toDF("k", "av")
    val b = Seq((1, "b1")).toDF("k", "bv")
    val none = a.filter(lit(false))
    val noneB = b.filter(lit(false))
    val vOld = a.join(b, Seq("k"))
    val v = Merge.joinViewDelta(vOld, a, none, b, noneB, Seq("k"))
    assert(v.collect().map(_.toSeq).toSeq == vOld.collect().map(_.toSeq).toSeq)
  }

  test("upsertWithDelete: the four Delta MERGE cases, null cond = keep") {
    import spark.implicits._
    val existing = Seq((1L, "a", "x"), (2L, "b", "x"), (3L, "c", "x"))
      .toDF("k", "v", "flag")
    val staged = Seq(
      (1L, "A", "del"),   // matched + cond        → target row deleted
      (2L, "B", "keep"),  // matched, no cond      → updated to staged
      (4L, "D", "del"),   // unmatched + cond      → NO-OP (never inserts)
      (5L, "E", "keep"),  // unmatched, no cond    → inserted
      (6L, "F", null)     // NULL cond             → not-delete → inserted
    ).toDF("k", "v", "flag")
    val out = Merge.upsertWithDelete(existing, staged, Seq("k"),
      col("flag") === "del")
      .select("k", "v").as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(out == Seq((2L, "B"), (3L, "c"), (5L, "E"), (6L, "F")), s"got $out")
  }
}
