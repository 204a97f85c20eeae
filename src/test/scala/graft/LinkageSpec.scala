package graft

import graft.ops.Linkage
import org.apache.spark.sql.functions._

/** Value-frequency record linkage: weight math, null evidence, and
  * the rare-beats-common ranking property. */
class LinkageSpec extends SparkSpec {
  import spark.implicits._

  test("rare-value agreement outweighs common-value agreement") {
    // B side: 4 records; "x" name unique (n_v=1), city shared by all
    val a = Seq((1L, "x", "metro"), (2L, "y", "metro")).toDF("id", "nm", "city")
      .withColumn("blk", lit(1))
    val b = Seq((10L, "x", "metro"), (11L, "q", "metro"),
      (12L, "r", "metro"), (13L, "s", "metro")).toDF("id", "nm", "city")
      .withColumn("blk", lit(1))
    val out = Linkage.linkPairs(a, b, "id", "id", Seq("blk"), Seq("nm", "city"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getInt(3), r.getLong(4)))).toMap
    // N=4; unique name weight = 4e6/1, shared city weight = 4e6/4 = 1e6
    assert(out((1L, 10L)) == ((4000000L + 1000000L, 2, 4L)))
    // city-only pairs score exactly the common weight
    assert(out((2L, 11L)) == ((1000000L, 1, 4L)))
    // ranking: the rare agreement dominates any number of common ones
    assert(out((1L, 10L))._1 > out((2L, 11L))._1)
  }

  test("nulls contribute no evidence and never agree") {
    val a = Seq((1L, Option.empty[String], "m")).toDF("id", "nm", "city")
      .withColumn("blk", lit(1))
    val b = Seq((10L, Option.empty[String], "m"), (11L, Some("z"), "m"))
      .toDF("id", "nm", "city").withColumn("blk", lit(1))
    val out = Linkage.linkPairs(a, b, "id", "id", Seq("blk"), Seq("nm", "city"))
      .orderBy("id_b").collect()
    // null-null name: no agreement (FS: missing = no evidence)
    assert(out(0).getInt(out(0).fieldIndex("n_agree")) == 1) // city only
    assert(out(1).getInt(out(1).fieldIndex("n_agree")) == 1)
  }

  test("blocking is mandatory and bounds the pair space") {
    val df = Seq((1L, "a")).toDF("id", "nm")
    intercept[IllegalArgumentException] {
      Linkage.linkPairs(df, df, "id", "id", Seq(), Seq("nm"))
    }
    // disjoint blocks → zero candidates, not a cross join
    val a = Seq((1L, "a", 1)).toDF("id", "nm", "blk")
    val b = Seq((2L, "a", 2)).toDF("id", "nm", "blk")
    assert(Linkage.linkPairs(a, b, "id", "id", Seq("blk"), Seq("nm")).count() == 0)
  }

  test("jaroWinkler matches the published reference values and DuckDB's conventions") {
    import spark.implicits._
    val cases = Seq(
      ("MARTHA", "MARHTA", 0.9611111111111111),  // classic Winkler example
      ("DWAYNE", "DUANE", 0.8400000000000001),
      ("CRATE", "TRACE", 0.7333333333333334),    // jaro > 0.7 but prefix 0 → no boost
      ("abc", "abc", 1.0),
      ("ab", "ba", 0.0),                         // window 0: no matches
      ("x", "y", 0.0),
      ("", "abc", 0.0),
      ("", "", 0.0),                             // RapidFuzz/DuckDB convention, NOT textbook 1.0
      ("0", "00", 0.8500000000000001),
      ("aa", "a", 0.8500000000000001))
    val out = cases.toDF("a", "b", "want")
      .withColumn("got", Linkage.jaroWinkler(col("a"), col("b")))
      .collect()
    out.foreach { r =>
      assert(r.getDouble(2) == r.getDouble(3),
        s"jw(${r.getString(0)}, ${r.getString(1)}): want ${r.getDouble(2)} got ${r.getDouble(3)}")
    }
    // SQL registration path
    graft.functions.GraftFunctions.register(spark)
    val s = spark.sql("SELECT graft_jaro_winkler('MARTHA', 'MARHTA') AS j").collect().head
    assert(s.getDouble(0) == 0.9611111111111111)
  }

  test("editDistancePairs: blocked DP distances, cross-block never compared") {
    import spark.implicits._
    val df = Seq(
      (1L, "kitten", "b1"), (2L, "sitting", "b1"), (3L, "kitten", "b1"),
      (4L, "kitten", "b2"), // identical text, different block: no pair
      (5L, "zzzzzzzz", "b1")) // too far from everything at max 3
      .toDF("id", "name", "blk")
    val out = Linkage.editDistancePairs(df, "id", "name", Seq("blk"), 3)
      .orderBy("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(out.toSeq == Seq((1L, 2L, 3), (1L, 3L, 0), (2L, 3L, 3)))
    intercept[IllegalArgumentException] {
      Linkage.editDistancePairs(df, "id", "name", Seq.empty, 3)
    }
  }

  test("soundex matches the classic published vectors including the h/w rules") {
    import spark.implicits._
    import graft.ops.Linkage
    val cases = Seq(
      "Robert" -> "R163", "Rupert" -> "R163",     // the canonical pair
      "Ashcraft" -> "A261", "Ashcroft" -> "A261", // h is TRANSPARENT: s,c merge
      "Tymczak" -> "T522",                        // vowel separates c,z? no - adjacent 2s collapse
      "Pfister" -> "P236",                        // first-letter code absorbs the f
      "Honeyman" -> "H555",
      "Washington" -> "W252",                     // h/w-initial: no head-code drop
      "White" -> "W300",
      "Lee" -> "L000", "Gutierrez" -> "G362",
      "Jackson" -> "J250", "VanDeusen" -> "V532")
    val out = cases.map(_._1).toDF("name")
      .select(col("name"), Linkage.soundex(col("name")).as("sx"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    cases.foreach { case (n, e) => assert(out(n) == e, s"soundex($n)") }
    val junk = Seq("123", "", "!!").toDF("name")
      .select(Linkage.soundex(col("name"))).collect()
    assert(junk.forall(_.isNullAt(0)), "non-alpha input NULL-gates")
  }
}
