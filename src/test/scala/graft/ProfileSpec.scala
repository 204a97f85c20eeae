package graft

import graft.ops.Profile
import org.apache.spark.sql.functions._

class ProfileSpec extends SparkSpec {
  import spark.implicits._

  test("profile counts nulls and distincts, reports numeric min/max, NULL for strings") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), Some("a")), (Some(2), None), (None, Some("b")))
      .toDF("num", "str")
    val out = Profile.profile(df, Seq("num", "str"))
      .orderBy("column_name").collect()
    val num = out(0)
    assert(num.getString(0) == "num" && num.getLong(1) == 1 // one NULL
      && num.getLong(2) == 2                                // distinct {1, 2}
      && num.getDouble(3) == 1.0 && num.getDouble(4) == 2.0)
    val str = out(1)
    assert(str.getString(0) == "str" && str.getLong(1) == 1
      && str.getLong(2) == 2
      && str.isNullAt(3) && str.isNullAt(4)) // non-numeric: no min/max
  }

  test("profile has no Expand in any leg (the mixed-distinct blowup)") {
    val df = Seq((1, "a")).toDF("num", "str")
    val plan = Profile.profile(df, Seq("num", "str"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Expand"), s"profile planned an Expand:\n$plan")
  }

  test("profile rejects an empty column list") {
    intercept[IllegalArgumentException] {
      Profile.profile(Seq((1, 2)).toDF("a", "b"), Seq())
    }
    intercept[IllegalArgumentException] {
      Profile.profileApprox(Seq((1, 2)).toDF("a", "b"), Seq())
    }
  }

  test("profileApprox: estimate within bound, all-NULL column vacuously ok, no Expand") {
    val df = Seq(
      (Some(1), Some("a")), (Some(2), Some("a")), (Some(2), None), (None, Option.empty[String]))
      .toDF("num", "half_null")
      .withColumn("all_null", lit(null).cast("string"))
    val out = Profile.profileApprox(df, Seq("num", "half_null", "all_null"))
      .orderBy("column_name").collect()
    out.foreach { r =>
      assert(r.getInt(r.fieldIndex("approx_ok")) == 1,
        s"${r.getString(0)}: HLL estimate out of bound")
    }
    val allNull = out(0)
    assert(allNull.getString(0) == "all_null"
      && allNull.getLong(allNull.fieldIndex("n_distinct")) == 0)
    // a single-distinct + regular-agg leg must plan via the one-distinct
    // path, not the multi-distinct Expand that multiplies scan rows
    val plan = Profile.profileApprox(df, Seq("num", "half_null"))
      .queryExecution.sparkPlan.toString
    assert(!plan.contains("Expand"), s"profileApprox planned an Expand:\n$plan")
  }

  test("binnedQuantiles: hand-computed interpolation; error bounded by bin width") {
    import spark.implicits._
    // $1..$100, $10 bins: bin 0 holds 9 values ($1-$9), bins 1-9 hold 10,
    // bin 10 holds just $100. p50: target 50 lands in bin 5 (cum 49→59):
    // 5000 + 1000·(50−49)/10 = 5100 cents = $51.00 exactly.
    val vals = (1 to 100).map(i => ("k", i.toDouble)).toDF("k", "v")
    val out = Profile.binnedQuantiles(vals, Seq("k"), "v",
      binWidthCents = 1000L, ps = Seq(0.5, 0.95)).collect().head
    assert(out.getDouble(1) == 51.0, s"p50 = ${out.getDouble(1)}")
    // exact p50 of 1..100 is 50.5 — estimate within one bin width
    assert(math.abs(out.getDouble(1) - 50.5) <= 10.0)
    assert(math.abs(out.getDouble(2) - 95.0) <= 10.0, s"p95 = ${out.getDouble(2)}")
    // negative values refuse loudly (integer-div binning floors toward 0)
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    val e = intercept[Exception] {
      Profile.binnedQuantiles(Seq(("k", -1.0)).toDF("k", "v"), Seq("k"), "v",
        1000L, Seq(0.5)).collect()
    }
    assert(chain(e).exists(_.contains("non-negative")), chain(e).mkString(" | "))
  }

  test("profileQuantiles: one-pass multi-column == per-column binnedQuantiles") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toDouble, (i * 3 % 97).toDouble)).toDF("a", "b")
    val onePass = Profile.profileQuantiles(df, Seq("a", "b"),
      binWidthCents = 1000L, ps = Seq(0.5, 0.95))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    Seq("a", "b").foreach { c =>
      val solo = Profile.binnedQuantiles(
        df.select(lit(c).as("k"), col(c).as("v")), Seq("k"), "v", 1000L, Seq(0.5, 0.95))
        .collect().head
      assert(onePass(c) == ((solo.getDouble(1), solo.getDouble(2))),
        s"column $c: one-pass ${onePass(c)} != solo ${(solo.getDouble(1), solo.getDouble(2))}")
    }
    // fractional quantile names carry their full decimal
    assert(Profile.quantileColName(0.999) == "p99_9")
    assert(Profile.quantileColName(0.975) == "p97_5")
    assert(Profile.quantileColName(0.5) == "p50")
    // non-numeric columns refuse at build time
    intercept[IllegalArgumentException] {
      Profile.profileQuantiles(Seq(("x", 1.0)).toDF("s", "v"), Seq("s"), 100L, Seq(0.5))
    }
  }

  test("histogramDrift: identical slices score zero; disjoint slices score L1=2") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val same = Profile.histogramDrift(a, a, "v", 0.0, 10.0, 5).head()
    assert(same.getAs[Double]("l1") == 0.0 && same.getAs[Double]("chisq") == 0.0)
    assert(!same.getAs[Boolean]("drifted"))
    // fully disjoint mass: Σ|p−q| = 2 exactly, and the flag trips
    val b = Seq(9.0, 9.5).toDF("v")
    val diff = Profile.histogramDrift(a, b, "v", 0.0, 10.0, 5).head()
    assert(diff.getAs[Double]("l1") == 2.0, s"got ${diff.getAs[Double]("l1")}")
    assert(diff.getAs[Boolean]("drifted"))
    assert(diff.getAs[Long]("tot_a") == 4L && diff.getAs[Long]("tot_b") == 2L)
  }

  test("histogramDrift clamps out-of-range values into the edge bins") {
    import spark.implicits._
    val a = Seq(-100.0, 0.5).toDF("v")   // both land in bin 0
    val b = Seq(999.0, 9.9).toDF("v")    // both land in bin 4
    val r = Profile.histogramDrift(a, b, "v", 0.0, 10.0, 5).head()
    // two fully-concentrated disjoint bins → L1 = 2
    assert(r.getAs[Double]("l1") == 2.0)
    assert(r.getAs[Long]("n_bins") == 2L) // only touched bins materialize
  }

  test("ksTest: hand-computed D on a shifted sample; 0 on identical ones") {
    import spark.implicits._
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("v")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("v")
    val r = Profile.ksTest(a, b, "v").collect().head
    // max |F_a − F_b| = 2/4 (at v=2..4): d_num = |C_a·n_b − C_b·n_a| = 8
    assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
    assert(r.getAs[Long]("d_num") == 8L)
    assert(r.getAs[Double]("ks") == 0.5)
    val same = Profile.ksTest(a, a, "v").collect().head
    assert(same.getAs[Long]("d_num") == 0L && same.getAs[Double]("ks") == 0.0)
  }

  test("mannWhitney: hand-computed doubled-U and z on disjoint samples; tie correction") {
    import spark.implicits._
    val a = Seq(1L, 2L).toDF("v")
    val b = Seq(3L, 4L).toDF("v")
    val r = Profile.mannWhitney(a, b, "v").collect().head
    // ranks 1,2 | 3,4: U_a = 0, U_b = 4 (doubled: 0 and 8), no ties
    assert(r.getAs[Long]("n_a") == 2L && r.getAs[Long]("n_b") == 2L)
    assert(r.getAs[Long]("u2_a") == 0L && r.getAs[Long]("u2_b") == 8L)
    assert(r.getAs[Long]("tie_cubes") == 0L)
    val expectedZ = (0.0 - 2.0 * 2.0) / (2.0 * math.sqrt((2.0 * 2.0 / 12.0) * 5.0))
    assert(r.getAs[Double]("z_a") == expectedZ)
    // fully tied pools: U_a = U_b = n_a*n_b/2 and tie term = c^3 - c
    val t = Profile.mannWhitney(Seq(1L, 1L).toDF("v"), Seq(1L, 1L).toDF("v"), "v")
      .collect().head
    assert(t.getAs[Long]("u2_a") == 4L && t.getAs[Long]("u2_b") == 4L)
    assert(t.getAs[Long]("tie_cubes") == 60L)
    assert(t.isNullAt(t.fieldIndex("z_a")), "zero-variance pool must yield NULL z")
  }

  test("spearman: perfect monotone = 1, reversed = -1, constant column = NULL") {
    import spark.implicits._
    // y = x^3 is nonlinearly monotone: Spearman 1.0 exactly
    val mono = Seq((1L, 1L), (2L, 8L), (3L, 27L), (4L, 64L)).toDF("x", "y")
    assert(Profile.spearman(mono, "x", "y").collect().head.getAs[Double]("rho") == 1.0)
    val rev = Seq((1L, 4L), (2L, 3L), (3L, 2L), (4L, 1L)).toDF("x", "y")
    assert(Profile.spearman(rev, "x", "y").collect().head.getAs[Double]("rho") == -1.0)
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("x", "y")
    val r = Profile.spearman(const, "x", "y").collect().head
    assert(r.isNullAt(r.fieldIndex("rho")), "zero rank variance must yield NULL rho")
    // ties: x=(1,1,2), y=(10,10,20) -> still perfectly concordant
    val tied = Seq((1L, 10L), (1L, 10L), (2L, 20L)).toDF("x", "y")
    assert(Profile.spearman(tied, "x", "y").collect().head.getAs[Double]("rho") == 1.0)
  }

  test("kendallTau: hand-computed tau-b with ties, extremes, degenerate NULL") {
    import spark.implicits._
    // x=(1,1,2,3), y=(1,2,2,3): C=4, D=0, tx=1, ty=1, n0=6
    // tau-b = 4 / sqrt(5*5) = 0.8 exactly
    val t = Seq((1L, 1L), (1L, 2L), (2L, 2L), (3L, 3L)).toDF("x", "y")
    val r = Profile.kendallTau(t, "x", "y").collect().head
    assert(r.getAs[Long]("n") == 4L && r.getAs[Double]("tau_b") == 0.8)
    val mono = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("x", "y")
    assert(Profile.kendallTau(mono, "x", "y").collect().head
      .getAs[Double]("tau_b") == 1.0)
    val rev = Seq((1L, 30L), (2L, 20L), (3L, 10L)).toDF("x", "y")
    assert(Profile.kendallTau(rev, "x", "y").collect().head
      .getAs[Double]("tau_b") == -1.0)
    val const = Seq((1L, 5L), (2L, 5L)).toDF("x", "y")
    val c = Profile.kendallTau(const, "x", "y").collect().head
    assert(c.isNullAt(c.fieldIndex("tau_b")), "constant column must yield NULL")
  }

  test("chiSquared: hand-computed 2x2 in exact micro fixed point") {
    import spark.implicits._
    // O = [[10,20],[30,40]]: per-cell micro terms 333333+222222+142857+95238
    // = 793650 -> chi2 = 0.79365 exactly (true quotient is the decimal)
    val rows = Seq.fill(10)(("a", "x")) ++ Seq.fill(20)(("a", "y")) ++
      Seq.fill(30)(("b", "x")) ++ Seq.fill(40)(("b", "y"))
    val r = Profile.chiSquared(rows.toDF("u", "v"), "u", "v").collect().head
    assert(r.getAs[Long]("n") == 100L)
    assert(r.getAs[Double]("chi2") == 0.79365)
    assert(r.getAs[Double]("cramers_v") == math.sqrt(0.79365 / 100.0))
  }

  test("chiSquared: sparse table — an unobserved cell contributes its expected count") {
    import spark.implicits._
    // O = [[5,0],[5,5]]: the (a,y) cell is ABSENT from the grouped cells.
    // Marginals r=(5,10), k=(10,5), n=15. True Pearson terms E=(10/3,5/3,20/3,10/3):
    // (5-10/3)^2/(10/3) + (0-5/3)^2/(5/3) + (5-20/3)^2/(20/3) + (5-10/3)^2/(10/3)
    // = 5/6 + 5/3 + 5/12 + 5/6 = 15/4 = 3.75. Micro fixed point:
    // terms (O*n-r*k)^2*1e6 div (r*k*n): 833333+1666666+416666+833333
    // = 3749998 -> chi2 = 3.749998. Summing only observed cells would
    // lose the 1666666 term (chi2 = 2.083332) — the zero cell is the test.
    val rows = Seq.fill(5)(("a", "x")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))
    val r = Profile.chiSquared(rows.toDF("u", "v"), "u", "v").collect().head
    assert(r.getAs[Long]("n") == 15L)
    assert(r.getAs[Double]("chi2") == 3.749998)
    assert(r.getAs[Double]("cramers_v") == math.sqrt(3.749998 / 15.0))
  }

  test("weightedMedian: lower pick, even split, zero-weight keys vanish") {
    import spark.implicits._
    val df = Seq(("a", 1L, 1L), ("a", 2L, 2L), ("a", 3L, 1L), // W=4, cum(2)=3 -> 2
      ("b", 1L, 1L), ("b", 2L, 1L),                           // even split -> lower 1
      ("z", 9L, 0L))                                          // zero total weight
      .toDF("k", "v", "w")
    val out = Profile.weightedMedian(df, Seq("k"), "v", "w")
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getAs[Long]("weighted_median"),
        r.getAs[Long]("total_weight")))
    assert(out.toSeq == Seq(("a", 2L, 4L), ("b", 1L, 2L)))
  }

  test("lorenzCurve: decile boundaries and shares on a hand case") {
    import spark.implicits._
    // values 1,2,3,4 (cents): n=4, total=10
    // deciles 1-2 -> v=1 share .1; 3-5 -> v=2 share .3; 6-7 -> v=3 .6; 8-10 -> v=4 1.0
    val df = Seq(1L, 2L, 3L, 4L).toDF("v")
    val out = Profile.lorenzCurve(df, "v").orderBy("decile").collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("boundary_value"),
        r.getAs[Long]("cum_rows"), r.getAs[Double]("cum_value_share")))
    assert(out.toSeq == Seq(
      (1L, 1L, 1L, 0.1), (2L, 1L, 1L, 0.1),
      (3L, 2L, 2L, 0.3), (4L, 2L, 2L, 0.3), (5L, 2L, 2L, 0.3),
      (6L, 3L, 3L, 0.6), (7L, 3L, 3L, 0.6),
      (8L, 4L, 4L, 1.0), (9L, 4L, 4L, 1.0), (10L, 4L, 4L, 1.0)))
  }

  test("iqrOutliers: Tukey fences flag the tails, clean keys report nothing") {
    import spark.implicits._
    // key a: 1..8 plus 100 -> n=9, q1 at 4*cum>=9 -> v=3, q3 at >=27 -> v=7
    // IQR=4: low fence 3-6=-3, high 7+6=13 -> only 100 flags (high)
    val df = ((1L to 8L).map(("a", _)) ++ Seq(("a", 100L)) ++
      (1L to 4L).map(("b", _))).toDF("k", "v")
    val out = Profile.iqrOutliers(df, Seq("k"), "v").collect()
      .map(r => (r.getString(0), r.getAs[Long]("v"), r.getAs[Long]("q1"),
        r.getAs[Long]("q3"), r.getAs[String]("side")))
    assert(out.toSeq == Seq(("a", 100L, 3L, 7L, "high")))
  }

  test("cdfLookup: right-closed empirical CDF per key on the value domain") {
    import spark.implicits._
    val df = Seq(("k", 1L), ("k", 1L), ("k", 2L), ("k", 5L)).toDF("g", "v")
    val out = Profile.cdfLookup(df, Seq("g"), "v").orderBy("v").collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("c"), r.getAs[Double]("cdf")))
    assert(out.toSeq == Seq((1L, 2L, 0.5), (2L, 1L, 0.75), (5L, 1L, 1.0)))
  }

  test("discQuantiles: one walk, many levels, lower-element picks") {
    import spark.implicits._
    val df = (1L to 10L).map(("k", _)).toDF("g", "v")
    val out = Profile.discQuantiles(df, Seq("g"), "v", pMille = Seq(500, 900, 990))
      .orderBy("p_mille").collect()
      .map(r => (r.getAs[Long]("p_mille"), r.getAs[Long]("v")))
    // p50: smallest v with cum >= 5 -> 5; p90 -> 9; p99: cum >= 9.9 -> 10
    assert(out.toSeq == Seq((500L, 5L), (900L, 9L), (990L, 10L)))
  }

  test("trimmedMean: exact span-overlap trims, ties and partial trims included") {
    import spark.implicits._
    // 1..10, trim 10% each side -> drop 1 and 10 -> mean(2..9) = 5.5
    val a = (1L to 10L).map(("a", _)).toDF("k", "v")
    val ra = Profile.trimmedMean(a, Seq("k"), "v", trimPerMille = 100).collect().head
    assert(ra.getAs[Long]("n_kept") == 8L && ra.getAs[Double]("trimmed_mean") == 5.5)
    // ties spanning the cut: (1,5,5,5,9) trim 20% -> k=1 -> keep three 5s
    val b = Seq(1L, 5L, 5L, 5L, 9L).map(("b", _)).toDF("k", "v")
    val rb = Profile.trimmedMean(b, Seq("k"), "v", trimPerMille = 200).collect().head
    assert(rb.getAs[Long]("n_kept") == 3L && rb.getAs[Double]("trimmed_mean") == 5.0)
    intercept[IllegalArgumentException] {
      Profile.trimmedMean(a, Seq("k"), "v", trimPerMille = 500)
    }
  }

  test("corrMatrix: one-pass exact pairwise r — perfect, inverse, degenerate") {
    import spark.implicits._
    // y = 2x -> r=1; z = -x -> r(x,z) = -1; c constant -> NULL with everything
    val df = Seq((1L, 2L, 3L, 5L), (2L, 4L, 2L, 5L), (3L, 6L, 1L, 5L))
      .toDF("x", "y", "z", "c")
    val out = Profile.corrMatrix(df, Seq("x", "y", "z", "c"))
      .orderBy("col_x", "col_y").collect()
      .map(r => (r.getString(0), r.getString(1),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(out.toSeq == Seq(
      ("x", "c", None), ("x", "y", Some(1.0)), ("x", "z", Some(-1.0)),
      ("y", "c", None), ("y", "z", Some(-1.0)), ("z", "c", None)))
  }

  test("benford matches a plain-Scala replay, keeps zero-count digits, screens junk") {
    val vals: Seq[Long] = (10L to 19L) ++ Seq(25L, 300L, 9L)
    val df = (vals.map(Option(_)) ++ Seq(None, Some(0L), Some(-5L))).toDF("v")
    val out = Profile.benford(df, "v").orderBy("digit").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val n = vals.size.toLong
    val cnt = vals.groupBy(v => v.toString.head.asDigit.toLong)
      .map { case (d, vs) => d -> vs.size.toLong }
    val expected = Profile.benfordExpectedPpm.map { case (d, e) => d.toLong -> e }.toMap
    val rows = (1L to 9L).map { d =>
      val c = cnt.getOrElse(d, 0L)
      (d, c, c * 1000000L / n, expected(d))
    }
    val chi = rows.map { case (_, _, obs, e) => (obs - e) * (obs - e) / e }.sum
    assert(out.toSeq == rows.map(r => (r._1, r._2, r._3, r._4, chi)))
    assert(out.count(_._2 == 0L) == 5, "absent digits 4..8 stay as n=0 rows")
  }

  test("benford expectation literals are the Benford law in ppm") {
    val m = Profile.benfordExpectedPpm.toMap
    assert(m(1) == 301029L && m(9) == 45757L)
    assert(Profile.benfordExpectedPpm.map(_._2).sum > 990000L,
      "the nine shares cover ~1e6 ppm (floor loss only)")
  }
}
