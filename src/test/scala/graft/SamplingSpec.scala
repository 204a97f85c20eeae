package graft

import graft.ops.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    (1L to 2000L).map(i => (i, if (i % 4 == 0) "en" else "other")).toDF("id", "lang")
  }

  test("downsampleByKey thins targeted strata, keeps the rest whole") {
    val out = Sampling.downsampleByKey(corpus, "lang", Map("other" -> 0.1), seed = 7L)
    val counts = out.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 500L) // untouched stratum fully kept
    assert(counts("other") > 50L && counts("other") < 300L) // ~150 expected
  }

  test("downsample is reproducible for a fixed seed") {
    val a = Sampling.downsampleByKey(corpus, "lang", Map("other" -> 0.2), 42L)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    val b = Sampling.downsampleByKey(corpus, "lang", Map("other" -> 0.2), 42L)
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
  }

  test("mixturePerKey honors per-key caps, default, and hash-order stability") {
    val caps = Map("en" -> 10)
    val a = Sampling.mixturePerKey(corpus, "lang", "id", caps, default = 30)
    val counts = a.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts("en") == 10L && counts("other") == 30L)
    // same mix regardless of input partitioning
    val b = Sampling.mixturePerKey(corpus.repartition(13), "lang", "id", caps, default = 30)
    assert(a.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      b.orderBy("id").collect().map(_.getLong(0)).toSeq)
    // the mixture is a SUBSET of the per-key carve-out with the same order
    val carve = Sampling.deterministicPerKey(corpus, "lang", "id", 30)
      .collect().map(_.getLong(0)).toSet
    assert(a.collect().map(_.getLong(0)).forall(carve))
  }

  test("hashSplit is deterministic, partition-independent, roughly proportioned") {
    import spark.implicits._
    val ids = (1L to 2000L).toDF("id")
    val a = Sampling.hashSplit(ids, "id")
    val counts = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // thresholds are floor(256*frac)/256: train 204/256 = 79.7%,
    // val (230-204)/256 = 10.2%; allow sampling wobble
    assert(math.abs(counts("train") - 1594L) < 120)
    assert(counts("val") > 100 && counts("test") > 100)
    // same id → same split regardless of partitioning (stateless)
    val b = Sampling.hashSplit(ids.repartition(13), "id")
    assert(a.orderBy("id").collect().map(_.getString(1)).toSeq ==
      b.orderBy("id").collect().map(_.getString(1)).toSeq)
    // NULL id surfaces as NULL split
    val n = Sampling.hashSplit(Seq(Option.empty[Long]).toDF("id"), "id").collect().head
    assert(n.isNullAt(1))
    // bad fractions rejected
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", trainFrac = 0.95, valFrac = 0.1)
    }
    // fractions that floor to a zero-width band would make a split
    // silently empty — rejected loudly instead
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", trainFrac = 0.003, valFrac = 0.1)
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(ids, "id", trainFrac = 0.8, valFrac = 0.0005)
    }
  }

  test("negativeSample: k per anchor, no self-pairs, rerun- and partition-stable") {
    import spark.implicits._
    val anchors = corpus.filter(col("id") < 4)
    val out = Sampling.negativeSample(anchors, "id", corpus, "id", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(out.length == 15, "3 anchors x 5 negatives")
    assert(out.forall { case (a, n, _) => a != n }, "anchor never samples itself")
    assert(out.groupBy(_._1).forall(_._2.map(_._3).sorted.toSeq == Seq(1, 2, 3, 4, 5)))
    // different anchors draw DIFFERENT orders (per-anchor hash key)
    val byAnchor = out.groupBy(_._1).map { case (a, rows) =>
      a -> rows.sortBy(_._3).map(_._2).toSeq
    }
    assert(byAnchor.values.toSet.size > 1, "per-anchor orders should differ")
    // partition-count independence: same draws on a repartitioned pool
    val re = Sampling.negativeSample(anchors, "id", corpus.repartition(7), "id", k = 5)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(re.toSet == out.toSet)
    // slicing restricts candidates but keeps determinism
    val sliced = Sampling.negativeSample(anchors, "id", corpus, "id", k = 5, poolSlice = 0.25)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)))
    assert(sliced.length == 15 && sliced.toSet != out.toSet)
  }

  test("deterministicPerKey keeps exactly k rows per key, stably") {
    val a = Sampling.deterministicPerKey(corpus, "lang", "id", k = 25)
    assert(a.groupBy("lang").count().collect().forall(_.getLong(1) == 25L))
    // repartitioning the input must not change the selection
    val b = Sampling.deterministicPerKey(corpus.repartition(13), "lang", "id", k = 25)
    assert(a.orderBy("id").collect().map(_.getLong(0)).toSeq ==
      b.orderBy("id").collect().map(_.getLong(0)).toSeq)
  }

  test("weightedSample: proportional, deterministic, loud on bad weights") {
    import spark.implicits._
    // 10k ids at constant weight 0.3 → kept fraction within a few points
    val flat = (1L to 10000L).map(i => (i, 0.3)).toDF("id", "w")
    val kept = Sampling.weightedSample(flat, "id", "w").count()
    assert(math.abs(kept / 10000.0 - 0.3) < 0.03, s"kept $kept of 10000 at w=0.3")
    // extremes: w=0 keeps nothing, w=1 keeps everything
    assert(Sampling.weightedSample(
      (1L to 100L).map((_, 0.0)).toDF("id", "w"), "id", "w").count() == 0)
    assert(Sampling.weightedSample(
      (1L to 100L).map((_, 1.0)).toDF("id", "w"), "id", "w").count() == 100)
    // deterministic + partition-independent: identical kept SET
    val mixed = (1L to 2000L).map(i => (i, (i % 10) / 10.0)).toDF("id", "w")
    val a = Sampling.weightedSample(mixed, "id", "w").select("id").as[Long].collect().sorted.toSeq
    val b = Sampling.weightedSample(mixed.repartition(13), "id", "w")
      .select("id").as[Long].collect().sorted.toSeq
    assert(a == b)
    // NULL ids dropped (no stable decision); bad weights raise in-plan
    assert(Sampling.weightedSample(
      Seq((Option.empty[Long], 0.5)).toDF("id", "w"), "id", "w").count() == 0)
    val e = intercept[Exception] {
      Sampling.weightedSample(Seq((1L, 1.5)).toDF("id", "w"), "id", "w").count()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ chain(t.getCause)
    assert(chain(e).exists(_.contains("[0, 1]")), chain(e).mkString(" | "))
  }

  test("temperatureMixture: sqrt quotas, self-capping, determinism under repartition") {
    import spark.implicits._
    import graft.ops.Sampling
    // 100 'big' docs vs 4 'small': sqrt weights 10 vs 2 -> quotas
    // (budget 24) = 24*10/12 = 20 and 24*2/12 = 4 (self-capped at 4)
    val df = ((1L to 100L).map(i => (i, "big")) ++ (101L to 104L).map(i => (i, "small")))
      .toDF("id", "src")
    val out = Sampling.temperatureMixture(df, "src", "id", budget = 24L)
    val counts = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts == Map("big" -> 20L, "small" -> 4L))
    // head flattened: raw share 100/104 = 96%, sampled share 20/24 = 83%
    // selection identity is layout-independent
    val ids = out.select("id").as[Long].collect().toSet
    val ids7 = Sampling.temperatureMixture(df.repartition(7), "src", "id", 24L)
      .select("id").as[Long].collect().toSet
    assert(ids == ids7)
    // budget beyond the corpus: every row survives, nothing duplicates
    assert(Sampling.temperatureMixture(df, "src", "id", 100000L).count() == 104)
    intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(df, "src", "id", 0L)
    }
  }

  test("neymanAllocation: variance-weighted split, zero-variance stratum gets 0") {
    import spark.implicits._
    // stratum a: constant (sd 0); b: spread {0,20}; c: spread {0,40} with
    // twice the rows — alloc ∝ N_h·S_h = 0 : 2·10 : 4·20 = 0 : 20 : 80
    val df = (Seq(("a", 5.0), ("a", 5.0))
      ++ Seq(("b", 0.0), ("b", 20.0))
      ++ Seq(("c", 0.0), ("c", 40.0), ("c", 0.0), ("c", 40.0)))
      .toDF("k", "v")
    val out = Sampling.neymanAllocation(df, "k", "v", total = 100)
      .orderBy("stratum").collect()
    assert(out.map(_.getAs[Long]("alloc")).toSeq == Seq(0L, 20L, 80L),
      s"got ${out.mkString(", ")}")
    assert(out.head.getAs[Double]("stddev") == 0.0)
    // partition invariance: exact same doubles at any parallelism
    val out7 = Sampling.neymanAllocation(df.repartition(7), "k", "v", total = 100)
      .orderBy("stratum").collect()
    assert(out.map(_.toSeq).toSeq == out7.map(_.toSeq).toSeq)
  }

  test("kfold: every fold hit, layout-invariant, append-stable per row") {
    import spark.implicits._
    val df = (1L to 500L).toDF("id")
    val out = Sampling.kfold(df, "id", k = 5)
    val folds = out.groupBy("fold").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(folds.keySet == Set(0L, 1L, 2L, 3L, 4L))
    assert(folds.values.forall(n => n > 60 && n < 140), s"imbalanced: $folds")
    // append stability: first 100 ids keep their fold inside a bigger set
    val small = Sampling.kfold((1L to 100L).toDF("id"), "id", 5)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val big = Sampling.kfold(df, "id", 5).filter(col("id") <= 100)
      .orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(small == big)
  }

  test("timeSplit: embargo rows dropped, boundaries half-open on the right side") {
    import spark.implicits._
    val df = Seq("1996-11-30", "1996-12-01", "1996-12-02", "1996-12-31",
      "1997-01-01", "1997-02-01").map(d => (d, d)).toDF("id", "d")
    val out = Sampling.timeSplit(df, "d", cutoff = "1997-01-01", embargoDays = 30)
      .orderBy("id").collect().map(r => (r.getString(0), r.getString(2)))
    // embargo zone [1996-12-02, 1997-01-01) dropped; 12-01 < cutoff-30 -> train
    assert(out.toSeq == Seq(("1996-11-30", "train"), ("1996-12-01", "train"),
      ("1997-01-01", "test"), ("1997-02-01", "test")))
  }

  test("rebalanceClasses: exact min-class counts, deterministic, NULL labels dropped") {
    import spark.implicits._
    val df = ((1L to 50L).map((_, "big")) ++ (100L to 106L).map((_, "small")))
      .toDF("id", "lab")
      .unionByName(Seq((999L, null.asInstanceOf[String])).toDF("id", "lab"))
    val out = Sampling.rebalanceClasses(df, "lab", "id")
    val counts = out.groupBy("lab").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    assert(counts == Map("big" -> 7L, "small" -> 7L))
    val a = out.orderBy("lab", "id").collect().map(_.toSeq).toSeq
    val b = Sampling.rebalanceClasses(df.repartition(9), "lab", "id")
      .orderBy("lab", "id").collect().map(_.toSeq).toSeq
    assert(a == b, "pick must be layout-invariant")
  }

  test("poissonBootstrap: deterministic, partition-invariant, Poisson(1)-shaped") {
    import spark.implicits._
    val df = (1L to 2000L).map(i => (i, 100L + (i % 7))).toDF("id", "v")
    val a = Sampling.poissonBootstrap(df, "id", "v", replicas = 8)
      .orderBy("replica").collect().map(_.toSeq).toSeq
    val b = Sampling.poissonBootstrap(df.repartition(13), "id", "v", replicas = 8)
      .orderBy("replica").collect().map(_.toSeq).toSeq
    assert(a == b, "bootstrap must not depend on partitioning")
    // Poisson(1) weights: each replica's effective n concentrates near
    // the true n (sd ≈ sqrt(n) ≈ 45 here; allow 5 sd)
    val ns = a.map(_(1).asInstanceOf[Long])
    assert(ns.forall(n => math.abs(n - 2000L) < 225),
      s"n_eff far from n: $ns")
    // replica means hover around the true mean (100..106 range)
    val means = a.map(_(2).asInstanceOf[Double])
    assert(means.forall(m => m > 100.0 && m < 106.0))
    assert(means.distinct.size > 1, "replicas must actually differ")
    intercept[IllegalArgumentException] {
      Sampling.poissonBootstrap(df, "id", "v", replicas = 1)
    }
  }

  test("ppsSystematic matches a sequential plain-Scala reconstruction exactly") {
    import spark.implicits._
    val ws = (1L to 300L).map(i => (i, 1L + (i * 7) % 50))
    val out = Sampling.ppsSystematic(ws.toDF("id", "w"), "id", "w", n = 40)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val total = ws.map(_._2).sum
    val step = total / 40
    val start = step / 2
    def q(x: Long) = math.min((x - start + step) / step, 40L)
    var cum = 0L
    val exp = ws.flatMap { case (id, w) =>
      val prev = cum; cum += w
      val hits = q(cum) - q(prev)
      if (hits >= 1)
        Some((id, w, cum, hits, math.min(w * 40L * 1000000L / total, 1000000L)))
      else None
    }
    assert(out.toSeq == exp)
    assert(out.map(_._4).sum == 40L, "systematic PPS draws exactly n picks")
  }

  test("ppsSystematic is input-layout-invariant and multi-selects heavy units") {
    import spark.implicits._
    val ws = (1L to 20L).map(i => (i, if (i == 7) 1000L else 1L))
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.ppsSystematic(df, "id", "w", n = 10)
        .orderBy("id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    val a = run(ws.toDF("id", "w"))
    val b = run(ws.toDF("id", "w").repartition(7))
    assert(a == b, "output is a pure function of the frame order, not the layout")
    val heavy = a.find(_._1 == 7L).get
    assert(heavy._2 >= 2, "a unit heavier than one step is drawn multiple times")
    assert(heavy._3 == 1000000L, "heavier-than-step unit has pi capped at 1")
    assert(a.map(_._2).sum == 10L)
  }

  test("ppsSystematic rejects nonpositive weights and W < n loudly") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(Seq((1L, 0L)).toDF("id", "w"), "id", "w", 1)
    }
    intercept[IllegalArgumentException] {
      Sampling.ppsSystematic(Seq((1L, 3L)).toDF("id", "w"), "id", "w", 5)
    }
  }

  test("Hansen-Hurwitz over the PPS design recovers a size-proportional total exactly") {
    import spark.implicits._
    // v = 3w exactly: HH is exact for ANY draw when the study variable
    // is proportional to the size measure — the property the estimator
    // query's milli-unit arithmetic must preserve
    val ws = (1L to 20L).map(i => (i, 5L))
    val sample = Sampling.ppsSystematic(ws.toDF("id", "w"), "id", "w", n = 10)
      .collect().map(r => (r.getLong(1), r.getLong(3)))
    val bigW = 100L
    val n = 10L
    val tHatMilli = sample.map { case (w, hits) =>
      val v = 3L * w
      val a = hits * v * 1000L
      a * (bigW / (n * w)) + a * (bigW % (n * w)) / (n * w)
    }.sum
    assert(tHatMilli == 1000L * ws.map(t => 3L * t._2).sum,
      "size-proportional variable must be recovered exactly (zero design error)")
  }

  test("two-step floor-division identity matches BigInt exactly") {
    // the overflow-avoiding identity samp_hh_estimate relies on:
    // floor(a*w/b) = a*(w div b) + floor(a*(w mod b)/b)
    val rnd = new scala.util.Random(7)
    (1 to 500).foreach { _ =>
      val a = rnd.between(1L, 1L << 20)
      val w = rnd.between(1L, 1L << 40)
      val b = rnd.between(1L, 1L << 20)
      val twoStep = a * (w / b) + a * (w % b) / b
      assert(BigInt(twoStep) == BigInt(a) * BigInt(w) / BigInt(b))
    }
  }
}
