package graft

import graft.ops.{Classifier, Dedup, EventOps, TimeSeries}
import org.apache.spark.sql.functions._

/** Unit/hand-case coverage for the round-12 analytics wave: ACF,
  * Gini stump, leave-one-out target encoding, session path mining. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  test("autocorr: an exactly periodic series has ACF 1.0 at its period") {
    // period-2 alternation 10,20,10,20,... → lag-2 pairs identical
    // (corr exactly 1), lag-1 pairs perfectly anti-correlated (−1)
    val series = (1 to 40).map(i => (i, if (i % 2 == 0) 10.0 else 20.0))
      .toDF("t", "v")
    val acf = TimeSeries.autocorr(series, "t", "v", maxLag = 2)
      .orderBy("lag").collect()
    assert(acf.length == 2)
    assert(math.abs(acf(1).getAs[Double]("corr") - 1.0) < 1e-12)
    assert(math.abs(acf(0).getAs[Double]("corr") + 1.0) < 1e-12)
  }

  test("autocorr: lag pair counts shrink by one per lag") {
    val series = (1 to 10).map(i => (i, i.toDouble)).toDF("t", "v")
    val acf = TimeSeries.autocorr(series, "t", "v", maxLag = 3)
      .orderBy("lag").collect()
    assert(acf.map(_.getAs[Long]("n_pairs")).toSeq == Seq(9L, 8L, 7L))
    // a strictly increasing series is perfectly lag-correlated
    acf.foreach(r => assert(math.abs(r.getAs[Double]("corr") - 1.0) < 1e-12))
  }

  test("giniStump finds a perfectly separating threshold") {
    // label = feature <= 5, so the split at 5 is pure on both sides
    val df = (1 to 100).map(i => (i % 10 + 1, if (i % 10 + 1 <= 5) 1L else 0L))
      .toDF("f", "y")
    val best = Classifier.giniStump(df, col("f"), col("y"))
      .filter(col("is_best") === 1).collect()
    assert(best.length == 1 && best.head.getAs[Long]("thr") == 5L,
      s"expected the pure split at 5, got ${best.toSeq}")
    // pure split: left is all-positive, right all-negative
    assert(best.head.getAs[Long]("pl") == best.head.getAs[Long]("nl"))
    assert(best.head.getAs[Long]("pr") == 0L)
  }

  test("giniStump score is partition-count invariant") {
    val df = (1 to 500).map(i => (i % 7, (i * 13) % 3 == 0))
      .toDF("f", "b").withColumn("y", col("b").cast("long"))
    val a = Classifier.giniStump(df.repartition(1), col("f"), col("y"))
      .orderBy("thr").collect().toSeq
    val b = Classifier.giniStump(df.repartition(11), col("f"), col("y"))
      .orderBy("thr").collect().toSeq
    assert(a == b)
  }

  test("targetEncode: hand case, leave-one-out means and singleton NULL") {
    val df = Seq(("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 5.0))
      .toDF("k", "v")
    val got = Classifier.targetEncode(df, "k", "v")
      .orderBy("k", "v").collect()
    // a: each row's enc = mean of the other two
    assert(got(0).getAs[Double]("enc") == 25.0) // (20+30)/2
    assert(got(1).getAs[Double]("enc") == 20.0) // (10+30)/2
    assert(got(2).getAs[Double]("enc") == 15.0) // (10+20)/2
    assert(got(3).isNullAt(got(3).fieldIndex("enc"))) // singleton b
  }

  test("topPaths orders events within a session by (ts, event_id)") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    val ev = Seq(
      (1L, t(0), 100L, "view"), (1L, t(1), 101L, "click"),
      (1L, t(2), 102L, "buy"), (1L, t(2), 103L, "error"), // ts tie → id order
      (2L, t(0), 200L, "view"), (2L, t(1), 201L, "click"), (2L, t(2), 202L, "buy"),
      // user 2's second session (gap > 30 min)
      (2L, t(50), 203L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.topPaths(ev, "30 minutes", pathLen = 3, k = 10)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("view>click>buy" -> 2L, "view" -> 1L))
  }

  test("decomposeWeekly recovers an exact weekly pattern with zero residual") {
    // value = 100 + weekday bump, 35 consecutive days: every full
    // centered window sums the same 7 bumps, so trend is constant,
    // season equals the bump (centered), residual is exactly 0
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val bump = (wd: Int) => (wd * 3 - 9).toDouble // mean-0 over 0..6
    val series = (0 until 35).map { i =>
      val d = d0.plusDays(i)
      val wd = ((d.toEpochDay % 7) + 7) % 7
      (java.sql.Date.valueOf(d), 100.0 + bump(wd.toInt))
    }.toDF("d", "v")
    val rows = TimeSeries.decomposeWeekly(series, "d", "v")
      .filter(col("trend").isNotNull).collect()
    assert(rows.length == 35 - 6)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("trend") - 100.0) < 1e-9,
        s"trend ${r.getAs[Double]("trend")} != 100")
      assert(math.abs(r.getAs[Double]("residual")) < 1e-9,
        s"nonzero residual ${r.getAs[Double]("residual")}")
      assert(math.abs(r.getAs[Double]("season")
        - bump(r.getAs[Int]("weekday"))) < 1e-9)
    }
  }

  test("decomposeWeekly: edge rows keep NULL trend, never a biased average") {
    val d0 = java.time.LocalDate.of(2024, 1, 1)
    val series = (0 until 10).map(i =>
      (java.sql.Date.valueOf(d0.plusDays(i)), 5.0)).toDF("d", "v")
    val rows = TimeSeries.decomposeWeekly(series, "d", "v").orderBy("d").collect()
    assert(rows.count(_.isNullAt(rows.head.fieldIndex("trend"))) == 6) // 3 each edge
  }

  test("stationaryDistribution conserves mass on a closed chain") {
    def t(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    // strict 3-cycle a→b→c→a per user: uniform is stationary exactly
    val ev = (0 until 30).map { i =>
      (i / 10L, t(i % 10), i.toLong, Seq("a", "b", "c")(i % 3))
    }.toDF("user_id", "ts", "event_id", "event_type")
    val got = EventOps.stationaryDistribution(ev, "user_id", "event_type",
      "ts", "event_id", iters = 3).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got.keySet == Set("a", "b", "c"))
    assert(math.abs(got.values.sum - 1.0) < 1e-12, s"mass leaked: $got")
    got.values.foreach(p => assert(math.abs(p - 1.0 / 3) < 1e-12, s"$got"))
  }

  test("sourceOverlap counts shared shingles and containment by hand") {
    val shared = "a b c d e f g h" // 4 distinct 5-gram shingles
    val docs = Seq(
      (1L, "s1", shared),
      (2L, "s2", shared + " x y z"),  // s2 ⊇ s1's shingles (7 total)
      (3L, "s3", "p q r s t u v w")) // disjoint
      .toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(docs, "source", "text").collect()
    assert(got.length == 1)
    val r = got.head
    assert(r.getAs[String]("src_a") == "s1" && r.getAs[String]("src_b") == "s2")
    assert(r.getAs[Long]("shared") == 4L && r.getAs[Long]("n_a") == 4L
      && r.getAs[Long]("n_b") == 7L)
    assert(r.getAs[Double]("containment") == 1.0) // s1 fully contained
  }

  test("dd_hierarchical: copies die at stage 1, chimeras lose a paragraph, borrowers lose a line") {
    val dir = "/root/testdata/sf0.001"
    val base = graft.Tables.documents(spark, dir).select("doc_id").collect()
      .map(_.getLong(0))
    val off = base.max + 1
    val out = graft.SparkEntry.queries("dd_hierarchical")(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    // stage 1: every full copy (+off of %5 docs) must be ABSENT — its
    // original has the smaller id and the same doc hash
    val copies = base.filter(_ % 5 == 0).map(_ + off)
    assert(copies.forall(!out.contains(_)), "a full copy survived doc-level dedup")
    // stage 2: every SURVIVING paragraph chimera (+2·off) shares its
    // paragraph 0 with the original, so at least one paragraph is lost
    val chimeras = base.filter(_ % 7 == 0).map(_ + 2 * off).filter(out.contains)
    assert(chimeras.nonEmpty, "no chimera survived to exercise stage 2")
    chimeras.foreach { id =>
      val r = out(id)
      assert(r.getLong(2) < r.getLong(1),
        s"chimera $id kept all ${r.getLong(1)} paragraphs — borrowed para 0 not deduped")
    }
    // stage 3: every SURVIVING line borrower (+3·off) shares line 0 of
    // paragraph 0 with the original, so at least one line is lost
    val borrowers = base.filter(_ % 11 == 0).map(_ + 3 * off).filter(out.contains)
    assert(borrowers.nonEmpty, "no borrower survived to exercise stage 3")
    borrowers.foreach { id =>
      val r = out(id)
      assert(r.getLong(4) < r.getLong(3),
        s"borrower $id kept all ${r.getLong(3)} lines — borrowed line 0 not deduped")
    }
    // the chain removes token mass overall
    assert(out.values.map(_.getLong(6)).sum < out.values.map(_.getLong(5)).sum)
  }

  test("dd_hierarchical equals a driver-side replay of the full three-stage chain") {
    // INDEPENDENT mirror audit (the r15 item-4 discipline applied to
    // this round's own queries): replay doc → paragraph → line dedup
    // from the raw texts in plain Scala collections — java MD5, list
    // slicing, insertion-order maps; no Spark, no SQL — and demand
    // every output column match for every surviving doc.
    val dir = "/root/testdata/sf0.001"
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val base = graft.Tables.documents(spark, dir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val off = base.map(_._1).max + 1
    def toks(t: String): Vector[String] =
      t.split(' ').filter(_.nonEmpty).toVector
    def rebuilt(t: String, take: Int): String = {
      val tk = toks(t); (tk.take(take) ++ tk.drop(take).reverse).mkString(" ")
    }
    val corpus = (base ++
      base.filter(_._1 % 5 == 0).map { case (id, t) => (id + off, t) } ++
      base.filter(_._1 % 7 == 0).map { case (id, t) => (id + 2 * off, rebuilt(t, 32)) } ++
      base.filter(_._1 % 11 == 0).map { case (id, t) => (id + 3 * off, rebuilt(t, 8)) })
      .sortBy(_._1)
    // stage 1: exact doc dedup, keep min id per hash
    val keepDoc = scala.collection.mutable.Map[String, Long]()
    corpus.foreach { case (id, t) =>
      val h = md5hex(toks(t).mkString(" "))
      if (!keepDoc.contains(h)) keepDoc(h) = id
    }
    val d1 = corpus.filter { case (id, t) => keepDoc(md5hex(toks(t).mkString(" "))) == id }
    // stage 2 + 3: first-occurrence keeps in (doc_id, pidx[, lidx]) order
    val seenP = scala.collection.mutable.Set[String]()
    val seenL = scala.collection.mutable.Set[String]()
    // seg mirrors the query's GREATEST(·, 1) clamp: an empty token list
    // segments to exactly ONE empty slice (not zero, not two phantoms)
    def seg(v: Vector[String], n: Int): Vector[Vector[String]] =
      if (v.isEmpty) Vector(Vector.empty) else v.grouped(n).toVector
    val expect = d1.map { case (id, t) =>
      val tk = toks(t)
      val paras = seg(tk, 32)
      val keptP = paras.map(p => seenP.add(md5hex(p.mkString(" "))))
      val lines = paras.zip(keptP).filter(_._2).flatMap(p => seg(p._1, 8))
      val keptL = lines.map(l => seenL.add(md5hex(l.mkString(" "))))
      id -> (paras.size.toLong, keptP.count(identity).toLong,
        lines.size.toLong, keptL.count(identity).toLong,
        tk.size.toLong, lines.zip(keptL).filter(_._2).map(_._1.size.toLong).sum)
    }.toMap
    val out = graft.SparkEntry.queries("dd_hierarchical")(spark, dir).collect()
    assert(out.map(_.getLong(0)).toSet == expect.keySet, "surviving doc sets differ")
    out.foreach { r =>
      val e = expect(r.getLong(0))
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6)) == e, s"doc ${r.getLong(0)}: $r vs $e")
    }
  }

  test("dd_hierarchical_incremental row-for-row equals the batch chain") {
    // the correctness statement of incremental admission: keeper order
    // is ascending (doc_id, pidx, lidx) and every batch id exceeds
    // every base id, so probing the three maintained hash indexes +
    // within-batch first-occurrence must reproduce the full re-dedup
    // EXACTLY — same survivors, same per-doc paragraph/line/token
    // numbers (both queries also share one oracle SQL verbatim)
    val dir = "/root/testdata/sf0.001"
    val batch = graft.SparkEntry.queries("dd_hierarchical")(spark, dir)
      .collect().toSeq
    val inc = graft.SparkEntry.queries("dd_hierarchical_incremental")(spark, dir)
      .collect().toSeq
    assert(inc == batch, "incremental chain diverged from the batch chain")
    assert(batch.nonEmpty)
  }

  test("dd_hierarchical's segmentation expression clamps an empty doc to one empty slice") {
    // the un-clamped form sequence(0, ceil(0/32)-1) = sequence(0, -1)
    // yields [0, -1] — TWO phantom slices — where the DuckDB mirror's
    // range(0, 0) yields none; the GREATEST(·, 1) clamp pins both
    // engines to exactly one empty segment
    val out = spark.sql(
      """SELECT size(transform(
        |  sequence(0, GREATEST(CAST(ceil(size(a) / 32.0) AS INT), 1) - 1),
        |  i -> slice(a, i * 32 + 1, 32))) AS n
        |FROM VALUES (array()), (array('x')), (array_repeat('x', 33)) AS t(a)"""
        .stripMargin).collect().map(_.getInt(0)).toSeq
    assert(out == Seq(1, 1, 2), s"segment counts: $out")
  }

  test("dd_threshold_sweep equals a driver-side all-pairs brute force at every threshold") {
    // INDEPENDENT audit of the within-group + cross-group pair
    // composition (r15 verdict item 4): the query counts within-group
    // pairs analytically (gsize·(gsize−1)/2, J = 1 by set equality)
    // and cross pairs as gsize_a·gsize_b per qualifying rep pair; this
    // replay enumerates EVERY doc pair at the raw corpus grain, set
    // Jaccard per pair, union-find components — no shared formula.
    val dir = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, dir)
      .select(col("doc_id"), graft.ops.TextOps.tokens(col("text")).as("toks"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[String](1)))
      .sortBy(_._1)
    val sets = docs.map { case (id, t) => id -> t.toSet }.toMap
    val nTok = docs.map { case (id, t) => id -> t.length.toLong }.toMap
    val ids = docs.map(_._1)
    val corpusTok = nTok.values.sum
    val out = graft.SparkEntry.queries("dd_threshold_sweep")(spark, dir)
      .orderBy("threshold").collect()
    for (row <- out) {
      val t = row.getDouble(0)
      // brute force: every unordered pair, exact set Jaccard
      val pairs = for {
        i <- ids.indices.iterator; j <- (i + 1 until ids.length).iterator
        a = sets(ids(i)); b = sets(ids(j))
        sh = (a & b).size
        if sh.toDouble / (a.size + b.size - sh) >= t
      } yield (ids(i), ids(j))
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      var nPairs = 0L
      pairs.foreach { case (a, b) =>
        nPairs += 1
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val comps = parent.keys.toSeq.groupBy(find)
      val dupComps = comps.filter(_._2.size >= 2) // union-find only holds touched ids
      val nDupDocs = dupComps.values.map(_.size.toLong).sum
      val nComponents = dupComps.size.toLong
      val toksRemoved = dupComps.values
        .map(members => members.map(nTok).sum - nTok(members.min)).sum
      assert(row.getLong(1) == nPairs, s"t=$t n_pairs: ${row.getLong(1)} vs $nPairs")
      assert(row.getLong(2) == nDupDocs, s"t=$t n_dup_docs: ${row.getLong(2)} vs $nDupDocs")
      assert(row.getLong(3) == nComponents, s"t=$t n_components")
      assert(row.getLong(4) == nDupDocs - nComponents, s"t=$t docs_removed")
      assert(row.getLong(5) == toksRemoved, s"t=$t tokens_removed: ${row.getLong(5)} vs $toksRemoved")
      assert(row.getDouble(6) == toksRemoved.toDouble / corpusTok, s"t=$t pct")
    }
  }
}
