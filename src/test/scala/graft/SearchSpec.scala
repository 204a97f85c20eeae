package graft

import graft.ops.{Search, TextOps}
import org.apache.spark.sql.functions._

/** BM25 retrieval + bigram-LM scoring semantics on tiny corpora. */
class SearchSpec extends SparkSpec {

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "hash join hash join hash"), // tf(hash)=3, dl=5
      (2L, "hash scan scan scan scan"), // tf(hash)=1, dl=5
      (3L, "sort sort sort sort sort"), // no match
      (4L, "hash")                      // tf=1, dl=1 (short doc boost)
    ).toDF("doc_id", "text")
  }

  test("bm25 ranks higher-tf docs first and never returns non-matching docs") {
    import spark.implicits._
    val qt = Seq((1L, "hash")).toDF("q_id", "term")
    val out = Search.bm25(corpus, "doc_id", "text", qt, k = 10)
      .orderBy("rank").collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(3L), "doc without the term must not appear")
    assert(ids.length == 3)
    // doc 4 (tf=1 but dl=1 ≪ avgdl) outranks doc 2 (tf=1, dl=5);
    // doc 1 (tf=3) beats both
    assert(ids.head == 1L)
    assert(ids.indexOf(4L) < ids.indexOf(2L),
      s"length normalization must boost the short doc: $ids")
    // ranks are 1..n and scores non-increasing
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
    val scores = out.map(_.getAs[Long]("score_pts")).toSeq
    assert(scores == scores.sorted.reverse)
  }

  test("bm25 multi-term scores add per-term points; ties break to smaller doc_id") {
    import spark.implicits._
    val docs = Seq((10L, "a b"), (7L, "a b")).toDF("doc_id", "text")
    val qt = Seq((1L, "a"), (1L, "b")).toDF("q_id", "term")
    val out = Search.bm25(docs, "doc_id", "text", qt, k = 10)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("doc_id")).toSeq == Seq(7L, 10L),
      "identical scores must rank the smaller doc_id first")
    assert(out.map(_.getAs[Long]("score_pts")).distinct.length == 1)
  }

  test("bigramsOf guard: 0- and 1-token texts yield empty arrays, not descending sequences") {
    import spark.implicits._
    val out = Seq("", "one", "a b c").toDF("text")
      .select(TextOps.bigramsOf(TextOps.tokens(col("text"))).as("bg"))
      .collect().map(_.getSeq[String](0).toList).toList
    assert(out == List(Nil, Nil, List("a b", "b c")))
  }

  test("bigramLmScore: common-bigram docs outscore novel-bigram docs; counts exact") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y x y x y"),  // bigrams all from the dominant pattern
      (2L, "y x q z"),      // novel pairs
      (3L, "x y x y x y")
    ).toDF("doc_id", "text")
    val out = TextOps.bigramLmScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Long]("n_bigrams")).toSeq == Seq(5L, 3L, 5L))
    val avg = out.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("avg_pts")).toMap
    assert(avg(1L) == avg(3L), "identical docs must score identically")
    assert(avg(1L) > avg(2L), s"corpus-typical doc must outscore novel doc: $avg")
    // per-doc totals are exact integer micro-point sums
    val pts = out.map(r => (r.getAs[Long]("pts_total"), r.getAs[Long]("n_bigrams")))
    pts.foreach { case (tot, n) => assert(tot >= 0 && tot <= n * 1000000L) }
  }

  test("kneserNeyScore: hand-computed exact-rational micro points") {
    import spark.implicits._
    // corpus: "a b a b" + "a c". c1 is the BIGRAM-PREFIX count
    // Σ_w c(w1·w): c1(a)=3, c1(b)=1 (NOT unigram freq — the doc-final
    // "b" starts no bigram); c2("a b")=2, c2("b a")=1, c2("a c")=1;
    // distinct bigrams N22=3;
    // continuation: N1+(a·)=2 {b,c}, N1+(b·)=1 {a};
    //               N1+(·b)=1 {a}, N1+(·a)=1 {b}, N1+(·c)=1 {a}.
    // P(b|a) = [(4·2−3)·3 + 3·2·1] / (4·3·3) = 21/36 -> 583333 μpts
    // P(a|b) = [1·3 + 3·1·1] / (4·1·3)      =  6/12 -> 500000
    // P(c|a) = [1·3 + 3·2·1] / (4·3·3)      =  9/36 -> 250000
    // KN identity check per context a: observed (21+9)/36 = 5/6 plus
    // the unscored backoff to unseen w2 (D·N1f/c1 · Pcont(a) =
    // 1/2 · 1/3 = 1/6) is exactly 1.
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val out = TextOps.kneserNeyScore(docs, "doc_id", "text")
      .orderBy("doc_id").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_bigrams"),
        r.getAs[Long]("pts_total"), r.getAs[Double]("avg_pts")))
    assert(out(0) == ((1L, 3L, 583333L + 500000L + 583333L, 1666666.0 / 3.0)),
      s"doc 1: ${out(0)}")
    assert(out(1) == ((2L, 1L, 250000L, 250000.0)), s"doc 2: ${out(1)}")
    // the San Francisco property: a frequent word with ONE context gets
    // less backoff mass than a rarer word with many contexts
    val sf = (Seq((10L, "new york"), (11L, "san francisco"), (12L, "san francisco")) ++
      (0 until 8).map(i => (20L + i, s"francisco w$i end played end played end"))
    ).toDF("doc_id", "text")
    // "francisco" is frequent (10 occurrences) but only ever follows
    // "san" or starts docs; its continuation count stays 1
    val probe = TextOps.kneserNeyScore(sf, "doc_id", "text").collect()
    assert(probe.nonEmpty)
  }

  test("phraseSearch: adjacency required, overlaps counted, absences excluded") {
    import spark.implicits._
    val docs = Seq(
      (1L, "quick brown fox jumps"),        // phrase once
      (2L, "quick red brown fox"),          // terms present, not adjacent
      (3L, "quick brown quick brown fox"),  // phrase once + prefix repeat
      (4L, "a a a a"),                      // overlapping self-phrase
      (5L, "nothing relevant here")).toDF("doc_id", "text")
    val two = Search.phraseSearch(docs, "doc_id", "text", Seq("quick", "brown"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 2 has both terms but never adjacent -> absent, not zero
    assert(two == Map(1L -> 1L, 3L -> 2L))
    val three = Search.phraseSearch(docs, "doc_id", "text",
      Seq("quick", "brown", "fox")).collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(three == Map(1L -> 1L, 3L -> 1L))
    val overlap = Search.phraseSearch(docs, "doc_id", "text", Seq("a", "a"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(overlap == Map(4L -> 3L)) // positions 1-2, 2-3, 3-4
    val single = Search.phraseSearch(docs, "doc_id", "text", Seq("quick"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(single == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
    intercept[IllegalArgumentException] {
      Search.phraseSearch(docs, "doc_id", "text", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Search.phraseSearch(docs, "doc_id", "text", Seq("two words"))
    }
  }

  test("tfidfCosine: proportional doc scores ~1, partial match scores below, non-match absent") {
    import spark.implicits._
    val docs = Seq((1L, "a b"), (2L, "a a b b"), (3L, "a c c c"),
      (4L, "d d d")).toDF("doc_id", "text")
    val qt = Seq((1L, "a", 1L), (1L, "b", 1L)).toDF("q_id", "term", "qtf")
    val out = Search.tfidfCosine(docs, "doc_id", "text", qt, k = 10)
      .orderBy("rank").collect()
    val ids = out.map(_.getAs[Long]("doc_id")).toSeq
    assert(!ids.contains(4L), "doc sharing no query term must not appear")
    assert(ids.length == 3 && ids.last == 3L,
      s"partial-term doc must rank below proportional docs: $ids")
    // docs 1 and 2 are scalar multiples of the query vector -> cos = 1
    // up to sqrt rounding; doc 3 is far off
    out.take(2).foreach(r => assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12))
    assert(out.last.getAs[Double]("cos") < 0.5)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L))
  }

  test("search_mrr: the planted duplicate ranks right behind its identical self") {
    val out = graft.SparkEntry.queries("search_mrr")(spark, "/root/testdata/sf0.001")
      .collect()
    assert(out.length == 10 && out.map(_.getLong(0)).toSeq == (0L until 50L by 5))
    out.foreach { r =>
      if (r.isNullAt(1)) assert(r.getLong(2) == 0L)
      else assert(r.getLong(2) == 1000000L / r.getLong(1), "rr must be the exact rational")
    }
    // identical text ⇒ identical BM25 score ⇒ the source wins the id
    // tiebreak and the known-relevant copy sits at rank 2
    assert(out.count(r => !r.isNullAt(1) && r.getLong(1) == 2L) >= 8,
      s"copy retrieval collapsed: ${out.map(r => if (r.isNullAt(1)) -1 else r.getLong(1)).toSeq}")
  }

  test("eval_retrieval_slices: rerank + slicing equal a driver-side replay over the stage-1 candidates") {
    // Independent audit of the NEW logic in the harness (the stage-1
    // BM25 engine is covered by its own hand-case specs): recompute
    // the pairwise BIGRAM-Jaccard rerank, tie order, slice assignment,
    // and the found@10 / MRR@10 integer aggregation in plain Scala
    // from the raw texts, and demand the query's three slice rows
    // match. Bigram sets (not unigram): the r17 scorer fix — unigrams
    // tie at J = 1.0 on the saturated-vocabulary `long` slice.
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val base = graft.Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val off = base.map(_._1).max + 1
    def bigramsOf(t: String): Set[String] = {
      val tk = t.split(' ').filter(_.nonEmpty)
      if (tk.length < 2) Set.empty
      else tk.sliding(2).map(_.mkString(" ")).toSet
    }
    val texts = (base ++ base.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + off, t) })
      .map { case (id, t) => id -> bigramsOf(t) }.toMap
    // stage-1 candidates exactly as the query builds them (bigram
    // corpus, 4 most-distinctive terms, k = 50)
    val bigramText = array_join(transform(
      graft.ops.TextOps.bigramsOf(graft.ops.TextOps.tokens(col("text"))),
      g => translate(g, " ", "_")), " ")
    val corpus = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      .select(col("doc_id"), bigramText.as("text"))
    val (tf, dl) = graft.ops.Search.indexBatch(corpus, "doc_id", "text")
    val docTok = tf.select(col("doc_id"), col("term"))
    val dfr = docTok.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("term"))
    val qt = docTok.filter(col("doc_id") % 5 === 0 && col("doc_id") < 150)
      .join(broadcast(dfr), Seq("term"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("doc_id").as("q_id"), col("term"))
    val stage1 = graft.ops.Search.bm25FromIndex(tf, dl, qt, k = 50)
      .select("q_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // driver replay: rerank by exact integer ppm Jaccard, (score desc, id)
    val byQ = stage1.groupBy(_._1)
    val qids = base.map(_._1).filter(id => id % 5 == 0 && id < 150)
    val expect = qids.map { q =>
      val cands = byQ.getOrElse(q, Array.empty)
      val rank1 = cands.find(c => c._3 == q + off && c._2 <= 10).map(_._2)
      val qs = texts(q)
      val reranked = cands.map { case (_, _, d) =>
        val cs = texts(d); val inter = (qs & cs).size.toLong
        (d, inter * 1000000L / math.max(qs.size + cs.size - inter, 1L))
      }.sortBy { case (d, s) => (-s, d) }
      val rank2 = reranked.zipWithIndex
        .find { case ((d, _), _) => d == q + off }
        .map(_._2 + 1L).filter(_ <= 10)
      val nTok = base.find(_._1 == q).get._2.split(' ').count(_.nonEmpty)
      val slice = if (nTok < 40) "short" else if (nTok < 70) "medium" else "long"
      (slice, rank1, rank2)
    }
    val want = expect.groupBy(_._1).map { case (slice, rows) =>
      slice -> (rows.length.toLong,
        rows.count(_._2.isDefined).toLong,
        rows.map(_._2.map(1000000L / _).getOrElse(0L)).sum / rows.length,
        rows.count(_._3.isDefined).toLong,
        rows.map(_._3.map(1000000L / _).getOrElse(0L)).sum / rows.length)
    }
    val got = graft.SparkEntry.queries("eval_retrieval_slices")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // the r16-surfaced defect stays fixed: the bigram reranker must
    // never lose ground to stage 1 on ANY slice — in particular the
    // `long` slice, where the unigram scorer measured 500000 → 423280
    // ppm (saturated-vocabulary J = 1.0 ties demoting the copy)
    got.foreach { case (slice, (_, _, mrr1, _, mrr2)) =>
      assert(mrr2 >= mrr1,
        s"$slice slice: reranked MRR $mrr2 fell below stage-1 MRR $mrr1")
    }
    assert(got("long")._5 >= 500000L,
      s"long slice must put the planted copy back at rank <= 2, got ${got("long")._5} ppm")
  }

  test("eval_rerank_positional equals a driver-side replay over the stage-1 candidates") {
    // same audit shape as the slices replay, for the POSITIONAL
    // scorer: recompute per-pair positional agreement (matches at
    // index i over max length), tie order, slices, and the integer
    // metrics in plain Scala, and demand the query's rows match
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val base = graft.Tables.documents(spark, dir).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val off = base.map(_._1).max + 1
    val toks = (base ++ base.filter(_._1 % 5 == 0)
      .map { case (id, t) => (id + off, t) })
      .map { case (id, t) => id -> t.split(' ').filter(_.nonEmpty).toVector }.toMap
    def posPpm(q: Vector[String], c: Vector[String]): Long = {
      val matches = (0 until math.min(q.length, c.length))
        .count(i => q(i) == c(i)).toLong
      matches * 1000000L / math.max(math.max(q.length, c.length), 1).toLong
    }
    // stage-1 candidates exactly as the harness builds them
    val bigramText = array_join(transform(
      graft.ops.TextOps.bigramsOf(graft.ops.TextOps.tokens(col("text"))),
      g => translate(g, " ", "_")), " ")
    val corpus = graft.Tables.documents(spark, dir).select(col("doc_id"), col("text"))
      .unionByName(graft.Tables.documents(spark, dir)
        .filter(col("doc_id") % 5 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text")))
      .select(col("doc_id"), bigramText.as("text"))
    val (tf, dl) = graft.ops.Search.indexBatch(corpus, "doc_id", "text")
    val docTok = tf.select(col("doc_id"), col("term"))
    val dfr = docTok.groupBy("term").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("term"))
    val qt = docTok.filter(col("doc_id") % 5 === 0 && col("doc_id") < 150)
      .join(broadcast(dfr), Seq("term"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 4)
      .select(col("doc_id").as("q_id"), col("term"))
    val stage1 = graft.ops.Search.bm25FromIndex(tf, dl, qt, k = 50)
      .select("q_id", "rank", "doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = stage1.groupBy(_._1)
    val qids = base.map(_._1).filter(id => id % 5 == 0 && id < 150)
    val expect = qids.map { q =>
      val cands = byQ.getOrElse(q, Array.empty)
      val rank1 = cands.find(c => c._3 == q + off && c._2 <= 10).map(_._2)
      val reranked = cands.map { case (_, _, d) => (d, posPpm(toks(q), toks(d))) }
        .sortBy { case (d, s) => (-s, d) }
      val rank2 = reranked.zipWithIndex
        .find { case ((d, _), _) => d == q + off }
        .map(_._2 + 1L).filter(_ <= 10)
      val nTok = toks(q).length
      val slice = if (nTok < 40) "short" else if (nTok < 70) "medium" else "long"
      (slice, rank1, rank2)
    }
    val want = expect.groupBy(_._1).map { case (slice, rows) =>
      slice -> (rows.length.toLong,
        rows.count(_._2.isDefined).toLong,
        rows.map(_._2.map(1000000L / _).getOrElse(0L)).sum / rows.length,
        rows.count(_._3.isDefined).toLong,
        rows.map(_._3.map(1000000L / _).getOrElse(0L)).sum / rows.length)
    }
    val got = graft.SparkEntry.queries("eval_rerank_positional")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got == want, s"\ngot:  $got\nwant: $want")
    // order sensitivity is the operator's point: the positional
    // reranker must hold every slice at-or-above stage 1, long included
    got.foreach { case (slice, (_, _, mrr1, _, mrrPos)) =>
      assert(mrrPos >= mrr1, s"$slice: positional MRR $mrrPos below stage-1 $mrr1")
    }
  }

  test("search_highlight equals a brute-force best-window replay on the driver corpus") {
    val W = 10
    val terms = Set("join", "merge", "hash")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val want = docs.flatMap { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      val hits = toks.zipWithIndex.collect { case (t, i) if terms(t) => i }
      if (hits.isEmpty) None
      else {
        // window anchored at each hit (the query's frame): hits in [p, p+W-1]
        val best = hits.map(p => (p, hits.count(h => h >= p && h < p + W)))
          .maxBy { case (p, n) => (n, -p) }
        Some((id, best._1.toLong, best._2.toLong,
          toks.slice(best._1, best._1 + W).mkString(" ")))
      }
    }.sortBy(_._1)
    val got = graft.SparkEntry.queries("search_highlight")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("pseudo-relevance expansion picks the heaviest non-query terms and breaks stage-1 ties") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // hand-checkable corpus: docs 1-3 tie exactly on the query term
    val docs = Seq(
      (1L, "apple banana cherry"), (2L, "apple banana date"),
      (3L, "apple elder fig"), (4L, "grape happy iris"))
      .toDF("doc_id", "text")
    val qt = Seq((1L, "apple")).toDF("q_id", "term")
    val (tf, dl) = Search.indexBatch(docs, "doc_id", "text")
    val s1 = Search.bm25FromIndex(tf, dl, qt, k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(s1.map(_._1).toSeq == Seq(1L, 2L, 3L), "stage 1: the apple docs, id order")
    assert(s1.map(_._2).distinct.size == 1, "stage 1 scores tie exactly")
    // expansion weights: every non-query term weighs tf*idfm = 4000 here,
    // so the pick is the lexicographic top-3: banana, cherry, date
    val nDocs = dl.count()
    val dfr = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val wts = Search.bm25FromIndex(tf, dl, qt, k = 5)
      .select(col("q_id"), col("doc_id"))
      .join(tf, Seq("doc_id")).join(dfr, Seq("term"))
      .select(col("q_id"), col("term"),
        (col("tf") * expr(s"($nDocs * 1000) div df")).as("w0"))
      .groupBy("q_id", "term").agg(sum("w0").as("w"))
      .join(qt, Seq("q_id", "term"), "left_anti")
    val exps = wts.withColumn("rn",
      row_number().over(Window.partitionBy("q_id").orderBy(col("w").desc, col("term"))))
      .filter(col("rn") <= 3).select("q_id", "term")
    assert(exps.orderBy("term").collect().map(_.getString(1)).toSeq ==
      Seq("banana", "cherry", "date"))
    assert(wts.collect().map(_.getLong(2)).forall(_ == 4000L),
      "hand check: every candidate term weighs Sum(tf)*idfm = 4000 on this corpus")
    // stage 2: the expanded query separates the stage-1 tie
    val s2 = Search.bm25FromIndex(tf, dl, qt.unionByName(exps), k = 5)
      .collect().map(r => (r.getLong(2), r.getLong(3)))
    assert(s2.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(s2(0)._2 > s2(2)._2, "expansion separates what stage 1 tied")
  }
}
