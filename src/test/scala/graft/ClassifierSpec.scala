package graft

import graft.ops.{Classifier, TextOps}
import org.apache.spark.sql.functions._

/** Model-checks the in-engine classifiers against independent
  * driver-side reimplementations of the same integer recurrences
  * (the ModelCheckSpec pattern: two code paths, one exact answer). */
class ClassifierSpec extends SparkSpec {

  private val texts = Seq(
    "the cat sat on the mat and the dog",          // stopword-dense  → +1
    "alpha beta gamma delta epsilon zeta eta",     // no stopwords    → -1
    "a small step of the long march to victory",   // stopword-dense  → +1
    "quantum flux capacitor overload sequence",    // no stopwords    → -1
    "in the beginning is the word and the word",   // stopword-dense  → +1
    "xylophone zebra quartz jackdaw vex nymph")    // no stopwords    → -1

  private def docs = {
    import spark.implicits._
    texts.toDF("text")
  }

  // -------- driver-side replicate of features / labels --------

  private def bucketRef(t: String): Int = {
    val md = java.security.MessageDigest.getInstance("MD5")
      .digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(md.take(12), 16) % Classifier.Dim).toInt
  }

  private def featRef(text: String): Array[Long] = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val x = Array.fill(Classifier.Dim + 1)(0L); x(0) = 1L
    toks.foreach(t => x(1 + bucketRef(t)) += 1L)
    x
  }

  private def labelRef(text: String): Long = {
    val toks = text.split(" ").filter(_.nonEmpty)
    val nstop = toks.count(TextOps.Stopwords.contains)
    if (toks.nonEmpty && 16 * nstop >= toks.length) 1L else -1L
  }

  test("features mirror the md5-bucket reference; counts sum to token count") {
    val rows = docs.select(col("text"), Classifier.features(col("text")).as("x")).collect()
    for (r <- rows) {
      val got = r.getSeq[Long](1)
      val want = featRef(r.getString(0)).toSeq
      assert(got == want, s"features mismatch for '${r.getString(0)}'")
      assert(got.tail.sum == r.getString(0).split(" ").count(_.nonEmpty))
    }
  }

  test("qualityLabel: empty text is -1; stopword-dense text is +1") {
    import spark.implicits._
    val r = Seq("", "the a of", "xyzzy plugh").toDF("text")
      .select(Classifier.qualityLabel(col("text"))).collect().map(_.getLong(0)).toSeq
    assert(r == Seq(-1L, 1L, -1L))
  }

  test("trainPerceptron matches the driver-side batch recurrence exactly") {
    val labeled = texts.map(t => (labelRef(t), featRef(t)))
    val n = Classifier.Dim + 1
    var w = Array.fill(n)(0L)
    val wantTraj = (1 to 3).map { _ =>
      val mis = labeled.filter { case (y, x) =>
        y * (0 until n).map(j => w(j) * x(j)).sum <= 0 }
      val delta = Array.tabulate(n)(j => mis.map { case (y, x) => y * x(j) }.sum)
      w = Array.tabulate(n)(j => w(j) + delta(j))
      (mis.size.toLong, w.toSeq)
    }
    val got = Classifier.trainPerceptron(docs, "text",
      Classifier.qualityLabel(col("text")), 3)
    assert(got.map(e => (e.nMis, e.weights.toSeq)) == wantTraj)
  }

  test("centroidModel + centroidConfusion match the driver-side exact rational rule") {
    val labeled = texts.map(t => (labelRef(t), featRef(t).drop(1))) // no bias slot
    val pos = labeled.filter(_._1 == 1L).map(_._2)
    val neg = labeled.filter(_._1 == -1L).map(_._2)
    val (np, nn) = (pos.size.toLong, neg.size.toLong)
    val wantW = Array.tabulate(Classifier.Dim)(j =>
      nn * pos.map(_(j)).sum - np * neg.map(_(j)).sum)
    val m = Classifier.centroidModel(docs, "text", Classifier.qualityLabel(col("text")))
    assert(m.w.toSeq == wantW.toSeq && m.nPos == np && m.nNeg == nn)

    def score(x: Array[Long]) = BigInt((0 until Classifier.Dim).map(j => wantW(j) * x(j)).sum)
    val sPos = pos.map(score).sum
    val sNeg = neg.map(score).sum
    assert(m.lhsScale == BigInt(2) * np * nn && m.rhs == BigInt(nn) * sPos + BigInt(np) * sNeg)
    val wantConf = labeled.groupBy { case (y, x) =>
      (y, if (m.lhsScale * score(x) > m.rhs) 1L else -1L)
    }.map { case (k, g) => (k._1, k._2, g.size.toLong) }.toSet
    val gotConf = Classifier.centroidConfusion(docs, "text",
      Classifier.qualityLabel(col("text")), m)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotConf == wantConf)
  }

  test("centroidModel refuses a single-class corpus") {
    import spark.implicits._
    val oneClass = Seq("alpha beta", "gamma delta").toDF("text")
    intercept[IllegalArgumentException] {
      Classifier.centroidModel(oneClass, "text", Classifier.qualityLabel(col("text")))
    }
  }

  test("naiveBayes recovers an obvious vocabulary split and self-classifies") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha alpha beta", "a"), (2L, "alpha beta beta alpha", "a"),
      (3L, "gamma delta gamma", "b"), (4L, "delta delta gamma", "b"),
      (5L, "alpha beta alpha", "a"), (6L, "gamma gamma delta", "b")
    ).toDF("doc_id", "text", "lang")
    val out = Classifier.naiveBayes(docs, "doc_id", "text", "lang")
      .orderBy("doc_id").collect()
    assert(out.length == 6)
    assert(out.forall(r => r.getAs[String]("pred_lab") == r.getAs[String]("true_lab")),
      s"disjoint vocabularies must self-classify: ${out.mkString(", ")}")
    // reference class 'a' scores exactly prior-odds-adjusted 1-products
    // relative to itself; class scores are strictly ordered (no tie on
    // separable data)
    assert(out.map(_.getAs[Double]("score")).forall(s => s > 0.0 && !s.isNaN))
  }

  test("naiveBayes is invariant to input partitioning") {
    import spark.implicits._
    val docs = Seq(
      (1L, "x y z x", "p"), (2L, "y y z", "p"), (3L, "u v u", "q"),
      (4L, "v v u w", "q"), (5L, "x z z", "p"), (6L, "w u v", "q")
    ).toDF("doc_id", "text", "lang")
    val a = Classifier.naiveBayes(docs.repartition(1), "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    val b = Classifier.naiveBayes(docs.repartition(7), "doc_id", "text", "lang")
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(2), r.getDouble(3)))
    assert(a.toSeq == b.toSeq, "scores must be bit-identical at any parallelism")
  }

  test("targetEncodeOof: flipping one fold's labels never moves that fold's encodings") {
    import spark.implicits._
    val rows = for (i <- 0L until 60L)
      yield (if (i % 3 == 0) "a" else "b", i % 4, if ((i * 7) % 5 < 2) 1L else 0L)
    val df = rows.toDF("k", "fold", "y")
    def enc(d: org.apache.spark.sql.DataFrame) =
      Classifier.targetEncodeOof(d, "k", "fold", "y", m = 10)
        .collect()
        .map(r => ((r.getString(0), r.getLong(1)),
          (r.getLong(2), r.getLong(3), r.getAs[Any]("enc")))).toMap
    val base = enc(df)
    val flipped = enc(df.withColumn("y",
      when(col("fold") === 2L, lit(1L) - col("y")).otherwise(col("y"))))
    assert(base.keySet == flipped.keySet)
    base.keySet.filter(_._2 == 2L).foreach { k =>
      assert(base(k) == flipped(k), s"fold-2 encoding $k moved: leakage")
    }
    assert(base.keySet.filter(_._2 != 2L).exists(k => base(k) != flipped(k)),
      "other folds see the flip (sanity: the test isn't vacuous)")
  }

  test("targetEncodeOof: hand replay of the m-estimate; single-fold prior NULL-gates") {
    import spark.implicits._
    val rows = Seq(("a", 0L, 1L), ("a", 0L, 0L), ("a", 1L, 1L),
      ("b", 0L, 0L), ("b", 1L, 1L), ("b", 1L, 1L))
    val out = Classifier.targetEncodeOof(rows.toDF("k", "fold", "y"),
      "k", "fold", "y", m = 2)
      .orderBy("k", "fold").collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    def replay(k: String, f: Long) = {
      val nk = rows.count(_._1 == k).toLong
      val sk = rows.filter(_._1 == k).map(_._3).sum
      val nkf = rows.count(r => r._1 == k && r._2 == f).toLong
      val skf = rows.filter(r => r._1 == k && r._2 == f).map(_._3).sum
      val n0 = rows.size.toLong
      val s0 = rows.map(_._3).sum
      val nf = rows.count(_._2 == f).toLong
      val sf = rows.filter(_._2 == f).map(_._3).sum
      ((nk - nkf, sk - skf),
        ((sk - skf).toDouble + 2.0 * ((s0 - sf).toDouble / (n0 - nf).toDouble))
          / (nk - nkf + 2L).toDouble)
    }
    out.keys.foreach { case (k, f) =>
      val ((nOof, sOof), e) = replay(k, f)
      assert(out((k, f)) == ((nOof, sOof, e)), s"cell ($k,$f)")
    }
    val one = Classifier.targetEncodeOof(
      Seq(("a", 0L, 1L), ("b", 0L, 0L)).toDF("k", "fold", "y"),
      "k", "fold", "y", m = 2)
    assert(one.collect().forall(_.isNullAt(4)),
      "a fold holding all rows has no out-of-fold prior: NULL, not x/0")
  }
}
