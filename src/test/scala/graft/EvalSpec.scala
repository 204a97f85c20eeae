package graft

import graft.ops.Eval
import org.apache.spark.sql.functions._

/** classificationReport against a hand-computed confusion matrix,
  * including a predicted-only class (NULL precision semantics), a NULL
  * prediction (counts as a false negative for its true class), and a
  * never-predicted label (precision NULL, recall 0). */
class EvalSpec extends SparkSpec {
  import spark.implicits._

  test("classificationReport: per-class tp/fp/fn and P/R/F1, NULL where unmeasurable") {
    val rows = Seq(
      ("en", "en"), ("en", "en"), ("en", "de"), // en: tp=2, fn=1
      ("de", "de"), ("de", "en"),               // de: tp=1, fn=1; en gains fp=1
      ("fr", null),                             // fr: never predicted right
      ("zh", "ja")                              // ja appears only as a prediction
    ).toDF("label", "pred")
    val r = Eval.classificationReport(rows, "label", "pred").collect()
      .map(x => (Option(x.getString(0)), x.getLong(1), x.getLong(2), x.getLong(3),
        x.getLong(4), Option(x.get(5)), Option(x.get(6)), Option(x.get(7))))
      .map(t => t._1.getOrElse("NULL") -> t).toMap
    // en: support 3, tp 2, fp 1 (de mislabeled en), fn 1
    val en = r("en")
    assert((en._2, en._3, en._4, en._5) == (3L, 2L, 1L, 1L))
    assert(en._6.contains(2.0 / 3.0) && en._7.contains(2.0 / 3.0))
    assert(en._8.contains(2.0 / 3.0)) // P = R → F1 = P
    // de: support 2, tp 1, fp 1 (en's miss predicted de), fn 1
    val de = r("de")
    assert((de._2, de._3, de._4, de._5) == (2L, 1L, 1L, 1L))
    // fr: support 1, never predicted → precision NULL, recall 0, f1 NULL
    val fr = r("fr")
    assert((fr._2, fr._3, fr._4) == (1L, 0L, 0L))
    assert(fr._6.isEmpty && fr._7.contains(0.0) && fr._8.isEmpty)
    // ja: prediction-only class → support 0, recall NULL
    val ja = r("ja")
    assert(ja._2 == 0L && ja._4 == 1L && ja._7.isEmpty)
    // NULL prediction is its own class row (it was observed as a pred)
    assert(r.contains("NULL") && r("NULL")._2 == 0L)
    // class set: labels ∪ preds
    assert(r.keySet == Set("en", "de", "fr", "zh", "ja", "NULL"))
  }

  test("bucketAuc: perfect separation → 1.0, all-tied → 0.5, hand case exact") {
    import spark.implicits._
    def auc(rows: Seq[(Long, Long)]): java.lang.Double = {
      val r = Eval.bucketAuc(rows.toDF("y", "b"), "y", "b").head()
      if (r.isNullAt(2)) null else r.getDouble(2)
    }
    // positives strictly above negatives
    assert(auc(Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L))) == 1.0)
    // everything in one bucket: all pairs tie at 1/2
    assert(auc(Seq((0L, 5L), (1L, 5L), (0L, 5L), (1L, 5L))) == 0.5)
    // hand case: neg@1, pos@2, neg@2, pos@3 → pairs (pos2,neg1)=1,
    // (pos2,neg2)=.5, (pos3,neg1)=1, (pos3,neg2)=1 → U=3.5, P·N=4
    assert(auc(Seq((0L, 1L), (1L, 2L), (0L, 2L), (1L, 3L))) == 0.875)
    // degenerate: one class empty → NULL, not a crash or a fake number
    assert(auc(Seq((1L, 1L), (1L, 2L))) == null)
  }

  test("rouge2: clipped bigram overlap, recall/precision/F1 as exact ppm rationals") {
    import spark.implicits._
    // cand "a b a b": bigrams {ab×2, ba×1} (n=3); ref "a b c a b":
    // {ab×2, bc×1, ca×1} (n=4); clipped overlap = min(2,2) = 2
    val pairs = Seq((1L, "a b a b", "a b c a b"), (2L, "", "x y")).toDF("id", "cand", "ref")
    val out = Eval.rouge2(pairs, "id", "cand", "ref").orderBy("id").collect()
    val r1 = out.head
    assert((r1.getLong(1), r1.getLong(2), r1.getLong(3)) == ((3L, 4L, 2L)))
    assert(r1.getLong(4) == 500000L, "recall = 2/4")
    assert(r1.getLong(5) == 666666L, "precision = 2/3 truncated")
    assert(r1.getLong(6) == 2L * 2 * 1000000 / 7, "F1 = 2·o/(nc+nr)")
    // empty candidate: zero counts, NULL precision/F1 guarded
    val r2 = out.last
    assert(r2.getLong(1) == 0L && r2.getLong(3) == 0L)
    assert(r2.isNullAt(5), "precision NULL on empty candidate")
    assert(r2.getLong(4) == 0L, "recall 0 against a real reference")
  }

  test("q_welch_ttest equals a BigInt/Double replay of the Welch formulas") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.Tables.lineitem(spark, dir)
      .selectExpr("l_returnflag AS f",
        "CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS qc")
      .filter(col("f").isin("A", "N"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    def stats(fl: String) = {
      val xs = li.filter(_._1 == fl).map(_._2)
      val n = xs.length.toLong
      val s = xs.sum
      val ssq = xs.map(x => x * x).sum
      val va = (BigInt(ssq) * n - BigInt(s) * s).toDouble / n.toDouble / (n - 1).toDouble
      (n, s, va)
    }
    val (na, sa, va) = stats("A"); val (nb, sb, vb) = stats("N")
    val dm = sa.toDouble / na.toDouble - sb.toDouble / nb.toDouble
    val (sea, seb) = (va / na.toDouble, vb / nb.toDouble)
    val wantT = dm / math.sqrt(sea + seb)
    val wantDf = (sea + seb) * (sea + seb) /
      (sea * sea / (na - 1).toDouble + seb * seb / (nb - 1).toDouble)
    val row = graft.SparkEntry.queries("q_welch_ttest")(spark, dir).collect().head
    assert(row.getLong(0) == na && row.getLong(1) == nb)
    assert(math.abs(row.getDouble(4) - wantT) < 1e-12, s"t: ${row.getDouble(4)} vs $wantT")
    assert(math.abs(row.getDouble(5) - wantDf) < 1e-9, s"df: ${row.getDouble(5)} vs $wantDf")
  }

  test("welchTTest NULL-gates an n <= 1 arm (the audit-proven x/0 hazard class)") {
    import spark.implicits._
    // arm A has a single sample: its sample variance divides by n−1 = 0,
    // which Spark folds to NULL while DuckDB reads +inf — the exact
    // divergence the r16 audit fixed in ev_ab_exposure. The guard must
    // surface t_stat/df_welch as NULL, never ±Inf/NaN.
    val df = Seq(("A", 100L), ("N", 90L), ("N", 110L), ("N", 95L))
      .toDF("f", "qc")
    val r = graft.ops.Eval.welchTTest(df, "f", "qc", "A", "N").collect().head
    assert(r.getLong(0) == 1L && r.getLong(1) == 3L)
    assert(math.abs(r.getDouble(2) - 1.0) < 1e-12, "mean_a = 100 cents = 1.0")
    assert(r.isNullAt(4), "t_stat must be NULL when an arm has n <= 1")
    assert(r.isNullAt(5), "df_welch must be NULL when an arm has n <= 1")
    // both arms healthy: the same call produces finite statistics
    val ok = graft.ops.Eval.welchTTest(
      df.unionByName(Seq(("A", 120L)).toDF("f", "qc")), "f", "qc", "A", "N")
      .collect().head
    assert(!ok.isNullAt(4) && !java.lang.Double.isNaN(ok.getDouble(4)))
    assert(!ok.isNullAt(5) && !java.lang.Double.isNaN(ok.getDouble(5)))
  }

  test("apRecallAtK: hand-computed AP; no-relevant query NULL-gates") {
    import spark.implicits._
    val rows = Seq(
      (1L, 1L, 9.0, 1L), (1L, 2L, 8.0, 0L), (1L, 3L, 7.0, 1L), (1L, 4L, 6.0, 0L),
      (2L, 1L, 9.0, 0L), (2L, 2L, 8.0, 0L))
      .toDF("q", "cand", "score", "rel")
    val out = Eval.apRecallAtK(rows, "q", "score", "cand", "rel", k = 10)
      .orderBy("q").collect()
    // q1: relevant hits at ranks 1 (rc=1) and 3 (rc=2):
    // AP = (floor(1e6*1/1) + floor(1e6*2/3)) div min(2,10)
    assert(out(0).getLong(1) == 2L && out(0).getLong(2) == 2L)
    assert(out(0).getLong(3) == (1000000L + 2000000L / 3L) / 2L)
    assert(out(0).getLong(4) == 1000000L)
    assert(out(1).getLong(1) == 0L && out(1).isNullAt(3) && out(1).isNullAt(4),
      "zero relevant: NULL, never 0/0")
  }

  test("apRecallAtK rewards early placement at equal recall") {
    import spark.implicits._
    def run(scoreOf: Long => Double) = {
      val rows = (1L to 10L).map(c => (1L, c, scoreOf(c), if (c <= 2) 1L else 0L))
      Eval.apRecallAtK(rows.toDF("q", "cand", "score", "rel"),
        "q", "score", "cand", "rel", k = 10).head()
    }
    val early = run(c => 100.0 - c)      // relevant docs land at ranks 1, 2
    val late = run(c => c.toDouble)      // relevant docs land at ranks 9, 10
    assert(early.getLong(4) == late.getLong(4), "same recall either way")
    assert(early.getLong(3) > late.getLong(3),
      "AP must separate early from late placement")
  }

  test("cohenKappa: hand-computed 2x2 example; negative kappa truncates toward zero") {
    import spark.implicits._
    // classic: po=0.7, pe=0.5, kappa=0.4 exactly
    val pairs = Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Eval.cohenKappa(pairs.toDF("a", "b"), "a", "b").head()
    assert(out.getLong(0) == 50L && out.getLong(1) == 35L)
    assert(out.getLong(2) == 700000L && out.getLong(3) == 500000L)
    assert(out.getLong(4) == 400000L)
    // worse-than-chance with a non-divisible ratio: -100e6/140 must
    // TRUNCATE to -714285 (a floor would give -714286 - the engine
    // divergence class the CASE exists for)
    val neg = Seq.fill(10)(("y", "n")) ++ Seq.fill(5)(("n", "y")) ++
      Seq.fill(1)(("n", "n"))
    val o2 = Eval.cohenKappa(neg.toDF("a", "b"), "a", "b").head()
    assert(o2.getLong(4) == -714285L)
  }
}
