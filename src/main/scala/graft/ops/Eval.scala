package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Model-evaluation aggregates over prediction/label columns — the
 * measurement half of every curation classifier in this library
 * (language ID, quality filters, dedup verdicts): before a heuristic
 * gates a 100 TB corpus, its per-class precision/recall against a
 * labeled sample is the go/no-go number.
 *
 * Scale shape: everything derives from the CONFUSION MATRIX, which is
 * ONE keyed aggregate `(label, pred) → count` with map-side partials —
 * output cardinality is |classes|², independent of corpus size; the
 * per-class rollups and joins that follow touch only that tiny matrix.
 * No collect, no per-row UDF.
 *
 * Determinism: all counts are exact integers; precision/recall are one
 * correctly-rounded double division each and F1 is the same fixed
 * `2pr/(p+r)` expression in both engines — oracle-hashable with zero
 * tolerance. Zero denominators yield NULL (unmeasurable), never 0.0 or
 * ±Inf: a class with no predictions has UNDEFINED precision, and
 * folding that to 0 would misread "never predicted" as "always wrong".
 */
object Eval {

  /** Per-class classification report: one row per class (union of
    * observed labels and observed predictions), with `support` (label
    * count), `tp`/`fp`/`fn`, `precision`, `recall`, `f1`. NULL labels
    * or predictions are their own class only if present (they join via
    * null-safe keys — a NULL prediction is a real model output and
    * must count as a false negative for the true class). */
  def classificationReport(df: DataFrame, labelCol: String, predCol: String): DataFrame = {
    // localCheckpoint: five downstream legs (support, predicted, tp, and
    // the class union's two sides) consume the matrix — without the
    // checkpoint each leg would re-run the FULL corpus aggregate
    // (including the prediction expression, e.g. langId's tokenization),
    // five scans instead of one. The materialized matrix is |classes|²
    // rows; checkpoint blocks are GC-released (the pageRank rationale —
    // not cache(), which pins an entry nobody can unpersist).
    val cm = df.groupBy(col(labelCol).as("label"), col(predCol).as("pred"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val support = cm.groupBy(col("label").as("clazz"))
      .agg(sum(col("n")).as("support"))
    val predicted = cm.groupBy(col("pred").as("clazz"))
      .agg(sum(col("n")).as("predicted"))
    val tp = cm.filter(col("label") <=> col("pred"))
      .select(col("label").as("clazz"), col("n").as("tp"))
    val classes = support.select(col("clazz"))
      .unionByName(predicted.select(col("clazz"))).distinct()
    // distinct key names per leg: all four frames share the cm lineage,
    // so joining on a same-named column would be a self-join ambiguity
    val joined = classes
      .join(support.withColumnRenamed("clazz", "__cs"),
        col("clazz") <=> col("__cs"), "left").drop("__cs")
      .join(predicted.withColumnRenamed("clazz", "__cp"),
        col("clazz") <=> col("__cp"), "left").drop("__cp")
      .join(tp.withColumnRenamed("clazz", "__ct"),
        col("clazz") <=> col("__ct"), "left").drop("__ct")
      .select(col("clazz"),
        coalesce(col("support"), lit(0L)).as("support"),
        coalesce(col("tp"), lit(0L)).as("tp"),
        (coalesce(col("predicted"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fp"),
        (coalesce(col("support"), lit(0L)) - coalesce(col("tp"), lit(0L))).as("fn"))
    val p = when(col("tp") + col("fp") === 0, lit(null).cast("double"))
      .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
    val r = when(col("support") === 0, lit(null).cast("double"))
      .otherwise(col("tp").cast("double") / col("support").cast("double"))
    joined
      .withColumn("precision", p)
      .withColumn("recall", r)
      .withColumn("f1",
        when(col("precision").isNull || col("recall").isNull
          || col("precision") + col("recall") === 0.0, lit(null).cast("double"))
          .otherwise(lit(2.0) * col("precision") * col("recall")
            / (col("precision") + col("recall"))))
  }

  /** Exact ROC-AUC over BUCKETED scores — the bounded-state ranking
    * metric (Mann-Whitney U form): with per-bucket (positives,
    * negatives) counts and buckets ascending by score,
    * U·2 = Σᵢ posᵢ·(2·cumnegᵢ + negᵢ) counts every (pos, neg) pair
    * once (same-bucket ties at ½, the standard convention), and
    * AUC = U·2 / (2·P·N). Everything before the final division is
    * exact BIGINT arithmetic — order-independent under any
    * partitioning; the prefix sum runs over BUCKET rows (score grain),
    * never data rows, so state is O(buckets) at any corpus size — the
    * same shape as the binned-quantile family. The caller picks the
    * bucket grain (e.g. `floor(score·1000)`), which is also what makes
    * a float score deterministic cross-engine. `yCol` must be 0/1.
    * Returns one row `(n_pos, n_neg, auc)`; AUC is NULL when either
    * class is empty (no ranking exists). */
  def bucketAuc(df: DataFrame, yCol: String, bucketCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val bk = df.groupBy(col(bucketCol).as("__b"))
      .agg(sum(col(yCol)).cast("long").as("__pos"),
        (count(lit(1)) - sum(col(yCol))).cast("long").as("__neg"))
    val w = Window.orderBy(col("__b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withCum = bk.withColumn("__cumneg",
      coalesce(sum(col("__neg")).over(w), lit(0L)))
    withCum.agg(
      sum(col("__pos")).as("n_pos"), sum(col("__neg")).as("n_neg"),
      sum(col("__pos") * (col("__cumneg") * 2 + col("__neg"))).as("__u2"))
      .select(col("n_pos"), col("n_neg"),
        when(col("n_pos") === 0 || col("n_neg") === 0, lit(null).cast("double"))
          .otherwise(col("__u2").cast("double") /
            (col("n_pos") * col("n_neg") * 2).cast("double")).as("auc"))
  }

  /** DuckDB mirror of [[bucketAuc]] over a relation with `y` (0/1) and
    * `b` (bucket) columns. */
  def bucketAucSql(rel: String): String =
    s"""bk AS (SELECT b, CAST(SUM(y) AS BIGINT) AS pos,
       |              CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
       |       FROM $rel GROUP BY 1),
       |wc AS (SELECT b, pos, neg,
       |         COALESCE(SUM(neg) OVER (ORDER BY b
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumneg
       |       FROM bk),
       |auc_r AS (SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
       |                 CAST(SUM(neg) AS BIGINT) AS n_neg,
       |                 CAST(SUM(pos * (cumneg * 2 + neg)) AS BIGINT) AS u2
       |          FROM wc)
       |SELECT n_pos, n_neg,
       |  CASE WHEN n_pos = 0 OR n_neg = 0 THEN NULL
       |       ELSE CAST(u2 AS DOUBLE) / CAST(n_pos * n_neg * 2 AS DOUBLE) END AS auc
       |FROM auc_r""".stripMargin

  /** DuckDB mirror of [[classificationReport]] over a CTE/table `rel`
    * with columns `label`, `pred` (pre-aliased by the caller). */
  def classificationReportSql(rel: String): String =
    s"""cm AS (SELECT label, pred, CAST(COUNT(*) AS BIGINT) AS n FROM $rel GROUP BY 1, 2),
       |sup AS (SELECT label AS clazz, CAST(SUM(n) AS BIGINT) AS support FROM cm GROUP BY 1),
       |prd AS (SELECT pred AS clazz, CAST(SUM(n) AS BIGINT) AS predicted FROM cm GROUP BY 1),
       |tpc AS (SELECT label AS clazz, n AS tp FROM cm WHERE label IS NOT DISTINCT FROM pred),
       |cls AS (SELECT clazz FROM sup UNION SELECT clazz FROM prd),
       |base AS (SELECT cls.clazz,
       |    COALESCE(sup.support, 0) AS support,
       |    COALESCE(tpc.tp, 0) AS tp,
       |    COALESCE(prd.predicted, 0) - COALESCE(tpc.tp, 0) AS fp,
       |    COALESCE(sup.support, 0) - COALESCE(tpc.tp, 0) AS fn
       |  FROM cls
       |  LEFT JOIN sup ON cls.clazz IS NOT DISTINCT FROM sup.clazz
       |  LEFT JOIN prd ON cls.clazz IS NOT DISTINCT FROM prd.clazz
       |  LEFT JOIN tpc ON cls.clazz IS NOT DISTINCT FROM tpc.clazz),
       |pr AS (SELECT clazz, support, tp, fp, fn,
       |    CASE WHEN tp + fp = 0 THEN NULL
       |         ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
       |    CASE WHEN support = 0 THEN NULL
       |         ELSE CAST(tp AS DOUBLE) / CAST(support AS DOUBLE) END AS recall
       |  FROM base),
       |rep AS (SELECT clazz, support, tp, fp, fn, precision, recall,
       |    CASE WHEN precision IS NULL OR recall IS NULL OR precision + recall = 0.0
       |         THEN NULL
       |         ELSE 2.0 * precision * recall / (precision + recall) END AS f1
       |  FROM pr)""".stripMargin

  /** Modified bigram precision (BLEU's core clipped-count term, n=2):
    * per (candidate, reference) text pair,
    * `p₂ = Σ_g min(count_cand(g), count_ref(g)) / Σ_g count_cand(g)` —
    * the generation-eval / paraphrase-detection primitive. Counts are
    * exact integers from two keyed aggregates joined per (id, gram);
    * the single division is the only float op. Empty candidates yield
    * NULL (unmeasurable), matching the report conventions above.
    * Returns `(idCol, n_cand, n_matched, precision)`. */
  def bigramPrecision(pairs: DataFrame, idCol: String,
                      candCol: String, refCol: String): DataFrame = {
    def counts(c: Column, n: String) = pairs
      .select(col(idCol), explode(TextOps.bigramsOf(TextOps.tokens(c))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as(n))
    val j = counts(col(candCol), "cc")
      .join(counts(col(refCol), "rc"), Seq(idCol, "g"), "left")
      .groupBy(col(idCol))
      .agg(sum(col("cc")).as("n_cand"),
        sum(least(col("cc"), coalesce(col("rc"), lit(0L)))).as("n_matched"))
    pairs.select(col(idCol)).distinct()
      .join(j, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_matched"), lit(0L)).as("n_matched"),
        when(coalesce(col("n_cand"), lit(0L)) === 0L, lit(null).cast(DoubleType))
          .otherwise(col("n_matched").cast(DoubleType)
            / col("n_cand").cast(DoubleType)).as("precision"))
  }

  /** ROUGE-2 (Lin, 2004): clipped-bigram overlap as RECALL against the
    * reference plus the F1 — the summary-eval complement of
    * [[bigramPrecision]]'s BLEU-style view. Exact integers end-to-end;
    * F₁ = 2·overlap/(n_cand + n_ref) (P and R share the overlap, so the
    * harmonic mean collapses to one exact rational), emitted as ppm
    * BIGINTs. NULL metrics where a denominator is empty. */
  def rouge2(pairs: DataFrame, idCol: String,
             candCol: String, refCol: String): DataFrame = {
    def counts(c: Column, n: String) = pairs
      .select(col(idCol), explode(TextOps.bigramsOf(TextOps.tokens(c))).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as(n))
    val cc = counts(col(candCol), "cc")
    val rc = counts(col(refCol), "rc")
    val j = cc.join(rc, Seq(idCol, "g"), "full_outer")
      .groupBy(col(idCol))
      .agg(sum(coalesce(col("cc"), lit(0L))).as("n_cand"),
        sum(coalesce(col("rc"), lit(0L))).as("n_ref"),
        sum(least(coalesce(col("cc"), lit(0L)), coalesce(col("rc"), lit(0L))))
          .as("overlap"))
    pairs.select(col(idCol)).distinct()
      .join(j, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_cand"), lit(0L)).as("n_cand"),
        coalesce(col("n_ref"), lit(0L)).as("n_ref"),
        coalesce(col("overlap"), lit(0L)).as("overlap"))
      .selectExpr("*",
        "CASE WHEN n_ref = 0 THEN NULL ELSE overlap * 1000000 div n_ref END AS recall_ppm",
        "CASE WHEN n_cand = 0 THEN NULL ELSE overlap * 1000000 div n_cand END AS precision_ppm",
        "CASE WHEN n_cand + n_ref = 0 THEN NULL ELSE 2 * overlap * 1000000 div (n_cand + n_ref) END AS f1_ppm")
  }

  /** Welch's unequal-variance two-sample t-test between the `a` and `b`
    * populations of `groupCol`, over exact integer cents in `centsCol`
    * (sufficient statistics: n, Σx, Σx² — one keyed aggregate, bounded
    * output). Sample variances come from the DECIMAL(38) identity
    * n·Σx² − (Σx)² with ONE correctly-rounded double conversion each;
    * every double step after that is a fixed formula both engines can
    * replay literally. DEGENERATE ARMS ARE NULL-GATED: an arm with
    * n ≤ 1 has an undefined sample variance (the n−1 divisor is the
    * audit-proven x/0 hazard class — Spark folds x/0 to NULL where
    * DuckDB reads +inf), so va/vb and everything downstream (t_stat,
    * df_welch) surface as NULL, identically in any engine.
    * Returns one row: (n_a, n_b, mean_a, mean_b, t_stat, df_welch). */
  def welchTTest(df: DataFrame, groupCol: String, centsCol: String,
                 a: String, b: String): DataFrame = {
    val st = df.select(col(groupCol).as("f"), col(centsCol).as("qc"))
      .filter(col("f").isin(a, b))
      .groupBy("f").agg(count(lit(1)).as("n"), sum("qc").as("s"),
        sum(col("qc") * col("qc")).as("ssq"))
    def side(flag: String, sfx: String) = st.filter(col("f") === flag)
      .select(col("n").as(s"n_$sfx"), col("s").as(s"s_$sfx"),
        col("ssq").as(s"ssq_$sfx"))
    side(a, "a").crossJoin(side(b, "b"))
      .selectExpr("n_a", "n_b", "s_a", "s_b",
        "CASE WHEN n_a > 1 THEN " +
          "CAST(CAST(ssq_a AS DECIMAL(38,0)) * n_a - CAST(s_a AS DECIMAL(38,0)) * s_a AS DOUBLE)" +
          " / CAST(n_a AS DOUBLE) / CAST(n_a - 1 AS DOUBLE) END AS va",
        "CASE WHEN n_b > 1 THEN " +
          "CAST(CAST(ssq_b AS DECIMAL(38,0)) * n_b - CAST(s_b AS DECIMAL(38,0)) * s_b AS DOUBLE)" +
          " / CAST(n_b AS DOUBLE) / CAST(n_b - 1 AS DOUBLE) END AS vb")
      .selectExpr("n_a", "n_b",
        "CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) / 100.0 AS mean_a",
        "CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) / 100.0 AS mean_b",
        "CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS dm",
        "va / CAST(n_a AS DOUBLE) AS sea", "vb / CAST(n_b AS DOUBLE) AS seb",
        "n_a - 1 AS dfa", "n_b - 1 AS dfb")
      .selectExpr("n_a", "n_b", "mean_a", "mean_b",
        "dm / sqrt(sea + seb) AS t_stat",
        "(sea + seb) * (sea + seb) / (sea * sea / CAST(dfa AS DOUBLE)" +
          " + seb * seb / CAST(dfb AS DOUBLE)) AS df_welch")
  }

  /**
   * AVERAGE PRECISION @ k + recall @ k over a scored candidate table
   * with BINARY relevance — the order-sensitive retrieval pair next to
   * [[graft.ops.Ranking.ndcgAtK]]'s graded form: AP sums precision at
   * each relevant hit's rank (rewarding EARLY placement), recall@k
   * just counts coverage. All-integer: the running relevant count
   * rides one cumulative window over the total ranking order
   * (`scoreCol` DESC, `tieCol` ASC); each precision term floors to
   * ppm; AP divides by min(R, k) (the AP@k convention) and recall by
   * R — integer floor divisions, NULLIF-gated when a query has no
   * relevant candidates (NULL, never 0/0).
   *
   * Output per query: `(qCol, n_rel, rel_at_k, ap_ppm, recall_ppm)`.
   * `relCol` must be 0/1 integral. Scale shape: one query-keyed rank
   * window + one keyed aggregate — candidate generation upstream is
   * the expensive part.
   */
  def apRecallAtK(scored: DataFrame, qCol: String, scoreCol: String,
                  tieCol: String, relCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ord = Window.partitionBy(qCol)
      .orderBy(col(scoreCol).desc, col(tieCol).asc)
    scored
      .withColumn("__sr", row_number().over(ord))
      .withColumn("__rc", sum(col(relCol))
        .over(ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(qCol))
      .agg(sum(col(relCol)).as("n_rel"),
        sum(when(col("__sr") <= k, col(relCol)).otherwise(lit(0L))).as("rel_at_k"),
        sum(when(col("__sr") <= k && col(relCol) === 1L,
          expr("(__rc * 1000000) div __sr")).otherwise(lit(0L))).as("__psum"))
      .select(col(qCol), col("n_rel"), col("rel_at_k"),
        expr(s"__psum div nullif(least(n_rel, $k), 0)").as("ap_ppm"),
        expr("(rel_at_k * 1000000) div nullif(n_rel, 0)").as("recall_ppm"))
  }

  /**
   * COHEN'S KAPPA — chance-corrected agreement between two label
   * columns (classifier vs ground truth, or two independent judges —
   * the standard inter-rater readout where raw accuracy flatters
   * skewed label distributions): κ = (p_o − p_e)/(1 − p_e) with
   * p_e = Σ_k p_a(k)·p_b(k), computed entirely from exact BIGINT
   * confusion-cell counts as κ_ppm = (n·agree − Σ r_k·c_k)·10⁶ /
   * (n² − Σ r_k·c_k). Negative κ (worse-than-chance) is real output,
   * so the ppm division TRUNCATES TOWARD ZERO explicitly in both
   * engines (Spark `div` truncates where DuckDB `//` floors — they
   * agree only on non-negative operands, the audit-proven divergence
   * class); constant-identical raters (p_e = 1) NULL-gate. n² must fit
   * BIGINT (n ≤ 3·10⁹ — lift to DECIMAL(38) past that).
   *
   * Output: one row `(n, n_agree, po_ppm, pe_ppm, kappa_ppm)`. Scale
   * shape: one (a, b) keyed aggregate with map-side partials; marginals
   * re-aggregate the label-domain-sized cell table, never the rows.
   */
  def cohenKappa(df: DataFrame, aCol: String, bCol: String): DataFrame = {
    val cells = df.filter(col(aCol).isNotNull && col(bCol).isNotNull)
      .groupBy(col(aCol).as("a"), col(bCol).as("b"))
      .agg(count(lit(1)).as("c"))
    val ra = cells.groupBy("a").agg(sum("c").as("ra"))
    val cb = cells.groupBy("b").agg(sum("c").as("cb"))
    val rc = ra.join(cb, col("a") === col("b"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)).as("sum_rc"))
    cells.agg(sum("c").as("n"),
      sum(when(col("a") === col("b"), col("c")).otherwise(lit(0L))).as("n_agree"))
      .crossJoin(broadcast(rc))
      .selectExpr("n", "n_agree",
        "(n_agree * 1000000) div nullif(n, 0) AS po_ppm",
        "(sum_rc * 1000000) div nullif(n * n, 0) AS pe_ppm",
        """CASE WHEN n * n_agree - sum_rc >= 0
             THEN ((n * n_agree - sum_rc) * 1000000) div nullif(n * n - sum_rc, 0)
             ELSE -(((sum_rc - n * n_agree) * 1000000) div nullif(n * n - sum_rc, 0))
           END AS kappa_ppm""")
  }

  /** DuckDB mirror of [[cohenKappa]] — same cells/marginals, same
    * truncate-toward-zero CASE. `rel` must expose (aCol, bCol). */
  def cohenKappaSql(rel: String, aCol: String, bCol: String): String =
    s"""WITH ck_cells AS (SELECT $aCol AS a, $bCol AS b, CAST(count(*) AS BIGINT) AS c
       |  FROM $rel WHERE $aCol IS NOT NULL AND $bCol IS NOT NULL GROUP BY 1, 2),
       |ck_ra AS (SELECT a, CAST(SUM(c) AS BIGINT) AS ra FROM ck_cells GROUP BY 1),
       |ck_cb AS (SELECT b, CAST(SUM(c) AS BIGINT) AS cb FROM ck_cells GROUP BY 1),
       |ck_rc AS (SELECT CAST(COALESCE(SUM(ra * cb), 0) AS BIGINT) AS sum_rc
       |          FROM ck_ra JOIN ck_cb ON ck_ra.a = ck_cb.b),
       |ck_tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS n_agree
       |  FROM ck_cells)
       |SELECT n, n_agree,
       |  (n_agree * 1000000) // NULLIF(n, 0) AS po_ppm,
       |  (sum_rc * 1000000) // NULLIF(n * n, 0) AS pe_ppm,
       |  CASE WHEN n * n_agree - sum_rc >= 0
       |    THEN ((n * n_agree - sum_rc) * 1000000) // NULLIF(n * n - sum_rc, 0)
       |    ELSE -(((sum_rc - n * n_agree) * 1000000) // NULLIF(n * n - sum_rc, 0))
       |  END AS kappa_ppm
       |FROM ck_tot CROSS JOIN ck_rc""".stripMargin
}
