package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/**
 * In-engine text classification: linear quality/domain classifiers
 * trained WITH aggregates, not a driver-side ML library — the
 * fastText-style linear-model role in training-data pipelines
 * (quality gating, language routing), built so that training at
 * 100 TB is a handful of corpus scans and nothing else.
 *
 * Every quantity is an INTEGER: features are hashed token-bucket
 * counts, labels ±1, and every training statistic is an integer sum —
 * associative, order-independent, exact. That choice is what makes
 * distributed training DETERMINISTIC (gradient descent on doubles is
 * partitioning-dependent): each pass is one map-side-combined
 * aggregate whose result is bit-identical at any parallelism, so the
 * whole training computation hash-verifies against an
 * engine-independent oracle. Feature hashing uses the md5-reduction
 * both engines share (the portable-MinHash base hash,
 * [[graft.functions]] ShingleExpressions scaladoc), not xxhash64.
 *
 * Two trainers with complementary roles:
 *  - [[trainPerceptron]]: the batch-perceptron recurrence, E epochs =
 *    E scans. The verified object is the exact TRAJECTORY — including
 *    the textbook failure mode that full-batch updates oscillate on
 *    non-separable data (the classic convergence theorem needs
 *    per-sample updates, which are inherently sequential and don't
 *    distribute). The trajectory makes that oscillation auditable
 *    instead of hiding it behind a final accuracy number.
 *  - [[centroidModel]]: the nearest-centroid (Rocchio) classifier
 *    with a midpoint threshold — closed-form from TWO scans, no
 *    iteration, and the production-shaped choice for a distributed
 *    linear probe: exact, stable, embarrassingly parallel.
 */
object Classifier {

  /** Hashed feature buckets (+1 bias ⇒ Dim+1 weights). Small enough
    * that the oracle's unrolled epoch CTEs stay readable; the
    * operator itself is Dim-generic. */
  val Dim = 16

  /** Engine-portable token bucket: first 48 bits of md5 mod `m` —
    * non-negative, identical in any engine with md5 + hex parse. */
  def md5Bucket(t: Column, m: Int): Column =
    conv(substring(md5(t), 1, 12), 16, 10).cast(LongType) % m

  def md5BucketSql(t: String, m: Int): String =
    s"CAST(('0x' || substr(md5($t), 1, 12)) AS BIGINT) % $m"

  /** Feature vector of one document: `[1 (bias), count of tokens in
    * bucket 0, …, count in bucket Dim−1]` — integer counts, pure
    * projection. */
  def features(text: Column): Column = {
    val toks = TextOps.tokens(text)
    concat(array(lit(1L)),
      transform(sequence(lit(0), lit(Dim - 1)),
        j => size(filter(toks, t => md5Bucket(t, Dim) === j)).cast(LongType)))
  }

  /** Per-token bucket array — md5 hashed ONCE per token. Kept in its
    * own projection by callers (the bucket column is referenced Dim
    * times downstream, so CollapseProject leaves the barrier), because
    * the inline [[features]]/[[rawCounts]] forms re-tokenize AND
    * re-hash every token once per bucket: higher-order-function
    * lambdas run interpreted and share no subexpressions — measured
    * ~Dim× the md5 cost on the corpus scans (ml_centroid_eval
    * 11.7 → ~2 s at sf0.1). */
  private def tokenBuckets(text: Column): Column =
    transform(TextOps.tokens(text), t => md5Bucket(t, Dim))

  /** Bucket-count vector over a PRECOMPUTED bucket array: ONE compiled
    * pass ([[graft.functions.BucketCounts]]) — the Dim filter-lambda
    * form ran interpreted (HOFs are CodegenFallback) and cost ~Dim×
    * this. */
  private def countsOf(bk: Column): Column = {
    import org.apache.spark.sql.graftbridge.Bridge
    Bridge.column(graft.functions.BucketCounts(Bridge.expression(bk), Dim))
  }

  /** `df` + feature column `outCol` via the staged two-projection
    * form (buckets once, then counts); `bias` prepends the constant-1
    * slot [[features]] carries. */
  private def withFeatureCol(df: DataFrame, textCol: String, label: Column,
                             outCol: String, bias: Boolean): DataFrame = {
    val staged = df.select(label.cast(LongType).as("y"),
      tokenBuckets(col(textCol)).as("__bk"))
    val counts = countsOf(col("__bk"))
    staged.select(col("y"),
      (if (bias) concat(array(lit(1L)), counts) else counts).as(outCol))
  }

  /** DuckDB mirror of [[features]] (1-based lists downstream). */
  def featuresSql(text: String): String =
    s"[CAST(1 AS BIGINT)] || list_transform(range(0, $Dim), " +
      s"j -> CAST(len(list_filter(${TextOps.tokensSql(text)}, " +
      s"t -> ${md5BucketSql("t", Dim)} = j)) AS BIGINT))"

  /** One training epoch's outcome: weights AFTER the update and the
    * misclassified count that produced it. */
  final case class Epoch(epoch: Int, nMis: Long, weights: Array[Long])

  /**
   * Batch-perceptron training: for `epochs` rounds, misclassified rows
   * (y·(w·x) ≤ 0 — ties count as errors, so epoch 1 updates on every
   * row from the zero vector) contribute `y·x` to the weight delta.
   * Each round: one filter over the cached feature table + one
   * aggregate of Dim+1 integer sums + the error count, collected as a
   * single row. Returns the full trajectory (the verification object —
   * two engines agreeing on every epoch's weights agree on the whole
   * computation).
   *
   * `label` must evaluate to +1/−1 (integer).
   */
  def trainPerceptron(docs: DataFrame, textCol: String, label: Column,
                      epochs: Int): Seq[Epoch] = {
    require(epochs >= 1, s"trainPerceptron: epochs must be >= 1, got $epochs")
    val n = Dim + 1
    val feats = withFeatureCol(docs, textCol, label, "x", bias = true).cache()
    val out = scala.collection.mutable.ArrayBuffer.empty[Epoch]
    try {
      val w = Array.fill(n)(0L)
      for (e <- 1 to epochs) {
        val dot = (0 until n).map(j => lit(w(j)) * get(col("x"), lit(j)))
          .reduce(_ + _)
        val mis = feats.filter(col("y") * dot <= 0)
        val aggs = (0 until n).map(j =>
          coalesce(sum(col("y") * get(col("x"), lit(j))), lit(0L)).as(s"d$j")) :+
          count(lit(1)).as("nmis")
        val row = mis.agg(aggs.head, aggs.tail: _*).collect()(0)
        for (j <- 0 until n) w(j) += row.getLong(j)
        out += Epoch(e, row.getLong(n), w.clone())
      }
    } finally feats.unpersist()
    out.toSeq
  }

  /** Confusion counts of a trained model over `docs`: one aggregate,
    * rows `(label, predicted, n)` with labels in {−1, +1} and
    * `predicted = +1 iff w·x > 0`. */
  def confusion(docs: DataFrame, textCol: String, label: Column,
                weights: Array[Long]): DataFrame = {
    require(weights.length == Dim + 1,
      s"confusion: expected ${Dim + 1} weights, got ${weights.length}")
    val dot = weights.indices.map(j => lit(weights(j)) * get(col("x"), lit(j)))
      .reduce(_ + _)
    withFeatureCol(docs, textCol, label, "x", bias = true)
      .select(col("y").as("label"),
        when(dot > 0, lit(1L)).otherwise(lit(-1L)).as("predicted"))
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))
  }

  /** Stopword-density quality label (+1 iff stopwords are ≥ 1/16 of
    * tokens and the doc is non-empty) — the C4-style "does this read
    * like prose" signal, and a target the hashed features carry real
    * (if collision-degraded) information about. Shared Spark/SQL so
    * classifier queries and oracles agree exactly. */
  def qualityLabel(text: Column): Column = {
    val toks = TextOps.tokens(text)
    val nstop = size(filter(toks, t => t.isInCollection(TextOps.Stopwords)))
    when(size(toks) > 0 && nstop * 16 >= size(toks), lit(1L)).otherwise(lit(-1L))
  }

  def qualityLabelSql(text: String): String = {
    val set = TextOps.Stopwords.map(s => s"'$s'").mkString(", ")
    val toks = TextOps.tokensSql(text)
    s"CASE WHEN len($toks) > 0 AND 16 * len(list_filter($toks, t -> t IN ($set))) >= len($toks) " +
      "THEN CAST(1 AS BIGINT) ELSE CAST(-1 AS BIGINT) END"
  }

  /** A trained nearest-centroid model: `w` is the (integer-scaled)
    * centroid difference, and the decision rule is the exact rational
    * comparison `2·npos·nneg·(w·x) > nneg·Spos + npos·Sneg` (s-means
    * midpoint threshold, cross-multiplied so no division happens).
    * The BigInt fields keep the rule exact at magnitudes where BIGINT
    * products would wrap. */
  final case class CentroidModel(w: Array[Long], nPos: Long, nNeg: Long,
                                 lhsScale: BigInt, rhs: BigInt)

  /** Bucket-count features WITHOUT the bias slot (centroids handle the
    * offset via the midpoint threshold instead). */
  def rawCounts(text: Column): Column = {
    val toks = TextOps.tokens(text)
    transform(sequence(lit(0), lit(Dim - 1)),
      j => size(filter(toks, t => md5Bucket(t, Dim) === j)).cast(LongType))
  }

  def rawCountsSql(text: String): String =
    s"list_transform(range(0, $Dim), " +
      s"j -> CAST(len(list_filter(${TextOps.tokensSql(text)}, " +
      s"t -> ${md5BucketSql("t", Dim)} = j)) AS BIGINT))"

  /**
   * Nearest-centroid (Rocchio) training in TWO corpus scans, all
   * integer: scan 1 aggregates per-class counts and per-bucket sums
   * (the class centroids, scaled by class size to stay integral:
   * `w_j = nNeg·Σ_pos x_j − nPos·Σ_neg x_j` is `nPos·nNeg·(μ⁺−μ⁻)_j`);
   * scan 2 aggregates the per-class score sums Σ s over s = w·x, from
   * which the midpoint threshold θ = (mean⁺(s)+mean⁻(s))/2 is held as
   * a cross-multiplied exact rational. Class-scaled weights mean NO
   * division ever happens — the model is bit-identical in any engine.
   *
   * Scale shape: two whole-corpus aggregates with O(Dim) state +
   * 1-row collects; scoring/inference is then a pure projection. Score
   * magnitudes grow with corpus size (w carries an n² factor), so the
   * decision rule compares in BigInt/DECIMAL(38,0) space — exact to
   * 10³⁸, far past any realistic corpus.
   */
  def centroidModel(docs: DataFrame, textCol: String, label: Column): CentroidModel = {
    val feats = withFeatureCol(docs, textCol, label, "x", bias = false).cache()
    try {
      val statAggs =
        count(when(col("y") === 1, lit(1))).as("npos") +:
        count(when(col("y") === -1, lit(1))).as("nneg") +:
        (0 until Dim).flatMap(j => Seq(
          coalesce(sum(when(col("y") === 1, get(col("x"), lit(j)))), lit(0L)).as(s"sp$j"),
          coalesce(sum(when(col("y") === -1, get(col("x"), lit(j)))), lit(0L)).as(s"sn$j")))
      val st = feats.agg(statAggs.head, statAggs.tail: _*).collect()(0)
      val (nPos, nNeg) = (st.getLong(0), st.getLong(1))
      require(nPos > 0 && nNeg > 0,
        s"centroidModel: need both classes present, got +$nPos / -$nNeg")
      val w = Array.tabulate(Dim)(j =>
        nNeg * st.getLong(2 + 2 * j) - nPos * st.getLong(3 + 2 * j))
      val score = (0 until Dim).map(j => lit(w(j)) * get(col("x"), lit(j))).reduce(_ + _)
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val sums = feats.agg(
        coalesce(sum(when(col("y") === 1, score.cast(dec))), lit(0).cast(dec)).as("spos"),
        coalesce(sum(when(col("y") === -1, score.cast(dec))), lit(0).cast(dec)).as("sneg"))
        .collect()(0)
      val sPos = BigInt(sums.getDecimal(0).toBigInteger)
      val sNeg = BigInt(sums.getDecimal(1).toBigInteger)
      CentroidModel(w, nPos, nNeg,
        lhsScale = BigInt(2) * nPos * nNeg,
        rhs = BigInt(nNeg) * sPos + BigInt(nPos) * sNeg)
    } finally feats.unpersist()
  }

  /** Per-document integer scores of a centroid model —
    * `(id, y, s)` with `s = w·x` exact BIGINT: the ranking/calibration
    * surface (confusion folds it to a decision; calibration needs the
    * scores themselves). Pure projection over the staged features. */
  def centroidScores(docs: DataFrame, idCol: String, textCol: String,
                     label: Column, m: CentroidModel): DataFrame = {
    val staged = docs.select(col(idCol).as("id"), label.cast(LongType).as("y"),
      tokenBuckets(col(textCol)).as("__bk"))
    val withX = staged.select(col("id"), col("y"), countsOf(col("__bk")).as("x"))
    val score = (0 until Dim).map(j => lit(m.w(j)) * get(col("x"), lit(j))).reduce(_ + _)
    withX.select(col("id"), col("y"), score.as("s"))
  }

  /** Confusion counts of a centroid model: the exact rational decision
    * `lhsScale·(w·x) > rhs`, compared in DECIMAL(38,0). One scan. */
  def centroidConfusion(docs: DataFrame, textCol: String, label: Column,
                        m: CentroidModel): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val score = (0 until Dim).map(j => lit(m.w(j)) * get(col("x"), lit(j))).reduce(_ + _)
    val lhs = lit(new java.math.BigDecimal(m.lhsScale.bigInteger)).cast(dec) * score.cast(dec)
    val rhs = lit(new java.math.BigDecimal(m.rhs.bigInteger)).cast(dec)
    withFeatureCol(docs, textCol, label, "x", bias = false)
      .select(col("y").as("label"), when(lhs > rhs, lit(1L)).otherwise(lit(-1L)).as("predicted"))
      .groupBy("label", "predicted").agg(count(lit(1)).as("n"))
  }

  /**
   * Exact-arithmetic decision stump: for every candidate threshold `t`
   * of an integral feature, the Gini purity of the split
   * `feature <= t` vs `feature > t` against a binary label — scored
   * WITHOUT floating point, so the best split is partition- and
   * engine-invariant.
   *
   * Standard CART minimizes the weighted impurity
   * `n_l·G_l + n_r·G_r` with `G = 1 − (pos² + neg²)/n²`; that is
   * equivalent to MAXIMIZING `A/n_l + B/n_r` where `A = pos_l² + neg_l²`
   * (and B likewise on the right). The division is replaced by
   * micro-point integer division (`× 10⁴` then `div`, exact floor in
   * both Spark and DuckDB for non-negative operands) — a deterministic
   * 1e-4-resolution total order on splits, in the spirit of the
   * Fellegi-Sunter micro-point weights in [[Linkage]]. Bound: exact
   * while `n² · 10⁴` fits a BIGINT, i.e. up to ~3·10⁷ input rows —
   * beyond that, widen to DECIMAL(38,0) accumulators.
   *
   * One aggregate over the fact table (distinct feature values), one
   * bounded cumulative window over those values (≤ |domain| rows), no
   * per-threshold rescans. Output: one row per threshold with the
   * left/right tallies, the purity score, and `is_best`.
   */
  def giniStump(df: DataFrame, featureCol: Column, labelCol: Column): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = df.groupBy(featureCol.cast(LongType).as("thr"))
      .agg(count(lit(1)).as("n"), sum(labelCol.cast(LongType)).as("pos"))
    val cum = Window.orderBy(col("thr"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val whole = Window.orderBy(col("thr"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    per
      .withColumn("nl", sum(col("n")).over(cum))
      .withColumn("pl", sum(col("pos")).over(cum))
      .withColumn("nr", sum(col("n")).over(whole) - col("nl"))
      .withColumn("pr", sum(col("pos")).over(whole) - col("pl"))
      .filter(col("nr") > 0) // no right side ⇒ not a split
      .withColumn("score", expr(
        """(10000 * (pl * pl + (nl - pl) * (nl - pl))) div nl
          | + (10000 * (pr * pr + (nr - pr) * (nr - pr))) div nr""".stripMargin))
      .withColumn("is_best",
        (col("score") === max(col("score")).over(whole)).cast("int"))
      .select("thr", "nl", "pl", "nr", "pr", "score", "is_best")
  }

  /** DuckDB mirror of [[giniStump]]'s score + flag epilogue over a
    * relation with (thr, nl, pl, nr, pr) columns. */
  def giniScoreSql: String =
    """(10000 * (pl * pl + (nl - pl) * (nl - pl))) // nl
      | + (10000 * (pr * pr + (nr - pr) * (nr - pr))) // nr""".stripMargin

  /**
   * Leave-one-out target encoding — the standard high-cardinality
   * categorical feature: each row's category replaced by the mean
   * target of OTHER rows in its category, `(Σ_cat − own)/(n_cat − 1)`,
   * which never leaks the row's own label into its feature.
   *
   * The sums are exact integer cents (DECIMAL-anchored, associative),
   * so every row's encoding is one correctly-rounded double division —
   * partition-order-independent. Singleton categories encode NULL
   * (no "others" to average).
   *
   * Scale shape: the per-category (Σ, n) come from a map-side-combined
   * GROUP BY broadcast back onto the rows — NOT a window partitioned
   * by the category (a low-cardinality category column would cap the
   * window's parallelism at |categories| tasks regardless of cluster
   * size; measured 3.7× worse at 10× data before the rewrite).
   */
  def targetEncode(df: DataFrame, keyCol: String, valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)) * 100)
      .cast(LongType)
    val withOwn = df.withColumn("__own", cents)
    val agg = withOwn.groupBy(col(keyCol).as("__k"))
      .agg(sum(col("__own")).as("__sum"), count(lit(1)).as("__n"))
    // no broadcast hint: |categories| may be anything — AQE broadcasts
    // the small case itself and a high-cardinality key still gets a
    // correct shuffle join
    withOwn.join(agg, col(keyCol) === col("__k"))
      .withColumn("enc",
        when(col("__n") === 1, lit(null).cast("double"))
          .otherwise((col("__sum") - col("__own")).cast("double")
            / (col("__n") - 1).cast("double") / 100.0))
      .drop("__own", "__sum", "__n", "__k")
  }

  /**
   * K-FOLD OUT-OF-FOLD m-estimate target encoding — the production
   * form next to [[targetEncode]]'s leave-one-out baseline: the
   * encoding for (category k, fold f) averages the target over the
   * category's rows OUTSIDE fold f, shrunk toward the out-of-fold
   * GLOBAL prior by pseudo-count `m`
   *
   *   enc(k,f) = (S_k − S_kf + m·p_f) / (N_k − N_kf + m),
   *   p_f = (S₀ − S_f) / (N₀ − N_f)
   *
   * so a rare category decays to the prior instead of memorizing noise
   * (the m-estimate / CatBoost-style smoothing LOO lacks). LEAKAGE-FREE
   * BY CONSTRUCTION: every term excludes fold f entirely — flipping
   * any fold-f label changes S_kf and S_k (and S_f, S₀) by the same
   * amount, leaving enc(·, f) bit-identical (spec-pinned).
   *
   * Determinism: all sufficient statistics are exact BIGINT counts and
   * sums; `enc` is a fixed double formula over correctly-rounded
   * conversions of exact integers (< 2⁵³ up to 9·10¹⁵ rows), identical
   * operation order in both engines. A fold holding ALL rows NULL-gates
   * the prior (and enc) in both engines — the x/0 hazard class.
   *
   * Scale shape: one (key, fold) keyed aggregate with map-side
   * partials, then key/fold/global roll-ups OF THE AGGREGATE (never
   * the rows); fold and global tables are broadcast-bounded. No
   * windows, no per-row joins — the output is the encoding TABLE a
   * pipeline persists and maps over its rows.
   */
  def targetEncodeOof(df: DataFrame, keyCol: String, foldCol: String,
                      targetCol: String, m: Long): DataFrame = {
    require(m >= 1, s"targetEncodeOof: pseudo-count m must be >= 1, got $m")
    val kf = df.groupBy(col(keyCol), col(foldCol))
      .agg(count(lit(1)).as("n_kf"), sum(col(targetCol).cast(LongType)).as("s_kf"))
    val k = kf.groupBy(col(keyCol))
      .agg(sum("n_kf").as("n_k"), sum("s_kf").as("s_k"))
    val f = kf.groupBy(col(foldCol))
      .agg(sum("n_kf").as("n_f"), sum("s_kf").as("s_f"))
    val g = kf.agg(sum("n_kf").as("n0"), sum("s_kf").as("s0"))
    kf.join(k, Seq(keyCol)).join(broadcast(f), Seq(foldCol))
      .crossJoin(broadcast(g))
      .select(col(keyCol), col(foldCol),
        (col("n_k") - col("n_kf")).as("n_oof"),
        (col("s_k") - col("s_kf")).as("s_oof"),
        when(col("n0") === col("n_f"), lit(null).cast(DoubleType))
          .otherwise(
            ((col("s_k") - col("s_kf")).cast(DoubleType)
              + lit(m.toDouble) * ((col("s0") - col("s_f")).cast(DoubleType)
                / (col("n0") - col("n_f")).cast(DoubleType)))
              / (col("n_k") - col("n_kf") + lit(m)).cast(DoubleType))
          .as("enc"))
  }

  /** DuckDB mirror of [[targetEncodeOof]] — same exact-integer
    * sufficient statistics, same double formula in the same operation
    * order, same all-rows-in-one-fold NULL gate. `rel` must expose
    * (keyCol, foldCol, targetCol). */
  def targetEncodeOofSql(rel: String, keyCol: String, foldCol: String,
                         targetCol: String, m: Long): String =
    s"""WITH te_kf AS (SELECT $keyCol, $foldCol,
       |    CAST(count(*) AS BIGINT) AS n_kf, CAST(SUM($targetCol) AS BIGINT) AS s_kf
       |  FROM $rel GROUP BY 1, 2),
       |te_k AS (SELECT $keyCol, CAST(SUM(n_kf) AS BIGINT) AS n_k,
       |    CAST(SUM(s_kf) AS BIGINT) AS s_k FROM te_kf GROUP BY 1),
       |te_f AS (SELECT $foldCol, CAST(SUM(n_kf) AS BIGINT) AS n_f,
       |    CAST(SUM(s_kf) AS BIGINT) AS s_f FROM te_kf GROUP BY 1),
       |te_g AS (SELECT CAST(SUM(n_kf) AS BIGINT) AS n0,
       |    CAST(SUM(s_kf) AS BIGINT) AS s0 FROM te_kf)
       |SELECT te_kf.$keyCol, te_kf.$foldCol,
       |  (n_k - n_kf) AS n_oof, (s_k - s_kf) AS s_oof,
       |  CASE WHEN n0 - n_f = 0 THEN NULL
       |       ELSE (CAST(s_k - s_kf AS DOUBLE)
       |             + $m.0 * (CAST(s0 - s_f AS DOUBLE) / CAST(n0 - n_f AS DOUBLE)))
       |            / CAST(n_k - n_kf + $m AS DOUBLE) END AS enc
       |FROM te_kf JOIN te_k USING ($keyCol) JOIN te_f USING ($foldCol)
       |CROSS JOIN te_g""".stripMargin

  /**
   * Multinomial naive Bayes, trained and scored in-engine — the third
   * classical text classifier next to the perceptron and the centroid
   * model, and the standard langid/quality baseline (scikit-learn's
   * MultinomialNB, fastText's `-loss ns` cousin).
   *
   * LN-FREE (libm log is banned for cross-engine determinism — the
   * bigramLmScore precedent): instead of summing log-likelihoods, each
   * class's posterior is expressed RELATIVE to a reference class (the
   * byte-wise smallest label), so the per-token likelihood ratio
   *
   *   f(w, c) = ((n_wc + 1) · (N₀ + V)) / ((n_w0 + 1) · (N_c + V))
   *
   * stays O(1) and the per-document score is the ORDERED product of
   * the f's over the token sequence times the prior odds
   * (D_c+1)/(D₀+1). Every count is an exact integer; each factor is
   * one correctly-rounded IEEE division of two correctly-rounded
   * products; the fold multiplies in token order (array_sort on
   * (pos, factor) structs ↔ DuckDB `list(... ORDER BY pos)` +
   * list_reduce) — bit-identical across engines and partitionings.
   * argmax is the exact MAP decision (the reference-relative form is a
   * monotone transform of the posterior); ties break to the smaller
   * label. Extreme class separation can overflow a product to +Inf —
   * identically in both engines, and Inf ties still order by label.
   *
   * Scale shape: training is two map-side-combined keyed counts
   * (token×class, class) + two scalars (V, reference row); the model
   * is vocab×k rows (vocabulary-bounded, not corpus-bounded — the
   * standard NB model size); scoring shuffles tokens once on `w` and
   * folds per (doc, class). No driver loops, no collects beyond the
   * broadcast scalars.
   *
   * Returns `(doc_id, true_lab, pred_lab, score)` per document.
   */
  def naiveBayes(docs: DataFrame, idCol: String, textCol: String,
                 labelCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.{DoubleType}
    val base = docs.select(col(idCol).as("doc_id"), col(labelCol).as("lab"),
      TextOps.tokens(col(textCol)).as("t"))
    val tok = base.select(col("doc_id"), col("lab"),
      posexplode(col("t")).as(Seq("pos", "w")))
    val ntc = tok.groupBy("w", "lab").agg(count(lit(1)).as("n"))
    val nc = tok.groupBy("lab").agg(count(lit(1)).as("n_tok"))
    val dc = base.groupBy("lab").agg(count(lit(1)).as("n_doc"))
    val vDf = ntc.select("w").distinct().agg(count(lit(1)).as("v"))
    val refDf = base.agg(min("lab").as("ref"))
    val cls = nc.join(dc, "lab")
    val c0 = cls.crossJoin(broadcast(refDf)).filter(col("lab") === col("ref"))
      .select(col("n_tok").as("n_tok0"), col("n_doc").as("n_doc0"))
    val nRef = ntc.crossJoin(broadcast(refDf)).filter(col("lab") === col("ref"))
      .select(col("w"), col("n").as("n0"))
    val vocab = ntc.select("w").distinct()
    val model = vocab
      .crossJoin(broadcast(cls))
      .crossJoin(broadcast(vDf)).crossJoin(broadcast(c0))
      .join(ntc.withColumnRenamed("n", "ntc"), Seq("w", "lab"), "left")
      .join(nRef, Seq("w"), "left")
      .select(col("w"), col("lab"),
        ((coalesce(col("ntc"), lit(0L)) + 1).cast(DoubleType)
          * (col("n_tok0") + col("v")).cast(DoubleType)
          / ((coalesce(col("n0"), lit(0L)) + 1).cast(DoubleType)
            * (col("n_tok") + col("v")).cast(DoubleType))).as("factor"))
    val folded = tok.drop("lab").join(model, Seq("w"))
      .groupBy(col("doc_id"), col("lab"))
      .agg(expr("""aggregate(
        transform(array_sort(collect_list(struct(pos, factor))), s -> s.factor),
        CAST(1.0 AS DOUBLE), (acc, x) -> acc * x)""").as("lik"))
    val scored = folded.join(broadcast(cls.select(col("lab"), col("n_doc"))), Seq("lab"))
      .crossJoin(broadcast(c0.select(col("n_doc0"))))
      .withColumn("score", col("lik")
        * ((col("n_doc") + 1).cast(DoubleType) / (col("n_doc0") + 1).cast(DoubleType)))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("score").desc, col("lab"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("doc_id"), col("lab").as("pred_lab"), col("score"))
      .join(base.select(col("doc_id"), col("lab").as("true_lab")), Seq("doc_id"))
      .select(col("doc_id"), col("true_lab"), col("pred_lab"), col("score"))
  }

  /** DuckDB mirror of [[naiveBayes]] over `docsRel(doc_id, text)` with
    * label column `labelCol` — identical counts, factor arithmetic,
    * fold order, and tie-breaks. Ends unclosed: append the final
    * SELECT (the caller picks prediction vs confusion shape). */
  def naiveBayesSql(docsRel: String, labelCol: String): String =
    s"""base AS (SELECT doc_id, $labelCol AS lab, ${TextOps.tokensSql("text")} AS t FROM $docsRel),
       |tok AS (SELECT doc_id, lab, i AS pos, t[i] AS w
       |        FROM base, unnest(range(1, len(t) + 1)) AS r(i)),
       |ntc AS (SELECT w, lab, count(*) AS n FROM tok GROUP BY 1, 2),
       |ncl AS (SELECT lab, count(*) AS n_tok FROM tok GROUP BY 1),
       |dcl AS (SELECT lab, count(*) AS n_doc FROM base GROUP BY 1),
       |vv AS (SELECT count(DISTINCT w) AS v FROM ntc),
       |rr AS (SELECT min(lab) AS ref FROM base),
       |cls AS (SELECT ncl.lab, n_tok, n_doc FROM ncl JOIN dcl USING (lab)),
       |c0 AS (SELECT n_tok AS n_tok0, n_doc AS n_doc0 FROM cls, rr WHERE cls.lab = rr.ref),
       |nref AS (SELECT ntc.w, ntc.n AS n0 FROM ntc, rr WHERE ntc.lab = rr.ref),
       |vocab AS (SELECT DISTINCT w FROM ntc),
       |model AS (SELECT vocab.w, cls.lab,
       |            (CAST(COALESCE(ntc.n, 0) + 1 AS DOUBLE) * CAST(n_tok0 + v AS DOUBLE))
       |          / (CAST(COALESCE(nref.n0, 0) + 1 AS DOUBLE) * CAST(cls.n_tok + v AS DOUBLE))
       |            AS factor
       |          FROM vocab CROSS JOIN cls CROSS JOIN vv CROSS JOIN c0
       |          LEFT JOIN ntc ON ntc.w = vocab.w AND ntc.lab = cls.lab
       |          LEFT JOIN nref ON nref.w = vocab.w),
       |st AS (SELECT tok.doc_id, tok.pos, model.lab, model.factor
       |       FROM tok JOIN model USING (w)),
       |folded AS (SELECT doc_id, lab,
       |             list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
       |               list(factor ORDER BY pos)), (x, y) -> x * y) AS lik
       |           FROM st GROUP BY 1, 2),
       |scored AS (SELECT f.doc_id, f.lab,
       |             f.lik * (CAST(n_doc + 1 AS DOUBLE) / CAST(n_doc0 + 1 AS DOUBLE)) AS score
       |           FROM folded f JOIN cls USING (lab) CROSS JOIN c0),
       |pred AS (SELECT doc_id, lab AS pred_lab, score,
       |           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lab) AS rn
       |         FROM scored)""".stripMargin
}
