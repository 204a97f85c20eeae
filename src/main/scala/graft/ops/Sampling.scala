package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus sampling for training-data mixes: per-stratum downsampling
 * (rebalance languages/sources) and deterministic per-key top-k.
 *
 * Two flavors with different determinism contracts:
 *  - [[downsampleByKey]] wraps Bernoulli `sampleBy` — statistically
 *    uniform, seed-stable for a fixed partitioning, the right tool for
 *    "keep ~10% of language X".
 *  - [[deterministicPerKey]] keeps exactly `k` rows per key chosen by
 *    hash order — fully reproducible across cluster layouts (the hash
 *    depends only on row ids), the right tool for eval-set carve-outs
 *    that must never drift between runs.
 *
 * Both are one narrow pass plus (for per-key) one window shuffle.
 */
object Sampling {

  /** Bernoulli stratified downsample: `fractions(key) → keep-rate`;
    * keys absent from the map are kept entirely.
    *
    * The distinct-key collect is the ONLY data-dependent driver-side
    * materialization in the sampling family. It is bounded by stratum
    * cardinality (languages/sources — tens, not millions), and the
    * `require` makes a mis-keyed call (e.g. stratifying on doc_id)
    * fail loudly instead of OOMing the driver. */
  def downsampleByKey(df: DataFrame, keyCol: String,
                      fractions: Map[String, Double], seed: Long,
                      maxStrata: Int = 10000): DataFrame = {
    val allKeys = df.select(col(keyCol)).distinct()
      .limit(maxStrata + 1).collect().map(_.get(0).toString)
    require(allKeys.length <= maxStrata,
      s"downsampleByKey: over $maxStrata distinct '$keyCol' strata — " +
        "this column is not a stratum key; use deterministicPerKey/mixturePerKey")
    val full = allKeys.map(k => k -> fractions.getOrElse(k, 1.0)).toMap
    df.stat.sampleBy(keyCol, full, seed)
  }

  /** Exactly `k` rows per key, selected by xxhash64(id) order —
    * deterministic for a given id column regardless of partitioning. */
  def deterministicPerKey(df: DataFrame, keyCol: String, idCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }

  /** Deterministic train/val/test assignment by hashed id — the split
    * step of a training-data pipeline (dedup → filter → mix → SPLIT →
    * pack). The first byte of `md5(id)` lands uniformly in 00..ff;
    * comparing it against hex thresholds partitions ids at
    * `floor(256·frac)/256` granularity. Properties that matter at any
    * scale: stateless (an id's split never depends on other rows, so
    * re-runs and incremental batches agree), no shuffle (pure
    * projection), and engine-portable (MD5 is standardized — unlike
    * xxhash64, which DuckDB lacks — so the oracle hashes the exact
    * assignment). NULL ids get NULL splits (surfaced, not silently
    * bucketed). */
  def hashSplit(df: DataFrame, idCol: String,
                trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"hashSplit: need 0 < trainFrac, 0 <= valFrac, trainFrac+valFrac < 1 " +
        s"(got $trainFrac, $valFrac)")
    val t1 = f"${(trainFrac * 256).toInt}%02x"
    val t2 = f"${((trainFrac + valFrac) * 256).toInt}%02x"
    // thresholds floor to 1/256 granularity: a positive fraction that
    // floors to an existing boundary would make that split silently
    // EMPTY — fail loudly instead of shipping a zero-row split
    require(t1 > "00",
      s"hashSplit: trainFrac $trainFrac floors below 1/256 — train would be empty")
    require(valFrac == 0 || t2 > t1,
      s"hashSplit: valFrac $valFrac floors to zero width at 1/256 granularity " +
        "— val would be empty")
    val b = substring(md5(col(idCol).cast("string")), 1, 2)
    df.withColumn("split",
      when(col(idCol).isNull, lit(null).cast("string"))
        .when(b < t1, lit("train"))
        .when(b < t2, lit("val"))
        .otherwise(lit("test")))
  }

  /** Deterministic WEIGHTED Bernoulli sampling — quality-proportional
    * corpus downsampling (keep a document with probability = its
    * weight) without randomness: the per-row uniform is the first 8
    * md5 hex digits of the id (engine-portable, unlike xxhash64), the
    * threshold is `floor(w·2³²)` rendered as 8 lower-hex digits, and
    * the comparison is lexicographic == numeric on fixed-width hex.
    * Same-id rows decide identically on every engine, rerun, and
    * partitioning — so incremental batches and the DuckDB oracle agree
    * row-for-row, where `rand() < w` could never be verified. Pure
    * projection + filter: no shuffle, whole-stage codegen. Weights
    * must be in [0, 1] (NULL/out-of-range raise in-plan — a silent
    * clamp would corrupt sampling proportions); NULL ids are dropped
    * (no stable decision exists for them). `floor` is explicit because
    * Spark truncates double→long where DuckDB rounds — the classic
    * cross-engine cast trap. */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String): DataFrame = {
    val w = col(weightCol)
    val guarded = when(w.isNull || w < 0 || w > 1,
      raise_error(concat(lit(s"weightedSample: $weightCol must be in [0, 1], got "),
        w.cast("string"))).cast("double"))
      .otherwise(w)
    val u = substring(md5(col(idCol).cast("string")), 1, 8)
    val thr = lpad(lower(hex(floor(guarded * lit(4294967296.0)).cast("bigint"))), 8, "0")
    df.filter(col(idCol).isNotNull && (guarded >= 1.0 || u < thr))
  }

  /** DuckDB SQL mirror of [[weightedSample]]'s keep predicate. */
  def weightedSampleSql(idCol: String, weightExpr: String): String =
    s"""($idCol IS NOT NULL AND (($weightExpr) >= 1.0 OR
       |  substr(md5(CAST($idCol AS VARCHAR)), 1, 8) <
       |  lpad(lower(to_hex(CAST(floor(($weightExpr) * 4294967296) AS BIGINT))), 8, '0')))""".stripMargin

  /** DuckDB SQL mirror of [[hashSplit]]'s assignment expression. */
  def hashSplitSql(idCol: String, trainFrac: Double = 0.8,
                   valFrac: Double = 0.1): String = {
    val t1 = f"${(trainFrac * 256).toInt}%02x"
    val t2 = f"${((trainFrac + valFrac) * 256).toInt}%02x"
    s"""CASE WHEN $idCol IS NULL THEN NULL
       |     WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < '$t1' THEN 'train'
       |     WHEN substr(md5(CAST($idCol AS VARCHAR)), 1, 2) < '$t2' THEN 'val'
       |     ELSE 'test' END""".stripMargin
  }

  /** Training-mix materialization: per-key row CAPS (e.g. "at most
    * 100k en docs, 10k zh docs, `default` for unlisted sources"),
    * selected in the same deterministic hash order as
    * [[deterministicPerKey]] so reruns and re-partitions pick the SAME
    * mix. One window shuffle + a broadcast join against the tiny cap
    * table — the cap map lives on executors, never drives a collect. */
  def mixturePerKey(df: DataFrame, keyCol: String, idCol: String,
                    caps: Map[String, Int], default: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val capDf = broadcast(caps.toSeq.toDF(keyCol, "__cap"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(capDf, Seq(keyCol), "left")
      .filter(col("__rn") <= coalesce(col("__cap"), lit(default)))
      .select(df.columns.map(col).toIndexedSeq: _*) // using-join moved the key first
  }

  /**
   * Temperature-rebalanced corpus mixture at α = 1/2 — the LLM
   * data-recipe move of sampling domain d in proportion to n_d^α with
   * α < 1, flattening head domains and boosting tail ones. α is
   * EXACTLY one half because sqrt is the one fractional power IEEE 754
   * rounds correctly (pow(x, 0.7) can differ in the last ulp across
   * libms and flip a quota at a floor boundary; sqrt cannot), and the
   * weights are integerized — w_d = floor(sqrt(n_d)), exact for any
   * realistic domain count — so the quota arithmetic
   * `quota_d = (budget × w_d) div Σw` is all-BIGINT: deterministic,
   * order-independent, and bit-identical in any engine. Selection
   * within a domain follows the md5(id) order (engine-portable, unlike
   * xxhash64), so the chosen DOCUMENT IDENTITIES — not just the
   * per-domain counts — are reproducible and oracle-verifiable.
   * Quotas exceeding a domain's size self-cap through the rank filter.
   * One window shuffle + a broadcast quota join; the quota table is
   * one row per domain and never routes through the driver.
   */
  def temperatureMixture(df: DataFrame, keyCol: String, idCol: String,
                         budget: Long): DataFrame = {
    require(budget > 0, s"temperatureMixture: budget must be positive, got $budget")
    val counts = df.groupBy(col(keyCol))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val tot = counts.agg(sum(col("__w")).as("__tw"))
    val quotas = counts.crossJoin(tot)
      .select(col(keyCol), expr(s"($budget * __w) div __tw").as("__quota"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .join(broadcast(quotas), Seq(keyCol))
      .filter(col("__rn") <= col("__quota"))
      .select(df.columns.map(col).toIndexedSeq: _*)
  }

  /**
   * Deterministic negative sampling for contrastive training: for every
   * anchor, `k` pseudo-random candidates from the pool (anchor itself
   * excluded), reproducible across reruns, partitionings, and engines —
   * the property in-batch random sampling lacks, and the one that makes
   * a training set auditable. The rank key is `md5(anchor ':' cand)`
   * (pairwise-independent per anchor; MD5 for engine portability,
   * exactly the [[hashSplit]] rationale), so each anchor draws its OWN
   * uniform order over the pool.
   *
   * `poolSlice` ∈ (0, 1] pre-slices the pool by an INDEPENDENT hash of
   * the candidate id alone (1/256 granularity, floor semantics like
   * [[hashSplit]]) — at corpus scale you never rank the whole pool per
   * anchor; a deterministic slice bounds the join to
   * anchors × pool·slice while staying rerun-stable. The slice hash
   * must differ from the rank hash's shape (it is keyed on the
   * candidate only), so slicing never biases any anchor's order.
   *
   * Shape: slice (pure filter) → broadcast anchors onto the pool →
   * per-anchor top-k window keyed on the anchor id. NULL ids are
   * excluded from both sides (an unkeyed row can't be ranked).
   */
  def negativeSample(anchors: DataFrame, anchorIdCol: String,
                     pool: DataFrame, poolIdCol: String, k: Int,
                     poolSlice: Double = 1.0): DataFrame = {
    require(k >= 1, s"negativeSample: k must be >= 1, got $k")
    require(poolSlice > 0 && poolSlice <= 1.0,
      s"negativeSample: poolSlice must be in (0, 1], got $poolSlice")
    val t = f"${(poolSlice * 256).toInt}%02x"
    require(poolSlice == 1.0 || t > "00",
      s"negativeSample: poolSlice $poolSlice floors below 1/256 — pool would be empty")
    val cand = pool.select(col(poolIdCol).cast("string").as("__cand"))
      .filter(col("__cand").isNotNull)
    val sliced =
      if (poolSlice == 1.0) cand
      else cand.filter(substring(md5(col("__cand")), 1, 2) < t)
    val a = anchors.select(col(anchorIdCol).cast("string").as("anchor_id"))
      .filter(col("anchor_id").isNotNull).distinct()
    val w = Window.partitionBy(col("anchor_id"))
      .orderBy(md5(concat(col("anchor_id"), lit(":"), col("__cand"))), col("__cand"))
    sliced.join(broadcast(a), col("__cand") =!= col("anchor_id"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("anchor_id"), col("__cand").as("negative_id"), col("rank"))
  }

  /** DuckDB mirror of [[negativeSample]] (`$anchors`/`$pool` are table
    * or CTE names with `$aId`/`$pId` id columns). */
  def negativeSampleSql(anchors: String, aId: String, pool: String, pId: String,
                       k: Int, poolSlice: Double = 1.0): String = {
    val t = f"${(poolSlice * 256).toInt}%02x"
    val slice =
      if (poolSlice == 1.0) ""
      else s" AND substr(md5(CAST($pool.$pId AS VARCHAR)), 1, 2) < '$t'"
    s"""SELECT anchor_id, negative_id, rank FROM (
       |  SELECT CAST($anchors.$aId AS VARCHAR) AS anchor_id,
       |         CAST($pool.$pId AS VARCHAR) AS negative_id,
       |         row_number() OVER (
       |           PARTITION BY CAST($anchors.$aId AS VARCHAR)
       |           ORDER BY md5(CAST($anchors.$aId AS VARCHAR) || ':' || CAST($pool.$pId AS VARCHAR)),
       |                    CAST($pool.$pId AS VARCHAR)) AS rank
       |  FROM $anchors CROSS JOIN $pool
       |  WHERE CAST($anchors.$aId AS VARCHAR) <> CAST($pool.$pId AS VARCHAR)
       |    AND $anchors.$aId IS NOT NULL AND $pool.$pId IS NOT NULL$slice)
       |WHERE rank <= $k""".stripMargin
  }

  /**
   * Neyman-optimal stratified allocation (Neyman 1934): the sample
   * budget `total` splits across strata proportionally to N_h·S_h —
   * size × in-stratum standard deviation — the allocation minimizing
   * the stratified-mean variance at fixed budget. The sizing pass a
   * quality-stratified corpus sample runs BEFORE drawing (the draw
   * itself is [[deterministicPerKey]] with k = the allocation).
   *
   * Exactness: per-stratum (n, Σx, Σx²) are EXACT integers (cents in
   * DECIMAL(38,0) ↔ HUGEINT — magnitudes to ~1e21 fit both); the
   * population variance `(n·Σx² − (Σx)²)/n²` pays one correctly-
   * rounded double division; sqrt is IEEE-exact; and the cross-stratum
   * total Σ N_k·S_k is folded in STRATUM ORDER (array fold ↔
   * list_reduce), because a plain SUM over doubles would be
   * partition-order-dependent. Allocation = floor(total·share):
   * truncation, so Σ alloc ≤ total (largest-remainder top-up is the
   * caller's policy choice). Returns
   * `(stratum, n_rows, stddev, alloc)`. */
  def neymanAllocation(df: DataFrame, keyCol: String, valueCol: String,
                       total: Int): DataFrame = {
    import org.apache.spark.sql.types.{DecimalType, DoubleType, LongType}
    require(total >= 1, s"neymanAllocation: total=$total must be >= 1")
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * 100)
      .cast(DecimalType(38, 0))
    val stats = df.select(col(keyCol).as("stratum"), cents.as("__x"))
      .groupBy("stratum")
      .agg(count(lit(1)).as("n_rows"), sum(col("__x")).as("sx"),
        sum(col("__x") * col("__x")).as("sxx"))
    val varNum = (col("n_rows").cast(DecimalType(38, 0)) * col("sxx")) -
      (col("sx") * col("sx"))
    val sd = sqrt(varNum.cast(DoubleType)
      / (col("n_rows").cast(DoubleType) * col("n_rows").cast(DoubleType)))
    val scored = stats.withColumn("stddev", sd)
      .withColumn("nhsh", col("n_rows").cast(DoubleType) * col("stddev"))
    val tot = scored.agg(expr(
      """aggregate(
        |  transform(array_sort(collect_list(struct(stratum, nhsh))), s -> s.nhsh),
        |  CAST(0.0 AS DOUBLE), (a, x) -> a + x)""".stripMargin).as("__tot"))
    scored.crossJoin(broadcast(tot))
      .select(col("stratum"), col("n_rows"), col("stddev"),
        floor(lit(total.toDouble) * col("nhsh") / col("__tot"))
          .cast(LongType).as("alloc"))
  }

  /**
   * Deterministic K-FOLD assignment — fold = first md5 byte of the id
   * mod k, the cross-validation counterpart of [[hashSplit]] with the
   * same contract: stateless, shuffle-free, engine-portable, so fold
   * membership survives re-runs, repartitions, and incremental
   * appends (a row's fold never depends on other rows — the property
   * randomSplit cannot give). k ≤ 16 keeps the 256-value byte's fold
   * imbalance under 3% worst-case (256 mod k spillover); NULL ids get
   * NULL folds, surfaced.
   */
  def kfold(df: DataFrame, idCol: String, k: Int): DataFrame = {
    require(k >= 2 && k <= 16, s"kfold: k in [2, 16], got $k")
    df.withColumn("fold",
      when(col(idCol).isNotNull,
        expr(s"CAST(conv(substring(md5(CAST($idCol AS STRING)), 1, 2), 16, 10) " +
          s"AS BIGINT) % $k")))
  }

  /** DuckDB mirror of [[kfold]] — emits the labeled SELECT over `rel`
    * carrying `cols`. */
  def kfoldSql(rel: String, idCol: String, k: Int, cols: Seq[String]): String = {
    val cs = cols.mkString(", ")
    s"""SELECT $cs,
       |  CASE WHEN $idCol IS NOT NULL THEN
       |    CAST(('0x' || substr(md5(CAST($idCol AS VARCHAR)), 1, 2)) AS BIGINT) % $k
       |  END AS fold
       |FROM $rel""".stripMargin
  }

  /**
   * EMBARGOED TEMPORAL SPLIT — train strictly before `cutoff` minus an
   * `embargoDays` buffer, test at-or-after `cutoff`, and the buffer
   * rows DROPPED: the leakage guard for temporally-correlated data
   * (finance CV's "purged" split — a trailing feature computed at the
   * train boundary would otherwise read test-period rows). Pure
   * stateless filters: reproducible on any layout, no shuffle beyond
   * the caller's. Returns rows labeled `split` ∈ {train, test};
   * embargo rows are absent by construction, not flagged.
   */
  def timeSplit(df: DataFrame, tsCol: String, cutoff: String,
                embargoDays: Int): DataFrame = {
    require(embargoDays >= 0, s"timeSplit: embargoDays must be >= 0")
    val cut = to_date(lit(cutoff))
    val d = col(tsCol).cast(org.apache.spark.sql.types.DateType)
    df.withColumn("split",
        when(d < date_sub(cut, embargoDays), lit("train"))
          .when(d >= cut, lit("test")))
      .filter(col("split").isNotNull)
  }

  /** DuckDB mirror of [[timeSplit]] — emits the labeled SELECT over
    * `rel` carrying `cols`. */
  def timeSplitSql(rel: String, tsCol: String, cutoff: String,
                   embargoDays: Int, cols: Seq[String]): String = {
    val cs = cols.mkString(", ")
    s"""SELECT $cs,
       |  CASE WHEN CAST($tsCol AS DATE) < DATE '$cutoff' - INTERVAL $embargoDays DAY
       |         THEN 'train'
       |       WHEN CAST($tsCol AS DATE) >= DATE '$cutoff' THEN 'test' END AS split
       |FROM $rel
       |WHERE CAST($tsCol AS DATE) < DATE '$cutoff' - INTERVAL $embargoDays DAY
       |   OR CAST($tsCol AS DATE) >= DATE '$cutoff'""".stripMargin
  }

  /**
   * CLASS REBALANCING — downsample every class to the size of the
   * SMALLEST class (the uniform-prior training set for a skewed label
   * column), selecting rows per class by `(md5(id), id)` order: the
   * same stateless, engine-portable determinism contract as
   * [[hashSplit]] — re-runs, any partitioning, and the oracle pick the
   * identical rows, where a `sampleBy`-fraction approach would neither
   * hit the exact count nor replay. One keyed count (broadcast scalar
   * min) + one per-class window over hash order.
   */
  def rebalanceClasses(df: DataFrame, labelCol: String, idCol: String): DataFrame = {
    val minN = df.filter(col(labelCol).isNotNull)
      .groupBy(col(labelCol)).agg(count(lit(1)).as("__n"))
      .agg(min("__n").as("__min_n"))
    val w = Window.partitionBy(col(labelCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.filter(col(labelCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .crossJoin(broadcast(minN))
      .filter(col("__rn") <= col("__min_n"))
      .drop("__rn", "__min_n")
  }

  /** DuckDB mirror of [[rebalanceClasses]] — same md5 pick order.
    * Emits the full mirrored SELECT over `rel`; `cols` lists the
    * output columns to carry. */
  def rebalanceClassesSql(rel: String, labelCol: String, idCol: String,
                          cols: Seq[String]): String = {
    val cs = cols.mkString(", ")
    s"""WITH ranked AS (SELECT $cs,
       |    row_number() OVER (PARTITION BY $labelCol
       |      ORDER BY md5(CAST($idCol AS VARCHAR)), $idCol) AS rn
       |  FROM $rel WHERE $labelCol IS NOT NULL),
       |mn AS (SELECT MIN(n) AS min_n FROM (
       |    SELECT count(*) AS n FROM $rel WHERE $labelCol IS NOT NULL
       |    GROUP BY $labelCol))
       |SELECT $cs FROM ranked, mn WHERE rn <= min_n""".stripMargin
  }

  /** Poisson(1) CDF thresholds scaled to 2³² and floored — the ONE
    * source both engines' CASE ladders are generated from, so the
    * replicate weights are identical bit-for-bit. P(K ≤ k) for
    * k = 0..7; counts are capped at 8 (P ≈ 1 − 1.1e-7 at the cap). */
  private[ops] val PoissonCdf32: Seq[Long] = {
    val e1 = math.exp(-1.0)
    val pmf = Iterator.iterate((e1, 0)) { case (p, k) => (p / (k + 1), k + 1) }
      .map(_._1).take(8).toSeq
    pmf.scanLeft(0.0)(_ + _).tail.map(c => math.floor(c * 4294967296.0).toLong)
  }

  /**
   * Deterministic POISSON BOOTSTRAP — `replicas` resampled copies of
   * the data where each row's multiplicity in replica r is a
   * Poisson(1) draw derived from `md5(id:r)` (the classic
   * streaming-friendly bootstrap: multinomial resampling needs the
   * global row count per draw; independent Poisson(1) weights need
   * only the row). Returns per-replica weighted aggregates of
   * `valueCol` (must be integral cents): `(replica, n_eff, mean)` —
   * the spread across replica means IS the standard error of the
   * mean, measured rather than assumed.
   *
   * Determinism contract of [[hashSplit]]: stateless per (row,
   * replica), engine-portable MD5, no RNG state — re-runs, different
   * partitionings, and the DuckDB oracle all produce the SAME
   * replicas. The fan-out is rows×replicas but each fanned row is two
   * longs wide and immediately aggregated map-side; sums are
   * DECIMAL(38,0)-exact.
   */
  def poissonBootstrap(df: DataFrame, idCol: String, valueCol: String,
                       replicas: Int): DataFrame = {
    require(replicas >= 2 && replicas <= 1024,
      s"poissonBootstrap: replicas must be in [2, 1024], got $replicas")
    val dec38 = org.apache.spark.sql.types.DecimalType(38, 0)
    val u = expr("CAST(conv(substring(md5(concat(CAST(__id AS STRING), ':', " +
      "CAST(replica AS STRING))), 1, 8), 16, 10) AS BIGINT)")
    val cnt = PoissonCdf32.zipWithIndex.foldRight(lit(8L): org.apache.spark.sql.Column) {
      case ((thr, k), rest) => when(col("__u") < thr, lit(k.toLong)).otherwise(rest)
    }
    df.select(col(idCol).as("__id"),
        col(valueCol).cast(org.apache.spark.sql.types.LongType).as("__v"),
        explode(sequence(lit(0), lit(replicas - 1))).as("replica"))
      .withColumn("__u", u)
      .withColumn("__w", cnt)
      .groupBy("replica")
      .agg(sum("__w").as("n_eff"),
        sum(col("__w").cast(dec38) * col("__v").cast(dec38)).as("__sv"))
      .select(col("replica").cast(org.apache.spark.sql.types.LongType).as("replica"),
        col("n_eff"),
        when(col("n_eff") > 0,
          col("__sv").cast(org.apache.spark.sql.types.DoubleType) /
            col("n_eff").cast(org.apache.spark.sql.types.DoubleType)).as("mean"))
  }

  /** DuckDB mirror of [[poissonBootstrap]] — same md5 weights from the
    * same threshold literals, same exact sums. The HUGEINT Σ(w·v)
    * routes through [[graft.Det.hiLoDoubleSql]] (not correctly rounded
    * past 2^53 via a direct cast, while Spark's Decimal→Double is). */
  def poissonBootstrapSql(rel: String, idCol: String, valueCol: String,
                          replicas: Int): String = {
    val ladder = PoissonCdf32.zipWithIndex
      .map { case (thr, k) => s"WHEN u < $thr THEN $k" }
      .mkString(" ")
    s"""WITH fan AS (SELECT CAST($idCol AS VARCHAR) AS id,
       |    CAST($valueCol AS BIGINT) AS v, r.replica
       |  FROM $rel, (SELECT unnest(generate_series(0, ${replicas - 1})) AS replica) r),
       |w AS (SELECT replica, v,
       |    CASE $ladder ELSE 8 END AS w
       |  FROM (SELECT *, CAST(('0x' || substr(md5(id || ':' || CAST(replica AS VARCHAR)), 1, 8))
       |          AS BIGINT) AS u FROM fan)),
       |agg AS (SELECT replica, SUM(w) AS sw, SUM(CAST(w AS HUGEINT) * v) AS sv
       |  FROM w GROUP BY 1)
       |SELECT CAST(replica AS BIGINT) AS replica,
       |  CAST(sw AS BIGINT) AS n_eff,
       |  CASE WHEN sw > 0 THEN
       |    ${graft.Det.hiLoDoubleSql("sv")} / CAST(sw AS BIGINT) END AS mean
       |FROM agg""".stripMargin
  }

  /**
   * SYSTEMATIC PPS SAMPLING (probability proportional to size, the
   * classical survey design): lay the units out on a line in frame
   * order (`idCol` ascending — ids must be unique so the frame is a
   * total order), each unit occupying its weight in length; drop `n`
   * equally-spaced picks at `start + k·step` (step = ⌊W/n⌋,
   * start = ⌊step/2⌋ — centered, deterministic, RNG-free) and select
   * every unit whose interval contains a pick. Units heavier than one
   * step are selected multiple times (`n_hits` — the with-replacement
   * convention that keeps H-T estimation unbiased). The number of
   * picks at-or-below cumulative position x is
   * `q(x) = min(⌊(x − start + step)/step⌋, n)` (one branch-free floor:
   * the +step shift keeps the dividend positive for every x ≥ 0, and
   * the min caps the pick count at n where ⌊W/n⌋ rounding would
   * otherwise admit pick n at the very tail), so
   * `n_hits = q(cum) − q(cum − w)` — pure exact-integer arithmetic.
   *
   * The global cumulative position is an EXACT DISTRIBUTED PREFIX SUM
   * — never a global-ORDER-BY window (which Spark plans as a single
   * partition holding the whole corpus): range-repartition by id, one
   * per-partition keyed window for the local running sum, plus a
   * BOUNDED per-partition total table (one row per partition — the
   * watermark-read pattern) turned into broadcast exclusive offsets.
   * The layout is pinned once (localCheckpoint) so the offset pass and
   * the window pass see the same partitions; the OUTPUT is a pure
   * function of the frame order, whatever layout the range sampler
   * picked.
   *
   * Output: selected units only —
   * `(idCol, w, cum, n_hits, pi_ppm = min(⌊10⁶·n·w/W⌋, 10⁶))`
   * (pi is the first-order inclusion probability, the H-T weight's
   * denominator). Weights must be positive BIGINTs with
   * `n·w·10⁶ < 2⁶³` (lift to DECIMAL(38) past that); requires W ≥ n so
   * step ≥ 1.
   */
  def ppsSystematic(df: DataFrame, idCol: String, weightCol: String,
                    n: Int): DataFrame = {
    import org.apache.spark.sql.types.LongType
    require(n >= 1, s"ppsSystematic: n must be >= 1, got $n")
    val parts = df
      .select(col(idCol), col(weightCol).cast(LongType).as("w"))
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint()
    val stats = parts.agg(
      count(lit(1)) - count(col("w")), min("w"), sum("w")).head
    require(stats.getLong(0) == 0,
      s"ppsSystematic: ${stats.getLong(0)} NULL weight(s)")
    require(stats.getLong(1) >= 1, "ppsSystematic: weights must be positive")
    val total = stats.getLong(2)
    require(total >= n,
      s"ppsSystematic: total weight $total < n=$n (step would be 0)")
    val step = total / n
    val start = step / 2
    // bounded: one row per partition → exclusive prefix offsets
    val perPart = parts.groupBy(col("__pid")).agg(sum("w").as("__psum"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val offsets = perPart.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) =>
      (pid, acc + s)
    }.init.zip(perPart).map { case ((_, off), (pid, _)) => (pid, off) }
    val spark = df.sparkSession
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    parts.join(broadcast(offDf), Seq("__pid"))
      .withColumn("cum", sum(col("w")).over(w) + col("__off"))
      .withColumn("n_hits",
        expr(s"least((cum - $start + $step) div $step, $n)" +
          s" - least((cum - w - $start + $step) div $step, $n)"))
      .filter(col("n_hits") >= 1)
      .select(col(idCol), col("w"), col("cum"), col("n_hits"),
        expr(s"least((w * $n * 1000000) div $total, 1000000)").as("pi_ppm"))
  }

  /** DuckDB mirror of [[ppsSystematic]] — the oracle may use the plain
    * global cumulative window (single-node engine; the distributed
    * prefix sum reproduces exactly this frame order). `rel` must expose
    * (idCol, weight `w`). */
  def ppsSystematicSql(rel: String, idCol: String, n: Int): String =
    s"""WITH pps_src AS (SELECT $idCol, CAST(w AS BIGINT) AS w FROM $rel),
       |pps_tot AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM pps_src),
       |pps_par AS (SELECT total, total // $n AS step, (total // $n) // 2 AS start
       |            FROM pps_tot),
       |pps_cum AS (SELECT $idCol, w,
       |    CAST(SUM(w) OVER (ORDER BY $idCol ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
       |  FROM pps_src)
       |SELECT $idCol, w, cum,
       |  LEAST((cum - start + step) // step, $n)
       |    - LEAST((cum - w - start + step) // step, $n) AS n_hits,
       |  LEAST((w * $n * 1000000) // total, 1000000) AS pi_ppm
       |FROM pps_cum CROSS JOIN pps_par
       |WHERE LEAST((cum - start + step) // step, $n)
       |    - LEAST((cum - w - start + step) // step, $n) >= 1""".stripMargin
}
