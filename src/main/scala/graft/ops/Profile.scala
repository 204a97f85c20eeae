package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Table profiling (the engine's `ANALYZE TABLE` / dbt-docs column-stats
 * surface): one output row per profiled column with null count, exact
 * distinct count, and numeric min/max. The reference's dbt models carry
 * schema tests but no profiling; this is the data-quality
 * reconnaissance pass every curation pipeline runs before writing
 * filter thresholds.
 *
 * Scale shape: one aggregate leg per column, unioned. Deliberately NOT
 * one mixed multi-DISTINCT aggregate — Spark plans that as an Expand
 * that multiplies every scan row by the number of distinct aggregates
 * (the round-4 `agg_stats_by_flag` lesson). As separate legs each scan
 * is a one-column parquet read (column pruning), so total IO across all
 * legs equals ONE full-table pass, with no row multiplication and
 * per-leg map-side partial aggregation. At 100 TB swap the exact
 * distinct for `approx_count_distinct` per leg — same plan, bounded
 * state (documented rather than defaulted, because the oracle contract
 * here is exact).
 */
object Profile {

  /** Profile `cols` of `df`. Numeric columns report min/max cast to
    * double; non-numeric report NULL (casting a min through a string
    * would not be engine-portable — numeric-to-string formats differ).
    * `n_distinct` counts distinct NON-NULL values (SQL COUNT DISTINCT). */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile: no columns given")
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val legs = cols.map { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      val (mn, mx) =
        if (numeric) (min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      df.agg(
        count(lit(1)).minus(count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        mn.as("min_value"), mx.as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          col("min_value"), col("max_value"))
    }
    legs.reduce(_ unionByName _)
  }

  /** The 100 TB profile: identical leg plan to [[profile]] but the
    * distinct count is `approx_count_distinct` (HLL++, `rsd` relative
    * error) — bounded aggregation state per leg instead of an exact
    * distinct's full key set. The estimate is not oracle-computable
    * (DuckDB's HLL differs), so alongside the EXACT count each leg
    * emits `approx_ok`: the estimate bound-checked against 5× the
    * configured rsd, the same contract as `agg_approx_distinct` — a
    * broken sketch hash-mismatches instead of sliding through. */
  def profileApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileApprox: no columns given")
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val legs = cols.map { c =>
      val numeric = types(c).isInstanceOf[NumericType]
      val (mn, mx) =
        if (numeric) (min(col(c)).cast(DoubleType), max(col(c)).cast(DoubleType))
        else (lit(null).cast(DoubleType), lit(null).cast(DoubleType))
      df.agg(
        count(lit(1)).minus(count(col(c))).as("n_nulls"),
        countDistinct(col(c)).as("n_distinct"),
        approx_count_distinct(col(c), rsd).as("n_distinct_approx"),
        mn.as("min_value"), mx.as("max_value"))
        .select(lit(c).as("column_name"), col("n_nulls"), col("n_distinct"),
          // all-NULL column: both counts are 0 and the bound is vacuous
          (col("n_distinct") === 0 && col("n_distinct_approx") === 0 ||
            abs(col("n_distinct_approx") - col("n_distinct")).cast(DoubleType) /
              col("n_distinct") <= rsd * 5).cast(IntegerType).as("approx_ok"),
          col("min_value"), col("max_value"))
    }
    legs.reduce(_ unionByName _)
  }

  /** DuckDB SQL mirror of one [[profileApprox]] leg (asserts the flag). */
  def profileApproxLegSql(table: String, c: String, numeric: Boolean): String = {
    val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  CAST(1 AS INTEGER) AS approx_ok,
       |  $mn AS min_value, $mx AS max_value FROM $table""".stripMargin
  }

  /** Bounded-state PERCENTILE profiling — the missing leg that makes
    * the whole profile family 100 TB-safe: [[profileApprox]] bounds the
    * distinct counts (HLL++), this bounds the percentiles (histogram
    * bins) — nothing in the family ever sorts a column or holds a full
    * key set. All `cols` profile in ONE pass: the columns unpivot to
    * `(column_name, value)` long form — an Expand projection, rows ×
    * |cols|, no shuffle — and a single [[binnedQuantiles]] run keyed on
    * `column_name` does the rest (intermediate = |cols| × bins rows at
    * ANY input size). Columns must be numeric and non-negative (the
    * binning contract; violations raise in-plan) and share one
    * `binWidthCents` — estimation error ≤ bin width applies per column,
    * so pick the width for the coarsest-scaled column you profile.
    * Output: one row per column, `(column_name, p50, p95, …)`. */
  def profileQuantiles(df: DataFrame, cols: Seq[String], binWidthCents: Long,
                       ps: Seq[Double]): DataFrame = {
    require(cols.nonEmpty, "profileQuantiles: no columns given")
    val types = df.schema.map(f => f.name -> f.dataType).toMap
    val nonNumeric = cols.filter(c => !types.get(c).exists(_.isInstanceOf[NumericType]))
    require(nonNumeric.isEmpty,
      s"profileQuantiles: non-numeric column(s): ${nonNumeric.mkString(", ")}")
    val long = df.unpivot(
      Array.empty[org.apache.spark.sql.Column],
      cols.map(c => col(c).cast(DoubleType).as(c)).toArray,
      "column_name", "__v")
    binnedQuantiles(long, Seq("column_name"), "__v", binWidthCents, ps)
  }

  /** Winsorization — robust-statistics outlier clipping, the
    * preprocessing step quality filters reach for when hard thresholds
    * are too blunt: every value is clipped into its GROUP's
    * [pLo, pHi] band, with the band estimated by [[binnedQuantiles]]
    * (so the whole operation stays bounded-state at 100 TB: no
    * per-group sort, the band table is keys-cardinality and joins back
    * onto the rows — broadcast when small, plain equi-join otherwise).
    * Output: the input plus `<valueCol>_wins` (double, clipped); the
    * original column is untouched for auditability. */
  def winsorize(df: DataFrame, keys: Seq[String], valueCol: String,
                binWidthCents: Long, pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"winsorize: need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    val bands = binnedQuantiles(df, keys, valueCol, binWidthCents, Seq(pLo, pHi))
      .withColumnRenamed(quantileColName(pLo), "__lo")
      .withColumnRenamed(quantileColName(pHi), "__hi")
    df.join(bands, keys)
      .withColumn(s"${valueCol}_wins",
        least(greatest(col(valueCol).cast(DoubleType), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }

  /** Histogram drift between two slices of the same column — the
    * training-data distribution-shift monitor (the role PSI plays in
    * production ML pipelines): bin both slices into a FIXED grid,
    * compare the share vectors with L1 distance and χ², flag when L1
    * exceeds the conventional 0.1 alert threshold. PSI's ln() is
    * libm-dependent and banned from oracle paths; L1 and χ² order the
    * same drifts.
    *
    * Determinism: bin counts are exact BIGINTs; the per-bin float
    * terms are summed by an ORDERED FOLD over the bin-sorted array
    * (both engines reduce left-to-right over the same sequence —
    * a plain SUM of doubles would be partitioning-dependent). The
    * fixed [lo, hi) grid (out-of-range values clamp to the edge bins)
    * makes runs comparable across time, which is the point of a drift
    * monitor; NULLs are excluded (profile them separately).
    *
    * Scale shape: two keyed bin aggregates (map-side combined) + one
    * nBins-row join folded on the driver side of the plan — state is
    * O(nBins) whatever the input size. Returns ONE row:
    * `(n_bins, tot_a, tot_b, l1, chisq, drifted)`. */
  def histogramDrift(a: DataFrame, b: DataFrame, valueCol: String,
                     lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 2 && hi > lo, s"histogramDrift: bad grid ($lo, $hi, $nBins)")
    val width = hi - lo
    def binned(df: DataFrame, n: String) = df
      .filter(col(valueCol).isNotNull)
      .select(least(lit(nBins - 1L), greatest(lit(0L),
        floor((col(valueCol).cast(DoubleType) - lit(lo)) / lit(width) * lit(nBins.toDouble))
          .cast(LongType))).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(n))
    val j = binned(a, "na").join(binned(b, "nb"), Seq("bin"), "full_outer")
      .select(col("bin"), coalesce(col("na"), lit(0L)).as("na"),
        coalesce(col("nb"), lit(0L)).as("nb"))
    val one = j.agg(
      count(lit(1)).as("n_bins"),
      sum("na").as("tot_a"), sum("nb").as("tot_b"),
      sort_array(collect_list(struct(col("bin"), col("na"), col("nb")))).as("__bins"))
    def share(f: org.apache.spark.sql.Column, tot: String) =
      f.cast(DoubleType) / col(tot).cast(DoubleType)
    val l1Terms = transform(col("__bins"),
      x => abs(share(x.getField("na"), "tot_a") - share(x.getField("nb"), "tot_b")))
    val chiTerms = transform(col("__bins"), { x =>
      val d = share(x.getField("na"), "tot_a") - share(x.getField("nb"), "tot_b")
      d * d / greatest(share(x.getField("nb"), "tot_b"), lit(1e-9))
    })
    def fold(terms: org.apache.spark.sql.Column) =
      aggregate(terms, lit(0.0), (acc, v) => acc + v)
    one.select(col("n_bins"), col("tot_a"), col("tot_b"),
      fold(l1Terms).as("l1"), fold(chiTerms).as("chisq"))
      .withColumn("drifted", col("l1") > 0.1)
  }

  /** DuckDB mirror of [[histogramDrift]] over relations `aRel`/`bRel`
    * (same ordered-fold reduction, same clamped grid). */
  def histogramDriftSql(aRel: String, bRel: String, valueCol: String,
                        lo: Double, hi: Double, nBins: Int): String = {
    val width = (hi - lo).toString
    def binExpr =
      s"""least(${nBins - 1}, greatest(0, CAST(floor(
         |  (CAST($valueCol AS DOUBLE) - $lo) / $width * ${nBins.toDouble}) AS BIGINT)))""".stripMargin
    def sh(f: String, tot: String) = s"CAST(x.$f AS DOUBLE) / CAST($tot AS DOUBLE)"
    val dTerm = s"${sh("na", "tot_a")} - ${sh("nb", "tot_b")}"
    s"""WITH ca AS (SELECT $binExpr AS bin, count(*) AS na
       |            FROM $aRel WHERE $valueCol IS NOT NULL GROUP BY 1),
       |cb AS (SELECT $binExpr AS bin, count(*) AS nb
       |       FROM $bRel WHERE $valueCol IS NOT NULL GROUP BY 1),
       |j AS (SELECT COALESCE(ca.bin, cb.bin) AS bin, COALESCE(na, 0) AS na,
       |             COALESCE(nb, 0) AS nb
       |      FROM ca FULL OUTER JOIN cb ON ca.bin = cb.bin),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS n_bins,
       |               CAST(SUM(na) AS BIGINT) AS tot_a, CAST(SUM(nb) AS BIGINT) AS tot_b,
       |               list(struct_pack(bin := bin, na := na, nb := nb) ORDER BY bin) AS bins
       |        FROM j)
       |SELECT n_bins, tot_a, tot_b, l1, chisq, l1 > 0.1 AS drifted FROM (
       |  SELECT n_bins, tot_a, tot_b,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(bins, x -> abs($dTerm))), (acc, v) -> acc + v) AS l1,
       |    list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
       |      list_transform(bins, x -> ($dTerm) * ($dTerm)
       |        / greatest(${sh("nb", "tot_b")}, 1e-9))), (acc, v) -> acc + v) AS chisq
       |  FROM agg)""".stripMargin
  }

  /** EXACT per-group median with BOUNDED state — the two-pass
    * bin-then-select that makes an exact quantile feasible at 100 TB
    * where a global sort is not: pass 1 is one keyed (group, bin)
    * count (map-side combined, state = groups × bins); the driver
    * walks the bin histogram (bounded metadata, the watermark-read
    * pattern) to find each group's median bin and residual rank; pass
    * 2 ranks ONLY the median bin's rows. The selected value is the
    * LOWER median (rank ⌊(n+1)/2⌋ ascending) — exact, not interpolated,
    * deterministic in both engines. `binWidthCents` trades pass-2 scan
    * volume against histogram size; a still-huge bin recurses the same
    * trick (documented, not needed at test scale). Values ride cents
    * BIGINT. Returns `(group, n, median_cents)`. */
  def exactMedianBinned(df: DataFrame, keyCol: String, valueCol: String,
                        binWidthCents: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(binWidthCents >= 1, s"exactMedianBinned: binWidthCents=$binWidthCents")
    val cents = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    val base = df.filter(col(valueCol).isNotNull)
      .select(col(keyCol).as("g"), cents.as("c"))
    val hist = base.withColumn("bin", floor(col("c") / binWidthCents).cast(LongType))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))
    // driver walk: groups × bins rows — bounded metadata
    val plan = hist.collect().groupBy(_.getAs[Any]("g")).map { case (g, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      val total = sorted.map(_.getAs[Long]("n")).sum
      val k = (total + 1) / 2
      var cum = 0L
      val hit = sorted.find { r =>
        val nb = r.getAs[Long]("n"); val in = cum + nb >= k; if (!in) cum += nb; in
      }.get
      (g, hit.getAs[Long]("bin"), k - cum, total)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val planDf = spark.createDataFrame(
      spark.sparkContext.parallelize(plan.map(p => org.apache.spark.sql.Row(
        p._1, p._2, p._3, p._4)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        hist.schema("g").copy(name = "pg"),
        org.apache.spark.sql.types.StructField("mbin", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("r", org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("n_total", org.apache.spark.sql.types.LongType))))
    val w = Window.partitionBy("g").orderBy(col("c"))
    base.join(broadcast(planDf), col("g") === col("pg")
        && floor(col("c") / binWidthCents).cast(LongType) === col("mbin"))
      .drop("pg")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === col("r"))
      .select(col("g").as(keyCol), col("n_total").as("n"),
        col("c").as("median_cents"))
  }

  /** Two-sample Kolmogorov–Smirnov distance — the classical
    * distribution-shift test next to [[histogramDrift]]'s binned L1:
    * D = max over pooled values of |F_a(v) − F_b(v)|. The statistic is
    * kept EXACT until the last step: at each pooled distinct value the
    * comparison quantity is the integer |C_a·n_b − C_b·n_a| (cumulative
    * counts cross-multiplied — the common-denominator form of the ECDF
    * gap), carried in DECIMAL(38,0) so the max/argmax involve no float
    * comparison at any corpus size; KS = d_num/(n_a·n_b) pays the one
    * double division at the end.
    *
    * Scale shape: one keyed count per pooled value + one GLOBAL
    * cumulative window over the distinct values — bounded by the
    * column's distinct cardinality, not row count. For a 100 TB raw
    * column, pre-quantize (bin) the value first and accept binned-KS —
    * identical code over the binned column; the exact form here is the
    * profiling-scale contract. Returns one row
    * `(n_a, n_b, d_num, ks)`. */
  def ksTest(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    def side(df: DataFrame, ia: Long, ib: Long) = df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(DoubleType).as("v"),
        lit(ia).as("ia"), lit(ib).as("ib"))
    val per = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy("v").agg(sum("ia").as("ca"), sum("ib").as("cb"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = per.agg(sum("ca").as("na"), sum("cb").as("nb"))
    per.select(col("v"), sum("ca").over(w).as("fa"), sum("cb").over(w).as("fb"))
      .crossJoin(broadcast(tot))
      .select(abs(dec(col("fa")) * dec(col("nb")) - dec(col("fb")) * dec(col("na")))
        .as("dnum"), col("na"), col("nb"))
      .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
        max(col("dnum")).as("__d"))
      .select(col("n_a"), col("n_b"), col("__d").cast(LongType).as("d_num"),
        (col("__d").cast(DoubleType)
          / (dec(col("n_a")) * dec(col("n_b"))).cast(DoubleType)).as("ks"))
  }

  /**
   * Mann–Whitney U rank-sum test between two samples — the
   * nonparametric "did the distribution shift" companion to [[ksTest]]
   * (U is sensitive to location where KS is sensitive to any shape
   * difference). Same bounded-state shape as ksTest: ranks come from
   * the VALUE-COUNT table (state = distinct values, never a per-row
   * rank window), so 10⁹ rows with bounded value domains aggregate
   * map-side first.
   *
   * Exactness: everything up to `z` is exact integer arithmetic in
   * DOUBLED rank units — a tied group's average rank `(min+max)/2` can
   * end in .5, so we carry `2·avgrank = 2·cum − c + 1` and the doubled
   * statistics `u2 = 2·U` stay BIGINT-exact (DECIMAL(38,0)
   * accumulators; Σ(c³−c) for the tie correction outgrows BIGINT on
   * heavy ties). `z` is the normal approximation with tie-corrected
   * variance — one fixed chain of correctly-rounded IEEE ops mirrored
   * verbatim in [[mannWhitneySql]]. Degenerate pools (all values tied,
   * an empty side, or ≤1 total rows) have zero/undefined variance and
   * yield `z_a = NULL` in both engines (DuckDB's x/0.0 IS NULL; the
   * Spark side guards explicitly because ANSI division throws).
   */
  def mannWhitney(a: DataFrame, b: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    def side(df: DataFrame, ia: Long, ib: Long) = df
      .filter(col(valueCol).isNotNull)
      .select(col(valueCol).cast(LongType).as("v"),
        lit(ia).as("ia"), lit(ib).as("ib"))
    val per = side(a, 1L, 0L).unionByName(side(b, 0L, 1L))
      .groupBy("v").agg(sum("ia").as("ca"), sum("ib").as("cb"))
      .withColumn("c", col("ca") + col("cb"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val agg = per
      .withColumn("cum", sum("c").over(w))
      .agg(
        sum("ca").as("n_a"), sum("cb").as("n_b"),
        sum(dec(col("ca")) * dec(lit(2) * col("cum") - col("c") + lit(1))).as("__r2a"),
        sum(dec(col("c")) * dec(col("c")) * dec(col("c")) - dec(col("c"))).as("__ties"))
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    // Degenerate pools (every value tied, or an empty side) have zero
    // tie-corrected variance: z is undefined → NULL in BOTH engines
    // (DuckDB's x/0.0 is NULL; ANSI Spark throws, so guard explicitly).
    val sd = lit(2.0) * sqrt(
      (d(col("n_a")) * d(col("n_b")) / lit(12.0)) *
        ((d(col("n_a") + col("n_b")) + lit(1.0)) -
          when(col("n_a") + col("n_b") > lit(1),
            d(col("tie_cubes")) /
              (d(col("n_a") + col("n_b")) * (d(col("n_a") + col("n_b")) - lit(1.0))))))
    agg
      .withColumn("u2_a",
        (col("__r2a") - dec(col("n_a")) * dec(col("n_a") + lit(1))).cast(LongType))
      .withColumn("u2_b",
        (dec(lit(2)) * dec(col("n_a")) * dec(col("n_b")) - col("u2_a")).cast(LongType))
      .withColumn("tie_cubes", col("__ties").cast(LongType))
      .withColumn("z_a",
        when(sd > lit(0.0), (d(col("u2_a")) - d(col("n_a")) * d(col("n_b"))) / sd))
      .select(col("n_a"), col("n_b"), col("u2_a"), col("u2_b"),
        col("tie_cubes"), col("z_a"))
  }

  /** DuckDB mirror of [[mannWhitney]] — same value-count chain, same
    * doubled-rank integers, identical z expression tree. */
  def mannWhitneySql(aRel: String, bRel: String, valueCol: String): String =
    s"""WITH pooled AS (
       |  SELECT CAST($valueCol AS BIGINT) AS v, 1 AS ia, 0 AS ib
       |  FROM $aRel WHERE $valueCol IS NOT NULL
       |  UNION ALL
       |  SELECT CAST($valueCol AS BIGINT) AS v, 0 AS ia, 1 AS ib
       |  FROM $bRel WHERE $valueCol IS NOT NULL),
       |per AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb, SUM(ia) + SUM(ib) AS c
       |        FROM pooled GROUP BY v),
       |cum AS (SELECT v, ca, cb, c,
       |          SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum
       |        FROM per),
       |agg AS (SELECT
       |    CAST(SUM(ca) AS BIGINT) AS n_a, CAST(SUM(cb) AS BIGINT) AS n_b,
       |    SUM(CAST(ca AS HUGEINT) * CAST(2 * cum - c + 1 AS HUGEINT)) AS r2a,
       |    SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
       |        - CAST(c AS HUGEINT)) AS ties
       |  FROM cum),
       |st AS (SELECT n_a, n_b,
       |    CAST(r2a - CAST(n_a AS HUGEINT) * CAST(n_a + 1 AS HUGEINT) AS BIGINT) AS u2_a,
       |    CAST(ties AS BIGINT) AS tie_cubes
       |  FROM agg)
       |SELECT n_a, n_b, u2_a,
       |  CAST(CAST(2 AS HUGEINT) * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT)
       |       - u2_a AS BIGINT) AS u2_b,
       |  tie_cubes,
       |  (CAST(u2_a AS DOUBLE) - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) /
       |    (2.0 * sqrt(
       |      (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / 12.0) *
       |        ((CAST(n_a + n_b AS DOUBLE) + 1.0) -
       |          CAST(tie_cubes AS DOUBLE) /
       |            (CAST(n_a + n_b AS DOUBLE) * (CAST(n_a + n_b AS DOUBLE) - 1.0)))))
       |  AS z_a
       |FROM st""".stripMargin

  /**
   * Spearman rank correlation between two integral columns — Pearson
   * over average ranks, the monotone-association measure that survives
   * nonlinear (but monotone) relationships and outliers where raw
   * Pearson folds. Ranks come from each column's VALUE-COUNT table
   * (the [[mannWhitney]] machinery): 2·avgrank = 2·cum − c + 1 keeps
   * tied-group average ranks in exact DOUBLED integer units, and each
   * row picks up its two ranks by joining the (distinct-value-sized)
   * lookups — bounded rank state, never a per-row rank window.
   *
   * All six sufficient statistics (n, Σrx, Σry, Σrx², Σry², Σrx·ry)
   * accumulate in DECIMAL(38,0) — exact and order-independent at any
   * cardinality. ρ = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)·(nΣy²−(Σy)²)) is the
   * one fixed-arity double chain at the end (doubling both rank scales
   * cancels). The denominator is ONE sqrt over the variance product —
   * `sqrt(a)*sqrt(b)` loses an ulp even when a = b, turning a perfect
   * monotone's exact 1.0 into 0.99999999999999978. A constant column
   * has zero rank variance → ρ NULL in both engines (DuckDB x/0.0 IS
   * NULL; ANSI Spark guarded).
   */
  def spearman(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val base = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
    def rankLookup(c: String) = {
      val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
      base.groupBy(col(c).as("v")).agg(count(lit(1)).as("c"))
        .select(col("v"), (lit(2) * sum("c").over(w) - col("c") + lit(1)).as(s"r_$c"))
    }
    val ranked = base
      .join(rankLookup("x").withColumnRenamed("v", "x"), Seq("x"))
      .join(rankLookup("y").withColumnRenamed("v", "y"), Seq("y"))
    val agg = ranked.agg(
      count(lit(1)).as("n"),
      sum(dec(col("r_x"))).as("sx"), sum(dec(col("r_y"))).as("sy"),
      sum(dec(col("r_x")) * dec(col("r_x"))).as("sxx"),
      sum(dec(col("r_y")) * dec(col("r_y"))).as("syy"),
      sum(dec(col("r_x")) * dec(col("r_y"))).as("sxy"))
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val den = sqrt(d(dec(col("n")) * col("sxx") - col("sx") * col("sx")) *
      d(dec(col("n")) * col("syy") - col("sy") * col("sy")))
    agg.select(col("n"),
      when(den > lit(0.0),
        d(dec(col("n")) * col("sxy") - col("sx") * col("sy")) / den).as("rho"))
  }

  /** DuckDB mirror of [[spearman]] — same value-count rank lookups,
    * HUGEINT-exact sufficient statistics, identical ρ double chain.
    * DuckDB's HUGEINT→DOUBLE cast is NOT correctly rounded (probed: it
    * double-rounds via 64-bit halves, 1 ulp off on a 76-bit numerator
    * at sf0.1) where Spark's Decimal→Double is round-to-nearest — so
    * the mirror casts through an exact hi/lo 2³² split: hi·2³² is
    * exact in double (hi < 2⁵³ for |v| < 2⁸⁵), lo < 2³² is exact, and
    * their one addition rounds once = the correctly-rounded value. */
  def spearmanSql(rel: String, xCol: String, yCol: String): String = {
    def d(v: String) = graft.Det.hiLoDoubleSql(v)
    s"""WITH base AS (SELECT CAST($xCol AS BIGINT) AS x, CAST($yCol AS BIGINT) AS y
       |  FROM $rel WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL),
       |rx AS (SELECT v, 2 * SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1 AS r_x
       |  FROM (SELECT x AS v, count(*) AS c FROM base GROUP BY 1)),
       |ry AS (SELECT v, 2 * SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) - c + 1 AS r_y
       |  FROM (SELECT y AS v, count(*) AS c FROM base GROUP BY 1)),
       |rk AS (SELECT r_x, r_y FROM base
       |  JOIN rx ON base.x = rx.v JOIN ry ON base.y = ry.v),
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS n,
       |    SUM(CAST(r_x AS HUGEINT)) AS sx, SUM(CAST(r_y AS HUGEINT)) AS sy,
       |    SUM(CAST(r_x AS HUGEINT) * r_x) AS sxx,
       |    SUM(CAST(r_y AS HUGEINT) * r_y) AS syy,
       |    SUM(CAST(r_x AS HUGEINT) * r_y) AS sxy
       |  FROM rk),
       |mom AS (SELECT n,
       |    CAST(n AS HUGEINT) * sxy - sx * sy AS num,
       |    CAST(n AS HUGEINT) * sxx - sx * sx AS vx,
       |    CAST(n AS HUGEINT) * syy - sy * sy AS vy
       |  FROM agg)
       |SELECT n, ${d("num")} / sqrt(${d("vx")} * ${d("vy")}) AS rho
       |FROM mom""".stripMargin
  }

  /**
   * Kendall τ-b rank correlation between two integral columns — the
   * concordant/discordant-pair measure with the standard tie
   * correction. The pair counting NEVER touches row pairs: it runs on
   * the JOINT VALUE-COUNT contingency (one `groupBy(x, y)` pass), and
   * C/D come from a broadcast self-join of those cells — cost is
   * |X|·|Y| domain cells squared, independent of row count, so a
   * 50×7-domain fact can be 100 TB and the pair stage stays a few
   * hundred cells. C = Σ n_i·n_j over cell pairs concordant in both
   * coordinates (each unordered pair once via x_i < x_j), D the
   * discordant ones; ties come off the marginals:
   * τ-b = (C−D)/√((n₀−t_x)(n₀−t_y)), n₀ = n(n−1)/2.
   *
   * Every count is DECIMAL(38,0)-exact; the epilogue casts the three
   * big exact integers to double once each (correctly rounded — the
   * mirror uses [[graft.Det.hiLoDoubleSql]]) and runs one fixed IEEE
   * chain with a single sqrt over the product. Degenerate marginals
   * (either column constant) → NULL, both engines.
   */
  def kendallTau(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .select(col(xCol).cast(LongType).as("x"), col(yCol).cast(LongType).as("y"))
      .groupBy("x", "y").agg(count(lit(1)).cast(dec38).as("c"))
    val a = cells.select(col("x").as("xa"), col("y").as("ya"), col("c").as("ca"))
    val b = cells.select(col("x").as("xb"), col("y").as("yb"), col("c").as("cb"))
    val pairs = a.join(broadcast(b), col("xa") < col("xb"))
      .agg(
        sum(when(col("ya") < col("yb"), col("ca") * col("cb"))
          .otherwise(lit(0).cast(dec38))).as("cc"),
        sum(when(col("ya") > col("yb"), col("ca") * col("cb"))
          .otherwise(lit(0).cast(dec38))).as("dd"))
    // marginal tie masses: t = Σ m(m−1)/2 over each coordinate's counts
    def tieMass(cc: String, out: String) = cells
      .groupBy(col(cc)).agg(sum(col("c")).as("m"))
      .agg(coalesce(sum(col("m") * (col("m") - lit(1))), lit(0).cast(dec38))
        .as(out)) // doubled: m(m−1), halve exactly below
    val n = cells.agg(sum(col("c")).as("n"))
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    pairs.crossJoin(broadcast(tieMass("x", "tx2")))
      .crossJoin(broadcast(tieMass("y", "ty2")))
      .crossJoin(broadcast(n))
      .select(col("n").cast(LongType).as("n"),
        (col("cc") - col("dd")).as("cmd"),
        // doubled everywhere: 2n₀ − 2t = n(n−1) − m(m−1)Σ; the /2 pair
        // cancels inside the sqrt product against the (C−D) doubling
        (col("n") * (col("n") - lit(1)) - col("tx2")).as("dx2"),
        (col("n") * (col("n") - lit(1)) - col("ty2")).as("dy2"))
      .select(col("n"),
        when(col("dx2") > 0 && col("dy2") > 0,
          d(col("cmd") * lit(2)) / sqrt(d(col("dx2")) * d(col("dy2"))))
          .as("tau_b"))
  }

  /** DuckDB mirror of [[kendallTau]] — same contingency-cell pair
    * counting, HUGEINT-exact, same doubled-scale epilogue with
    * hi/lo-split casts. */
  def kendallTauSql(rel: String, xCol: String, yCol: String): String = {
    def d(v: String) = graft.Det.hiLoDoubleSql(v)
    s"""WITH cells AS (SELECT CAST($xCol AS BIGINT) AS x, CAST($yCol AS BIGINT) AS y,
       |    CAST(count(*) AS HUGEINT) AS c
       |  FROM $rel WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL GROUP BY 1, 2),
       |pairs AS (SELECT
       |    COALESCE(SUM(CASE WHEN a.y < b.y THEN a.c * b.c END), 0) AS cc,
       |    COALESCE(SUM(CASE WHEN a.y > b.y THEN a.c * b.c END), 0) AS dd
       |  FROM cells a JOIN cells b ON a.x < b.x),
       |tx AS (SELECT COALESCE(SUM(m * (m - 1)), 0) AS tx2
       |  FROM (SELECT SUM(c) AS m FROM cells GROUP BY x)),
       |ty AS (SELECT COALESCE(SUM(m * (m - 1)), 0) AS ty2
       |  FROM (SELECT SUM(c) AS m FROM cells GROUP BY y)),
       |nn AS (SELECT SUM(c) AS n FROM cells),
       |mom AS (SELECT n, cc - dd AS cmd,
       |    n * (n - 1) - tx2 AS dx2, n * (n - 1) - ty2 AS dy2
       |  FROM pairs, tx, ty, nn)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CASE WHEN dx2 > 0 AND dy2 > 0
       |    THEN ${d("cmd * 2")} / sqrt(${d("dx2")} * ${d("dy2")}) END AS tau_b
       |FROM mom""".stripMargin
  }

  /**
   * Pearson chi-squared test of independence over two categorical
   * columns — on the CONTINGENCY CELLS (one `groupBy(x, y)` pass plus
   * two marginal re-aggregations of the cells, never a second fact
   * scan). χ² = Σ (O·n − r·k)² / (r·k·n), computed per cell in EXACT
   * micro-unit fixed point: the numerator (O·n − r·k)²·10⁶ is a
   * DECIMAL(38,0) integer, the division is INTEGRAL (`div` / `//` —
   * truncation identical in both engines on non-negative operands),
   * and the per-cell longs sum exactly, so the statistic is
   * deterministic to 10⁻⁶ with zero order-dependent FP. Exactness
   * bound: |O·n − r·k|²·10⁶ < 10³⁸ ⇒ n ≲ 3×10⁹ rows; past that,
   * χ² is count-scale-covariant (χ²(λO) = λ·χ²) so compute on
   * per-λ-sampled counts and multiply back — documented, not silent.
   * Also reports Cramér's V = √(χ²/(n·min(|X|−1,|Y|−1))) — the
   * [0,1]-normalized association strength.
   */
  def chiSquared(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val cells = df.filter(col(xCol).isNotNull && col(yCol).isNotNull)
      .groupBy(col(xCol).as("x"), col(yCol).as("y"))
      .agg(count(lit(1)).cast(dec38).as("o"))
    val rx = cells.groupBy("x").agg(sum("o").as("r"))
    val ky = cells.groupBy("y").agg(sum("o").as("k"))
    val tot = cells.agg(sum("o").as("n"),
      countDistinct("x").as("nx"), countDistinct("y").as("ny"))
    // Full r×k grid (marginal cross join), observed COALESCEd to 0: a
    // cell with O=0 but E=r·k/n>0 contributes E to the true Pearson
    // statistic — summing only observed cells understates χ² on any
    // sparse contingency table. Grid size is |X|·|Y| (categorical
    // domains, both marginals already broadcast-small by construction).
    val cellTerms = rx.crossJoin(broadcast(ky))
      .join(cells, Seq("x", "y"), "left")
      .withColumn("o", coalesce(col("o"), lit(0).cast(dec38)))
      .crossJoin(broadcast(tot))
      .select(col("n"), col("nx"), col("ny"),
        expr("(o * n - r * k) * (o * n - r * k) * 1000000")
          .as("num"), (col("r") * col("k") * col("n")).as("den"))
      .select(col("n"), col("nx"), col("ny"), expr("num div den").as("term"))
    cellTerms.groupBy("n", "nx", "ny")
      .agg(sum("term").as("chi2_micro"))
      .select(col("n").cast(LongType).as("n"),
        (col("chi2_micro").cast(DoubleType) / lit(1e6)).as("chi2"),
        sqrt((col("chi2_micro").cast(DoubleType) / lit(1e6)) /
          (col("n").cast(DoubleType) *
            (least(col("nx"), col("ny")) - lit(1)).cast(DoubleType)))
          .as("cramers_v"))
  }

  /** DuckDB mirror of [[chiSquared]] — same full-grid cells/marginals
    * (O=0 cells COALESCEd in via the marginal cross join), HUGEINT
    * micro fixed point, same `//` truncation, same double epilogue
    * (chi2_micro ≤ 10⁶·χ²·cells stays well under 2⁵³ for any χ² this
    * bound admits, so the plain cast is exact). */
  def chiSquaredSql(rel: String, xCol: String, yCol: String): String =
    s"""WITH cells AS (SELECT $xCol AS x, $yCol AS y, CAST(count(*) AS HUGEINT) AS o
       |  FROM $rel WHERE $xCol IS NOT NULL AND $yCol IS NOT NULL GROUP BY 1, 2),
       |rx AS (SELECT x, SUM(o) AS r FROM cells GROUP BY 1),
       |ky AS (SELECT y, SUM(o) AS k FROM cells GROUP BY 1),
       |tot AS (SELECT SUM(o) AS n, COUNT(DISTINCT x) AS nx, COUNT(DISTINCT y) AS ny
       |  FROM cells),
       |grid AS (SELECT rx.x, rx.r, ky.y, ky.k, COALESCE(cells.o, 0) AS o
       |  FROM rx CROSS JOIN ky LEFT JOIN cells ON cells.x = rx.x AND cells.y = ky.y),
       |terms AS (SELECT n, nx, ny,
       |    ((o * n - r * k) * (o * n - r * k) * 1000000) // (r * k * n) AS term
       |  FROM grid, tot)
       |SELECT CAST(n AS BIGINT) AS n,
       |  CAST(SUM(term) AS DOUBLE) / 1e6 AS chi2,
       |  sqrt((CAST(SUM(term) AS DOUBLE) / 1e6) /
       |       (CAST(n AS DOUBLE) * (LEAST(nx, ny) - 1))) AS cramers_v
       |FROM terms GROUP BY n, nx, ny""".stripMargin

  /**
   * Exact WEIGHTED median per key — the smallest value v whose
   * cumulative weight reaches half the key's total (lower weighted
   * median: 2·cum(v) ≥ W, all integer, no interpolation). Runs on the
   * per-key VALUE-COUNT table (one `groupBy(key, v) sum(w)` pass with
   * map-side combine), so the window sorts each key's DISTINCT values,
   * never its rows — at 100 TB the window state is the value domain.
   * Weights must be non-negative integers; zero-weight keys produce no
   * row (no median of nothing).
   */
  def weightedMedian(df: DataFrame, keys: Seq[String], valueCol: String,
                     weightCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val vc = df.filter(col(valueCol).isNotNull && col(weightCol).isNotNull)
      .groupBy(kcols :+ col(valueCol).cast(LongType).as("v"): _*)
      .agg(sum(col(weightCol).cast(LongType)).as("wc"))
    val cum = Window.partitionBy(kcols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(kcols: _*)
    vc.withColumn("__cum", sum("wc").over(cum))
      .withColumn("__tot", sum("wc").over(all))
      .filter(lit(2) * col("__cum") >= col("__tot") && col("__tot") > 0)
      .groupBy(kcols: _*)
      .agg(min("v").as("weighted_median"), max("__tot").as("total_weight"))
  }

  /** DuckDB mirror of [[weightedMedian]] — same value-count table,
    * same cumulative-weight walk, same lower-median pick. */
  def weightedMedianSql(rel: String, keys: Seq[String], valueCol: String,
                        weightCol: String): String = {
    val ks = keys.mkString(", ")
    s"""WITH vc AS (SELECT $ks, CAST($valueCol AS BIGINT) AS v,
       |    SUM(CAST($weightCol AS BIGINT)) AS wc
       |  FROM $rel WHERE $valueCol IS NOT NULL AND $weightCol IS NOT NULL
       |  GROUP BY ALL),
       |walk AS (SELECT $ks, v,
       |    SUM(wc) OVER (PARTITION BY $ks ORDER BY v
       |      ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(wc) OVER (PARTITION BY $ks) AS tot
       |  FROM vc)
       |SELECT $ks, CAST(MIN(v) AS BIGINT) AS weighted_median,
       |  CAST(MAX(tot) AS BIGINT) AS total_weight
       |FROM walk WHERE 2 * cum >= tot AND tot > 0
       |GROUP BY ALL""".stripMargin
  }

  /**
   * LORENZ CURVE at decile resolution — for each d in 1..10, the
   * smallest value v_d such that at least d/10 of the population has
   * value ≤ v_d, with the cumulative share of total value held below
   * that boundary: the inequality / concentration curve behind
   * [[agg-gini]]-style coefficients ("the bottom 50% of orders carry
   * 18% of revenue"). Runs on the VALUE-COUNT table, so the one global
   * cumulative window walks the distinct-value domain, never rows —
   * the [[weightedMedian]] posture. Boundary picks are all-integer
   * (10·cum_rows ≥ d·n); because cum_rows and cum_value are both
   * monotone in v, `min(v)` and `min(cum_value)` over the qualifying
   * rows come from the SAME row, so the per-decile reduce needs no
   * struct argmin. `valueCol` must be non-negative integral (cents) —
   * negative values would break the monotone-share reading.
   */
  def lorenzCurve(df: DataFrame, valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec38 = DecimalType(38, 0)
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(col(valueCol).cast(LongType).as("v"))
      .agg(count(lit(1)).as("c"), sum(col(valueCol).cast(dec38)).as("sv"))
    val w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val walk = vc.select(col("v"),
      sum("c").over(w).as("cum_rows"),
      sum("sv").over(w).as("cum_value"))
    val tot = vc.agg(sum("c").as("n"), sum("sv").as("total_value"))
    walk.crossJoin(broadcast(tot))
      .crossJoin(broadcast(
        tot.sparkSession.range(1, 11).select(col("id").as("decile"))))
      .filter(lit(10) * col("cum_rows") >= col("decile") * col("n"))
      .groupBy("decile")
      .agg(min("v").as("boundary_value"),
        min("cum_rows").as("cum_rows"),
        (min(col("cum_value")).cast(DoubleType) /
          min(col("total_value")).cast(DoubleType)).as("cum_value_share"))
  }

  /** DuckDB mirror of [[lorenzCurve]] — same value-count walk, decile
    * cross join, integer boundary pick, monotone min reduce. */
  def lorenzCurveSql(rel: String, valueCol: String): String =
    s"""WITH vc AS (SELECT CAST($valueCol AS BIGINT) AS v, count(*) AS c,
       |    SUM(CAST($valueCol AS HUGEINT)) AS sv
       |  FROM $rel WHERE $valueCol IS NOT NULL GROUP BY 1),
       |walk AS (SELECT v,
       |    SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_rows,
       |    SUM(sv) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_value
       |  FROM vc),
       |tot AS (SELECT SUM(c) AS n, SUM(sv) AS total_value FROM vc)
       |SELECT d.decile, MIN(v) AS boundary_value,
       |  CAST(MIN(cum_rows) AS BIGINT) AS cum_rows,
       |  ${graft.Det.hiLoDoubleSql("MIN(cum_value)")} /
       |    ${graft.Det.hiLoDoubleSql("MIN(total_value)")} AS cum_value_share
       |FROM walk, tot, (SELECT unnest(generate_series(1, 10)) AS decile) d
       |WHERE 10 * cum_rows >= d.decile * n
       |GROUP BY 1""".stripMargin

  /**
   * Tukey-fence (IQR) outlier report per key — the boxplot rule:
   * values outside [Q1 − 1.5·IQR, Q3 + 1.5·IQR], with the quartiles
   * taken as the SMALLEST value whose cumulative count reaches k/4 of
   * the key's rows (lower empirical quartile — a real element, exact).
   * The complement of [[graft.ops.TimeSeries]]'s MAD rule: IQR fences
   * are THE convention dashboards expect, MAD survives heavier
   * contamination; a profiler ships both. All comparisons are integer
   * (×2 scaling folds the 1.5 into `2v < 5·q1 − 3·q3` / `2v > 5·q3 −
   * 3·q1`), and the walk runs on the per-key VALUE-COUNT table —
   * window state is the value domain, the [[weightedMedian]] posture.
   * Output: one row per flagged DISTINCT value `(key, v, c, q1, q3,
   * side)` — row counts ride along, raw rows never re-scan.
   */
  def iqrOutliers(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(kcols :+ col(valueCol).cast(LongType).as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy(kcols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(kcols: _*)
    val cum = vc.withColumn("__cum", sum("c").over(walk))
      .withColumn("__n", sum("c").over(all))
    def quartile(k: Int, out: String) = cum
      .filter(lit(4) * col("__cum") >= lit(k) * col("__n"))
      .groupBy(kcols: _*).agg(min("v").as(out))
    val q = quartile(1, "q1").join(quartile(3, "q3"), keys)
    vc.join(q, keys)
      .withColumn("side",
        when(lit(2) * col("v") < lit(5) * col("q1") - lit(3) * col("q3"), lit("low"))
          .when(lit(2) * col("v") > lit(5) * col("q3") - lit(3) * col("q1"), lit("high")))
      .filter(col("side").isNotNull)
      .select(kcols ++ Seq(col("v"), col("c"), col("q1"), col("q3"), col("side")): _*)
  }

  /** DuckDB mirror of [[iqrOutliers]] — same value-count quartile walk
    * and doubled-integer fences. */
  def iqrOutliersSql(rel: String, keys: Seq[String], valueCol: String): String = {
    val ks = keys.mkString(", ")
    s"""WITH vc AS (SELECT $ks, CAST($valueCol AS BIGINT) AS v, count(*) AS c
       |  FROM $rel WHERE $valueCol IS NOT NULL GROUP BY ALL),
       |cum AS (SELECT $ks, v, c,
       |    SUM(c) OVER (PARTITION BY $ks ORDER BY v ROWS UNBOUNDED PRECEDING) AS cr,
       |    SUM(c) OVER (PARTITION BY $ks) AS n
       |  FROM vc),
       |q1 AS (SELECT $ks, MIN(v) AS q1 FROM cum WHERE 4 * cr >= n GROUP BY ALL),
       |q3 AS (SELECT $ks, MIN(v) AS q3 FROM cum WHERE 4 * cr >= 3 * n GROUP BY ALL)
       |SELECT vc.*, q1, q3,
       |  CASE WHEN 2 * v < 5 * q1 - 3 * q3 THEN 'low'
       |       WHEN 2 * v > 5 * q3 - 3 * q1 THEN 'high' END AS side
       |FROM vc JOIN q1 USING ($ks) JOIN q3 USING ($ks)
       |WHERE 2 * v < 5 * q1 - 3 * q3 OR 2 * v > 5 * q3 - 3 * q1""".stripMargin
  }

  /**
   * Exact Pearson CORRELATION MATRIX over k integral columns in ONE
   * aggregate pass — all k + k(k+1)/2 sufficient statistics (Σxᵢ,
   * Σxᵢxⱼ) accumulate as DECIMAL(38,0) in a single map-side-combined
   * aggregate, so the fact table is scanned once no matter how many
   * pairs are profiled (the per-pair [[graft.ops.TimeSeries]]
   * machinery would re-scan per pair). Output is one row per UNordered
   * pair i<j with `r = (nΣxy−ΣxΣy)/√((nΣx²−(Σx)²)(nΣy²−(Σy)²))` — one
   * sqrt over the variance product (the [[spearman]] ulp lesson), NULL
   * on degenerate columns. Callers pre-scale to integral units
   * (cents/basis points); the mirror's big-int casts must ride
   * [[graft.Det.hiLoDoubleSql]].
   */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2 && cols.size <= 16,
      s"corrMatrix: 2..16 columns, got ${cols.size}")
    val dec38 = DecimalType(38, 0)
    val base = df.select(cols.map(c => col(c).cast(LongType).cast(dec38).as(c)): _*)
      .na.drop()
    val sums =
      Seq(count(lit(1)).cast(dec38).as("n")) ++
        cols.map(c => sum(col(c)).as(s"s_$c")) ++
        (for (i <- cols.indices; j <- i until cols.size)
          yield sum(col(cols(i)) * col(cols(j))).as(s"p_${cols(i)}__${cols(j)}"))
    // one-row stats table read once per pair row: cut the lineage or
    // the unionAll of pair SELECTs re-scans the fact table per pair
    val agg = base.agg(sums.head, sums.tail: _*).localCheckpoint()
    def d(c: org.apache.spark.sql.Column) = c.cast(DoubleType)
    val pairRows = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      val num = col("n") * col(s"p_${a}__$b") - col(s"s_$a") * col(s"s_$b")
      val va = col("n") * col(s"p_${a}__$a") - col(s"s_$a") * col(s"s_$a")
      val vb = col("n") * col(s"p_${b}__$b") - col(s"s_$b") * col(s"s_$b")
      agg.select(lit(a).as("col_x"), lit(b).as("col_y"),
        col("n").cast(LongType).as("n"),
        when(d(va) * d(vb) > 0.0, d(num) / sqrt(d(va) * d(vb))).as("corr"))
    }
    pairRows.reduce(_ unionAll _)
  }

  /** DuckDB mirror of [[corrMatrix]] — one aggregate CTE, one SELECT
    * per pair, hi/lo-split casts for every >2⁵³ statistic. */
  def corrMatrixSql(rel: String, cols: Seq[String]): String = {
    def d(v: String) = graft.Det.hiLoDoubleSql(v)
    val sums =
      Seq("CAST(count(*) AS HUGEINT) AS n") ++
        cols.map(c => s"SUM(CAST($c AS HUGEINT)) AS s_$c") ++
        (for (i <- cols.indices; j <- i until cols.size)
          yield s"SUM(CAST(${cols(i)} AS HUGEINT) * ${cols(j)}) AS p_${cols(i)}__${cols(j)}")
    val notNull = cols.map(c => s"$c IS NOT NULL").mkString(" AND ")
    val pairSelects = for (i <- cols.indices; j <- (i + 1) until cols.size) yield {
      val (a, b) = (cols(i), cols(j))
      s"""SELECT '$a' AS col_x, '$b' AS col_y, CAST(n AS BIGINT) AS n,
         |  CASE WHEN ${d(s"n * p_${a}__$a - s_$a * s_$a")} *
         |            ${d(s"n * p_${b}__$b - s_$b * s_$b")} > 0.0
         |    THEN ${d(s"n * p_${a}__$b - s_$a * s_$b")} /
         |      sqrt(${d(s"n * p_${a}__$a - s_$a * s_$a")} *
         |           ${d(s"n * p_${b}__$b - s_$b * s_$b")}) END AS corr
         |FROM agg""".stripMargin
    }
    s"""WITH base AS (SELECT ${cols.map(c => s"CAST($c AS BIGINT) AS $c").mkString(", ")}
       |  FROM $rel WHERE $notNull),
       |agg AS (SELECT ${sums.mkString(", ")} FROM base)
       |${pairSelects.mkString("\nUNION ALL\n")}""".stripMargin
  }

  /**
   * Empirical-CDF normalization lookup per key — the quantile
   * transform of ML feature prep ("replace the raw value with its
   * percentile within its segment"), emitted as the DOMAIN-SIZED
   * mapping table `(keys..., v, c, cdf)` with cdf = P(X ≤ v) =
   * cum_rows/n: join it back to the facts to materialize the feature,
   * or ship it as the serving-side lookup (which is how a trained
   * preprocessing step deploys anyway — the table IS the model).
   * Value-count walk, integer cumulative counts, one fixed double
   * division per distinct value.
   */
  def cdfLookup(df: DataFrame, keys: Seq[String], valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(kcols :+ col(valueCol).cast(LongType).as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy(kcols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(kcols: _*)
    vc.withColumn("__cum", sum("c").over(walk))
      .withColumn("__n", sum("c").over(all))
      .select(kcols ++ Seq(col("v"), col("c"),
        (col("__cum").cast(DoubleType) / col("__n").cast(DoubleType)).as("cdf")): _*)
  }

  /**
   * Exact TRIMMED MEAN per key — the mean of the middle (1−2p) of each
   * key's rows, dropping exactly `k = ⌊n·p⌋` rows from each tail (the
   * robust location estimate between mean and median). Runs on the
   * value-count walk: each distinct value contributes
   * `max(0, min(cum, n−k) − max(cum−c, k))` rows — the overlap of its
   * [cum−c, cum) row span with the kept [k, n−k) window — so ties and
   * partial trims inside one value are handled exactly, with NO row
   * sort. All counts integer; Σ(v·take) is DECIMAL(38,0); one double
   * division. `trimPerMille` (‰, integer) keeps the trim fraction
   * engine-exact — a double p would make k itself FP-dependent.
   */
  def trimmedMean(df: DataFrame, keys: Seq[String], valueCol: String,
                  trimPerMille: Int): DataFrame = {
    require(trimPerMille >= 0 && trimPerMille < 500,
      s"trimmedMean: trimPerMille in [0, 500), got $trimPerMille")
    import org.apache.spark.sql.expressions.Window
    val dec38 = DecimalType(38, 0)
    val kcols = keys.map(col)
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(kcols :+ col(valueCol).cast(LongType).as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy(kcols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(kcols: _*)
    vc.withColumn("__cum", sum("c").over(walk))
      .withColumn("__n", sum("c").over(all))
      .withColumn("__k", expr(s"(__n * $trimPerMille) div 1000"))
      .withColumn("__take", greatest(lit(0L),
        least(col("__cum"), col("__n") - col("__k")) -
          greatest(col("__cum") - col("c"), col("__k"))))
      .groupBy(kcols: _*)
      .agg(sum("__take").as("n_kept"),
        sum(col("v").cast(dec38) * col("__take").cast(dec38)).as("__sv"))
      .filter(col("n_kept") > 0)
      .select(kcols ++ Seq(col("n_kept"),
        (col("__sv").cast(DoubleType) / col("n_kept").cast(DoubleType))
          .as("trimmed_mean")): _*)
  }

  /** DuckDB mirror of [[trimmedMean]] — same span-overlap take counts.
    * The HUGEINT Σ(v·take) routes through [[graft.Det.hiLoDoubleSql]]
    * (not correctly rounded past 2^53 via a direct cast, while Spark's
    * Decimal→Double is). */
  def trimmedMeanSql(rel: String, keys: Seq[String], valueCol: String,
                     trimPerMille: Int): String = {
    val ks = keys.mkString(", ")
    s"""WITH vc AS (SELECT $ks, CAST($valueCol AS BIGINT) AS v, count(*) AS c
       |  FROM $rel WHERE $valueCol IS NOT NULL GROUP BY ALL),
       |walk AS (SELECT $ks, v, c,
       |    SUM(c) OVER (PARTITION BY $ks ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY $ks) AS n
       |  FROM vc),
       |take AS (SELECT $ks, v,
       |    GREATEST(0, LEAST(cum, n - (n * $trimPerMille) // 1000)
       |      - GREATEST(cum - c, (n * $trimPerMille) // 1000)) AS tk
       |  FROM walk),
       |agg AS (SELECT $ks, SUM(tk) AS ntk, SUM(CAST(v AS HUGEINT) * tk) AS sv
       |  FROM take GROUP BY ALL HAVING SUM(tk) > 0)
       |SELECT $ks, CAST(ntk AS BIGINT) AS n_kept,
       |  ${graft.Det.hiLoDoubleSql("sv")} / CAST(ntk AS BIGINT) AS trimmed_mean
       |FROM agg""".stripMargin
  }

  /**
   * Exact DISCRETE QUANTILES per key — for each requested per-mille
   * level p, the smallest value whose cumulative count reaches p‰ of
   * the key's rows (the lower empirical quantile: always a REAL
   * element, the [[weightedMedian]]/[[iqrOutliers]] convention).
   * One value-count walk serves every level — levels fan out over a
   * broadcast literal table, so asking for p50/p90/p99 costs the same
   * walk as asking for one. All-integer picks; output
   * `(keys..., p_mille, v)`.
   */
  def discQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                    pMille: Seq[Int]): DataFrame = {
    require(pMille.nonEmpty && pMille.forall(p => p >= 1 && p <= 1000),
      s"discQuantiles: levels must be in [1, 1000]‰, got $pMille")
    import org.apache.spark.sql.expressions.Window
    val kcols = keys.map(col)
    val vc = df.filter(col(valueCol).isNotNull)
      .groupBy(kcols :+ col(valueCol).cast(LongType).as("v"): _*)
      .agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy(kcols: _*).orderBy("v")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy(kcols: _*)
    val cum = vc.withColumn("__cum", sum("c").over(walk))
      .withColumn("__n", sum("c").over(all))
    val levels = vc.sparkSession.createDataFrame(
      pMille.map(p => Tuple1(p.toLong))).toDF("p_mille")
    cum.crossJoin(broadcast(levels))
      .filter(lit(1000) * col("__cum") >= col("p_mille") * col("__n"))
      .groupBy(kcols :+ col("p_mille"): _*)
      .agg(min("v").as("v"))
  }

  /** DuckDB mirror of [[discQuantiles]]. */
  def discQuantilesSql(rel: String, keys: Seq[String], valueCol: String,
                       pMille: Seq[Int]): String = {
    val ks = keys.mkString(", ")
    val lv = pMille.map(p => s"($p)").mkString(", ")
    s"""WITH vc AS (SELECT $ks, CAST($valueCol AS BIGINT) AS v, count(*) AS c
       |  FROM $rel WHERE $valueCol IS NOT NULL GROUP BY ALL),
       |cum AS (SELECT $ks, v,
       |    SUM(c) OVER (PARTITION BY $ks ORDER BY v ROWS UNBOUNDED PRECEDING) AS cr,
       |    SUM(c) OVER (PARTITION BY $ks) AS n
       |  FROM vc),
       |lv(p_mille) AS (VALUES $lv)
       |SELECT $ks, CAST(p_mille AS BIGINT) AS p_mille, MIN(v) AS v
       |FROM cum, lv WHERE 1000 * cr >= p_mille * n
       |GROUP BY ALL""".stripMargin
  }

  /** DuckDB mirror of [[cdfLookup]]. */
  def cdfLookupSql(rel: String, keys: Seq[String], valueCol: String): String = {
    val ks = keys.mkString(", ")
    s"""SELECT $ks, v, c,
       |  CAST(SUM(c) OVER (PARTITION BY $ks ORDER BY v ROWS UNBOUNDED PRECEDING)
       |    AS DOUBLE) / CAST(SUM(c) OVER (PARTITION BY $ks) AS DOUBLE) AS cdf
       |FROM (SELECT $ks, CAST($valueCol AS BIGINT) AS v, count(*) AS c
       |      FROM $rel WHERE $valueCol IS NOT NULL GROUP BY ALL)""".stripMargin
  }

  /** DuckDB mirror of [[ksTest]] over relations `aRel`/`bRel`. */
  def ksTestSql(aRel: String, bRel: String, valueCol: String): String =
    s"""WITH pooled AS (
       |  SELECT CAST($valueCol AS DOUBLE) AS v, 1 AS ia, 0 AS ib
       |  FROM $aRel WHERE $valueCol IS NOT NULL
       |  UNION ALL
       |  SELECT CAST($valueCol AS DOUBLE) AS v, 0 AS ia, 1 AS ib
       |  FROM $bRel WHERE $valueCol IS NOT NULL),
       |per AS (SELECT v, SUM(ia) AS ca, SUM(ib) AS cb FROM pooled GROUP BY v),
       |tot AS (SELECT SUM(ca) AS na, SUM(cb) AS nb FROM per),
       |cum AS (SELECT v,
       |          SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fa,
       |          SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS fb
       |        FROM per),
       |d AS (SELECT abs(CAST(fa AS HUGEINT) * CAST(nb AS HUGEINT)
       |                 - CAST(fb AS HUGEINT) * CAST(na AS HUGEINT)) AS dnum,
       |             na, nb
       |      FROM cum, tot)
       |SELECT CAST(MAX(na) AS BIGINT) AS n_a, CAST(MAX(nb) AS BIGINT) AS n_b,
       |       CAST(MAX(dnum) AS BIGINT) AS d_num,
       |       CAST(MAX(dnum) AS DOUBLE)
       |         / CAST(CAST(MAX(na) AS HUGEINT) * CAST(MAX(nb) AS HUGEINT) AS DOUBLE)
       |         AS ks
       |FROM d""".stripMargin

  /** Column name for quantile `p`: the full decimal of `p·100` with
    * `_` for the decimal point — collision-free by construction (two
    * distinct ps always differ in some digit). Shared by the Scala
    * aggregate and the SQL mirror so oracle column names line up. */
  def quantileColName(p: Double): String =
    "p" + BigDecimal(p.toString).*(100).underlying.stripTrailingZeros
      .toPlainString.replace(".", "_")

  /**
   * Histogram (fixed-width-bin) quantile estimates per key — the
   * percentile pattern that SURVIVES 100 TB: exact `percentile()`
   * sorts every group's values; this is two keyed aggregates whose
   * intermediate is `keys × bins` rows regardless of input size, the
   * way monitoring systems (HDR histogram, Prometheus) compute
   * quantiles. Values are re-anchored to integer cents (the zscore
   * hop; non-negative domain enforced in-plan) and binned by a fixed
   * `binWidthCents`; each requested p yields classic within-bin linear
   * interpolation `lo + width·(p·n − cum_before)/bin_count`, a fixed
   * IEEE chain over exact integers — oracle-hash-identical, with
   * estimation error bounded by the bin width (the documented trade;
   * shrink bins to tighten).
   *
   * Output: one row per key group with a `p<percent>` double column
   * per requested quantile (e.g. `p50`, `p95`; fractional percents
   * keep their full decimal with `_` for the point — 0.999 → `p99_9`,
   * 0.975 → `p97_5` — so nearby quantiles can never collide into one
   * column name), in ORIGINAL value units.
   */
  def binnedQuantiles(df: DataFrame, keys: Seq[String], valueCol: String,
                      binWidthCents: Long, ps: Seq[Double]): DataFrame = {
    require(binWidthCents >= 1, s"binnedQuantiles: binWidthCents must be >= 1")
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"binnedQuantiles: quantiles must be in (0, 1], got $ps")
    require(ps.distinct.size == ps.size,
      s"binnedQuantiles: duplicate quantiles requested: $ps")
    val vc = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    val c = when(col(valueCol).isNotNull && vc.isNull,
      raise_error(lit(s"binnedQuantiles: $valueCol out of DECIMAL(18,2) range"))
        .cast(LongType))
      .when(vc < 0,
        raise_error(lit(s"binnedQuantiles: $valueCol must be non-negative " +
          "(integer-div binning floors toward zero)")).cast(LongType))
      .otherwise(vc)
    // integer division (div), NOT `/` — Spark's `/` on longs is DOUBLE
    // division, and a truncating double round-trip is the wrong tool
    // for an exact integer bin id
    val binned = df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ c.as("__c"): _*)
      .withColumn("__bin", expr(s"__c div ${binWidthCents}L"))
      .drop("__c")
    val counts = binned.groupBy(keys.map(col) :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
    quantilesFromBinCounts(counts, keys, binWidthCents, ps)
  }

  /** The ADDITIVE partial of the binned-quantile family: per-(key, bin)
    * row counts for one shard/batch of data — partials from any split
    * of the input SUM to the whole input's counts, which is what makes
    * percentiles incrementally maintainable (a streaming sink appends
    * per-batch partials; [[quantilesFromBinCounts]] folds them). Same
    * cent binning and guards as [[binnedQuantiles]]. */
  def binCounts(df: DataFrame, keys: Seq[String], valueCol: String,
                binWidthCents: Long): DataFrame = {
    require(binWidthCents >= 1, s"binCounts: binWidthCents must be >= 1")
    val vc = (col(valueCol).cast(DecimalType(18, 2)) * 100).cast(LongType)
    val c = when(col(valueCol).isNotNull && vc.isNull,
      raise_error(lit(s"binCounts: $valueCol out of DECIMAL(18,2) range"))
        .cast(LongType))
      .when(vc < 0,
        raise_error(lit(s"binCounts: $valueCol must be non-negative")).cast(LongType))
      .otherwise(vc)
    df.filter(col(valueCol).isNotNull)
      .select(keys.map(col) :+ c.as("__c"): _*)
      .withColumn("__bin", expr(s"__c div ${binWidthCents}L"))
      .groupBy(keys.map(col) :+ col("__bin"): _*)
      .agg(count(lit(1)).as("__cnt"))
  }

  /** Quantile estimates from (possibly duplicated) per-(key, bin)
    * count partials: partials merge by an additive keyed SUM, then the
    * identical cum-window + interpolation epilogue as
    * [[binnedQuantiles]] — so batch, sharded, and streaming-maintained
    * inputs land on the same hash-exact estimates. */
  def quantilesFromBinCounts(partials: DataFrame, keys: Seq[String],
                             binWidthCents: Long, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantilesFromBinCounts: quantiles must be in (0, 1], got $ps")
    require(ps.distinct.size == ps.size,
      s"quantilesFromBinCounts: duplicate quantiles requested: $ps")
    val counts = partials.groupBy(keys.map(col) :+ col("__bin"): _*)
      .agg(sum(col("__cnt")).as("__cnt"))
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col("__bin"))
    val cum = counts
      .withColumn("__cum", sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("__n", sum(col("__cnt")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
    val estCols = ps.map { p =>
      val target = lit(p) * col("__n").cast(DoubleType)
      val before = (col("__cum") - col("__cnt")).cast(DoubleType)
      val interp = (col("__bin") * binWidthCents).cast(DoubleType) +
        lit(binWidthCents.toDouble) * (target - before) / col("__cnt").cast(DoubleType)
      min(when(col("__cum").cast(DoubleType) >= target && before < target,
        interp / 100.0)).as(quantileColName(p))
    }
    cum.groupBy(keys.map(col): _*).agg(estCols.head, estCols.tail: _*)
  }

  /** DuckDB mirror of [[binnedQuantiles]]'s per-quantile aggregate
    * expression over a CTE with columns `bin, cnt, cum, n`. */
  def binnedQuantileSql(p: Double, binWidthCents: Long): String = {
    val target = s"($p * CAST(n AS DOUBLE))"
    val before = s"CAST(cum - cnt AS DOUBLE)"
    s"""MIN(CASE WHEN CAST(cum AS DOUBLE) >= $target AND $before < $target
       |  THEN (CAST(bin * $binWidthCents AS DOUBLE)
       |        + $binWidthCents.0 * ($target - $before) / CAST(cnt AS DOUBLE)) / 100.0
       |  END) AS ${quantileColName(p)}""".stripMargin
  }

  def profileLegSql(table: String, c: String, numeric: Boolean): String = {
    val mn = if (numeric) s"CAST(MIN($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    val mx = if (numeric) s"CAST(MAX($c) AS DOUBLE)" else "CAST(NULL AS DOUBLE)"
    s"""SELECT '$c' AS column_name,
       |  COUNT(*) - COUNT($c) AS n_nulls,
       |  COUNT(DISTINCT $c) AS n_distinct,
       |  $mn AS min_value, $mx AS max_value FROM $table""".stripMargin
  }

  /**
   * Benford first-significant-digit expectations in ppm:
   * ⌊10⁶·log₁₀(1 + 1/d)⌋ for d = 1..9. Computed ONCE here on the
   * driver (a build-time constant — engine libm never runs, the
   * naiveBayes ln-ban discipline) and inlined as integer literals into
   * BOTH engines' plans, so the only data-dependent arithmetic anywhere
   * is exact-integer counts and floor divisions.
   */
  val benfordExpectedPpm: Seq[(Int, Long)] =
    (1 to 9).map(d => d -> math.floor(1e6 * math.log10(1.0 + 1.0 / d)).toLong)

  /**
   * BENFORD FIRST-DIGIT PROFILE — the fraud / synthetic-data screen:
   * natural multi-magnitude positive quantities (prices, populations,
   * file sizes) put ~30.1% of first significant digits at 1, falling
   * to ~4.6% at 9; fabricated or truncated columns don't. Output: one
   * row per digit 1..9 (absent digits kept at n = 0 — their deficit is
   * exactly what the screen must see) with observed vs expected ppm
   * and a χ²-style divergence Σ⌊(obs−exp)²/exp⌋ in ppm constant across
   * rows.
   *
   * Determinism: the first digit comes from the decimal STRING form of
   * the integer input (never log10 of a double — a value at a power of
   * ten would sit on a libm boundary); shares are integer floor
   * divisions; the expectations are the inlined literals above. Exact
   * at any cardinality below 9.2·10¹² rows (n·10⁶ must fit BIGINT —
   * past that, lift the share numerators to DECIMAL(38)).
   *
   * Scale shape: one map-side-combined 9-group aggregate over a pure
   * projection (no window, no join wider than the 9-row digit spine);
   * everything after the count is constant-size arithmetic.
   * `valueCol` must be positive integral (cents).
   */
  def benford(df: DataFrame, valueCol: String): DataFrame =
    benfordFromCounts(df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .select(substring(col(valueCol).cast(StringType), 1, 1)
        .cast(LongType).as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n")))

  /** [[benford]]'s epilogue over an already-reduced `(digit, n)` count
    * table — shared with the STREAMING form, whose maintained per-batch
    * count partials re-sum to exactly this relation (counts are
    * additive, so streamed ≡ batch bit-for-bit). */
  def benfordFromCounts(counts: DataFrame): DataFrame = {
    val spark = counts.sparkSession
    val digits = spark.range(1, 10).select(col("id").as("digit"))
    val tot = counts.agg(sum("n").as("n_total"))
    val expCol = benfordExpectedPpm.foldLeft(lit(0L)) { case (acc, (d, e)) =>
      when(col("digit") === d, lit(e)).otherwise(acc)
    }
    val scored = digits.join(counts, Seq("digit"), "left")
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"))
      .crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        expr("(n * 1000000) div nullif(n_total, 0)").as("obs_ppm"),
        expCol.as("exp_ppm"))
    val chi = scored.agg(
      sum(expr("((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) div exp_ppm"))
        .as("chi2_ppm"))
    scored.crossJoin(broadcast(chi))
  }

  /** DuckDB mirror of [[benford]] — same string-form digit, 9-row digit
    * spine with zero-count digits kept, integer floor shares, and the
    * SAME inlined expectation literals. */
  def benfordSql(rel: String, valueCol: String): String = {
    val expRows = benfordExpectedPpm
      .map { case (d, e) => s"($d, $e)" }.mkString(", ")
    s"""WITH cnt AS (SELECT CAST(substr(CAST($valueCol AS VARCHAR), 1, 1) AS BIGINT) AS digit,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM $rel WHERE $valueCol IS NOT NULL AND $valueCol > 0 GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total FROM cnt),
       |ed AS (SELECT * FROM (VALUES $expRows) e(digit, exp_ppm)),
       |base AS (SELECT CAST(ed.digit AS BIGINT) AS digit,
       |    COALESCE(cnt.n, 0) AS n,
       |    (COALESCE(cnt.n, 0) * 1000000) // NULLIF(tot.n_total, 0) AS obs_ppm,
       |    CAST(ed.exp_ppm AS BIGINT) AS exp_ppm
       |  FROM ed LEFT JOIN cnt ON ed.digit = cnt.digit CROSS JOIN tot),
       |chi AS (SELECT CAST(SUM(((obs_ppm - exp_ppm) * (obs_ppm - exp_ppm)) // exp_ppm)
       |    AS BIGINT) AS chi2_ppm FROM base)
       |SELECT digit, n, obs_ppm, exp_ppm, chi2_ppm FROM base CROSS JOIN chi""".stripMargin
  }
}
