package graft.ops

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType, DoubleType, LongType}

/**
 * The reference's medallion transforms (bronze → silver → gold),
 * re-expressed over the driver's `lineitem` table so every stage is
 * DuckDB-verifiable (FIXTURES.md §3 mapping).
 *
 * Reference provenance:
 *  - bronze shape: pipelines/stock_api/ingest_stocks.py:52-63
 *  - silver refinement (upper/trim key, to_date, decimal casts, drop):
 *    pipelines/stock_api/transforme_stock_silver.py:103-134
 *  - dbt silver (renames, variacao_dia_abs, SAFE_DIVIDE, quality filter):
 *    dbt/lakehouse_models/models/silver/daily_stocks.sql:8-27
 *  - dbt gold (monthly GROUP BY with SUM/AVG/MAX/MIN over
 *    EXTRACT(YEAR/MONTH) + DATE_TRUNC month keys):
 *    dbt/lakehouse_models/models/gold/monthly_stock_summary.sql:7-39
 *
 * Determinism deviations from the reference (documented per SURVEY §7.4):
 * audit timestamps are injected (`lit`) rather than `current_timestamp`,
 * and the silver day-level collapse uses deterministic aggregates
 * (max/min/exact-sum) since lineitem has many rows per (ticker, day).
 *
 * Every stage is narrow except the two aggregations (silver daily and
 * gold monthly), each a single hash-aggregate shuffle with map-side
 * partial aggregation — the plan shape that scales linearly with data.
 */
object StockOps {

  /** Deterministic OHLCV bronze derived from lineitem: 3 "tickers" from
    * l_returnflag (deliberately messy-cased, exercising P10 upper/trim),
    * trading date from l_shipdate, prices from extendedprice arithmetic. */
  def bronzeFromLineitem(li: DataFrame): DataFrame =
    li.select(
      concat(lower(col("l_returnflag")), lit(" ")).as("sigla_raw"),
      col("l_shipdate").as("trade_ts"),
      col("l_extendedprice").as("open_px"),
      (col("l_extendedprice") * (lit(1) + col("l_tax"))).as("high_px"),
      (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) - col("l_tax"))).as("low_px"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("close_px"),
      col("l_quantity").as("volume"))

  /** Silver: key normalization, date cast, quality filter, day-level
    * collapse, derived daily variation columns (P1-P4, P10-P11, F2). */
  def silverDaily(bronze: DataFrame): DataFrame =
    bronze
      .withColumn("sigla_empresa", Sanitize.normalizeKey(col("sigla_raw")))
      .withColumn("data_pregao", col("trade_ts").cast(DateType))
      .filter(col("volume") > 0 && col("close_px") > 0)
      .groupBy(col("sigla_empresa"), col("data_pregao"))
      .agg(
        max(col("open_px")).as("valor_abertura"),
        max(col("high_px")).as("valor_maximo"),
        min(col("low_px")).as("valor_minimo"),
        min(col("close_px")).as("valor_fechamento"),
        Det.dsum(col("volume")).as("volume_negociado"))
      .withColumn("variacao_dia_abs", col("valor_fechamento") - col("valor_abertura"))
      .withColumn("variacao_dia_perc",
        try_divide(col("valor_fechamento") - col("valor_abertura"), col("valor_abertura")))

  /** DuckDB SQL equivalent of bronze→silver, FROM `lineitem`;
    * `where` optionally restricts the lineitem scan (e.g. a snapshot
    * cut for the time-travel oracle). */
  def silverSql(where: String = ""): String =
    s"""WITH bronze AS (
       |  SELECT lower(l_returnflag) || ' ' AS sigla_raw,
       |         l_shipdate AS trade_ts,
       |         l_extendedprice AS open_px,
       |         l_extendedprice * (1 + l_tax) AS high_px,
       |         l_extendedprice * (1 - l_discount) * (1 - l_tax) AS low_px,
       |         l_extendedprice * (1 - l_discount) AS close_px,
       |         l_quantity AS volume
       |  FROM lineitem $where)
       |SELECT sigla_empresa, data_pregao,
       |       valor_abertura, valor_maximo, valor_minimo, valor_fechamento,
       |       volume_negociado,
       |       valor_fechamento - valor_abertura AS variacao_dia_abs,
       |       CASE WHEN valor_abertura = 0 OR valor_abertura IS NULL THEN NULL
       |            ELSE (valor_fechamento - valor_abertura) / valor_abertura END
       |         AS variacao_dia_perc
       |FROM (
       |  SELECT upper(trim(sigla_raw)) AS sigla_empresa,
       |         CAST(trade_ts AS DATE) AS data_pregao,
       |         MAX(open_px) AS valor_abertura,
       |         MAX(high_px) AS valor_maximo,
       |         MIN(low_px) AS valor_minimo,
       |         MIN(close_px) AS valor_fechamento,
       |         ${Det.dsumSql("volume")} AS volume_negociado
       |  FROM bronze
       |  WHERE volume > 0 AND close_px > 0
       |  GROUP BY 1, 2)""".stripMargin

  /** Gold: monthly per-ticker summary (A2/O2,
    * monthly_stock_summary.sql:7-39). */
  def goldMonthly(silver: DataFrame): DataFrame =
    silver
      .groupBy(
        col("sigla_empresa"),
        year(col("data_pregao")).as("ano"),
        month(col("data_pregao")).as("mes"),
        date_trunc("month", col("data_pregao")).cast(DateType).as("data_inicio_mes"))
      .agg(
        Det.dsum(col("volume_negociado")).as("volume_total_mensal"),
        Det.davg(col("valor_fechamento")).as("preco_medio_fechamento_mensal"),
        max(col("valor_maximo")).as("maximo_mensal"),
        min(col("valor_minimo")).as("minimo_mensal"))
      .orderBy(col("sigla_empresa"), col("ano"), col("mes"))

  /** DuckDB SQL equivalent of the full bronze→silver→gold chain. */
  def goldSql(where: String = ""): String =
    s"""WITH silver AS (${silverSql(where)})
       |SELECT sigla_empresa,
       |       CAST(year(data_pregao) AS INTEGER) AS ano,
       |       CAST(month(data_pregao) AS INTEGER) AS mes,
       |       CAST(date_trunc('month', data_pregao) AS DATE) AS data_inicio_mes,
       |       ${Det.dsumSql("volume_negociado")} AS volume_total_mensal,
       |       ${Det.davgSql("valor_fechamento")} AS preco_medio_fechamento_mensal,
       |       MAX(valor_maximo) AS maximo_mensal,
       |       MIN(valor_minimo) AS minimo_mensal
       |FROM silver
       |GROUP BY 1, 2, 3, 4
       |ORDER BY sigla_empresa, ano, mes""".stripMargin

  /** Silver rows cast to the reference's DECIMAL(30,8) contract (P5,
    * transforme_stock_silver.py:118-122) — the "typed" silver variant. */
  def silverTyped(silver: DataFrame): DataFrame = {
    val d = DecimalType(30, 8)
    silver.select(
      col("sigla_empresa"), col("data_pregao"),
      col("valor_abertura").cast(d).as("valor_abertura"),
      col("valor_maximo").cast(d).as("valor_maximo"),
      col("valor_minimo").cast(d).as("valor_minimo"),
      col("valor_fechamento").cast(d).as("valor_fechamento"),
      col("volume_negociado").cast(d).as("volume_negociado"))
  }

  import org.apache.spark.sql.expressions.Window

  /** Silver daily series reduced to the integer indicator grain:
    * `(ticker, d, px, vol)` with close in exact 10⁻⁴ units and volume
    * as an exact integer — every indicator below computes on integers
    * until its one documented double epilogue. */
  private def indicatorBase(silver: DataFrame): DataFrame =
    silver.select(col("sigla_empresa").as("ticker"),
      col("data_pregao").as("d"),
      (col("valor_fechamento").cast(DecimalType(28, 4)) * 10000)
        .cast("long").as("px"),
      col("volume_negociado").cast("long").as("vol"))

  private val IndicatorBaseSql =
    """SELECT sigla_empresa AS ticker, data_pregao AS d,
      |  CAST(round(valor_fechamento * 10000) AS BIGINT) AS px,
      |  CAST(volume_negociado AS BIGINT) AS vol
      |FROM silver""".stripMargin

  /**
   * Monthly VWAP per ticker — Σ(close·volume)/Σ(volume), the
   * volume-weighted price the reference's gold layer approximates with
   * a plain AVG (monthly_stock_summary.sql uses AVG(close); VWAP is
   * what a trading consumer actually wants). Exact DECIMAL(38,0)
   * numerator, one double division.
   */
  def vwapMonthly(silver: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    indicatorBase(silver)
      .groupBy(col("ticker"), year(col("d")).as("ano"), month(col("d")).as("mes"))
      .agg(sum(col("vol")).as("volume_total"),
        sum(col("px").cast(dec38) * col("vol").cast(dec38)).as("__pv"))
      .select(col("ticker"), col("ano"), col("mes"), col("volume_total"),
        when(col("volume_total") > 0,
          col("__pv").cast("double") /
            (col("volume_total").cast("double") * 10000.0)).as("vwap"))
  }

  /** DuckDB mirror of [[vwapMonthly]] over `silver`. The HUGEINT
    * numerator Σ(px·vol) routes through [[graft.Det.hiLoDoubleSql]]:
    * it exceeds 2^53 at modest volumes and DuckDB's direct
    * HUGEINT→DOUBLE cast is not correctly rounded past 2^53 while
    * Spark's Decimal→Double is. */
  def vwapMonthlySql: String =
    s"""SELECT ticker, CAST(year(d) AS INTEGER) AS ano,
       |  CAST(month(d) AS INTEGER) AS mes,
       |  CAST(SUM(vol) AS BIGINT) AS volume_total,
       |  CASE WHEN SUM(vol) > 0 THEN
       |    ${graft.Det.hiLoDoubleSql("SUM(CAST(px AS HUGEINT) * vol)")}
       |      / (CAST(SUM(vol) AS BIGINT) * 10000.0) END AS vwap
       |FROM ($IndicatorBaseSql) GROUP BY 1, 2, 3""".stripMargin

  /**
   * MAXIMUM DRAWDOWN per ticker — the deepest peak-to-trough loss of
   * the close series, in exact basis points: running peak is a
   * cumulative-max window over the (bounded, pre-aggregated) daily
   * series, per-day drawdown is `((peak − px)·10000) div peak`
   * (integral — truncation identical in both engines on non-negative
   * prices), and the report is each ticker's max with the EARLIEST
   * date attaining it. The stock-risk statistic a monthly gold table
   * cannot see (it needs the running extremum, not a group agg).
   */
  def maxDrawdown(silver: DataFrame): DataFrame = {
    val w = Window.partitionBy("ticker").orderBy("d")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val dd = indicatorBase(silver)
      .withColumn("__peak", max("px").over(w))
      .withColumn("dd_bp", expr("((__peak - px) * 10000) div __peak"))
    dd.withColumn("__max", max("dd_bp").over(Window.partitionBy("ticker")))
      .filter(col("dd_bp") === col("__max"))
      .groupBy("ticker")
      .agg(max("dd_bp").as("max_drawdown_bp"), min("d").as("trough_date"))
  }

  /** DuckDB mirror of [[maxDrawdown]] over `silver`. */
  def maxDrawdownSql: String =
    s"""WITH base AS ($IndicatorBaseSql),
       |dd AS (SELECT ticker, d,
       |    ((MAX(px) OVER (PARTITION BY ticker ORDER BY d
       |        ROWS UNBOUNDED PRECEDING) - px) * 10000)
       |      // MAX(px) OVER (PARTITION BY ticker ORDER BY d
       |        ROWS UNBOUNDED PRECEDING) AS dd_bp
       |  FROM base),
       |mx AS (SELECT ticker, MAX(dd_bp) AS m FROM dd GROUP BY 1)
       |SELECT dd.ticker, CAST(MAX(dd_bp) AS BIGINT) AS max_drawdown_bp,
       |  MIN(d) AS trough_date
       |FROM dd JOIN mx ON dd.ticker = mx.ticker AND dd.dd_bp = mx.m
       |GROUP BY 1""".stripMargin

  /**
   * Cutler's RSI over `period` days — `100·ΣG/(ΣG+ΣL)` with gains and
   * losses as exact integer rolling sums over the daily diffs (the
   * simple-moving-average RSI variant; Wilder's exponential smoothing
   * is a sequential recursion with no closed form, so the SMA variant
   * is what batch engines and most charting SQL actually compute).
   * Rows before a full window are withheld (an RSI over 3 points is
   * not an RSI); a flat window (ΣG+ΣL = 0) is NULL, both engines.
   */
  def rsi(silver: DataFrame, period: Int = 14): DataFrame = {
    require(period >= 2, s"rsi: period must be >= 2, got $period")
    val byT = Window.partitionBy("ticker").orderBy("d")
    val roll = byT.rowsBetween(-(period - 1), Window.currentRow)
    val diffs = indicatorBase(silver)
      .withColumn("__diff", col("px") - lag("px", 1).over(byT))
      .withColumn("__rn", row_number().over(byT))
    diffs
      .withColumn("__g", sum(greatest(col("__diff"), lit(0L))).over(roll))
      .withColumn("__l", sum(greatest(-col("__diff"), lit(0L))).over(roll))
      // a full window needs `period` DIFFS = period+1 price rows
      .filter(col("__rn") > period)
      .select(col("ticker"), col("d"),
        when(col("__g") + col("__l") > 0,
          lit(100.0) * col("__g").cast("double") /
            (col("__g") + col("__l")).cast("double")).as("rsi"))
  }

  /** DuckDB mirror of [[rsi]] over `silver`. */
  def rsiSql(period: Int = 14): String =
    s"""WITH base AS ($IndicatorBaseSql),
       |diffs AS (SELECT ticker, d,
       |    px - lag(px, 1) OVER (PARTITION BY ticker ORDER BY d) AS diff,
       |    row_number() OVER (PARTITION BY ticker ORDER BY d) AS rn
       |  FROM base),
       |roll AS (SELECT ticker, d, rn,
       |    SUM(GREATEST(diff, 0)) OVER (PARTITION BY ticker ORDER BY d
       |      ROWS BETWEEN ${period - 1} PRECEDING AND CURRENT ROW) AS g,
       |    SUM(GREATEST(-diff, 0)) OVER (PARTITION BY ticker ORDER BY d
       |      ROWS BETWEEN ${period - 1} PRECEDING AND CURRENT ROW) AS l
       |  FROM diffs)
       |SELECT ticker, d,
       |  CASE WHEN g + l > 0 THEN 100.0 * CAST(g AS DOUBLE) / CAST(g + l AS DOUBLE) END AS rsi
       |FROM roll WHERE rn > $period""".stripMargin

  /**
   * Month-over-month growth on the GOLD monthly summary — the BI
   * staple the reference's dashboards would compute downstream:
   * previous month's volume via one lag window per ticker, change in
   * exact units and in basis points (integral `div` — deterministic,
   * no FP percentage). First month per ticker reports NULLs (no
   * predecessor ≠ zero growth).
   */
  def momGrowth(gold: DataFrame): DataFrame = {
    val w = Window.partitionBy("sigla_empresa").orderBy("ano", "mes")
    gold.select(col("sigla_empresa"), col("ano"), col("mes"),
        col("volume_total_mensal").cast("long").as("vol"))
      .withColumn("__prev", lag("vol", 1).over(w))
      .select(col("sigla_empresa"), col("ano"), col("mes"), col("vol"),
        (col("vol") - col("__prev")).as("delta"),
        when(col("__prev") > 0,
          expr("((vol - __prev) * 10000) div __prev")).as("growth_bp"))
  }

  /** DuckDB mirror of [[momGrowth]] over a `gold` relation with the
    * same column names. */
  def momGrowthSql: String =
    s"""SELECT sigla_empresa, ano, mes, vol,
       |  CAST(vol - prev AS BIGINT) AS delta,
       |  CASE WHEN prev > 0 THEN ((vol - prev) * 10000) // prev END AS growth_bp
       |FROM (SELECT sigla_empresa, ano, mes,
       |        CAST(volume_total_mensal AS BIGINT) AS vol,
       |        lag(CAST(volume_total_mensal AS BIGINT), 1) OVER (
       |          PARTITION BY sigla_empresa ORDER BY ano, mes) AS prev
       |      FROM gold)""".stripMargin

  /**
   * CAPM BETA vs the equal-weight market — cov(rᵢ, r_m)/var(r_m) over
   * daily returns, every return an INTEGER basis-point quantity
   * (`(px_t − px_{t−1})·10⁴ div px_{t−1}` — integral division, no FP
   * ratios), sufficient statistics in DECIMAL(38,0), one double
   * division at the end. The market return is the equal-weight mean
   * in DOUBLED-sum form (Σ over tickers; dividing by the constant
   * ticker count cancels in cov/var, so no division enters the
   * accumulators). Only days where EVERY ticker trades enter (an
   * unbalanced panel would bias the market mean — inner-join
   * semantics made explicit by the day-count filter).
   */
  def beta(silver: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val byT = Window.partitionBy("ticker").orderBy("d")
    val rets = indicatorBase(silver)
      .withColumn("__prev", lag("px", 1).over(byT))
      .filter(col("__prev") > 0)
      .withColumn("r", expr("((px - __prev) * 10000) div __prev"))
      .select(col("ticker"), col("d"), col("r"))
    val nTickers = rets.agg(countDistinct("ticker").as("__nt"))
    val market = rets.groupBy("d")
      .agg(sum("r").as("rm_sum"), count(lit(1)).as("__k"))
      .crossJoin(broadcast(nTickers))
      .filter(col("__k") === col("__nt"))
      .select(col("d"), col("rm_sum"))
    val j = rets.join(broadcast(market), Seq("d"))
    val stats = j.groupBy("ticker").agg(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("r").cast(dec38)).as("sr"),
      sum(col("rm_sum").cast(dec38)).as("sm"),
      sum(col("r").cast(dec38) * col("rm_sum").cast(dec38)).as("srm"),
      sum(col("rm_sum").cast(dec38) * col("rm_sum").cast(dec38)).as("smm"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    stats.select(col("ticker"), col("n").cast("long").as("n_days"),
      when(d(col("n") * col("smm") - col("sm") * col("sm")) > 0.0,
        d(col("n") * col("srm") - col("sr") * col("sm")) /
          d(col("n") * col("smm") - col("sm") * col("sm"))).as("beta"))
  }

  /** DuckDB mirror of [[beta]] — same integer-bp returns, same
    * balanced-day filter, hi/lo-split casts on the big statistics. */
  def betaSql: String = {
    def d(v: String) = graft.Det.hiLoDoubleSql(v)
    s"""WITH base AS ($IndicatorBaseSql),
       |rets AS (SELECT ticker, d, ((px - prev) * 10000) // prev AS r
       |  FROM (SELECT ticker, d, px,
       |          lag(px, 1) OVER (PARTITION BY ticker ORDER BY d) AS prev
       |        FROM base)
       |  WHERE prev > 0),
       |nt AS (SELECT COUNT(DISTINCT ticker) AS k FROM rets),
       |market AS (SELECT d, SUM(r) AS rm_sum FROM rets, nt
       |  GROUP BY d, k HAVING count(*) = k),
       |j AS (SELECT rets.ticker, rets.r, market.rm_sum
       |  FROM rets JOIN market ON rets.d = market.d),
       |stats AS (SELECT ticker, CAST(count(*) AS HUGEINT) AS n,
       |    SUM(CAST(r AS HUGEINT)) AS sr, SUM(CAST(rm_sum AS HUGEINT)) AS sm,
       |    SUM(CAST(r AS HUGEINT) * rm_sum) AS srm,
       |    SUM(CAST(rm_sum AS HUGEINT) * rm_sum) AS smm
       |  FROM j GROUP BY 1)
       |SELECT ticker, CAST(n AS BIGINT) AS n_days,
       |  CASE WHEN ${d("n * smm - sm * sm")} > 0.0
       |    THEN ${d("n * srm - sr * sm")} / ${d("n * smm - sm * sm")} END AS beta
       |FROM stats""".stripMargin
  }

  /**
   * SHARPE RATIO (rf = 0, per-period) per ticker — mean daily return
   * over its standard deviation, both from the SAME integer
   * basis-point returns as [[beta]]: exact DECIMAL(38,0) Σr and Σr²,
   * sample variance, one double chain at the end (single sqrt; NULL on
   * fewer than 2 returns or zero variance). The risk-adjusted
   * companion to [[maxDrawdown]].
   */
  def sharpe(silver: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val byT = Window.partitionBy("ticker").orderBy("d")
    val rets = indicatorBase(silver)
      .withColumn("__prev", lag("px", 1).over(byT))
      .filter(col("__prev") > 0)
      .withColumn("r", expr("((px - __prev) * 10000) div __prev"))
    val stats = rets.groupBy("ticker").agg(
      count(lit(1)).cast(dec38).as("n"),
      sum(col("r").cast(dec38)).as("sr"),
      sum(col("r").cast(dec38) * col("r").cast(dec38)).as("srr"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    // mean/sd in one chain: sharpe = (Σr/n) / sqrt((nΣr²−(Σr)²)/(n(n−1)))
    stats.select(col("ticker"), col("n").cast("long").as("n_days"),
      when(col("n") > 1 &&
          d(col("n") * col("srr") - col("sr") * col("sr")) > 0.0,
        (d(col("sr")) / d(col("n"))) /
          sqrt(d(col("n") * col("srr") - col("sr") * col("sr")) /
            d(col("n") * (col("n") - 1)))).as("sharpe"))
  }

  /** DuckDB mirror of [[sharpe]] — same integer returns, same chain,
    * hi/lo-split casts on the big statistics. */
  def sharpeSql: String = {
    def d(v: String) = graft.Det.hiLoDoubleSql(v)
    s"""WITH base AS ($IndicatorBaseSql),
       |rets AS (SELECT ticker, ((px - prev) * 10000) // prev AS r
       |  FROM (SELECT ticker, d, px,
       |          lag(px, 1) OVER (PARTITION BY ticker ORDER BY d) AS prev
       |        FROM base)
       |  WHERE prev > 0),
       |stats AS (SELECT ticker, CAST(count(*) AS HUGEINT) AS n,
       |    SUM(CAST(r AS HUGEINT)) AS sr, SUM(CAST(r AS HUGEINT) * r) AS srr
       |  FROM rets GROUP BY 1)
       |SELECT ticker, CAST(n AS BIGINT) AS n_days,
       |  CASE WHEN n > 1 AND ${d("n * srr - sr * sr")} > 0.0
       |    THEN (${d("sr")} / ${d("n")}) /
       |      sqrt(${d("n * srr - sr * sr")} / ${d("n * (n - 1)")}) END AS sharpe
       |FROM stats""".stripMargin
  }

  /**
   * Historical VaR / CVaR (expected shortfall) per ticker at the 95%
   * level over the same integer-bp daily returns as [[beta]]/[[sharpe]]:
   * VaR = the k-th WORST return with k = ⌈5%·n⌉ (exact integer ceil
   * division — no double quantile), CVaR = the exact mean of the k
   * worst, with ties at the cutoff contributing only the remaining
   * quota (the [[graft.ops.Profile.trimmedMean]] span-overlap
   * discipline: the cumulative walk runs over the per-ticker
   * VALUE-COUNT table, so the window sorts distinct return values,
   * never rows). One double division at the edge. The risk report a
   * monthly gold table cannot see — it needs the return distribution's
   * tail, not a mean.
   */
  def varCvar(silver: DataFrame): DataFrame = {
    val dec38 = DecimalType(38, 0)
    val byT = Window.partitionBy("ticker").orderBy("d")
    val rets = indicatorBase(silver)
      .withColumn("__prev", lag("px", 1).over(byT))
      .filter(col("__prev") > 0)
      .withColumn("r", expr("((px - __prev) * 10000) div __prev"))
    val vc = rets.groupBy(col("ticker"), col("r")).agg(count(lit(1)).as("c"))
    val walk = Window.partitionBy("ticker").orderBy("r")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy("ticker")
    vc.withColumn("__cum", sum("c").over(walk))
      .withColumn("__n", sum("c").over(all))
      .withColumn("__k", expr("(__n * 5 + 99) div 100"))
      .withColumn("__take", greatest(lit(0L),
        least(col("__cum"), col("__k")) - (col("__cum") - col("c"))))
      .groupBy("ticker")
      .agg(max("__n").cast(LongType).as("n_days"),
        max(when(col("__take") > 0, col("r"))).as("var95_bp"),
        sum(col("r").cast(dec38) * col("__take").cast(dec38)).as("__tv"),
        max("__k").as("__kk"))
      .select(col("ticker"), col("n_days"), col("var95_bp"),
        (col("__tv").cast(DoubleType) / col("__kk").cast(DoubleType))
          .as("cvar95_bp"))
  }

  /** DuckDB mirror of [[varCvar]] — same value-count walk, same
    * span-overlap take counts, same integer ceil-division. */
  def varCvarSql: String =
    s"""WITH base AS ($IndicatorBaseSql),
       |rets AS (SELECT ticker, ((px - prev) * 10000) // prev AS r
       |  FROM (SELECT ticker, d, px,
       |          lag(px, 1) OVER (PARTITION BY ticker ORDER BY d) AS prev
       |        FROM base)
       |  WHERE prev > 0),
       |vc AS (SELECT ticker, r, count(*) AS c FROM rets GROUP BY 1, 2),
       |walk AS (SELECT ticker, r, c,
       |    SUM(c) OVER (PARTITION BY ticker ORDER BY r ROWS UNBOUNDED PRECEDING) AS cum,
       |    SUM(c) OVER (PARTITION BY ticker) AS n
       |  FROM vc),
       |take AS (SELECT ticker, r, n, (n * 5 + 99) // 100 AS k,
       |    GREATEST(0, LEAST(cum, (n * 5 + 99) // 100) - (cum - c)) AS tk
       |  FROM walk)
       |SELECT ticker, CAST(MAX(n) AS BIGINT) AS n_days,
       |  MAX(CASE WHEN tk > 0 THEN r END) AS var95_bp,
       |  CAST(SUM(CAST(r AS HUGEINT) * tk) AS DOUBLE) / CAST(MAX(k) AS DOUBLE)
       |    AS cvar95_bp
       |FROM take GROUP BY 1""".stripMargin

  /**
   * SMA CROSSOVER signals (golden/death cross): days where the
   * fast-window mean crosses the slow-window mean. The comparison is
   * CROSS-MULTIPLIED — `ΣF·slow > ΣS·fast` — so the signal is pure
   * integer arithmetic with zero FP, and a crossing is a strict sign
   * change of that relation vs the previous full-window day (touch-
   * and-revert days, rel = 0, are neither above nor below: the signal
   * fires only on a strict flip, matching how charting packages
   * deduplicate). Output: `(ticker, d, direction)`.
   */
  def smaCross(silver: DataFrame, fast: Int = 5, slow: Int = 20): DataFrame = {
    require(fast >= 2 && slow > fast, s"smaCross: need 2 <= fast < slow, got $fast, $slow")
    val byT = Window.partitionBy("ticker").orderBy("d")
    val base = indicatorBase(silver)
      .withColumn("__sf", sum("px").over(byT.rowsBetween(-(fast - 1), Window.currentRow)))
      .withColumn("__ss", sum("px").over(byT.rowsBetween(-(slow - 1), Window.currentRow)))
      .withColumn("__rn", row_number().over(byT))
      .filter(col("__rn") >= slow)
    val rel = (col("__sf") * lit(slow.toLong)) - (col("__ss") * lit(fast.toLong))
    base.withColumn("__above", when(rel > 0, 1).when(rel < 0, -1).otherwise(0))
      .withColumn("__prev", lag("__above", 1).over(byT))
      .filter(col("__prev").isNotNull &&
        col("__above") =!= col("__prev") && col("__above") =!= 0 && col("__prev") =!= 0)
      .select(col("ticker"), col("d"),
        when(col("__above") > 0, lit("golden")).otherwise(lit("death")).as("direction"))
  }

  /** DuckDB mirror of [[smaCross]] over `silver`. */
  def smaCrossSql(fast: Int = 5, slow: Int = 20): String =
    s"""WITH base AS ($IndicatorBaseSql),
       |sums AS (SELECT ticker, d,
       |    SUM(px) OVER (PARTITION BY ticker ORDER BY d
       |      ROWS BETWEEN ${fast - 1} PRECEDING AND CURRENT ROW) AS sf,
       |    SUM(px) OVER (PARTITION BY ticker ORDER BY d
       |      ROWS BETWEEN ${slow - 1} PRECEDING AND CURRENT ROW) AS ss,
       |    row_number() OVER (PARTITION BY ticker ORDER BY d) AS rn
       |  FROM base),
       |rel AS (SELECT ticker, d, rn,
       |    CASE WHEN sf * $slow - ss * $fast > 0 THEN 1
       |         WHEN sf * $slow - ss * $fast < 0 THEN -1 ELSE 0 END AS above
       |  FROM sums WHERE rn >= $slow),
       |flips AS (SELECT ticker, d, above,
       |    lag(above, 1) OVER (PARTITION BY ticker ORDER BY d) AS prev
       |  FROM rel)
       |SELECT ticker, d,
       |  CASE WHEN above > 0 THEN 'golden' ELSE 'death' END AS direction
       |FROM flips
       |WHERE prev IS NOT NULL AND above <> prev AND above <> 0 AND prev <> 0""".stripMargin
}
