package graft.ops

import graft.Det
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DateType, DecimalType}

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
}
