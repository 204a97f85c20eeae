package graft

import graft.ops.StockOps
import graft.queries.{AnalyticsQueries, ExtQueries, RefQueries, TpchQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The full medallion chain: lineitem → bronze OHLCV → silver daily →
    * gold monthly summary (reference's gold model,
    * dbt/lakehouse_models/models/gold/monthly_stock_summary.sql). */
  def entry(spark: SparkSession): DataFrame =
    StockOps.goldMonthly(StockOps.silverDaily(StockOps.bronzeFromLineitem(
      Tables.lineitem(spark, "/root/testdata/sf0.001"))))

  /** One entry per implemented operator: reference parity (SURVEY.md §2)
    * plus the training-data-pipeline extensions (SURVEY.md §7.3 step 4). */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RefQueries.queryMap ++ TpchQueries.queryMap ++ AnalyticsQueries.queryMap ++
      ExtQueries.queries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RefQueries.oracleMap ++ TpchQueries.oracleMap ++ AnalyticsQueries.oracleMap ++
      ExtQueries.queries.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
