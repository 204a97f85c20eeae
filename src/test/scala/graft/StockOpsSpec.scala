package graft

import graft.ops.{Multimodal, StockOps}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Medallion transform golden values over a hand-built bronze frame
  * (FIXTURES.md §1.1 edge rows), plus the multimodal decode stub. */
class StockOpsSpec extends SparkSpec {

  private def bronze = {
    import spark.implicits._
    Seq(
      // sigla_raw needs upper/trim; normal row
      ("ibm ", "2025-11-14 00:00:00", 210.0, 212.5, 209.0, 211.0, 100.0),
      // volume=0 → dropped by quality filter
      ("MSFT", "2025-11-14 00:00:00", 420.0, 421.0, 415.0, 418.3, 0.0),
      // close=0 → dropped
      ("NVDA", "2025-11-14 00:00:00", 0.0, 0.0, 0.0, 0.0, 120.0),
      // second IBM day in same month
      ("IBM", "2025-11-17 00:00:00", 211.0, 215.0, 210.5, 214.8, 50.0))
      .toDF("sigla_raw", "trade_ts", "open_px", "high_px", "low_px", "close_px", "volume")
      .withColumn("trade_ts", col("trade_ts").cast(TimestampType))
  }

  test("silverDaily normalizes keys, filters quality, derives variation") {
    val out = StockOps.silverDaily(bronze).orderBy("sigla_empresa", "data_pregao").collect()
    assert(out.length == 2) // MSFT and NVDA rows dropped
    val ibm14 = out(0)
    assert(ibm14.getString(0) == "IBM")
    assert(ibm14.getAs[java.sql.Date](1).toString == "2025-11-14")
    assert(ibm14.getAs[Double]("valor_abertura") == 210.0)
    assert(math.abs(ibm14.getAs[Double]("variacao_dia_abs") - 1.0) < 1e-12)
    assert(math.abs(ibm14.getAs[Double]("variacao_dia_perc") - 1.0 / 210.0) < 1e-15)
  }

  test("try_divide yields NULL on zero divisor (SAFE_DIVIDE parity)") {
    import spark.implicits._
    val z = Seq(("A ", "2025-01-01 00:00:00", 0.0, 1.0, 0.5, 1.0, 10.0))
      .toDF("sigla_raw", "trade_ts", "open_px", "high_px", "low_px", "close_px", "volume")
      .withColumn("trade_ts", col("trade_ts").cast(TimestampType))
    val r = StockOps.silverDaily(z).collect().head
    assert(r.isNullAt(r.fieldIndex("variacao_dia_perc")))
  }

  test("goldMonthly aggregates one row per (ticker, month) with golden values") {
    val out = StockOps.goldMonthly(StockOps.silverDaily(bronze)).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getString(0) == "IBM")
    assert(r.getInt(1) == 2025 && r.getInt(2) == 11)
    assert(r.getAs[java.sql.Date]("data_inicio_mes").toString == "2025-11-01")
    assert(r.getAs[Double]("volume_total_mensal") == 150.0)
    assert(math.abs(r.getAs[Double]("preco_medio_fechamento_mensal") - (211.0 + 214.8) / 2) < 1e-9)
    assert(r.getAs[Double]("maximo_mensal") == 215.0)
    assert(r.getAs[Double]("minimo_mensal") == 209.0)
  }

  test("silverTyped applies the DECIMAL(30,8) contract") {
    val out = StockOps.silverTyped(StockOps.silverDaily(bronze))
    val t = out.schema("valor_abertura").dataType
    assert(t == DecimalType(30, 8))
  }

  test("multimodal decode stub is deterministic and schema-stable") {
    import spark.implicits._
    val docs = Seq((1L, "hello world"), (2L, "hello world"), (3L, "x"))
      .toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
    val out = Multimodal.decodeMeta(spark, docs, "doc_id", "payload")
      .orderBy("doc_id").collect()
    assert(out(0).getLong(1) == 11L)                       // byte_len
    assert(out(0).getString(2) == "68656c6c6f20776f")      // "hello wo" hex
    assert(out(0).getInt(3) == out(1).getInt(3))           // same bytes → same width
    assert(out(2).getLong(1) == 1L)
  }
}
