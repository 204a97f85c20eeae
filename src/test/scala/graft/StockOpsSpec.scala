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

  private def silverOf(rows: Seq[(String, String, Double, Long)]) = {
    import spark.implicits._
    rows.toDF("sigla_empresa", "d", "valor_fechamento", "volume_negociado")
      .withColumn("data_pregao", col("d").cast(org.apache.spark.sql.types.DateType))
      .drop("d")
  }

  test("vwapMonthly: exact price*volume weighting") {
    val s = silverOf(Seq(
      ("T", "1995-01-02", 1.0, 1L), ("T", "1995-01-03", 3.0, 3L),
      ("T", "1995-02-01", 5.0, 2L)))
    val out = StockOps.vwapMonthly(s).orderBy("ano", "mes").collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getAs[Long]("volume_total"),
        r.getAs[Double]("vwap")))
    assert(out.toSeq == Seq((1995, 1, 4L, 2.5), (1995, 2, 2L, 5.0)))
  }

  test("maxDrawdown: running peak, integral basis points, earliest trough") {
    val days = Seq("01-02", "01-03", "01-04", "01-05", "01-06", "01-09")
    val px = Seq(100L, 120L, 90L, 95L, 60L, 80L)
    val s = silverOf(days.zip(px).map { case (d, p) =>
      ("T", s"1995-$d", p / 10000.0, 1L) })
    val r = StockOps.maxDrawdown(s).collect().head
    assert(r.getAs[Long]("max_drawdown_bp") == 5000L)
    assert(r.getAs[java.sql.Date]("trough_date").toString == "1995-01-06")
  }

  test("rsi: full windows only, hand-computed Cutler values, flat window NULL") {
    val days = Seq("01-02", "01-03", "01-04", "01-05", "01-06")
    val px = Seq(10L, 11L, 13L, 12L, 12L)
    val s = silverOf(days.zip(px).map { case (d, p) =>
      ("T", s"1995-$d", p / 10000.0, 1L) })
    val out = StockOps.rsi(s, period = 2).orderBy("d").collect()
      .map(r => (r.getDate(1).toString,
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      ("1995-01-04", Some(100.0)),
      ("1995-01-05", Some(100.0 * 2.0 / 3.0)),
      ("1995-01-06", Some(0.0))))
    // an all-flat series: gains+losses = 0 -> NULL rsi
    val flat = silverOf(days.map(d => ("T", s"1995-$d", 1.0, 1L)))
    val fr = StockOps.rsi(flat, period = 2).orderBy("d").collect()
    assert(fr.nonEmpty && fr.forall(_.isNullAt(2)))
  }

  test("momGrowth: lag deltas, integral basis points, first month NULL") {
    import spark.implicits._
    val gold = Seq(("T", 1995, 1, 100.0), ("T", 1995, 2, 150.0), ("T", 1995, 3, 120.0))
      .toDF("sigla_empresa", "ano", "mes", "volume_total_mensal")
    val out = StockOps.momGrowth(gold).orderBy("ano", "mes").collect()
      .map(r => (r.getInt(2), Option(r.get(r.fieldIndex("delta"))),
        Option(r.get(r.fieldIndex("growth_bp")))))
    assert(out.toSeq == Seq(
      (1, None, None),
      (2, Some(50L), Some(5000L)),
      (3, Some(-30L), Some(-2000L))))
  }

  test("beta: integer-bp returns, equal-weight market, exact proportional betas") {
    // X returns (10, -10, 20) bp, Y = X/2 -> market(sum) = 1.5X
    // beta_X = 2/3, beta_Y = 1/3, both exactly (correctly-rounded 1/3 ulps)
    val days = Seq("01-02", "01-03", "01-04", "01-05")
    val px = Seq(10000L, 10010L, 9999L, 10019L)   // r: 10, -10, 20
    val py = Seq(20000L, 20010L, 19999L, 20019L)  // r: 5, -5, 10
    val s = silverOf(days.zip(px).map { case (d, p) => ("X", s"1995-$d", p / 10000.0, 1L) }
      ++ days.zip(py).map { case (d, p) => ("Y", s"1995-$d", p / 10000.0, 1L) })
    val out = StockOps.beta(s).orderBy("ticker").collect()
      .map(r => (r.getString(0), r.getAs[Long]("n_days"), r.getAs[Double]("beta")))
    assert(out.toSeq == Seq(("X", 3L, 2.0 / 3.0), ("Y", 3L, 1.0 / 3.0)))
  }

  test("sharpe: exact chain on hand returns, degenerate cases NULL") {
    // X returns (10, -10, 20): mean 20/3, sample var (n*srr - sr^2)/(n(n-1))
    // = (3*600 - 400)/6 = 1400/6; sharpe = (20/3)/sqrt(1400/6)
    val days = Seq("01-02", "01-03", "01-04", "01-05")
    val px = Seq(10000L, 10010L, 9999L, 10019L)
    val s = silverOf(days.zip(px).map { case (d, p) => ("X", s"1995-$d", p / 10000.0, 1L) })
    val r = StockOps.sharpe(s).collect().head
    val want = (20.0 / 3.0) / math.sqrt(1400.0 / 6.0)
    assert(r.getAs[Long]("n_days") == 3L && r.getAs[Double]("sharpe") == want)
    // constant price: zero variance -> NULL
    val flat = silverOf(days.map(d => ("F", s"1995-$d", 1.0, 1L)))
    val fr = StockOps.sharpe(flat).collect().head
    assert(fr.isNullAt(fr.fieldIndex("sharpe")))
  }

  test("varCvar: k-th-worst pick, exact tail mean, tie quota") {
    // prices 1.0000 then steps: px in 1e-4 units via valor_fechamento.
    // 21 days -> 20 returns; k = ceil(0.05*20) = 1 -> var = worst, cvar = worst.
    val days = (2 to 22).map(i => f"01-$i%02d")
    // px path: one big crash (-50% = -5000bp) then tiny moves
    val px = Seq(1.0) ++ Seq(0.5) ++ (3 to 21).map(i => 0.5 + (i % 3) * 0.0001)
    val s1 = silverOf(days.zip(px).map { case (d, p) => ("T", s"1995-$d", p, 1L) })
    val r1 = StockOps.varCvar(s1).collect().head
    assert(r1.getAs[Long]("n_days") == 20L)
    assert(r1.getAs[Long]("var95_bp") == -5000L, s"worst return: $r1")
    assert(r1.getAs[Double]("cvar95_bp") == -5000.0)
    // 40 returns -> k = 2 -> cvar = mean of the two worst; ties at the
    // cutoff take only the remaining quota
    val days2 = (2 to 28).map(i => f"01-$i%02d") ++ (1 to 14).map(i => f"02-$i%02d")
    assert(days2.size == 41)
    // two crashes of equal size (-50%): both enter the k=2 tail exactly once
    val px2 = Seq(1.0, 0.5) ++ (1 to 19).map(_ => 0.5) ++ Seq(0.25) ++ (1 to 19).map(_ => 0.25)
    assert(px2.size == 41)
    val s2 = silverOf(days2.zip(px2).map { case (d, p) => ("T", s"1995-$d", p, 1L) })
    val r2 = StockOps.varCvar(s2).collect().head
    assert(r2.getAs[Long]("n_days") == 40L)
    assert(r2.getAs[Long]("var95_bp") == -5000L)
    assert(r2.getAs[Double]("cvar95_bp") == -5000.0, s"mean of two -5000 tails: $r2")
  }

  test("varCvar: tie group straddling an exactly-integral quantile boundary") {
    // 61 days -> 60 returns, 5%·60 = 3 EXACTLY (k = 3, no ceil slack):
    // two -5000bp crashes (cum 2), then a TIE GROUP of two -3000bp
    // drops straddling the k boundary (cum 4 > 3) — the span-overlap
    // quota must take exactly ONE of them: VaR = -3000 (the value AT
    // position k), CVaR = (2·(-5000) + 1·(-3000)) / 3. An off-by-one
    // in the walk (k-1 / k+1, or full-group instead of quota) moves
    // either number — this is the exact-boundary case the r14 audit
    // flagged as the mirror family's highest risk.
    val days = (2 to 28).map(i => f"01-$i%02d") ++ (1 to 28).map(i => f"02-$i%02d") ++
      (1 to 6).map(i => f"03-$i%02d")
    assert(days.size == 61)
    // px path in exact 1e-4 units: 1.0 →(-50%) 0.5 →(-50%) 0.25, flats,
    // then two separated -30% drops (0.25→0.175→0.1225), flats after —
    // each drop is exactly -3000bp because (px·10000) divides evenly
    val px = Seq(1.0, 0.5, 0.25) ++ (1 to 20).map(_ => 0.25) ++
      Seq(0.175) ++ (1 to 15).map(_ => 0.175) ++
      Seq(0.1225) ++ (1 to 21).map(_ => 0.1225)
    assert(px.size == 61)
    val s = silverOf(days.zip(px).map { case (d, p) => ("T", s"1995-$d", p, 1L) })
    val r = StockOps.varCvar(s).collect().head
    assert(r.getAs[Long]("n_days") == 60L)
    assert(r.getAs[Long]("var95_bp") == -3000L, s"value at position k: $r")
    assert(r.getAs[Double]("cvar95_bp") == (2.0 * -5000.0 + -3000.0) / 3.0,
      s"tie at the boundary must contribute its quota only: $r")
  }

  test("smaCross: strict sign flip only, zero-relation days break signals") {
    val days = Seq("01-02", "01-03", "01-04", "01-05", "01-06", "01-09", "01-10")
    val px = Seq(10L, 10L, 10L, 20L, 20L, 1L, 1L)
    val s = silverOf(days.zip(px).map { case (d, p) =>
      ("T", s"1995-$d", p / 10000.0, 1L) })
    val out = StockOps.smaCross(s, fast = 2, slow = 3).collect()
      .map(r => (r.getDate(1).toString, r.getString(2)))
    assert(out.toSeq == Seq(("1995-01-09", "death")))
  }
}
