package graft

import org.apache.spark.sql.functions._

/** fsum/favg must be bit-identical to dsum/davg on decimal-rational
  * doubles (their documented precondition) at any partitioning. */
class DetSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(42)

  test("fsum == dsum bit-exactly on 2- and 4-decimal rationals") {
    // cents in [-10^7, 10^7) → dollars with exactly 2 decimals; the
    // 4-decimal set mimics price*(1-discount) products
    val vals2 = Seq.fill(5000)((rnd.nextLong() % 10000000L) / 100.0)
    val vals4 = Seq.fill(5000)((rnd.nextLong() % 1000000000L) / 10000.0)
    for ((vals, scale) <- Seq((vals2, 2), (vals4, 4)); parts <- Seq(1, 7)) {
      val df = vals.toDF("v").repartition(parts)
      val r = df.agg(
        Det.dsum(col("v"), scale).as("d"), Det.fsum(col("v"), scale).as("f"),
        Det.davg(col("v"), scale).as("da"), Det.favg(col("v"), scale).as("fa"))
        .head()
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0))
        == java.lang.Double.doubleToLongBits(r.getDouble(1)),
        s"fsum != dsum at scale=$scale parts=$parts: ${r.getDouble(0)} vs ${r.getDouble(1)}")
      assert(java.lang.Double.doubleToLongBits(r.getDouble(2))
        == java.lang.Double.doubleToLongBits(r.getDouble(3)),
        s"favg != davg at scale=$scale parts=$parts")
    }
  }

  test("fsum handles NULLs and negatives like dsum") {
    val df = Seq(Some(1.25), None, Some(-3.75), Some(0.0), Some(-0.01))
      .toDF("v")
    val r = df.agg(Det.dsum(col("v")).as("d"), Det.fsum(col("v")).as("f")).head()
    assert(r.getDouble(0) == -2.51 && r.getDouble(1) == -2.51)
  }
}
