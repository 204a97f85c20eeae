package graft

import graft.ops.Layout
import org.apache.spark.sql.functions._

/** Z-order layout: bit-interleave parity against a reference Scala
  * implementation, permutation safety, and the clustering property the
  * layout exists for (zones bound BOTH dimensions). */
class LayoutSpec extends SparkSpec {

  private def zRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var i = 0
    while (i < bits) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zValue2 matches the reference bit interleave") {
    import spark.implicits._
    val rows = for (x <- 0L to 40L; y <- Seq(0L, 1L, 5L, 31L, 512L, 1023L)) yield (x, y)
    val got = rows.toDF("x", "y")
      .select(col("x"), col("y"), Layout.zValue2(col("x"), col("y"), 10).as("z"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    got.foreach { case (x, y, z) =>
      assert(z == zRef(x, y, 10), s"zValue2($x, $y) = $z != ${zRef(x, y, 10)}")
    }
  }

  test("zorder2 is a permutation of its input") {
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i % 97, (i * 31) % 89)).toDF("x", "y")
    val z = Layout.zorder2(df, "x", "y", 7, 4)
    assert(z.count() == 1000)
    assert(z.exceptAll(df).count() == 0 && df.exceptAll(z).count() == 0)
    assert(z.columns.toSeq == Seq("x", "y")) // helper column dropped
  }

  test("zorder2 preserves a user column named __zv") {
    import spark.implicits._
    val df = (0L until 100L).map(i => (i % 11, (i * 7) % 13, s"user-$i"))
      .toDF("x", "y", "__zv")
    val z = Layout.zorder2(df, "x", "y", 4, 2)
    assert(z.columns.toSeq == Seq("x", "y", "__zv")) // user data intact
    assert(z.exceptAll(df).count() == 0 && df.exceptAll(z).count() == 0)
  }

  test("z-order zones bound BOTH dimensions (16x16 tiles)") {
    import spark.implicits._
    // full 64x64 grid; zones of 256 consecutive z-values are exact
    // 16x16 tiles, so every zone's span is <=15 in x AND y — the
    // property that makes parquet min/max footers prune on either
    // dimension (a 1-D sort would leave y spans at 63)
    val df = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y)).toDF("x", "y")
    val zones = df.select(col("x"), col("y"),
        shiftrightunsigned(Layout.zValue2(col("x"), col("y"), 6), 8).as("zone"))
      .groupBy("zone")
      .agg((max(col("x")) - min(col("x"))).as("span_x"),
        (max(col("y")) - min(col("y"))).as("span_y"))
      .collect()
    assert(zones.length == 16)
    zones.foreach { r =>
      assert(r.getLong(1) <= 15 && r.getLong(2) <= 15,
        s"zone ${r.getLong(0)} spans (${r.getLong(1)}, ${r.getLong(2)})")
    }
  }

  /** Reference Hilbert xy→d (the standard per-level transform with the
    * full-domain reflection), independent of the staged column form. */
  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    val n = 1L << bits
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbertIndexed matches the reference transform and is a continuous bijection") {
    import spark.implicits._
    val bits = 4 // full 16x16 grid
    val n = 1 << bits
    val df = (for (x <- 0L until n; y <- 0L until n) yield (x, y)).toDF("x", "y")
    val got = Layout.hilbertIndexed(df, "x", "y", bits, "hv")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // bit-for-bit parity with the reference model at every cell
    for (x <- 0L until n; y <- 0L until n)
      assert(got((x, y)) == hilbertRef(bits, x, y), s"mismatch at ($x, $y)")
    // bijection onto [0, n²)
    assert(got.values.toSeq.sorted == (0L until n.toLong * n).toSeq)
    // CONTINUITY — the property Morton lacks: consecutive indexes are
    // spatially adjacent cells (Manhattan distance exactly 1)
    val byD = got.map(_.swap)
    (0L until n.toLong * n - 1).foreach { d =>
      val ((x1, y1), (x2, y2)) = (byD(d), byD(d + 1))
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"discontinuity between d=$d and d=${d + 1}")
    }
  }

  test("hilbertCluster is a permutation of its input") {
    import spark.implicits._
    val df = (for (x <- 0L until 32L; y <- 0L until 32L) yield (x, y)).toDF("x", "y")
    val out = Layout.hilbertCluster(df, "x", "y", 5, numPartitions = 4)
    assert(out.columns.toSeq == Seq("x", "y"))
    assert(out.count() == 1024)
    assert(out.distinct().count() == 1024)
  }
}
