package graft

import graft.ops.Skew
import org.apache.spark.sql.functions._

/** Salted two-phase aggregation/join must be result-identical to the
  * direct formulation on a deliberately skewed key distribution. */
class SkewSpec extends SparkSpec {

  /** 90% of rows share one hot key. */
  private def skewed = {
    import spark.implicits._
    (1 to 1000).map(i => (if (i <= 900) "HOT" else s"k$i", i.toLong, i * 1.5))
      .toDF("k", "uid", "v")
  }

  test("saltedStats equals the direct aggregation") {
    val direct = skewed.groupBy("k").agg(
      count(lit(1)).as("n"), sum(col("v")).as("sum_val"),
      min(col("v")).as("min_val"), max(col("v")).as("max_val"))
      .orderBy("k").collect()
    val salted = Skew.saltedStats(skewed, "k", "v", "uid", salts = 8)
      .orderBy("k").collect()
    assert(salted.toSeq == direct.toSeq)
  }

  test("salt spreads the hot key over multiple sub-groups") {
    val counts = skewed.withColumn("__salt", Skew.saltOf(col("uid"), 8))
      .filter(col("k") === "HOT")
      .groupBy("__salt").count().collect()
    assert(counts.length > 4, "hot key not spread across salts")
  }

  test("saltedJoinSmallSide equals the plain join") {
    import spark.implicits._
    val small = Seq(("HOT", "hot-dim"), ("k901", "dim-901")).toDF("k", "attr")
    val plain = skewed.join(small, "k").select("k", "uid", "attr")
      .orderBy("uid").collect()
    val salted = Skew.saltedJoinSmallSide(skewed, small, "k", "uid", salts = 8)
      .select("k", "uid", "attr").orderBy("uid").collect()
    assert(salted.toSeq == plain.toSeq)
  }
}
