package graft.tools

import graft.ops.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Exercises the r17 design-table extension (LshRMax 18 → 24) past the
  * old cap: times [[Similarity.dbscanLshAdaptive]] on synthetic
  * md5-deterministic 64-dim corpora straddling 2^18 rows, and — at the
  * same N — the OLD capped (r = 18, b = 47) selection via
  * [[Similarity.dbscanLsh]] directly. Above 2^18 the adaptive form
  * keeps buckets 2^r ∝ N (collisions ~b·N, the N^(1+ρ) law) where the
  * capped form's 2^18 buckets leave N²/2^18 candidate growth.
  * Usage: `LshWidthProf <n1> [n2 ...]`. */
object LshWidthProf {
  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(200000, 400000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val pool = Similarity.lshPlanePool(64)
    sizes.foreach { n =>
      // deterministic pseudo-random corpus: coordinates from hash(id, j)
      val emb = spark.range(n).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), " +
          "j -> CAST(pmod(hash(id, j), 2001) AS DOUBLE) / 1000.0 - 1.0)").as("v"))
        .localCheckpoint()
      val r = math.min(Similarity.LshRMax,
        math.max(Similarity.LshR0, Similarity.ceilLog2(n.toLong)))
      val b = Similarity.lshBandsForWidth(r - Similarity.LshR0)
      def time(tag: String)(body: => Unit): Unit = {
        val t0 = System.nanoTime()
        body
        println(f"$tag n=$n r=$r b=$b: ${(System.nanoTime() - t0) / 1e9}%.1f s")
      }
      time("adaptive") {
        Similarity.dbscanLshAdaptive(emb, "vec_id", "v", pool,
            eps = 0.5, minPts = 2)
          .write.format("noop").mode("overwrite").save()
      }
      if (n > (1 << 18)) time("capped-r18") {
        val rc = 18; val bc = 47
        val sel = Array.tabulate(bc * rc)(idx =>
          pool((idx / rc) * Similarity.LshRMax + idx % rc))
        Similarity.dbscanLsh(emb, "vec_id", "v", sel, bc, eps = 0.5, minPts = 2)
          .write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
