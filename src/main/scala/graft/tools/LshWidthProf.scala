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
    val candOnly = args.headOption.contains("--candidates")
    val rest = if (candOnly) args.tail else args
    val sizes = if (rest.nonEmpty) rest.map(_.toInt).toSeq else Seq(200000, 400000)
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
      def cappedSel: (Array[Array[Double]], Int) = {
        val rc = 18; val bc = 47
        (Array.tabulate(bc * rc)(idx =>
          pool((idx / rc) * Similarity.LshRMax + idx % rc)), bc)
      }
      if (candOnly) {
        // the LAW itself, without paying the distinct/verify
        // materialization: raw banded collision-pair counts — the
        // candidate volume each form feeds its verify stage
        def candCount(planes: Array[Array[Double]], bands: Int): Long = {
          val rr = planes.length / bands
          val bandCols = (0 until bands).map { bb =>
            val bits = (0 until rr).map { j =>
              // the codegen'd kernel, NOT an interpreted HOF fold —
              // the r15 lesson measured in this very tool
              when(Similarity.dot(col("v"),
                  array(planes(bb * rr + j).map(lit).toIndexedSeq: _*)) > 0,
                lit(1L << j)).otherwise(lit(0L))
            }
            struct(lit(bb).as("band"), bits.reduce(_ + _).as("bv"))
          }
          val banded = emb.select(col("vec_id"),
              explode(array(bandCols: _*)).as("__bb"))
            .select(col("vec_id"), col("__bb.band").as("band"), col("__bb.bv").as("bv"))
          banded.groupBy("band", "bv").agg(count(lit(1)).as("c"))
            .agg(sum(expr("c * (c - 1) div 2"))).head.getLong(0)
        }
        val adaptiveSel = Array.tabulate(b * r)(idx =>
          pool((idx / r) * Similarity.LshRMax + idx % r))
        val (cSel, cb) = cappedSel
        val ca = candCount(adaptiveSel, b)
        val cc = if (r > 18) candCount(cSel, cb) else -1L
        println(s"candidates n=$n adaptive(r=$r,b=$b)=$ca capped(r=18,b=47)=$cc")
      } else {
        time("adaptive") {
          Similarity.dbscanLshAdaptive(emb, "vec_id", "v", pool,
              eps = 0.5, minPts = 2)
            .write.format("noop").mode("overwrite").save()
        }
        if (n > (1 << 18)) time("capped-r18") {
          val (sel, bc) = cappedSel
          Similarity.dbscanLsh(emb, "vec_id", "v", sel, bc, eps = 0.5, minPts = 2)
            .write.format("noop").mode("overwrite").save()
        }
      }
    }
    spark.stop()
  }
}
